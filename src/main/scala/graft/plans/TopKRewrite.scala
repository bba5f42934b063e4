package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: the standard window top-k pattern
  *
  * {{{ Project(out)  <-  Filter(rn <= k)  <-  Window(row_number() AS rn) }}}
  *
  * becomes the native bounded-heap [[TopKPerKey]] when `rn` itself is not
  * in the output. Spark's own `InferWindowGroupLimit` pre-filters the same
  * pattern but still sorts every partition and evaluates the window; this
  * rewrite skips both — per key, only a k-element heap is maintained and
  * only the surviving k rows are ever ordered. Injected via
  * `GraftExtensions.injectOptimizerRule`, so it applies to extension
  * sessions (`graft.Sql`); the declared contract queries keep their stock
  * window plans.
  *
  * Guards: exactly one window expression, and it is `row_number()` (rank
  * functions admit >k rows on ties); the filter bound is a literal; every
  * output column comes from the window's child (dropping the window means
  * `rn` must be unused); partition/order expressions deterministic.
  * Ordering caveat: the window's incidental intra-partition sort order is
  * not preserved — Catalyst guarantees ordering only under an explicit
  * Sort, which this rewrite leaves in place wherever the query declared
  * one.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** `rn <= k` in its equivalent literal forms → (rn, k). The strict forms
    * guard `k > Int.MinValue` so `k - 1` cannot wrap to Int.MaxValue and
    * turn an always-false filter into top-everything. */
  private object RnBound {
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) => Some((a, k))
      case LessThan(a: Attribute, IntegerLiteral(k)) if k > Int.MinValue => Some((a, k - 1))
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) => Some((a, k))
      case GreaterThan(IntegerLiteral(k), a: Attribute) if k > Int.MinValue => Some((a, k - 1))
      case EqualTo(a: Attribute, IntegerLiteral(1)) => Some((a, 1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projectList,
        Filter(RnBound(rn, k),
        Window(
          Seq(al @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, ord, _)), _)),
          _, _, wchild, _)))
        if k > 0 && rn.exprId == al.exprId &&
          // a global (unpartitioned) top-k is TakeOrderedAndProject's job —
          // and TopKPerKeyExec's ClusteredDistribution(Nil) would throw
          part.nonEmpty &&
          projectList.forall(_.references.subsetOf(wchild.outputSet)) &&
          part.forall(_.deterministic) && ord.forall(_.deterministic) =>
      // if InferWindowGroupLimit already inserted its pre-filter, subsume
      // it — TopKPerKey bounds the same state without the sort+window
      val inner = wchild match {
        case WindowGroupLimit(_, _, _, _, c) => c
        case c => c
      }
      Project(projectList, TopKPerKey(part, ord, k, inner))
  }
}
