package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view rewrite — the Calcite-style optimization that turns
  * an aggregate over a registered base projection into an aggregate over
  * its pre-computed summary table when the query's groupings are a
  * subset of the MV dimensions and its aggregates are MV-derivable:
  *
  *   count(const)         → sum(mv.count_col)
  *   sum(dim-less metric) → sum(mv.sum_col)
  *   min / max (metric)   → min / max (mv.min_col / mv.max_col)
  *
  * Scope (v1, deliberately conservative — a missed match is only a
  * missed speedup, never a wrong answer):
  *   - the query subtree under the Aggregate must be the registered base
  *     plan or a COLUMN-PRUNED view of it: only Project/SubqueryAlias
  *     nodes above the same leaf, every projected expression identified
  *     BY exprId with one of the base's outputs (Catalyst's column
  *     pruning preserves exprIds, so a pruned base still matches; an
  *     unrelated-but-similar plan never does);
  *   - no Filter/Join/Window between the Aggregate and the leaf (a
  *     dimension-only filter is rollup-safe in principle — future work);
  *   - groupings must be bare attributes of the MV's dimension set;
  *   - DISTINCT / FILTER-clause aggregates never match.
  *
  * Output attribute identity is preserved by re-aliasing every rewritten
  * expression under the ORIGINAL exprId, so parents resolve unchanged.
  * Exactness: count→sum-of-counts and sum→sum-of-partial-sums are
  * integer-associative; min/max idempotent — the rewrite is value-exact,
  * which the sql_mv_rewrite oracle (computed from the RAW table by
  * DuckDB) proves end to end.
  *
  * 100 TB shape: this is THE lever for repeated dashboard aggregates —
  * the rollup reads |dims| rows instead of the corpus. Registered via
  * `spark.experimental.extraOptimizations` (session-attachable at
  * runtime; no SparkSessionExtensions rebuild needed).
  */
object MvCatalog {
  final case class MvDef(
      base: LogicalPlan,            // analyzed plan of the registered base projection
      mv: LogicalPlan,              // analyzed plan of the summary scan
      dims: Set[String],            // MV dimension column names (on both sides)
      countCol: String,             // MV column holding per-cell row counts
      sumMap: Map[String, String],  // base metric name -> MV sum column
      minMap: Map[String, String],
      maxMap: Map[String, String])

  private val defs = new java.util.concurrent.CopyOnWriteArrayList[MvDef]()

  /** Replaces any definition registered for the same base plan. */
  def register(d: MvDef): Unit = {
    val it = defs.iterator()
    while (it.hasNext) { val e = it.next(); if (e.base.sameResult(d.base)) defs.remove(e) }
    defs.add(d)
  }
  def all: Seq[MvDef] = { import scala.jdk.CollectionConverters._; defs.asScala.toSeq }
  def clear(): Unit = defs.clear()
}

object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      MvCatalog.all.view
        .flatMap(d => rewrite(agg, d))
        .headOption.getOrElse(agg)
  }

  private def leaf(p: LogicalPlan): LogicalPlan = p match {
    case Project(_, c) => leaf(c)
    case SubqueryAlias(_, c) => leaf(c)
    case other => other
  }

  /** child is the base or a column-pruning of it: same leaf, only
    * Project/SubqueryAlias above it, every projected NamedExpression
    * carrying an exprId the base's own projection tree already defines.
    */
  private def matchesBase(child: LogicalPlan, base: LogicalPlan): Boolean = {
    if (child.sameResult(base)) return true
    val baseIds: Set[ExprId] = base.collect {
      case p: Project => p.projectList.map(_.exprId)
    }.flatten.toSet ++ base.output.map(_.exprId)
    def prunedOnly(p: LogicalPlan): Boolean = p match {
      case Project(pl, c) =>
        pl.forall(ne => baseIds.contains(ne.exprId)) && prunedOnly(c)
      case SubqueryAlias(_, c) => prunedOnly(c)
      case l => l.sameResult(leaf(base))
    }
    prunedOnly(child)
  }

  private def rewrite(agg: Aggregate, d: MvCatalog.MvDef): Option[Aggregate] = {
    if (!matchesBase(agg.child, d.base)) return None
    val mvOut = d.mv.output.map(a => a.name -> a).toMap
    // groupings: bare attributes within the dimension set
    val gAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if d.dims.contains(a.name) && mvOut.contains(a.name) => Some(a)
      case _ => None
    }
    if (gAttrs.exists(_.isEmpty)) return None
    val cnt = mvOut.getOrElse(d.countCol, return None)

    def mapFn(f: AggregateFunction): Option[AggregateFunction] = f match {
      case c: Count if c.children.nonEmpty &&
          c.children.forall(e => e.foldable && e.eval() != null) =>
        Some(Sum(cnt))
      case s: Sum => s.child match {
        case a: AttributeReference if d.sumMap.contains(a.name) &&
            mvOut.contains(d.sumMap(a.name)) =>
          Some(Sum(mvOut(d.sumMap(a.name))))
        case _ => None
      }
      case m: Min => m.child match {
        case a: AttributeReference if d.minMap.contains(a.name) &&
            mvOut.contains(d.minMap(a.name)) =>
          Some(Min(mvOut(d.minMap(a.name))))
        case _ => None
      }
      case m: Max => m.child match {
        case a: AttributeReference if d.maxMap.contains(a.name) &&
            mvOut.contains(d.maxMap(a.name)) =>
          Some(Max(mvOut(d.maxMap(a.name))))
        case _ => None
      }
      case _ => None
    }

    def mapNamed(ne: NamedExpression): Option[NamedExpression] = ne match {
      case a: AttributeReference if d.dims.contains(a.name) =>
        Some(Alias(mvOut(a.name), a.name)(exprId = a.exprId))
      case al: Alias => al.child match {
        case ag: AggregateExpression if ag.filter.isEmpty && !ag.isDistinct =>
          ag.aggregateFunction match {
            // avg(metric) → sum(sum_col) / sum(count_col). NOTE: Spark's
            // Average over integral input accumulates a DOUBLE sum
            // (merge-order-dependent); the rewrite divides the EXACT
            // integer rollup sums instead — deterministic and at least
            // as accurate, asserted within 1e-6 relative in the spec
            case av: Average => av.child match {
              case a: AttributeReference if d.sumMap.contains(a.name) &&
                  mvOut.contains(d.sumMap(a.name)) =>
                val sumE = ag.copy(aggregateFunction = Sum(mvOut(d.sumMap(a.name))))
                val cntE = AggregateExpression(Sum(cnt), ag.mode, isDistinct = false)
                Some(Alias(
                  Divide(Cast(sumE, org.apache.spark.sql.types.DoubleType),
                         Cast(cntE, org.apache.spark.sql.types.DoubleType)),
                  al.name)(exprId = al.exprId))
              case _ => None
            }
            case f => mapFn(f).map(nf =>
              Alias(ag.copy(aggregateFunction = nf), al.name)(exprId = al.exprId))
          }
        case a: AttributeReference if d.dims.contains(a.name) =>
          Some(Alias(mvOut(a.name), al.name)(exprId = al.exprId))
        case _ => None
      }
      case _ => None
    }

    val newAe = agg.aggregateExpressions.map(mapNamed)
    if (newAe.exists(_.isEmpty)) return None
    val newGe: Seq[Expression] = gAttrs.flatten.map(a => mvOut(a.name))
    Some(Aggregate(newGe, newAe.map(_.get), d.mv))
  }
}
