package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (z-order) interleave of the low 16 bits of two LONG columns — the
  * multi-dimensional clustering key behind data-skipping layouts: sort a
  * fact table by `z(a, b)` before writing and every file's min/max parquet
  * statistics narrow on BOTH `a` and `b` at once, so point/range filters on
  * either column prune files at the scan. (A single-column sort clusters
  * only its own column; z-order trades a little locality in each dimension
  * for locality in all of them. At 100 TB this is the difference between
  * reading one file and reading the table for a `WHERE part = ? AND
  * supplier = ?` probe.)
  *
  * Bit spreading uses the standard mask-shift cascade (no loop), fully
  * inside whole-stage codegen. Inputs are masked to 16 bits; callers
  * bucket/range-compress wider domains first (the fixtures' key domains fit
  * directly). The expression is deterministic and engine-mirrorable: the
  * DuckDB oracle reproduces it with a 16-term shift/add fold.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"z_interleave expects (bigint, bigint), got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any =
    InterleaveBits.spread(l.asInstanceOf[Long]) |
      (InterleaveBits.spread(r.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = InterleaveBits.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.spread($a) | ($cls.spread($b) << 1);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "z_interleave"
}

object InterleaveBits {
  /** Spread the low 16 bits of `v` to even bit positions (Morton). */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }
}

/** Column-DSL face of [[InterleaveBits]]. */
object ZOrder {
  def interleave16(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(InterleaveBits(
      org.apache.spark.sql.graft.Bridge.expression(a.cast("bigint")),
      org.apache.spark.sql.graft.Bridge.expression(b.cast("bigint"))))
}
