package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SURVEY §2.4 `agg_custom_typed`: a typed `Aggregator` UDAF computing a
  * weighted average — sum(value·weight)/sum(weight). The buffer is a flat
  * case class, Tungsten-encoded, merged associatively: partial aggregation
  * (map-side combine) works exactly like a built-in agg, so the operator
  * scales the same way `avg` does — one shuffle of tiny buffers.
  *
  * Semantics are deliberately SQL-expressible so the DuckDB oracle can
  * mirror it: round(sum(v*w)/sum(w), 2).
  */
object WeightedAvg {
  case class Buf(num: Double, den: Double)

  private object Agg extends Aggregator[(Double, Double), Buf, Double] {
    def zero: Buf = Buf(0.0, 0.0)
    def reduce(b: Buf, a: (Double, Double)): Buf = Buf(b.num + a._1 * a._2, b.den + a._2)
    def merge(x: Buf, y: Buf): Buf = Buf(x.num + y.num, x.den + y.den)
    def finish(r: Buf): Double = if (r.den == 0.0) 0.0 else r.num / r.den
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private lazy val fn = udaf(Agg)

  /** weighted_avg(value, weight) as a Column. */
  def apply(value: Column, weight: Column): Column = fn(value, weight)
}
