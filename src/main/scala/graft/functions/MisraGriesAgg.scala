package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries candidate state: parallel key/count arrays (a product
  * type so the Tungsten row encoder applies — no kryo blobs in shuffle).
  */
case class MgState(keys: Array[String], counts: Array[Long])

/** Misra-Gries heavy-hitter CANDIDATE sketch over string keys: at most
  * `k` counters; any key with global frequency > n/(k+1) is guaranteed
  * to survive every reduce/merge (the classical no-false-negative
  * property — each decrement round removes equal mass from every live
  * counter, so a key above the threshold can never hit zero across all
  * of them). The declared key runs a second exact-count pass over the
  * ≤k candidates, so the FINAL answer is exact; this sketch only prunes
  * the key space. Merge is the summed-counts + (k+1)-th-largest
  * subtraction form (Agarwal et al., "Mergeable Summaries"),
  * associative within the guarantee.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, MgState, Array[String]] {

  override def zero: MgState = MgState(Array.empty, Array.empty)

  private def toMap(b: MgState): scala.collection.mutable.LinkedHashMap[String, Long] = {
    val m = scala.collection.mutable.LinkedHashMap[String, Long]()
    var i = 0
    while (i < b.keys.length) { m.put(b.keys(i), b.counts(i)); i += 1 }
    m
  }

  private def fromMap(m: scala.collection.mutable.LinkedHashMap[String, Long]): MgState = {
    val ks = new Array[String](m.size); val cs = new Array[Long](m.size)
    var i = 0
    m.foreach { case (key, c) => ks(i) = key; cs(i) = c; i += 1 }
    MgState(ks, cs)
  }

  /** Trim to k counters by subtracting the (k+1)-th largest count. */
  private def trim(m: scala.collection.mutable.LinkedHashMap[String, Long]): Unit =
    if (m.size > k) {
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = m.collect { case (key, c) if c - cut <= 0 => key }.toSeq
      dead.foreach(m.remove)
      m.mapValuesInPlace((_, c) => c - cut)
    }

  override def reduce(b: MgState, key: String): MgState = {
    val m = toMap(b)
    m.get(key) match {
      case Some(c) => m.update(key, c + 1)
      case None =>
        m.put(key, 1L)
        trim(m)
    }
    fromMap(m)
  }

  override def merge(a: MgState, b: MgState): MgState = {
    val m = toMap(a)
    var i = 0
    while (i < b.keys.length) {
      m.update(b.keys(i), m.getOrElse(b.keys(i), 0L) + b.counts(i))
      i += 1
    }
    trim(m)
    fromMap(m)
  }

  /** Candidates sorted for determinism (counts are sketch artifacts —
    * only the key SET matters downstream). */
  override def finish(b: MgState): Array[String] = b.keys.sorted

  override def bufferEncoder: Encoder[MgState] = Encoders.product[MgState]
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
