package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Accumulated second-moment state of a float-vector column: row count,
  * per-dimension sum, and the upper triangle of the Gram matrix Σ x·xᵀ.
  * From these three the driver assembles the covariance matrix exactly —
  * cov(i,j) = G(i,j)/n − (s(i)/n)(s(j)/n) — without a second pass.
  */
case class GramState(n: Long, s: Array[Double], g: Array[Double])

/** One-pass distributed Gram/covariance aggregate over `ARRAY<FLOAT>`
  * vectors — the scalable front half of PCA: each task folds its rows into
  * d + d(d+1)/2 doubles (d=64 → ~17 KB), the shuffle carries ONE such
  * state per partition, and the merge is elementwise addition. At 100 TB
  * this is the textbook shape — the data is read once, nothing about the
  * state grows with row count, and the O(d³) eigen step happens on the
  * driver against a 64×64 matrix.
  *
  * Vectors of the wrong dimension (or null) are skipped, counted in
  * nothing — same discipline as FloatDotProduct's length-mismatch NULL.
  */
class VectorGramAgg(dim: Int) extends Aggregator[Seq[Float], GramState, GramState] {
  private val tri = dim * (dim + 1) / 2

  override def zero: GramState =
    GramState(0L, new Array[Double](dim), new Array[Double](tri))

  override def reduce(b: GramState, v: Seq[Float]): GramState = {
    if (v == null || v.length != dim) return b
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) { x(i) = v(i).toDouble; i += 1 }
    var k = 0
    i = 0
    while (i < dim) {
      b.s(i) += x(i)
      var j = i
      while (j < dim) { b.g(k) += x(i) * x(j); j += 1; k += 1 }
      i += 1
    }
    GramState(b.n + 1, b.s, b.g)
  }

  override def merge(a: GramState, b: GramState): GramState = {
    var i = 0
    while (i < dim) { a.s(i) += b.s(i); i += 1 }
    i = 0
    while (i < tri) { a.g(i) += b.g(i); i += 1 }
    GramState(a.n + b.n, a.s, a.g)
  }

  override def finish(r: GramState): GramState = r
  override def bufferEncoder: Encoder[GramState] = Encoders.product[GramState]
  override def outputEncoder: Encoder[GramState] = Encoders.product[GramState]
}

object VectorGramAgg {

  /** Covariance matrix from the aggregated state (dense d×d, driver-side). */
  def covariance(st: GramState, dim: Int): Array[Array[Double]] = {
    require(st.n > 0, "covariance of an empty vector set")
    val n = st.n.toDouble
    val c = Array.ofDim[Double](dim, dim)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = st.g(k) / n - (st.s(i) / n) * (st.s(j) / n)
        c(i)(j) = v; c(j)(i) = v
        j += 1; k += 1
      }
      i += 1
    }
    c
  }

  /** Top eigenvector/value by deterministic power iteration: fixed start
    * (uniform direction), fixed iteration count, sign normalized so the
    * largest-magnitude component is positive (an eigenvector's sign is
    * arbitrary; pinning it makes the output reproducible, SURVEY §7.3 R8).
    */
  def topEigen(c: Array[Array[Double]], iters: Int = 200): (Array[Double], Double) = {
    val d = c.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var it = 0
    while (it < iters) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += c(i)(j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      require(nrm > 0, "power iteration collapsed to the zero vector")
      v = w.map(_ / nrm)
      it += 1
    }
    // Rayleigh quotient (v is unit-norm)
    var lambda = 0.0
    var i = 0
    while (i < d) {
      var acc = 0.0
      var j = 0
      while (j < d) { acc += c(i)(j) * v(j); j += 1 }
      lambda += v(i) * acc
      i += 1
    }
    var mx = 0
    i = 1
    while (i < d) { if (math.abs(v(i)) > math.abs(v(mx))) mx = i; i += 1 }
    if (v(mx) < 0) v = v.map(-_)
    (v, lambda)
  }
}
