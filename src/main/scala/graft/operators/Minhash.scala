package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH over word-shingle sets, fully deterministic
  * (SURVEY §7.3 R8: the "permutations" are `xxhash64(seed, shingle)` with
  * compile-time seeds — no runtime RNG, stable across runs/partitions).
  *
  * Shape: relational, not per-row HOFs. Shingles are exploded once; the 32
  * per-seed minima are computed as 32 `min` aggregates in ONE groupBy —
  * partial (map-side) aggregation does almost all the work before the
  * single shuffle on doc_id, and every hash is computed exactly once. (A
  * previous HOF formulation recomputed the signature per band — 8× the
  * hashing, outside codegen; this version is ~30× faster at sf0.1 and is
  * the formulation that scales: explode + partial agg is linear, and
  * candidate pairs only materialize inside an LSH bucket, never globally.
  * Skew-heavy buckets — boilerplate corpora — would be capped/salted here.)
  */
object Minhash {
  val NumHashes = 32
  val BandSize = 4
  val NumBands: Int = NumHashes / BandSize

  /** exploded distinct (doc_id, h) rows — `h` the 64-bit shingle hash —
    * → (doc_id, set_size, m0..m31): per-doc set size and the 32-min
    * signature, in one shuffle. (Takes the exploded PRE-HASHED form:
    * building/persisting array columns measured ~10× slower than explode +
    * codegen'd hash agg, and hashing each variable-length shingle string
    * once up front means the distinct shuffles fixed 8-byte keys and all
    * 32 permutation hashes run over a long, not a string — at corpus scale
    * the shingle text never leaves its scan stage. xxhash64(seed, h) of a
    * 64-bit h is as valid a permutation family as hashing the string, and
    * collisions at 2⁻⁶⁴ are far below the sketch's own error.)
    */
  def signatures(ex: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("set_size") +:
      (0 until NumHashes).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** signatures → (doc_id, band, sig): one LSH bucket key per band. */
  def bandedKeys(sigs: DataFrame): DataFrame = {
    val bands = array((0 until NumBands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64((0 until BandSize).map(k => col(s"m${b * BandSize + k}")): _*).as("sig"))
    }: _*)
    sigs.select(col("doc_id"), explode(bands).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }
}
