package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH over word-shingle sets, fully deterministic
  * (SURVEY §7.3 R8: the "permutations" are `xxhash64(seed, shingle)` with
  * compile-time seeds — no runtime RNG, stable across runs/partitions).
  *
  * Shape: per-row, not relational. A document's signature depends only on
  * its own shingle set, so the whole sketch is computed inside the row by
  * the native `MinHashSig` expression (one compiled loop over the
  * `ShingleHashSet` array) — a scan-speed projection with NO shuffle. The
  * only shuffles in the pipeline are the banded candidate join and the
  * candidate verify, both bounded by LSH collisions rather than corpus
  * size. (Round 1's relational form — explode every shingle, shuffle 3M
  * scalar rows, fold 32 `min` aggregates per doc — measured ~96
  * executor-CPU-seconds at sf0.1 for the signature stage alone; the
  * per-row fold is <1. Hash parity with that form is bit-exact, so
  * signatures, band keys, and recall are unchanged.)
  */
object Minhash {
  val NumHashes = 32
  val BandSize = 4
  val NumBands: Int = NumHashes / BandSize

  /** (doc_id, hs: sorted-distinct shingle hashes) → (doc_id, set_size,
    * ms: the 32-minima signature) — pure projection, no shuffle.
    */
  def signatures(withShingles: DataFrame): DataFrame =
    withShingles.select(
      col("doc_id"), size(col("hs")).as("set_size"),
      graft.functions.SketchOps.minhashSig(col("hs")).as("ms"))

  /** signatures → (doc_id, band, sig): one LSH bucket key per band —
    * `xxhash64` over the band's 4 minima, same fold as hashing the four
    * former `m0..m31` columns.
    */
  def bandedKeys(sigs: DataFrame): DataFrame = {
    val bands = array((0 until NumBands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64((0 until BandSize).map(k =>
          element_at(col("ms"), b * BandSize + k + 1)): _*).as("sig"))
    }: _*)
    sigs.select(col("doc_id"), explode(bands).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }
}
