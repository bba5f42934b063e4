package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash + banded LSH over word-shingle sets, fully deterministic
  * (SURVEY §7.3 R8: the "seeds" are compile-time constants folded into
  * `xxhash64(seed, shingle)` — no runtime RNG, so signatures are stable
  * across runs, partitions and executors).
  *
  * Scale shape: signature computation is per-row (scan-parallel); candidate
  * generation shuffles once on `(band, sig)` — pairs only form inside a
  * bucket, which is the whole point of LSH: at 100 TB the quadratic
  * all-pairs join never materializes, only per-bucket pairs do. Skewed
  * buckets (boilerplate-heavy corpora) would be salted or capped by bucket
  * size before pairing.
  */
object Minhash {
  /** 32 hash functions banded 4-wide → 8 bands: candidate-recall sweet spot
    * for Jaccard ≥ ~0.5 at this corpus size.
    */
  val NumHashes = 32
  val BandSize = 4
  val NumBands: Int = NumHashes / BandSize

  /** MinHash signature (ARRAY<BIGINT> of length NumHashes) of a distinct
    * shingle-set column.
    */
  def signature(shingleSet: Column): Column =
    array((0 until NumHashes).map { seed =>
      array_min(transform(shingleSet, sh => xxhash64(lit(seed), sh)))
    }: _*)

  /** Banded LSH keys: ARRAY<STRUCT<band INT, sig BIGINT>>, one entry per
    * band; `sig` hashes the band's slice of the signature.
    */
  def bandSignatures(sig: Column): Column =
    array((0 until NumBands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64((0 until BandSize).map(k => element_at(sig, b * BandSize + k + 1)): _*).as("sig"))
    }: _*)
}
