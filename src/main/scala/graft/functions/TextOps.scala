package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators: tokenization and
  * word shingles as built-in expressions (split / sequence / transform),
  * per-row and codegen-friendly.
  */
object TextOps {

  /** Whitespace tokens (fixture text is single-space separated, trimmed). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-grams joined by a single space. Docs shorter than n yield an
    * empty array (guards the descending-`sequence` footgun when
    * size-n+1 < 1).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
    .otherwise(array().cast("array<string>"))

  /** Generator form of `shingles` — emits the n-gram ROWS directly (the
    * `explode(shingles(...))` replacement) through the native
    * `WordShingles` expression; row-equivalent, but one compiled loop
    * instead of interpreted HOF lambdas + an intermediate array.
    */
  def shingleRows(toks: Column, n: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      WordShingles(org.apache.spark.sql.graft.Bridge.expression(toks), n))

  /** Sorted-distinct `xxhash64` hashes of the n-gram set, per row — the
    * `explode(shingleRows) → xxhash64 → distinct` pipeline collapsed into
    * one native expression (`ShingleHashSet`); the minhash/Jaccard dedup
    * signature input.
    */
  def shingleHashes(toks: Column, n: Int): Column = SketchOps.shingleHashes(toks, n)

  /** |a ∩ b| of two sorted-distinct ARRAY<LONG> columns (`shingleHashes`
    * outputs) — see `SketchOps.sortedIntersectCount`.
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    SketchOps.sortedIntersectCount(a, b)
}
