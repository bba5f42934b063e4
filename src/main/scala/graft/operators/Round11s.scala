package graft.operators

import graft.{Decl, Tables}
import graft.functions.StringSimilarity
import org.apache.spark.sql.functions._

/** Round-10 wave 75: native codegen string expressions — Jaro-Winkler
  * fuzzy scoring against a bounded probe set (the entity-resolution
  * scorer; the existing join_fuzzy_name key blocks + Levenshteins,
  * this one exercises the prefix-boosted Jaro family DuckDB also
  * ships) and Unicode NFC cleanup of text polluted with zero-width
  * code points and decomposed accents (the canonical pre-tokenization
  * scrub for scraped training corpora — BOM/ZWSP/ZWNJ/ZWJ stripping +
  * canonical composition).
  *
  * Determinism: Jaro-Winkler is rounded to 6 dp in BOTH engines before
  * the per-probe top-k cut, so rank ties resolve on (score, partkey)
  * identically even if the two implementations differ in the last ulp
  * (they shouldn't — both use the integer-halved transposition count
  * and the 0.7 boost threshold). NFC output is byte-identical: Java's
  * Normalizer and DuckDB's utf8proc implement the same canonical
  * composition.
  *
  * Scale shape: both keys are pure per-row map work riding whole-stage
  * codegen (no UDF boundary, no shuffle beyond the final bounded
  * top-k, which runs on the native TopKPerKey bounded-heap operator —
  * NOT a 5-partition window funnel).
  */
object Round11s {

  val decls: Map[String, Decl] = Map(
    // Top-20 fuzzy matches per probe name: 5 probe part names
    // broadcast against every other part, scored by the native
    // jaro_winkler expression, cut by bounded per-probe heaps.
    "scalar_jaro_winkler" -> Decl(
      (s, d) => {
        val parts = Tables(s, d, "part")
        val probes = parts.filter(col("p_partkey") <= 5)
          .select(col("p_partkey").as("probe_key"),
                  col("p_name").as("probe_name"))
        val scored = parts.filter(col("p_partkey") > 5)
          .crossJoin(broadcast(probes))
          .select(col("probe_key"), col("p_partkey"),
                  round(StringSimilarity.jaroWinkler(
                          col("probe_name"), col("p_name")), 6).as("sim"))
        val top = graft.plans.TopK.perKey(
          scored, Seq("probe_key"),
          Seq(("sim", true), ("p_partkey", false)), 20)
        // rank over the ≤ 5×20-row cut — bounded, never data-sized
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("probe_key")
          .orderBy(col("sim").desc, col("p_partkey").asc)
        top.withColumn("rank", row_number().over(w))
          .select(col("probe_key"), col("rank"), col("p_partkey"), col("sim"))
          .orderBy("probe_key", "rank")
      },
      Some("""WITH probes AS (
             |  SELECT p_partkey AS probe_key, p_name AS probe_name
             |  FROM part WHERE p_partkey <= 5),
             |scored AS (
             |  SELECT probe_key, p.p_partkey,
             |         round(jaro_winkler_similarity(probe_name, p_name), 6) AS sim
             |  FROM part p CROSS JOIN probes WHERE p.p_partkey > 5),
             |ranked AS (
             |  SELECT probe_key, p_partkey, sim,
             |         row_number() OVER (PARTITION BY probe_key
             |                            ORDER BY sim DESC, p_partkey ASC) AS rank
             |  FROM scored)
             |SELECT probe_key, rank, p_partkey, sim
             |FROM ranked WHERE rank <= 20
             |ORDER BY probe_key, rank""".stripMargin)),

    // NFC cleanup: deterministically pollute each document prefix with
    // a BOM, decomposed accents (e + U+0301), and a trailing ZWSP,
    // then scrub with the native nfc_clean expression. Lengths are
    // code-point counts in both engines, so the composed/stripped
    // deltas line up exactly.
    "text_unicode_normalize" -> Decl(
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("doc_id"),
                  concat(lit("\uFEFF"),
                         replace(substring(col("text"), 1, 120),
                                 lit("e"), lit("e\u0301")),
                         lit("\u200B")).as("dirty"))
          .select(col("doc_id"),
                  StringSimilarity.nfcClean(col("dirty")).as("norm"),
                  length(col("dirty")).cast("bigint").as("len_dirty"))
          .withColumn("len_norm", length(col("norm")).cast("bigint"))
          .withColumn("changed", col("len_dirty") =!= col("len_norm"))
          .select(col("doc_id"), col("norm"), col("len_dirty"),
                  col("len_norm"), col("changed"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         chr(65279) || replace(substr(text, 1, 120), 'e', 'e' || chr(769)) ||
             |           chr(8203) AS dirty
             |  FROM documents),
             |n AS (
             |  SELECT doc_id,
             |         nfc_normalize(replace(replace(dirty, chr(8203), ''),
             |                               chr(65279), '')) AS norm,
             |         CAST(length(dirty) AS BIGINT) AS len_dirty
             |  FROM d)
             |SELECT doc_id, norm, len_dirty,
             |       CAST(length(norm) AS BIGINT) AS len_norm,
             |       len_dirty <> CAST(length(norm) AS BIGINT) AS changed
             |FROM n ORDER BY doc_id""".stripMargin))
  )
}
