package graft.operators

import graft.{Decl, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Round-10 wave 63: corpus-comparison and readability text analytics —
  * the Monroe-Colaresi-Quinn "Fightin' Words" log-odds with a Dirichlet
  * prior (WHICH terms distinguish the en corpus from the rest — the
  * principled alternative to raw frequency ratios that overweight rare
  * words) and the classical readability indices (LIX / ARI) every
  * content-quality pipeline reports.
  *
  * Determinism: all counts are exact BIGINTs; δ and z are single
  * double-expression trees over those integers, written identically in
  * both engines, compared before the terminal 6-dp round; the top-30 cut
  * orders by (|z| desc, term) — a total order.
  *
  * Scale shape: token counting is the text_wordcount shuffle (one
  * map-side-combined aggregate), the vocabulary is support-filtered
  * (≥ 20 occurrences) and the output is a TakeOrdered top-30 — no
  * global sort; readability is pure per-row expression work.
  */
object Round11g {

  val decls: Map[String, Decl] = Map(
    // Fightin' Words: en vs non-en usage. Uniform Dirichlet prior α=1
    // per term with α0 = V (the filtered vocabulary size); z = δ /
    // sqrt(1/(y_en+1) + 1/(y_ot+1)).
    "agg_log_odds_monroe" -> Decl(
      (s, d) => {
        val tok = Tables(s, d, "documents")
          .select(col("lang"), explode(TextOps.tokens(col("text"))).as("term"))
        val counts = tok.groupBy("term")
          .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("y_en"),
               sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("y_ot"))
          .filter(col("y_en") + col("y_ot") >= 20)
        val tot = counts.agg(sum("y_en").as("n_en"), sum("y_ot").as("n_ot"),
                             count(lit(1)).as("v"))
        counts.crossJoin(broadcast(tot))
          .withColumn("delta", expr(
            """ln((y_en + 1.0) / (n_en + v - y_en - 1.0))
              | - ln((y_ot + 1.0) / (n_ot + v - y_ot - 1.0))""".stripMargin))
          .withColumn("z", expr(
            "delta / sqrt(1.0 / (y_en + 1.0) + 1.0 / (y_ot + 1.0))"))
          .select(col("term"), col("y_en"), col("y_ot"),
                  round(col("delta"), 6).as("delta"),
                  round(col("z"), 6).as("z"))
          .orderBy(abs(col("z")).desc, col("term"))
          .limit(30)
      },
      Some("""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS term
             |             FROM documents),
             |counts AS (
             |  SELECT term,
             |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS y_en,
             |         sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS y_ot
             |  FROM tok GROUP BY term
             |  HAVING sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             |       + sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) >= 20),
             |tot AS (SELECT sum(y_en) AS n_en, sum(y_ot) AS n_ot,
             |               count(*) AS v
             |        FROM counts),
             |scored AS (
             |  SELECT term, y_en, y_ot,
             |         ln((y_en + 1.0) / (n_en + v - y_en - 1.0))
             |           - ln((y_ot + 1.0) / (n_ot + v - y_ot - 1.0)) AS delta
             |  FROM counts CROSS JOIN tot)
             |SELECT term, CAST(y_en AS BIGINT) AS y_en,
             |       CAST(y_ot AS BIGINT) AS y_ot,
             |       round(delta, 6) AS delta,
             |       round(delta / sqrt(1.0 / (y_en + 1.0)
             |                        + 1.0 / (y_ot + 1.0)), 6) AS z
             |FROM scored
             |ORDER BY abs(delta / sqrt(1.0 / (y_en + 1.0)
             |                        + 1.0 / (y_ot + 1.0))) DESC, term
             |LIMIT 30""".stripMargin)),

    // Readability: LIX = words/sentences + 100·longwords/words (long =
    // length ≥ 7) and ARI = 4.71·chars/words + 0.5·words/sentences −
    // 21.43, per document from exact integer counts (chars = non-space
    // letters, sentences = '.'-terminated runs floored at 1).
    "text_readability_indices" -> Decl(
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"),
                  col("text"))
          .select(col("doc_id"),
                  size(col("toks")).cast("bigint").as("words"),
                  expr("cast(size(filter(toks, t -> length(t) >= 7)) as bigint)")
                    .as("long_words"),
                  length(regexp_replace(col("text"), " ", ""))
                    .cast("bigint").as("chars"),
                  greatest(lit(1L),
                    (length(col("text")) -
                     length(regexp_replace(col("text"), "\\.", "")))
                      .cast("bigint")).as("sentences"))
          .select(col("doc_id"), col("words"), col("long_words"),
                  col("chars"), col("sentences"),
                  // exact half-up ppm integers — a double round at any
                  // fixed digit can land on a .5 boundary where the
                  // engines' rounding modes disagree (caught at sf0.01)
                  expr("""((words * words + 100L * long_words * sentences)
                         |  * 2000000L + words * sentences)
                         | div (2L * words * sentences)""".stripMargin)
                    .as("lix_ppm"),
                  expr("""((471L * chars * sentences + 50L * words * words
                         |   - 2143L * words * sentences
                         |   + 100L * 100L * words * sentences)
                         |  * 2000000L + 100L * words * sentences)
                         | div (2L * 100L * words * sentences)
                         | - 100000000L""".stripMargin).as("ari_ppm"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
             |         CAST(len(list_filter(string_split(text, ' '),
             |                              t -> length(t) >= 7)) AS BIGINT)
             |           AS long_words,
             |         CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars,
             |         greatest(1,
             |           CAST(length(text) - length(replace(text, '.', ''))
             |                AS BIGINT)) AS sentences
             |  FROM documents)
             |SELECT doc_id, words, long_words, chars, sentences,
             |       CAST(((words * words + 100 * long_words * sentences)
             |              * 2000000 + words * sentences)
             |            // (2 * words * sentences) AS BIGINT) AS lix_ppm,
             |       CAST(((471 * chars * sentences + 50 * words * words
             |               - 2143 * words * sentences
             |               + 10000 * words * sentences)
             |              * 2000000 + 100 * words * sentences)
             |            // (200 * words * sentences) - 100000000
             |            AS BIGINT) AS ari_ppm
             |FROM base ORDER BY doc_id""".stripMargin))
  )
}
