package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 thirty-first wave: lexical density against a data-derived
  * function-word head, and week-over-week audience overlap.
  */
object Round10ee {

  val decls: Map[String, Decl] = Map(
    // Lexical density: the share of a document's tokens that are NOT in
    // the corpus's top-5 frequency head (the data-derived function-word
    // proxy — no hardcoded stopword list). The head is a broadcast
    // 5-row table off the bounded vocabulary aggregate; the per-doc
    // census is one anti-membership sum, ppm floor division.
    "text_lexical_density" -> Decl(
      (s, d) => {
        val tok = Tables(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val head = tok.groupBy("w").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("w")).limit(5)
          .select(col("w").as("hw"))
        tok.join(broadcast(head), col("w") === col("hw"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
               sum(when(col("hw").isNull, 1L).otherwise(0L)).as("n_content"))
          .select(col("doc_id"), col("n_tokens"), col("n_content"),
                  expr("n_content * 1000000L div n_tokens").as("density_ppm"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |             FROM documents),
             |head AS (SELECT w AS hw FROM (
             |           SELECT w, count(*) AS n FROM tok GROUP BY w
             |           ORDER BY n DESC, w LIMIT 5)),
             |j AS (SELECT doc_id,
             |        CASE WHEN hw IS NULL THEN 1 ELSE 0 END AS content
             |      FROM tok LEFT JOIN head ON w = hw)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |       CAST(sum(content) AS BIGINT) AS n_content,
             |       CAST(sum(content) * 1000000 // count(*) AS BIGINT)
             |         AS density_ppm
             |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Audience overlap: Jaccard of consecutive weeks' active-user sets —
    // the retention-adjacent audience-quality metric. Intersection via
    // one self-join of the (user, week) activity grid on (user, wk+1);
    // union by inclusion–exclusion; exact integer ppm.
    "ts_audience_overlap" -> Decl(
      (s, d) => {
        val act = Tables.events(s, d)
          .select(col("user_id"),
                  expr("unix_micros(ts) div 604800000000L").as("wk"))
          .distinct()
          .localCheckpoint(true)
        val wau = act.groupBy("wk").agg(count(lit(1)).as("wau"))
        val inter = act.as("a")
          .join(act.as("b"),
                col("a.user_id") === col("b.user_id") &&
                col("b.wk") === col("a.wk") + 1)
          .groupBy(col("a.wk").as("wk")).agg(count(lit(1)).as("inter"))
        wau.select(col("wk"), col("wau").as("wau_a"))
          .join(wau.select((col("wk") - 1).as("wk"), col("wau").as("wau_b")), "wk")
          .join(inter, Seq("wk"), "left")
          .select(col("wk"), col("wau_a"), col("wau_b"),
                  coalesce(col("inter"), lit(0L)).as("inter"))
          .select(col("wk"), col("wau_a"), col("wau_b"), col("inter"),
                  expr("inter * 1000000L div (wau_a + wau_b - inter)")
                    .as("jaccard_ppm"))
          .orderBy("wk")
      },
      Some("""WITH act AS (SELECT DISTINCT user_id,
             |               CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
             |             FROM events),
             |wau AS (SELECT wk, count(*) AS wau FROM act GROUP BY wk),
             |inter AS (SELECT a.wk, count(*) AS inter
             |          FROM act a JOIN act b
             |            ON a.user_id = b.user_id AND b.wk = a.wk + 1
             |          GROUP BY a.wk),
             |j AS (SELECT wa.wk, wa.wau AS wau_a, wb.wau AS wau_b,
             |        coalesce(inter, 0) AS inter
             |      FROM wau wa JOIN wau wb ON wb.wk = wa.wk + 1
             |           LEFT JOIN inter ON inter.wk = wa.wk)
             |SELECT wk, CAST(wau_a AS BIGINT) AS wau_a,
             |       CAST(wau_b AS BIGINT) AS wau_b,
             |       CAST(inter AS BIGINT) AS inter,
             |       CAST(inter * 1000000 // (wau_a + wau_b - inter) AS BIGINT)
             |         AS jaccard_ppm
             |FROM j ORDER BY wk""".stripMargin))
  )
}
