package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 twenty-seventh wave: vocabulary richness and year-over-year
  * growth at the monthly grain.
  */
object Round10aa {

  val decls: Map[String, Decl] = Map(
    // Hapax legomena ratio per language: the share of the vocabulary
    // seen exactly once — the standard corpus-richness diagnostic (a
    // shrinking hapax share signals duplication or templating). Both
    // censuses ride the bounded vocabulary grid.
    "text_hapax_ratio" -> Decl(
      (s, d) => {
        val vocab = Tables(s, d, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("w"))
          .groupBy("lang", "w").agg(count(lit(1)).as("n"))
        vocab.groupBy("lang")
          .agg(count(lit(1)).as("vocab"),
               sum(when(col("n") === 1L, 1L).otherwise(0L)).as("hapax"),
               sum(col("n")).as("tokens"))
          .select(col("lang"), col("vocab"), col("hapax"), col("tokens"),
                  round(col("hapax").cast("double") / col("vocab"), 6)
                    .as("hapax_ratio"))
          .orderBy("lang")
      },
      Some("""WITH v AS (SELECT lang, w, count(*) AS n FROM (
             |            SELECT lang, unnest(string_split(text, ' ')) AS w
             |            FROM documents) GROUP BY 1, 2)
             |SELECT lang, CAST(count(*) AS BIGINT) AS vocab,
             |       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS hapax,
             |       CAST(sum(n) AS BIGINT) AS tokens,
             |       round(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |             / count(*), 6) AS hapax_ratio
             |FROM v GROUP BY lang ORDER BY lang""".stripMargin)),

    // Year-over-year monthly revenue per market segment: lag 12 on the
    // bounded (segment × month) spine, growth as an exact-integer-input
    // ppm ratio — the board-deck finance view.
    "ts_yoy_monthly" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("seg").orderBy("midx")
        Tables(s, d, "orders")
          .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"),
                   (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
                     .cast("bigint").as("midx"))
          .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
          .withColumn("prev_yr_cents", lag(col("cents"), 12).over(w))
          .filter(col("prev_yr_cents").isNotNull)
          .select(col("seg"), col("midx"), col("cents"), col("prev_yr_cents"),
                  round((col("cents") - col("prev_yr_cents")).cast("double")
                        / col("prev_yr_cents") * 1e6, 6).as("yoy_ppm"))
          .orderBy("seg", "midx")
      },
      // the spine is gap-free per segment on this data, so lag 12 IS the
      // same calendar month a year earlier in both engines
      Some("""WITH m AS (SELECT c_mktsegment AS seg,
             |             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
             |                  AS BIGINT) AS midx,
             |             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
             |           FROM orders JOIN customer ON o_custkey = c_custkey
             |           GROUP BY 1, 2),
             |l AS (SELECT seg, midx, cents,
             |        lag(cents, 12) OVER (PARTITION BY seg ORDER BY midx)
             |          AS prev_yr_cents
             |      FROM m)
             |SELECT seg, midx, CAST(cents AS BIGINT) AS cents,
             |       CAST(prev_yr_cents AS BIGINT) AS prev_yr_cents,
             |       round(CAST(cents - prev_yr_cents AS DOUBLE)
             |             / prev_yr_cents * 1e6, 6) AS yoy_ppm
             |FROM l WHERE prev_yr_cents IS NOT NULL
             |ORDER BY seg, midx""".stripMargin))
  )
}
