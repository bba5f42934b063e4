package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-9 twentieth wave: empirical-Bayes smoothed rates and permissive
  * CSV ingestion with corrupt-record accounting.
  */
object Round9t {

  val decls: Map[String, Decl] = Map(
    // Laplace-smoothed rate — ranking segments by a rate when some have
    // tiny samples: the raw short-doc rate per source plus the
    // add-one-smoothed posterior mean (x+1)/(n+2), both as integer ppm
    // (R14) from exact counts — the empirical-Bayes fix that keeps a
    // 1-of-1 segment from ranking above a 99-of-100 one. One bounded
    // groupBy over the documents scan.
    "agg_laplace_rate" -> Decl(
      (s, d) => {
        Tables(s, d, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n"),
               sum(when(col("n_chars") < 200, 1L).otherwise(0L)).as("x"))
          .select(col("source"), col("n"), col("x"),
                  expr("(x * 2000000L + n) div (2 * n)").as("raw_ppm"),
                  expr("((x + 1) * 2000000L + (n + 2)) div (2 * (n + 2))")
                    .as("smoothed_ppm"))
          .orderBy("source")
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS x,
             |  CAST((sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) * 2000000
             |        + count(*)) // (2 * count(*)) AS BIGINT) AS raw_ppm,
             |  CAST(((sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) + 1) * 2000000
             |        + (count(*) + 2)) // (2 * (count(*) + 2)) AS BIGINT)
             |    AS smoothed_ppm
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // Permissive CSV ingestion — the malformed-feed reality of any raw
    // intake: a CSV written from orders with every 11th row deliberately
    // truncated (field dropped), read back under PERMISSIVE mode so bad
    // rows surface as NULL-padded rows instead of killing the job; the
    // report counts clean vs corrupt and aggregates ONLY the clean
    // cents. The oracle derives all three numbers from the base table
    // and the corruption rule — proving permissive parsing recovered
    // every uncorrupted row bit-exactly and quarantined exactly the
    // corrupted ones.
    "source_csv_permissive" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_csvperm")
        val out = dir.resolve("orders_dirty.csv").toString
        Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
                  round(col("o_totalprice") * 100).cast("bigint").as("cents"))
          // corrupt every 11th row: drop the cents field entirely
          .select(when(col("o_orderkey") % 11 === 0,
                       concat_ws(",", col("o_orderkey"), col("o_orderstatus")))
                    .otherwise(concat_ws(",", col("o_orderkey"),
                                         col("o_orderstatus"), col("cents")))
                    .as("line"))
          .coalesce(1).write.mode("overwrite").text(out)
        val schema = "o_orderkey BIGINT, o_orderstatus STRING, cents BIGINT"
        val back = s.read
          .schema(schema)
          .option("mode", "PERMISSIVE")
          .csv(out)
        back.agg(
            count(when(col("cents").isNotNull, 1)).as("n_clean"),
            count(when(col("cents").isNull, 1)).as("n_corrupt"),
            sum(col("cents")).as("clean_cents"))
      },
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE o_orderkey % 11 <> 0) AS BIGINT)
             |    AS n_clean,
             |  CAST(count(*) FILTER (WHERE o_orderkey % 11 = 0) AS BIGINT)
             |    AS n_corrupt,
             |  CAST(sum(CASE WHEN o_orderkey % 11 <> 0
             |            THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
             |       AS BIGINT) AS clean_cents
             |FROM orders""".stripMargin))
  )
}
