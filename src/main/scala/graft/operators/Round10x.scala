package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 twenty-fourth wave: sequence trigram mining, Zipf rank
  * tables, and the freshness audit.
  */
object Round10x {

  val decls: Map[String, Decl] = Map(
    // Event-type trigram census: the order-3 extension of the Markov
    // transition surface — which three-step behavioral motifs dominate.
    // Two leads on the shared per-user sort, then one bounded-key
    // (≤125) aggregate.
    "ts_event_trigrams" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  expr("unix_micros(ts)").as("us"))
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .filter(col("t3").isNotNull)
          .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
          .agg(count(lit(1)).as("n"))
          .orderBy("t1", "t2", "t3")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |             CAST(epoch_us(ts) AS BIGINT) AS us
             |           FROM events),
             |l AS (SELECT event_type AS t1,
             |        lead(event_type, 1) OVER w AS t2,
             |        lead(event_type, 2) OVER w AS t3
             |      FROM e
             |      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
             |SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
             |FROM l WHERE t3 IS NOT NULL
             |GROUP BY 1, 2, 3 ORDER BY t1, t2, t3""".stripMargin)),

    // Zipf rank table: the top-100 words by corpus frequency with their
    // rank — the vocabulary head every tokenizer design starts from.
    // The rank window runs over the VOCABULARY aggregate (bounded), and
    // the rank-1-normalized frequency ratio is one terminal division.
    "text_zipf_rank" -> Decl(
      (s, d) => {
        val counts = Tables(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n"))
        val rk = Window.orderBy(col("n").desc, col("w"))
        // Filter on the RAW row_number (not a cast of it): the cast would
        // block InferWindowGroupLimit's pattern, losing the per-partition
        // top-k guard that keeps this single-partition rank window fed
        // with <= 100·partitions rows instead of the whole vocabulary.
        val top = counts
          .withColumn("rk0", row_number().over(rk))
          .filter(col("rk0") <= 100)
          .withColumn("rank", col("rk0").cast("bigint"))
          .drop("rk0")
        val f1 = top.filter(col("rank") === 1).select(col("n").as("n1"))
        top.join(broadcast(f1))
          .select(col("rank"), col("w"), col("n"),
                  round(col("n").cast("double") / col("n1"), 6).as("rel_freq"))
          .orderBy("rank")
      },
      Some("""WITH c AS (SELECT w, count(*) AS n FROM (
             |            SELECT unnest(string_split(text, ' ')) AS w
             |            FROM documents) GROUP BY w),
             |r AS (SELECT w, n,
             |        CAST(row_number() OVER (ORDER BY n DESC, w) AS BIGINT) AS rank
             |      FROM c),
             |t AS (SELECT * FROM r WHERE rank <= 100),
             |f1 AS (SELECT n AS n1 FROM t WHERE rank = 1)
             |SELECT rank, w, CAST(n AS BIGINT) AS n,
             |       round(CAST(n AS DOUBLE) / n1, 6) AS rel_freq
             |FROM t CROSS JOIN f1 ORDER BY rank""".stripMargin)),

    // Freshness audit: the latest business timestamp per temporal table
    // against the fixture horizon — the staleness gate a scheduled
    // pipeline checks before publishing. One max-aggregate per table,
    // unioned.
    "quality_freshness_report" -> Decl(
      (s, d) => {
        val horizon = to_date(lit("2025-01-01"))
        val legs = Seq(
          Tables(s, d, "orders").agg(
            lit("orders").as("table_name"),
            max(col("o_orderdate").cast("date")).as("latest")),
          Tables(s, d, "lineitem").agg(
            lit("lineitem").as("table_name"),
            max(col("l_shipdate").cast("date")).as("latest")),
          Tables.events(s, d).agg(
            lit("events").as("table_name"),
            max(col("ts").cast("date")).as("latest")))
        legs.reduce(_ unionAll _)
          .select(col("table_name"), col("latest"),
                  datediff(horizon, col("latest")).cast("bigint")
                    .as("staleness_days"))
          .orderBy("table_name")
      },
      Some("""SELECT table_name, latest,
             |       CAST(date_diff('day', latest, DATE '2025-01-01') AS BIGINT)
             |         AS staleness_days
             |FROM (
             |  SELECT 'orders' AS table_name,
             |         CAST(max(o_orderdate) AS DATE) AS latest FROM orders
             |  UNION ALL SELECT 'lineitem', CAST(max(l_shipdate) AS DATE)
             |            FROM lineitem
             |  UNION ALL SELECT 'events', CAST(max(ts) AS DATE) FROM events)
             |ORDER BY table_name""".stripMargin))
  )
}
