package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 twentieth wave: class-balanced sampling on the native
  * bounded-heap operator, empirical-Bayes rate smoothing, and the
  * primary-key uniqueness audit.
  */
object Round10t {

  val decls: Map[String, Decl] = Map(
    // Class-balanced downsample: every event type keeps exactly
    // min-class-size rows, chosen by deterministic hash rank — the
    // imbalanced-training-set fix. The per-class pick runs on the NATIVE
    // TopKPerKey operator (bounded heaps, no per-class sort — the same
    // plan the funnel gate demands); the min class size is one 5-row
    // aggregate collected to the driver (KB, documented pattern).
    "sample_class_balanced" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("user_id"),
                  pmod(col("event_id") * lit(2654435761L), lit(1000000007L))
                    .as("hkey"))
        val m = ev.groupBy("event_type").count()
          .agg(min("count")).collect()(0).getLong(0).toInt
        graft.plans.TopK.perKey(ev, Seq("event_type"),
            Seq("hkey" -> false, "event_id" -> false), m)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_kept"),
               sum(col("user_id")).as("user_id_sum"),
               min(col("hkey")).as("min_hkey"))
          .orderBy("event_type")
      },
      Some("""WITH h AS (SELECT event_id, event_type, user_id,
             |             (event_id * 2654435761) % 1000000007 AS hkey
             |           FROM events),
             |m AS (SELECT min(n) AS m FROM
             |        (SELECT count(*) AS n FROM h GROUP BY event_type)),
             |r AS (SELECT event_type, user_id, hkey,
             |        row_number() OVER (PARTITION BY event_type
             |          ORDER BY hkey, event_id) AS rn
             |      FROM h)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
             |       CAST(sum(user_id) AS BIGINT) AS user_id_sum,
             |       CAST(min(hkey) AS BIGINT) AS min_hkey
             |FROM r CROSS JOIN m WHERE rn <= m
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Empirical-Bayes smoothed high-value rate per user: (k + α·p̂)/(n + α)
    // with α = 20 pseudo-observations at the global rate — the shrinkage
    // every per-entity leaderboard needs before ranking small-n entities.
    // Exact integer cross-multiplies; the smoothed rate is one terminal
    // expression with identical operation order in both engines.
    "agg_rate_bayes_smooth" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
                  when(round(col("value") * 100).cast("bigint") > 50000L, 1L)
                    .otherwise(0L).as("y"))
        val per = ev.groupBy("user_id")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("k"))
        val glob = ev.agg(count(lit(1)).as("ng"), sum(col("y")).as("kg"))
        per.crossJoin(broadcast(glob))
          .select(col("user_id"), col("n"), col("k"),
                  round((col("k").cast("double")
                          + lit(20.0d) * col("kg") / col("ng"))
                        / (col("n") + lit(20L)).cast("double"), 6)
                    .as("rate_smoothed"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id,
             |              CASE WHEN CAST(round(value * 100) AS BIGINT) > 50000
             |                   THEN 1 ELSE 0 END AS y
             |            FROM events),
             |per AS (SELECT user_id, count(*) AS n, sum(y) AS k
             |        FROM ev GROUP BY user_id),
             |gstats AS (SELECT count(*) AS ng, sum(y) AS kg FROM ev)
             |SELECT user_id, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             |       round((CAST(k AS DOUBLE) + 20.0 * kg / ng)
             |             / CAST(n + 20 AS DOUBLE), 6) AS rate_smoothed
             |FROM per CROSS JOIN gstats ORDER BY user_id""".stripMargin)),

    // Primary-key uniqueness audit across every fixture table — the
    // first data-quality gate any warehouse load runs. One
    // count/count-distinct pair per table, unioned into the audit
    // report; each leg is a single partial-agg shuffle.
    "quality_pk_uniqueness" -> Decl(
      (s, d) => {
        def leg(table: String, pk: String) =
          Tables(s, d, table).agg(
            lit(table).as("table_name"),
            count(lit(1)).as("n_rows"),
            countDistinct(col(pk)).as("n_distinct_pk"))
        Seq(("customer", "c_custkey"), ("orders", "o_orderkey"),
            ("part", "p_partkey"), ("supplier", "s_suppkey"),
            ("events", "event_id"), ("documents", "doc_id"),
            ("embeddings", "vec_id"))
          .map { case (t, k) => leg(t, k) }
          .reduce(_ unionAll _)
          .select(col("table_name"), col("n_rows"), col("n_distinct_pk"),
                  (col("n_rows") - col("n_distinct_pk")).as("n_dup_keys"))
          .orderBy("table_name")
      },
      Some("""SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
             |       CAST(n_distinct_pk AS BIGINT) AS n_distinct_pk,
             |       CAST(n_rows - n_distinct_pk AS BIGINT) AS n_dup_keys
             |FROM (
             |  SELECT 'customer' AS table_name, count(*) AS n_rows,
             |         count(DISTINCT c_custkey) AS n_distinct_pk FROM customer
             |  UNION ALL SELECT 'orders', count(*), count(DISTINCT o_orderkey)
             |            FROM orders
             |  UNION ALL SELECT 'part', count(*), count(DISTINCT p_partkey)
             |            FROM part
             |  UNION ALL SELECT 'supplier', count(*), count(DISTINCT s_suppkey)
             |            FROM supplier
             |  UNION ALL SELECT 'events', count(*), count(DISTINCT event_id)
             |            FROM events
             |  UNION ALL SELECT 'documents', count(*), count(DISTINCT doc_id)
             |            FROM documents
             |  UNION ALL SELECT 'embeddings', count(*), count(DISTINCT vec_id)
             |            FROM embeddings)
             |ORDER BY table_name""".stripMargin))
  )
}
