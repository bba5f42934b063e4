package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 eighth wave: cohort economics, mark-join projection, interval
  * algebra, and weighted running ratios. Exact integer micros/cents into
  * terminal rounded ratios; windows ride user-bounded or spine-bounded
  * partitions only.
  */
object Round10h {

  val decls: Map[String, Decl] = Map(
    // Cohort LTV triangle: users cohort by first-event week; purchase
    // revenue accumulates by cohort × age-week. Two shuffles on natural
    // keys (user for the cohort, then the bounded cohort×age grid) and
    // one cumulative window over the ≤ (weeks × weeks) spine.
    "ts_cohort_ltv_matrix" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
                  expr("unix_micros(ts) div 604800000000L").as("wk"),
                  round(col("value") * 100).cast("bigint").as("cents"))
        val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
        val cells = ev.filter(col("event_type") === "purchase")
          .join(cohort, "user_id")
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("age_wk"))
          .agg(sum(col("cents")).as("rev_cents"),
               count(lit(1)).as("n_purchases"))
        val w = Window.partitionBy("cohort_wk").orderBy("age_wk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells
          .withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
          .select("cohort_wk", "age_wk", "n_purchases", "rev_cents", "cum_rev_cents")
          .orderBy("cohort_wk", "age_wk")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |              CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk,
             |              CAST(round(value * 100) AS BIGINT) AS cents
             |            FROM events),
             |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1),
             |cells AS (SELECT cohort_wk, ev.wk - cohort_wk AS age_wk,
             |            sum(cents) AS rev_cents, count(*) AS n_purchases
             |          FROM ev JOIN cohort USING (user_id)
             |          WHERE event_type = 'purchase'
             |          GROUP BY 1, 2)
             |SELECT cohort_wk, age_wk, CAST(n_purchases AS BIGINT) AS n_purchases,
             |       CAST(rev_cents AS BIGINT) AS rev_cents,
             |       CAST(sum(rev_cents) OVER (PARTITION BY cohort_wk ORDER BY age_wk
             |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_cents
             |FROM cells ORDER BY cohort_wk, age_wk""".stripMargin)),

    // Mark join: EXISTS as a PROJECTED boolean, not a filter — the
    // reference-engine operator class DuckDB plans as a MARK join. Spark
    // decorrelates the select-list EXISTS into an ExistenceJoin; no row
    // of the probe side is dropped or duplicated.
    "predicate_exists_project" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT c_custkey, c_mktsegment,
                |       EXISTS (SELECT 1 FROM orders
                |               WHERE o_custkey = c_custkey
                |                 AND o_totalprice > 300000.0) AS has_big_order
                |FROM customer ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_mktsegment,
             |       EXISTS (SELECT 1 FROM orders
             |               WHERE o_custkey = c_custkey
             |                 AND o_totalprice > 300000.0) AS has_big_order
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Interval union (merge-overlaps): each event claims [ts, ts+5 min);
    // per user, overlapping claims merge into maximal runs. New-run flag
    // compares against the running max of predecessors' ends — the
    // watermark-free sessionization primitive — then one cumulative sum
    // mints run ids. Output: per-user run count and exact covered micros.
    "ts_interval_union" -> Decl(
      (s, d) => {
        val span = 300000000L // 5 minutes in micros
        val ord = Window.partitionBy("user_id").orderBy("us", "event_id")
        val prevMax = ord.rowsBetween(Window.unboundedPreceding, -1)
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val runs = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  expr("unix_micros(ts)").as("us"))
          .withColumn("pmax", max(col("us") + span).over(prevMax))
          .withColumn("brk",
            when(col("pmax").isNull || col("us") > col("pmax"), 1L).otherwise(0L))
          .withColumn("run", sum(col("brk")).over(cum))
          .groupBy("user_id", "run")
          .agg(min(col("us")).as("run_start"),
               max(col("us") + span).as("run_end"))
        runs.groupBy("user_id")
          .agg(count(lit(1)).as("n_runs"),
               sum(col("run_end") - col("run_start")).as("covered_us"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |             CAST(epoch_us(ts) AS BIGINT) AS us
             |           FROM events),
             |m AS (SELECT user_id, event_id, us,
             |        max(us + 300000000) OVER (PARTITION BY user_id
             |          ORDER BY us, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             |      FROM e),
             |b AS (SELECT user_id, us,
             |        CASE WHEN pmax IS NULL OR us > pmax THEN 1 ELSE 0 END AS brk,
             |        event_id
             |      FROM m),
             |r AS (SELECT user_id, us,
             |        sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                       ROWS UNBOUNDED PRECEDING) AS run
             |      FROM b),
             |runs AS (SELECT user_id, run, min(us) AS run_start,
             |                max(us + 300000000) AS run_end
             |         FROM r GROUP BY 1, 2)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_runs,
             |       CAST(sum(run_end - run_start) AS BIGINT) AS covered_us
             |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Running volume-weighted average price per user: cumulative
    // Σ(price·qty)/Σqty over the user's purchase history — both running
    // sums exact BIGINT (price in cents, qty minted 1..5 from the id),
    // one terminal rounded division per row.
    "window_vwap_running" -> Decl(
      (s, d) => {
        val ord = Window.partitionBy("user_id").orderBy("us", "event_id")
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
                  expr("unix_micros(ts)").as("us"),
                  round(col("value") * 100).cast("bigint").as("px"),
                  (col("event_id") % 5L + 1L).as("qty"))
          .withColumn("cum_pv", sum(col("px") * col("qty")).over(cum))
          .withColumn("cum_v", sum(col("qty")).over(cum))
          .select(col("user_id"), col("event_id"), col("cum_pv"), col("cum_v"),
                  round(col("cum_pv").cast("double") / col("cum_v"), 6).as("vwap"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH p AS (SELECT user_id, event_id,
             |             CAST(epoch_us(ts) AS BIGINT) AS us,
             |             CAST(round(value * 100) AS BIGINT) AS px,
             |             event_id % 5 + 1 AS qty
             |           FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, event_id,
             |        sum(px * qty) OVER w AS cum_pv,
             |        sum(qty) OVER w AS cum_v
             |      FROM p
             |      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
             |                   ROWS UNBOUNDED PRECEDING))
             |SELECT user_id, event_id, CAST(cum_pv AS BIGINT) AS cum_pv,
             |       CAST(cum_v AS BIGINT) AS cum_v,
             |       round(CAST(cum_pv AS DOUBLE) / cum_v, 6) AS vwap
             |FROM c ORDER BY user_id, event_id""".stripMargin))
  )
}
