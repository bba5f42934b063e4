package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 eighteenth wave: SCD type-1 latest attributes, linear-weighted
  * moving averages in exact integers, and the named-WINDOW SQL surface.
  */
object Round10r {

  val decls: Map[String, Decl] = Map(
    // SCD type 1: each customer's CURRENT attributes from their latest
    // order (latest by date, orderkey tie-break) — the overwrite-history
    // dimension refresh. One row_number over the per-customer history.
    "scd1_latest_attrs" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        Tables(s, d, "orders")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
                  col("o_orderdate").cast("date").as("latest_date"),
                  col("o_orderstatus").as("cur_status"),
                  col("o_orderpriority").as("cur_priority"),
                  round(col("o_totalprice") * 100).cast("bigint").as("cur_cents"))
          .orderBy("o_custkey")
      },
      Some("""WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate,
             |             o_orderstatus, o_orderpriority, o_totalprice,
             |             row_number() OVER (PARTITION BY o_custkey
             |               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
             |           FROM orders)
             |SELECT o_custkey, o_orderkey AS latest_orderkey,
             |       CAST(o_orderdate AS DATE) AS latest_date,
             |       o_orderstatus AS cur_status,
             |       o_orderpriority AS cur_priority,
             |       CAST(round(o_totalprice * 100) AS BIGINT) AS cur_cents
             |FROM r WHERE rk = 1 ORDER BY o_custkey""".stripMargin)),

    // Linear-weighted moving average over the trailing 10 events: weights
    // 1..10 by recency, numerator and denominator EXACT BIGINTs via an
    // indexed fold over the frame-ordered collected window (both engines
    // materialize the frame in ORDER BY order), one terminal division.
    "window_weighted_ma" -> Decl(
      (s, d) => {
        val f = Window.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(-9, 0)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  expr("unix_micros(ts)").as("us"),
                  round(col("value") * 100).cast("bigint").as("x"))
          .withColumn("xs", collect_list(col("x")).over(f))
          .select(col("user_id"), col("event_id"),
                  expr("aggregate(zip_with(xs, sequence(1L, size(xs)), (x, i) -> x * i), 0L, (a, v) -> a + v)")
                    .as("wnum"),
                  expr("size(xs) * (size(xs) + 1L) div 2").as("wden"))
          .select(col("user_id"), col("event_id"), col("wnum"), col("wden"),
                  round(col("wnum").cast("double") / col("wden"), 6).as("wma"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |             CAST(epoch_us(ts) AS BIGINT) AS us,
             |             CAST(round(value * 100) AS BIGINT) AS x
             |           FROM events),
             |c AS (SELECT user_id, event_id,
             |        list(x) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS xs
             |      FROM e),
             |w AS (SELECT user_id, event_id,
             |        list_sum(list_transform(generate_series(1, len(xs)),
             |                                i -> xs[i] * i)) AS wnum,
             |        len(xs) * (len(xs) + 1) // 2 AS wden
             |      FROM c)
             |SELECT user_id, event_id, CAST(wnum AS BIGINT) AS wnum,
             |       CAST(wden AS BIGINT) AS wden,
             |       round(CAST(wnum AS DOUBLE) / wden, 6) AS wma
             |FROM w ORDER BY user_id, event_id""".stripMargin)),

    // Named WINDOW clause: one window specification shared by four
    // analytic functions — the SQL surface that keeps complex analytic
    // SELECTs readable (and lets the planner share one sort).
    "sql_named_window" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT o_custkey, o_orderkey,
                |       CAST(row_number() OVER w AS BIGINT) AS seq,
                |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                |            OVER wc AS BIGINT) AS run_cents,
                |       CAST(lag(o_orderkey) OVER w AS BIGINT) AS prev_key
                |FROM orders
                |WINDOW w AS (PARTITION BY o_custkey
                |             ORDER BY o_orderdate, o_orderkey),
                |       wc AS (PARTITION BY o_custkey
                |              ORDER BY o_orderdate, o_orderkey
                |              ROWS UNBOUNDED PRECEDING)
                |ORDER BY o_custkey, o_orderkey""".stripMargin)
      },
      Some("""SELECT o_custkey, o_orderkey,
             |       CAST(row_number() OVER w AS BIGINT) AS seq,
             |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |            OVER wc AS BIGINT) AS run_cents,
             |       CAST(lag(o_orderkey) OVER w AS BIGINT) AS prev_key
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey),
             |       wc AS (PARTITION BY o_custkey
             |              ORDER BY o_orderdate, o_orderkey
             |              ROWS UNBOUNDED PRECEDING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin))
  )
}
