package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 ninth wave: categorical association, reliability metrics, the
  * eager-aggregation join rewrite, and the accumulating-snapshot fact.
  * Exact integer contingency/gap/milestone statistics; one terminal
  * rounded formula each.
  */
object Round10i {

  val decls: Map[String, Decl] = Map(
    // Cramér's V for event_type × ISO weekday — association strength on
    // the bounded 5×7 contingency grid. χ² from exact integer cell and
    // marginal counts (expected counts as exact rational cross-products,
    // the same cross-multiply discipline as agg_chi_square), one terminal
    // sqrt.
    "agg_cramers_v" -> Decl(
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(col("event_type").as("r"),
                  (weekday(col("ts")) + lit(1)).cast("bigint").as("c"))
          .groupBy("r", "c").agg(count(lit(1)).as("n"))
          .localCheckpoint(true)
        val rm = cells.groupBy("r").agg(sum(col("n")).as("nr"))
        val cm = cells.groupBy("c").agg(sum(col("n")).as("nc"))
        val tot = cells.agg(sum(col("n")).as("nt"),
                            countDistinct(col("r")).as("nrow"),
                            countDistinct(col("c")).as("ncol"))
        cells
          .join(broadcast(rm), "r").join(broadcast(cm), "c")
          .crossJoin(broadcast(tot))
          // per-cell χ² term: (n·nt − nr·nc)² / (nr·nc·nt), all exact ints
          // in the numerator/denominator before ONE double division
          .select((((col("n") * col("nt") - col("nr") * col("nc"))
                     * (col("n") * col("nt") - col("nr") * col("nc"))).cast("double")
                    / (col("nr") * col("nc") * col("nt")).cast("double")).as("term"),
                  col("nt"), col("nrow"), col("ncol"))
          .groupBy("nt", "nrow", "ncol")
          .agg(sum(col("term")).as("chi2"))
          .select(col("nt").as("n"),
                  round(col("chi2"), 6).as("chi2"),
                  round(sqrt(col("chi2") / (col("nt")
                          * least(col("nrow") - 1, col("ncol") - 1))), 6).as("cramers_v"))
      },
      Some("""WITH cells AS (SELECT event_type AS r,
             |                 CAST(isodow(ts) AS BIGINT) AS c, count(*) AS n
             |               FROM events GROUP BY 1, 2),
             |rm AS (SELECT r, sum(n) AS nr FROM cells GROUP BY r),
             |cm AS (SELECT c, sum(n) AS nc FROM cells GROUP BY c),
             |tot AS (SELECT sum(n) AS nt, count(DISTINCT r) AS nrow,
             |               count(DISTINCT c) AS ncol
             |        FROM cells),
             |terms AS (
             |  SELECT CAST((n * nt - nr * nc) * (n * nt - nr * nc) AS DOUBLE)
             |           / CAST(nr * nc * nt AS DOUBLE) AS term,
             |         nt, nrow, ncol
             |  FROM cells JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tot)
             |SELECT CAST(nt AS BIGINT) AS n, round(sum(term), 6) AS chi2,
             |       round(sqrt(sum(term) / (nt * least(nrow - 1, ncol - 1))), 6)
             |         AS cramers_v
             |FROM terms GROUP BY nt, nrow, ncol""".stripMargin)),

    // MTBF / MTTR per user from the error stream: mean gap between
    // consecutive errors (MTBF) and mean gap from each error to the next
    // non-error event (MTTR/recovery). Gap sums stay exact integer
    // micros; the two means are terminal ratios. Both windows ride the
    // per-user sort once.
    "ts_mttr_mtbf" -> Decl(
      (s, d) => {
        val ord = Window.partitionBy("user_id").orderBy("us", "event_id")
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  expr("unix_micros(ts)").as("us"))
        val gaps = ev.filter(col("event_type") === "error")
          .withColumn("prev_us",
            lag(col("us"), 1).over(Window.partitionBy("user_id")
              .orderBy("us", "event_id")))
          .filter(col("prev_us").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_gaps"),
               sum(col("us") - col("prev_us")).as("gap_us"))
        // recovery: for each event, the time since the latest PRECEDING
        // error (running max of error timestamps); the first non-error
        // after an error carries that error's recovery gap
        val rec = ev
          .withColumn("last_err_us",
            max(when(col("event_type") === "error", col("us")))
              .over(ord.rowsBetween(Window.unboundedPreceding, -1)))
          // lag BEFORE the error-row filter — the recovery row is the one
          // whose immediate predecessor (of ANY type) was the error
          .withColumn("prev_type", lag(col("event_type"), 1)
            .over(Window.partitionBy("user_id").orderBy("us", "event_id")))
          .filter(col("event_type") =!= "error" && col("last_err_us").isNotNull)
          .filter(col("prev_type") === "error")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_recoveries"),
               sum(col("us") - col("last_err_us")).as("rec_us"))
        // means as EXACT integer microseconds (floor division of positive
        // ints — rule R14: a rounded float ratio can straddle a 5e-7
        // boundary between the engines' rounding implementations)
        gaps.join(rec, Seq("user_id"), "full")
          .select(col("user_id"),
                  coalesce(col("n_gaps"), lit(0L)).as("n_gaps"),
                  expr("gap_us div n_gaps").as("mtbf_us"),
                  coalesce(col("n_recoveries"), lit(0L)).as("n_recoveries"),
                  expr("rec_us div n_recoveries").as("mttr_us"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type,
             |              CAST(epoch_us(ts) AS BIGINT) AS us
             |            FROM events),
             |g AS (SELECT user_id, count(*) AS n_gaps,
             |        sum(us - prev_us) AS gap_us
             |      FROM (SELECT user_id, us,
             |              lag(us) OVER (PARTITION BY user_id
             |                ORDER BY us, event_id) AS prev_us
             |            FROM ev WHERE event_type = 'error')
             |      WHERE prev_us IS NOT NULL GROUP BY user_id),
             |m AS (SELECT user_id, event_id, event_type, us,
             |        max(CASE WHEN event_type = 'error' THEN us END)
             |          OVER (PARTITION BY user_id ORDER BY us, event_id
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |          AS last_err_us,
             |        lag(event_type) OVER (PARTITION BY user_id
             |          ORDER BY us, event_id) AS prev_type
             |      FROM ev),
             |r AS (SELECT user_id, count(*) AS n_recoveries,
             |        sum(us - last_err_us) AS rec_us
             |      FROM m
             |      WHERE event_type <> 'error' AND last_err_us IS NOT NULL
             |        AND prev_type = 'error'
             |      GROUP BY user_id)
             |SELECT user_id,
             |       CAST(coalesce(n_gaps, 0) AS BIGINT) AS n_gaps,
             |       CAST(gap_us // n_gaps AS BIGINT) AS mtbf_us,
             |       CAST(coalesce(n_recoveries, 0) AS BIGINT) AS n_recoveries,
             |       CAST(rec_us // n_recoveries AS BIGINT) AS mttr_us
             |FROM g FULL JOIN r USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    // Eager aggregation: collapse the fact side BEFORE the dimension join
    // — the join input shrinks from |orders| to |customers| rows, the
    // classic warehouse rewrite Catalyst does not apply automatically.
    // One fact shuffle on the join key (which IS the group key, so the
    // aggregate and join share the partitioning), then a broadcastable
    // dim join.
    "agg_pushdown_eager" -> Decl(
      (s, d) => {
        val pre = Tables(s, d, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
               sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
        pre.join(Tables(s, d, "customer"),
                 col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment", "c_nationkey")
          .agg(sum(col("n_orders")).as("n_orders"),
               sum(col("cents")).as("cents"))
          .orderBy("c_mktsegment", "c_nationkey")
      },
      Some("""WITH pre AS (SELECT o_custkey, count(*) AS n_orders,
             |               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
             |             FROM orders GROUP BY o_custkey)
             |SELECT c_mktsegment, c_nationkey,
             |       CAST(sum(n_orders) AS BIGINT) AS n_orders,
             |       CAST(sum(cents) AS BIGINT) AS cents
             |FROM pre JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1, 2 ORDER BY c_mktsegment, c_nationkey""".stripMargin)),

    // Accumulating-snapshot fact: one row per order carrying its
    // milestone timeline — placement, first/last ship, line count, filled
    // value — the warehouse pattern for process-tracking facts. One
    // shuffle on the fact key shared by the aggregate and the join.
    "scd_accumulating_snapshot" -> Decl(
      (s, d) => {
        val lines = Tables(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(min(col("l_shipdate")).cast("date").as("first_ship"),
               max(col("l_shipdate")).cast("date").as("last_ship"),
               count(lit(1)).as("n_lines"),
               sum(round(col("l_extendedprice") * 100).cast("bigint")).as("cents"))
        Tables(s, d, "orders")
          .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("placed"),
                  col("first_ship"), col("last_ship"),
                  coalesce(col("n_lines"), lit(0L)).as("n_lines"),
                  coalesce(col("cents"), lit(0L)).as("cents"),
                  datediff(col("last_ship"), col("first_ship")).cast("bigint")
                    .as("ship_span_days"))
          .orderBy("o_orderkey")
      },
      Some("""WITH lines AS (SELECT l_orderkey,
             |                 CAST(min(l_shipdate) AS DATE) AS first_ship,
             |                 CAST(max(l_shipdate) AS DATE) AS last_ship,
             |                 count(*) AS n_lines,
             |                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
             |               FROM lineitem GROUP BY l_orderkey)
             |SELECT o_orderkey, CAST(o_orderdate AS DATE) AS placed,
             |       first_ship, last_ship,
             |       CAST(coalesce(n_lines, 0) AS BIGINT) AS n_lines,
             |       CAST(coalesce(cents, 0) AS BIGINT) AS cents,
             |       CAST(date_diff('day', first_ship, last_ship) AS BIGINT)
             |         AS ship_span_days
             |FROM orders LEFT JOIN lines ON o_orderkey = l_orderkey
             |ORDER BY o_orderkey""".stripMargin))
  )
}
