package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 second wave: behavioral/time-series analytics that round out
  * the events-table family — per-user event-mix entropy, order→ship
  * latency distribution, day-of-week×hour traffic profile, hour-over-hour
  * spike detection, and per-type burstiness (Fano factor). All follow the
  * repo's determinism discipline: counts stay BIGINT end-to-end, the only
  * floats are terminal `round(x, 6)` of logs/ratios over SMALL per-group
  * term counts (≤5 summands — the agg_mutual_info precedent, where both
  * engines' libm agree at 6 dp), and every ORDER BY ends in a unique key.
  *
  * 100 TB notes: every key here is one shuffle on its natural group key
  * (user_id / event_type / bucket) with partial aggregation upstream; the
  * spike window partitions by event_type but orders a BOUNDED per-type
  * hour spine (the aggregate runs first — the window sees hours, not
  * events), so no whole-history single-task funnel exists.
  */
object Round10b {

  val decls: Map[String, Decl] = Map(
    // Per-user Shannon entropy (bits) of the event-type mix — the
    // engagement-diversity score. Counts aggregate first (one shuffle,
    // map-side combine); the entropy sum has ≤5 terms per user, each
    // log2 of an exact rational c/n.
    "agg_entropy_bygroup" -> Decl(
      (s, d) => {
        val c = Tables.events(s, d)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        c.withColumn("n",
            sum(col("c")).over(Window.partitionBy("user_id")).cast("double"))
          .groupBy("user_id")
          .agg(sum(col("c")).as("n_events"),
               round(-sum((col("c") / col("n")) * log2(col("c") / col("n"))), 6)
                 .as("entropy_bits"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id, event_type, count(*) AS c
             |           FROM events GROUP BY user_id, event_type),
             |n AS (SELECT user_id, c,
             |        CAST(sum(c) OVER (PARTITION BY user_id) AS DOUBLE) AS n
             |      FROM c)
             |SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
             |       round(-sum((c / n) * log2(c / n)), 6) AS entropy_bits
             |FROM n GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Order→first-ship latency histogram: per order, days from order date
    // to its EARLIEST lineitem ship date, bucketed to weeks. The per-order
    // min is one shuffle on the already-grouped fact key; the histogram is
    // a second bounded-key aggregate. Exact integer day arithmetic.
    "ts_order_latency_hist" -> Decl(
      (s, d) => {
        Tables(s, d, "lineitem")
          .groupBy("l_orderkey").agg(min(col("l_shipdate")).as("first_ship"))
          .join(Tables(s, d, "orders"),
                col("l_orderkey") === col("o_orderkey"))
          .select(datediff(col("first_ship").cast("date"),
                           col("o_orderdate").cast("date")).as("lat_days"))
          .groupBy(floor(col("lat_days").cast("double") / 7.0d)
                     .cast("bigint").as("lat_week"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("lat_week")
      },
      // Latencies go NEGATIVE in this synthetic data (ship dates are not
      // causally after order dates), so the bucketing must FLOOR on both
      // sides — Spark's bigint `/` truncates toward zero and would
      // disagree on every negative week; `floor(days/7.0)` here matches
      // DuckDB's floor-division `//` exactly (|days| < 2^40, where double
      // division of integers is exact enough that floor cannot straddle).
      Some("""WITH f AS (SELECT l_orderkey, min(l_shipdate) AS first_ship
             |           FROM lineitem GROUP BY l_orderkey)
             |SELECT CAST(floor(date_diff('day', CAST(o_orderdate AS DATE),
             |                      CAST(first_ship AS DATE)) / 7.0) AS BIGINT)
             |         AS lat_week,
             |       CAST(count(*) AS BIGINT) AS n_orders
             |FROM f JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY lat_week""".stripMargin)),

    // Day-of-week × hour-band traffic profile — the capacity-planning
    // heatmap. ISO weekday (Mon=1) and 6-hour band are exact integer
    // functions of the UTC timestamp; one bounded-key (7×4) aggregate.
    "ts_dow_hour_profile" -> Decl(
      (s, d) => {
        Tables.events(s, d)
          .select((weekday(col("ts")) + lit(1)).cast("bigint").as("iso_dow"),
                  (hour(col("ts")).cast("bigint") / 6L).cast("bigint").as("band6h"),
                  col("value"))
          .groupBy("iso_dow", "band6h")
          .agg(count(lit(1)).as("n_events"),
               sum(round(col("value") * 100).cast("bigint")).as("value_cents"))
          .orderBy("iso_dow", "band6h")
      },
      Some("""SELECT CAST(isodow(ts) AS BIGINT) AS iso_dow,
             |       CAST(hour(ts) // 6 AS BIGINT) AS band6h,
             |       CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |         AS value_cents
             |FROM events GROUP BY 1, 2 ORDER BY iso_dow, band6h""".stripMargin)),

    // Hour-over-hour spike detector: per event type, hours whose count
    // exceeds 3× the previous observed hour (integer compare, no float
    // ratio). The lag window runs over the per-type HOUR SPINE (bounded:
    // the aggregate collapses events first), so a hot type costs one
    // small-partition window, never a whole-history funnel.
    "window_anomaly_spike" -> Decl(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"),
                   expr("unix_micros(ts) div 3600000000L").as("hr"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("event_type").orderBy("hr")
        hourly
          .withColumn("prev_c", lag(col("c"), 1).over(w))
          .filter(col("prev_c").isNotNull && col("c") > lit(3L) * col("prev_c"))
          .select(col("event_type"), col("hr"), col("c"), col("prev_c"))
          .orderBy("event_type", "hr")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type,
             |         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
             |         count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |lagd AS (SELECT event_type, hr, c,
             |           lag(c) OVER (PARTITION BY event_type ORDER BY hr)
             |             AS prev_c
             |         FROM hourly)
             |SELECT event_type, hr, CAST(c AS BIGINT) AS c,
             |       CAST(prev_c AS BIGINT) AS prev_c
             |FROM lagd WHERE prev_c IS NOT NULL AND c > 3 * prev_c
             |ORDER BY event_type, hr""".stripMargin)),

    // Burstiness (Fano factor) of hourly arrival counts per event type:
    // variance/mean of the per-hour counts, carried as exact integer
    // sufficient statistics (n, Σc, Σc²) to one terminal rounded float —
    // the agg_anova_f machinery pointed at arrival processes. Fano ≈ 1 is
    // Poisson; > 1 is bursty.
    "ts_burstiness_fano" -> Decl(
      (s, d) => {
        Tables.events(s, d)
          .groupBy(col("event_type"),
                   expr("unix_micros(ts) div 3600000000L").as("hr"))
          .agg(count(lit(1)).as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_hours"),
               sum(col("c")).as("sum_c"),
               sum(col("c") * col("c")).as("sum_c2"))
          .select(col("event_type"), col("n_hours"), col("sum_c"),
                  round((col("sum_c2").cast("double") * col("n_hours")
                          - col("sum_c").cast("double") * col("sum_c"))
                        / (col("n_hours").cast("double") * col("sum_c")), 6)
                    .as("fano"))
          .orderBy("event_type")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type,
             |         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
             |         count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |s AS (SELECT event_type, count(*) AS n_hours,
             |        sum(c) AS sum_c, sum(c * c) AS sum_c2
             |      FROM hourly GROUP BY event_type)
             |SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
             |       CAST(sum_c AS BIGINT) AS sum_c,
             |       round((CAST(sum_c2 AS DOUBLE) * n_hours
             |               - CAST(sum_c AS DOUBLE) * sum_c)
             |             / (CAST(n_hours AS DOUBLE) * sum_c), 6) AS fano
             |FROM s ORDER BY event_type""".stripMargin)),

    // IPv4 mint-and-parse: a deterministic synthetic address per order
    // (octets from key arithmetic), re-parsed into octets, numeric form,
    // and /24 network — the log-enrichment scalar family. Pure per-row
    // integer/string work riding the scan.
    "scalar_ipv4_parse" -> Decl(
      (s, d) => {
        Tables(s, d, "orders")
          .select(col("o_orderkey"),
                  concat_ws(".",
                    (lit(10L) + col("o_orderkey") % 200L).cast("string"),
                    ((col("o_orderkey") * 7L) % 256L).cast("string"),
                    ((col("o_orderkey") * 13L) % 256L).cast("string"),
                    ((col("o_orderkey") * 31L) % 256L).cast("string"))
                    .as("ip"))
          .withColumn("o1", split(col("ip"), "\\.").getItem(0).cast("bigint"))
          .withColumn("o2", split(col("ip"), "\\.").getItem(1).cast("bigint"))
          .withColumn("o3", split(col("ip"), "\\.").getItem(2).cast("bigint"))
          .withColumn("o4", split(col("ip"), "\\.").getItem(3).cast("bigint"))
          .select(col("o_orderkey"), col("ip"),
                  (col("o1") * 16777216L + col("o2") * 65536L
                    + col("o3") * 256L + col("o4")).as("ip_num"),
                  concat_ws(".", col("o1").cast("string"),
                            col("o2").cast("string"),
                            col("o3").cast("string"), lit("0"))
                    .as("net24"))
          .orderBy("o_orderkey")
      },
      Some("""WITH a AS (SELECT o_orderkey,
             |    CAST(10 + o_orderkey % 200 AS VARCHAR) || '.' ||
             |    CAST((o_orderkey * 7) % 256 AS VARCHAR) || '.' ||
             |    CAST((o_orderkey * 13) % 256 AS VARCHAR) || '.' ||
             |    CAST((o_orderkey * 31) % 256 AS VARCHAR) AS ip
             |  FROM orders),
             |p AS (SELECT o_orderkey, ip,
             |    CAST(string_split(ip, '.')[1] AS BIGINT) AS o1,
             |    CAST(string_split(ip, '.')[2] AS BIGINT) AS o2,
             |    CAST(string_split(ip, '.')[3] AS BIGINT) AS o3,
             |    CAST(string_split(ip, '.')[4] AS BIGINT) AS o4
             |  FROM a)
             |SELECT o_orderkey, ip,
             |       o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_num,
             |       CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.' ||
             |       CAST(o3 AS VARCHAR) || '.0' AS net24
             |FROM p ORDER BY o_orderkey""".stripMargin))
  )
}
