package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 77: cross-engine table checksums (the reconciliation
  * primitive behind every 100 TB migration/copy audit: order-independent
  * per-bucket digests that two engines can compute independently and
  * diff — a mismatch localizes to one month instead of "somewhere in
  * the table") and the Hampel filter (rolling-median ± scaled-rolling-
  * MAD outlier replacement — the robust despiking step production
  * telemetry pipelines run before any model sees the series).
  *
  * Determinism: the checksum hashes a canonical '|'-joined row string
  * (integer cents, yyyy-MM-dd dates — no float formatting anywhere)
  * through md5, takes the top 60 bits as an integer, and folds with
  * the two classic order-independent combiners (exact DECIMAL(38,0)
  * sum — overflow-free at any corpus size — and bit XOR). Hampel runs
  * on the bounded 30-day × event-type grid with exact integer counts;
  * medians of 7-element frames interpolate identically (both engines
  * average the middle pair), landing on .5 steps that doubles carry
  * exactly.
  *
  * Scale shape: the checksum is one scan + one hash-partitioned
  * groupBy on the month — pure map-side-combinable aggregation. The
  * Hampel frame join is spine×7 over the calendar grid (never corpus
  * rows).
  */
object Round11u {

  val decls: Map[String, Decl] = Map(
    // Per-month reconciliation digests over orders: row count, exact
    // decimal sum of 60-bit md5 prefixes, and their XOR. Two engines
    // computing this independently agree iff the table contents agree
    // (up to md5 collisions) — and THIS oracle literally is the second
    // engine.
    "quality_table_checksum" -> Decl(
      (s, d) => {
        Tables(s, d, "orders")
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
                  conv(substring(md5(concat_ws("|",
                         col("o_orderkey"), col("o_custkey"),
                         col("o_orderstatus"),
                         round(col("o_totalprice") * 100).cast("bigint"),
                         date_format(col("o_orderdate"), "yyyy-MM-dd"),
                         col("o_orderpriority"))), 1, 15), 16, 10)
                    .cast("bigint").as("h"))
          .groupBy("month")
          .agg(count(lit(1)).as("n_rows"),
               // string form: the driver's hash encodes DECIMAL
               // engine-specifically, and a digest is an opaque token
               // anyway
               sum(col("h").cast("decimal(38,0)")).cast("string")
                 .as("sum_digest"),
               expr("bit_xor(h)").as("xor_digest"))
          .orderBy("month")
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |       count(*) AS n_rows,
             |       CAST(CAST(sum(h) AS DECIMAL(38,0)) AS VARCHAR) AS sum_digest,
             |       bit_xor(h) AS xor_digest
             |FROM (
             |  SELECT o_orderdate,
             |         ('0x' || substr(md5(
             |            CAST(o_orderkey AS VARCHAR) || '|' ||
             |            CAST(o_custkey AS VARCHAR) || '|' ||
             |            o_orderstatus || '|' ||
             |            CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR) || '|' ||
             |            strftime(o_orderdate, '%Y-%m-%d') || '|' ||
             |            o_orderpriority), 1, 15))::BIGINT AS h
             |  FROM orders)
             |GROUP BY month ORDER BY month""".stripMargin)),

    // Hampel despiking of the daily per-type event counts: frame
    // t±3 on the calendar spine, med = median(frame), mad =
    // median(|x − med|), spike iff |x − med| > 3·1.4826·mad; spikes
    // are replaced by the rolling median (the filter's output), all
    // exact on the integer/half-integer grid.
    "window_hampel_filter" -> Decl(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
                   datediff(col("ts").cast("date"), to_date(lit("2023-12-31")))
                     .cast("bigint").as("t"))
          .agg(count(lit(1)).as("x"))
        val spine = daily.select(col("event_type")).distinct()
          .crossJoin(broadcast(s.range(1, 31).select(col("id").as("t"))))
          .join(daily, Seq("event_type", "t"), "left")
          .select(col("event_type"), col("t"),
                  coalesce(col("x"), lit(0L)).as("x"))
        val frame = spine.as("c")
          .join(spine.as("f"),
                col("f.event_type") === col("c.event_type") &&
                  col("f.t") >= col("c.t") - 3 && col("f.t") <= col("c.t") + 3)
          .select(col("c.event_type").as("event_type"), col("c.t").as("t"),
                  col("c.x").as("x"), col("f.x").as("fx"))
        val med = frame.groupBy("event_type", "t", "x")
          .agg(median(col("fx")).as("med"))
        val mad = frame
          .join(med.select(col("event_type"), col("t"), col("med")),
                Seq("event_type", "t"))
          .groupBy("event_type", "t")
          .agg(median(abs(col("fx").cast("double") - col("med"))).as("mad"))
        med.join(mad, Seq("event_type", "t"))
          .withColumn("dev", abs(col("x").cast("double") - col("med")))
          .withColumn("is_spike",
            col("dev") > lit(3.0) * lit(1.4826) * col("mad"))
          .select(col("event_type"), col("t"), col("x"),
                  round(col("med"), 6).as("med"),
                  round(col("mad"), 6).as("mad"),
                  col("is_spike"),
                  round(when(col("is_spike"), col("med"))
                          .otherwise(col("x").cast("double")), 6)
                    .as("filtered"))
          .orderBy("event_type", "t")
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |         date_diff('day', DATE '2023-12-31', CAST(ts AS DATE)) AS t,
             |         count(*) AS x
             |  FROM events GROUP BY 1, 2),
             |spine AS (
             |  SELECT e.event_type, g.t, CAST(coalesce(d.x, 0) AS BIGINT) AS x
             |  FROM (SELECT DISTINCT event_type FROM daily) e
             |  CROSS JOIN generate_series(1, 30) g(t)
             |  LEFT JOIN daily d ON d.event_type = e.event_type AND d.t = g.t),
             |frame AS (
             |  SELECT c.event_type, c.t, c.x, f.x AS fx
             |  FROM spine c JOIN spine f
             |    ON f.event_type = c.event_type
             |   AND f.t BETWEEN c.t - 3 AND c.t + 3),
             |med AS (
             |  SELECT event_type, t, x, median(fx) AS med
             |  FROM frame GROUP BY event_type, t, x),
             |mad AS (
             |  SELECT f.event_type, f.t,
             |         median(abs(CAST(f.fx AS DOUBLE) - m.med)) AS mad
             |  FROM frame f JOIN med m
             |    ON m.event_type = f.event_type AND m.t = f.t
             |  GROUP BY f.event_type, f.t)
             |SELECT med.event_type, med.t, med.x,
             |       round(med.med, 6) AS med,
             |       round(mad.mad, 6) AS mad,
             |       abs(CAST(med.x AS DOUBLE) - med.med) > 3.0 * 1.4826 * mad.mad
             |         AS is_spike,
             |       round(CASE WHEN abs(CAST(med.x AS DOUBLE) - med.med) >
             |                       3.0 * 1.4826 * mad.mad
             |                  THEN med.med
             |                  ELSE CAST(med.x AS DOUBLE) END, 6) AS filtered
             |FROM med JOIN mad ON mad.event_type = med.event_type
             |                 AND mad.t = med.t
             |ORDER BY med.event_type, med.t""".stripMargin))
  )
}
