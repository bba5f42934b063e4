package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 twenty-second wave: the Ljung–Box portmanteau test (exact
  * per-lag sufficient statistics, fixed-order 10-term assembly) and
  * human-readable byte formatting.
  */
object Round10v {

  val decls: Map[String, Decl] = Map(
    // Ljung–Box Q over lags 1..10 of the hourly count series per event
    // type: each lag's autocorrelation comes from exact BIGINT pair sums
    // (n, Σx, Σy, Σxy, Σx², Σy²) on the bounded spine self-join; r_k²
    // terms pivot to one row per type and Q assembles them in a FIXED
    // left-to-right chain — no unordered float reduction anywhere.
    "ts_ljung_box" -> Decl(
      (s, d) => {
        val spine = Tables.events(s, d)
          .groupBy(col("event_type"),
                   expr("unix_micros(ts) div 3600000000L").as("hr"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(true)
        val lags = s.range(1, 11).select(col("id").as("lag"))
        val pairs = spine.crossJoin(broadcast(lags))
          .join(spine.select(col("event_type").as("et2"),
                             col("hr").as("hr2"), col("c").as("c2")),
                col("et2") === col("event_type") &&
                col("hr2") === col("hr") + col("lag"))
          .groupBy("event_type", "lag")
          .agg(count(lit(1)).as("nk"),
               sum(col("c")).as("sx"), sum(col("c2")).as("sy"),
               sum(col("c") * col("c2")).as("sxy"),
               sum(col("c") * col("c")).as("sxx"),
               sum(col("c2") * col("c2")).as("syy"))
        val r2 = pairs.select(col("event_type"), col("lag"),
          (((col("nk") * col("sxy") - col("sx") * col("sy"))
             * (col("nk") * col("sxy") - col("sx") * col("sy"))).cast("double")
            / ((col("nk") * col("sxx") - col("sx") * col("sx"))
                * (col("nk") * col("syy") - col("sy") * col("sy"))).cast("double"))
            .as("r2"))
        val n = spine.groupBy("event_type").agg(count(lit(1)).as("n"))
        val piv = r2.groupBy("event_type")
          .pivot("lag", (1 to 10).map(_.toString))
          .agg(first(col("r2")))
        val q = (1 to 10)
          .map(k => col(k.toString) / (col("n") - k).cast("double"))
          .reduceLeft(_ + _)
        piv.join(broadcast(n), "event_type")
          .select(col("event_type"), col("n").as("n_hours"),
                  round((col("n") * (col("n") + 2)).cast("double") * q, 6)
                    .as("ljung_box_q"))
          .orderBy("event_type")
      },
      Some("""WITH spine AS (
             |  SELECT event_type,
             |         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
             |         count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |n AS (SELECT event_type, count(*) AS n FROM spine GROUP BY 1),
             |pairs AS (
             |  SELECT a.event_type, l.lag, count(*) AS nk,
             |         sum(a.c) AS sx, sum(b.c) AS sy, sum(a.c * b.c) AS sxy,
             |         sum(a.c * a.c) AS sxx, sum(b.c * b.c) AS syy
             |  FROM spine a
             |       CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS lag) l
             |       JOIN spine b ON b.event_type = a.event_type
             |                   AND b.hr = a.hr + l.lag
             |  GROUP BY 1, 2),
             |r2 AS (SELECT event_type, lag,
             |         CAST((nk * sxy - sx * sy) * (nk * sxy - sx * sy) AS DOUBLE)
             |         / CAST((nk * sxx - sx * sx) * (nk * syy - sy * sy) AS DOUBLE)
             |           AS r2
             |       FROM pairs),
             |piv AS (SELECT event_type,
             |          max(CASE WHEN lag = 1 THEN r2 END) AS r1,
             |          max(CASE WHEN lag = 2 THEN r2 END) AS r2_,
             |          max(CASE WHEN lag = 3 THEN r2 END) AS r3,
             |          max(CASE WHEN lag = 4 THEN r2 END) AS r4,
             |          max(CASE WHEN lag = 5 THEN r2 END) AS r5,
             |          max(CASE WHEN lag = 6 THEN r2 END) AS r6,
             |          max(CASE WHEN lag = 7 THEN r2 END) AS r7,
             |          max(CASE WHEN lag = 8 THEN r2 END) AS r8,
             |          max(CASE WHEN lag = 9 THEN r2 END) AS r9,
             |          max(CASE WHEN lag = 10 THEN r2 END) AS r10
             |        FROM r2 GROUP BY event_type)
             |SELECT piv.event_type, CAST(n AS BIGINT) AS n_hours,
             |       round(CAST(n * (n + 2) AS DOUBLE) *
             |         (r1 / CAST(n - 1 AS DOUBLE) + r2_ / CAST(n - 2 AS DOUBLE)
             |          + r3 / CAST(n - 3 AS DOUBLE) + r4 / CAST(n - 4 AS DOUBLE)
             |          + r5 / CAST(n - 5 AS DOUBLE) + r6 / CAST(n - 6 AS DOUBLE)
             |          + r7 / CAST(n - 7 AS DOUBLE) + r8 / CAST(n - 8 AS DOUBLE)
             |          + r9 / CAST(n - 9 AS DOUBLE) + r10 / CAST(n - 10 AS DOUBLE)), 6)
             |         AS ljung_box_q
             |FROM piv JOIN n USING (event_type)
             |ORDER BY piv.event_type""".stripMargin)),

    // Human-readable byte formatting: exact integer floor divisions pick
    // the unit and the two-decimal mantissa (value·100 div unit) — no
    // log, no float, no locale. The report-rendering scalar family.
    "scalar_bytes_humanize" -> Decl(
      (s, d) => {
        val bytes = (col("o_orderkey") * 131071L + 1024L).as("n_bytes")
        Tables(s, d, "orders")
          .select(col("o_orderkey"), bytes)
          .select(col("o_orderkey"), col("n_bytes"),
                  when(col("n_bytes") >= 1073741824L,
                       concat((expr("n_bytes * 100 div 1073741824") / 100.0d).cast("string"),
                              lit(" GiB")))
                    .when(col("n_bytes") >= 1048576L,
                       concat((expr("n_bytes * 100 div 1048576") / 100.0d).cast("string"),
                              lit(" MiB")))
                    .when(col("n_bytes") >= 1024L,
                       concat((expr("n_bytes * 100 div 1024") / 100.0d).cast("string"),
                              lit(" KiB")))
                    .otherwise(concat(col("n_bytes").cast("string"), lit(" B")))
                    .as("human"))
          .orderBy("o_orderkey")
      },
      Some("""WITH b AS (SELECT o_orderkey,
             |             o_orderkey * 131071 + 1024 AS n_bytes
             |           FROM orders)
             |SELECT o_orderkey, CAST(n_bytes AS BIGINT) AS n_bytes,
             |       CASE WHEN n_bytes >= 1073741824
             |            THEN CAST(CAST(n_bytes * 100 // 1073741824 AS DOUBLE)
             |                      / 100.0 AS VARCHAR) || ' GiB'
             |            WHEN n_bytes >= 1048576
             |            THEN CAST(CAST(n_bytes * 100 // 1048576 AS DOUBLE)
             |                      / 100.0 AS VARCHAR) || ' MiB'
             |            WHEN n_bytes >= 1024
             |            THEN CAST(CAST(n_bytes * 100 // 1024 AS DOUBLE)
             |                      / 100.0 AS VARCHAR) || ' KiB'
             |            ELSE CAST(n_bytes AS VARCHAR) || ' B' END AS human
             |FROM b ORDER BY o_orderkey""".stripMargin))
  )
}
