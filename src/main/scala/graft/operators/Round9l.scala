package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 twelfth wave: forecast-accuracy evaluation (WAPE against a
  * seasonal-persistence baseline), binary codec round-trips, and the
  * Wald–Wolfowitz runs test for series randomness.
  */
object Round9l {

  val decls: Map[String, Decl] = Map(
    // Forecast evaluation — WAPE of the lag-24 seasonal-persistence
    // baseline (ŷ_t = y_{t−24}) over the hourly click series: the
    // backtest metric every forecasting pipeline reports. The alignment
    // is one equi self-join on the bounded hourly grid (hr = hr − 24);
    // Σ|err| and Σy are exact BIGINTs and the WAPE ships as integer ppm
    // via the R14 arithmetic half-away rounding — no engine round() on a
    // per-metric ratio.
    "ts_forecast_wape" -> Decl(
      (s, d) => {
        val g = Tables.events(s, d)
          .filter(col("event_type") === "click")
          .select(expr("unix_micros(ts) div 3600000000L").as("hr"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .groupBy("hr").agg(sum(col("c")).as("y"))
        val f = g.select(col("hr").as("fhr"), col("y").as("yhat"))
        g.join(f, col("hr") === col("fhr") + 24)
          .agg(count(lit(1)).as("n"),
               sum(abs(col("y") - col("yhat"))).as("sum_abs_err"),
               sum(col("y")).as("sum_y"))
          .select(col("n"), col("sum_abs_err"), col("sum_y"),
                  expr("(sum_abs_err * 2000000L + sum_y) div (sum_y * 2)")
                    .as("wape_ppm"))
      },
      Some("""WITH g AS (SELECT epoch_us(ts) // 3600000000 AS hr,
             |             sum(CAST(round(value * 100) AS BIGINT)) AS y
             |           FROM events WHERE event_type = 'click' GROUP BY 1),
             |j AS (SELECT g.y, f.y AS yhat
             |      FROM g JOIN g f ON g.hr = f.hr + 24)
             |SELECT CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(abs(y - yhat)) AS BIGINT) AS sum_abs_err,
             |       CAST(sum(y) AS BIGINT) AS sum_y,
             |       CAST((sum(abs(y - yhat)) * 2000000 + sum(y)) //
             |            (sum(y) * 2) AS BIGINT) AS wape_ppm
             |FROM j""".stripMargin)),

    // Binary codec round-trips — the base64/hex encode-decode surface of
    // any ingestion layer (opaque payload transport, content addressing):
    // per part, the base64 transport form, the hex of the 4-byte prefix,
    // and a decode-identity flag that PROVES the round-trip on every row
    // (ok = 1 everywhere is asserted in spec, and hashed by the oracle).
    // Pure per-row projections riding the scan.
    "scalar_codec_roundtrip" -> Decl(
      (s, d) => {
        Tables(s, d, "part")
          .select(col("p_partkey"),
                  base64(encode(col("p_name"), "UTF-8")).as("b64"),
                  hex(encode(substring(col("p_name"), 1, 4), "UTF-8")).as("hex4"),
                  when(decode(unbase64(base64(encode(col("p_name"), "UTF-8"))), "UTF-8")
                         === col("p_name"), 1L).otherwise(0L).as("ok"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |  to_base64(encode(p_name)) AS b64,
             |  hex(encode(substr(p_name, 1, 4))) AS hex4,
             |  CAST(CASE WHEN decode(from_base64(to_base64(encode(p_name))))
             |              = p_name THEN 1 ELSE 0 END AS BIGINT) AS ok
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Wald–Wolfowitz runs test — is the hourly click series random around
    // its median, or trending/alternating? Median is the LOWER median by
    // integer rank on the bounded hourly grid (no interpolation); ties on
    // the median are dropped (the classic treatment); the run count is
    // one lag comparison over the bounded grid (aggregate-fed window);
    // and the z-statistic is one fixed double tree from three exact
    // BIGINTs (n1, n2, runs), rounded to 6 dp.
    "agg_runs_test" -> Decl(
      (s, d) => {
        val g = Tables.events(s, d)
          .filter(col("event_type") === "click")
          .select(expr("unix_micros(ts) div 3600000000L").as("hr"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .groupBy("hr").agg(sum(col("c")).as("y"))
        val tot = g.agg(count(lit(1)).as("n"))
        val ranked = g.select(col("y"), col("hr"))
          .withColumn("rn", row_number().over(Window.orderBy("y", "hr")))
          .crossJoin(broadcast(tot))
        val med = ranked.filter(col("rn") * 2 <= col("n") + 1)
          .agg(max(col("y")).as("med"))
        val signed = g.crossJoin(broadcast(med))
          .filter(col("y") =!= col("med"))
          .select(col("hr"), when(col("y") > col("med"), 1L).otherwise(0L).as("s"))
        val w = Window.orderBy("hr")
        val runs = signed
          .select(col("s"), lag(col("s"), 1).over(w).as("prev"))
          .agg(sum(when(col("prev").isNull || col("s") =!= col("prev"), 1L)
                     .otherwise(0L)).as("runs"),
               sum(col("s")).as("n1"),
               sum(lit(1L) - col("s")).as("n2"))
        runs.select(col("n1"), col("n2"), col("runs"),
          round((col("runs").cast("double") -
                 (lit(2.0) * col("n1") * col("n2") /
                  (col("n1") + col("n2")).cast("double") + 1.0)) /
                sqrt((lit(2.0) * col("n1") * col("n2") *
                      (lit(2.0) * col("n1") * col("n2") - col("n1") - col("n2"))) /
                     ((col("n1") + col("n2")).cast("double") *
                      (col("n1") + col("n2")).cast("double") *
                      (col("n1") + col("n2") - 1).cast("double"))), 6).as("z"))
      },
      Some("""WITH g AS (SELECT epoch_us(ts) // 3600000000 AS hr,
             |             sum(CAST(round(value * 100) AS BIGINT)) AS y
             |           FROM events WHERE event_type = 'click' GROUP BY 1),
             |rk AS (SELECT y, row_number() OVER (ORDER BY y, hr) AS rn,
             |         count(*) OVER () AS n FROM g),
             |m AS (SELECT max(y) AS med FROM rk WHERE rn * 2 <= n + 1),
             |s AS (SELECT hr, CASE WHEN y > med THEN 1 ELSE 0 END AS s
             |      FROM g, m WHERE y <> med),
             |r AS (SELECT s, lag(s) OVER (ORDER BY hr) AS prev FROM s),
             |agg AS (SELECT
             |    CAST(sum(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END)
             |         AS BIGINT) AS runs,
             |    CAST(sum(s) AS BIGINT) AS n1,
             |    CAST(sum(1 - s) AS BIGINT) AS n2
             |  FROM r)
             |SELECT n1, n2, runs,
             |  round((CAST(runs AS DOUBLE) -
             |         (2.0 * n1 * n2 / CAST(n1 + n2 AS DOUBLE) + 1.0)) /
             |        sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)) /
             |             (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE) *
             |              CAST(n1 + n2 - 1 AS DOUBLE))), 6) AS z
             |FROM agg""".stripMargin))
  )
}
