package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 83: intermittent-demand forecasting and scale-free
  * forecast evaluation — Croston's method (the classical
  * sparse-demand smoother: separate exponential smoothing of demand
  * SIZES and demand INTERVALS, forecast = size/interval; the standard
  * tool when most periods sell zero) on the deterministically sparse
  * high-value purchase series, and MASE + sMAPE for the 7-day seasonal-
  * naive forecast (the two scale-free metrics that let forecast error
  * compare across series of different volume).
  *
  * Determinism: Croston's α = 0.2 recursion runs on the driver over
  * the 30-day grid (the ts_holt_winters discipline) and the oracle
  * replays the identical recursion as a DuckDB recursive CTE carrying
  * (z, x, last-seen) — same literals, same operation order, identical
  * doubles. MASE is a ratio of integer |error| sums (exact); sMAPE
  * folds its 23 bounded per-day terms in day order.
  *
  * Scale shape: both keys reduce the corpus to the calendar spine in
  * one aggregate; the recursions/folds run on ≤30 rows.
  */
object Round12a {

  /** Croston smoothing constant and its EXACT-double complement —
    * 1 − 0.2 in IEEE is NOT the 0.8 literal, so both engines consume
    * the same interpolated values. */
  private val A = 0.2
  private val B = 1 - A

  val decls: Map[String, Decl] = Map(
    // Croston (α = 0.2): demand d_t = daily purchases of the sparse
    // user_id ≡ 3 (mod 997) cohort — a genuinely intermittent series
    // (roughly half the days sell zero at small SFs). On demand days: z ← αd + (1−α)z,
    // x ← αq + (1−α)x where q = periods since the previous demand;
    // initialized at the first demand (z = d, x = q = first index).
    "ts_croston_intermittent" -> Decl(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase" &&
                  pmod(col("user_id"), lit(997L)) === 3)
          .groupBy(datediff(col("ts").cast("date"), to_date(lit("2023-12-31")))
                     .cast("bigint").as("t"))
          .agg(count(lit(1)).as("dd"))
        val dArr = {
          val m = daily.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          (1 to 30).map(t => m.getOrElse(t.toLong, 0L)).toArray
        }
        var z = 0.0; var x = 0.0; var last = 0; var seen = false
        val rows = (1 to 30).map { t =>
          val dt = dArr(t - 1)
          if (dt > 0) {
            val q = (t - last).toDouble
            if (!seen) { z = dt.toDouble; x = q; seen = true }
            else { z = A * dt + B * z; x = A * q + B * x }
            last = t
          }
          val f = if (seen) z / x else 0.0
          (t.toLong, dt,
           BigDecimal(if (seen) z else 0.0)
             .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
           BigDecimal(if (seen) x else 0.0)
             .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
           BigDecimal(f).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        import s.implicits._
        rows.toDF("t", "demand", "z_size", "x_interval", "croston_forecast")
          .orderBy("t")
      },
      Some(s"""WITH RECURSIVE daily AS (
             |  SELECT date_diff('day', DATE '2023-12-31', CAST(ts AS DATE)) AS t,
             |         count(*) AS dd
             |  FROM events
             |  WHERE event_type = 'purchase' AND user_id % 997 = 3
             |  GROUP BY 1),
             |spine AS (
             |  SELECT g.t, CAST(coalesce(dd, 0) AS BIGINT) AS dd
             |  FROM generate_series(1, 30) g(t) LEFT JOIN daily ON daily.t = g.t),
             |dl AS (SELECT list(dd ORDER BY t) AS l FROM spine),
             |cr(t, z, x, last_t, seen) AS (
             |  SELECT 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), 0, false FROM dl
             |  UNION ALL
             |  SELECT t + 1,
             |    CASE WHEN dl.l[t + 1] = 0 THEN z
             |         WHEN NOT seen THEN CAST(dl.l[t + 1] AS DOUBLE)
             |         ELSE CAST($A AS DOUBLE) * dl.l[t + 1] + CAST($B AS DOUBLE) * z END,
             |    CASE WHEN dl.l[t + 1] = 0 THEN x
             |         WHEN NOT seen THEN CAST(t + 1 - last_t AS DOUBLE)
             |         ELSE CAST($A AS DOUBLE) * (t + 1 - last_t) + CAST($B AS DOUBLE) * x END,
             |    CASE WHEN dl.l[t + 1] = 0 THEN last_t ELSE t + 1 END,
             |    seen OR dl.l[t + 1] > 0
             |  FROM cr CROSS JOIN dl WHERE t < 30)
             |SELECT cr.t AS t, dl.l[cr.t] AS demand,
             |       round(CASE WHEN seen THEN z ELSE 0.0 END, 6) AS z_size,
             |       round(CASE WHEN seen THEN x ELSE 0.0 END, 6) AS x_interval,
             |       round(CASE WHEN seen THEN z / x ELSE 0.0 END, 6)
             |         AS croston_forecast
             |FROM cr CROSS JOIN dl WHERE cr.t >= 1
             |ORDER BY t""".stripMargin)),

    // Seasonal-naive (lag-7) forecast of daily purchases evaluated on
    // days 8–30: MASE scales its MAE by the in-sample lag-1 naive MAE
    // (days 2–30); sMAPE folds day-ordered.
    "ts_forecast_mase_smape" -> Decl(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(datediff(col("ts").cast("date"), to_date(lit("2023-12-31")))
                     .cast("bigint").as("t"))
          .agg(count(lit(1)).as("y"))
        val spine = s.range(1, 31).select(col("id").as("t"))
          .join(daily, Seq("t"), "left")
          .select(col("t"), coalesce(col("y"), lit(0L)).as("y"))
        val j = spine.as("c")
          .join(spine.as("s7"), col("s7.t") === col("c.t") - 7)
          .select(col("c.t").as("t"), col("c.y").as("y"),
                  col("s7.y").as("f"))
        val naive = spine.as("c")
          .join(spine.as("s1"), col("s1.t") === col("c.t") - 1)
          .agg(sum(abs(col("c.y") - col("s1.y"))).as("naive_ae"),
               count(lit(1)).as("n_naive"))
        val fcst = j.agg(
          sum(abs(col("y") - col("f"))).as("fc_ae"),
          count(lit(1)).as("n_fc"),
          expr("round(aggregate(array_sort(collect_list(struct(t, " +
               "(CASE WHEN y + f = 0 THEN CAST(0.0 AS DOUBLE) " +
               "ELSE CAST(2 AS DOUBLE) * abs(y - f) / (y + f) END) AS sm))), " +
               "CAST(0.0 AS DOUBLE), (acc, p) -> acc + p.sm), 6)")
            .as("smape_sum"))
        fcst.crossJoin(broadcast(naive))
          .select(col("n_fc").cast("bigint").as("n_eval"),
                  round(col("fc_ae").cast("double") / col("n_fc"), 6)
                    .as("forecast_mae"),
                  round((col("fc_ae").cast("double") / col("n_fc")) /
                          (col("naive_ae").cast("double") / col("n_naive")), 6)
                    .as("mase"),
                  round(col("smape_sum") / col("n_fc"), 6).as("smape"))
      },
      Some("""WITH daily AS (
             |  SELECT date_diff('day', DATE '2023-12-31', CAST(ts AS DATE)) AS t,
             |         count(*) AS y
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |spine AS (
             |  SELECT g.t, CAST(coalesce(y, 0) AS BIGINT) AS y
             |  FROM generate_series(1, 30) g(t) LEFT JOIN daily ON daily.t = g.t),
             |j AS (SELECT c.t, c.y, s7.y AS f
             |      FROM spine c JOIN spine s7 ON s7.t = c.t - 7),
             |naive AS (SELECT sum(abs(c.y - s1.y)) AS naive_ae,
             |                 count(*) AS n_naive
             |          FROM spine c JOIN spine s1 ON s1.t = c.t - 1),
             |fc AS (SELECT sum(abs(y - f)) AS fc_ae, count(*) AS n_fc,
             |              round(list_sum(list(
             |                CASE WHEN y + f = 0 THEN CAST(0.0 AS DOUBLE)
             |                     ELSE CAST(2 AS DOUBLE) * abs(y - f) / (y + f) END
             |                ORDER BY t)), 6) AS smape_sum
             |       FROM j)
             |SELECT CAST(n_fc AS BIGINT) AS n_eval,
             |       round(CAST(fc_ae AS DOUBLE) / n_fc, 6) AS forecast_mae,
             |       round((CAST(fc_ae AS DOUBLE) / n_fc) /
             |             (CAST(naive_ae AS DOUBLE) / n_naive), 6) AS mase,
             |       round(smape_sum / n_fc, 6) AS smape
             |FROM fc CROSS JOIN naive""".stripMargin))
  )
}
