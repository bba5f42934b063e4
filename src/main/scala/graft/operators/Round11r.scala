package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 74: SQL-surface UNPIVOT clause (the parser-level
  * inverse of wave-19's PIVOT — metric columns rotated into rows, the
  * wide-to-long reshape every metrics warehouse runs before plotting)
  * and a lag-1 Granger causality test between the daily click and
  * purchase series (does yesterday's click count improve today's
  * purchase prediction beyond yesterday's purchases? — the standard
  * lead-indicator screen, here in one aggregate pass via closed-form
  * OLS on both nested models and the F-ratio of their residual sums).
  *
  * Determinism: UNPIVOT emits pure BIGINT metrics under a total order.
  * Granger folds the 29 lagged observations into ten integer-exact
  * sums (counts ≤ ~1e5, triple products ≤ ~5e11 — every intermediate
  * is exactly representable in a double), then both engines evaluate
  * the SAME Cramer-rule expressions over the same exact inputs, so the
  * divisions land on identical IEEE doubles; outputs round 6 dp.
  *
  * Scale shape: UNPIVOT is a generator over an already-aggregated
  * |segments|-row frame. Granger reduces the corpus to the 30-day
  * calendar spine in ONE shuffle (the ts_* discipline); the lag join
  * and the model algebra run on ≤30 rows.
  */
object Round11r {

  val decls: Map[String, Decl] = Map(
    // SQL UNPIVOT clause (the parser surface, not the DataFrame
    // `.unpivot` API — that is agg_unpivot, Aggregates.scala): rotate
    // three per-segment metric COLUMNS into (metric, val) rows. The
    // oracle is the portable three-branch UNION ALL reshape.
    "sql_unpivot_clause" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT c_mktsegment, metric, val
                |FROM (SELECT c_mktsegment,
                |             CAST(count(*) AS BIGINT) AS n_customers,
                |             CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
                |             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
                |      FROM customer GROUP BY c_mktsegment)
                |UNPIVOT (val FOR metric IN (n_customers, n_nations, bal_cents))
                |ORDER BY c_mktsegment, metric""".stripMargin)
      },
      Some("""WITH a AS (
             |  SELECT c_mktsegment,
             |         CAST(count(*) AS BIGINT) AS n_customers,
             |         CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
             |         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
             |  FROM customer GROUP BY c_mktsegment)
             |SELECT c_mktsegment, 'n_customers' AS metric, n_customers AS val FROM a
             |UNION ALL
             |SELECT c_mktsegment, 'n_nations', n_nations FROM a
             |UNION ALL
             |SELECT c_mktsegment, 'bal_cents', bal_cents FROM a
             |ORDER BY c_mktsegment, metric""".stripMargin)),

    // Lag-1 Granger screen: restricted model y_t = a + b·y_{t-1},
    // unrestricted y_t = a + b·y_{t-1} + c·x_{t-1} (y = daily
    // purchases, x = daily clicks), F = (RSS_r − RSS_u)/(RSS_u/(n−3)).
    // The unrestricted OLS solves its 3×3 normal equations by Cramer's
    // rule — closed form, no iteration, one corpus aggregate.
    "ts_granger_lag1" -> Decl(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(datediff(col("ts").cast("date"), to_date(lit("2023-12-31")))
                     .cast("bigint").as("t"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"),
               sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"))
        val spine = s.range(1, 31).select(col("id").as("t"))
          .join(daily, Seq("t"), "left")
          .select(col("t"),
                  coalesce(col("y"), lit(0L)).cast("double").as("y"),
                  coalesce(col("x"), lit(0L)).cast("double").as("x"))
        val lagged = spine.as("a")
          .join(spine.as("b"), col("b.t") === col("a.t") - 1)
          .select(col("a.y").as("y"), col("b.y").as("yl"), col("b.x").as("xl"))
        lagged.agg(
            count(lit(1)).cast("double").as("n"),
            sum(col("y")).as("sy"), sum(col("yl")).as("syl"),
            sum(col("xl")).as("sxl"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("y") * col("yl")).as("syyl"),
            sum(col("y") * col("xl")).as("syxl"),
            sum(col("yl") * col("yl")).as("sylyl"),
            sum(col("yl") * col("xl")).as("sylxl"),
            sum(col("xl") * col("xl")).as("sxlxl"))
          .withColumn("br",
            (col("n") * col("syyl") - col("sy") * col("syl")) /
              (col("n") * col("sylyl") - col("syl") * col("syl")))
          .withColumn("ar", (col("sy") - col("br") * col("syl")) / col("n"))
          .withColumn("rss_r",
            col("syy") - col("ar") * col("sy") - col("br") * col("syyl"))
          .withColumn("det",
            col("n") * (col("sylyl") * col("sxlxl") - col("sylxl") * col("sylxl")) -
              col("syl") * (col("syl") * col("sxlxl") - col("sylxl") * col("sxl")) +
              col("sxl") * (col("syl") * col("sylxl") - col("sylyl") * col("sxl")))
          .withColumn("au",
            (col("sy") * (col("sylyl") * col("sxlxl") - col("sylxl") * col("sylxl")) -
              col("syl") * (col("syyl") * col("sxlxl") - col("sylxl") * col("syxl")) +
              col("sxl") * (col("syyl") * col("sylxl") - col("sylyl") * col("syxl"))) /
              col("det"))
          .withColumn("bu",
            (col("n") * (col("syyl") * col("sxlxl") - col("sylxl") * col("syxl")) -
              col("sy") * (col("syl") * col("sxlxl") - col("sylxl") * col("sxl")) +
              col("sxl") * (col("syl") * col("syxl") - col("syyl") * col("sxl"))) /
              col("det"))
          .withColumn("cu",
            (col("n") * (col("sylyl") * col("syxl") - col("syyl") * col("sylxl")) -
              col("syl") * (col("syl") * col("syxl") - col("syyl") * col("sxl")) +
              col("sy") * (col("syl") * col("sylxl") - col("sylyl") * col("sxl"))) /
              col("det"))
          .withColumn("rss_u",
            col("syy") - col("au") * col("sy") - col("bu") * col("syyl") -
              col("cu") * col("syxl"))
          .withColumn("f_stat",
            (col("rss_r") - col("rss_u")) / (col("rss_u") / (col("n") - 3)))
          .select(col("n").cast("bigint").as("n"),
                  round(col("br"), 6).as("beta_restricted"),
                  round(col("rss_r"), 6).as("rss_r"),
                  round(col("bu"), 6).as("beta_ylag"),
                  round(col("cu"), 6).as("beta_xlag"),
                  round(col("rss_u"), 6).as("rss_u"),
                  round(col("f_stat"), 6).as("f_stat"),
                  (round(col("f_stat"), 6) > 4.225).as("granger_improves"))
      },
      Some("""WITH daily AS (
             |  SELECT date_diff('day', DATE '2023-12-31', CAST(ts AS DATE)) AS t,
             |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y,
             |         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x
             |  FROM events GROUP BY 1),
             |spine AS (
             |  SELECT g.t, CAST(coalesce(y, 0) AS DOUBLE) AS y,
             |         CAST(coalesce(x, 0) AS DOUBLE) AS x
             |  FROM generate_series(1, 30) g(t) LEFT JOIN daily ON daily.t = g.t),
             |lagged AS (
             |  SELECT a.y AS y, b.y AS yl, b.x AS xl
             |  FROM spine a JOIN spine b ON b.t = a.t - 1),
             |s AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n,
             |         sum(y) AS sy, sum(yl) AS syl, sum(xl) AS sxl,
             |         sum(y*y) AS syy, sum(y*yl) AS syyl, sum(y*xl) AS syxl,
             |         sum(yl*yl) AS sylyl, sum(yl*xl) AS sylxl,
             |         sum(xl*xl) AS sxlxl
             |  FROM lagged),
             |m1 AS (
             |  SELECT *, (n*syyl - sy*syl) / (n*sylyl - syl*syl) AS br FROM s),
             |m2 AS (
             |  SELECT *, (sy - br*syl) / n AS ar,
             |         n*(sylyl*sxlxl - sylxl*sylxl) -
             |           syl*(syl*sxlxl - sylxl*sxl) +
             |           sxl*(syl*sylxl - sylyl*sxl) AS det
             |  FROM m1),
             |m3 AS (
             |  SELECT *, syy - ar*sy - br*syyl AS rss_r,
             |         (sy*(sylyl*sxlxl - sylxl*sylxl) -
             |          syl*(syyl*sxlxl - sylxl*syxl) +
             |          sxl*(syyl*sylxl - sylyl*syxl)) / det AS au,
             |         (n*(syyl*sxlxl - sylxl*syxl) -
             |          sy*(syl*sxlxl - sylxl*sxl) +
             |          sxl*(syl*syxl - syyl*sxl)) / det AS bu,
             |         (n*(sylyl*syxl - syyl*sylxl) -
             |          syl*(syl*syxl - syyl*sxl) +
             |          sy*(syl*sylxl - sylyl*sxl)) / det AS cu
             |  FROM m2),
             |m4 AS (
             |  SELECT *, syy - au*sy - bu*syyl - cu*syxl AS rss_u FROM m3),
             |m5 AS (
             |  SELECT *, (rss_r - rss_u) / (rss_u / (n - 3)) AS f_stat FROM m4)
             |SELECT CAST(n AS BIGINT) AS n,
             |       round(br, 6) AS beta_restricted,
             |       round(rss_r, 6) AS rss_r,
             |       round(bu, 6) AS beta_ylag,
             |       round(cu, 6) AS beta_xlag,
             |       round(rss_u, 6) AS rss_u,
             |       round(f_stat, 6) AS f_stat,
             |       round(f_stat, 6) > 4.225 AS granger_improves
             |FROM m5""".stripMargin))
  )
}
