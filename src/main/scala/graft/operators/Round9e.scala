package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 fifth wave: Bollinger bands (rolling mean ± 2σ), winsorized
  * robust mean on the integer-cents grid, hourly grouped top-k, and a
  * deterministic hash-subsample jackknife for uncertainty estimation.
  */
object Round9e {

  val decls: Map[String, Decl] = Map(
    // Bollinger bands — the rolling mean ± 2·stddev envelope, per user
    // over a trailing 16-event frame. Sufficient statistics (n, Σy, Σy²)
    // are exact BIGINT window sums sharing ONE user-partitioned sort with
    // window_rolling_slope's discipline; mean and the ±2σ bands are each
    // a single fixed double tree rounded to 6 dp (population σ — the
    // convention both engines compute identically from the same integers).
    // Full frames only, so the frame width is a constant of the query.
    "window_bollinger" -> Decl(
      (s, d) => {
        val f = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(-15, Window.currentRow)
        val n = lit(16L)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  round(col("value") * 100).cast("bigint").as("y"))
          .select(col("user_id"), col("event_id"),
                  count(lit(1)).over(f).as("cnt"),
                  sum(col("y")).over(f).as("sy"),
                  sum(col("y") * col("y")).over(f).as("syy"))
          .filter(col("cnt") === 16)
          .select(col("user_id"), col("event_id"),
                  round(col("sy").cast("double") / 16.0, 6).as("mid"),
                  round(col("sy").cast("double") / 16.0 +
                    sqrt((n * col("syy") - col("sy") * col("sy")).cast("double")) * 2.0 / 16.0, 6)
                    .as("band_up"),
                  round(col("sy").cast("double") / 16.0 -
                    sqrt((n * col("syy") - col("sy") * col("sy")).cast("double")) * 2.0 / 16.0, 6)
                    .as("band_dn"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id,
             |              CAST(round(value * 100) AS BIGINT) AS y
             |            FROM events),
             |f AS (SELECT user_id, event_id,
             |        count(*) OVER w AS cnt,
             |        CAST(sum(y) OVER w AS BIGINT) AS sy,
             |        CAST(sum(y * y) OVER w AS BIGINT) AS syy
             |      FROM ev
             |      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             |                   ROWS BETWEEN 15 PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id,
             |       round(CAST(sy AS DOUBLE) / 16.0, 6) AS mid,
             |       round(CAST(sy AS DOUBLE) / 16.0 +
             |             2.0 * sqrt(CAST(16 * syy - sy * sy AS DOUBLE)) / 16.0, 6)
             |         AS band_up,
             |       round(CAST(sy AS DOUBLE) / 16.0 -
             |             2.0 * sqrt(CAST(16 * syy - sy * sy AS DOUBLE)) / 16.0, 6)
             |         AS band_dn
             |FROM f WHERE cnt = 16 ORDER BY user_id, event_id""".stripMargin)),

    // Winsorized mean — the robust location estimate after clamping tails
    // at the p10/p90 grid values. Thresholds are picked by INTEGER rank on
    // the bounded distinct-cents grid (smallest value whose cumulative
    // count reaches ceil(q·n) — the agg_weighted_median machinery, so no
    // interpolated quantile ever crosses engines), broadcast back, and the
    // clamped mean is an exact BIGINT sum with ONE terminal division
    // rounded to 6 dp. Scale: grid aggregate + broadcast threshold join —
    // the corpus is scanned twice, windowed never.
    "agg_winsorized_mean" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), round(col("value") * 100).cast("bigint").as("c"))
        val grid = ev.groupBy("event_type", "c").agg(count(lit(1)).as("w"))
        val cumW = Window.partitionBy("event_type").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = grid.groupBy("event_type").agg(sum(col("w")).as("n"))
        val cum = grid
          .select(col("event_type"), col("c"), sum(col("w")).over(cumW).as("cum"))
          .join(broadcast(tot), "event_type")
        val lo = cum.filter(col("cum") * 10 >= col("n"))
          .groupBy("event_type").agg(min(col("c")).as("lo"))
        val hi = cum.filter(col("cum") * 10 >= col("n") * 9)
          .groupBy("event_type").agg(min(col("c")).as("hi"))
        ev.join(broadcast(lo), "event_type").join(broadcast(hi), "event_type")
          .select(col("event_type"),
                  greatest(col("lo"), least(col("hi"), col("c"))).as("cc"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("cc")).as("sum_c"))
          .select(col("event_type"), col("n"),
                  round(col("sum_c").cast("double") / col("n").cast("double"), 6)
                    .as("winsorized_mean"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type,
             |              CAST(round(value * 100) AS BIGINT) AS c
             |            FROM events),
             |grid AS (SELECT event_type, c, count(*) AS w FROM ev GROUP BY 1, 2),
             |cum AS (SELECT event_type, c,
             |          sum(w) OVER (PARTITION BY event_type ORDER BY c
             |                       ROWS UNBOUNDED PRECEDING) AS cum,
             |          sum(w) OVER (PARTITION BY event_type) AS n
             |        FROM grid),
             |lo AS (SELECT event_type, min(c) AS lo FROM cum
             |       WHERE cum * 10 >= n GROUP BY 1),
             |hi AS (SELECT event_type, min(c) AS hi FROM cum
             |       WHERE cum * 10 >= n * 9 GROUP BY 1)
             |SELECT ev.event_type, CAST(count(*) AS BIGINT) AS n,
             |       round(CAST(sum(greatest(lo.lo, least(hi.hi, ev.c))) AS DOUBLE) /
             |             CAST(count(*) AS DOUBLE), 6) AS winsorized_mean
             |FROM ev JOIN lo USING (event_type) JOIN hi USING (event_type)
             |GROUP BY 1 ORDER BY ev.event_type""".stripMargin)),

    // Hourly top-k — per 1-hour bucket, the 2 busiest event types with an
    // explicit (count desc, type asc) tie-break. The ranking window's
    // child is the hour×type AGGREGATE (bounded by 24·types rows per day,
    // never corpus-sized), which is exactly the aggregate-fed exemption
    // the low-cardinality window gate encodes; the corpus itself crosses
    // one partial-aggregating shuffle. The trending-now dashboard query at
    // any scale.
    "ts_hourly_topk" -> Decl(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 3600000000L").as("hr"), col("event_type"))
          .groupBy("hr", "event_type").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("hr")
          .orderBy(col("n").desc, col("event_type").asc)
        hourly.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 2)
          .select(col("hr"), col("rnk").cast("bigint").as("rnk"),
                  col("event_type"), col("n"))
          .orderBy("hr", "rnk")
      },
      Some("""WITH hourly AS (
             |  SELECT epoch_us(ts) // 3600000000 AS hr, event_type,
             |         count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |r AS (SELECT hr, event_type, n,
             |        row_number() OVER (PARTITION BY hr
             |          ORDER BY n DESC, event_type ASC) AS rnk
             |      FROM hourly)
             |SELECT hr, CAST(rnk AS BIGINT) AS rnk, event_type,
             |       CAST(n AS BIGINT) AS n
             |FROM r WHERE rnk <= 2 ORDER BY hr, rnk""".stripMargin)),

    // Hash-subsample jackknife — uncertainty for a mean WITHOUT runtime
    // RNG (R8): 16 deterministic half-samples, membership decided by the
    // first hex digit of md5(resample ‖ event_id) (< '8' ⇔ an exact 1/2
    // Bernoulli on a uniform hash — reproducible on any engine, any
    // cluster size, any run). Each resample reports its exact count and
    // integer-sum mean; the spread across the 16 rows IS the uncertainty
    // estimate. Scale: one scan fans out ×16 via a broadcast resample
    // spine into one partial-aggregating shuffle of 16·|types| groups.
    "agg_subsample_jackknife" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), round(col("value") * 100).cast("bigint").as("c"))
        val spine = ev.sparkSession.range(0, 16).select(col("id").as("resample"))
        ev.crossJoin(broadcast(spine))
          .filter(substring(md5(concat(col("resample").cast("string"), lit(":"),
                                       col("event_id").cast("string"))), 1, 1)
                    .isin("0", "1", "2", "3", "4", "5", "6", "7"))
          .groupBy("resample")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"))
          .select(col("resample"), col("n"),
                  round(col("sum_c").cast("double") / col("n").cast("double"), 6)
                    .as("mean_c"))
          .orderBy("resample")
      },
      Some("""WITH spine AS (SELECT * FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7),
             |               (8),(9),(10),(11),(12),(13),(14),(15)) s(resample)),
             |ev AS (SELECT event_id, CAST(round(value * 100) AS BIGINT) AS c
             |       FROM events),
             |m AS (SELECT spine.resample, ev.c
             |      FROM ev CROSS JOIN spine
             |      WHERE substr(md5(CAST(spine.resample AS VARCHAR) || ':' ||
             |                       CAST(ev.event_id AS VARCHAR)), 1, 1)
             |            IN ('0','1','2','3','4','5','6','7'))
             |SELECT CAST(resample AS BIGINT) AS resample,
             |       CAST(count(*) AS BIGINT) AS n,
             |       round(CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             |         AS mean_c
             |FROM m GROUP BY 1 ORDER BY resample""".stripMargin))
  )
}
