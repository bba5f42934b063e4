package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 72: split conformal prediction (distribution-free
  * prediction intervals — the modern ML-ops way to attach coverage
  * guarantees to ANY point model: train on one split, take the
  * ceil(0.9·(n+1))-th smallest absolute calibration residual as the
  * interval half-width, verify coverage on a held-out split) and the
  * sequential probability ratio test (Wald's SPRT — the
  * always-valid-inference primitive behind modern sequential A/B
  * platforms: walk the daily log-likelihood ratio and stop at the
  * first boundary crossing).
  *
  * Determinism: the OLS fit folds EXACT BIGINT sums (quantity is
  * integral, prices are cents), so slope/intercept are the same IEEE
  * doubles in both engines; calibration residuals live on the integer
  * cent grid, which makes the conformal quantile an exact integer
  * order statistic. SPRT's LLR is integer counts × the same ln()
  * constants, cumulated over the bounded 30-day spine.
  *
  * Scale shape: the conformal quantile is the distributed two-pass
  * prefix sum (PrefixSum.cumsumLong — NO unpartitioned data-sized
  * window anywhere); everything else is one aggregate per split. SPRT
  * reduces the corpus to the day grid in one aggregate.
  */
object Round11p {

  val decls: Map[String, Decl] = Map(
    "agg_conformal_interval" -> Decl(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .select(pmod(col("l_orderkey"), lit(3L)).as("split"),
                  col("l_quantity").cast("bigint").as("x"),
                  round(col("l_extendedprice") * 100).cast("bigint").as("yc"))
        // exact-integer OLS sums on the train split (ONE scan)
        val fit = li.filter(col("split") === 0)
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
               sum(col("x") * col("x")).as("sxx"),
               sum(col("yc")).as("sy"), sum(col("x") * col("yc")).as("sxy"))
          .withColumn("slope",
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .select(col("slope"),
                  ((col("sy").cast("double") - col("slope") *
                    col("sx").cast("double")) / col("n").cast("double"))
                    .as("icept"))
        // calibration residuals on the integer cent grid
        val cal = li.filter(col("split") === 1)
          .crossJoin(broadcast(fit))
          .select(abs(col("yc") - round(col("slope") * col("x") + col("icept"))
                        .cast("bigint")).as("resc"))
        // n_cal and k computed RELATIONALLY (a 1-row aggregate broadcast),
        // exactly like the oracle's nc/kk CTEs — no eager .count() at
        // DataFrame-build time (round-10 verdict: the eager probe ran two
        // jobs, including the crossJoin, before the query even started).
        val kk = cal.agg(count(lit(1)).as("n_cal"))
          .withColumn("k",
            ceil(lit(0.9) * (col("n_cal") + 1)).cast("bigint"))
        val counts = cal.groupBy("resc").agg(count(lit(1)).as("cnt"))
        val qhat = PrefixSum.cumsumLong(counts, Seq(col("resc").asc),
                                        col("cnt"), "cum")
          .crossJoin(broadcast(kk))
          .filter(col("cum") >= col("k"))
          .agg(min(col("resc")).as("qhat_cents"),
               first(col("n_cal")).as("n_cal"))
        // held-out coverage: P(|residual| <= qhat) on the test split
        val test = li.filter(col("split") === 2)
          .crossJoin(broadcast(fit))
          .select(abs(col("yc") - round(col("slope") * col("x") + col("icept"))
                        .cast("bigint")).as("resc"))
        test.crossJoin(broadcast(qhat))
          .agg(first(col("qhat_cents")).as("qhat_cents"),
               first(col("n_cal")).as("n_cal"),
               count(lit(1)).as("n_test"),
               sum(when(col("resc") <= col("qhat_cents"), 1L).otherwise(0L))
                 .as("covered"))
          .crossJoin(broadcast(fit))
          .select(col("n_cal"), col("n_test"),
                  round(col("slope"), 6).as("slope"),
                  round(col("icept"), 6).as("intercept_cents"),
                  col("qhat_cents"),
                  round(col("covered").cast("double") /
                        col("n_test").cast("double"), 6).as("coverage"))
      },
      Some("""WITH li AS (SELECT l_orderkey % 3 AS split,
             |                   CAST(l_quantity AS BIGINT) AS x,
             |                   CAST(round(l_extendedprice * 100) AS BIGINT) AS yc
             |            FROM lineitem),
             |s AS (SELECT count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
             |             sum(yc) AS sy, sum(x * yc) AS sxy
             |      FROM li WHERE split = 0),
             |fit AS (SELECT
             |    CAST(n * sxy - sx * sy AS DOUBLE) /
             |    CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
             |    (CAST(sy AS DOUBLE) -
             |     (CAST(n * sxy - sx * sy AS DOUBLE) /
             |      CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             |      / CAST(n AS DOUBLE) AS icept
             |  FROM s),
             |cal AS (SELECT abs(yc - CAST(round(fit.slope * x + fit.icept)
             |                             AS BIGINT)) AS resc
             |        FROM li CROSS JOIN fit WHERE split = 1),
             |nc AS (SELECT count(*) AS n_cal FROM cal),
             |kk AS (SELECT CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT) AS k,
             |              n_cal FROM nc),
             |cum AS (SELECT resc, sum(cnt) OVER (ORDER BY resc) AS cum FROM (
             |          SELECT resc, count(*) AS cnt FROM cal GROUP BY resc)),
             |q AS (SELECT min(resc) AS qhat_cents FROM cum CROSS JOIN kk
             |      WHERE cum >= kk.k),
             |t AS (SELECT abs(yc - CAST(round(fit.slope * x + fit.icept)
             |                           AS BIGINT)) AS resc
             |      FROM li CROSS JOIN fit WHERE split = 2)
             |SELECT kk.n_cal, count(*) AS n_test,
             |       round(fit.slope, 6) AS slope,
             |       round(fit.icept, 6) AS intercept_cents,
             |       q.qhat_cents,
             |       round(CAST(sum(CASE WHEN t.resc <= q.qhat_cents
             |                           THEN 1 ELSE 0 END) AS DOUBLE)
             |             / count(*), 6) AS coverage
             |FROM t CROSS JOIN q CROSS JOIN fit CROSS JOIN kk
             |GROUP BY kk.n_cal, fit.slope, fit.icept, q.qhat_cents""".stripMargin)),

    // Wald SPRT on the daily purchase-share series: H0 p=0.18 vs
    // H1 p=0.22, α=β=0.05 → boundaries ±ln(19). Per day: counts, the
    // day's LLR, the cumulative LLR, and whether the test has stopped
    // (first crossing latches).
    "agg_sprt_sequential" -> Decl(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val (p0, p1) = (0.18, 0.22)
        val lc = math.log(p1 / p0)
        val ln = math.log((1 - p1) / (1 - p0))
        val bound = math.log(19.0)
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
               sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .as("conv"))
        // the day spine is calendar-bounded: a 30-row window, not a
        // data-sized one
        val wCum = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)
        val scored = daily
          .withColumn("llr", col("conv") * lc + (col("n") - col("conv")) * ln)
          .withColumn("cum_llr", sum(col("llr")).over(wCum))
          .withColumn("crossed",
            abs(col("cum_llr")) >= bound)
        val firstCross = scored.filter(col("crossed"))
          .agg(min(col("day")).as("cross_day"))
        scored.crossJoin(broadcast(firstCross))
          .select(col("day"), col("n"), col("conv"),
                  round(col("llr"), 6).as("llr"),
                  round(col("cum_llr"), 6).as("cum_llr"),
                  when(col("cross_day").isNotNull &&
                       col("day") >= col("cross_day"),
                       when(col("cum_llr") >= 0, lit("accept_h1"))
                         .otherwise(lit("accept_h0")))
                    .otherwise(lit("continue")).as("decision"))
          .orderBy("day")
      },
      Some(s"""WITH daily AS (
              |  SELECT CAST(ts AS DATE) AS day, count(*) AS n,
              |         -- R12: sum(CASE …) is HUGEINT in DuckDB; cast to BIGINT
              |         CAST(sum(CASE WHEN event_type = 'purchase'
              |                       THEN 1 ELSE 0 END) AS BIGINT)
              |           AS conv
              |  FROM events GROUP BY 1),
              |scored AS (SELECT *,
              |    -- CAST: bare numeric literals type as DECIMAL in DuckDB,
              |    -- which the driver's hash encodes engine-specifically
              |    conv * CAST(${math.log(0.22 / 0.18)} AS DOUBLE) +
              |    (n - conv) * CAST(${math.log(0.78 / 0.82)} AS DOUBLE) AS llr
              |  FROM daily),
              |cum AS (SELECT *, sum(llr) OVER (ORDER BY day) AS cum_llr
              |        FROM scored),
              |fc AS (SELECT min(day) AS cross_day FROM cum
              |       WHERE abs(cum_llr) >= ${math.log(19.0)})
              |SELECT day, n, conv, round(llr, 6) AS llr,
              |       round(cum_llr, 6) AS cum_llr,
              |       CASE WHEN fc.cross_day IS NOT NULL AND day >= fc.cross_day
              |            THEN CASE WHEN cum_llr >= 0 THEN 'accept_h1'
              |                      ELSE 'accept_h0' END
              |            ELSE 'continue' END AS decision
              |FROM cum CROSS JOIN fc
              |ORDER BY day""".stripMargin))
  )
}
