package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 78: extreme-value analytics — a Gumbel fit on the
  * daily-maximum order value with return levels (the "what's the
  * 1-in-365-day order?" question capacity planning and risk teams ask
  * of any revenue stream; method-of-moments is the closed-form fit, so
  * it needs exactly one aggregate) and the Hodges-Lehmann pseudo-median
  * of the day-over-day purchase change (the classical robust location
  * estimator — median of all pairwise Walsh averages — 29 diffs →
  * 435 bounded pairs).
  *
  * Determinism: both keys reduce to exact sums first. Gumbel moments
  * come from DECIMAL(38,0) Σx and Σx² over integer cents (overflow-
  * free, associativity-free); β = s·√6/π and the return-level factors
  * ln(−ln(1−1/T)) are Scala-computed literals interpolated into BOTH
  * engines' expressions (the lgs discipline, Round11q), so no engine
  * libm ln is ever compared against another. sqrt is IEEE-exact in
  * both. Hodges-Lehmann medians run over integer/half-integer Walsh
  * grids that doubles carry exactly.
  *
  * Scale shape: one shuffle each to the calendar-day grid; the Walsh
  * self-join is 29×29 on the bounded diff spine (broadcast, never
  * corpus-sized).
  */
object Round11v {

  private val rootSixOverPi: Double = math.sqrt(6.0) / math.Pi
  private val gamma = 0.5772156649015329 // Euler–Mascheroni
  private def kT(t: Int): Double = math.log(-math.log(1.0 - 1.0 / t))

  val decls: Map[String, Decl] = Map(
    // Gumbel method-of-moments on daily max order cents: β = s·√6/π,
    // μ = x̄ − γβ, return level x_T = μ − β·ln(−ln(1−1/T)).
    "agg_gumbel_return_period" -> Decl(
      (s, d) => {
        val daily = Tables(s, d, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(max(round(col("o_totalprice") * 100).cast("bigint")).as("mx"))
        daily.agg(
            count(lit(1)).as("n"),
            sum(col("mx").cast("decimal(38,0)")).as("sx"),
            sum((col("mx") * col("mx")).cast("decimal(38,0)")).as("sxx"))
          .withColumn("mean", col("sx").cast("double") / col("n"))
          .withColumn("variance",
            (col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double") / col("n")) /
              (col("n") - 1))
          .withColumn("std", sqrt(col("variance")))
          .withColumn("beta", col("std") * lit(rootSixOverPi))
          .withColumn("mu", col("mean") - lit(gamma) * col("beta"))
          .select(col("n").cast("bigint").as("n_days"),
                  round(col("mean"), 6).as("mean_cents"),
                  round(col("std"), 6).as("std_cents"),
                  round(col("mu"), 6).as("mu"),
                  round(col("beta"), 6).as("beta"),
                  round(col("mu") - col("beta") * lit(kT(10)), 6).as("rl_10d"),
                  round(col("mu") - col("beta") * lit(kT(100)), 6).as("rl_100d"),
                  round(col("mu") - col("beta") * lit(kT(365)), 6).as("rl_365d"))
      },
      Some(s"""WITH daily AS (
              |  SELECT CAST(o_orderdate AS DATE) AS day,
              |         max(CAST(round(o_totalprice * 100) AS BIGINT)) AS mx
              |  FROM orders GROUP BY 1),
              |sums AS (
              |  SELECT CAST(count(*) AS DOUBLE) AS n,
              |         CAST(sum(CAST(mx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
              |         CAST(sum(CAST(mx * mx AS DECIMAL(38,0))) AS DOUBLE) AS sxx
              |  FROM daily),
              |fit AS (
              |  SELECT n, sx / n AS mean,
              |         sqrt((sxx - sx * sx / n) / (n - 1)) AS std
              |  FROM sums),
              |par AS (
              |  SELECT n, mean, std,
              |         std * CAST($rootSixOverPi AS DOUBLE) AS beta
              |  FROM fit),
              |par2 AS (
              |  SELECT n, mean, std, beta,
              |         mean - CAST($gamma AS DOUBLE) * beta AS mu
              |  FROM par)
              |SELECT CAST(n AS BIGINT) AS n_days,
              |       round(mean, 6) AS mean_cents,
              |       round(std, 6) AS std_cents,
              |       round(mu, 6) AS mu,
              |       round(beta, 6) AS beta,
              |       round(mu - beta * CAST(${kT(10)} AS DOUBLE), 6) AS rl_10d,
              |       round(mu - beta * CAST(${kT(100)} AS DOUBLE), 6) AS rl_100d,
              |       round(mu - beta * CAST(${kT(365)} AS DOUBLE), 6) AS rl_365d
              |FROM par2""".stripMargin)),

    // Hodges-Lehmann pseudo-median of the day-over-day purchase-count
    // change: 29 diffs on the calendar spine, 435 Walsh averages,
    // median of the bounded grid. The plain median rides along for
    // contrast.
    "agg_hodges_lehmann" -> Decl(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(datediff(col("ts").cast("date"), to_date(lit("2023-12-31")))
                     .cast("bigint").as("t"))
          .agg(count(lit(1)).as("x"))
        val spine = s.range(1, 31).select(col("id").as("t"))
          .join(daily, Seq("t"), "left")
          .select(col("t"), coalesce(col("x"), lit(0L)).as("x"))
        val diffs = spine.as("a")
          .join(spine.as("b"), col("b.t") === col("a.t") - 1)
          .select(col("a.t").as("t"),
                  (col("a.x") - col("b.x")).as("diff"))
        val walsh = diffs.as("p")
          .join(broadcast(diffs.as("q")), col("p.t") <= col("q.t"))
          .select(((col("p.diff") + col("q.diff")).cast("double") / 2)
                    .as("w"))
        val hl = walsh.agg(count(lit(1)).as("n_pairs"),
                           median(col("w")).as("hl"))
        val plain = diffs.agg(median(col("diff").cast("double")).as("med"))
        hl.crossJoin(broadcast(plain))
          .select(col("n_pairs"),
                  round(col("hl"), 6).as("hl_shift"),
                  round(col("med"), 6).as("plain_median"))
      },
      Some("""WITH daily AS (
             |  SELECT date_diff('day', DATE '2023-12-31', CAST(ts AS DATE)) AS t,
             |         count(*) AS x
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |spine AS (
             |  SELECT g.t, CAST(coalesce(x, 0) AS BIGINT) AS x
             |  FROM generate_series(1, 30) g(t) LEFT JOIN daily ON daily.t = g.t),
             |diffs AS (
             |  SELECT a.t, a.x - b.x AS diff
             |  FROM spine a JOIN spine b ON b.t = a.t - 1),
             |walsh AS (
             |  SELECT CAST(p.diff + q.diff AS DOUBLE) / 2 AS w
             |  FROM diffs p JOIN diffs q ON p.t <= q.t)
             |SELECT (SELECT count(*) FROM walsh) AS n_pairs,
             |       round((SELECT median(w) FROM walsh), 6) AS hl_shift,
             |       round((SELECT median(CAST(diff AS DOUBLE)) FROM diffs), 6)
             |         AS plain_median""".stripMargin))
  )
}
