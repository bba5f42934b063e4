package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 40: robust trend statistics — the Theil–Sen slope
  * estimator and the Mann–Kendall trend test, the standard
  * nonparametric pair for "is this metric drifting?" monitoring.
  *
  * Both are pairwise statistics, which is exactly why they're usually
  * avoided at scale — O(n²) in the series length. The scale-correct
  * shape used here: aggregate the fact table to the BOUNDED month grid
  * first (one fact shuffle, grid size fixed by the calendar, not the
  * data volume), then form pairs on the tiny grid. The pair stage's
  * cost is constant at any SF; only the linear rollup grows.
  *
  * Determinism: revenues are exact BIGINT cents; a slope is one IEEE
  * division of a cents difference by a small integer month gap
  * (identical in any engine, no reduction order); the median is the
  * ceil(n/2)-th order statistic of the sorted slope list (the lower
  * middle for even n — an ELEMENT, not an interpolated float);
  * Mann–Kendall's S and its tie-corrected variance stay exact integers
  * (var is emitted ×18 to avoid the /18 rational).
  */
object Round10jj {

  private val centsRev =
    expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")

  val decls: Map[String, Decl] = Map(
    // Per-year Theil–Sen slope of monthly revenue (cents per month):
    // median of the 66 (or fewer in partial years) pairwise slopes.
    "agg_theil_sen_trend" -> Decl(
      (s, d) => {
        val monthly = Tables(s, d, "lineitem")
          .groupBy(year(col("l_shipdate")).as("y"),
                   month(col("l_shipdate")).as("m"))
          .agg(sum(centsRev).as("rev"))
        val a = monthly.select(col("y"), col("m").as("m1"), col("rev").as("r1"))
        val b = monthly.select(col("y"), col("m").as("m2"), col("rev").as("r2"))
        a.join(b, Seq("y")).filter(col("m2") > col("m1"))
          .select(col("y"),
            ((col("r2") - col("r1")).cast("double") /
              (col("m2") - col("m1")).cast("double")).as("slope"))
          .groupBy("y")
          .agg(count(lit(1)).as("n_pairs"),
               expr("element_at(array_sort(collect_list(slope))," +
                 " CAST(ceil(count(1) / 2.0) AS INT))").as("med"))
          .select(col("y"), col("n_pairs"),
                  round(col("med"), 6).as("theil_sen_slope_c"))
          .orderBy("y")
      },
      Some("""WITH monthly AS (
             |  SELECT year(l_shipdate) AS y, month(l_shipdate) AS m,
             |         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev
             |  FROM lineitem GROUP BY 1, 2),
             |slopes AS (
             |  SELECT a.y, CAST(b.rev - a.rev AS DOUBLE) / (b.m - a.m) AS slope
             |  FROM monthly a JOIN monthly b ON a.y = b.y AND b.m > a.m)
             |SELECT y, count(*) AS n_pairs,
             |       round(list_sort(list(slope))[CAST(ceil(count(*) / 2.0) AS INT)], 6)
             |         AS theil_sen_slope_c
             |FROM slopes GROUP BY y ORDER BY y""".stripMargin)),

    // Mann–Kendall over the whole monthly series (ordered by year,
    // month): S = Σ_{i<j} sign(rev_j − rev_i), with the tie-corrected
    // variance numerator n(n−1)(2n+5) − Σ t(t−1)(2t+5) kept ×18.
    "agg_mann_kendall" -> Decl(
      (s, d) => {
        val monthly = Tables(s, d, "lineitem")
          .groupBy(year(col("l_shipdate")).as("y"),
                   month(col("l_shipdate")).as("m"))
          .agg(sum(centsRev).as("rev"))
          .select((col("y") * 12 + col("m")).as("t"), col("rev"))
        // pair the bounded grid through a constant equi-key (plans as a
        // hash join, not a cartesian — the grid is ~80 rows at any SF)
        val a = monthly.select(lit(1).as("k"), col("t").as("t1"), col("rev").as("r1"))
        val b = monthly.select(lit(1).as("k"), col("t").as("t2"), col("rev").as("r2"))
        val s0 = a.join(b, "k").filter(col("t2") > col("t1"))
          .agg(sum(signum(col("r2") - col("r1")).cast("bigint")).as("s_stat"))
        val nn = monthly.agg(count(lit(1)).as("n_points"))
        val ties = monthly.groupBy("rev").agg(count(lit(1)).as("tc"))
          .agg(coalesce(sum(expr("CASE WHEN tc > 1 THEN tc * (tc - 1) * (2 * tc + 5) ELSE 0 END")),
                        lit(0L)).as("tie18"))
        s0.crossJoin(broadcast(nn)).crossJoin(broadcast(ties))
          .select(col("s_stat"), col("n_points"),
            (col("n_points") * (col("n_points") - 1) * (lit(2) * col("n_points") + 5)
              - col("tie18")).as("var18"))
      },
      Some("""WITH monthly AS (
             |  SELECT year(l_shipdate) * 12 + month(l_shipdate) AS t,
             |         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev
             |  FROM lineitem GROUP BY 1),
             |s AS (SELECT CAST(sum(sign(b.rev - a.rev)) AS BIGINT) AS s_stat
             |      FROM monthly a JOIN monthly b ON b.t > a.t),
             |n AS (SELECT count(*) AS n_points FROM monthly),
             |ties AS (SELECT CAST(coalesce(sum(CASE WHEN tc > 1
             |                 THEN tc * (tc - 1) * (2 * tc + 5) ELSE 0 END), 0) AS BIGINT) AS tie18
             |         FROM (SELECT count(*) AS tc FROM monthly GROUP BY rev))
             |SELECT s_stat, n_points,
             |       CAST(n_points * (n_points - 1) * (2 * n_points + 5) - tie18 AS BIGINT) AS var18
             |FROM s CROSS JOIN n CROSS JOIN ties""".stripMargin))
  )
}
