package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 82: the remaining two classical k-group tests — the
  * Brown-Forsythe/Levene variance-homogeneity check (one-way ANOVA on
  * absolute deviations from group MEDIANS — the robust pre-ANOVA gate:
  * heteroscedastic groups invalidate the pooled-variance F) and the
  * Friedman repeated-measures rank test (do the five event types keep
  * the same volume ORDER across the 30 days, or does at least one
  * systematically run higher?).
  *
  * Determinism: Brown-Forsythe works in DOUBLED deviations |2x − 2·med|
  * — group medians on the integer cent grid interpolate to halves, so
  * 2·med is an integer and every deviation is BIGINT; Σz and Σz² ride
  * DECIMAL(38,0), the five per-group F terms fold in group order, and
  * the doubling cancels in the F ratio. Friedman works in DOUBLED
  * average ranks (integers even at ties); with r = dr/2 the tie-robust
  * statistic collapses to an ALL-INTEGER ratio
  * (k−1)(ΣR2² − n²k(k+1)²)/(Σdr² − nk(k+1)²) — one double division at
  * the end.
  *
  * Scale shape: Brown-Forsythe is two corpus aggregates (grid medians,
  * then deviation sums) + a 5-row broadcast. Friedman runs entirely on
  * the 30×5 calendar grid.
  */
object Round11z {

  val decls: Map[String, Decl] = Map(
    // Brown-Forsythe: F on z_ij = |x_ij − median_g| across the five
    // event types' value distributions.
    "agg_levene_test" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type").as("g"),
                  round(col("value") * 100).cast("bigint").as("c"))
        val med = ev.groupBy("g")
          .agg((median(col("c")) * 2).cast("bigint").as("dmed"))
        val dev = ev.join(broadcast(med), "g")
          .select(col("g"), abs(col("c") * 2 - col("dmed")).as("z2"))
        val perGroup = dev.groupBy("g")
          .agg(count(lit(1)).as("ng"),
               sum(col("z2").cast("decimal(38,0)")).as("s1"),
               sum((col("z2") * col("z2")).cast("decimal(38,0)")).as("s2"))
        val glob = perGroup.agg(
          sum(col("ng")).as("n"),
          sum(col("s1")).as("gs1"),
          count(lit(1)).as("k"))
        perGroup.crossJoin(broadcast(glob))
          .withColumn("mg", col("s1").cast("double") / col("ng"))
          .withColumn("m", col("gs1").cast("double") / col("n"))
          .withColumn("between_t",
            col("ng") * (col("mg") - col("m")) * (col("mg") - col("m")))
          .withColumn("within_t",
            col("s2").cast("double") -
              col("s1").cast("double") * col("s1").cast("double") / col("ng"))
          .groupBy("n", "k")
          .agg(expr("round(aggregate(array_sort(collect_list(struct(g, between_t))), " +
                    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.between_t), 6)")
                 .as("between"),
               expr("round(aggregate(array_sort(collect_list(struct(g, within_t))), " +
                    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.within_t), 6)")
                 .as("within"))
          .select(col("k").cast("bigint").as("k_groups"),
                  col("n").cast("bigint").as("n"),
                  round((col("between") / (col("k") - 1)) /
                          (col("within") / (col("n") - col("k"))), 6)
                    .as("bf_f"),
                  (round((col("between") / (col("k") - 1)) /
                           (col("within") / (col("n") - col("k"))), 6) > 2.372)
                    .as("heteroscedastic"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type AS g,
             |         CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events),
             |med AS (SELECT g, CAST(median(c) * 2 AS BIGINT) AS dmed
             |        FROM ev GROUP BY g),
             |dev AS (SELECT ev.g, abs(c * 2 - dmed) AS z2
             |        FROM ev JOIN med USING (g)),
             |pg AS (SELECT g, count(*) AS ng,
             |              sum(CAST(z2 AS DECIMAL(38,0))) AS s1,
             |              sum(CAST(z2 * z2 AS DECIMAL(38,0))) AS s2
             |       FROM dev GROUP BY g),
             |gl AS (SELECT CAST(sum(ng) AS DOUBLE) AS n,
             |              CAST(sum(s1) AS DOUBLE) AS gs1,
             |              count(*) AS k FROM pg),
             |terms AS (
             |  SELECT g, ng, n, k,
             |         ng * (CAST(s1 AS DOUBLE) / ng - gs1 / n) *
             |              (CAST(s1 AS DOUBLE) / ng - gs1 / n) AS between_t,
             |         CAST(s2 AS DOUBLE) -
             |           CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / ng AS within_t
             |  FROM pg CROSS JOIN gl),
             |folded AS (
             |  SELECT n, k,
             |         round(list_sum(list(between_t ORDER BY g)), 6) AS between_s,
             |         round(list_sum(list(within_t ORDER BY g)), 6) AS within_s
             |  FROM terms GROUP BY n, k)
             |SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n,
             |       round((between_s / (k - 1)) / (within_s / (n - k)), 6) AS bf_f,
             |       round((between_s / (k - 1)) / (within_s / (n - k)), 6) > 2.372
             |         AS heteroscedastic
             |FROM folded""".stripMargin)),

    // Friedman: doubled within-day average ranks of the five types'
    // daily counts; all-integer tie-robust statistic.
    "agg_friedman_test" -> Decl(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, d)
          .groupBy(col("event_type").as("g"),
                   datediff(col("ts").cast("date"), to_date(lit("2023-12-31")))
                     .cast("bigint").as("t"))
          .agg(count(lit(1)).as("y"))
        val spine = daily.select(col("g")).distinct()
          .crossJoin(broadcast(s.range(1, 31).select(col("id").as("t"))))
          .join(daily, Seq("g", "t"), "left")
          .select(col("g"), col("t"), coalesce(col("y"), lit(0L)).as("y"))
        val dr = spine
          .withColumn("rk",
            rank().over(Window.partitionBy("t").orderBy("y")))
          .withColumn("ties",
            count(lit(1)).over(Window.partitionBy("t", "y")))
          .withColumn("dr", lit(2) * col("rk") + col("ties") - 1)
        val perType = dr.groupBy("g")
          .agg(sum(col("dr")).as("r2"), sum(col("dr") * col("dr")).as("dr2"))
        perType.agg(
            count(lit(1)).as("k"),
            sum(col("r2") * col("r2")).as("sr2sq"),
            sum(col("dr2")).as("sdr2"))
          .withColumn("n", lit(30L))
          .withColumn("chi2",
            ((col("k") - 1) *
              (col("sr2sq") - col("n") * col("n") * col("k") *
                (col("k") + 1) * (col("k") + 1)).cast("double")) /
              (col("sdr2") - col("n") * col("k") *
                (col("k") + 1) * (col("k") + 1)).cast("double"))
          .select(col("n").cast("bigint").as("n_blocks"),
                  col("k").cast("bigint").as("k_treatments"),
                  round(col("chi2"), 6).as("friedman_chi2"),
                  (round(col("chi2"), 6) > 9.488).as("reject_h0"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type AS g,
             |         date_diff('day', DATE '2023-12-31', CAST(ts AS DATE)) AS t,
             |         count(*) AS y
             |  FROM events GROUP BY 1, 2),
             |spine AS (
             |  SELECT e.g, gs.t, CAST(coalesce(d.y, 0) AS BIGINT) AS y
             |  FROM (SELECT DISTINCT g FROM daily) e
             |  CROSS JOIN generate_series(1, 30) gs(t)
             |  LEFT JOIN daily d ON d.g = e.g AND d.t = gs.t),
             |dr AS (
             |  SELECT g, t, y,
             |         2 * rank() OVER (PARTITION BY t ORDER BY y) +
             |           count(*) OVER (PARTITION BY t, y) - 1 AS dr
             |  FROM spine),
             |pt AS (SELECT g, sum(dr) AS r2, sum(dr * dr) AS dr2
             |       FROM dr GROUP BY g),
             |agg AS (SELECT count(*) AS k, sum(r2 * r2) AS sr2sq,
             |               sum(dr2) AS sdr2, 30 AS n
             |        FROM pt)
             |SELECT CAST(n AS BIGINT) AS n_blocks,
             |       CAST(k AS BIGINT) AS k_treatments,
             |       round(((k - 1) * CAST(sr2sq - n*n*k*(k+1)*(k+1) AS DOUBLE)) /
             |             CAST(sdr2 - n*k*(k+1)*(k+1) AS DOUBLE), 6)
             |         AS friedman_chi2,
             |       round(((k - 1) * CAST(sr2sq - n*n*k*(k+1)*(k+1) AS DOUBLE)) /
             |             CAST(sdr2 - n*k*(k+1)*(k+1) AS DOUBLE), 6) > 9.488
             |         AS reject_h0
             |FROM agg""".stripMargin))
  )
}
