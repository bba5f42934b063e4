package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 52: model-evaluation statistics — McNemar's paired
  * classifier test (composed on the declared language-ID classifier vs
  * the majority-class baseline), the calibration/reliability table
  * (predicted-probability bins vs observed rates — the ECE input), and
  * PSI distribution-drift monitoring between the fixture's two halves.
  *
  * Determinism: every count is BIGINT, every rate/probability is an
  * exact half-up ppm integer, bands are integer-arithmetic bucket ids
  * (no float log in the bucketing path), and the only doubles are
  * terminal 6-dp expressions computed per-row from exact integers — no
  * float ever crosses an aggregation merge.
  *
  * Scale shape: each key is one scan + one map-side-combined aggregate
  * onto a domain-bounded grid (2×2 discordance cells, 10 probability
  * bins, 25 value bands); everything after the first shuffle is
  * constant-size at any corpus scale.
  */
object Round10vv {

  val decls: Map[String, Decl] = Map(
    // McNemar's test: two responder-prediction rules on the SAME
    // customers — rule A (balance >= 4500) vs rule B (building/auto
    // segment), truth = placed a 1998 order. The PAIRED design counts
    // discordant pairs only (b = A right & B wrong, c = A wrong & B
    // right); chi² with continuity correction = (|b−c|−1)²/(b+c). The
    // question Welch/kappa don't answer: is A's edge over B larger than
    // its paired flips?
    "agg_mcnemar_test" -> Decl(
      (s, d) => {
        val resp = Tables(s, d, "orders")
          .filter(year(col("o_orderdate")) === 1998)
          .select(col("o_custkey").as("c_custkey")).distinct()
          .withColumn("r", lit(1L))
        val scored = Tables(s, d, "customer")
          .join(resp, Seq("c_custkey"), "left")
          .select(coalesce(col("r"), lit(0L)).as("truth"),
                  when(col("c_acctbal") >= 4500, 1L).otherwise(0L).as("pa"),
                  when(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"), 1L)
                    .otherwise(0L).as("pb"))
        scored.agg(
            count(lit(1)).as("n"),
            sum(when(col("pa") === col("truth") && col("pb") =!= col("truth"),
                     1L).otherwise(0L)).as("b"),
            sum(when(col("pa") =!= col("truth") && col("pb") === col("truth"),
                     1L).otherwise(0L)).as("c"))
          .select(col("n"), col("b"), col("c"),
                  round((abs(col("b") - col("c")) - lit(1L))
                          .cast("double") *
                        (abs(col("b") - col("c")) - lit(1L)).cast("double") /
                        (col("b") + col("c")).cast("double"), 6).as("chi2_cc"))
      },
      Some("""WITH resp AS (SELECT DISTINCT o_custkey AS c_custkey, 1 AS r
             |              FROM orders WHERE year(o_orderdate) = 1998),
             |scored AS (
             |  SELECT coalesce(r, 0) AS truth,
             |         CASE WHEN c_acctbal >= 4500 THEN 1 ELSE 0 END AS pa,
             |         CASE WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
             |              THEN 1 ELSE 0 END AS pb
             |  FROM customer LEFT JOIN resp USING (c_custkey)),
             |g AS (SELECT count(*) AS n,
             |             sum(CASE WHEN pa = truth AND pb <> truth
             |                      THEN 1 ELSE 0 END) AS b,
             |             sum(CASE WHEN pa <> truth AND pb = truth
             |                      THEN 1 ELSE 0 END) AS c
             |      FROM scored)
             |SELECT CAST(n AS BIGINT) AS n, CAST(b AS BIGINT) AS b,
             |       CAST(c AS BIGINT) AS c,
             |       round(CAST(abs(b - c) - 1 AS DOUBLE)
             |             * CAST(abs(b - c) - 1 AS DOUBLE)
             |             / CAST(b + c AS DOUBLE), 6) AS chi2_cc
             |FROM g""".stripMargin)),

    // Calibration/reliability table: the account balance min-max mapped
    // to an exact ppm pseudo-probability, 10 fixed bins, observed rate =
    // 1998-responder share per bin. mean-predicted vs observed gap per
    // bin is the Expected-Calibration-Error integrand; everything is
    // exact half-up ppm BIGINT arithmetic.
    "agg_calibration_bins" -> Decl(
      (s, d) => {
        val resp = Tables(s, d, "orders")
          .filter(year(col("o_orderdate")) === 1998)
          .select(col("o_custkey").as("c_custkey")).distinct()
          .withColumn("r", lit(1L))
        Tables(s, d, "customer")
          .select(col("c_custkey"),
                  round(col("c_acctbal") * 100).cast("bigint").as("cents"))
          .join(resp, Seq("c_custkey"), "left")
          .select(
            expr("((cents + 100000L) * 1000000L + 550000L) div 1100000L")
              .as("p_ppm"),
            coalesce(col("r"), lit(0L)).as("r"))
          .select(least(expr("p_ppm div 100000L"), lit(9L)).as("bin"),
                  col("p_ppm"), col("r"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"), sum(col("p_ppm")).as("sp"),
               sum(col("r")).as("nr"))
          .select(col("bin"), col("n"),
                  expr("(sp * 2L + n) div (2L * n)").as("mean_pred_ppm"),
                  expr("(nr * 2000000L + n) div (2L * n)").as("obs_ppm"),
                  abs(expr("(sp * 2L + n) div (2L * n)") -
                      expr("(nr * 2000000L + n) div (2L * n)")).as("gap_ppm"))
          .orderBy("bin")
      },
      Some("""WITH resp AS (SELECT DISTINCT o_custkey AS c_custkey, 1 AS r
             |              FROM orders WHERE year(o_orderdate) = 1998),
             |p AS (SELECT ((CAST(round(c_acctbal * 100) AS BIGINT) + 100000)
             |              * 1000000 + 550000) // 1100000 AS p_ppm,
             |             coalesce(r, 0) AS r
             |      FROM customer LEFT JOIN resp USING (c_custkey)),
             |b AS (SELECT least(p_ppm // 100000, 9) AS bin, p_ppm, r FROM p)
             |SELECT bin, CAST(count(*) AS BIGINT) AS n,
             |       CAST((sum(p_ppm) * 2 + count(*)) // (2 * count(*)) AS BIGINT)
             |         AS mean_pred_ppm,
             |       CAST((sum(r) * 2000000 + count(*)) // (2 * count(*)) AS BIGINT)
             |         AS obs_ppm,
             |       CAST(abs((sum(p_ppm) * 2 + count(*)) // (2 * count(*))
             |              - (sum(r) * 2000000 + count(*)) // (2 * count(*)))
             |            AS BIGINT) AS gap_ppm
             |FROM b GROUP BY bin ORDER BY bin""".stripMargin)),

    // PSI drift between the fixture's two halves (Jan 1-15 expected vs
    // Jan 16-30 actual): event value in exact $20-cent bands (capped at
    // 24 — integer bucketing, no float log), per-band shares as exact
    // ppm, per-band PSI term (p−q)·ln(p/q) as a terminal per-row double.
    // The total PSI is the spec's fold — keeping the declared output
    // per-band keeps every float per-row deterministic.
    "ts_psi_drift" -> Decl(
      (s, d) => {
        val banded = Tables.events(s, d)
          .select(
            least(expr("cast(round(value * 100) as bigint) div 2000L"),
                  lit(24L)).as("band"),
            (col("ts").cast("date") < to_date(lit("2024-01-16"))).as("pre"))
        val grid = banded.groupBy("band")
          .agg(sum(when(col("pre"), 1L).otherwise(0L)).as("na"),
               sum(when(!col("pre"), 1L).otherwise(0L)).as("nb"))
        val tot = grid.agg(sum("na").as("ta"), sum("nb").as("tb"))
        // Laplace add-one smoothing (the standard PSI guard): a band that
        // one half never hits would otherwise put ln(0) in the term, and
        // the engines disagree on ln(0) (NULL vs -inf).
        grid.join(broadcast(tot))
          .select(col("band"), col("na"), col("nb"),
                  expr("((na + 1L) * 2000000L + ta + 25L) div (2L * (ta + 25L))")
                    .as("p_ppm"),
                  expr("((nb + 1L) * 2000000L + tb + 25L) div (2L * (tb + 25L))")
                    .as("q_ppm"))
          .select(col("band"), col("na"), col("nb"), col("p_ppm"), col("q_ppm"),
                  round((col("p_ppm") - col("q_ppm")).cast("double") / 1e6 *
                        (log(col("p_ppm").cast("double")) -
                         log(col("q_ppm").cast("double"))), 6).as("psi_term"))
          .orderBy("band")
      },
      Some("""WITH banded AS (
             |  SELECT least(CAST(round(value * 100) AS BIGINT) // 2000, 24)
             |           AS band,
             |         CAST(ts AS DATE) < DATE '2024-01-16' AS pre
             |  FROM events),
             |grid AS (SELECT band,
             |                sum(CASE WHEN pre THEN 1 ELSE 0 END) AS na,
             |                sum(CASE WHEN pre THEN 0 ELSE 1 END) AS nb
             |         FROM banded GROUP BY band),
             |tot AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM grid),
             |ppm AS (SELECT band, na, nb,
             |               ((na + 1) * 2000000 + ta + 25) // (2 * (ta + 25))
             |                 AS p_ppm,
             |               ((nb + 1) * 2000000 + tb + 25) // (2 * (tb + 25))
             |                 AS q_ppm
             |        FROM grid CROSS JOIN tot)
             |SELECT band, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
             |       CAST(p_ppm AS BIGINT) AS p_ppm, CAST(q_ppm AS BIGINT) AS q_ppm,
             |       round(CAST(p_ppm - q_ppm AS DOUBLE) / 1e6 *
             |             (ln(CAST(p_ppm AS DOUBLE)) - ln(CAST(q_ppm AS DOUBLE))), 6)
             |         AS psi_term
             |FROM ppm ORDER BY band""".stripMargin))
  )
}
