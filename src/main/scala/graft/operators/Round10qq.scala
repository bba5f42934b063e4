package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 47: model-evaluation and survival statistics — the
  * Kaplan-Meier estimator (censoring-aware retention curve), the
  * cumulative-gains/lift table every propensity model report carries,
  * and Cohen's kappa (chance-corrected inter-annotator agreement)
  * composed on the declared language-ID classifier.
  *
  * Determinism discipline: every at-risk count, death count, decile
  * boundary, and confusion cell is an exact BIGINT; the one float
  * product (the KM survival curve) folds ln-factors in SORTED order
  * via the decay_engagement idiom, so both engines sum the identical
  * sequence; terminal 6-dp round only.
  *
  * Scale shape: the duration/score grids aggregate first (one shuffle
  * with map-side combine), then every cumulative runs through
  * PrefixSum's scan-parallel two-pass cumsum — no unpartitioned
  * window touches an unbounded domain anywhere in this wave. The
  * 12-row probe spine and the langs² confusion matrix are the only
  * broadcast sides.
  */
object Round10qq {

  val decls: Map[String, Decl] = Map(
    // Kaplan-Meier retention: per customer, first order = birth, last
    // order = death IF it predates the churn cutoff (no order in the
    // final observed 7 months), else right-censored at the horizon.
    // S(t) = prod_{death t_i <= t} (1 - d_i / n_i) over exact
    // (deaths, at-risk) integers, evaluated on a 12-point 30-day probe
    // spine. n_i derives from the distributed prefix sum of endpoint
    // counts over the duration grid — never a single-task window.
    "agg_kaplan_meier" -> Decl(
      (s, d) => {
        val cutoff = to_date(lit("1998-01-01"))
        val horizon = to_date(lit("1998-08-02"))
        val life = Tables(s, d, "orders")
          .groupBy("o_custkey")
          .agg(min(col("o_orderdate").cast("date")).as("first"),
               max(col("o_orderdate").cast("date")).as("last"))
          .select(
            when(col("last") < cutoff, lit(1L)).otherwise(lit(0L)).as("died"),
            when(col("last") < cutoff, datediff(col("last"), col("first")))
              .otherwise(datediff(horizon, col("first")))
              .cast("bigint").as("t"))
        val grid = life.groupBy("t")
          .agg(sum(col("died")).as("dd"), count(lit(1)).as("ee"))
        val tot = life.agg(count(lit(1)).as("n_total"),
                           sum(col("died")).as("d_total"))
        // inclusive cumsum of endpoints; at-risk(t) = N - endpoints < t
        val risk = PrefixSum.cumsumLong(grid, Seq(col("t")), col("ee"), "cum")
          .join(broadcast(tot))
          .select(col("t"), col("dd"),
                  (col("n_total") - (col("cum") - col("ee"))).as("nn"))
        val deaths = risk.filter(col("dd") > 0)
          .select(col("t"),
                  log(lit(1.0d) - col("dd").cast("double") / col("nn").cast("double"))
                    .as("lnf"),
                  col("dd"))
        val spine = s.range(1, 13)
          .select((col("id") * 30L).as("probe_days"))
        spine.join(broadcast(deaths), col("t") <= col("probe_days"), "left")
          .groupBy("probe_days")
          .agg(coalesce(sum(col("dd")), lit(0L)).as("cum_deaths"),
               array_sort(collect_list(col("lnf"))).as("lns"))
          .select(col("probe_days"), col("cum_deaths"),
                  round(exp(expr(
                    "aggregate(lns, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")), 6)
                    .as("survival"))
          .orderBy("probe_days")
      },
      Some("""WITH life AS (
             |  SELECT CASE WHEN max(CAST(o_orderdate AS DATE)) < DATE '1998-01-01'
             |              THEN 1 ELSE 0 END AS died,
             |         CASE WHEN max(CAST(o_orderdate AS DATE)) < DATE '1998-01-01'
             |              THEN date_diff('day', min(CAST(o_orderdate AS DATE)),
             |                             max(CAST(o_orderdate AS DATE)))
             |              ELSE date_diff('day', min(CAST(o_orderdate AS DATE)),
             |                             DATE '1998-08-02') END AS t
             |  FROM orders GROUP BY o_custkey),
             |grid AS (SELECT t, sum(died) AS dd, count(*) AS ee
             |         FROM life GROUP BY t),
             |tot AS (SELECT count(*) AS n_total FROM life),
             |risk AS (SELECT t, dd,
             |           n_total - (sum(ee) OVER (ORDER BY t
             |                        ROWS UNBOUNDED PRECEDING) - ee) AS nn
             |         FROM grid CROSS JOIN tot),
             |deaths AS (SELECT t, dd,
             |             ln(1.0 - CAST(dd AS DOUBLE) / nn) AS lnf
             |           FROM risk WHERE dd > 0),
             |spine AS (SELECT CAST(m * 30 AS BIGINT) AS probe_days
             |          FROM generate_series(1, 12) AS g(m))
             |SELECT probe_days,
             |       CAST(coalesce(sum(dd), 0) AS BIGINT) AS cum_deaths,
             |       round(exp(coalesce(list_sum(list(lnf ORDER BY lnf)), 0.0)), 6)
             |         AS survival
             |FROM spine LEFT JOIN deaths ON t <= probe_days
             |GROUP BY probe_days ORDER BY probe_days""".stripMargin)),

    // Cumulative-gains table: customers ranked by account balance (the
    // stand-in model score, descending), responders = customers with a
    // 1998 order. The score grid aggregates (weight, responders) per
    // distinct cent value, the two cumulatives run through ONE
    // scan-parallel prefix-sum pass, and decile boundaries + gain/lift
    // are exact integer cross-multiplies in ppm. (The ppm numerators
    // peak ~ cum_r·N·2e6 — BIGINT-safe through sf1000; the wider-scale
    // path swaps them to DECIMAL(38,0), the only change.)
    "agg_gain_deciles" -> Decl(
      (s, d) => {
        val resp = Tables(s, d, "orders")
          .filter(year(col("o_orderdate")) === 1998)
          .select(col("o_custkey").as("c_custkey")).distinct()
          .withColumn("resp", lit(1L))
        val scored = Tables(s, d, "customer")
          .select(col("c_custkey"),
                  round(col("c_acctbal") * 100).cast("bigint").as("score"))
          .join(resp, Seq("c_custkey"), "left")
          .select(col("score"), coalesce(col("resp"), lit(0L)).as("resp"))
        val grid = scored.groupBy("score")
          .agg(count(lit(1)).as("w"), sum(col("resp")).as("r"))
        val tot = scored.agg(count(lit(1)).as("n_total"),
                             sum(col("resp")).as("r_total"))
        PrefixSum.cumsumLongs(grid, Seq(col("score").desc),
                              Seq(col("w") -> "cum_n", col("r") -> "cum_r"))
          .join(broadcast(tot))
          .select(expr("(cum_n * 10L + n_total - 1L) div n_total").as("decile"),
                  col("cum_n"), col("cum_r"), col("n_total"), col("r_total"))
          .groupBy("decile")
          .agg(max(col("cum_n")).as("cum_customers"),
               max(col("cum_r")).as("cum_responders"),
               max(col("n_total")).as("nt"), max(col("r_total")).as("rt"))
          .select(col("decile"), col("cum_customers"), col("cum_responders"),
                  expr("(cum_responders * 2000000L + rt) div (2L * rt)")
                    .as("gain_ppm"),
                  expr("(cum_responders * nt * 2000000L + cum_customers * rt) " +
                       "div (2L * cum_customers * rt)").as("lift_ppm"))
          .orderBy("decile")
      },
      Some("""WITH resp AS (SELECT DISTINCT o_custkey AS c_custkey, 1 AS resp
             |              FROM orders WHERE year(o_orderdate) = 1998),
             |scored AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS score,
             |                  coalesce(resp, 0) AS resp
             |           FROM customer LEFT JOIN resp USING (c_custkey)),
             |grid AS (SELECT score, count(*) AS w, sum(resp) AS r
             |         FROM scored GROUP BY score),
             |tot AS (SELECT count(*) AS n_total, sum(resp) AS r_total FROM scored),
             |cum AS (SELECT sum(w) OVER (ORDER BY score DESC
             |                  ROWS UNBOUNDED PRECEDING) AS cum_n,
             |               sum(r) OVER (ORDER BY score DESC
             |                  ROWS UNBOUNDED PRECEDING) AS cum_r,
             |               n_total, r_total
             |        FROM grid CROSS JOIN tot)
             |SELECT CAST((cum_n * 10 + n_total - 1) // n_total AS BIGINT) AS decile,
             |       CAST(max(cum_n) AS BIGINT) AS cum_customers,
             |       CAST(max(cum_r) AS BIGINT) AS cum_responders,
             |       CAST((max(cum_r) * 2000000 + max(r_total))
             |            // (2 * max(r_total)) AS BIGINT) AS gain_ppm,
             |       CAST((max(cum_r) * max(n_total) * 2000000
             |             + max(cum_n) * max(r_total))
             |            // (2 * max(cum_n) * max(r_total)) AS BIGINT) AS lift_ppm
             |FROM cum
             |GROUP BY (cum_n * 10 + n_total - 1) // n_total
             |ORDER BY decile""".stripMargin)),

    // Cohen's kappa between the gold language label and the declared
    // text_langid classifier — chance-corrected agreement, the
    // labeling-pipeline QA number. Composes the EXISTING key (query and
    // oracle both reused, lockstep with the classifier). kappa =
    // (N·sum(diag) - sum(row_l·col_l)) / (N² - sum(row_l·col_l)) over
    // exact integers from the langs²-bounded confusion matrix; one
    // terminal 6-dp division.
    "agg_cohen_kappa" -> Decl(
      (s, d) => {
        val pred = PipelineExt.decls("text_langid").query(s, d)
          .select(col("lang"), col("predicted"))
        val rows = pred.groupBy(col("lang").as("lbl"))
          .agg(count(lit(1)).as("row_n"))
        val cols = pred.groupBy(col("predicted").as("lbl"))
          .agg(count(lit(1)).as("col_n"))
        val margins = rows.join(cols, Seq("lbl"), "full_outer")
          .select(coalesce(col("row_n"), lit(0L)).as("row_n"),
                  coalesce(col("col_n"), lit(0L)).as("col_n"))
          .agg(sum(col("row_n") * col("col_n")).as("pe_num"),
               sum(col("row_n")).as("n"))
        val po = pred.agg(
          sum(when(col("lang") === col("predicted"), 1L).otherwise(0L))
            .as("po_num"))
        po.crossJoin(broadcast(margins))
          .select(col("n").as("n_items"), col("po_num").as("n_agree"),
                  round(col("po_num").cast("double") / col("n"), 6).as("po"),
                  round(col("pe_num").cast("double") / (col("n") * col("n")), 6)
                    .as("pe"),
                  round((col("n") * col("po_num") - col("pe_num")).cast("double")
                          / (col("n") * col("n") - col("pe_num")).cast("double"), 6)
                    .as("kappa"))
      },
      Some {
        val inner = PipelineExt.decls("text_langid").oracle.get
        s"""WITH pred AS ($inner),
           |m AS (SELECT coalesce(r.row_n, 0) AS row_n,
           |             coalesce(c.col_n, 0) AS col_n
           |      FROM (SELECT lang AS lbl, count(*) AS row_n
           |            FROM pred GROUP BY 1) r
           |      FULL OUTER JOIN (SELECT predicted AS lbl, count(*) AS col_n
           |                       FROM pred GROUP BY 1) c USING (lbl)),
           |g AS (SELECT sum(row_n * col_n) AS pe_num, sum(row_n) AS n FROM m),
           |p AS (SELECT sum(CASE WHEN lang = predicted THEN 1 ELSE 0 END)
           |        AS po_num FROM pred)
           |SELECT CAST(n AS BIGINT) AS n_items,
           |       CAST(po_num AS BIGINT) AS n_agree,
           |       round(CAST(po_num AS DOUBLE) / n, 6) AS po,
           |       round(CAST(pe_num AS DOUBLE) / (n * n), 6) AS pe,
           |       round(CAST(n * po_num - pe_num AS DOUBLE)
           |             / CAST(n * n - pe_num AS DOUBLE), 6) AS kappa
           |FROM p CROSS JOIN g""".stripMargin
      })
  )
}
