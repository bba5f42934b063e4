package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 wave 81: structural-break and k-group nonparametric
  * testing — the Chow test for a regression break between the first
  * and second half of the daily purchase series (the standard "did
  * the trend change at the known breakpoint?" screen: pooled-vs-split
  * OLS residual F-ratio, all three fits closed-form from one pass of
  * integer-exact sums) and the Kruskal-Wallis H test extending the
  * mann_whitney two-sample rank machinery to all five event types
  * (rank sums from the SAME bounded 2-dp value grid, ties handled by
  * average ranks and the classical tie correction).
  *
  * Determinism: Chow consumes only integer-exact sums (t ≤ 30, counts)
  * through identical IEEE expression trees. Kruskal-Wallis keeps ranks
  * exact by working in DOUBLED rank units (2·avgrank is an integer even
  * at .5 ties); the five per-group H terms fold in group order (sorted-
  * fold discipline) so the float association is pinned; tie terms
  * t³ − t stay BIGINT.
  *
  * Scale shape: Chow is one aggregate over the calendar spine. KW is
  * one grid groupBy + the allowlisted bounded-grid cumulative window +
  * a 5-row fold — the value DOMAIN saturates, not the corpus.
  */
object Round11y {

  val decls: Map[String, Decl] = Map(
    // Chow test at the known mid-series breakpoint: fit y = a + b·t on
    // days 1–15, days 16–30, and pooled; F = ((RSSp − RSS1 − RSS2)/2) /
    // ((RSS1 + RSS2)/(n − 4)).
    "ts_chow_break_test" -> Decl(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(datediff(col("ts").cast("date"), to_date(lit("2023-12-31")))
                     .cast("bigint").as("t"))
          .agg(count(lit(1)).as("y"))
        val spine = s.range(1, 31).select(col("id").as("t"))
          .join(daily, Seq("t"), "left")
          .select(col("t").cast("double").as("t"),
                  coalesce(col("y"), lit(0L)).cast("double").as("y"),
                  (col("t") <= 15).as("first_half"))
        def seg(pred: org.apache.spark.sql.Column, tag: String) = Seq(
          sum(when(pred, 1.0).otherwise(0.0)).as(s"n$tag"),
          sum(when(pred, col("t")).otherwise(0.0)).as(s"st$tag"),
          sum(when(pred, col("y")).otherwise(0.0)).as(s"sy$tag"),
          sum(when(pred, col("t") * col("t")).otherwise(0.0)).as(s"stt$tag"),
          sum(when(pred, col("t") * col("y")).otherwise(0.0)).as(s"sty$tag"),
          sum(when(pred, col("y") * col("y")).otherwise(0.0)).as(s"syy$tag"))
        val allAggs = seg(col("first_half"), "1") ++
          seg(!col("first_half"), "2") ++ seg(lit(true), "p")
        val sums = spine.agg(allAggs.head, allAggs.tail: _*)
        def fit(df: org.apache.spark.sql.DataFrame, tag: String) = df
          .withColumn(s"b$tag",
            (col(s"n$tag") * col(s"sty$tag") - col(s"st$tag") * col(s"sy$tag")) /
              (col(s"n$tag") * col(s"stt$tag") - col(s"st$tag") * col(s"st$tag")))
          .withColumn(s"a$tag",
            (col(s"sy$tag") - col(s"b$tag") * col(s"st$tag")) / col(s"n$tag"))
          .withColumn(s"rss$tag",
            col(s"syy$tag") - col(s"a$tag") * col(s"sy$tag") -
              col(s"b$tag") * col(s"sty$tag"))
        fit(fit(fit(sums, "1"), "2"), "p")
          .withColumn("chow_f",
            ((col("rssp") - col("rss1") - col("rss2")) / 2) /
              ((col("rss1") + col("rss2")) / (col("np") - 4)))
          .select(round(col("b1"), 6).as("slope_first"),
                  round(col("b2"), 6).as("slope_second"),
                  round(col("bp"), 6).as("slope_pooled"),
                  round(col("rss1"), 6).as("rss_first"),
                  round(col("rss2"), 6).as("rss_second"),
                  round(col("rssp"), 6).as("rss_pooled"),
                  round(col("chow_f"), 6).as("chow_f"),
                  (round(col("chow_f"), 6) > 3.369).as("structural_break"))
      },
      Some("""WITH daily AS (
             |  SELECT date_diff('day', DATE '2023-12-31', CAST(ts AS DATE)) AS t,
             |         count(*) AS y
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |spine AS (
             |  SELECT CAST(g.t AS DOUBLE) AS t,
             |         CAST(coalesce(y, 0) AS DOUBLE) AS y,
             |         g.t <= 15 AS fh
             |  FROM generate_series(1, 30) g(t) LEFT JOIN daily ON daily.t = g.t),
             |s AS (
             |  SELECT
             |    CAST(sum(CASE WHEN fh THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
             |    sum(CASE WHEN fh THEN t ELSE 0.0 END) AS st1,
             |    sum(CASE WHEN fh THEN y ELSE 0.0 END) AS sy1,
             |    sum(CASE WHEN fh THEN t*t ELSE 0.0 END) AS stt1,
             |    sum(CASE WHEN fh THEN t*y ELSE 0.0 END) AS sty1,
             |    sum(CASE WHEN fh THEN y*y ELSE 0.0 END) AS syy1,
             |    CAST(sum(CASE WHEN NOT fh THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
             |    sum(CASE WHEN NOT fh THEN t ELSE 0.0 END) AS st2,
             |    sum(CASE WHEN NOT fh THEN y ELSE 0.0 END) AS sy2,
             |    sum(CASE WHEN NOT fh THEN t*t ELSE 0.0 END) AS stt2,
             |    sum(CASE WHEN NOT fh THEN t*y ELSE 0.0 END) AS sty2,
             |    sum(CASE WHEN NOT fh THEN y*y ELSE 0.0 END) AS syy2,
             |    CAST(count(*) AS DOUBLE) AS np, sum(t) AS stp, sum(y) AS syp,
             |    sum(t*t) AS sttp, sum(t*y) AS styp, sum(y*y) AS syyp
             |  FROM spine),
             |f1 AS (SELECT *,
             |         (n1*sty1 - st1*sy1) / (n1*stt1 - st1*st1) AS b1,
             |         (n2*sty2 - st2*sy2) / (n2*stt2 - st2*st2) AS b2,
             |         (np*styp - stp*syp) / (np*sttp - stp*stp) AS bp
             |       FROM s),
             |f2 AS (SELECT *,
             |         (sy1 - b1*st1) / n1 AS a1,
             |         (sy2 - b2*st2) / n2 AS a2,
             |         (syp - bp*stp) / np AS ap
             |       FROM f1),
             |f3 AS (SELECT *,
             |         syy1 - a1*sy1 - b1*sty1 AS rss1,
             |         syy2 - a2*sy2 - b2*sty2 AS rss2,
             |         syyp - ap*syp - bp*styp AS rssp
             |       FROM f2),
             |f4 AS (SELECT *,
             |         ((rssp - rss1 - rss2) / 2) / ((rss1 + rss2) / (np - 4))
             |           AS chow_f
             |       FROM f3)
             |SELECT round(b1, 6) AS slope_first,
             |       round(b2, 6) AS slope_second,
             |       round(bp, 6) AS slope_pooled,
             |       round(rss1, 6) AS rss_first,
             |       round(rss2, 6) AS rss_second,
             |       round(rssp, 6) AS rss_pooled,
             |       round(chow_f, 6) AS chow_f,
             |       round(chow_f, 6) > 3.369 AS structural_break
             |FROM f4""".stripMargin)),

    // Kruskal-Wallis H over all five event types' value distributions:
    // doubled average ranks off the 2-dp grid keep everything BIGINT
    // until the 5-term fold; the tie-corrected H = H / (1 − Σ(t³−t)/(N³−N)).
    "agg_kruskal_wallis" -> Decl(
      (s, d) => {
        val w = Window.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, -1)
        val grid = Tables.events(s, d)
          .select(round(col("value") * 100).cast("bigint").as("cents"),
                  col("event_type"))
          .groupBy("cents", "event_type").agg(count(lit(1)).as("cg"))
          .groupBy("cents")
          .agg(sum(col("cg")).as("ct"),
               collect_list(struct(col("event_type"), col("cg"))).as("parts"))
        val ranked = grid
          .withColumn("before", coalesce(sum(col("ct")).over(w), lit(0L)))
          // doubled average rank of every row at this value: integer
          .withColumn("dr", lit(2) * col("before") + col("ct") + 1)
          .select(col("ct"), col("dr"), explode(col("parts")).as("p"))
          .select(col("p.event_type").as("g"), col("p.cg").as("cg"),
                  col("dr"), col("ct"))
        val perGroup = ranked.groupBy("g")
          .agg(sum(col("cg")).as("ng"),
               sum(col("cg") * col("dr")).as("dr_sum")) // Σ 2·rank
        val tieTerm = grid.agg(
          sum(col("ct") * col("ct") * col("ct") - col("ct")).as("tie3"),
          sum(col("ct")).as("n"))
        perGroup
          .withColumn("term",
            (col("dr_sum").cast("double") / 2) *
              (col("dr_sum").cast("double") / 2) / col("ng"))
          .agg(expr("round(aggregate(array_sort(collect_list(struct(g, term))), " +
                    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term), 6)")
                 .as("rterm"),
               count(lit(1)).as("k_groups"))
          .crossJoin(broadcast(tieTerm))
          .withColumn("h",
            lit(12.0) / (col("n") * (col("n") + 1)) * col("rterm") -
              lit(3) * (col("n") + 1))
          .withColumn("c",
            lit(1.0) - col("tie3").cast("double") /
              (col("n").cast("double") * col("n") * col("n") - col("n")))
          .select(col("k_groups"), col("n").cast("bigint").as("n"),
                  round(col("h"), 6).as("h_raw"),
                  round(col("c"), 6).as("tie_correction"),
                  round(col("h") / col("c"), 6).as("h_adj"),
                  (round(col("h") / col("c"), 6) > 9.488).as("reject_h0"))
      },
      Some("""WITH ev AS (
             |  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type
             |  FROM events),
             |cell AS (SELECT cents, event_type, count(*) AS cg
             |         FROM ev GROUP BY cents, event_type),
             |grid AS (SELECT cents, sum(cg) AS ct FROM cell GROUP BY cents),
             |r AS (SELECT cents, ct,
             |        coalesce(sum(ct) OVER (ORDER BY cents
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |          AS before
             |      FROM grid),
             |ranked AS (
             |  SELECT cell.event_type AS g, cell.cg,
             |         2 * r.before + r.ct + 1 AS dr
             |  FROM cell JOIN r USING (cents)),
             |pg AS (SELECT g, sum(cg) AS ng, sum(cg * dr) AS dr_sum
             |       FROM ranked GROUP BY g),
             |tt AS (SELECT sum(ct*ct*ct - ct) AS tie3, sum(ct) AS n FROM grid),
             |agg AS (
             |  SELECT round(list_sum(list(
             |           (CAST(dr_sum AS DOUBLE) / 2) *
             |           (CAST(dr_sum AS DOUBLE) / 2) / ng ORDER BY g)), 6)
             |           AS rterm,
             |         count(*) AS k_groups
             |  FROM pg),
             |h AS (
             |  SELECT k_groups, n,
             |         12.0 / (CAST(n AS DOUBLE) * (n + 1)) * rterm - 3 * (n + 1)
             |           AS h,
             |         1.0 - CAST(tie3 AS DOUBLE) /
             |               (CAST(n AS DOUBLE) * n * n - n) AS c
             |  FROM agg CROSS JOIN tt)
             |SELECT k_groups, CAST(n AS BIGINT) AS n,
             |       round(h, 6) AS h_raw,
             |       round(c, 6) AS tie_correction,
             |       round(h / c, 6) AS h_adj,
             |       round(h / c, 6) > 9.488 AS reject_h0
             |FROM h""".stripMargin))
  )
}
