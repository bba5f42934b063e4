package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 57: classifier-threshold analysis — the full ROC table
  * (one row per distinct score with exact-ppm TPR/FPR/Youden-J), the
  * exact trapezoid AUC from tie-corrected rank sums, and the
  * event-study generalization of diff-in-diff (per-day treatment
  * contrasts around the intervention date).
  *
  * Determinism: the ROC cumulatives run through PrefixSum's scan-
  * parallel cumsum over the (score desc) total order; AUC is the exact
  * Mann-Whitney identity 2ΣR_pos = Σ_g p_g(2·below + n_g + 1) — pure
  * BIGINT to the terminal ppm division; the event-study means divide
  * exact cents sums once, 6-dp.
  *
  * Scale shape: everything reduces to the distinct-score grid (one
  * map-side-combined aggregate) or the 15-day offset spine; no
  * unpartitioned window anywhere (the Youden argmax is a max-struct
  * aggregate, not a sort).
  */
object Round11a {

  val decls: Map[String, Decl] = Map(
    // ROC curve table: rank customers by account balance (score desc),
    // truth = 1998 responder. One row per distinct score: exact-ppm TPR
    // (recall), FPR, and Youden's J = TPR − FPR at the ">= score"
    // threshold. cum counts via the distributed prefix sum.
    "agg_roc_points" -> Decl(
      (s, d) => {
        val resp = Tables(s, d, "orders")
          .filter(year(col("o_orderdate")) === 1998)
          .select(col("o_custkey").as("c_custkey")).distinct()
          .withColumn("r", lit(1L))
        val scored = Tables(s, d, "customer")
          .select(col("c_custkey"),
                  round(col("c_acctbal") * 100).cast("bigint").as("score"))
          .join(resp, Seq("c_custkey"), "left")
          .select(col("score"), coalesce(col("r"), lit(0L)).as("r"))
        val grid = scored.groupBy("score")
          .agg(count(lit(1)).as("n"), sum(col("r")).as("p"))
        val tot = scored.agg(count(lit(1)).as("nt"), sum(col("r")).as("pt"))
        PrefixSum.cumsumLongs(grid, Seq(col("score").desc),
                              Seq(col("n") -> "cn", col("p") -> "cp"))
          .join(broadcast(tot))
          .select(col("score"), col("n"), col("p"),
                  expr("(cp * 2000000L + pt) div (2L * pt)").as("tpr_ppm"),
                  expr("((cn - cp) * 2000000L + nt - pt) div (2L * (nt - pt))")
                    .as("fpr_ppm"))
          .withColumn("j_ppm", col("tpr_ppm") - col("fpr_ppm"))
          .orderBy(col("score").desc)
      },
      Some("""WITH resp AS (SELECT DISTINCT o_custkey AS c_custkey, 1 AS r
             |              FROM orders WHERE year(o_orderdate) = 1998),
             |scored AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS score,
             |                  coalesce(r, 0) AS r
             |           FROM customer LEFT JOIN resp USING (c_custkey)),
             |grid AS (SELECT score, count(*) AS n, sum(r) AS p
             |         FROM scored GROUP BY score),
             |tot AS (SELECT count(*) AS nt, sum(r) AS pt FROM scored),
             |cum AS (SELECT score, n, p,
             |          sum(n) OVER (ORDER BY score DESC
             |            ROWS UNBOUNDED PRECEDING) AS cn,
             |          sum(p) OVER (ORDER BY score DESC
             |            ROWS UNBOUNDED PRECEDING) AS cp
             |        FROM grid)
             |SELECT score, CAST(n AS BIGINT) AS n, CAST(p AS BIGINT) AS p,
             |       CAST((cp * 2000000 + pt) // (2 * pt) AS BIGINT) AS tpr_ppm,
             |       CAST(((cn - cp) * 2000000 + nt - pt) // (2 * (nt - pt))
             |            AS BIGINT) AS fpr_ppm,
             |       CAST((cp * 2000000 + pt) // (2 * pt)
             |            - ((cn - cp) * 2000000 + nt - pt) // (2 * (nt - pt))
             |            AS BIGINT) AS j_ppm
             |FROM cum CROSS JOIN tot ORDER BY score DESC""".stripMargin)),

    // Exact AUC + the Youden-optimal threshold in one row. AUC by the
    // tie-corrected Mann-Whitney identity (average ranks ascending in
    // score): 2·ΣR_pos = Σ_g p_g·(2·below_g + n_g + 1) — below from the
    // SAME prefix-sum grid; auc_ppm = (2ΣR − P(P+1)) ppm / (2PN). The
    // Youden row is a max-struct argmax over the grid (j desc, then
    // score asc for the deterministic tie-break).
    "agg_auc_youden" -> Decl(
      (s, d) => {
        val resp = Tables(s, d, "orders")
          .filter(year(col("o_orderdate")) === 1998)
          .select(col("o_custkey").as("c_custkey")).distinct()
          .withColumn("r", lit(1L))
        val scored = Tables(s, d, "customer")
          .select(col("c_custkey"),
                  round(col("c_acctbal") * 100).cast("bigint").as("score"))
          .join(resp, Seq("c_custkey"), "left")
          .select(col("score"), coalesce(col("r"), lit(0L)).as("r"))
        val grid = scored.groupBy("score")
          .agg(count(lit(1)).as("n"), sum(col("r")).as("p"))
        val tot = scored.agg(count(lit(1)).as("nt"), sum(col("r")).as("pt"))
        val cum = PrefixSum.cumsumLongs(grid, Seq(col("score").asc),
                                        Seq(col("n") -> "cn_asc"))
          .withColumn("below", col("cn_asc") - col("n"))
        val ranks = cum
          .agg(sum(col("p") * (col("below") * 2L + col("n") + 1L))
                 .as("two_rpos"))
        // Youden argmax needs the DESC cumulatives — reuse the ROC shape
        val roc = PrefixSum.cumsumLongs(grid, Seq(col("score").desc),
                                        Seq(col("n") -> "cn", col("p") -> "cp"))
          .join(broadcast(tot))
          .select(col("score"),
                  (expr("(cp * 2000000L + pt) div (2L * pt)") -
                   expr("((cn - cp) * 2000000L + nt - pt) div (2L * (nt - pt))"))
                    .as("j_ppm"))
        val best = roc.agg(
          max(struct(col("j_ppm"), (-col("score")).as("ns"))).as("b"))
          .select(col("b.j_ppm").as("youden_j_ppm"),
                  (-col("b.ns")).as("youden_threshold_cents"))
        ranks.crossJoin(broadcast(tot)).crossJoin(broadcast(best))
          .select(col("pt").as("n_pos"), (col("nt") - col("pt")).as("n_neg"),
                  // auc = (2ΣR − P(P+1)) / (2PN); half-up ppm. BIGINT-safe
                  // through sf100; the wider-scale path is the documented
                  // DECIMAL(38,0) swap (gain-deciles precedent).
                  expr("""((two_rpos - pt * (pt + 1L)) * 1000000L
                         | + pt * (nt - pt))
                         | div (2L * pt * (nt - pt))""".stripMargin)
                    .as("auc_ppm"),
                  col("youden_j_ppm"), col("youden_threshold_cents"))
      },
      Some("""WITH resp AS (SELECT DISTINCT o_custkey AS c_custkey, 1 AS r
             |              FROM orders WHERE year(o_orderdate) = 1998),
             |scored AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS score,
             |                  coalesce(r, 0) AS r
             |           FROM customer LEFT JOIN resp USING (c_custkey)),
             |grid AS (SELECT score, count(*) AS n, sum(r) AS p
             |         FROM scored GROUP BY score),
             |tot AS (SELECT count(*) AS nt, sum(r) AS pt FROM scored),
             |asc_ AS (SELECT score, n, p,
             |           sum(n) OVER (ORDER BY score ASC
             |             ROWS UNBOUNDED PRECEDING) - n AS below
             |         FROM grid),
             |ranks AS (SELECT sum(p * (below * 2 + n + 1)) AS two_rpos
             |          FROM asc_),
             |rocd AS (SELECT score,
             |           (sum(p) OVER w * 2000000 + pt) // (2 * pt)
             |           - ((sum(n) OVER w - sum(p) OVER w) * 2000000 + nt - pt)
             |             // (2 * (nt - pt)) AS j_ppm
             |         FROM grid CROSS JOIN tot
             |         WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)),
             |best AS (SELECT j_ppm AS youden_j_ppm,
             |                score AS youden_threshold_cents
             |         FROM rocd ORDER BY j_ppm DESC, score ASC LIMIT 1)
             |SELECT CAST(pt AS BIGINT) AS n_pos,
             |       CAST(nt - pt AS BIGINT) AS n_neg,
             |       CAST(((two_rpos - pt * (pt + 1)) * 1000000
             |             + pt * (nt - pt))
             |            // (2 * pt * (nt - pt)) AS BIGINT) AS auc_ppm,
             |       CAST(youden_j_ppm AS BIGINT) AS youden_j_ppm,
             |       CAST(youden_threshold_cents AS BIGINT)
             |         AS youden_threshold_cents
             |FROM ranks CROSS JOIN tot CROSS JOIN best""".stripMargin)),

    // Event study around the Jan-16 intervention: per day offset −7..+7,
    // the treated-vs-control contrast in mean event value (treated =
    // users who ever signup). The per-period trace diff-in-diff
    // collapses into one number — this is the pre-trend/dynamics view
    // reviewers actually ask for.
    "ts_did_event_study" -> Decl(
      (s, d) => {
        val treatedUsers = Tables.events(s, d)
          .filter(col("event_type") === "signup")
          .select(col("user_id")).distinct()
          .withColumn("tr", lit(1L))
        val base = Tables.events(s, d)
          .select(col("user_id"),
                  datediff(col("ts").cast("date"), to_date(lit("2024-01-16")))
                    .cast("bigint").as("day_offset"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .filter(col("day_offset") >= -7 && col("day_offset") <= 7)
          .join(broadcast(treatedUsers), Seq("user_id"), "left")
          .select(col("day_offset"), col("c"),
                  coalesce(col("tr"), lit(0L)).as("tr"))
        base.groupBy("day_offset")
          .agg(sum(when(col("tr") === 1L, 1L).otherwise(0L)).as("n_t"),
               sum(when(col("tr") === 1L, col("c")).otherwise(0L)).as("s_t"),
               sum(when(col("tr") === 0L, 1L).otherwise(0L)).as("n_c"),
               sum(when(col("tr") === 0L, col("c")).otherwise(0L)).as("s_c"))
          .select(col("day_offset"), col("n_t"), col("n_c"),
                  when(col("n_t") > 0,
                    round(col("s_t").cast("double") / col("n_t") / 100.0, 6))
                    .as("treated_mean"),
                  when(col("n_c") > 0,
                    round(col("s_c").cast("double") / col("n_c") / 100.0, 6))
                    .as("control_mean"),
                  when(col("n_t") > 0 && col("n_c") > 0,
                    round(col("s_t").cast("double") / col("n_t") / 100.0 -
                          col("s_c").cast("double") / col("n_c") / 100.0, 6))
                    .as("contrast"))
          .orderBy("day_offset")
      },
      Some("""WITH treated AS (SELECT DISTINCT user_id, 1 AS tr FROM events
             |                 WHERE event_type = 'signup'),
             |base AS (
             |  SELECT date_diff('day', DATE '2024-01-16', CAST(ts AS DATE))
             |           AS day_offset,
             |         CAST(round(value * 100) AS BIGINT) AS c,
             |         coalesce(tr, 0) AS tr
             |  FROM events LEFT JOIN treated USING (user_id)
             |  WHERE date_diff('day', DATE '2024-01-16', CAST(ts AS DATE))
             |        BETWEEN -7 AND 7)
             |SELECT CAST(day_offset AS BIGINT) AS day_offset,
             |       CAST(sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_t,
             |       CAST(sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_c,
             |       CASE WHEN sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) > 0 THEN
             |         round(CAST(sum(CASE WHEN tr = 1 THEN c ELSE 0 END) AS DOUBLE)
             |               / sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) / 100.0, 6)
             |       END AS treated_mean,
             |       CASE WHEN sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) > 0 THEN
             |         round(CAST(sum(CASE WHEN tr = 0 THEN c ELSE 0 END) AS DOUBLE)
             |               / sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) / 100.0, 6)
             |       END AS control_mean,
             |       CASE WHEN sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) > 0
             |             AND sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) > 0 THEN
             |         round(CAST(sum(CASE WHEN tr = 1 THEN c ELSE 0 END) AS DOUBLE)
             |               / sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) / 100.0
             |             - CAST(sum(CASE WHEN tr = 0 THEN c ELSE 0 END) AS DOUBLE)
             |               / sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) / 100.0, 6)
             |       END AS contrast
             |FROM base GROUP BY day_offset ORDER BY day_offset""".stripMargin))
  )
}
