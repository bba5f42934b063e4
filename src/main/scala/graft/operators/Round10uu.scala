package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 51: schema-evolution union (unionByName with missing
  * columns — the heterogeneous-batch append every long-lived pipeline
  * hits), expanding-window time-series cross-validation folds (the
  * temporal CV split that respects causality, vs the random split that
  * leaks the future), and the paired t-test (pre/post within-subject —
  * the within-user experiment readout CUPED/Welch don't cover).
  *
  * Determinism discipline: cents are exact BIGINTs end-to-end; the
  * paired statistics derive mean/sd/t from exact (n, Σd, Σd²) integers
  * in one terminal double expression (Σd² peaks ~1e16 at sf1000 —
  * BIGINT-safe; the wider-scale path swaps to DECIMAL(38,0), the only
  * change); fold boundaries are fixed dates, so every engine sees the
  * identical partition of the fixture's 30-day window.
  */
object Round10uu {

  val decls: Map[String, Decl] = Map(
    // unionByName(allowMissingColumns = true): v1 batches lack the
    // `value` column (pre-instrumentation schema), v2 batches carry it —
    // the union aligns BY NAME (not position) and null-fills the missing
    // column. DuckDB's UNION ALL BY NAME is the exact twin. Positional
    // UNION would silently mis-bind here: v2's column order is permuted
    // to prove name-alignment is what's exercised.
    "set_union_by_name" -> Decl(
      (s, d) => {
        val e = Tables.events(s, d)
        val v1 = e.filter(col("event_type") =!= "purchase")
          .select(col("event_id"), col("user_id"), col("event_type"))
        val v2 = e.filter(col("event_type") === "purchase")
          .select(col("event_type"), col("user_id"),
                  round(col("value") * 100).cast("bigint").as("v_cents"),
                  col("event_id"))
        Tables.canon(
          v1.unionByName(v2, allowMissingColumns = true)
            .select(col("event_id"), col("user_id"), col("event_type"),
                    col("v_cents")))
      },
      Some("""SELECT event_id, user_id, event_type, v_cents FROM (
             |  SELECT event_id, user_id, event_type FROM events
             |  WHERE event_type <> 'purchase'
             |  UNION ALL BY NAME
             |  SELECT event_type, user_id,
             |         CAST(round(value * 100) AS BIGINT) AS v_cents, event_id
             |  FROM events WHERE event_type = 'purchase')
             |ORDER BY ALL NULLS FIRST""".stripMargin)),

    // Expanding-window temporal CV: four folds with cutoffs one week
    // apart; train = everything strictly before the cutoff (the window
    // EXPANDS — earlier folds train on less), test = the following
    // 7 days. Per fold: sizes and purchase rates (exact ppm). The fold
    // spine is a 4-row broadcast; one conditional aggregate per fold
    // boundary pair — a single scan, no per-fold re-reads.
    "ts_expanding_cv_folds" -> Decl(
      (s, d) => {
        val folds = s.range(1, 5).select(
          col("id").as("fold"),
          date_add(to_date(lit("2024-01-01")), (col("id") * 7).cast("int"))
            .as("cutoff"))
        val e = Tables.events(s, d)
          .select(col("ts").cast("date").as("dt"),
                  when(col("event_type") === "purchase", 1L).otherwise(0L)
                    .as("is_p"))
        e.crossJoin(broadcast(folds))
          .groupBy("fold", "cutoff")
          .agg(
            sum(when(col("dt") < col("cutoff"), 1L).otherwise(0L)).as("train_n"),
            sum(when(col("dt") < col("cutoff"), col("is_p")).otherwise(0L))
              .as("train_p"),
            sum(when(col("dt") >= col("cutoff") &&
                     col("dt") < date_add(col("cutoff"), 7), 1L).otherwise(0L))
              .as("test_n"),
            sum(when(col("dt") >= col("cutoff") &&
                     col("dt") < date_add(col("cutoff"), 7), col("is_p"))
                  .otherwise(0L)).as("test_p"))
          .select(col("fold"), col("train_n"), col("test_n"),
                  expr("(train_p * 2000000L + train_n) div (2L * train_n)")
                    .as("train_rate_ppm"),
                  expr("(test_p * 2000000L + test_n) div (2L * test_n)")
                    .as("test_rate_ppm"))
          .orderBy("fold")
      },
      Some("""WITH folds AS (
             |  SELECT f AS fold,
             |         DATE '2024-01-01' + CAST(f * 7 AS INTEGER) AS cutoff
             |  FROM generate_series(1, 4) AS t(f)),
             |e AS (SELECT CAST(ts AS DATE) AS dt,
             |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
             |      FROM events)
             |SELECT fold,
             |       CAST(sum(CASE WHEN dt < cutoff THEN 1 ELSE 0 END) AS BIGINT)
             |         AS train_n,
             |       CAST(sum(CASE WHEN dt >= cutoff AND dt < cutoff + 7
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS test_n,
             |       CAST((sum(CASE WHEN dt < cutoff THEN is_p ELSE 0 END) * 2000000
             |             + sum(CASE WHEN dt < cutoff THEN 1 ELSE 0 END))
             |            // (2 * sum(CASE WHEN dt < cutoff THEN 1 ELSE 0 END))
             |            AS BIGINT) AS train_rate_ppm,
             |       CAST((sum(CASE WHEN dt >= cutoff AND dt < cutoff + 7
             |                      THEN is_p ELSE 0 END) * 2000000
             |             + sum(CASE WHEN dt >= cutoff AND dt < cutoff + 7
             |                        THEN 1 ELSE 0 END))
             |            // (2 * sum(CASE WHEN dt >= cutoff AND dt < cutoff + 7
             |                        THEN 1 ELSE 0 END)) AS BIGINT) AS test_rate_ppm
             |FROM e CROSS JOIN folds
             |GROUP BY fold, cutoff ORDER BY fold""".stripMargin)),

    // Paired t-test on within-user pre/post spend (Jan 1-15 vs
    // Jan 16-30): d_u = post cents − pre cents for users active in BOTH
    // halves; t = mean(d) / (sd(d)/√n) from exact (n, Σd, Σd²). The
    // within-subject design cancels user-level variance — the reason
    // this test exists next to the unpaired Welch key.
    "agg_paired_ttest" -> Decl(
      (s, d) => {
        val mid = to_date(lit("2024-01-16"))
        val diffs = Tables.events(s, d)
          .select(col("user_id"),
                  (col("ts").cast("date") < mid).as("pre"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .groupBy("user_id")
          .agg(sum(when(col("pre"), 1L).otherwise(0L)).as("n_pre"),
               sum(when(!col("pre"), 1L).otherwise(0L)).as("n_post"),
               sum(when(col("pre"), col("c")).otherwise(0L)).as("s_pre"),
               sum(when(!col("pre"), col("c")).otherwise(0L)).as("s_post"))
          .filter(col("n_pre") > 0 && col("n_post") > 0)
          .select((col("s_post") - col("s_pre")).as("dd"))
        diffs.agg(count(lit(1)).as("n"), sum(col("dd")).as("sd_"),
                  sum(col("dd") * col("dd")).as("qd"))
          .select(col("n"),
                  round(col("sd_").cast("double") / col("n") / 100, 6)
                    .as("mean_diff"),
                  expr("""round((CAST(sd_ AS DOUBLE) / n) /
                         | sqrt((CAST(qd AS DOUBLE) - CAST(sd_ AS DOUBLE)*sd_/n)
                         |      / (n - 1) / n), 6)""".stripMargin).as("t"))
      },
      Some("""WITH per_user AS (
             |  SELECT user_id,
             |         sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
             |                  THEN 1 ELSE 0 END) AS n_pre,
             |         sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
             |                  THEN 1 ELSE 0 END) AS n_post,
             |         sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
             |                  THEN CAST(round(value * 100) AS BIGINT)
             |                  ELSE 0 END) AS s_pre,
             |         sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
             |                  THEN CAST(round(value * 100) AS BIGINT)
             |                  ELSE 0 END) AS s_post
             |  FROM events GROUP BY user_id),
             |diffs AS (SELECT s_post - s_pre AS dd FROM per_user
             |          WHERE n_pre > 0 AND n_post > 0),
             |g AS (SELECT count(*) AS n, sum(dd) AS sd_, sum(dd * dd) AS qd
             |      FROM diffs)
             |SELECT CAST(n AS BIGINT) AS n,
             |       round(CAST(sd_ AS DOUBLE) / n / 100, 6) AS mean_diff,
             |       round((CAST(sd_ AS DOUBLE) / n) /
             |             sqrt((CAST(qd AS DOUBLE) - CAST(sd_ AS DOUBLE)*sd_/n)
             |                  / (n - 1) / n), 6) AS t
             |FROM g""".stripMargin))
  )
}
