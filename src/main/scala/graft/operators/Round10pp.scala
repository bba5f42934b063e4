package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 46: experimentation-platform statistics — the three
  * checks every A/B analysis pipeline runs beyond the z-test
  * (`agg_ab_test_z`): difference-in-differences for pre/post designs,
  * the sample-ratio-mismatch guardrail, and CUPED variance reduction.
  *
  * Determinism discipline: every estimator is a FIXED expression tree
  * over exact BIGINT sufficient statistics (cent sums, counts) — cell
  * means, theta, and adjusted means each perform their divisions in
  * one deterministic order and round once at the terminal. Nothing
  * order-dependent ever sums in float. (Per-user cent totals keep
  * Σx·y inside BIGINT for the fixture magnitudes; the 1000× scale
  * path swaps the two product sums to DECIMAL(38,0) accumulators —
  * the only change.)
  *
  * Scale shape: one conditional-aggregate pass over events for DiD /
  * SRM (4 and 2 groups); CUPED is the two-level shape — per-user
  * partial aggregate (one shuffle on user_id), then a single global
  * aggregate of 5 exact sums, then per-arm means — no row ever
  * carries a float.
  */
object Round10pp {

  private val cents = expr("CAST(round(value * 100) AS BIGINT)")
  private val post = col("ts") >= lit("2024-01-16 00:00:00").cast("timestamp")
  private val treat = pmod(col("user_id"), lit(2L)) === 1

  val decls: Map[String, Decl] = Map(
    // 2×2 (treat × period) cell means + the DiD interaction estimate.
    "agg_diff_in_diff" -> Decl(
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(treat.cast("int").as("treated"), post.cast("int").as("is_post"),
                  cents.as("c"))
          .groupBy("treated", "is_post")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
        val wide = cells.agg(
          sum(when(col("treated") === 1 && col("is_post") === 1, col("s"))).as("s11"),
          sum(when(col("treated") === 1 && col("is_post") === 1, col("n"))).as("n11"),
          sum(when(col("treated") === 1 && col("is_post") === 0, col("s"))).as("s10"),
          sum(when(col("treated") === 1 && col("is_post") === 0, col("n"))).as("n10"),
          sum(when(col("treated") === 0 && col("is_post") === 1, col("s"))).as("s01"),
          sum(when(col("treated") === 0 && col("is_post") === 1, col("n"))).as("n01"),
          sum(when(col("treated") === 0 && col("is_post") === 0, col("s"))).as("s00"),
          sum(when(col("treated") === 0 && col("is_post") === 0, col("n"))).as("n00"))
        def m(s0: String, n0: String) =
          col(s0).cast("double") / col(n0).cast("double")
        wide.select(
          round(m("s11", "n11"), 6).as("mean_treat_post"),
          round(m("s10", "n10"), 6).as("mean_treat_pre"),
          round(m("s01", "n01"), 6).as("mean_ctrl_post"),
          round(m("s00", "n00"), 6).as("mean_ctrl_pre"),
          round((m("s11", "n11") - m("s10", "n10"))
                  - (m("s01", "n01") - m("s00", "n00")), 6).as("did_c"))
      },
      Some("""WITH e AS (
             |  SELECT CAST(user_id % 2 = 1 AS INT) AS treated,
             |         CAST(ts >= TIMESTAMP '2024-01-16 00:00:00' AS INT) AS is_post,
             |         CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events),
             |w AS (SELECT
             |  sum(CASE WHEN treated = 1 AND is_post = 1 THEN c END) AS s11,
             |  count(*) FILTER (treated = 1 AND is_post = 1) AS n11,
             |  sum(CASE WHEN treated = 1 AND is_post = 0 THEN c END) AS s10,
             |  count(*) FILTER (treated = 1 AND is_post = 0) AS n10,
             |  sum(CASE WHEN treated = 0 AND is_post = 1 THEN c END) AS s01,
             |  count(*) FILTER (treated = 0 AND is_post = 1) AS n01,
             |  sum(CASE WHEN treated = 0 AND is_post = 0 THEN c END) AS s00,
             |  count(*) FILTER (treated = 0 AND is_post = 0) AS n00
             |  FROM e)
             |SELECT round(CAST(s11 AS DOUBLE) / n11, 6) AS mean_treat_post,
             |       round(CAST(s10 AS DOUBLE) / n10, 6) AS mean_treat_pre,
             |       round(CAST(s01 AS DOUBLE) / n01, 6) AS mean_ctrl_post,
             |       round(CAST(s00 AS DOUBLE) / n00, 6) AS mean_ctrl_pre,
             |       round((CAST(s11 AS DOUBLE) / n11 - CAST(s10 AS DOUBLE) / n10)
             |             - (CAST(s01 AS DOUBLE) / n01 - CAST(s00 AS DOUBLE) / n00), 6)
             |         AS did_c
             |FROM w""".stripMargin)),

    // Sample-ratio mismatch: per-arm USER counts (assignment integrity is
    // about units, not events) + the 2-cell chi-square vs a 50/50 split.
    "agg_srm_check" -> Decl(
      (s, d) => {
        val arms = Tables.events(s, d)
          .select(col("user_id"), treat.cast("int").as("treated"))
          .distinct()
          .groupBy("treated").agg(count(lit(1)).as("n"))
        arms.agg(
            sum(when(col("treated") === 1, col("n"))).as("n_treat"),
            sum(when(col("treated") === 0, col("n"))).as("n_ctrl"))
          .select(col("n_treat"), col("n_ctrl"),
            round((col("n_treat") - col("n_ctrl")).cast("double")
                    * (col("n_treat") - col("n_ctrl"))
                    / (col("n_treat") + col("n_ctrl")), 6).as("chi2"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id,
             |                  CAST(user_id % 2 = 1 AS INT) AS treated
             |           FROM events),
             |a AS (SELECT count(*) FILTER (treated = 1) AS n_treat,
             |             count(*) FILTER (treated = 0) AS n_ctrl
             |      FROM u)
             |SELECT n_treat, n_ctrl,
             |       round(CAST(n_treat - n_ctrl AS DOUBLE) * (n_treat - n_ctrl)
             |             / (n_treat + n_ctrl), 6) AS chi2
             |FROM a""".stripMargin)),

    // CUPED: covariate x = user's PRE-period cents, outcome y = POST
    // cents; theta = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) from exact integer
    // sums, adjusted arm mean = ȳ_arm − theta·(x̄_arm − x̄).
    "agg_cuped_adjustment" -> Decl(
      (s, d) => {
        val perUser = Tables.events(s, d)
          .select(col("user_id"), treat.cast("int").as("treated"),
                  when(post, lit(0L)).otherwise(cents).as("xc"),
                  when(post, cents).otherwise(lit(0L)).as("yc"))
          .groupBy("user_id", "treated")
          .agg(sum(col("xc")).as("x"), sum(col("yc")).as("y"))
        val g = perUser.agg(
          count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
        val arms = perUser.groupBy("treated")
          .agg(count(lit(1)).as("na"), sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
        val theta = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        arms.crossJoin(broadcast(g))
          .select(col("treated"), col("na").as("n_users"),
            round(col("sya").cast("double") / col("na"), 6).as("raw_mean_c"),
            round(col("sya").cast("double") / col("na")
              - theta * (col("sxa").cast("double") / col("na")
                          - col("sx").cast("double") / col("n")), 6)
              .as("cuped_mean_c"))
          .orderBy("treated")
      },
      Some("""WITH pu AS (
             |  SELECT user_id, CAST(user_id % 2 = 1 AS INT) AS treated,
             |         sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
             |                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
             |         sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
             |                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y
             |  FROM events GROUP BY 1, 2),
             |g AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             |             CAST(sum(y) AS BIGINT) AS sy,
             |             CAST(sum(x * x) AS BIGINT) AS sxx,
             |             CAST(sum(x * y) AS BIGINT) AS sxy
             |      FROM pu),
             |arms AS (SELECT treated, count(*) AS na, CAST(sum(x) AS BIGINT) AS sxa,
             |                CAST(sum(y) AS BIGINT) AS sya
             |         FROM pu GROUP BY treated)
             |SELECT treated, na AS n_users,
             |       round(CAST(sya AS DOUBLE) / na, 6) AS raw_mean_c,
             |       round(CAST(sya AS DOUBLE) / na
             |             - (CAST(n * sxy - sx * sy AS DOUBLE)
             |                / CAST(n * sxx - sx * sx AS DOUBLE))
             |               * (CAST(sxa AS DOUBLE) / na - CAST(sx AS DOUBLE) / n), 6)
             |         AS cuped_mean_c
             |FROM arms CROSS JOIN g ORDER BY treated""".stripMargin))
  )
}
