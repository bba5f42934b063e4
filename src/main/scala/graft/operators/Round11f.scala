package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 wave 62: chain-ladder cohort completion (the actuarial
  * development-triangle forecast — also the standard way to "complete"
  * immature revenue cohorts) and propensity-score nearest-neighbor
  * matching (the observational-causal workhorse: pair each treated user
  * with its closest control on the pre-period activity score and read
  * the matched treatment effect).
  *
  * Determinism: the triangle is exact cents on the bounded
  * cohort-week × age grid; development factors and the ultimate
  * projection fold ≤4 factors in age order (sorted-fold discipline).
  * Matching runs on the bounded activity-score grid with integer
  * distances; every tie breaks by (distance, lower score, lower
  * user_id); ATT is one exact-cents mean.
  *
  * Scale shape: both keys aggregate the corpus once onto domain-bounded
  * grids (5×5 triangle; the per-user activity-count domain). The
  * matching windows run over the SCORE GRID (saturates with the
  * behavior domain, not corpus rows — the ks_test argument; ScaleSpec
  * allowlisted), never over users.
  */
object Round11f {

  val decls: Map[String, Decl] = Map(
    // Chain-ladder: cohorts = first-event week (Jan 1/8/15/22/29), age =
    // event week − cohort week. Cumulative triangle C[w, k]; development
    // factor f_k = Σ_w C[w, k+1] / Σ_w C[w, k] over cohorts that HAVE
    // age k+1; ultimate = latest observed × Π remaining factors.
    "ts_chain_ladder" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
                  floor(datediff(col("ts").cast("date"),
                                 to_date(lit("2024-01-01"))) / 7)
                    .cast("bigint").as("wk"),
                  round(col("value") * 100).cast("bigint").as("c"))
        val cohortOf = ev.groupBy("user_id").agg(min(col("wk")).as("cw"))
        val tri = ev.join(cohortOf, "user_id")
          .groupBy(col("cw"), (col("wk") - col("cw")).as("age"))
          .agg(sum(col("c")).as("inc"))
        // cumulative within cohort over ≤5 ages (bounded window)
        val cum = tri.withColumn("cum",
          sum(col("inc")).over(Window.partitionBy("cw").orderBy("age")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        // factor f_k from cohorts observed at BOTH k and k+1
        val pairs = cum.select(col("cw"), col("age"), col("cum"))
        val fk = pairs.as("a")
          .join(pairs.as("b"),
                col("a.cw") === col("b.cw") &&
                col("b.age") === col("a.age") + 1)
          .groupBy(col("a.age").as("k"))
          .agg(sum(col("a.cum")).as("den"), sum(col("b.cum")).as("num"))
          .select(col("k"),
                  (col("num").cast("double") / col("den").cast("double"))
                    .as("f"))
        val latest = cum
          .groupBy("cw")
          .agg(max(struct(col("age"), col("cum"))).as("l"))
          .select(col("cw"), col("l.age").as("last_age"),
                  col("l.cum").as("observed"))
        latest.join(broadcast(fk), col("k") >= col("last_age"), "left")
          .withColumn("cell",
            when(col("k").isNotNull, struct(col("k"), col("f"))))
          .groupBy("cw", "last_age", "observed")
          // collect_list skips NULL cells → mature cohorts fold the seed
          .agg(expr("aggregate(array_sort(collect_list(cell)), " +
                    "CAST(1.0 AS DOUBLE), (acc, x) -> acc * x.f)")
                 .as("dev"))
          .select(col("cw").as("cohort_week"), col("last_age"),
                  col("observed").as("observed_cents"),
                  round(col("observed").cast("double") * col("dev"), 2)
                    .as("ultimate_cents"))
          .orderBy("cohort_week")
      },
      Some("""WITH ev AS (
             |  SELECT user_id,
             |         (date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)))
             |           // 7 AS wk,
             |         CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events),
             |cohort AS (SELECT user_id, min(wk) AS cw FROM ev GROUP BY user_id),
             |tri AS (SELECT cw, wk - cw AS age, sum(c) AS inc
             |        FROM ev JOIN cohort USING (user_id) GROUP BY 1, 2),
             |cum AS (SELECT cw, age,
             |               sum(inc) OVER (PARTITION BY cw ORDER BY age
             |                 ROWS UNBOUNDED PRECEDING) AS cum
             |        FROM tri),
             |fk AS (SELECT a.age AS k,
             |              CAST(sum(b.cum) AS DOUBLE)
             |                / CAST(sum(a.cum) AS DOUBLE) AS f
             |       FROM cum a JOIN cum b
             |         ON a.cw = b.cw AND b.age = a.age + 1
             |       GROUP BY 1),
             |latest AS (SELECT cw, max(age) AS last_age,
             |                  max_by(cum, age) AS observed
             |           FROM cum GROUP BY cw)
             |SELECT cw AS cohort_week, CAST(last_age AS BIGINT) AS last_age,
             |       CAST(observed AS BIGINT) AS observed_cents,
             |       round(CAST(observed AS DOUBLE) *
             |             list_reduce(
             |               list_prepend(1.0,
             |                 list(f ORDER BY k) FILTER (WHERE k IS NOT NULL)),
             |               (acc, x) -> acc * x), 2)
             |         AS ultimate_cents
             |FROM latest LEFT JOIN fk ON k >= last_age
             |GROUP BY cw, last_age, observed
             |ORDER BY cohort_week""".stripMargin)),

    // Propensity NN matching: score = pre-period (Jan 1-15) event count,
    // treatment = the minted user_id % 3 == 0 assignment (every fixture
    // user signs up at some point, so behavioral treatment would leave
    // an empty control pool — the minted arm keeps the matching
    // machinery honest and lets the spec assert near-zero imbalance),
    // outcome = post-period (Jan 16-30) spend.
    // Each treated user matches the control at the nearest score
    // (distance tie → lower score; within a score, the lowest-id
    // control represents it); ATT = mean(treated − matched outcome).
    // Matching-with-replacement on the bounded score grid.
    "agg_propensity_matching" -> Decl(
      (s, d) => {
        val mid = to_date(lit("2024-01-16"))
        val users = Tables.events(s, d)
          .groupBy("user_id")
          .agg(sum(when(col("ts").cast("date") < mid, 1L).otherwise(0L))
                 .as("score"),
               max(when(pmod(col("user_id"), lit(3L)) === 0, 1L).otherwise(0L))
                 .as("treated"),
               sum(when(col("ts").cast("date") >= mid,
                        round(col("value") * 100).cast("bigint"))
                     .otherwise(0L)).as("outcome"))
        val reps = users.filter(col("treated") === 0)
          .groupBy("score")
          .agg(min(struct(col("user_id"), col("outcome"))).as("rep"))
          .select(col("score").as("cs"), col("rep.outcome").as("c_outcome"))
        val grid = users.select(col("score")).distinct()
          .join(reps, col("score") === col("cs"), "left")
        val wAsc = Window.orderBy("score")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wDesc = Window.orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val near = grid
          .withColumn("below_s", max(col("cs")).over(wAsc))
          .withColumn("below_o",
            last(when(col("cs").isNotNull, col("c_outcome")), ignoreNulls = true)
              .over(wAsc))
          .withColumn("above_s", min(col("cs")).over(wDesc))
          .withColumn("above_o",
            last(when(col("cs").isNotNull, col("c_outcome")), ignoreNulls = true)
              .over(wDesc))
          .select(col("score").as("gs"), col("below_s"), col("below_o"),
                  col("above_s"), col("above_o"))
        val matched = users.filter(col("treated") === 1)
          .join(broadcast(near), col("score") === col("gs"))
          .select(col("user_id"), col("score"), col("outcome"),
                  when(col("below_s").isNull, col("above_o"))
                    .when(col("above_s").isNull, col("below_o"))
                    .when(col("score") - col("below_s") <=
                          col("above_s") - col("score"), col("below_o"))
                    .otherwise(col("above_o")).as("m_outcome"),
                  when(col("below_s").isNull, col("above_s"))
                    .when(col("above_s").isNull, col("below_s"))
                    .when(col("score") - col("below_s") <=
                          col("above_s") - col("score"), col("below_s"))
                    .otherwise(col("above_s")).as("m_score"))
          .filter(col("m_outcome").isNotNull)
        matched.agg(
            count(lit(1)).as("n_matched"),
            sum(col("outcome")).as("so"), sum(col("m_outcome")).as("sm"),
            sum(col("score")).as("ss"), sum(col("m_score")).as("sms"))
          .select(col("n_matched"),
                  round(col("so").cast("double") / col("n_matched") / 100.0, 6)
                    .as("treated_mean"),
                  round(col("sm").cast("double") / col("n_matched") / 100.0, 6)
                    .as("matched_control_mean"),
                  round((col("so") - col("sm")).cast("double")
                          / col("n_matched") / 100.0, 6).as("att"),
                  round((col("ss") - col("sms")).cast("double")
                          / col("n_matched"), 6).as("score_imbalance"))
      },
      Some("""WITH users AS (
             |  SELECT user_id,
             |         sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
             |                  THEN 1 ELSE 0 END) AS score,
             |         max(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END)
             |           AS treated,
             |         sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
             |                  THEN CAST(round(value * 100) AS BIGINT)
             |                  ELSE 0 END) AS outcome
             |  FROM events GROUP BY user_id),
             |reps AS (SELECT score AS cs,
             |                min(user_id) AS rid
             |         FROM users WHERE treated = 0 GROUP BY score),
             |repo AS (SELECT cs, outcome AS c_outcome
             |         FROM reps JOIN users ON users.user_id = reps.rid),
             |grid AS (SELECT DISTINCT u.score, repo.cs, repo.c_outcome
             |         FROM (SELECT DISTINCT score FROM users) u
             |         LEFT JOIN repo ON repo.cs = u.score),
             |near AS (
             |  SELECT score AS gs,
             |         max(cs) OVER wa AS below_s,
             |         last_value(CASE WHEN cs IS NOT NULL THEN c_outcome END
             |                    IGNORE NULLS) OVER wa AS below_o,
             |         min(cs) OVER wd AS above_s,
             |         last_value(CASE WHEN cs IS NOT NULL THEN c_outcome END
             |                    IGNORE NULLS) OVER wd AS above_o
             |  FROM grid
             |  WINDOW wa AS (ORDER BY score
             |                ROWS UNBOUNDED PRECEDING),
             |         wd AS (ORDER BY score DESC
             |                ROWS UNBOUNDED PRECEDING)),
             |matched AS (
             |  SELECT u.user_id, u.score, u.outcome,
             |         CASE WHEN below_s IS NULL THEN above_o
             |              WHEN above_s IS NULL THEN below_o
             |              WHEN u.score - below_s <= above_s - u.score
             |                THEN below_o ELSE above_o END AS m_outcome,
             |         CASE WHEN below_s IS NULL THEN above_s
             |              WHEN above_s IS NULL THEN below_s
             |              WHEN u.score - below_s <= above_s - u.score
             |                THEN below_s ELSE above_s END AS m_score
             |  FROM users u JOIN near ON near.gs = u.score
             |  WHERE u.treated = 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_matched,
             |       round(CAST(sum(outcome) AS DOUBLE) / count(*) / 100.0, 6)
             |         AS treated_mean,
             |       round(CAST(sum(m_outcome) AS DOUBLE) / count(*) / 100.0, 6)
             |         AS matched_control_mean,
             |       round(CAST(sum(outcome) - sum(m_outcome) AS DOUBLE)
             |             / count(*) / 100.0, 6) AS att,
             |       round(CAST(sum(score) - sum(m_score) AS DOUBLE)
             |             / count(*), 6) AS score_imbalance
             |FROM matched WHERE m_outcome IS NOT NULL""".stripMargin))
  )
}
