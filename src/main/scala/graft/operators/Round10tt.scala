package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 50: exact Shapley-value channel attribution (the
  * game-theoretic successor to first/last-touch) and the l-diversity
  * governance audit (the k-anonymity refinement that checks sensitive-
  * value variety inside each quasi-identifier group).
  *
  * Scale shape: Shapley collapses the corpus to a 16-row mask grid in
  * ONE per-user aggregate + one grid aggregate (map-side combined), then
  * evaluates the 4·8-term Shapley sum on the bounded grid — broadcast
  * joins only, the coalition table never grows with data. l-diversity is
  * a two-level aggregate over the (nation × segment) grid. Everything
  * downstream of the first shuffle is domain-bounded.
  *
  * Determinism: coalition values are exact half-up ppm BIGINTs, the
  * Shapley sum is an integer linear combination (×24 clears the 4-player
  * factorial denominators), and the single float column is a terminal
  * 6-dp division.
  */
object Round10tt {

  val decls: Map[String, Decl] = Map(
    // Empirical Shapley attribution over the 4 non-purchase channels
    // (click/error/signup/view, bits 0-3 alphabetically): v(S) = observed
    // purchase rate (exact ppm) among users whose touched-channel set is
    // exactly S, 0 for unobserved coalitions; phi_c = sum over S not
    // containing c of w(|S|) * (v(S+c) - v(S)) with 4-player weights
    // w*24 = {6,2,2,6}. Output per channel: the exact *24 ppm integer
    // and the 6-dp rate. Efficiency (sum phi = v(full) - v(empty)) is
    // asserted in Round10ttSpec.
    "agg_shapley_attribution" -> Decl(
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy("user_id")
          .agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("nc"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("ne"),
            sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("ns"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("nv"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("conv"))
          .select(
            (when(col("nc") > 0, 1L).otherwise(0L) +
             when(col("ne") > 0, 2L).otherwise(0L) +
             when(col("ns") > 0, 4L).otherwise(0L) +
             when(col("nv") > 0, 8L).otherwise(0L)).as("mask"),
            col("conv"))
        val grid = users.groupBy("mask")
          .agg(count(lit(1)).as("n"), sum(col("conv")).as("ncv"))
        // complete the 16-coalition table (v=0 where unobserved), exact ppm
        val v = s.range(16).select(col("id").as("mask"))
          .join(grid, Seq("mask"), "left")
          .select(col("mask"),
                  coalesce(expr("(ncv * 2000000L + n) div (2L * n)"), lit(0L))
                    .as("v_ppm"))
        val channels = s.range(4).select(col("id").as("ch"),
          element_at(array(lit("click"), lit("error"), lit("signup"),
                           lit("view")), (col("id") + 1).cast("int"))
            .as("channel"))
        val terms = channels.crossJoin(v.as("s"))
          .filter(expr("(s.mask & shiftleft(1L, cast(ch as int))) = 0"))
          .join(v.select(col("mask").as("mask_with"), col("v_ppm").as("v_with")),
                expr("mask_with = s.mask + shiftleft(1L, cast(ch as int))"))
          .select(col("ch"), col("channel"),
                  (expr("element_at(array(6L, 2L, 2L, 6L), " +
                        "cast(bit_count(s.mask) as int) + 1)") *
                   (col("v_with") - col("v_ppm"))).as("term"))
        terms.groupBy("ch", "channel")
          .agg(sum(col("term")).as("shapley_x24_ppm"))
          .select(col("channel"), col("shapley_x24_ppm"),
                  round(col("shapley_x24_ppm").cast("double") / 24e6, 6)
                    .as("shapley"))
          .orderBy("ch")
      },
      Some("""WITH users AS (
             |  SELECT (CASE WHEN sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 0 THEN 1 ELSE 0 END
             |        + CASE WHEN sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 0 THEN 2 ELSE 0 END
             |        + CASE WHEN sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) > 0 THEN 4 ELSE 0 END
             |        + CASE WHEN sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) > 0 THEN 8 ELSE 0 END)
             |           AS mask,
             |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
             |  FROM events GROUP BY user_id),
             |grid AS (SELECT mask, count(*) AS n, sum(conv) AS ncv
             |         FROM users GROUP BY mask),
             |v AS (SELECT g.m AS mask,
             |             coalesce((ncv * 2000000 + n) // (2 * n), 0) AS v_ppm
             |      FROM generate_series(0, 15) AS g(m)
             |      LEFT JOIN grid ON grid.mask = g.m),
             |ch AS (SELECT c AS chbit,
             |              CASE c WHEN 0 THEN 'click' WHEN 1 THEN 'error'
             |                     WHEN 2 THEN 'signup' ELSE 'view' END AS channel
             |       FROM generate_series(0, 3) AS t(c)),
             |terms AS (
             |  SELECT chbit, channel,
             |         (CASE bit_count(s.mask) WHEN 0 THEN 6 WHEN 1 THEN 2
             |               WHEN 2 THEN 2 ELSE 6 END)
             |           * (w.v_ppm - s.v_ppm) AS term
             |  FROM ch, v s, v w
             |  WHERE w.mask = s.mask + (1 << chbit)
             |    AND (s.mask & (1 << chbit)) = 0)
             |SELECT channel,
             |       CAST(sum(term) AS BIGINT) AS shapley_x24_ppm,
             |       round(CAST(sum(term) AS DOUBLE) / 24000000.0, 6) AS shapley
             |FROM terms GROUP BY chbit, channel ORDER BY chbit""".stripMargin)),

    // l-diversity audit over the (nation × market-segment) quasi-
    // identifier grid with the account-balance tercile as the sensitive
    // attribute: a group is l-diverse iff it carries >= 3 distinct
    // sensitive values — k-anonymity's blind spot (a large group whose
    // members all share one sensitive value still leaks). Reports every
    // group with its diversity and flag; the grid is 25 nations x 5
    // segments, domain-bounded at any scale.
    "quality_l_diversity" -> Decl(
      (s, d) => {
        val sens = Tables(s, d, "customer")
          .select(col("c_nationkey"), col("c_mktsegment"),
                  when(col("c_acctbal") < 0, "neg")
                    .when(col("c_acctbal") < 4500, "mid")
                    .otherwise("high").as("bal_class"))
        sens.groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("n"),
               countDistinct(col("bal_class")).as("l_diversity"))
          .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
                  col("l_diversity"),
                  when(col("l_diversity") >= 3, 1L).otherwise(0L).as("diverse"))
          .orderBy("c_nationkey", "c_mktsegment")
      },
      Some("""SELECT c_nationkey, c_mktsegment,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
             |                                WHEN c_acctbal < 4500 THEN 'mid'
             |                                ELSE 'high' END) AS BIGINT)
             |         AS l_diversity,
             |       CAST(CASE WHEN count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
             |                                          WHEN c_acctbal < 4500 THEN 'mid'
             |                                          ELSE 'high' END) >= 3
             |                 THEN 1 ELSE 0 END AS BIGINT) AS diverse
             |FROM customer
             |GROUP BY c_nationkey, c_mktsegment
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin))
  )
}
