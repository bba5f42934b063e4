package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 twenty-sixth wave: Pythagorean means on the bounded value
  * grid, first-touch attribution (completing the attribution pair), and
  * the GROUP BY ALL SQL surface.
  */
object Round10z {

  val decls: Map[String, Decl] = Map(
    // Arithmetic / geometric / harmonic means per event type, at scale:
    // the float terms (ln c, 1/c) ride the bounded DISTINCT-cents grid,
    // never the corpus — per-cell integer weights aggregate first, and
    // the two irreducible float sums fold over the grid in cents order
    // (the sorted-fold discipline) before one exp / division each.
    "agg_pythagorean_means" -> Decl(
      (s, d) => {
        val grid = Tables.events(s, d)
          .select(col("event_type"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .filter(col("c") > 0)
          .groupBy("event_type", "c").agg(count(lit(1)).as("w"))
        grid.groupBy("event_type")
          .agg(sum(col("w")).as("n"), sum(col("c") * col("w")).as("sum_c"),
               array_sort(collect_list(struct(col("c"), col("w")))).as("cells"))
          .select(col("event_type"), col("n"),
                  round(col("sum_c").cast("double") / col("n"), 6).as("mean_arith"),
                  round(exp(expr(
                    "aggregate(cells, CAST(0.0 AS DOUBLE), (acc, p) -> acc + p.w * ln(CAST(p.c AS DOUBLE)))")
                    / col("n")), 6).as("mean_geo"),
                  round(col("n").cast("double") / expr(
                    "aggregate(cells, CAST(0.0 AS DOUBLE), (acc, p) -> acc + p.w / CAST(p.c AS DOUBLE))"),
                    6).as("mean_harm"))
          .orderBy("event_type")
      },
      Some("""WITH grid AS (SELECT event_type,
             |                CAST(round(value * 100) AS BIGINT) AS c,
             |                count(*) AS w
             |              FROM events
             |              WHERE CAST(round(value * 100) AS BIGINT) > 0
             |              GROUP BY 1, 2)
             |SELECT event_type, CAST(sum(w) AS BIGINT) AS n,
             |       round(CAST(sum(c * w) AS DOUBLE) / sum(w), 6) AS mean_arith,
             |       round(exp(list_sum(list(w * ln(CAST(c AS DOUBLE)) ORDER BY c)
             |                 ) / sum(w)), 6) AS mean_geo,
             |       round(CAST(sum(w) AS DOUBLE)
             |             / list_sum(list(w / CAST(c AS DOUBLE) ORDER BY c)), 6)
             |         AS mean_harm
             |FROM grid GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // First-touch attribution: each purchase credits the user's EARLIEST
    // event in the preceding 7 days — the complement of
    // ts_attribution_lasttouch; together they bracket every multi-touch
    // model. Same bounded per-user candidate join, opposite ordering.
    "ts_attribution_firsttouch" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("event_id"),
                  expr("unix_micros(ts)").as("us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"), col("us").as("p_us"))
        val priors = ev.filter(col("event_type") =!= "purchase")
        val w = Window.partitionBy("p_id")
          .orderBy(col("us").asc, col("event_id").asc)
        val touch = purchases.join(priors, "user_id")
          .filter(col("us") < col("p_us") &&
                  col("us") >= col("p_us") - 604800000000L)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("p_id"), col("event_type").as("channel"))
        purchases.join(touch, Seq("p_id"), "left")
          .groupBy(coalesce(col("channel"), lit("(none)")).as("channel"))
          .agg(count(lit(1)).as("n_credits"))
          .orderBy("channel")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, event_id,
             |              CAST(epoch_us(ts) AS BIGINT) AS us
             |            FROM events),
             |p AS (SELECT user_id, event_id AS p_id, us AS p_us FROM ev
             |      WHERE event_type = 'purchase'),
             |touch AS (
             |  SELECT p_id, event_type AS channel,
             |         row_number() OVER (PARTITION BY p_id
             |           ORDER BY us ASC, event_id ASC) AS rk
             |  FROM p JOIN ev USING (user_id)
             |  WHERE ev.event_type <> 'purchase'
             |    AND us < p_us AND us >= p_us - 604800000000)
             |SELECT coalesce(t.channel, '(none)') AS channel,
             |       CAST(count(*) AS BIGINT) AS n_credits
             |FROM p LEFT JOIN (SELECT p_id, channel FROM touch WHERE rk = 1) t
             |       USING (p_id)
             |GROUP BY 1 ORDER BY channel""".stripMargin)),

    // GROUP BY ALL — both engines' modern shorthand: every non-aggregate
    // select item becomes a grouping key. Same text runs on Spark and
    // DuckDB verbatim.
    "sql_group_by_all" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                |       CAST(count(*) AS BIGINT) AS n,
                |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                |         AS cents
                |FROM orders
                |GROUP BY ALL
                |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS cents
             |FROM orders
             |GROUP BY ALL
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin))
  )
}
