package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 twenty-third wave: on-balance volume (signed cumulative flow)
  * and Kendall's τ-b rank correlation on the bounded paired grid.
  */
object Round9w {

  val decls: Map[String, Decl] = Map(
    // On-balance volume — the signed cumulative flow indicator: each
    // event contributes its cents with the SIGN of the value change
    // (up-move accumulates, down-move drains, unchanged contributes
    // nothing). One lag + one running sum over the same user-partitioned
    // sort, every quantity an exact BIGINT — the finance twin of
    // window_drawdown_max's running-extreme machinery.
    "window_obv_flow" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        val cum = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .withColumn("prev", lag(col("c"), 1).over(w))
          .withColumn("flow",
            when(col("prev").isNull || col("c") === col("prev"), 0L)
              .when(col("c") > col("prev"), col("c"))
              .otherwise(-col("c")))
          .select(col("user_id"), col("event_id"),
                  sum(col("flow")).over(cum).as("obv"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |             CAST(round(value * 100) AS BIGINT) AS c,
             |             lag(CAST(round(value * 100) AS BIGINT)) OVER
             |               (PARTITION BY user_id ORDER BY event_id) AS prev
             |           FROM events),
             |f AS (SELECT user_id, event_id,
             |        CASE WHEN prev IS NULL OR c = prev THEN 0
             |             WHEN c > prev THEN c ELSE -c END AS flow
             |      FROM e)
             |SELECT user_id, event_id,
             |       CAST(sum(flow) OVER (PARTITION BY user_id ORDER BY event_id
             |                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |         AS obv
             |FROM f ORDER BY user_id, event_id""".stripMargin)),

    // Kendall's τ-b — the concordance rank correlation completing the
    // pair with agg_spearman_corr: hourly click vs purchase cents paired
    // by hour, every (i, j) hour pair classified concordant / discordant
    // by the INTEGER product sign (x_i−x_j)(y_i−y_j), tie corrections
    // from integer counts, one terminal sqrt tree rounded to 6 dp. The
    // pair self-join is bounded-grid² (hours, not events) — the corpus
    // crosses one aggregate shuffle only.
    "agg_kendall_tau" -> Decl(
      (s, d) => {
        val g = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .groupBy(expr("unix_micros(ts) div 3600000000L").as("hr"))
          .pivot("event_type", Seq("click", "purchase"))
          .agg(sum(round(col("value") * 100).cast("bigint")))
          .filter(col("click").isNotNull && col("purchase").isNotNull)
          .select(col("hr"), col("click").as("x"), col("purchase").as("y"))
          .localCheckpoint(true)
        val pairs = g.as("a").join(g.as("b"), col("a.hr") < col("b.hr"))
          .select(((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")))
                    .as("prod"),
                  (col("a.x") === col("b.x")).cast("long").as("tx"),
                  (col("a.y") === col("b.y")).cast("long").as("ty"))
        pairs.agg(count(lit(1)).as("n0"),
                  sum(when(col("prod") > 0, 1L).otherwise(0L)).as("c"),
                  sum(when(col("prod") < 0, 1L).otherwise(0L)).as("dd"),
                  sum(col("tx")).as("n1"), sum(col("ty")).as("n2"))
          .select(col("n0"), col("c"), col("dd"),
            round((col("c") - col("dd")).cast("double") /
                  sqrt((col("n0") - col("n1")).cast("double") *
                       (col("n0") - col("n2")).cast("double")), 6).as("tau_b"))
      },
      Some("""WITH g AS (SELECT epoch_us(ts) // 3600000000 AS hr,
             |    sum(CASE WHEN event_type = 'click'
             |        THEN CAST(round(value * 100) AS BIGINT) END) AS x,
             |    sum(CASE WHEN event_type = 'purchase'
             |        THEN CAST(round(value * 100) AS BIGINT) END) AS y
             |  FROM events WHERE event_type IN ('click', 'purchase')
             |  GROUP BY 1
             |  HAVING x IS NOT NULL AND y IS NOT NULL),
             |p AS (SELECT (a.x - b.x) * (a.y - b.y) AS prod,
             |        CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             |        CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
             |      FROM g a JOIN g b ON a.hr < b.hr),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n0,
             |         CAST(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |         CAST(sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd,
             |         CAST(sum(tx) AS BIGINT) AS n1,
             |         CAST(sum(ty) AS BIGINT) AS n2
             |       FROM p)
             |SELECT n0, c, dd,
             |  round(CAST(c - dd AS DOUBLE) /
             |        sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE)), 6)
             |    AS tau_b
             |FROM st""".stripMargin))
  )
}
