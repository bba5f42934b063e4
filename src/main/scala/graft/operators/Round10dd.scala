package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 thirtieth wave: engagement stickiness (WAU over trailing
  * 4-week MAU).
  */
object Round10dd {

  val decls: Map[String, Decl] = Map(
    // Stickiness: weekly actives over the trailing-4-week actives — the
    // WAU/MAU engagement ratio. The sliding distinct is computed by
    // fanning each (user, active-week) pair out to the ≤4 target weeks
    // it supports, then one distinct count per target week — bounded 4×
    // fan-out of the already-aggregated activity grid, never raw events.
    // Reported for fully-covered weeks only (3 predecessors exist).
    "ts_stickiness_wau_mau" -> Decl(
      (s, d) => {
        val act = Tables.events(s, d)
          .select(col("user_id"),
                  expr("unix_micros(ts) div 604800000000L").as("wk"))
          .distinct()
          .localCheckpoint(true)
        val bounds = act.agg(min(col("wk")).as("wk0"), max(col("wk")).as("wk1"))
        val wau = act.groupBy("wk").agg(count(lit(1)).as("wau"))
        val mau = act
          .select(col("user_id"), explode(expr("sequence(wk, wk + 3L)")).as("twk"))
          .distinct()
          .groupBy(col("twk").as("wk")).agg(count(lit(1)).as("mau"))
        wau.join(mau, "wk").crossJoin(broadcast(bounds))
          .filter(col("wk") >= col("wk0") + 3 && col("wk") <= col("wk1"))
          .select(col("wk"), col("wau"), col("mau"),
                  expr("wau * 1000000L div mau").as("stickiness_ppm"))
          .orderBy("wk")
      },
      Some("""WITH act AS (SELECT DISTINCT user_id,
             |               CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
             |             FROM events),
             |b AS (SELECT min(wk) AS wk0, max(wk) AS wk1 FROM act),
             |wau AS (SELECT wk, count(*) AS wau FROM act GROUP BY wk),
             |mau AS (SELECT twk AS wk, count(*) AS mau FROM (
             |          SELECT DISTINCT user_id, wk + i AS twk
             |          FROM act, unnest(generate_series(0, 3)) AS t(i))
             |        GROUP BY twk)
             |SELECT wk, CAST(wau AS BIGINT) AS wau, CAST(mau AS BIGINT) AS mau,
             |       CAST(wau * 1000000 // mau AS BIGINT) AS stickiness_ppm
             |FROM wau JOIN mau USING (wk) CROSS JOIN b
             |WHERE wk >= wk0 + 3 AND wk <= wk1
             |ORDER BY wk""".stripMargin))
  )
}
