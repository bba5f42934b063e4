package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 thirty-second wave: windowed-absence targeting. */
object Round10ff {

  val decls: Map[String, Decl] = Map(
    // Campaign targeting by windowed absence: users active in the final
    // two weeks of the fixture with NO purchase in that window — the
    // re-engagement segment. One activity aggregate, one anti join on
    // the purchase sub-stream, both keyed on user.
    "ts_inactive_purchasers" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
                  expr("unix_micros(ts) div 604800000000L").as("wk"))
        val horizon = ev.agg(max(col("wk")).as("wk1"))
        val windowed = ev.crossJoin(broadcast(horizon))
          .filter(col("wk") >= col("wk1") - 1)
        val active = windowed.groupBy("user_id")
          .agg(count(lit(1)).as("n_recent"),
               max(col("wk")).as("last_wk"))
        val purchasers = windowed.filter(col("event_type") === "purchase")
          .select("user_id").distinct()
        active.join(purchasers, Seq("user_id"), "left_anti")
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |              CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
             |            FROM events),
             |h AS (SELECT max(wk) AS wk1 FROM ev),
             |w AS (SELECT user_id, event_type, wk FROM ev CROSS JOIN h
             |      WHERE wk >= wk1 - 1),
             |a AS (SELECT user_id, count(*) AS n_recent, max(wk) AS last_wk
             |      FROM w GROUP BY user_id)
             |SELECT a.user_id, CAST(n_recent AS BIGINT) AS n_recent,
             |       CAST(last_wk AS BIGINT) AS last_wk
             |FROM a ANTI JOIN (SELECT DISTINCT user_id FROM w
             |                  WHERE event_type = 'purchase') p
             |     USING (user_id)
             |ORDER BY a.user_id""".stripMargin))
  )
}
