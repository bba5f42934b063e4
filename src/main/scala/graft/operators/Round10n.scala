package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 fourteenth wave: finance bridges, decay scoring, Pareto
  * classification, and dormancy analysis. Exact cross-multiplied integer
  * numerators wherever a rational would appear; sorted folds where a
  * float sum is unavoidable.
  */
object Round10n {

  val decls: Map[String, Decl] = Map(
    // Price–volume bridge (Laspeyres decomposition) of the 1996→1997
    // revenue change per priority: ΔR·n0 = (n1−n0)·c0  [volume]  +
    // (c1·n0 − n1·c0)  [price] — BOTH effects exact BIGINT numerators
    // (the n0 scaling clears every rational), terminal ppm ratios only.
    "agg_price_volume_bridge" -> Decl(
      (s, d) => {
        val o = Tables(s, d, "orders")
          .select(col("o_orderpriority").as("pr"),
                  year(col("o_orderdate")).as("yr"),
                  round(col("o_totalprice") * 100).cast("bigint").as("cents"))
          .filter(col("yr").isin(1996, 1997))
          .groupBy("pr", "yr")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
        val a = o.filter(col("yr") === 1996)
          .select(col("pr"), col("n").as("n0"), col("c").as("c0"))
        val b = o.filter(col("yr") === 1997)
          .select(col("pr"), col("n").as("n1"), col("c").as("c1"))
        a.join(b, "pr")
          .select(col("pr").as("o_orderpriority"),
                  ((col("n1") - col("n0")) * col("c0")).as("volume_effect_x_n0"),
                  (col("c1") * col("n0") - col("n1") * col("c0")).as("price_effect_x_n0"),
                  ((col("c1") - col("c0")) * col("n0")).as("delta_rev_x_n0"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH o AS (SELECT o_orderpriority AS pr, year(o_orderdate) AS yr,
             |             count(*) AS n,
             |             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
             |           FROM orders WHERE year(o_orderdate) IN (1996, 1997)
             |           GROUP BY 1, 2)
             |SELECT a.pr AS o_orderpriority,
             |       CAST((b.n - a.n) * a.c AS BIGINT) AS volume_effect_x_n0,
             |       CAST(b.c * a.n - b.n * a.c AS BIGINT) AS price_effect_x_n0,
             |       CAST((b.c - a.c) * a.n AS BIGINT) AS delta_rev_x_n0
             |FROM o a JOIN o b ON a.pr = b.pr AND a.yr = 1996 AND b.yr = 1997
             |ORDER BY a.pr""".stripMargin)),

    // Half-life decay engagement score: each user's events weighted by
    // 2^(−age_hours/168) relative to their own last event — the
    // recency-weighted activity metric. Ages are exact integer hours;
    // the per-event decay weights fold in SORTED order (the
    // graph_adamic_adar discipline) so the float sum is engine-identical.
    "agg_decay_engagement" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  expr("unix_micros(ts) div 3600000000L").as("hr"))
        val last = ev.groupBy("user_id").agg(max(col("hr")).as("last_hr"))
        ev.join(last, "user_id")
          .select(col("user_id"),
                  pow(lit(2.0d), -(col("last_hr") - col("hr")).cast("double") / 168.0d)
                    .as("w"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
               array_sort(collect_list(col("w"))).as("ws"))
          .select(col("user_id"), col("n_events"),
                  round(expr("aggregate(ws, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"), 6)
                    .as("decay_score"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id,
             |              CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr
             |            FROM events),
             |l AS (SELECT user_id, max(hr) AS last_hr FROM ev GROUP BY user_id),
             |w AS (SELECT ev.user_id,
             |        pow(2.0, -CAST(last_hr - hr AS DOUBLE) / 168.0) AS w
             |      FROM ev JOIN l USING (user_id))
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |       round(list_sum(list(w ORDER BY w)), 6) AS decay_score
             |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ABC (Pareto) classification of parts by revenue: A = parts covering
    // the first 80% of cumulative revenue, B = next 15%, C = the tail.
    // The part dimension grows with scale (~20 B parts at 100 TB), so the
    // cumulative revenue sum is the distributed two-pass prefix sum
    // (PrefixSum.cumsumLong: range-partition on the total order, local
    // running sums, broadcast per-partition offsets) — NEVER a single-task
    // unpartitioned window. Class boundaries are exact integer
    // cross-multiplies (5·cum ≤ 4·tot, 20·cum ≤ 19·tot).
    "agg_abc_classification" -> Decl(
      (s, d) => {
        val rev = Tables(s, d, "lineitem")
          .groupBy("l_partkey")
          .agg(sum(round(col("l_extendedprice") * 100).cast("bigint")).as("cents"))
        PrefixSum.cumsumLong(rev, Seq(col("cents").desc, col("l_partkey")),
                             col("cents"), "cum")
          .join(broadcast(rev.agg(sum(col("cents")).as("tot"))))
          .select(when(col("cum") * 5 <= col("tot") * 4, "A")
                    .when(col("cum") * 20 <= col("tot") * 19, "B")
                    .otherwise("C").as("abc"),
                  col("cents"))
          .groupBy("abc")
          .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("class_cents"))
          .orderBy("abc")
      },
      Some("""WITH rev AS (SELECT l_partkey,
             |               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
             |             FROM lineitem GROUP BY l_partkey),
             |c AS (SELECT l_partkey, cents,
             |        sum(cents) OVER (ORDER BY cents DESC, l_partkey
             |                         ROWS UNBOUNDED PRECEDING) AS cum,
             |        sum(cents) OVER () AS tot
             |      FROM rev)
             |SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
             |            WHEN cum * 20 <= tot * 19 THEN 'B'
             |            ELSE 'C' END AS abc,
             |       CAST(count(*) AS BIGINT) AS n_parts,
             |       CAST(sum(cents) AS BIGINT) AS class_cents
             |FROM c GROUP BY 1 ORDER BY abc""".stripMargin)),

    // Dormancy & reactivation: per user, dormancy spells (gaps > 7 days
    // between consecutive events) and the longest spell — churn-risk
    // bookkeeping from one lag over the per-user sort, exact micros.
    "ts_dormancy_reactivation" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  expr("unix_micros(ts)").as("us"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
               sum(when(col("gap") > 604800000000L, 1L).otherwise(0L))
                 .as("n_reactivations"),
               max(col("gap")).as("max_gap_us"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (SELECT user_id, event_id, us,
             |             us - lag(us) OVER (PARTITION BY user_id
             |               ORDER BY us, event_id) AS gap
             |           FROM (SELECT user_id, event_id,
             |                   CAST(epoch_us(ts) AS BIGINT) AS us
             |                 FROM events))
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(sum(CASE WHEN gap > 604800000000 THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_reactivations,
             |       CAST(max(gap) AS BIGINT) AS max_gap_us
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}
