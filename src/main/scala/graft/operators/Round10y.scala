package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 twenty-fifth wave: retail affinity indexing, activation
  * latency, and ISO calendar decomposition.
  */
object Round10y {

  val decls: Map[String, Decl] = Map(
    // Affinity index ("index 120"): how over/under-represented each
    // order priority is within a market segment vs the population —
    // (cell/rowtot)/(coltot/grand), carried as one exact cross-multiplied
    // integer ppm floor division. Bounded 5×5 grid off one fact shuffle.
    "agg_affinity_index" -> Decl(
      (s, d) => {
        val cells = Tables(s, d, "orders")
          .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"),
                   col("o_orderpriority").as("pr"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(true)
        val rows = cells.groupBy("seg").agg(sum(col("n")).as("nseg"))
        val cols = cells.groupBy("pr").agg(sum(col("n")).as("npr"))
        val tot = cells.agg(sum(col("n")).as("nt"))
        cells.join(broadcast(rows), "seg").join(broadcast(cols), "pr")
          .crossJoin(broadcast(tot))
          .select(col("seg"), col("pr"), col("n"),
                  expr("n * nt * 1000000L div (nseg * npr)").as("affinity_ppm"))
          .orderBy("seg", "pr")
      },
      Some("""WITH cells AS (
             |  SELECT c_mktsegment AS seg, o_orderpriority AS pr,
             |         count(*) AS n
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |r AS (SELECT seg, sum(n) AS nseg FROM cells GROUP BY seg),
             |c AS (SELECT pr, sum(n) AS npr FROM cells GROUP BY pr),
             |t AS (SELECT sum(n) AS nt FROM cells)
             |SELECT seg, pr, CAST(n AS BIGINT) AS n,
             |       CAST(n * nt * 1000000 // (nseg * npr) AS BIGINT)
             |         AS affinity_ppm
             |FROM cells JOIN r USING (seg) JOIN c USING (pr) CROSS JOIN t
             |ORDER BY seg, pr""".stripMargin)),

    // Activation latency: per user, micros from their first event to
    // their third purchase (users who never reach three purchases are
    // absent) — the time-to-Nth-action activation metric. One ranked
    // filter over the purchase stream joined to the broadcast first-seen
    // aggregate; all integer micros.
    "ts_time_to_nth_event" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  expr("unix_micros(ts)").as("us"))
        val firstSeen = ev.groupBy("user_id").agg(min(col("us")).as("first_us"))
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        ev.filter(col("event_type") === "purchase")
          .withColumn("k", row_number().over(w))
          .filter(col("k") === 3)
          .join(broadcast(firstSeen), "user_id")
          .select(col("user_id"), col("first_us"),
                  col("us").as("third_purchase_us"),
                  (col("us") - col("first_us")).as("activation_us"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type,
             |              CAST(epoch_us(ts) AS BIGINT) AS us
             |            FROM events),
             |f AS (SELECT user_id, min(us) AS first_us FROM ev GROUP BY user_id),
             |p AS (SELECT user_id, us,
             |        row_number() OVER (PARTITION BY user_id
             |          ORDER BY us, event_id) AS k
             |      FROM ev WHERE event_type = 'purchase')
             |SELECT p.user_id, first_us, us AS third_purchase_us,
             |       us - first_us AS activation_us
             |FROM p JOIN f USING (user_id)
             |WHERE k = 3 ORDER BY p.user_id""".stripMargin)),

    // ISO calendar decomposition of order dates: ISO week-numbering year
    // + week, day-of-year, quarter — the fiscal-calendar scalar family
    // (both engines implement ISO 8601 week semantics). Pure per-row
    // date arithmetic riding the scan.
    "scalar_isoweek_parts" -> Decl(
      (s, d) => {
        Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("dt"))
          .select(col("o_orderkey"), col("dt"),
                  expr("extract(YEAROFWEEK FROM dt)").cast("bigint").as("iso_year"),
                  weekofyear(col("dt")).cast("bigint").as("iso_week"),
                  dayofyear(col("dt")).cast("bigint").as("doy"),
                  quarter(col("dt")).cast("bigint").as("qtr"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS dt,
             |       CAST(isoyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_year,
             |       CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
             |       CAST(dayofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS doy,
             |       CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr
             |FROM orders ORDER BY o_orderkey""".stripMargin))
  )
}
