package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 twenty-ninth wave: trading-day adjustment and consecutive-day
  * streaks (the date-minus-rank idiom).
  */
object Round10cc {

  val decls: Map[String, Decl] = Map(
    // Calendar (trading-day) adjustment of daily order revenue: each
    // day's cents divided by its weekday's seasonal factor
    // (dow mean / overall mean). Exact cross-multiply clears both means:
    // adjusted = cents · total_cents / (n_days_total · dow_cents / n_dow)
    //          = cents · dow_n · total / (dow_cents · n_days) — all
    // BIGINT until one terminal rounded division.
    "ts_calendar_adjust" -> Decl(
      (s, d) => {
        val daily = Tables(s, d, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
          .withColumn("dow", (weekday(col("day")) + 1).cast("bigint"))
        val dowStats = daily.groupBy("dow")
          .agg(count(lit(1)).as("dow_n"), sum(col("cents")).as("dow_cents"))
        val tot = daily.agg(count(lit(1)).as("n_days"), sum(col("cents")).as("total"))
        daily.join(broadcast(dowStats), "dow").crossJoin(broadcast(tot))
          .select(col("day"), col("dow"), col("cents"),
                  round((col("cents") * col("dow_n")).cast("double") * col("total")
                        / (col("dow_cents") * col("n_days")).cast("double"), 2)
                    .as("adjusted_cents"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
             |         CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow
             |  FROM orders GROUP BY 1, 3),
             |ds AS (SELECT dow, count(*) AS dow_n, sum(cents) AS dow_cents
             |       FROM daily GROUP BY dow),
             |t AS (SELECT count(*) AS n_days, sum(cents) AS total FROM daily)
             |SELECT day, dow, CAST(cents AS BIGINT) AS cents,
             |       round(CAST(cents * dow_n AS DOUBLE) * total
             |             / CAST(dow_cents * n_days AS DOUBLE), 2) AS adjusted_cents
             |FROM daily JOIN ds USING (dow) CROSS JOIN t
             |ORDER BY day""".stripMargin)),

    // Longest consecutive-active-day streak per user — the date-minus-
    // rank idiom: distinct active days ranked per user; day − rank is
    // CONSTANT within a consecutive run, so one aggregate over that
    // difference yields every streak. All date/integer arithmetic.
    "ts_daily_streak" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("day")
        val days = Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("date").as("day"))
          .distinct()
        days
          .withColumn("grp", expr("date_sub(day, CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT))"))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"), min(col("day")).as("streak_start"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("longest_streak"),
               sum(col("len")).as("active_days"))
          .orderBy("user_id")
      },
      Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
             |              FROM events),
             |g AS (SELECT user_id, day,
             |        day - CAST(row_number() OVER (PARTITION BY user_id
             |                     ORDER BY day) AS INT) AS grp
             |      FROM days),
             |runs AS (SELECT user_id, grp, count(*) AS len
             |         FROM g GROUP BY 1, 2)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
             |       CAST(max(len) AS BIGINT) AS longest_streak,
             |       CAST(sum(len) AS BIGINT) AS active_days
             |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}
