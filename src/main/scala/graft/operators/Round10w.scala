package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 twenty-third wave: sweep-line concurrency on a bounded spine
  * and exact-integer revenue recognition.
  */
object Round10w {

  val decls: Map[String, Decl] = Map(
    // Peak concurrency: each event holds a 5-minute activity interval;
    // concurrency sampled at minute starts is cumsum(starts/min) −
    // cumsum(ends/min) over the BOUNDED minute spine (the corpus
    // collapses to per-minute counts first — the scale-honest sweep
    // line). Peak and its earliest minute via one deterministic argmin.
    "ts_peak_concurrency" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 60000000L").as("sm"),
                  expr("(unix_micros(ts) + 300000000L) div 60000000L").as("em"))
        val starts = ev.groupBy(col("sm").as("m")).agg(count(lit(1)).as("ns"))
        val ends = ev.groupBy(col("em").as("m")).agg(count(lit(1)).as("ne"))
        val w = Window.orderBy("m")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val spine = starts.join(ends, Seq("m"), "full")
          .select(col("m"),
                  coalesce(col("ns"), lit(0L)).as("ns"),
                  coalesce(col("ne"), lit(0L)).as("ne"))
          .withColumn("active", sum(col("ns") - col("ne")).over(w))
        spine
          .orderBy(col("active").desc, col("m"))
          .limit(1)
          .select(col("m").as("peak_minute"), col("active").as("peak_active"))
      },
      Some("""WITH ev AS (SELECT CAST(epoch_us(ts) // 60000000 AS BIGINT) AS sm,
             |              CAST((epoch_us(ts) + 300000000) // 60000000 AS BIGINT)
             |                AS em
             |            FROM events),
             |st AS (SELECT sm AS m, count(*) AS ns FROM ev GROUP BY 1),
             |en AS (SELECT em AS m, count(*) AS ne FROM ev GROUP BY 1),
             |spine AS (SELECT m, coalesce(ns, 0) AS ns, coalesce(ne, 0) AS ne
             |          FROM st FULL JOIN en USING (m)),
             |a AS (SELECT m, sum(ns - ne) OVER (ORDER BY m
             |               ROWS UNBOUNDED PRECEDING) AS active
             |      FROM spine)
             |SELECT CAST(m AS BIGINT) AS peak_minute,
             |       CAST(active AS BIGINT) AS peak_active
             |FROM a ORDER BY active DESC, m LIMIT 1""".stripMargin)),

    // Revenue recognition: each order's value prorated evenly across the
    // months from placement to last shipment — div/mod integer
    // allocation (base share everywhere, the remainder recognized in the
    // FIRST month), so every allocated cent is exact and the total
    // reconciles to the source by construction. The month fan-out is
    // bounded by the span; one shuffle to the month ledger.
    "agg_revenue_recognition" -> Decl(
      (s, d) => {
        val span = Tables(s, d, "lineitem")
          .groupBy("l_orderkey").agg(max(col("l_shipdate")).as("last_ship"))
          .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderkey"),
                  round(col("o_totalprice") * 100).cast("bigint").as("cents"),
                  (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
                    .cast("bigint").as("m0"),
                  (year(col("last_ship")) * 12 + month(col("last_ship")) - 1)
                    .cast("bigint").as("m1"))
          .filter(col("m1") >= col("m0"))
          .withColumn("nm", col("m1") - col("m0") + 1)
        span
          .select(col("o_orderkey"), col("cents"), col("m0"), col("nm"),
                  explode(expr("sequence(0L, nm - 1)")).as("i"))
          .select((col("m0") + col("i")).as("month_idx"),
                  (expr("cents div nm")
                    + when(col("i") === 0, expr("cents % nm")).otherwise(0L))
                    .as("rec_cents"))
          .groupBy("month_idx")
          .agg(count(lit(1)).as("n_allocs"), sum(col("rec_cents")).as("rec_cents"))
          .orderBy("month_idx")
      },
      Some("""WITH ls AS (SELECT l_orderkey, max(l_shipdate) AS last_ship
             |            FROM lineitem GROUP BY l_orderkey),
             |span AS (SELECT o_orderkey,
             |           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |           CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
             |                AS BIGINT) AS m0,
             |           CAST(year(last_ship) * 12 + month(last_ship) - 1
             |                AS BIGINT) AS m1
             |         FROM ls JOIN orders ON l_orderkey = o_orderkey
             |         WHERE CAST(year(last_ship) * 12 + month(last_ship) - 1 AS BIGINT)
             |               >= CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)),
             |alloc AS (
             |  SELECT m0 + i AS month_idx,
             |         cents // (m1 - m0 + 1)
             |           + CASE WHEN i = 0 THEN cents % (m1 - m0 + 1) ELSE 0 END
             |           AS rec_cents
             |  FROM span, unnest(generate_series(0, m1 - m0)) AS t(i))
             |SELECT CAST(month_idx AS BIGINT) AS month_idx,
             |       CAST(count(*) AS BIGINT) AS n_allocs,
             |       CAST(sum(rec_cents) AS BIGINT) AS rec_cents
             |FROM alloc GROUP BY month_idx ORDER BY month_idx""".stripMargin))
  )
}
