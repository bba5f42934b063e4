package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 80: business-day calendar arithmetic (the SLA math
  * every order-fulfillment warehouse runs: business days elapsed
  * between order and ship, and the "due 5 business days out" deadline —
  * in closed form from a Monday anchor, no calendar table, no
  * iteration) and the ORDER BY ALL SQL-surface shorthand (sorts by
  * every select-list column left to right — the DuckDB-pioneered
  * notation Spark 4 also accepts; the oracle runs its native form).
  *
  * Determinism: everything is integer date arithmetic off the Monday
  * 1990-01-01 anchor (all fixture dates are later, so div/mod never
  * see negatives); weekend starts count from the preceding Friday —
  * the convention is pinned in the Scaladoc and the spec cross-checks
  * an independent day-walking implementation.
  *
  * Scale shape: both keys are pure per-row projection / one ordered
  * scan — no shuffle beyond the declared output order.
  */
object Round11x {

  /** Business days in [anchor, d): 5 per full week + the weekday
    * remainder capped at 5 (Sat/Sun contribute nothing). Differences
    * g(b) − g(a) are SIGNED — the synthetic fixture ships some lines
    * before their order date and the latency reports that honestly. */
  private def gExpr(dcol: org.apache.spark.sql.Column) = {
    val k = datediff(dcol, to_date(lit("1990-01-01")))
    lit(5) * (k / 7).cast("bigint") + least(pmod(k, lit(7)), lit(5)).cast("bigint")
  }

  val decls: Map[String, Decl] = Map(
    // Order→ship business-day latency + the 5-business-day deadline
    // and whether the line met it. bi(d) indexes d among business days
    // (weekends map to the preceding Friday), so deadline = index + 5
    // mapped back through the same bijection.
    "scalar_business_days" -> Decl(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
                  col("l_shipdate").cast("date").as("ship"))
        val o = Tables(s, d, "orders")
          .select(col("o_orderkey").as("l_orderkey"),
                  col("o_orderdate").cast("date").as("ordered"))
        val k = datediff(col("ordered"), to_date(lit("1990-01-01")))
        val bi = lit(5) * (k / 7).cast("bigint") +
          least(pmod(k, lit(7)), lit(4)).cast("bigint")
        val ti = bi + 5
        li.join(o, "l_orderkey")
          .withColumn("bus_latency", gExpr(col("ship")) - gExpr(col("ordered")))
          .withColumn("due_5bd",
            date_add(to_date(lit("1990-01-01")),
                     (lit(7) * (ti / 5).cast("bigint") + pmod(ti, lit(5)))
                       .cast("int")))
          .select(col("l_orderkey"), col("l_linenumber"),
                  col("ordered"), col("ship"),
                  col("bus_latency"), col("due_5bd"),
                  (col("ship") <= col("due_5bd")).as("met_5bd_sla"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |         CAST(l_shipdate AS DATE) AS ship
             |  FROM lineitem),
             |o AS (
             |  SELECT o_orderkey AS l_orderkey,
             |         CAST(o_orderdate AS DATE) AS ordered
             |  FROM orders),
             |j AS (SELECT * FROM li JOIN o USING (l_orderkey)),
             |g AS (
             |  SELECT *,
             |         date_diff('day', DATE '1990-01-01', ship) AS ks,
             |         date_diff('day', DATE '1990-01-01', ordered) AS ko
             |  FROM j),
             |b AS (
             |  SELECT *,
             |         (5 * (ks // 7) + least(ks % 7, 5)) -
             |           (5 * (ko // 7) + least(ko % 7, 5)) AS bus_latency,
             |         5 * (ko // 7) + least(ko % 7, 4) + 5 AS ti
             |  FROM g)
             |SELECT l_orderkey, l_linenumber, ordered, ship,
             |       CAST(bus_latency AS BIGINT) AS bus_latency,
             |       DATE '1990-01-01' + CAST(7 * (ti // 5) + ti % 5 AS INTEGER)
             |         AS due_5bd,
             |       ship <= DATE '1990-01-01' +
             |               CAST(7 * (ti // 5) + ti % 5 AS INTEGER) AS met_5bd_sla
             |FROM b ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ORDER BY ALL: per-(returnflag, linestatus) pricing rollup sorted
    // by the shorthand; the oracle runs DuckDB's native ORDER BY ALL.
    "sql_order_by_all" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT l_returnflag, l_linestatus,
                |       CAST(count(*) AS BIGINT) AS n,
                |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                |            AS BIGINT) AS cents
                |FROM lineitem
                |GROUP BY l_returnflag, l_linestatus
                |ORDER BY ALL""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       count(*) AS n,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |            AS BIGINT) AS cents
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY ALL""".stripMargin))
  )
}
