package graft.operators

import graft.{Decl, Tables}
import graft.adt.Adt
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 eighth wave: nested (two-level) ADT pattern matching — the
  * depth dimension of the reference's defining feature — plus a
  * try_cast data-quality audit and discrete percentiles by integer rank.
  */
object Round9h {

  /** orders + a two-level ADT: Payment = Paid(method: Method, cents) |
    * Unpaid, where Method = Card(last4) | Cash is itself an ADT nested
    * INSIDE the Paid payload. The encoding composes: a variant field is
    * just a Column, so an inner `Adt.construct` struct nests under the
    * outer payload with no special machinery — the property that makes
    * the StructType encoding closed under composition.
    */
  private def withPayment(s: SparkSession, d: String): DataFrame = {
    val o = Tables(s, d, "orders")
    val method = Adt.construct(
      (col("o_orderkey") % 3 === 0) ->
        Adt.variant("Card")("last4" ->
          lpad((col("o_orderkey") % 10000).cast("string"), 4, "0")),
      (col("o_orderkey") % 3 =!= 0) -> Adt.variant("Cash")())
    o.withColumn("payment", Adt.construct(
      (col("o_orderstatus") =!= "O") ->
        Adt.variant("Paid")(
          "method" -> method,
          "cents" -> round(col("o_totalprice") * 100).cast("bigint")),
      (col("o_orderstatus") === "O") -> Adt.variant("Unpaid")()))
  }
  private def payment: Column = col("payment")

  val decls: Map[String, Decl] = Map(
    // Two-level pattern match: `payment matches Paid(Card(l4), c)` etc.
    // Each arm deconstructs through BOTH levels; output is primitives
    // only (R5). The oracle is the equivalent nested CASE over the same
    // base columns — proving the composed encoding round-trips.
    "adt_nested_variant" -> Decl(
      (s, d) => Tables.canon(
        withPayment(s, d).select(
          col("o_orderkey"),
          Adt.matchOn(payment)(
            "Paid" -> (p => Adt.matchOn(p.getField("method"))(
              "Card" -> (m => concat(lit("card:"), m.getField("last4"))),
              "Cash" -> (_ => lit("cash")))),
            "Unpaid" -> (_ => lit("unpaid"))).as("descr"),
          when(Adt.is(payment, "Paid") &&
               Adt.is(Adt.payload(payment, "Paid").getField("method"), "Card"),
               Adt.payload(payment, "Paid").getField("cents"))
            .as("card_cents"))),
      Some("""SELECT o_orderkey,
             |CASE WHEN o_orderstatus <> 'O' AND o_orderkey % 3 = 0
             |       THEN 'card:' || lpad(CAST(o_orderkey % 10000 AS VARCHAR), 4, '0')
             |     WHEN o_orderstatus <> 'O' THEN 'cash'
             |     ELSE 'unpaid' END AS descr,
             |CASE WHEN o_orderstatus <> 'O' AND o_orderkey % 3 = 0
             |       THEN CAST(round(o_totalprice * 100) AS BIGINT) END AS card_cents
             |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin)),

    // try_cast ingestion audit — the malformed-input census of a raw
    // feed: dirty strings are derived deterministically from the fixtures
    // (every 13th price becomes 'N/A', every 17th date 'not-a-date'), so
    // both failure classes provably fire; try_cast turns each bad cell
    // into NULL instead of killing the job (the error-safe semantics
    // scalar_try_arith covers for arithmetic), and the audit counts
    // failures per field. One aggregate scan per source table; output
    // bounded by the field list.
    "quality_cast_audit" -> Decl(
      (s, d) => {
        val p = Tables(s, d, "part")
          .select(when(col("p_partkey") % 13 === 0, lit("N/A"))
                    .otherwise(col("p_retailprice").cast("string")).as("raw"))
          .agg(count(lit(1)).as("n"),
               count(when(expr("try_cast(raw AS DOUBLE)").isNull, 1)).as("fails"))
          .select(lit("part.retailprice AS DOUBLE").as("field"),
                  col("n").as("n_checked"), col("fails").as("n_fail"))
        val o = Tables(s, d, "orders")
          .select(when(col("o_orderkey") % 17 === 0, lit("not-a-date"))
                    .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
                    .as("raw"))
          .agg(count(lit(1)).as("n"),
               count(when(expr("try_cast(raw AS DATE)").isNull, 1)).as("fails"))
          .select(lit("orders.orderdate AS DATE").as("field"),
                  col("n").as("n_checked"), col("fails").as("n_fail"))
        p.unionByName(o).orderBy("field")
      },
      Some("""SELECT field, CAST(n_checked AS BIGINT) AS n_checked,
             |       CAST(n_fail AS BIGINT) AS n_fail FROM (
             |  SELECT 'part.retailprice AS DOUBLE' AS field, count(*) AS n_checked,
             |    count(*) FILTER (WHERE try_cast(
             |      CASE WHEN p_partkey % 13 = 0 THEN 'N/A'
             |           ELSE CAST(p_retailprice AS VARCHAR) END AS DOUBLE) IS NULL)
             |      AS n_fail
             |  FROM part
             |  UNION ALL
             |  SELECT 'orders.orderdate AS DATE', count(*),
             |    count(*) FILTER (WHERE try_cast(
             |      CASE WHEN o_orderkey % 17 = 0 THEN 'not-a-date'
             |           ELSE strftime(o_orderdate, '%Y-%m-%d') END AS DATE) IS NULL)
             |  FROM orders)
             |ORDER BY field""".stripMargin)),

    // Discrete percentiles (percentile_disc semantics) — the quantile
    // family's rank-exact member: per event type, the SMALLEST grid value
    // whose cumulative count reaches ⌈q·n⌉ for q ∈ {.25, .5, .75, .95},
    // every comparison an integer cross-multiply on the bounded
    // distinct-cents grid (the weighted-median machinery widened to four
    // quantiles — no interpolation ever crosses engines). Output: one row
    // per type.
    "agg_percentile_disc" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), round(col("value") * 100).cast("bigint").as("c"))
        val grid = ev.groupBy("event_type", "c").agg(count(lit(1)).as("w"))
        val cw = Window.partitionBy("event_type").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = grid.groupBy("event_type").agg(sum(col("w")).as("n"))
        val cum = grid
          .select(col("event_type"), col("c"), sum(col("w")).over(cw).as("cum"))
          .join(broadcast(tot), "event_type")
        cum.groupBy("event_type")
          .agg(min(when(col("cum") * 4 >= col("n"), col("c"))).as("p25"),
               min(when(col("cum") * 2 >= col("n"), col("c"))).as("p50"),
               min(when(col("cum") * 4 >= col("n") * 3, col("c"))).as("p75"),
               min(when(col("cum") * 20 >= col("n") * 19, col("c"))).as("p95"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type,
             |              CAST(round(value * 100) AS BIGINT) AS c
             |            FROM events),
             |grid AS (SELECT event_type, c, count(*) AS w FROM ev GROUP BY 1, 2),
             |cum AS (SELECT event_type, c,
             |          sum(w) OVER (PARTITION BY event_type ORDER BY c
             |                       ROWS UNBOUNDED PRECEDING) AS cum,
             |          sum(w) OVER (PARTITION BY event_type) AS n
             |        FROM grid)
             |SELECT event_type,
             |       CAST(min(CASE WHEN cum * 4 >= n THEN c END) AS BIGINT) AS p25,
             |       CAST(min(CASE WHEN cum * 2 >= n THEN c END) AS BIGINT) AS p50,
             |       CAST(min(CASE WHEN cum * 4 >= n * 3 THEN c END) AS BIGINT) AS p75,
             |       CAST(min(CASE WHEN cum * 20 >= n * 19 THEN c END) AS BIGINT) AS p95
             |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
