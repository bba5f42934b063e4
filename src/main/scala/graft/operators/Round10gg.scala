package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 thirty-third wave: symmetric top/bottom-k extremes on the
  * native bounded-heap operator (no low-cardinality window funnel).
  */
object Round10gg {

  val decls: Map[String, Decl] = Map(
    // Top-3 and bottom-3 customers by balance per market segment — the
    // classic extremes report, but scale-safe: BOTH ends run on the
    // native TopKPerKey bounded heaps (segment is a 5-value key, so a
    // ranking window would funnel ~1/5 of the corpus through one task;
    // the heaps never materialize more than k rows per key). Bottom-end
    // tie-break mirrors the reversed order exactly in the oracle.
    "window_top_bottom_k" -> Decl(
      (s, d) => {
        val base = Tables(s, d, "customer")
          .select(col("c_mktsegment"), col("c_custkey"),
                  round(col("c_acctbal") * 100).cast("bigint").as("cents"))
        val top = graft.plans.TopK.perKey(base, Seq("c_mktsegment"),
            Seq("cents" -> true, "c_custkey" -> false), 3)
          .withColumn("side", lit("top"))
        val bottom = graft.plans.TopK.perKey(base, Seq("c_mktsegment"),
            Seq("cents" -> false, "c_custkey" -> true), 3)
          .withColumn("side", lit("bottom"))
        top.unionAll(bottom)
          .select("c_mktsegment", "side", "c_custkey", "cents")
          .orderBy("c_mktsegment", "side", "c_custkey")
      },
      Some("""WITH s AS (SELECT c_mktsegment, c_custkey,
             |             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
             |           FROM customer),
             |r AS (SELECT c_mktsegment, c_custkey, cents,
             |        row_number() OVER (PARTITION BY c_mktsegment
             |          ORDER BY cents DESC, c_custkey ASC) AS rt,
             |        row_number() OVER (PARTITION BY c_mktsegment
             |          ORDER BY cents ASC, c_custkey DESC) AS rb
             |      FROM s)
             |SELECT c_mktsegment, side, c_custkey, cents FROM (
             |  SELECT c_mktsegment, 'top' AS side, c_custkey, cents
             |  FROM r WHERE rt <= 3
             |  UNION ALL
             |  SELECT c_mktsegment, 'bottom' AS side, c_custkey, cents
             |  FROM r WHERE rb <= 3)
             |ORDER BY c_mktsegment, side, c_custkey""".stripMargin))
  )
}
