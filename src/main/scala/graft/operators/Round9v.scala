package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-9 twenty-second wave: symmetric difference — the set-operation
  * family's missing member (union / intersect / except ship since round
  * 1; A Δ B completes the algebra).
  */
object Round9v {

  val decls: Map[String, Decl] = Map(
    // Symmetric difference of two derived key sets — orders that are
    // finished XOR urgent, tagged with which side they came from (the
    // reconciliation view: "in A or B but not both"). Expressed as the
    // union of the two anti joins so each side stays a hash join on the
    // key; the oracle uses the equivalent EXCEPT/UNION algebra. Output
    // is deterministic and key-ordered.
    "set_symmetric_diff" -> Decl(
      (s, d) => {
        val o = Tables(s, d, "orders")
        val a = o.filter(col("o_orderstatus") === "F").select("o_orderkey")
        val b = o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
        val onlyA = a.join(b, Seq("o_orderkey"), "left_anti")
          .select(col("o_orderkey"), lit("finished_only").as("side"))
        val onlyB = b.join(a, Seq("o_orderkey"), "left_anti")
          .select(col("o_orderkey"), lit("urgent_only").as("side"))
        onlyA.unionByName(onlyB).orderBy("o_orderkey")
      },
      Some("""WITH a AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'),
             |b AS (SELECT o_orderkey FROM orders
             |      WHERE o_orderpriority = '1-URGENT')
             |SELECT o_orderkey, 'finished_only' AS side
             |FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
             |UNION ALL
             |SELECT o_orderkey, 'urgent_only'
             |FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
             |ORDER BY o_orderkey""".stripMargin))
  )
}
