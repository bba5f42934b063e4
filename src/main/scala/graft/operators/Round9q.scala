package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-9 seventeenth wave: the typed Dataset API's per-group surface —
  * groupByKey + mapGroups (arbitrary compiled per-group logic) and
  * cogroup (the typed two-sided grouped merge) — both oracled against
  * relational formulations, proving the typed path computes the same
  * answers the declarative path does.
  */
object Round9q {

  val decls: Map[String, Decl] = Map(
    // groupByKey + mapGroups — the escape hatch for per-group logic the
    // aggregate DSL can't express, here a per-customer order summary
    // computed in compiled Scala over each group's (small) order set.
    // Determinism: the group iterator's order is NOT guaranteed, so the
    // fold uses only order-insensitive reductions (count, exact cents
    // sum, struct-style min by (price desc, key asc) via explicit
    // comparison). Scale: one hash shuffle on the group key; per-group
    // state is O(1) — the shape survives any group size, unlike a
    // sort-and-buffer mapGroups.
    "typed_map_groups" -> Decl(
      (s, d) => {
        val sp = s; import sp.implicits._
        Tables.typed.orders(s, d)
          .groupByKey(_.o_custkey)
          .mapGroups { (ck, os) =>
            var n = 0L
            var cents = 0L
            var bestPrice = Long.MinValue
            var bestKey = Long.MaxValue
            os.foreach { o =>
              val c = math.rint(o.o_totalprice * 100).toLong
              n += 1; cents += c
              if (c > bestPrice || (c == bestPrice && o.o_orderkey < bestKey)) {
                bestPrice = c; bestKey = o.o_orderkey
              }
            }
            (ck, n, cents, bestKey)
          }
          .toDF("c_custkey", "n_orders", "cents", "top_orderkey")
          .orderBy("c_custkey")
      },
      Some("""SELECT o_custkey AS c_custkey, count(*) AS n_orders,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS cents,
             |  (min({'p': -CAST(round(o_totalprice * 100) AS BIGINT),
             |        'k': o_orderkey})).k AS top_orderkey
             |FROM orders GROUP BY o_custkey ORDER BY c_custkey""".stripMargin)),

    // cogroup — the typed two-sided grouped merge: customers and their
    // orders co-partitioned on the key, each pair of group iterators
    // handed to compiled logic (here: an outer summary that keeps
    // order-less customers, which a plain mapGroups over a join would
    // drop). The relational oracle is the LEFT JOIN + GROUP BY
    // equivalent. Scale: ONE co-partitioned shuffle of both sides —
    // exactly a shuffle join's data movement, with arbitrary merge logic
    // instead of a join condition.
    "typed_cogroup_join" -> Decl(
      (s, d) => {
        val sp = s; import sp.implicits._
        val custs = Tables.typed.customer(s, d).groupByKey(_.c_custkey)
        val orders = Tables.typed.orders(s, d).groupByKey(_.o_custkey)
        custs.cogroup(orders) { (ck, cs, os) =>
          cs.toSeq.headOption.map { c =>
            var n = 0L
            var cents = 0L
            os.foreach { o =>
              n += 1; cents += math.rint(o.o_totalprice * 100).toLong
            }
            (ck, c.c_mktsegment, n, cents)
          }.iterator
        }
          .toDF("c_custkey", "segment", "n_orders", "cents")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment AS segment,
             |  CAST(count(o_orderkey) AS BIGINT) AS n_orders,
             |  CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
             |       AS BIGINT) AS cents
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin))
  )
}
