package graft.operators

import graft.{Decl, Tables}

/** Round-9 eleventh wave: the classic TPC-H benchmark queries the fixture
  * schema supports verbatim (Q3, Q6, Q10, Q18), as declared contract keys
  * — the flagship multi-join analytics shapes a user of any warehouse
  * engine runs on day one, adapted only where the synthetic schema lacks
  * a column (no o_shippriority / c_address) and hardened per the repo's
  * determinism rules: money flows as round(expr·100) integer cents (the
  * 0-dp round both engines compute identically on the same double — R3's
  * safe member), dates surface as DATE (R4), and every ORDER BY carries a
  * unique tiebreaker (R2).
  *
  * Scale notes: Q3/Q10 are selective fact joins that Catalyst plans as
  * broadcast(dim)⋈shuffle(fact) with the date filters pushed to the
  * parquet scans; Q6 is a pure pushed-filter scan aggregate (the
  * vectorized-reader speed-of-light query); Q18's HAVING subquery is one
  * self-aggregate semi join on the order key.
  */
object Round9k {

  private def q(spark: org.apache.spark.sql.SparkSession, d: String, sql: String) = {
    Tables.views(spark, d)
    spark.sql(sql)
  }

  private val Q3 =
    """SELECT l_orderkey,
      |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_c,
      |       CAST(o_orderdate AS DATE) AS order_date
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue_c DESC, l_orderkey LIMIT 10""".stripMargin

  private val Q6 =
    """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_c
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  private val Q10 =
    """SELECT c_custkey, c_name,
      |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_c,
      |       round(c_acctbal, 2) AS acctbal, n_name
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |              JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue_c DESC, c_custkey LIMIT 20""".stripMargin

  private val Q18 =
    """SELECT c_name, c_custkey, o_orderkey,
      |       CAST(o_orderdate AS DATE) AS order_date,
      |       CAST(round(o_totalprice * 100) AS BIGINT) AS total_c,
      |       CAST(sum(l_quantity) AS BIGINT) AS qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY total_c DESC, o_orderkey LIMIT 100""".stripMargin

  val decls: Map[String, Decl] = Map(
    "tpch_q3"  -> Decl((s, d) => q(s, d, Q3),  Some(Q3)),
    "tpch_q6"  -> Decl((s, d) => q(s, d, Q6),  Some(Q6)),
    "tpch_q10" -> Decl((s, d) => q(s, d, Q10), Some(Q10)),
    "tpch_q18" -> Decl((s, d) => q(s, d, Q18), Some(Q18))
  )
}
