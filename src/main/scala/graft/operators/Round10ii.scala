package graft.operators

import graft.{Decl, Tables}

/** Round-10 wave 39: SQL-surface closers — DISTINCT ON (lowered by
  * `Sql.rewriteDistinctOn`, hash-matched against DuckDB's NATIVE
  * DISTINCT ON so the rewrite provably implements the standard
  * semantics), the bag-semantics set operations INTERSECT ALL / EXCEPT
  * ALL (both parsers know these natively; the multiset row-count
  * arithmetic min(m,n) / max(m−n,0) is what the hash-match pins), and
  * the two distribution window functions percent_rank / cume_dist.
  *
  * Scale shapes: DISTINCT ON is one window shuffle partitioned by the
  * ON keys — Catalyst's InferWindowGroupLimit turns the rn=1 filter
  * into a per-partition top-1 group limit, so no group ever
  * materializes fully. INTERSECT/EXCEPT ALL plan as a single
  * count-tagged aggregate + generate (Spark's ReplaceIntersectAll /
  * ReplaceExceptAll rules) — one shuffle on the row value, no join of
  * two sorted sides. The distribution windows partition by nation (a
  * bounded dimension), so every partition is small at any SF.
  */
object Round10ii {

  private def q(spark: org.apache.spark.sql.SparkSession, d: String, sql: String) = {
    Tables.views(spark, d)
    graft.Sql.runSql(spark, sql)
  }

  /** Latest order per customer — the canonical DISTINCT ON use. The
    * trailing o_orderkey sort key breaks date ties so both engines keep
    * the same row. */
  private val DistinctOn =
    """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
      |FROM orders
      |ORDER BY o_custkey, o_orderdate DESC, o_orderkey""".stripMargin

  /** Customers' order-priority multiset common to 1996 and 1997:
    * INTERSECT ALL keeps min(m, n) copies of each (custkey, priority)
    * row — the bag semantics DISTINCT set ops can't express. */
  private val IntersectAll =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderpriority FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  INTERSECT ALL
      |  SELECT o_custkey, o_orderpriority FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |ORDER BY o_custkey, o_orderpriority""".stripMargin

  /** 1996 minus 1997 with multiplicity: EXCEPT ALL keeps max(m−n, 0)
    * copies. */
  private val ExceptAll =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderpriority FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  EXCEPT ALL
      |  SELECT o_custkey, o_orderpriority FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |ORDER BY o_custkey, o_orderpriority""".stripMargin

  /** percent_rank / cume_dist of customer balance within nation —
    * rank-derived rationals (k−1)/(n−1) and k/n, exact in IEEE double
    * for the same integer rank inputs, rounded 6 dp terminally. */
  private val PercentRankCume =
    """SELECT c_custkey, c_nationkey,
      |       round(percent_rank() OVER w, 6) AS pr,
      |       round(cume_dist() OVER w, 6) AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  val decls: Map[String, Decl] = Map(
    "sql_distinct_on" -> Decl((s, d) => q(s, d, DistinctOn), Some(DistinctOn)),
    "set_intersect_all" -> Decl((s, d) => q(s, d, IntersectAll), Some(IntersectAll)),
    "set_except_all" -> Decl((s, d) => q(s, d, ExceptAll), Some(ExceptAll)),
    "window_percent_rank_cume" -> Decl(
      (s, d) => q(s, d, PercentRankCume), Some(PercentRankCume))
  )
}
