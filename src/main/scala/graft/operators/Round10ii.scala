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

  /** percent_rank / cume_dist of customer balance within nation. The
    * hashed columns are EXACT half-up ppm rationals rebuilt from
    * rank()/count() in integer arithmetic — round(pr, 6) itself is
    * engine-divergent when (k−1)/(n−1) lands on a decimal midpoint
    * (sf0.1 hit 333/640 = 0.5203125: Spark's BigDecimal.valueOf rounds
    * the shortest string up, DuckDB rounds the binary double down).
    * The real window functions stay in the query and `fn_consistent`
    * pins them to within half an ulp-of-ppm of the exact rationals in
    * BOTH engines. */
  private val PercentRankCume =
    """WITH r AS (
      |  SELECT c_custkey, c_nationkey,
      |         percent_rank() OVER w AS pr,
      |         cume_dist() OVER w AS cd,
      |         CAST(rank() OVER w AS BIGINT) AS rk,
      |         CAST(count(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)),
      |p AS (
      |  SELECT c_custkey, c_nationkey, pr, cd,
      |         CASE WHEN n = 1 THEN 0
      |              ELSE ((rk - 1) * 2000000 + (n - 1) -
      |                    (((rk - 1) * 2000000 + (n - 1)) % (2 * (n - 1)))) /
      |                   (2 * (n - 1)) END AS prq,
      |         (rk * 2000000 + n - ((rk * 2000000 + n) % (2 * n))) /
      |           (2 * n) AS cdq
      |  FROM r)
      |SELECT c_custkey, c_nationkey,
      |       CAST(prq AS BIGINT) AS pr_ppm,
      |       CAST(cdq AS BIGINT) AS cd_ppm,
      |       abs(pr * 1000000 - prq) < 1 AND abs(cd * 1000000 - cdq) < 1
      |         AS fn_consistent
      |FROM p ORDER BY c_custkey""".stripMargin

  val decls: Map[String, Decl] = Map(
    "sql_distinct_on" -> Decl((s, d) => q(s, d, DistinctOn), Some(DistinctOn)),
    "set_intersect_all" -> Decl((s, d) => q(s, d, IntersectAll), Some(IntersectAll)),
    "set_except_all" -> Decl((s, d) => q(s, d, ExceptAll), Some(ExceptAll)),
    "window_percent_rank_cume" -> Decl(
      (s, d) => q(s, d, PercentRankCume), Some(PercentRankCume))
  )
}
