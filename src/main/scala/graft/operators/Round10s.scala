package graft.operators

import graft.{Decl, Tables}

/** Round-10 nineteenth wave: SQL-surface completions — the PIVOT clause,
  * HiveQL LATERAL VIEW generators, and Spark's DISTRIBUTE/SORT (CLUSTER
  * BY) partitioning syntax. Each oracle reproduces the semantics in
  * portable SQL (CASE sums / unnest / plain order).
  */
object Round10s {

  val decls: Map[String, Decl] = Map(
    // SQL PIVOT clause (not the DataFrame API — the parser surface):
    // event counts per user rotated into one column per type. The oracle
    // is the portable CASE-sum rotation.
    "sql_pivot_clause" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT * FROM (
                |  SELECT user_id, event_type FROM events)
                |PIVOT (CAST(count(*) AS BIGINT)
                |       FOR event_type IN ('click' AS n_click, 'error' AS n_error,
                |                          'purchase' AS n_purchase,
                |                          'signup' AS n_signup, 'view' AS n_view))
                |ORDER BY user_id""".stripMargin)
      },
      Some("""SELECT user_id,
             |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
             |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
             |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
             |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
             |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // LATERAL VIEW explode — the HiveQL generator syntax Spark keeps for
    // compatibility: tokenize documents in pure SQL, count term
    // occurrences for terms above a support floor.
    "sql_lateral_view" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT w, CAST(count(*) AS BIGINT) AS n
                |FROM documents
                |LATERAL VIEW explode(split(text, ' ')) t AS w
                |GROUP BY w HAVING count(*) >= 100
                |ORDER BY w""".stripMargin)
      },
      Some("""SELECT w, CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
             |GROUP BY w HAVING count(*) >= 100
             |ORDER BY w""".stripMargin)),

    // DISTRIBUTE BY + SORT BY (together: CLUSTER BY) — Spark's explicit
    // partition-layout syntax: rows land hash-distributed on the key and
    // sorted within each partition (the pre-bucketing shuffle shape).
    // Result SEMANTICS are just the rows; the declared total order makes
    // the oracle portable while the plan carries the exchange+sort.
    "sql_cluster_by" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT * FROM (
                |  SELECT o_custkey, o_orderkey,
                |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                |  FROM orders
                |  CLUSTER BY o_custkey)
                |ORDER BY o_custkey, o_orderkey""".stripMargin)
      },
      Some("""SELECT o_custkey, o_orderkey,
             |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin))
  )
}
