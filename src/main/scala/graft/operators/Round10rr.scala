package graft.operators

import graft.{Decl, Tables}

/** Round-10 wave 48: the Spark-4 SQL-surface modernisms a user migrating
  * a semi-structured/parameterized workload expects — the VARIANT type
  * (parse_json + typed variant_get shredding), SQL-defined scalar and
  * table functions (CREATE FUNCTION … RETURN, no JVM closure — fully
  * Catalyst-inlined so codegen sees the expanded expression, nothing
  * opaque in the hot path), EXECUTE IMMEDIATE with positional binds,
  * named parameter markers through the `spark.sql(text, args)` API, and
  * the IDENTIFIER() clause for late-bound table names.
  *
  * Scale notes: every key is a single scan + one map-side-combined
  * aggregate (or a pushed filter); the SQL-UDF bodies inline into the
  * same plan the hand-written expression would produce (verified by
  * Round10rsSpec's plan assertions — no ScalaUDF node anywhere), so the
  * 100 TB behavior is exactly the base aggregate's. VARIANT shredding is
  * per-row work inside whole-stage codegen; at cluster scale the shredded
  * struct would be written once (sink_parquet) rather than re-parsed per
  * query, but the parse itself is linear and partition-local.
  */
object Round10rr {

  val decls: Map[String, Decl] = Map(
    // VARIANT ingestion: parse the JSON props column once into Spark 4's
    // VARIANT type, then shred typed values back out with variant_get
    // (strict, throws on type mismatch) and try_variant_get (NULL on
    // missing path — exercised on a key that never exists). The oracle
    // shreds the same JSON with DuckDB's json_extract_string + CAST.
    // VARIANT never reaches the output schema (the driver's hash compare
    // could not represent it): everything surfaces as BIGINT.
    "sql_variant_shred" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT event_type,
                |       CAST(count(*) AS BIGINT) AS n,
                |       CAST(sum(variant_get(v, '$.k', 'bigint')) AS BIGINT)
                |         AS sum_k,
                |       CAST(max(variant_get(v, '$.k', 'bigint')) AS BIGINT)
                |         AS max_k,
                |       CAST(sum(CASE WHEN try_variant_get(v, '$.absent', 'bigint')
                |                     IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                |         AS n_absent
                |FROM (SELECT event_type, parse_json(props) AS v FROM events)
                |GROUP BY event_type
                |ORDER BY event_type""".stripMargin)
      },
      Some("""SELECT event_type,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
             |            AS BIGINT) AS sum_k,
             |       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
             |            AS BIGINT) AS max_k,
             |       CAST(sum(CASE WHEN json_extract_string(props, '$.absent')
             |                     IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_absent
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // SQL-defined scalar function: the discounted-revenue-in-cents
    // business rule declared ONCE as CREATE FUNCTION … RETURN and reused
    // by name. Catalyst inlines the body at analysis time — the plan is
    // identical to writing the expression inline (no ScalaUDF, no codegen
    // boundary), which is why this beats a JVM closure at any scale.
    "sql_udf_scalar" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION revenue_cents(
                |  p DOUBLE, disc DOUBLE) RETURNS BIGINT
                |RETURN CAST(round(p * (1 - disc) * 100) AS BIGINT)""".stripMargin)
        s.sql("""SELECT l_returnflag, l_linestatus,
                |       CAST(count(*) AS BIGINT) AS n,
                |       CAST(sum(revenue_cents(l_extendedprice, l_discount))
                |            AS BIGINT) AS revenue_cents
                |FROM lineitem
                |GROUP BY l_returnflag, l_linestatus
                |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
             |                     AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // SQL-defined TABLE function (UDTF): a parameterized per-year
    // customer-spend report invoked as a relation — `FROM top_spend(1997)`.
    // The body is a full aggregate query; Spark expands it into the plan
    // like a parameterized view (again: no opaque function node). Ties on
    // cents are broken by custkey so the LIMIT is deterministic.
    "sql_udf_table" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION top_spend(yr INT)
                |RETURNS TABLE(o_custkey BIGINT, cents BIGINT)
                |RETURN SELECT o_custkey,
                |              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                |                   AS BIGINT) AS cents
                |       FROM orders WHERE year(o_orderdate) = yr
                |       GROUP BY o_custkey""".stripMargin)
        s.sql("""SELECT o_custkey, cents FROM top_spend(1997)
                |ORDER BY cents DESC, o_custkey LIMIT 25""".stripMargin)
      },
      Some("""SELECT o_custkey,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS cents
             |FROM orders WHERE year(o_orderdate) = 1997
             |GROUP BY o_custkey
             |ORDER BY cents DESC, o_custkey LIMIT 25""".stripMargin)),

    // EXECUTE IMMEDIATE: SQL text composed/bound at runtime with
    // positional `?` binds — the dynamic-SQL surface a metadata-driven
    // pipeline generates (per-tenant filters, config-driven thresholds).
    "sql_exec_immediate" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""EXECUTE IMMEDIATE
                |  'SELECT lang, CAST(count(*) AS BIGINT) AS n,
                |          CAST(sum(n_chars) AS BIGINT) AS chars
                |   FROM documents WHERE source = ? GROUP BY lang ORDER BY lang'
                |  USING 'src7'""".stripMargin)
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM documents WHERE source = 'src7'
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // Named parameter markers through the two-arg spark.sql API — the
    // injection-safe programmatic surface (parameters are bound as
    // literals by the parser, never string-spliced). The pushed filter
    // carries both binds to the scan.
    "sql_named_params" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql(
          """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
            |FROM documents
            |WHERE lang = :lang AND n_chars >= :minlen
            |ORDER BY doc_id""".stripMargin,
          Map("lang" -> "en", "minlen" -> 300))
      },
      Some("""SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
             |FROM documents
             |WHERE lang = 'en' AND n_chars >= 300
             |ORDER BY doc_id""".stripMargin)),

    // IDENTIFIER() clause: a late-bound table name from a parameter — the
    // templated-DDL/metadata-catalog surface (same report over N tables).
    // Binding an identifier through IDENTIFIER(:tbl) keeps the name out
    // of string-splice territory while the analyzer still resolves a
    // plain table scan (filters push as usual).
    "sql_identifier_clause" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql(
          """SELECT lang, CAST(count(*) AS BIGINT) AS n
            |FROM IDENTIFIER(:tbl)
            |GROUP BY lang ORDER BY lang""".stripMargin,
          Map("tbl" -> "documents"))
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))
  )
}
