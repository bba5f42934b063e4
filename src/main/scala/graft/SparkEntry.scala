package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (the binding operator
  * inventory) and §7 (build plan). Each §2 key is declared in exactly one
  * operator module as a `Decl(query, oracleSql)`; this object only merges
  * the registries.
  */
object SparkEntry {

  private def registry: Map[String, Decl] =
    operators.Relational.decls ++
    operators.Aggregates.decls ++
    operators.Windows.decls ++
    functions.Scalars.decls ++
    operators.AdtQueries.decls ++
    operators.Salted.decls ++
    operators.Pipeline.decls ++
    operators.PipelineExt.decls ++
    operators.Round4.decls ++
    operators.Round5.decls ++
    operators.Round6.decls ++
    operators.Round7.decls ++
    operators.Round8.decls ++
    operators.Round8b.decls ++
    operators.Round9.decls ++
    operators.Round9b.decls ++
    operators.Round9c.decls ++
    operators.Round9d.decls ++
    operators.Round9e.decls ++
    operators.Round9f.decls ++
    operators.Round9g.decls ++
    operators.Round9h.decls ++
    operators.Round9i.decls ++
    operators.Round9j.decls ++
    operators.Round9k.decls ++
    operators.Round9l.decls ++
    operators.Round9m.decls ++
    operators.Round9n.decls ++
    operators.Round9o.decls ++
    operators.Round9p.decls ++
    operators.Round9q.decls ++
    operators.Round9r.decls ++
    operators.Round9s.decls ++
    operators.Round9t.decls ++
    operators.Round9u.decls ++
    operators.Round9v.decls ++
    operators.Round9w.decls ++
    operators.Round9x.decls ++
    operators.Round10.decls ++
    operators.Round10b.decls ++
    operators.Round10c.decls ++
    operators.Round10d.decls ++
    operators.Round10e.decls ++
    operators.Round10f.decls ++
    operators.Round10g.decls ++
    operators.Round10h.decls ++
    operators.Round10i.decls ++
    operators.Round10j.decls ++
    operators.Round10k.decls ++
    operators.Round10l.decls ++
    operators.Round10m.decls ++
    operators.Round10n.decls ++
    operators.Round10o.decls ++
    operators.Round10p.decls ++
    operators.Round10q.decls ++
    operators.Round10r.decls ++
    operators.Round10s.decls ++
    operators.Round10t.decls ++
    operators.Round10u.decls ++
    operators.Round10v.decls ++
    operators.Round10w.decls ++
    operators.Round10x.decls ++
    operators.Round10y.decls ++
    operators.Round10z.decls ++
    operators.Round10aa.decls ++
    operators.Round10bb.decls ++
    operators.Round10cc.decls ++
    operators.Round10dd.decls ++
    operators.Round10ee.decls ++
    operators.Round10ff.decls ++
    operators.Round10gg.decls ++
    operators.Interop.decls ++
    operators.Streams.decls

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-way star join + aggregate — scan, broadcast dims, shuffle agg.
    */
  def entry(spark: SparkSession): DataFrame =
    registry("join_multiway_star").query(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, v) => k -> v.query }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Decl(_, Some(sql))) => k -> sql }
}
