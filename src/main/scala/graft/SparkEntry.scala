package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (the binding operator
  * inventory) and §7 (build plan). Each §2 key is declared in exactly one
  * operator module as a `Decl(query, oracleSql)`; this object only merges
  * the registries.
  */
object SparkEntry {

  private def registry: Map[String, Decl] = {
    // Core domain modules + the build-wave aggregator (Waves checks for
    // duplicate keys; Map ++ would otherwise shadow silently). The
    // navigable key -> domain -> file:line index is REGISTRY.md
    // (regenerate with tools/registry.py).
    val core: Seq[Map[String, Decl]] = Seq(
      operators.Relational.decls,
      operators.Aggregates.decls,
      operators.Windows.decls,
      functions.Scalars.decls,
      operators.AdtQueries.decls,
      operators.Salted.decls,
      operators.Pipeline.decls,
      operators.PipelineExt.decls,
      operators.Interop.decls,
      operators.Streams.decls)
    val merged = core.reduce(_ ++ _) ++ operators.Waves.all
    val n = core.map(_.size).sum + operators.Waves.all.size
    require(merged.size == n,
      s"duplicate query keys between core modules and waves: expected $n, got ${merged.size}")
    merged
  }

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
