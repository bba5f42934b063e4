package graft.operators

import graft.{Decl, Tables}
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Round-10 wave 64: streaming cardinality (sliding-window HLL distinct
  * users — the dashboard number exact distinct can't provide without
  * unbounded state) and the table-statistics surface (ANALYZE TABLE →
  * catalog statistics → the optimizer's cost model).
  *
  * Scale shape: the HLL window state is a few KB per open window and
  * merges associatively across partitions and micro-batches; ANALYZE is
  * one scan per table and the stats it writes are exactly what CBO's
  * join-reorder reads at planning time.
  */
object Round11h {

  val decls: Map[String, Decl] = Map(
    // Sliding distinct-users estimate. Oracle-N (sketch class: DuckDB's
    // approx_count_distinct runs a different sketch, so cross-engine
    // hash equality is impossible BY DESIGN); Round11hSpec pins
    // stream==batch sketch equality over MemoryStream and the ±5% error
    // bound against exact distinct per window.
    "stream_sliding_distinct" -> Decl(
      (s, d) => StreamOps.slidingDistinct(Tables.events(s, d))
        .orderBy("wstart"),
      None),

    // ANALYZE TABLE ... COMPUTE STATISTICS: persist three fixture slices
    // as catalog tables, analyze them, and read the ROW COUNTS back from
    // the catalog statistics (not from the data — the query's scan-free
    // path). The oracle recomputes the same counts from the base tables:
    // equality proves ANALYZE counted exactly. sizeInBytes/CBO wiring is
    // asserted in Round11hSpec.
    "sink_analyze_table_stats" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_stats")
        val tag = dir.getFileName.toString.filter(_.isDigit)
        val specs = Seq(
          ("region", s"stat_region_$tag"),
          ("nation", s"stat_nation_$tag"),
          ("supplier", s"stat_supplier_$tag"))
        val rows = specs.map { case (src, t) =>
          Tables(s, d, src).write.mode("overwrite")
            .option("path", dir.resolve(t).toString).saveAsTable(t)
          s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
          // the catalog is where ANALYZE persists; plan-level rowCount
          // additionally needs spark.sql.cbo.enabled (spec covers that)
          val meta = s.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(t))
          val n = meta.stats.flatMap(_.rowCount).map(_.longValue)
            .getOrElse(sys.error(s"ANALYZE left no rowCount for $t"))
          (src, n)
        }
        import s.implicits._
        rows.toDF("table_name", "analyzed_rows").orderBy("table_name")
      },
      Some("""SELECT table_name, CAST(n AS BIGINT) AS analyzed_rows FROM (
             |  SELECT 'region' AS table_name, count(*) AS n FROM region
             |  UNION ALL
             |  SELECT 'nation', count(*) FROM nation
             |  UNION ALL
             |  SELECT 'supplier', count(*) FROM supplier)
             |ORDER BY table_name""".stripMargin))
  )
}
