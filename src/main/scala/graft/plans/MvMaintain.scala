package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, View}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, max => smax, min => smin, sum => ssum}

/** Incremental maintenance of DDL materialized views.
  *
  * `REFRESH MATERIALIZED VIEW` merges the DELTA of the base table into
  * the stored summary instead of recomputing history, whenever that is
  * provably safe:
  *
  *   - the defining query's FROM resolves (through name-only wrappers)
  *     to ONE plain, unpartitioned parquet relation — the "storage-backed
  *     base" contract; derived views fall back to full recompute;
  *   - every output of the defining aggregate is a grouping pass-through
  *     or a mergeable aggregate (count(const)/sum/min/max — exactly the
  *     classes whose partial states re-aggregate losslessly);
  *   - the base changed APPEND-ONLY since the last refresh: every file in
  *     the recorded manifest is still present with the same length and
  *     mtime. A rewritten/deleted file (copy-on-write DML) voids the
  *     delta reasoning and forces the full path.
  *
  * The incremental path re-runs the defining query over ONLY the new
  * files (the base view name is temporarily rebound to a delta scan and
  * restored afterwards), then re-aggregates `old summary ∪ delta
  * partials` — sum-of-counts / sum-of-sums / min-of-mins / max-of-maxs,
  * the sink_incremental_agg losslessness. Cost: O(|delta| + |summary|),
  * never O(|history|).
  *
  * 100 TB shape: THE difference between a usable and a decorative MV
  * subsystem — a day's append re-aggregates in seconds while the
  * summary's history stays untouched. A production lakehouse would read
  * the delta off a table-format transaction log instead of a directory
  * manifest; the manifest is the bare-parquet equivalent of that log.
  */
object MvMaintain {

  /** The single plain parquet relation a storage-backed base resolves
    * to, or None (derived view / join / partitioned source → full
    * recompute). Returns (FROM-name, relation).
    */
  private def storageBacked(base: LogicalPlan): Option[(String, HadoopFsRelation)] = {
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case v: View => strip(v.child)
      case other => other
    }
    base match {
      case SubqueryAlias(id, child) =>
        strip(child) match {
          case lr: LogicalRelation =>
            lr.relation match {
              case hfs: HadoopFsRelation
                  if hfs.fileFormat.isInstanceOf[
                       org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] &&
                     hfs.partitionSchema.isEmpty &&
                     hfs.location.rootPaths.length == 1 =>
                Some(id.name -> hfs)
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
  }

  /** Current data files under `root`: path → (length, mtime). Driver-side
    * listing of ONE directory — the manifest granularity. */
  private[graft] def listDataFiles(spark: SparkSession,
                                   root: String): Map[String, (Long, Long)] = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).iterator
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(st => st.getPath.toString -> (st.getLen, st.getModificationTime))
      .toMap
  }

  /** Manifest of the base data files the summary was COMPUTED FROM — the
    * relation's own (frozen) FileIndex listing, NOT the live directory: a
    * file appended after the view's listing but before CREATE was not
    * read by the defining query, so it must show up as REFRESH delta, not
    * be silently marked covered. Empty when the base is not
    * storage-backed (incremental refresh then never applies). */
  private[graft] def manifestOf(spark: SparkSession,
                                base: LogicalPlan): Map[String, (Long, Long)] =
    storageBacked(base) match {
      case Some((_, hfs)) =>
        hfs.location match {
          case p: org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex =>
            p.allFiles().iterator
              .map(st => st.getPath.toString -> (st.getLen, st.getModificationTime))
              .toMap
          case _ => listDataFiles(spark, hfs.location.rootPaths.head.toString)
        }
      case None => Map.empty
    }

  /** Stage-and-swap a freshly computed summary into `dir`, then drop every
    * stale listing this session may hold for it. */
  private def swapIn(spark: SparkSession, df: DataFrame, dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    val target = Paths.get(dir)
    val staging = Paths.get(dir + "_staging")
    df.write.mode("overwrite").parquet(staging.toString)
    graft.GraftCatalog.deleteRecursively(target)
    Files.move(staging, target)
    invalidateListing(spark, dir)
  }

  /** Drop any cached file listing for `dir`: refreshByPath recaches
    * cached DATASETS, but the shared FileStatusCache still serves the OLD
    * listing to any path read before the mutation (a pre-mutation reader
    * then sees deleted part files). The cache object is private[sql], so
    * invalidate via reflection — version-pinned jars make this stable,
    * and failing soft keeps the statement working even if the internal
    * moves. Shared by DML copy-on-write and every MV summary write.
    */
  private[graft] def invalidateListing(spark: SparkSession, dir: String): Unit = {
    spark.catalog.refreshByPath(dir)
    try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.datasources.FileStatusCache$")
      val module = cls.getField("MODULE$").get(null)
      val get = cls.getMethods.find(_.getName == "getOrCreate").get
      val cache = get.invoke(module, spark)
      cache.getClass.getMethod("invalidateAll").invoke(cache)
    } catch { case e: Exception =>
      System.err.println(s"[sql] file-status cache invalidation failed: $e")
    }
  }

  /** REFRESH MATERIALIZED VIEW `name`: incremental merge when the
    * append-only/mergeable/storage-backed conditions hold, full recompute
    * otherwise. `runSql` is the session's statement runner (ADT-aware).
    * Returns the refreshed summary scan.
    */
  def refresh(spark: SparkSession, name: String,
              runSql: String => DataFrame): DataFrame = {
    val nm = MvCatalog.recall(spark, name).getOrElse(
      throw new IllegalArgumentException(s"unknown materialized view: $name"))
    val mvDef = MvCatalog.all(spark).find(_.owner.contains(name))
    // unregister BEFORE recomputing: otherwise the defining query is
    // itself rewritten onto the stale summary and the refresh rebuilds
    // the MV from itself (caught by the lifecycle spec)
    MvCatalog.forget(spark, name)

    def fullRecompute(): DataFrame = {
      val defn = runSql(nm.sql)
      swapIn(spark, defn, nm.dir)
      val scan = spark.read.parquet(nm.dir)
      val basePlan = Mv.registerFromDefinition(name, defn, scan)
      MvCatalog.remember(spark, name, MvCatalog.NamedMv(
        nm.sql, nm.dir, basePlan, MvMaintain.manifestOf(spark, basePlan),
        nm.mergeable))
      scan
    }

    val incremental = for {
      d <- mvDef
      if nm.mergeable && nm.manifest.nonEmpty
      (viewName, hfs) <- storageBacked(nm.base)
      current = listDataFiles(spark, hfs.location.rootPaths.head.toString)
      // append-only: every manifest file still present and unchanged
      if nm.manifest.forall { case (p, meta) => current.get(p).contains(meta) }
    } yield {
      val deltaFiles = (current.keySet -- nm.manifest.keySet).toSeq.sorted
      if (deltaFiles.isEmpty) {
        // nothing new — re-register over the unchanged summary
        val scan = spark.read.parquet(nm.dir)
        val defn = runSql(nm.sql)
        val basePlan = Mv.registerFromDefinition(name, defn, scan)
        MvCatalog.remember(spark, name,
          MvCatalog.NamedMv(nm.sql, nm.dir, basePlan, current, nm.mergeable))
        scan
      } else {
        // Rebind the base view to a scan of ONLY the new files, run the
        // defining query over it (= delta partial states), restore the
        // binding, merge. The rebound relation has fresh exprIds, so no
        // other registered MV can match (and this one is forgotten).
        val prior = spark.table(viewName)
        val deltaPartials =
          try {
            val deltaScan = spark.read.schema(hfs.dataSchema).parquet(deltaFiles: _*)
            deltaScan.createOrReplaceTempView(viewName)
            // materialize NOW (while the rebinding is in place): the
            // local checkpoint pins the partials so the later merge job
            // cannot lazily re-resolve the view after it is restored
            runSql(nm.sql).localCheckpoint(true)
          } finally prior.createOrReplaceTempView(viewName)
        val old = spark.read.parquet(nm.dir)
        val merged = mergeSummaries(old, deltaPartials, d)
        swapIn(spark, merged, nm.dir)
        val scan = spark.read.parquet(nm.dir)
        val defn = runSql(nm.sql)
        val basePlan = Mv.registerFromDefinition(name, defn, scan)
        MvCatalog.remember(spark, name,
          MvCatalog.NamedMv(nm.sql, nm.dir, basePlan, current, nm.mergeable))
        scan
      }
    }
    incremental.getOrElse(fullRecompute())
  }

  /** old ∪ delta, re-aggregated per dimension cell: counts and sums add,
    * mins/maxes idempotently combine — lossless because every partial
    * state is itself the aggregate's own type (the integer-sufficient-
    * statistics discipline). Column order preserved from the stored
    * summary so the swapped-in file is schema-identical. */
  private def mergeSummaries(old: DataFrame, delta: DataFrame,
                             d: MvCatalog.MvDef): DataFrame =
    mergePartials(old, delta, old.columns.filter(d.dims.contains).toSeq,
                  d.sumMap.values.toSet + d.countCol,
                  d.minMap.values.toSet, d.maxMap.values.toSet)

  /** The raw partial-state merge — also the per-micro-batch maintenance
    * step of a STREAMING materialized view (stream_mv_maintain):
    * old ∪ delta → one groupBy over the dimension cells. */
  def mergePartials(old: DataFrame, delta: DataFrame, dims: Seq[String],
                    sums: Set[String], mins: Set[String],
                    maxs: Set[String]): DataFrame = {
    val aggs = old.columns.filterNot(dims.contains).toSeq.map { c =>
      if (sums.contains(c)) ssum(col(c)).as(c)
      else if (mins.contains(c)) smin(col(c)).as(c)
      else if (maxs.contains(c)) smax(col(c)).as(c)
      else throw new IllegalStateException(
        s"non-mergeable summary column '$c' on the incremental path")
    }
    old.unionByName(delta)
      .groupBy(dims.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(old.columns.map(col).toIndexedSeq: _*)
  }
}
