package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL session entry point — the surface a user of the reference DBMS
  * lands on: all fixture tables registered as views, graft's extensions
  * injected (ADT grammar, vec_dot, TopK strategy), multi-statement
  * scripts, and a catalog that survives restarts (`GraftCatalog`).
  *
  * Usage:
  *   sbt "runMain graft.Sql SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1"
  *   sbt "runMain graft.Sql -f script.sql"     # ';'-separated statements
  *   java … graft.Sql < script.sql             # stdin (sbt swallows it)
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS,
  *      SPARK_GRAFT_WAREHOUSE (default ./spark-warehouse — `CREATE TABLE t
  *      USING parquet AS …` lands there and is visible in later runs).
  */
object Sql {

  /** Split a script on top-level semicolons; quoted spans ('…', "…", `…`)
    * and comments are opaque, so literals may contain ';'. */
  def splitStatements(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    var last = 0
    val n = text.length
    while (i < n) {
      text(i) match {
        case q @ ('\'' | '"' | '`') =>
          i += 1
          while (i < n && text(i) != q) {
            // backslash escape inside string literals (Spark default mode);
            // backticked identifiers only use doubling
            if (text(i) == '\\' && q != '`' && i + 1 < n) i += 2 else i += 1
          }
          i += 1
        case '-' if i + 1 < n && text(i + 1) == '-' =>
          while (i < n && text(i) != '\n') i += 1
        case '/' if i + 1 < n && text(i + 1) == '*' =>
          i += 2
          while (i + 1 < n && !(text(i) == '*' && text(i + 1) == '/')) i += 1
          i += 2
        case ';' =>
          out += text.substring(last, i); last = i + 1; i += 1
        case _ => i += 1
      }
    }
    out += text.substring(math.min(last, n))
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val DeleteStmt =
    """(?is)^\s*DELETE\s+FROM\s+([A-Za-z_][A-Za-z_0-9]*)\s*(.*)$""".r
  private val UpdateStmt =
    """(?is)^\s*UPDATE\s+([A-Za-z_][A-Za-z_0-9]*)\s+SET\s+(.+)$""".r
  private val CreateMvStmt =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+([A-Za-z_][A-Za-z_0-9]*)\s+AS\s+(.+)$""".r
  private val RefreshMvStmt =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([A-Za-z_][A-Za-z_0-9]*)\s*;?\s*$""".r
  private val DropMvStmt =
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+([A-Za-z_][A-Za-z_0-9]*)\s*;?\s*$""".r

  /** Index of the first occurrence of keyword `kw` at paren depth 0 and
    * outside quoted spans, or -1 — a regex would match a 'where' inside a
    * string literal or subquery. */
  private[graft] def topLevelKeywordIndex(text: String, kw: String): Int = {
    var depth = 0; var i = 0
    while (i < text.length) {
      text(i) match {
        case q @ ('\'' | '"' | '`') =>
          i += 1
          while (i < text.length && text(i) != q) {
            if (text(i) == '\\' && q != '`' && i + 1 < text.length) i += 2 else i += 1
          }
          i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case c if depth == 0 && Character.toUpperCase(c) == kw.head &&
            i + kw.length <= text.length &&
            text.substring(i, i + kw.length).equalsIgnoreCase(kw) &&
            (i == 0 || !text(i - 1).isLetterOrDigit && text(i - 1) != '_') &&
            (i + kw.length == text.length ||
             !text(i + kw.length).isLetterOrDigit && text(i + kw.length) != '_') =>
          return i
        case _ => i += 1
      }
    }
    -1
  }

  /** Copy-on-write mutation of a warehouse table: compute the surviving /
    * updated rows, write them to a staging dir, swap it in, re-register.
    * This is exactly how DELETE/UPDATE work on immutable columnar storage
    * (Spark itself only supports them on v2 tables with row-level-op
    * support); the swap is not transactional — a crash between delete and
    * rename loses the table, which a production lakehouse would solve with
    * a format like the open table formats rather than bare parquet.
    */
  private def copyOnWrite(spark: SparkSession, warehouse: String, table: String)
                         (transform: DataFrame => DataFrame): DataFrame = {
    import java.nio.file.{Files, Paths}
    // Spark lowercases catalog names when laying out the warehouse — the
    // user may type any case
    val dirName = table.toLowerCase
    val dir = Paths.get(warehouse, dirName)
    require(Files.isDirectory(dir), s"no warehouse table '$table' to mutate")
    // alias to the statement's table name so qualified references
    // (`WHERE t.k = 1`) resolve
    val before = spark.read.parquet(dir.toString).alias(table)
    val after = transform(before)
    val staging = Paths.get(warehouse, s"_staging_$dirName")
    after.write.mode("overwrite").parquet(staging.toString)
    // rows_after from the parquet FOOTERS, driver-side: the footer row
    // count is exact (written by the committer that just produced the
    // files), and it replaces a whole Spark count job per mutation —
    // stream_merge_upsert pays that job once per micro-batch (round-13).
    val n = {
      import scala.jdk.CollectionConverters._
      val conf = spark.sessionState.newHadoopConf()
      Files.list(staging).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("part-") &&
                     p.getFileName.toString.endsWith(".parquet"))
        .map { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p.toUri), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum
    }
    // swap: drop the old generation, move staging into place
    GraftCatalog.deleteRecursively(dir)
    Files.move(staging, dir)
    // refresh whichever registration this session has for the name, then
    // drop the shared file-status listing (see MvMaintain.invalidateListing
    // — the same stale-listing hazard applies to every summary overwrite)
    try spark.catalog.refreshTable(table) catch { case _: Exception => () }
    graft.plans.MvMaintain.invalidateListing(spark, dir.toString)
    spark.sql(s"SELECT CAST($n AS BIGINT) AS rows_after")
  }

  /** Execute one statement; a CREATE TYPE that passes the typechecker is
    * then recorded in the persistent catalog (recording first would
    * persist ill-typed declarations). DELETE/UPDATE on warehouse tables
    * run as copy-on-write rewrites. Returns the result for rendering. */
  /** QUALIFY clause support (source-to-source, the same injection
    * altitude as the ADT grammar): Spark's parser has no QUALIFY, so a
    * top-level `... QUALIFY <pred> [ORDER BY …] [LIMIT …]` lowers to
    *
    *   SELECT * EXCEPT (__qual) FROM (
    *     SELECT __q.*, (<pred>) AS __qual FROM ( <head> ) AS __q
    *   ) WHERE __qual [ORDER BY …] [LIMIT …]
    *
    * which evaluates window functions in the predicate over the SELECT's
    * output rows — the standard QUALIFY semantics, with the documented
    * restriction that the predicate sees selected columns/aliases (not
    * dropped base columns). Subquery-level QUALIFY is out of scope: the
    * scan is depth-0 only.
    */
  private[graft] def rewriteQualify(text: String): String = {
    val qIdx = topLevelKeywordIndex(text, "QUALIFY")
    if (qIdx < 0) return text
    val head = text.substring(0, qIdx)
    val rest = text.substring(qIdx + "QUALIFY".length)
    val stops = Seq("ORDER", "LIMIT")
      .map(k => topLevelKeywordIndex(rest, k)).filter(_ >= 0)
    val cut = if (stops.isEmpty) rest.length else stops.min
    val pred = rest.substring(0, cut).trim
    val tail = rest.substring(cut)
    require(pred.nonEmpty, s"QUALIFY: empty predicate in: $text")
    s"""SELECT * EXCEPT (__qual) FROM (
       |SELECT __q.*, ($pred) AS __qual FROM ( $head ) AS __q
       |) WHERE __qual $tail""".stripMargin
  }

  /** Index just past the ')' matching the '(' at `open` (quote-aware). */
  private def matchParen(text: String, open: Int): Int = {
    var depth = 0; var i = open
    while (i < text.length) {
      text(i) match {
        case q @ ('\'' | '"' | '`') =>
          i += 1
          while (i < text.length && text(i) != q) {
            if (text(i) == '\\' && q != '`' && i + 1 < text.length) i += 2 else i += 1
          }
          i += 1
        case '(' => depth += 1; i += 1
        case ')' =>
          depth -= 1; i += 1
          if (depth == 0) return i
        case _ => i += 1
      }
    }
    throw new IllegalArgumentException(s"unbalanced parens in: $text")
  }

  /** DISTINCT ON support (source-to-source, same altitude as QUALIFY):
    * Spark's parser has no `SELECT DISTINCT ON (keys) …`, so a top-level
    * occurrence lowers to the standard row_number() window —
    *
    *   SELECT * EXCEPT (__rn) FROM (
    *     SELECT __q.*, row_number() OVER (PARTITION BY keys
    *                                      ORDER BY sorts) AS __rn
    *     FROM ( SELECT … ) AS __q
    *   ) WHERE __rn = 1 ORDER BY sorts [LIMIT …]
    *
    * An ORDER BY is REQUIRED: it is what picks the row each group keeps
    * (DuckDB/Postgres without one keep an arbitrary row — a
    * nondeterminism this engine's oracle discipline forbids). Sort keys
    * must be selected columns (the same visibility QUALIFY has); the
    * scan is depth-0 only, like QUALIFY.
    */
  private[graft] def rewriteDistinctOn(text: String): String = {
    val dIdx = topLevelKeywordIndex(text, "DISTINCT")
    if (dIdx < 0) return text
    val afterD = text.substring(dIdx + "DISTINCT".length)
    val onOff = afterD.takeWhile(_.isWhitespace).length
    val rest = afterD.substring(onOff)
    // Token must be exactly ON (next char whitespace or '('), else a select
    // item that merely starts with "on" (ontime, only_id) would misparse.
    val isOnToken = rest.length > 2 &&
      rest.substring(0, 2).equalsIgnoreCase("ON") &&
      (rest(2).isWhitespace || rest(2) == '(')
    if (!isOnToken) return text
    val openRel = afterD.indexOf('(', onOff)
    require(openRel >= 0 && afterD.substring(onOff + 2, openRel).isBlank,
      s"DISTINCT ON needs a parenthesized key list in: $text")
    val open = dIdx + "DISTINCT".length + openRel
    val close = matchParen(text, open)
    val keys = text.substring(open + 1, close - 1).trim
    require(keys.nonEmpty, s"DISTINCT ON: empty key list in: $text")
    val oIdx = topLevelKeywordIndex(text, "ORDER")
    require(oIdx > close,
      "DISTINCT ON without ORDER BY keeps an arbitrary row per group — " +
      s"add a total ORDER BY: $text")
    val limIdx = topLevelKeywordIndex(text, "LIMIT")
    val sortsEnd = if (limIdx > oIdx) limIdx else text.length
    val sorts = {
      val afterO = text.substring(oIdx + "ORDER".length, sortsEnd).trim
      require(afterO.toUpperCase.startsWith("BY"), s"expected BY after ORDER in: $text")
      afterO.substring(2).trim
    }
    val limitTail = if (limIdx > oIdx) " " + text.substring(limIdx) else ""
    val inner = text.substring(0, dIdx) + text.substring(close, oIdx)
    s"""SELECT * EXCEPT (__rn) FROM (
       |SELECT __q.*, row_number() OVER (PARTITION BY $keys ORDER BY $sorts) AS __rn
       |FROM ( $inner ) AS __q
       |) WHERE __rn = 1 ORDER BY $sorts$limitTail""".stripMargin
  }

  /** Run SQL text through the ADT-aware path: the injected parser if this
    * session has it, the source-to-source rewriter otherwise. QUALIFY and
    * DISTINCT ON lower first in both paths (neither parser knows them
    * natively). */
  private[graft] def runSql(spark: SparkSession, text: String): DataFrame = {
    val t = rewriteDistinctOn(rewriteQualify(text))
    if (spark.sessionState.sqlParser.isInstanceOf[graft.adt.AdtParser])
      spark.sql(t)
    else graft.adt.AdtSql.sql(spark, t)
  }

  def execute(spark: SparkSession, warehouse: String, stmt: String): DataFrame = {
    def rewriteExpr(text: String): String =
      graft.adt.AdtSql.rewrite(spark, text)
    def runSql(text: String): DataFrame = Sql.runSql(spark, text)
    // A WHERE-less DELETE/UPDATE is legal SQL: it touches every row. The
    // WHERE match needs a word boundary — "WHEREX > 1" must be a syntax
    // error, not a predicate on X.
    def predOf(rest: String): String = {
      val r = rest.trim.stripSuffix(";").trim
      if (r.isEmpty) "true"
      else if (r.length > 5 && r.substring(0, 5).equalsIgnoreCase("WHERE") &&
               !r(5).isLetterOrDigit && r(5) != '_')
        rewriteExpr(r.substring(5))
      else throw new IllegalArgumentException(s"expected WHERE, got: $r")
    }
    Merge.parse(stmt) match {
      case Some(spec) => return executeMerge(spark, warehouse, spec)
      case None => ()
    }
    stmt match {
      // CREATE MATERIALIZED VIEW <name> AS <aggregate query>: run the
      // defining query, persist the summary under the warehouse, and
      // register it with the MvRewrite rule — from then on matching
      // aggregates over the same base are silently served from the
      // summary (see graft.plans.MvRewrite; dims/metrics are DERIVED
      // from the defining aggregate, which must carry a count(*) column)
      case CreateMvStmt(name, query) =>
        // a re-CREATE over a registered base must not have its defining
        // query rewritten onto the OLD summary — pull the stale def first
        graft.plans.MvCatalog.forget(spark, name)
        val defn = runSql(query)
        val dir = s"$warehouse/$name"
        defn.write.mode("overwrite").parquet(dir)
        // a re-CREATE overwrites the summary dir — drop any stale listing
        // this session holds for it (same hazard as DML copy-on-write)
        graft.plans.MvMaintain.invalidateListing(spark, dir)
        val scan = spark.read.parquet(dir)
        val basePlan = graft.plans.Mv.registerFromDefinition(name, defn, scan)
        graft.plans.MvCatalog.remember(spark, name, graft.plans.MvCatalog.NamedMv(
          query, dir, basePlan,
          graft.plans.MvMaintain.manifestOf(spark, basePlan),
          graft.plans.Mv.isFullyMergeable(defn)))
        graft.plans.Mv.enable(spark)
        scan
      // REFRESH merges the base's append-only DELTA into the summary when
      // provably safe (storage-backed base, mergeable aggregates, intact
      // manifest), and falls back to a full recompute otherwise — see
      // graft.plans.MvMaintain for the contract
      case RefreshMvStmt(name) =>
        graft.plans.MvMaintain.refresh(spark, name, runSql)
      case DropMvStmt(name) =>
        graft.plans.MvCatalog.recall(spark, name).getOrElse(
          throw new IllegalArgumentException(s"unknown materialized view: $name"))
        graft.plans.MvCatalog.forget(spark, name)
        spark.range(0).toDF("dropped")
      case DeleteStmt(table, rest) =>
        val pred = predOf(rest)
        // keep rows where the predicate is NOT TRUE: a NULL-valued
        // predicate must KEEP the row (plain NOT(pred) in a filter would
        // silently delete it — NULL is not TRUE but NOT(NULL) is NULL)
        copyOnWrite(spark, warehouse, table)(
          _.filter(s"NOT coalesce(($pred), false)"))
      case UpdateStmt(table, setsAndPred) =>
        val whereIdx = topLevelKeywordIndex(setsAndPred, "WHERE")
        val (setList, pred) =
          if (whereIdx < 0) (setsAndPred.trim.stripSuffix(";"), "true")
          else (setsAndPred.substring(0, whereIdx),
                rewriteExpr(setsAndPred.substring(whereIdx + 5).trim.stripSuffix(";")))
        val sets = splitTopLevel(setList, ',').map { a =>
          a.split("=", 2) match {
            // a backticked SET target is accepted and stored unquoted
            case Array(c, e) =>
              c.trim.stripPrefix("`").stripSuffix("`") -> rewriteExpr(e).trim
            case _ => throw new IllegalArgumentException(s"bad SET assignment '$a'")
          }
        }
        // SQL rejects assigning the same column twice in one UPDATE
        val dupes = sets.groupBy(_._1.toLowerCase).filter(_._2.length > 1).keys
        require(dupes.isEmpty, s"UPDATE: column(s) assigned more than once: ${dupes.mkString(", ")}")
        copyOnWrite(spark, warehouse, table) { df =>
          // ONE projection: SQL UPDATE evaluates every SET expression
          // against the OLD row, so assignments must not see each other.
          // Column matching is case-insensitive like the rest of Spark SQL;
          // generated references are backtick-quoted so any column name works.
          val resolved = sets.map { case (c, e) =>
            df.columns.find(_.equalsIgnoreCase(c)).getOrElse(
              throw new IllegalArgumentException(s"UPDATE: no column '$c' in $table")) -> e
          }.toMap
          import org.apache.spark.sql.functions.{col, expr}
          df.select(df.columns.toIndexedSeq.map { c =>
            resolved.get(c) match {
              case Some(e) => expr(s"CASE WHEN ($pred) THEN ($e) ELSE `$c` END").as(c)
              case None => col(c)
            }
          }: _*)
        }
      case _ =>
        // A DROP VIEW that resolves to a TEMP view must not prune the
        // persistent record — the untouched catalog view survives the
        // session, so it must survive the restart too. Snapshot before
        // executing (the drop removes the evidence).
        val dropHitsTempView = GraftCatalog.dropViewName(stmt).exists { n =>
          try spark.catalog.tableExists(n) && spark.catalog.getTable(n).isTemporary
          catch { case _: Exception => false }
        }
        // the injected AdtParser handles ADT syntax inside plain spark.sql;
        // AdtSql.sql is the equivalent route for sessions without extensions
        val result = runSql(stmt)
        if (graft.adt.AdtSql.isCreateType(stmt))
          GraftCatalog.recordType(warehouse, stmt)
        else if (GraftCatalog.isCreateView(stmt))
          GraftCatalog.recordView(warehouse, stmt)
        // record only ANALYZE of WAREHOUSE tables: analyzing a fixture temp
        // view succeeds in Spark but the view won't exist at restore time,
        // and a recorded statement with no DROP path would replay (and
        // re-scan) forever
        else if (GraftCatalog.analyzeTableName(stmt).exists(n =>
                   java.nio.file.Files.isDirectory(java.nio.file.Paths.get(warehouse, n))))
          GraftCatalog.recordAnalyze(warehouse, stmt)
        else if (!dropHitsTempView)
          GraftCatalog.dropViewName(stmt).foreach(GraftCatalog.forgetView(warehouse, _))
        GraftCatalog.dropTableName(stmt).foreach(GraftCatalog.forgetTable(warehouse, _))
        result
    }
  }

  /** MERGE INTO as a copy-on-write rewrite (grammar and semantics:
    * [[Merge]]). The result set is assembled relationally from the frozen
    * before-image: untouched rows (anti join on matched ids) ∪
    * updated/kept matched rows ∪ inserted not-matched source rows.
    */
  private def executeMerge(spark: SparkSession, warehouse: String,
                           spec: Merge.MergeSpec): DataFrame =
    copyOnWrite(spark, warehouse, spec.table)(mergeResult(spark, _, spec))

  /** Assemble the MERGE result set from the before-image (pure relative to
    * the warehouse — `private[graft]` so plan gates can inspect the join
    * tree it builds without running a copy-on-write swap). */
  private[graft] def mergeResult(spark: SparkSession,
                                 before0: DataFrame,
                                 spec: Merge.MergeSpec): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit, monotonically_increasing_id}
    def rw(text: String): String = graft.adt.AdtSql.rewrite(spark, text)
    // Freeze a synthetic row id so "matched" is decided against stable
    // identities: monotonically_increasing_id is plan-dependent, and the
    // before-image is referenced by several branches below — the eager
    // checkpoint pins one assignment for all of them.
    val before = before0.withColumn("__rid", monotonically_increasing_id())
      .localCheckpoint(true).alias(spec.tableAlias)
    val tCols = before.columns.filterNot(_ == "__rid").toIndexedSeq
    def tType(c: String) = before.schema(c).dataType
    // a SET/INSERT target column may be written qualified (`t.col`) —
    // accept the target alias or table name as a prefix
    def targetCol(c: String): String = {
      val bare = Seq(s"${spec.tableAlias}.", s"${spec.table}.")
        .collectFirst { case p if c.length > p.length && c.regionMatches(true, 0, p, 0, p.length) =>
          c.substring(p.length) }
        .getOrElse(c).trim.stripPrefix("`").stripSuffix("`")
      tCols.find(_.equalsIgnoreCase(bare)).getOrElse(
        throw new IllegalArgumentException(s"MERGE: no column '$c' in ${spec.table}"))
    }
    val src = (spec.sourceSql match {
      case Left(name) => spark.table(name)
      case Right(sql) => runSql(spark, sql)
    }).alias(spec.sourceAlias)
    def cond = expr(rw(spec.cond))
    val m = before.join(src, cond) // matched (target, source) pairs
    // SQL-standard guard: a target row matching more than one source row
    // makes UPDATE/DELETE nondeterministic — error, never pick one. An
    // insert-only merge is exempt (no matched action exists, so multiple
    // matches are harmless and legal).
    if (spec.matched.isDefined) {
      val dup = m.groupBy(col("__rid")).count()
        .filter(col("count") > 1).limit(1).count()
      require(dup == 0,
        s"MERGE: a ${spec.table} row matches more than one source row")
    }
    // qualified reference to the TARGET side of the join (source may
    // share column names)
    def tRef(c: String) = col(s"${spec.tableAlias}.`$c`")
    val survivors = spec.matched match {
      case None =>
        // no matched action: every target row survives unchanged
        before.select(tCols.map(c => col(s"`$c`")): _*)
      case Some(action) =>
        val matchedRids = m.select(col("__rid"))
        val untouched = before.join(matchedRids, Seq("__rid"), "left_anti")
          .select(tCols.map(c => col(s"`$c`")): _*)
        action match {
          case Merge.DeleteAction => untouched
          case Merge.UpdateAction(sets) =>
            val resolved = sets.map { case (c, e) => targetCol(c) -> rw(e) }
            val dupes = resolved.groupBy(_._1).filter(_._2.length > 1).keys
            require(dupes.isEmpty,
              s"MERGE: column(s) assigned more than once: ${dupes.mkString(", ")}")
            // ONE projection over the joined pair: every SET expression sees
            // the OLD target row and the source row (SQL UPDATE semantics)
            val rmap = resolved.toMap
            val updated = m.select(tCols.map { c =>
              rmap.get(c) match {
                case Some(e) => expr(e).cast(tType(c)).as(c)
                case None => tRef(c).as(c)
              }
            }: _*)
            untouched.unionAll(updated)
        }
    }
    spec.notMatched match {
      case None => survivors
      case Some(ins) =>
        val anti = src.join(before, cond, "left_anti")
        val inserted = ins.colsValues match {
          case None => // INSERT *: source columns matched by name
            anti.select(tCols.map { c =>
              src.columns.find(_.equalsIgnoreCase(c)) match {
                case Some(sc) => col(s"`$sc`").cast(tType(c)).as(c)
                case None => lit(null).cast(tType(c)).as(c)
              }
            }: _*)
          case Some((cols, values)) =>
            val vmap = cols.zip(values).map { case (c, v) => targetCol(c) -> v }.toMap
            require(vmap.size == cols.size,
              s"MERGE: duplicate insert column in (${cols.mkString(", ")})")
            anti.select(tCols.map { c =>
              vmap.get(c) match {
                case Some(v) => expr(rw(v)).cast(tType(c)).as(c)
                case None => lit(null).cast(tType(c)).as(c)
              }
            }: _*)
        }
        survivors.unionAll(inserted)
    }
  }

  /** Split on a separator at paren/quote depth zero. */
  private[graft] def splitTopLevel(text: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var last = 0; var i = 0
    while (i < text.length) {
      text(i) match {
        case q @ ('\'' | '"' | '`') =>
          i += 1
          while (i < text.length && text(i) != q) {
            if (text(i) == '\\' && q != '`' && i + 1 < text.length) i += 2 else i += 1
          }
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if c == sep && depth == 0 =>
          out += text.substring(last, i); last = i + 1
        case _ =>
      }
      i += 1
    }
    out += text.substring(last)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def render(spark: SparkSession, df: DataFrame): Unit = {
    // Execute ONCE: limit+collect instead of count()-then-show(), which
    // would run the query (and any side effects) twice.
    val rows = df.limit(1001).collect()
    if (rows.isEmpty && df.schema.isEmpty) println("ok")
    else {
      val shown = rows.take(1000)
      spark.createDataFrame(
        java.util.Arrays.asList(shown: _*), df.schema).show(1000, truncate = false)
      if (rows.length > 1000) println("(more than 1000 rows; showing first 1000)")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warehouse = sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "spark-warehouse")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.ui.enabled", "false")
      // cost-based optimization: ANALYZE TABLE statistics (persisted by
      // GraftCatalog, replayed on restore) feed join reordering and better
      // broadcast decisions — at 100 TB, stats-driven planning is the
      // difference between a broadcast and a sort-merge of a dimension.
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      // JVM case mappings — skips ICU's one-time static-init stall, same
      // results on this data (see Tables.apply).
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.views(spark, sfDir)
    val (tables, types) = GraftCatalog.restore(spark, warehouse)
    if (tables.nonEmpty) println(s"restored tables: ${tables.mkString(", ")}")
    if (types.nonEmpty) println(s"restored types: ${types.mkString(", ")}")
    val script = args match {
      case Array("-f", path) =>
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      case a if a.nonEmpty => a.mkString(" ")
      case _ => scala.io.Source.stdin.mkString
    }
    val statements = splitStatements(script)
    require(statements.nonEmpty, "usage: graft.Sql <statements> (or pipe SQL on stdin)")
    statements.foreach { stmt =>
      try render(spark, execute(spark, warehouse, stmt))
      catch { case e: Exception =>
        val msg = Option(e.getMessage).getOrElse(e.toString)
        println(s"error: ${msg.linesIterator.take(3).mkString(" ")}")
      }
    }
    spark.stop()
  }
}
