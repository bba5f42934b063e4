package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Filesystem-persistent catalog for the SQL session (`graft.Sql`) — the
  * reference is a client/server DBMS whose tables, views and type
  * declarations survive a restart; Spark's `InMemoryCatalog` forgets all
  * of them at JVM exit. Persistence here is metastore-free and derives
  * everything from the warehouse directory itself:
  *
  *  - tables: `CREATE TABLE t USING parquet AS …` writes
  *    `<warehouse>/t/` (stock Spark behavior); on startup every table
  *    directory found in the warehouse is re-registered as an external
  *    catalog table — parquet is self-describing, so no schema store is
  *    needed. This is exactly how a 100 TB lakehouse catalog works: the
  *    data layout IS the source of truth, metadata is derived. DROP TABLE
  *    through the session also removes the directory, so a dropped table
  *    cannot resurrect on the next restart.
  *  - ADT types and persistent views: each statement is recorded
  *    (newline-escaped, one per line, IN PLACE so creation order — and
  *    therefore view dependency order — is preserved) in
  *    `<warehouse>/_graft_types.sql` / `_graft_views.sql` and replayed on
  *    startup. DROP VIEW prunes the record.
  */
object GraftCatalog {

  private def typesFile(warehouse: String): Path =
    Paths.get(warehouse, "_graft_types.sql")
  private def viewsFile(warehouse: String): Path =
    Paths.get(warehouse, "_graft_views.sql")
  private def statsFile(warehouse: String): Path =
    Paths.get(warehouse, "_graft_stats.sql")

  // ---------------------------------------------------------- statements

  // An identifier: bare word or backticked (possibly qualified: a.b)
  private val Ident = """(?:`[^`]+`|[A-Za-z_][A-Za-z_0-9]*)(?:\s*\.\s*(?:`[^`]+`|[A-Za-z_][A-Za-z_0-9]*))*"""
  private val CreateView =
    s"""(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?VIEW\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?($Ident).*""".r
  private val CreateViewIfNotExists =
    s"""(?is)^\\s*CREATE\\s+VIEW\\s+IF\\s+NOT\\s+EXISTS\\s+.*""".r
  private val DropView =
    s"""(?is)^\\s*DROP\\s+VIEW\\s+(?:IF\\s+EXISTS\\s+)?($Ident)\\s*;?\\s*$$""".r
  private val DropTable =
    s"""(?is)^\\s*DROP\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?($Ident)(?:\\s+PURGE)?\\s*;?\\s*$$""".r
  private val AnalyzeStmt =
    s"""(?is)^\\s*ANALYZE\\s+TABLE\\s+($Ident)\\s+COMPUTE\\s+STATISTICS.*""".r

  /** Canonical comparison form of an identifier: backticks stripped,
    * lowercased (Spark resolution is case-insensitive by default). */
  private def canonName(raw: String): String =
    raw.split("\\.").map(_.trim.stripPrefix("`").stripSuffix("`")).mkString(".").toLowerCase

  /** Is this statement a persistent view definition? (TEMPORARY views are
    * session-scoped by SQL semantics and are deliberately NOT recorded.) */
  def isCreateView(stmt: String): Boolean = CreateView.matches(stmt)

  private def viewName(stmt: String): Option[String] = stmt match {
    case CreateView(name) => Some(canonName(name))
    case _ => None
  }

  /** The dropped view's name, if the statement is a DROP VIEW. */
  def dropViewName(stmt: String): Option[String] = stmt match {
    case DropView(name) => Some(canonName(name))
    case _ => None
  }

  /** The dropped table's name, if the statement is a DROP TABLE. */
  def dropTableName(stmt: String): Option[String] = stmt match {
    case DropTable(name) => Some(canonName(name))
    case _ => None
  }

  /** The analyzed table's name, if the statement is an ANALYZE TABLE …
    * COMPUTE STATISTICS. */
  def analyzeTableName(stmt: String): Option[String] = stmt match {
    case AnalyzeStmt(name) => Some(canonName(name))
    case _ => None
  }

  // ---------------------------------------------- one-statement-per-line

  // Statements are stored one per line; newlines (and the escape char)
  // inside the statement — INCLUDING inside string literals, which a
  // whitespace-collapse would silently corrupt — survive via escaping.
  private def encode(stmt: String): String =
    stmt.replace("\\", "\\\\").replace("\r", "\\r").replace("\n", "\\n").trim
  private def decode(line: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < line.length) {
      if (line(i) == '\\' && i + 1 < line.length) {
        line(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case c => sb.append('\\').append(c); i += 2
        }
      } else { sb.append(line(i)); i += 1 }
    }
    sb.toString
  }

  private def readStatements(f: Path): Seq[String] =
    if (!Files.exists(f)) Seq.empty
    else Files.readAllLines(f).asScala.toSeq.filter(_.trim.nonEmpty).map(decode)

  /** Record `stmt` keyed by `name`: replace an existing definition IN
    * PLACE (preserving creation order — replaying views out of creation
    * order would break dependents), else append. */
  private def upsert(f: Path, name: String, stmt: String,
                     nameOf: String => Option[String]): Unit = {
    Files.createDirectories(f.getParent)
    val existing = readStatements(f)
    val replaced =
      if (existing.exists(nameOf(_).contains(name)))
        existing.map(s => if (nameOf(s).contains(name)) stmt else s)
      else existing :+ stmt
    Files.write(f, replaced.map(encode).mkString("\n").getBytes)
  }

  private def remove(f: Path, name: String, nameOf: String => Option[String]): Unit =
    if (Files.exists(f))
      Files.write(f, readStatements(f).filterNot(nameOf(_).contains(name))
        .map(encode).mkString("\n").getBytes)

  // -------------------------------------------------------------- public

  /** Re-register persisted tables, types and views into a fresh session.
    * Returns the restored (table, type) names for the session banner.
    */
  def restore(spark: SparkSession, warehouse: String): (Seq[String], Seq[String]) = {
    val wh = Paths.get(warehouse)
    val tables =
      if (!Files.isDirectory(wh)) Seq.empty
      else {
        val listing = Files.list(wh)
        val dirs =
          try listing.iterator().asScala
            .filter(Files.isDirectory(_))
            .map(_.getFileName.toString)
            .filterNot(_.startsWith("_")).toSeq
          finally listing.close()
        dirs.flatMap { name =>
          try {
            // a REAL (external) catalog table, not a temp view: INSERT INTO
            // then appends parquet files at the table location, so the
            // mutation surface works on restored tables too
            spark.catalog.createTable(name, s"$warehouse/$name", "parquet")
            // a fixture temp view of the same name would shadow the user's
            // saved table — the saved table wins, as it did pre-restart
            try spark.catalog.dropTempView(name) catch { case _: Exception => () }
            Some(name)
          } catch {
            case _: org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException =>
              Some(name) // same-session re-restore
            case _: Exception => None // not a table dir — skip
          }
        }.sorted
      }
    val types = readStatements(typesFile(warehouse)).flatMap { stmt =>
      try Some(graft.adt.AdtSql.createType(spark, stmt).name)
      catch { case _: Exception => None }
    }
    // views replay AFTER tables and types (they may reference both), in
    // creation order (upsert preserves it); a view whose dependencies
    // vanished is skipped, not fatal
    readStatements(viewsFile(warehouse)).foreach { stmt =>
      try graft.adt.AdtSql.sql(spark, stmt)
      catch { case _: Exception => () }
    }
    // statistics replay LAST (they target restored tables). The catalog is
    // metastore-free, so the only way stats survive a restart is re-running
    // the recorded ANALYZE — a re-scan of the table, the price of deriving
    // all metadata from storage. The last ANALYZE per table is what replays
    // (upsert keyed by table name); a table whose ANALYZE fails is skipped,
    // not fatal.
    readStatements(statsFile(warehouse)).foreach { stmt =>
      try spark.sql(stmt)
      catch { case _: Exception => () }
    }
    (tables, types)
  }

  /** Record an ANALYZE TABLE statement durably so column/table statistics
    * survive a restart (callers record only AFTER the statement executed —
    * an ANALYZE against a missing table must not replay forever). */
  def recordAnalyze(warehouse: String, stmt: String): Unit = {
    val name = analyzeTableName(stmt).getOrElse(
      throw new IllegalArgumentException(s"not an ANALYZE TABLE statement: $stmt"))
    upsert(statsFile(warehouse), name, stmt.trim, analyzeTableName)
  }

  /** Record a CREATE VIEW statement durably. An IF NOT EXISTS statement
    * is a no-op in Spark when the view already exists — overwriting the
    * record then would make the restored catalog diverge from the session
    * state, so an existing record wins. */
  def recordView(warehouse: String, stmt: String): Unit = {
    val name = viewName(stmt).getOrElse(
      throw new IllegalArgumentException(s"not a CREATE VIEW statement: $stmt"))
    val alreadyRecorded =
      readStatements(viewsFile(warehouse)).exists(viewName(_).contains(name))
    if (!(alreadyRecorded && CreateViewIfNotExists.matches(stmt)))
      upsert(viewsFile(warehouse), name, stmt.trim, viewName)
  }

  /** Forget a dropped view so it cannot replay after restart. */
  def forgetView(warehouse: String, name: String): Unit =
    remove(viewsFile(warehouse), canonName(name), viewName)

  /** Delete a dropped table's warehouse directory so it cannot resurrect
    * on the next restore (DROP TABLE on the external registration only
    * removes metadata); its recorded statistics go with it. */
  def forgetTable(warehouse: String, name: String): Unit = {
    deleteRecursively(Paths.get(warehouse, canonName(name)))
    remove(statsFile(warehouse), canonName(name), analyzeTableName)
  }

  /** Recursive delete with the walk stream closed (the JDK leaks a
    * directory fd otherwise). No-op on a missing path. */
  private[graft] def deleteRecursively(dir: Path): Unit =
    if (Files.isDirectory(dir)) {
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }

  /** Record a CREATE TYPE statement durably (callers record only AFTER
    * the statement passed the typechecker — an ill-typed declaration must
    * not be replayed forever). */
  def recordType(warehouse: String, stmt: String): Unit = {
    val name = graft.adt.AdtSql.createTypeName(stmt.trim).map(_.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"not a CREATE TYPE statement: $stmt"))
    upsert(typesFile(warehouse), name, stmt.trim,
      s => graft.adt.AdtSql.createTypeName(s).map(_.toLowerCase))
  }
}
