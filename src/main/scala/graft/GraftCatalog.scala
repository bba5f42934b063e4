package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Filesystem-persistent catalog for the SQL session (`graft.Sql`) — the
  * reference is a client/server DBMS whose tables and type declarations
  * survive a restart; Spark's `InMemoryCatalog` forgets both at JVM exit.
  * Persistence here is metastore-free and derives everything from the
  * warehouse directory itself:
  *
  *  - tables: `CREATE TABLE t USING parquet AS …` writes
  *    `<warehouse>/t/` (stock Spark behavior); on startup every table
  *    directory found in the warehouse is re-registered as a view —
  *    parquet is self-describing, so no schema store is needed. This is
  *    exactly how a 100 TB lakehouse catalog works: the data layout IS
  *    the source of truth, metadata is derived.
  *  - ADT types: each `CREATE TYPE` statement is appended (latest per
  *    type name wins) to `<warehouse>/_graft_types.sql` and replayed into
  *    `AdtSql`'s session registry on startup.
  */
object GraftCatalog {

  private def typesFile(warehouse: String): Path =
    Paths.get(warehouse, "_graft_types.sql")
  private def viewsFile(warehouse: String): Path =
    Paths.get(warehouse, "_graft_views.sql")

  private val CreateView =
    """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+([A-Za-z_][A-Za-z_0-9]*)\b.*""".r

  /** Is this statement a persistent view definition? (TEMPORARY views are
    * session-scoped by SQL semantics and are deliberately NOT recorded.) */
  def isCreateView(stmt: String): Boolean = CreateView.matches(stmt)

  private def viewName(stmt: String): Option[String] = stmt match {
    case CreateView(name) => Some(name)
    case _ => None
  }

  /** Re-register persisted tables and types into a fresh session.
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
            // mutation surface the contract keeps (batch-append) works on
            // restored tables too
            spark.catalog.createTable(name, s"$warehouse/$name", "parquet")
            Some(name)
          } catch {
            case _: org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException =>
              Some(name) // same-session re-restore
            case _: Exception => None // not a table dir — skip
          }
        }.sorted
      }
    val types =
      if (!Files.exists(typesFile(warehouse))) Seq.empty
      else Files.readAllLines(typesFile(warehouse)).asScala.toSeq
        .map(_.trim).filter(_.nonEmpty)
        .flatMap { stmt =>
          try Some(graft.adt.AdtSql.createType(spark, stmt).name)
          catch { case _: Exception => None }
        }
    // views replay AFTER tables and types (they may reference both); a view
    // whose dependencies vanished is skipped, not fatal
    if (Files.exists(viewsFile(warehouse)))
      Files.readAllLines(viewsFile(warehouse)).asScala
        .map(_.trim).filter(_.nonEmpty)
        .foreach { stmt =>
          try graft.adt.AdtSql.sql(spark, stmt)
          catch { case _: Exception => () }
        }
    (tables, types)
  }

  /** Record a CREATE VIEW statement durably (latest per view name wins). */
  def recordView(warehouse: String, stmt: String): Unit = {
    val oneLine = stmt.replaceAll("\\s+", " ").trim
    val name = viewName(oneLine).getOrElse(
      throw new IllegalArgumentException(s"not a CREATE VIEW statement: $stmt"))
    val f = viewsFile(warehouse)
    Files.createDirectories(f.getParent)
    val kept =
      if (Files.exists(f))
        Files.readAllLines(f).asScala.toSeq.filterNot(l => l.trim.isEmpty ||
          viewName(l).exists(_.equalsIgnoreCase(name)))
      else Seq.empty
    Files.write(f, (kept :+ oneLine).mkString("\n").getBytes)
  }

  /** Record a CREATE TYPE statement durably (replacing any earlier
    * declaration of the same type name). Callers record only AFTER the
    * statement passed the typechecker — an ill-typed declaration must not
    * be replayed forever. */
  def recordType(warehouse: String, stmt: String): Unit = {
    val oneLine = stmt.replaceAll("\\s+", " ").trim
    val name = graft.adt.AdtSql.createTypeName(oneLine).getOrElse(
      throw new IllegalArgumentException(s"not a CREATE TYPE statement: $stmt"))
    val f = typesFile(warehouse)
    Files.createDirectories(f.getParent)
    val kept =
      if (Files.exists(f))
        Files.readAllLines(f).asScala.toSeq.filterNot(l => l.trim.isEmpty ||
          graft.adt.AdtSql.createTypeName(l).exists(_.equalsIgnoreCase(name)))
      else Seq.empty
    Files.write(f, (kept :+ oneLine).mkString("\n").getBytes)
  }
}
