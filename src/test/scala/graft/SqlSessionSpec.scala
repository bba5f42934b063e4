package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The long-lived SQL session surface: multi-statement scripts, and a
  * catalog (tables + ADT types) that survives a session restart via the
  * warehouse filesystem (`GraftCatalog`) — the reference is a DBMS whose
  * CREATE TABLE / CREATE TYPE persist; this proves ours do too, with a
  * real stop-and-recreate of the SparkSession.
  */
class SqlSessionSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def freshSession(warehouse: String): SparkSession = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("splitStatements respects quotes and comments") {
    assert(Sql.splitStatements("SELECT 1; SELECT 2") == Seq("SELECT 1", "SELECT 2"))
    assert(Sql.splitStatements("SELECT 'a;b' AS x") == Seq("SELECT 'a;b' AS x"))
    assert(Sql.splitStatements("SELECT 1 -- trailing; not a split\n; SELECT 2;") ==
      Seq("SELECT 1 -- trailing; not a split", "SELECT 2"))
    assert(Sql.splitStatements("/* c1; */ SELECT 1;;") == Seq("/* c1; */ SELECT 1"))
  }

  test("tables and types persist across a session restart") {
    val warehouse = Tables.scratchDir("graft_wh").toString

    // session 1: create a table and a type through the session surface
    val s1 = freshSession(warehouse)
    Tables(s1, sf, "region").createOrReplaceTempView("region")
    Sql.execute(s1, warehouse,
      "CREATE TYPE Status = Ok | Err(msg TEXT)")
    Sql.execute(s1, warehouse,
      "CREATE TABLE saved_regions USING parquet AS SELECT r_regionkey, r_name FROM region")
      .collect()
    val expected = Tables(s1, sf, "region").count()

    // session 2: a genuinely new SparkSession; no fixture views registered —
    // everything must come back from the warehouse alone
    val s2 = freshSession(warehouse)
    val (tables, types) = GraftCatalog.restore(s2, warehouse)
    assert(tables.contains("saved_regions"), s"restored: $tables")
    assert(types.contains("Status"), s"restored types: $types")
    assert(s2.sql("SELECT count(*) AS n FROM saved_regions").head.getLong(0) == expected)
    // the replayed type is immediately usable in MATCH through plain SQL
    val m = s2.sql(
      "SELECT MATCH (Status.Err('boom')) WHEN Ok THEN 'fine' WHEN Err(m) THEN m END AS r")
    assert(m.head.getString(0) == "boom")

    // restored tables are REAL catalog tables: INSERT INTO appends at the
    // warehouse location, and a third session sees the appended row
    s2.sql("INSERT INTO saved_regions VALUES (99, 'APPENDED')")
    assert(s2.sql("SELECT count(*) AS n FROM saved_regions").head.getLong(0) == expected + 1)
    // a persistent VIEW (here one using the replayed ADT type) survives too
    Sql.execute(s2, warehouse,
      """CREATE VIEW region_states AS
        |SELECT r_regionkey,
        |  MATCH (Status.Err(r_name)) WHEN Ok THEN 'ok' WHEN Err(m) THEN m END AS st
        |FROM saved_regions""".stripMargin)
    val s3 = freshSession(warehouse)
    GraftCatalog.restore(s3, warehouse)
    assert(s3.sql("SELECT r_name FROM saved_regions WHERE r_regionkey = 99")
      .head.getString(0) == "APPENDED")
    assert(s3.sql("SELECT st FROM region_states WHERE r_regionkey = 99")
      .head.getString(0) == "APPENDED")
  }

  test("DELETE and UPDATE run as copy-on-write rewrites on warehouse tables") {
    val warehouse = Tables.scratchDir("graft_mut").toString
    val s1 = freshSession(warehouse)
    Tables(s1, sf, "region").createOrReplaceTempView("region")
    Sql.execute(s1, warehouse,
      "CREATE TABLE mut USING parquet AS SELECT CAST(r_regionkey AS BIGINT) AS k, r_name AS v FROM region")
    // UPDATE: both assignments must read the OLD row (v gets old k's text)
    val up = Sql.execute(s1, warehouse,
      "UPDATE mut SET v = 'k' || CAST(k AS STRING), k = k + 100 WHERE k >= 3")
    assert(up.head.getLong(0) == 5) // rows_after
    val rows = s1.sql("SELECT k, v FROM mut ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.count(_._1 >= 100) == 2)
    assert(rows.contains((103L, "k3")) && rows.contains((104L, "k4")), rows.toSeq)
    val del = Sql.execute(s1, warehouse, "DELETE FROM mut WHERE k >= 100")
    assert(del.head.getLong(0) == 3)
    // the mutation is durable: a fresh session sees the post-mutation table
    val s2 = freshSession(warehouse)
    GraftCatalog.restore(s2, warehouse)
    assert(s2.sql("SELECT count(*) AS n FROM mut").head.getLong(0) == 3)
    assert(s2.sql("SELECT max(k) AS m FROM mut").head.getLong(0) == 2)
  }
}
