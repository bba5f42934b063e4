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
      // mirror graft.Sql's session config: CBO on, so ANALYZE statistics
      // are visible through optimizedPlan.stats (rowCount is only
      // propagated when CBO is enabled)
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
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

  test("ANALYZE statistics persist across restart and reach the optimizer") {
    val warehouse = Tables.scratchDir("graft_whstats").toString
    val s1 = freshSession(warehouse)
    Tables(s1, sf, "orders").createOrReplaceTempView("orders")
    Sql.execute(s1, warehouse,
      "CREATE TABLE stats_orders USING parquet AS SELECT o_orderkey, o_custkey, o_totalprice FROM orders")
      .collect()
    val expected = Tables(s1, sf, "orders").count()
    Sql.execute(s1, warehouse,
      "ANALYZE TABLE stats_orders COMPUTE STATISTICS FOR ALL COLUMNS").collect()
    def optimizerRowCount(s: SparkSession): Option[BigInt] =
      s.table("stats_orders").queryExecution.optimizedPlan.stats.rowCount
    assert(optimizerRowCount(s1).contains(BigInt(expected)),
      s"expected rowCount=$expected in session 1, got ${optimizerRowCount(s1)}")

    // a fresh JVM-restart-equivalent session: stats must come back from the
    // recorded ANALYZE replay, not session memory
    val s2 = freshSession(warehouse)
    GraftCatalog.restore(s2, warehouse)
    assert(optimizerRowCount(s2).contains(BigInt(expected)),
      s"expected rowCount=$expected after restart, got ${optimizerRowCount(s2)}")

    // DROP TABLE forgets the recorded ANALYZE too — a later table of the
    // same name must not inherit stale statistics on restore
    Sql.execute(s2, warehouse, "DROP TABLE stats_orders")
    val s3 = freshSession(warehouse)
    val (tables, _) = GraftCatalog.restore(s3, warehouse)
    assert(!tables.contains("stats_orders"), s"dropped table restored: $tables")
    s3.stop()
  }

  test("ADT-typed columns persist through the warehouse and MATCH after restart") {
    val warehouse = Tables.scratchDir("graft_whadt").toString
    val s1 = freshSession(warehouse)
    Tables(s1, sf, "orders").createOrReplaceTempView("orders")
    Sql.execute(s1, warehouse, "CREATE TYPE Pay = Cash | Card(bank TEXT)")
    // the tagged-struct encoding is plain parquet — a CTAS with an ADT
    // constructor column round-trips storage like any other column
    Sql.execute(s1, warehouse,
      """CREATE TABLE pays USING parquet AS
        |SELECT o_orderkey,
        |       CASE WHEN o_orderkey % 2 = 0 THEN Pay.Cash() ELSE Pay.Card('acme') END AS pay
        |FROM orders""".stripMargin).collect()
    val s2 = freshSession(warehouse)
    GraftCatalog.restore(s2, warehouse)
    // the restored TYPE and the restored TABLE compose: pattern match over
    // the stored tagged structs in a brand-new session
    val m = s2.sql(
      """SELECT MATCH (pay) WHEN Cash THEN 'cash' WHEN Card(b) THEN b END AS how,
        |count(*) AS n FROM pays GROUP BY 1 ORDER BY 1""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables(s2, sf, "orders").count()
    assert(m.keySet == Set("acme", "cash"), m.toString)
    assert(m.values.sum == total, s"$m vs $total rows")
    s2.stop()
  }

  test("MERGE INTO upserts, deletes, and rejects multi-match sources") {
    val warehouse = Tables.scratchDir("graft_whmerge").toString
    val s1 = freshSession(warehouse)
    Tables(s1, sf, "region").createOrReplaceTempView("region")
    Sql.execute(s1, warehouse,
      "CREATE TABLE merged USING parquet AS SELECT CAST(r_regionkey AS BIGINT) AS k, r_name AS name FROM region")
      .collect()
    // 5 rows, keys 0..4. Upsert: update 0/1 from the source, insert 7.
    Sql.execute(s1, warehouse,
      """MERGE INTO merged t
        |USING (SELECT * FROM VALUES (0, 'ZERO'), (1, 'ONE'), (7, 'SEVEN') AS v(k, nm)) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET name = s.nm
        |WHEN NOT MATCHED THEN INSERT (k, name) VALUES (s.k, s.nm)""".stripMargin).collect()
    val after = s1.sql("SELECT k, name FROM merged ORDER BY k").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(after.length == 6, after.mkString(", "))
    assert(after.take(2).toSeq == Seq(0L -> "ZERO", 1L -> "ONE"))
    assert(after.last == 7L -> "SEVEN")
    // unmatched target rows (2, 3, 4) kept their original names
    assert(after.toMap.apply(2L) != null)

    // WHEN MATCHED THEN DELETE removes matched rows, INSERT * maps by name
    Sql.execute(s1, warehouse,
      """MERGE INTO merged USING (SELECT 7 AS k, 'X' AS name) s
        |ON merged.k = s.k
        |WHEN MATCHED THEN DELETE""".stripMargin).collect()
    assert(s1.sql("SELECT count(*) FROM merged WHERE k = 7").head.getLong(0) == 0)
    Sql.execute(s1, warehouse,
      """MERGE INTO merged USING (SELECT 9 AS k, 'NINE' AS name) s
        |ON merged.k = s.k
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(s1.sql("SELECT name FROM merged WHERE k = 9").head.getString(0) == "NINE")

    // a target row matching two source rows is an ERROR, and the failed
    // merge must not have mutated the table (copy-on-write staging)
    val beforeCount = s1.sql("SELECT count(*) FROM merged").head.getLong(0)
    val err = intercept[Exception] {
      Sql.execute(s1, warehouse,
        """MERGE INTO merged USING (SELECT * FROM VALUES (0, 'A'), (0, 'B') AS v(k, nm)) s
          |ON merged.k = s.k
          |WHEN MATCHED THEN UPDATE SET name = s.nm""".stripMargin).collect()
    }
    assert(err.getMessage.contains("more than one source row"), err.getMessage)
    assert(s1.sql("SELECT count(*) FROM merged").head.getLong(0) == beforeCount)
    assert(s1.sql("SELECT name FROM merged WHERE k = 0").head.getString(0) == "ZERO")

    // an INSERT-ONLY merge tolerates multi-match sources (no matched action
    // → nothing nondeterministic), and CASE WHEN inside a clause expression
    // must not be mistaken for a WHEN clause boundary
    Sql.execute(s1, warehouse,
      """MERGE INTO merged USING (SELECT * FROM VALUES (0, 'A'), (0, 'B'), (11, 'ELEVEN') AS v(k, nm)) s
        |ON merged.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, name)
        |VALUES (s.k, CASE WHEN s.nm = 'ELEVEN' THEN 'XI' ELSE s.nm END)""".stripMargin).collect()
    assert(s1.sql("SELECT name FROM merged WHERE k = 11").head.getString(0) == "XI")
    assert(s1.sql("SELECT name FROM merged WHERE k = 0").head.getString(0) == "ZERO")
    Sql.execute(s1, warehouse,
      """MERGE INTO merged USING (SELECT 11 AS k, 'once' AS nm) s
        |ON merged.k = s.k
        |WHEN MATCHED THEN UPDATE SET `name` = CASE WHEN s.nm = 'once' THEN 'ONCE' ELSE merged.name END""".stripMargin)
      .collect()
    assert(s1.sql("SELECT name FROM merged WHERE k = 11").head.getString(0) == "ONCE")
    s1.stop()
  }

  test("mutation edge cases: NULL predicates, literals, drops, view order") {
    val warehouse = Tables.scratchDir("graft_edge").toString
    val s1 = freshSession(warehouse)
    Sql.execute(s1, warehouse,
      "CREATE TABLE e USING parquet AS SELECT * FROM VALUES (1, 'a where b'), (2, NULL), (3, 'x') AS t(k, v)")
    // DELETE must only remove rows where the predicate is TRUE — the
    // NULL-valued row survives (NOT(NULL) is NULL, not TRUE)
    Sql.execute(s1, warehouse, "DELETE FROM e WHERE v = 'x'")
    assert(s1.sql("SELECT count(*) AS n FROM e").head.getLong(0) == 2)
    // 'where' inside a string literal must not split the UPDATE
    Sql.execute(s1, warehouse, "UPDATE e SET v = 'still where-y' WHERE v = 'a where b'")
    assert(s1.sql("SELECT v FROM e WHERE k = 1").head.getString(0) == "still where-y")
    // WHERE-less forms touch every row
    Sql.execute(s1, warehouse, "UPDATE e SET k = k + 10")
    assert(s1.sql("SELECT min(k) AS m FROM e").head.getInt(0) == 11)
    Sql.execute(s1, warehouse, "DELETE FROM e")
    assert(s1.sql("SELECT count(*) AS n FROM e").head.getLong(0) == 0)

    // literal whitespace survives view persistence (no whitespace collapse)
    Sql.execute(s1, warehouse, "CREATE VIEW wsv AS SELECT 'a  b' AS s")
    // view redefinition keeps creation order so dependents still replay
    Sql.execute(s1, warehouse, "CREATE VIEW base AS SELECT 1 AS x")
    Sql.execute(s1, warehouse, "CREATE VIEW dep AS SELECT x + 1 AS y FROM base")
    Sql.execute(s1, warehouse, "CREATE OR REPLACE VIEW base AS SELECT 5 AS x")
    // dropping a table removes its directory: no resurrection after restart
    Sql.execute(s1, warehouse, "DROP TABLE e")

    // IF NOT EXISTS on an existing view is a no-op — the record must keep
    // the ORIGINAL definition, not the ignored new text
    Sql.execute(s1, warehouse, "CREATE VIEW IF NOT EXISTS wsv AS SELECT 'ignored' AS s")
    // qualified predicate references and mixed-case table names work
    Sql.execute(s1, warehouse,
      "CREATE TABLE QCase USING parquet AS SELECT * FROM VALUES (1), (2) AS t(k)")
    Sql.execute(s1, warehouse, "DELETE FROM QCase WHERE QCase.k = 1")
    assert(s1.sql("SELECT k FROM QCase").head.getInt(0) == 2)
    // duplicate SET targets are rejected; WHEREX is a syntax error
    intercept[IllegalArgumentException](
      Sql.execute(s1, warehouse, "UPDATE QCase SET k = 1, k = 2 WHERE k = 2"))
    intercept[IllegalArgumentException](
      Sql.execute(s1, warehouse, "DELETE FROM QCase WHEREX > 1"))
    // DROP VIEW hitting a TEMP view must not prune the persistent record
    s1.sql("CREATE TEMPORARY VIEW wsv AS SELECT 'temp' AS s")
    Sql.execute(s1, warehouse, "DROP VIEW wsv")

    val s2 = freshSession(warehouse)
    val (tables, _) = GraftCatalog.restore(s2, warehouse)
    assert(!tables.contains("e"), s"dropped table resurrected: $tables")
    assert(s2.sql("SELECT s FROM wsv").head.getString(0) == "a  b")
    assert(s2.sql("SELECT y FROM dep").head.getInt(0) == 6)
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
