package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 fourteenth wave: invariants stronger than the oracle hash alone. */
class Round9nSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.icu.caseMappings.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("sink_snapshot_vacuum: v2 intact after removal, exactly two files gone") {
    val r = SparkEntry.queries("sink_snapshot_vacuum")(spark, sf).head()
    assert(r.getAs[Long]("files_removed") == 2L,
      "both expired v1 files must be physically removed")
    val expect = Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") =!= "P")
      .agg(count(lit(1)).as("n"),
           sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
      .head()
    assert(r.getAs[Long]("n") == expect.getAs[Long]("n"))
    assert(r.getAs[Long]("cents") == expect.getAs[Long]("cents"))
    // the vacuumed scratch dir holds ONLY the v2 manifest and its file
    val dirs = java.nio.file.Files.list(Tables.scratchRootForTest)
      .iterator()
    val latest = scala.jdk.CollectionConverters.IteratorHasAsScala(dirs).asScala
      .filter(_.getFileName.toString.startsWith("graft_vacuum"))
      .toSeq.sortBy(_.getFileName.toString).last
    val names = java.nio.file.Files.list(latest).iterator()
    val left = scala.jdk.CollectionConverters.IteratorHasAsScala(names).asScala
      .map(_.getFileName.toString).toSet
    assert(left == Set("v2.manifest", "compacted.parquet"),
      s"only live artifacts may survive the vacuum, found $left")
  }

  test("vec_pca_whiten_apply: deterministic, whitened coords near unit scale") {
    val q = SparkEntry.queries("vec_pca_whiten_apply")
    val out = q(spark, sf).collect()
    assert(out.nonEmpty)
    assert(q(spark, sf).collect().toSeq == out.toSeq, "bit-stable across runs")
    // whitened coordinates should be O(1): sample std in [0.2, 5]
    for (cn <- Seq("z1", "z2")) {
      val vs = out.map(_.getAs[Double](cn))
      val mean = vs.sum / vs.length
      val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / vs.length)
      assert(sd > 0.2 && sd < 5.0, s"$cn sample std $sd outside sanity band")
    }
  }
}
