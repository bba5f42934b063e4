package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operators: invariants stronger than the oracle hash alone. */
class Round9Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.icu.caseMappings.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("vec_kmeans_lloyd partitions the corpus into k nonempty clusters") {
    val out = SparkEntry.queries("vec_kmeans_lloyd")(spark, sf).collect()
    assert(out.length == 5, s"expected 5 clusters, got ${out.length}")
    val total = Tables(spark, sf, "embeddings").count()
    assert(out.map(_.getAs[Long]("n")).sum == total,
      "cluster sizes must sum to the corpus size (every vector assigned once)")
    assert(out.forall(_.getAs[Long]("n") > 0), "no empty clusters on this data")
  }

  test("join_bloom_prefilter equals the exact join (no false negatives)") {
    val pre = SparkEntry.queries("join_bloom_prefilter")(spark, sf).collect()
    val exact = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, sf, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables(spark, sf, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"),
           sum(round(col("l_extendedprice") * 100).cast("bigint")).as("cents"))
      .orderBy("n_name").collect()
    assert(pre.toSeq == exact.toSeq)
  }

  test("ts_autocorr emits one bounded coefficient per lag") {
    val out = SparkEntry.queries("ts_autocorr")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("lag")).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(r => math.abs(r.getAs[Double]("r")) <= 1.0 + 1e-9))
    assert(out.forall(_.getAs[Long]("n") > 10))
  }

  // NOTE on magnitude: the fixture embeddings are synthetic random vectors,
  // not trained Matryoshka embeddings — a 16-dim prefix of noise does NOT
  // preserve top-1 (measured 0/10 agreement at sf0.001), so only the
  // structural invariants are asserted; the agreement RATE is the
  // operator's measurement output, not a testable property of this data.
  test("sim_matryoshka_recall emits one self-excluded pair per query") {
    val out = SparkEntry.queries("sim_matryoshka_recall")(spark, sf).collect()
    val nQueries = Tables(spark, sf, "embeddings")
      .filter(col("vec_id") % 50 === 0).count()
    assert(out.length == nQueries, "one output row per query vector")
    assert(out.forall(r => r.getAs[Long]("full_id") != r.getAs[Long]("q_id") &&
                           r.getAs[Long]("trunc_id") != r.getAs[Long]("q_id")),
      "a vector must never be its own nearest neighbor")
    assert(out.forall(r => (r.getAs[Int]("agree") == 1) ==
                           (r.getAs[Long]("full_id") == r.getAs[Long]("trunc_id"))))
  }

  test("join_pit_scd2 picks exactly the version covering each purchase") {
    val out = SparkEntry.queries("join_pit_scd2")(spark, sf)
    // no purchase may match two versions (half-open intervals partition time)
    val dup = out.groupBy("event_id").count().filter(col("count") > 1).count()
    assert(dup == 0, "a purchase matched more than one dimension version")
  }

  test("text_hash_features conserves token mass and stays in range") {
    val out = SparkEntry.queries("text_hash_features")(spark, sf).collect()
    val tokens = Tables(spark, sf, "documents")
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$")).count()
    assert(out.map(_.getAs[Long]("tf")).sum == tokens,
      "bucketed term frequencies must sum to the token count")
    val nDocs = Tables(spark, sf, "documents").count()
    assert(out.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b < 64 &&
        r.getAs[Long]("df") <= nDocs
    })
  }
}
