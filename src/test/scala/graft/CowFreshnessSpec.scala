package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Copy-on-write DML freshness: a reader that LISTED the table's files
  * before the mutation must see the new generation afterwards (the
  * round-11 MV-lifecycle work initially looked like this was broken;
  * this spec pins that it is not — refreshByPath + the swap keep
  * fresh path reads exact).
  */
class CowFreshnessSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("a pre-DML reader sees the post-DML generation on a fresh read") {
    val wh = Tables.scratchDir("graft_cow_fresh").toString
    spark.range(1000).selectExpr("id", "CAST(id % 5 AS STRING) AS g")
      .write.mode("overwrite").parquet(s"$wh/t")
    spark.read.parquet(s"$wh/t").createOrReplaceTempView("t")
    assert(spark.read.parquet(s"$wh/t").count() == 1000) // prime listings
    val res = graft.Sql.execute(spark, wh, "DELETE FROM t WHERE g = '0'")
    assert(res.collect()(0).getLong(0) == 800)
    assert(spark.read.parquet(s"$wh/t").count() == 800,
           "fresh path read must see the new generation")
  }
}
