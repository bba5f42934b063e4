package graft
import org.apache.spark.sql.SparkSession

// Dev profiling harness (not part of the library surface): times each named
// query twice in one session to split fixed cost (planning + codegen
// compile + JIT + broadcast setup) from steady-state execution — the
// cold-warm split decides whether a slow bench line is worth optimizing
// (most of the suite's per-query cost is one-shot codegen, not data work).
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Prof <keys...>"
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.minPartitionNum", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count().count()
    Tables.names.foreach(n => Tables(spark, sfDir, n).count())
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"[prof] $name%-30s cold=${times.head}%.2f warm=${times(1)}%.2f")
    }
    spark.stop()
  }
}
