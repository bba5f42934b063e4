package graft

import org.apache.spark.sql.SparkSession

/** SQL client entry point — the surface a user of the reference RDBMS
  * lands on: all fixture tables registered as views, graft's extensions
  * (vec_dot, TopK strategy) injected, one query per invocation.
  *
  * Usage:
  *   sbt "runMain graft.Sql SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1"
  *   echo "SELECT ..." | sbt "runMain graft.Sql"     # reads stdin if no args
  * Scale-factor dir via SPARK_GRAFT_SF_DIR (default sf0.01).
  */
object Sql {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.views(spark, sfDir)
    val query =
      if (args.nonEmpty) args.mkString(" ")
      else scala.io.Source.stdin.mkString
    require(query.trim.nonEmpty, "usage: graft.Sql <query> (or pipe SQL on stdin)")
    val df = spark.sql(query)
    // Execute ONCE: limit+collect instead of count()-then-show(), which
    // would run the query (and any side effects) twice.
    val rows = df.limit(1001).collect()
    val shown = rows.take(1000)
    spark.createDataFrame(
      java.util.Arrays.asList(shown: _*), df.schema).show(1000, truncate = false)
    if (rows.length > 1000) println("(more than 1000 rows; showing first 1000)")
    spark.stop()
  }
}
