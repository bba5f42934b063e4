package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the physical plan of named declared queries (all of
  * them with no args). `sbt "runMain graft.Explain join_lateral_topn"`;
  * sf dir via SPARK_GRAFT_SF_DIR (default sf0.001 — plans, not timings).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"=== $q ===")
      try println(SparkEntry.queries(q)(spark, sfDir).queryExecution.sparkPlan)
      catch { case e: Exception =>
        println(s"(failed: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(1).mkString})")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
