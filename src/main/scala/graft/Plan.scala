package graft
import org.apache.spark.sql.SparkSession

// Dev harness (not library surface): prints the formatted physical plan of
// named queries — the `.explain("formatted")` feedback loop the scale work
// runs after every operator change.
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Plan <keys...>"
object Plan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.minPartitionNum", 32)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
