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
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // NOTE (measured, round 11): forcing size-based AQE coalescing
      // (parallelismFirst=false, advisory 16m) made the iterative SCC
      // operator 5× SLOWER here (62 s vs 9-13 s warm) — single-task
      // stages serialize the superstep chain and re-plan/codegen per
      // stage boundary dominates. The default stays.
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count().count()
    Tables.names.foreach(n => Tables(spark, sfDir, n).count())
    // Per-stage truth: task counts and the max/total task time per stage of
    // the WARM run, so a "slow query" can be attributed to a specific stage
    // (and to skew: max ≫ total/count means one straggler task).
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val perStage = new scala.collection.mutable.HashMap[Int, (Int, Long, Long)]()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        perStage.synchronized {
          val (n, tot, mx) = perStage.getOrElse(te.stageId, (0, 0L, 0L))
          val d = te.taskInfo.duration
          perStage(te.stageId) = (n + 1, tot + d, math.max(mx, d))
        }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        perStage.synchronized {
          val (n, tot, mx) = perStage.getOrElse(sc.stageInfo.stageId, (0, 0L, 0L))
          stages += ((sc.stageInfo.stageId, n, tot, mx))
        }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { i =>
        if (i == 2) { stages.clear(); spark.sparkContext.addSparkListener(listener) }
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      spark.sparkContext.removeSparkListener(listener)
      println(f"[prof] $name%-30s cold=${times.head}%.2f warm=${times(1)}%.2f")
      stages.sortBy(-_._3).take(5).foreach { case (id, n, tot, mx) =>
        println(f"[prof]   stage $id%4d tasks=$n%3d total=${tot / 1e3}%.2fs max=${mx / 1e3}%.2fs")
      }
    }
    spark.stop()
  }
}
