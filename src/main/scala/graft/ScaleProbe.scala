package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Complexity-cliff probe for the pair-generating / iterative families
  * (round-9 verdict item 8): the sf0.1 bench cannot distinguish O(n) from
  * O(n²) shapes, so this main minting a ×FACTOR corpus from the sf0.1
  * documents/embeddings fixtures (doc_id/vec_id offset per replica — the
  * near-dup/planted structure replicates per copy instead of collapsing
  * into one giant dup group) and times the families that generate pairs
  * or iterate. A key whose runtime grows super-linearly in FACTOR has a
  * complexity cliff the per-round bench can't see.
  *
  * Only documents/embeddings-derived keys run here — the TPC-H FK web is
  * not replicated (remapping orderkey/custkey/partkey consistently is a
  * fixture-generator job, not a probe's).
  *
  * Usage: runMain graft.ScaleProbe <sfDir> <workDir> <factor> [keys...]
  * Prints one JSON line: {"factor":N,"queries":{name:sec,...}}.
  */
object ScaleProbe {

  val defaultKeys: Seq[String] = Seq(
    "dedup_exact", "dedup_keep_canonical", "dedup_near_minhash",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "dedup_containment", "dedup_span_cross", "dedup_edit_distance",
    "dedup_connected_components", "dedup_semantic_cluster",
    "graph_pagerank", "graph_bfs_layers", "graph_triangle_count",
    "graph_adamic_adar", "graph_harmonic_sampled",
    "sim_ann_lsh", "sim_ann_ivf", "sim_ann_pq", "sim_cosine_topk",
    "sim_knn_join", "text_tfidf_topterms", "text_collocation_g2")

  def mint(spark: SparkSession, sfDir: String, workDir: String,
           factor: Int): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nDoc = docs.agg(max("doc_id")).head.getLong(0) + 1
    val nVec = emb.agg(max("vec_id")).head.getLong(0) + 1
    val reps = spark.range(factor).select(col("id").as("rep"))
    docs.crossJoin(reps)
      .select((col("doc_id") + col("rep") * nDoc).as("doc_id"),
              col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$workDir/documents.parquet")
    emb.crossJoin(reps)
      .select((col("vec_id") + col("rep") * nVec).as("vec_id"),
              col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$workDir/embeddings.parquet")
    // the un-replicated tables link through so keys touching a dimension
    // (graph_adamic_adar reads orders for its weights) still run; their
    // cost is constant across factors and cancels in the ratio
    Tables.names.filterNot(n => n == "documents" || n == "embeddings")
      .foreach { n =>
        val from = java.nio.file.Paths.get(s"$sfDir/$n.parquet")
        val to = java.nio.file.Paths.get(s"$workDir/$n.parquet")
        java.nio.file.Files.deleteIfExists(to)
        java.nio.file.Files.createSymbolicLink(to, from)
      }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val workDir = args(1); val factor = args(2).toInt
    val keys = if (args.length > 3) args.drop(3).toSeq else defaultKeys
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mint(spark, sfDir, workDir, factor)
    val times = keys.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val sec =
        try { fn(spark, workDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[probe] $name failed: ${e.getMessage}"); -1.0
        }
      spark.catalog.clearCache()
      name -> sec
    }
    val qjson = times.map { case (n, t) => s""""$n":${f"$t%.3f"}""" }
      .mkString(",")
    println(s"""{"factor":$factor,"queries":{$qjson}}""")
    spark.stop()
  }
}
