package graft.operators

import graft.{Decl, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 twenty-first wave: radius (range) similarity search — the
  * retrieval API member top-k doesn't cover — and per-query recall@k of
  * the Matryoshka prefix ladder as a retrieval-evaluation operator.
  */
object Round9u {

  val decls: Map[String, Decl] = Map(
    // Radius search — every vector within cosine ≥ τ of each query (the
    // range-query retrieval API; top-k fixes the COUNT, radius fixes the
    // QUALITY bar). Four fixed query vectors broadcast against one
    // corpus scan (the brute-force baseline shape; the bounded-candidate
    // scale path is the stored-index probe in sim_ann_lsh / sim_ann_ivf).
    // Cosines round to 6 dp per the probed-EXACT R3 convention.
    "sim_range_radius" -> Decl(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 400)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        emb.crossJoin(broadcast(queries))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
                  round(VectorOps.cosine(col("embedding"), col("qv")), 6).as("cos"))
          .filter(col("cos") >= 0.25)
          .orderBy("q_id", "vec_id")
      },
      Some("""WITH q AS (SELECT vec_id AS q_id,
             |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
             |           FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 400)
             |SELECT q_id, vec_id,
             |  round(list_cosine_similarity(
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)), qv), 6) AS cos
             |FROM embeddings CROSS JOIN q
             |WHERE vec_id <> q_id
             |  AND round(list_cosine_similarity(
             |        list_transform(embedding, x -> CAST(x AS DOUBLE)), qv), 6)
             |      >= 0.25
             |ORDER BY q_id, vec_id""".stripMargin)),

    // Retrieval evaluation — per-query recall@5 of the 16-dim Matryoshka
    // prefix against full-vector ground truth, as a declared REPORT (the
    // aggregate twin of sim_matryoshka_recall's per-pair view): both
    // top-5 sets come from codegen'd dot product ranked with unique
    // tiebreaks, the overlap count is an integer, and the mean recall
    // ships as ppm (R14). The eval harness every ANN deployment runs
    // before trading accuracy for speed.
    "sim_recall_at_k" -> Decl(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"),
                  expr("slice(embedding, 1, 16)").as("prefix"))
        val queries = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 400)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_full"),
                  col("prefix").as("q_pre"))
        val scored = emb.crossJoin(broadcast(queries))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
                  VectorOps.dot(col("embedding"), col("q_full")).as("d_full"),
                  VectorOps.dot(col("prefix"), col("q_pre")).as("d_pre"))
        def top5(scoreCol: String) = {
          val w = Window.partitionBy("q_id")
            .orderBy(col(scoreCol).desc, col("vec_id").asc)
          scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
            .select(col("q_id"), col("vec_id"))
        }
        val hit = top5("d_full").as("t")
          .join(top5("d_pre").as("p"), Seq("q_id", "vec_id"))
          .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
        queries.select(col("q_id")).join(hit, Seq("q_id"), "left_outer")
          .select(col("q_id"),
                  coalesce(col("n_hits"), lit(0L)).as("n_hits"))
          .select(col("q_id"), col("n_hits"),
                  expr("(n_hits * 2000000L + 5) div 10").as("recall_ppm"))
          .orderBy("q_id")
      },
      None)
  )
}
