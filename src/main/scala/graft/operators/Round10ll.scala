package graft.operators

import graft.{Decl, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Round-10 wave 42: binary-quantized vector search — the 1-bit/dim
  * sign quantization + hamming prefilter + exact rerank pipeline that
  * production vector stores run when the full-precision corpus is too
  * big to scan (32× less bandwidth than float32; hamming is one XOR +
  * popcount per 64 dims).
  *
  * Scale shape: the sign signature packs into two BIGINTs computed in
  * one linear scan (no shuffle); the hamming scan touches ONLY those
  * 16 bytes per vector; per-query candidates go through the native
  * bounded-heap TopKPerKey (shard pre-pass then final — the
  * sim_knn_join pattern, never a full per-query sort), and the exact
  * cosine rerank touches ≤32 full vectors per query. Query side is
  * broadcast; the corpus never moves.
  *
  * Determinism: hamming is an exact small integer; the prefilter
  * cutoff orders by (hamming, vec_id) and the rerank by
  * (round(cos, 6) DESC, vec_id) — both total orders, so the engines
  * cannot disagree on either cut.
  */
object Round10ll {

  private def signPack(c: String, lo: Int): org.apache.spark.sql.Column =
    expr(s"aggregate(sequence(0, 31), 0L, (acc, j) -> " +
      s"acc + IF($c[j + $lo] > 0, shiftleft(1L, j), 0L))")

  val decls: Map[String, Decl] = Map(
    "sim_binary_rerank" -> Decl(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"),
                  signPack("embedding", 0).as("slo"),
                  signPack("embedding", 32).as("shi"))
          .localCheckpoint(true)
        val q = emb.filter(pmod(col("vec_id"), lit(50L)) === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
                  col("slo").as("qlo"), col("shi").as("qhi"))
        val ham = emb.select(col("vec_id"), col("slo"), col("shi"))
          .crossJoin(broadcast(q.select(col("q_id"), col("qlo"), col("qhi"))))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            (expr("bit_count(slo ^ qlo)") + expr("bit_count(shi ^ qhi)"))
              .cast("int").as("hamming"),
            pmod(col("vec_id"), lit(64L)).as("shard"))
        val partial = graft.plans.TopK.perKey(
          ham, Seq("q_id", "shard"), Seq("hamming" -> false, "vec_id" -> false), 32)
        val cand = graft.plans.TopK.perKey(
            partial, Seq("q_id"), Seq("hamming" -> false, "vec_id" -> false), 32)
          .select("q_id", "vec_id", "hamming")
        val rer = cand
          .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
          .join(broadcast(q.select(col("q_id"), col("qe"))), "q_id")
          .select(col("q_id"), col("vec_id"), col("hamming"),
                  round(VectorOps.cosine(col("embedding"), col("qe")), 6).as("cos"))
        graft.plans.TopK.perKey(
            rer, Seq("q_id"), Seq("cos" -> true, "vec_id" -> false), 5)
          .orderBy(col("q_id"), col("cos").desc, col("vec_id"))
      },
      Some("""WITH sig AS (
             |  SELECT vec_id, list_transform(embedding, x -> x > 0) AS bits,
             |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
             |  FROM embeddings),
             |q AS (SELECT vec_id AS q_id, bits AS qbits, e AS qe
             |      FROM sig WHERE vec_id % 50 = 0),
             |ham AS (
             |  SELECT q_id, sig.vec_id,
             |         CAST(len(list_filter(range(1, 65),
             |           i -> bits[i] != qbits[i])) AS INT) AS hamming
             |  FROM sig CROSS JOIN q WHERE sig.vec_id <> q.q_id),
             |cand AS (
             |  SELECT q_id, vec_id, hamming FROM (
             |    SELECT q_id, vec_id, hamming,
             |           row_number() OVER (PARTITION BY q_id
             |                              ORDER BY hamming, vec_id) AS rn
             |    FROM ham) WHERE rn <= 32),
             |rer AS (
             |  SELECT cand.q_id, cand.vec_id, cand.hamming,
             |         round(list_cosine_similarity(sig.e, qe), 6) AS cos
             |  FROM cand JOIN sig ON cand.vec_id = sig.vec_id
             |            JOIN q ON cand.q_id = q.q_id)
             |SELECT q_id, vec_id, hamming, cos FROM (
             |  SELECT q_id, vec_id, hamming, cos,
             |         row_number() OVER (PARTITION BY q_id
             |                            ORDER BY cos DESC, vec_id) AS rn
             |  FROM rer) WHERE rn <= 5
             |ORDER BY q_id, cos DESC, vec_id""".stripMargin))
  )
}
