package graft.operators

import graft.{Decl, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Round-10 wave 65: multiprobe LSH (the recall/fan-out dial every
  * production ANN service exposes: probe the home bucket PLUS every
  * 1-bit-flip neighbor, trading bounded extra candidates for strictly
  * higher recall) and exact heavy hitters by the Misra-Gries two-pass
  * (a mergeable candidate sketch whose no-false-negative guarantee
  * turns one verification scan into an EXACT answer — the scalable
  * alternative to sketch-only CMS answers).
  *
  * Scale shape: multiprobe multiplies the probe side's bucket keys by
  * (1 + bits) — a constant fan-out on one side of the same
  * co-partitioned shuffle_hash self-join (nothing broadcasts, pairs
  * dedup before scoring, the sim_ann_lsh discipline). Misra-Gries
  * state is k counters per partition merged associatively; the verify
  * pass is one semi-joined aggregate over the candidate set.
  */
object Round11i {

  val decls: Map[String, Decl] = Map(
    // Multiprobe SRP-LSH pair retrieval at cosine >= 0.90: candidates
    // collide in SOME table within hamming 1 of the 4-bit bucket. The
    // strictly-larger candidate set makes recall >= the single-probe
    // key's (Round11iSpec proves both the superset property and the
    // recall floor). Oracle-N (approximate class).
    "sim_ann_lsh_multiprobe" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val emb = Tables(s, d, "embeddings")
        val nVec = Tables.rowCount(s, d, "embeddings")
        def ceilLog2(x: Long): Int =
          if (x <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x - 1)
        val bits = math.min(12, math.max(PipelineExt.SrpBitsPerTable,
                                         ceilLog2(nVec / 64)))
        val home = emb.select(col("vec_id"),
          posexplode(PipelineExt.srpTableKeys(PipelineExt.SrpTables, bits))
            .as(Seq("tbl", "bucket")))
        // probe side: home bucket + every 1-bit flip (constant fan-out)
        val flips = (0 until bits).map(i => lit(1 << i))
        val probeK = emb.select(col("vec_id"),
            posexplode(PipelineExt.srpTableKeys(PipelineExt.SrpTables, bits))
              .as(Seq("tbl", "bucket")))
          .select(col("vec_id"), col("tbl"),
                  explode(array((lit(0) +: flips).map(f =>
                    expr("bucket").bitwiseXOR(f)): _*)).as("bucket"))
          .repartition(n, col("tbl"), col("bucket"))
        val idx = home.repartition(n, col("tbl"), col("bucket"))
        val pairs = probeK.as("a")
          .join(idx.as("b").hint("shuffle_hash"),
                col("a.tbl") === col("b.tbl") &&
                col("a.bucket") === col("b.bucket") &&
                col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
          .distinct()
        val embV = emb.select(col("vec_id"), col("embedding"))
        pairs
          .join(embV.select(col("vec_id").as("id_a"),
                            col("embedding").as("ea")).hint("shuffle_hash"),
                "id_a")
          .join(embV.select(col("vec_id").as("id_b"),
                            col("embedding").as("eb")).hint("shuffle_hash"),
                "id_b")
          .select(col("id_a"), col("id_b"),
                  round(VectorOps.cosine(col("ea"), col("eb")), 6).as("cos"))
          .filter(col("cos") >= 0.90)
          .orderBy("id_a", "id_b")
      },
      None),

    // Exact heavy hitters over the Zipfian word stream (support > 1/64
    // of all tokens) via the Misra-Gries prefilter: pass 1 keeps 128
    // counters per partition (a guaranteed superset of every key above
    // the n/129 frequency floor after the associative merge — and
    // 1/64 > 1/129, so no true heavy hitter can be lost), pass 2
    // exact-counts ONLY the ≤128 surviving candidates (broadcast
    // semi-join riding the token scan) and applies the exact threshold.
    // The DuckDB oracle is the exact answer from a plain GROUP BY —
    // hash-equality proves the two-pass sketch route loses nothing.
    // Scale shape: the full-vocabulary shuffle of a naive word count
    // never happens; the only shuffle is |candidates| ≤ 128 groups.
    "agg_heavy_hitters_mg_exact" -> Decl(
      (s, d) => {
        val toks = Pipeline.docsWithTokens(s, d)
          .select(explode(col("toks")).as("word"))
        val mg = udaf(new graft.functions.MisraGriesAgg(128))
        // one pass → candidate set AND the exact token total together
        val candidates = toks
          .agg(mg(col("word")).as("cand"), count(lit(1)).as("total"))
          .select(col("total"), explode(col("cand")).as("word"))
        toks.join(broadcast(candidates), Seq("word"))
          .groupBy("word", "total")
          .agg(count(lit(1)).as("n"))
          .filter(col("n") * 64L > col("total"))
          .select(col("word"), col("n"))
          .orderBy("word")
      },
      Some("""SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
             |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
             |GROUP BY word
             |HAVING count(*) * 64 > (SELECT count(*) FROM (
             |  SELECT unnest(string_split(text, ' ')) AS w FROM documents) u)
             |ORDER BY word""".stripMargin))
  )
}
