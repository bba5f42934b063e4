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

  /** The retrieval fixture's embeddings are near-random (measured max
    * pairwise cosine 0.51 at sf0.001 AND sf0.01) — a τ=0.90 retrieval key
    * over them has an EMPTY truth set and proves nothing. So, exactly like
    * the dedup family's `Pipeline.nearDupCorpus`, the key PLANTS its own
    * near-duplicates: each vector v gains a copy v' = v + 0.3·rot(v)
    * (rot = circular shift by one dim, id + 1000000). rot preserves the
    * norm, so cos(v, v') = (1 + 0.3t)/√(1 + 0.6t + 0.09) for t = v̂·rot(v̂),
    * minimized at t = −0.3 where it equals √(1 − 0.09) ≈ 0.9539 ≥ 0.90 for
    * EVERY row — the truth set provably contains all N planted pairs.
    * Measured: 500 planted pairs at [0.954, 0.969], max NON-planted pair
    * 0.595 at both fixture scales, so truth == planted exactly.
    */
  private[graft] def plantedEmbeddings(s: org.apache.spark.sql.SparkSession,
                                       d: String): org.apache.spark.sql.DataFrame = {
    val emb = Tables(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val dim = size(col("embedding"))
    val planted = emb.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x + lit(0.3f) * element_at(col("embedding"), ((i + 1) % dim) + 1))
          .cast("float")).as("embedding"))
    emb.unionAll(planted)
  }

  /** SRP-LSH candidate pairs over `emb` (vec_id, embedding): bucket each
    * vector in `PipelineExt.SrpTables` tables of `bits`-bit signatures and
    * emit the distinct id pairs colliding in SOME table. With
    * `multiprobe`, the probe side also visits every 1-bit-flip neighbor
    * bucket — a constant (1 + bits) fan-out on ONE side of the same
    * co-partitioned shuffle_hash self-join, making the candidate set a
    * strict superset of the single-probe one (flip 0 IS the home bucket).
    * Factored so Round11iSpec can compare both probe policies on the same
    * planted corpus.
    */
  private[graft] def srpCandidates(emb: org.apache.spark.sql.DataFrame,
                                   n: Int, bits: Int,
                                   multiprobe: Boolean): org.apache.spark.sql.DataFrame = {
    val home = emb.select(col("vec_id"),
      posexplode(PipelineExt.srpTableKeys(PipelineExt.SrpTables, bits))
        .as(Seq("tbl", "bucket")))
    val probeK0 =
      if (!multiprobe) home
      else {
        val flips = (0 until bits).map(i => lit(1 << i))
        home.select(col("vec_id"), col("tbl"),
          explode(array((lit(0) +: flips).map(f =>
            col("bucket").bitwiseXOR(f)): _*)).as("bucket"))
      }
    val probeK = probeK0.repartition(n, col("tbl"), col("bucket"))
    val idx = home.repartition(n, col("tbl"), col("bucket"))
    probeK.as("a")
      .join(idx.as("b").hint("shuffle_hash"),
            col("a.tbl") === col("b.tbl") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
  }

  val decls: Map[String, Decl] = Map(
    // Multiprobe SRP-LSH pair retrieval at cosine >= 0.90 over the PLANTED
    // corpus (see plantedEmbeddings — the raw fixture attests no pairs at
    // this τ): candidates collide in SOME table within hamming 1 of the
    // bucket. The strictly-larger candidate set makes recall >= the
    // single-probe policy's (Round11iSpec proves the superset property and
    // an UNCONDITIONAL recall floor over the >=500-pair planted truth
    // set). Oracle-N (approximate class); the driver's rows>0 check is
    // now non-vacuous at every fixture scale.
    "sim_ann_lsh_multiprobe" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val emb = plantedEmbeddings(s, d)
        // 2N vectors after planting — keep the occupancy-constant budget
        val nVec = 2L * Tables.rowCount(s, d, "embeddings")
        def ceilLog2(x: Long): Int =
          if (x <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x - 1)
        val bits = math.min(12, math.max(PipelineExt.SrpBitsPerTable,
                                         ceilLog2(nVec / 64)))
        val pairs = srpCandidates(emb, n, bits, multiprobe = true)
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
