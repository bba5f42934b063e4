package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 36: QUALIFY SQL surface, Kneser–Ney language modeling,
  * and the Poisson bootstrap — the distributed-deterministic uncertainty
  * estimate.
  */
object Round10hh {

  import org.apache.spark.sql.expressions.Window

  /** Rounded-integer mean: CAST(round(sum/count)) — one exact-int double
    * division then one round, deterministic for any partitioning. */
  private def intMean(c: String) =
    org.apache.spark.sql.functions.expr(
      s"CAST(round(CAST(sum($c) AS DOUBLE) / count(1)) AS BIGINT)")

  // Poisson(1) CDF breakpoints scaled to the first 6 hex digits of an md5
  // (lowercase hex compares lexicographically == numerically): weight k
  // for u ∈ [CDF(k-1), CDF(k)). The Poisson bootstrap is THE distributed
  // bootstrap: per-row weights are independent of row order and cluster
  // partitioning, so any engine reproduces them from the same hash.
  private val PoissonThresholds =
    Seq("5e2d58", "bc5ab1", "eb715e", "fb2397", "ff1025", "ffd90f", "fffa8b")

  val decls: Map[String, Decl] = Map(
    // QUALIFY clause (the window-filter SQL surface DuckDB/Snowflake/BQ
    // users expect; Spark's parser lacks it) — lowered by
    // Sql.rewriteQualify at the same injection altitude as the ADT
    // grammar. Top event per user by value through a rank predicate. The
    // oracle runs DuckDB's NATIVE QUALIFY — the hash-match proves the
    // rewrite implements the standard semantics, not an approximation.
    "sql_qualify_clause" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        graft.Sql.runSql(s,
          """SELECT user_id, event_id, round(value, 6) AS value FROM events
            |QUALIFY row_number() OVER (PARTITION BY user_id
            |                           ORDER BY value DESC, event_id) = 1
            |ORDER BY user_id""".stripMargin)
      },
      Some("""SELECT user_id, event_id, round(value, 6) AS value FROM events
             |QUALIFY row_number() OVER (PARTITION BY user_id
             |                           ORDER BY value DESC, event_id) = 1
             |ORDER BY user_id""".stripMargin)),

    // Interpolated Kneser–Ney bigram probabilities — the LM smoothing
    // every n-gram pipeline actually ships (continuation counts fix the
    // "San Francisco" problem add-one smoothing has). All sufficient
    // statistics are exact integers: c(w1,w2), c(w1·) = Σ c(w1,w2),
    // N1+(w1·) = |{w2}|, N1+(·w2) = |{w1}|, N = |bigram types|; with
    // fixed discount D = 0.75 (exact binary),
    //   P_kn(w2|w1) = (c(w1,w2) − D)/c(w1·) + D·N1+(w1·)/c(w1·) · N1+(·w2)/N.
    // One float expression tree per output row, identical in both
    // engines, rounded once. Top-50 bigrams by count; count-type joins
    // are plain shuffles (the vocabulary grows with the corpus — nothing
    // pinned broadcast).
    "text_kneser_ney_bigram" -> Decl(
      (s, d) => {
        val toks = Tables(s, d, "documents")
          .select(split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 2)
        val big = toks.select(explode(expr(
            "transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS w1, t[i + 1] AS w2))"))
            .as("p"))
          .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .agg(count(lit(1)).as("c12"))
          .localCheckpoint(true)
        val left = big.groupBy("w1")
          .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1fwd"))
        val cont = big.groupBy("w2").agg(count(lit(1)).as("n1bwd"))
        val types = big.agg(count(lit(1)).as("nn"))
        big
          .join(left, "w1").join(cont, "w2")
          .crossJoin(broadcast(types))
          .select(col("w1"), col("w2"), col("c12"),
            round((col("c12").cast("double") - 0.75d) / col("c1")
                    + lit(0.75d) * col("n1fwd") / col("c1")
                      * (col("n1bwd").cast("double") / col("nn")), 6)
              .as("p_kn"))
          .orderBy(col("c12").desc, col("w1"), col("w2"))
          .limit(50)
      },
      Some("""WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents
             |              WHERE len(string_split(text, ' ')) >= 2),
             |big AS (SELECT w1, w2, count(*) AS c12 FROM (
             |          SELECT unnest(list_transform(generate_series(1, len(t) - 1),
             |                   i -> {'w1': t[i], 'w2': t[i + 1]}), recursive := true)
             |          FROM toks)
             |        GROUP BY 1, 2),
             |l AS (SELECT w1, sum(c12) AS c1, count(*) AS n1fwd FROM big GROUP BY w1),
             |r AS (SELECT w2, count(*) AS n1bwd FROM big GROUP BY w2),
             |t AS (SELECT count(*) AS nn FROM big)
             |SELECT big.w1, big.w2, CAST(c12 AS BIGINT) AS c12,
             |       round((CAST(c12 AS DOUBLE) - 0.75) / c1
             |             + 0.75 * n1fwd / c1 * (CAST(n1bwd AS DOUBLE) / nn), 6)
             |         AS p_kn
             |FROM big JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN t
             |ORDER BY c12 DESC, w1, w2 LIMIT 50""".stripMargin)),

    // IVF-PQ with residual encoding — the billion-vector ANN composition
    // (FAISS's IVFPQ shape): coarse k-means routes each vector to a cell,
    // the RESIDUAL (vector − cell centroid) is product-quantized with
    // global per-subspace codebooks, and a query probes its nprobe=2
    // nearest cells scoring candidates by exact ADC lookup sums. Fully
    // integer-exact: centroids and codebook entries round to the milli
    // grid (deterministic Lloyd variant), so residuals, LUT distances,
    // and ADC sums are all BIGINT — no float ever, hence no fold-order
    // hazard. Scale shape: centroids/codebooks are k×dim tiny and
    // broadcast; the corpus shuffles once per Lloyd pass and once to
    // encode; query-side tables (routes, LUTs) grow with |queries| and
    // are therefore shuffled, never broadcast. Approximate → oracle-N;
    // Round10hhSpec bounds recall@10 against the exact integer top-10.
    "sim_ann_ivfpq_residual" -> Decl(
      (s, d) => {
        val q = Round9.quantized(s, d)
          .withColumn("s_id", expr("i div 8")).localCheckpoint(true)
        val seeds = Tables(s, d, "embeddings")
          .select(col("vec_id")).orderBy("vec_id").limit(4)
        // --- coarse quantizer: k=4, 2 Lloyd passes, integer centroids
        var coarse = q.join(broadcast(seeds), "vec_id")
          .select(col("vec_id").as("cell"), col("i"), col("x").as("cc"))
        for (_ <- 1 to 2) {
          val assign = q.join(broadcast(coarse), "i")
            .groupBy(col("vec_id"), col("cell"))
            .agg(sum((col("x") - col("cc")) * (col("x") - col("cc"))).as("d2"))
            .groupBy("vec_id")
            .agg(min(struct(col("d2"), col("cell"))).as("m"))
            .select(col("vec_id"), col("m.cell").as("cell"))
          coarse = assign.join(q, "vec_id")
            .groupBy("cell", "i").agg(intMean("x").as("cc"))
            .localCheckpoint(true)
        }
        val cellOf = q.join(broadcast(coarse), "i")
          .groupBy(col("vec_id"), col("cell"))
          .agg(sum((col("x") - col("cc")) * (col("x") - col("cc"))).as("d2"))
          .groupBy("vec_id")
          .agg(min(struct(col("d2"), col("cell"))).as("m"))
          .select(col("vec_id"), col("m.cell").as("cell"))
        // --- integer residuals vs the assigned cell's centroid
        val resid = q.join(cellOf, "vec_id")
          .join(broadcast(coarse), Seq("cell", "i"))
          .select(col("vec_id"), col("cell"), col("s_id"), col("i"),
                  (col("x") - col("cc")).as("r"))
          .localCheckpoint(true)
        // --- global per-subspace codebooks on residuals: k=8, 2 passes
        // (8-entry codebooks are the practical floor; k=4 measured recall
        // 0.13 at sf0.001, k=8 clears the 0.15 bound, broadcast stays tiny)
        val cbSeeds = Tables(s, d, "embeddings")
          .select(col("vec_id")).orderBy("vec_id").limit(8)
        var cb = resid.join(broadcast(cbSeeds), "vec_id")
          .select(col("s_id"), col("vec_id").as("code"), col("i"),
                  col("r").as("cb"))
        for (_ <- 1 to 2) {
          val enc = resid.join(broadcast(cb), Seq("s_id", "i"))
            .groupBy(col("vec_id"), col("s_id"), col("code"))
            .agg(sum((col("r") - col("cb")) * (col("r") - col("cb"))).as("d2"))
            .groupBy("vec_id", "s_id")
            .agg(min(struct(col("d2"), col("code"))).as("m"))
            .select(col("vec_id"), col("s_id"), col("m.code").as("code"))
          cb = enc.join(resid, Seq("vec_id", "s_id"))
            .groupBy("s_id", "code", "i").agg(intMean("r").as("cb"))
            .localCheckpoint(true)
        }
        val codes = resid.join(broadcast(cb), Seq("s_id", "i"))
          .groupBy(col("vec_id"), col("cell"), col("s_id"), col("code"))
          .agg(sum((col("r") - col("cb")) * (col("r") - col("cb"))).as("d2"))
          .groupBy("vec_id", "cell", "s_id")
          .agg(min(struct(col("d2"), col("code"))).as("m"))
          .select(col("vec_id"), col("cell"), col("s_id"),
                  col("m.code").as("code"))
          .localCheckpoint(true)
        // --- query side: route to nprobe=2 cells, LUT on query residuals
        val qv = q.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("s_id"), col("i"),
                  col("x").as("qx"))
        val route = qv.join(broadcast(coarse), "i")
          .groupBy(col("q_id"), col("cell"))
          .agg(sum((col("qx") - col("cc")) * (col("qx") - col("cc"))).as("d2"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("q_id").orderBy(col("d2"), col("cell"))))
          .filter(col("rk") <= 2)
          .select("q_id", "cell")
        val qresid = qv.join(route, "q_id")
          .join(broadcast(coarse), Seq("cell", "i"))
          .select(col("q_id"), col("cell"), col("s_id"), col("i"),
                  (col("qx") - col("cc")).as("qr"))
        val lut = qresid.join(broadcast(cb), Seq("s_id", "i"))
          .groupBy(col("q_id"), col("cell"), col("s_id"), col("code"))
          .agg(sum((col("qr") - col("cb")) * (col("qr") - col("cb"))).as("d"))
        // --- exact-integer ADC over the probed cells' codes
        val w = Window.partitionBy("q_id").orderBy(col("adc"), col("vec_id"))
        codes.join(lut, Seq("cell", "s_id", "code"))
          .filter(col("vec_id") =!= col("q_id"))
          .groupBy("q_id", "vec_id")
          .agg(sum(col("d")).as("adc"), count(lit(1)).as("nsub"))
          .filter(col("nsub") === 8) // all 8 subspace LUT hits present
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("q_id"), col("rank").cast("bigint").as("rank"),
                  col("vec_id"))
          .orderBy("q_id", "rank")
      },
      None),

    // Poisson bootstrap CI for the mean event value: per (row, resample),
    // weight ~ Poisson(1) derived from md5(resample:event_id) against the
    // fixed CDF thresholds above — row-order- and partitioning-independent,
    // so the 32 resample means are reproducible on any cluster. Weighted
    // sums stay exact BIGINTs (weight × cents); each mean is one terminal
    // division; the CI is the 2nd-smallest / 2nd-largest of the 32 sorted
    // means (a ~93.75% percentile interval). One scan fans out ×32 via a
    // broadcast spine into one partial-aggregating shuffle of 32 groups.
    "agg_bootstrap_ci" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), round(col("value") * 100).cast("bigint").as("c"))
        val spine = ev.sparkSession.range(0, 32).select(col("id").as("b"))
        val h = substring(md5(concat(col("b").cast("string"), lit(":"),
                                     col("event_id").cast("string"))), 1, 6)
        val w = PoissonThresholds.zipWithIndex
          .foldRight(lit(PoissonThresholds.size.toLong)) {
            case ((t, k), els) => when(h < lit(t), k.toLong).otherwise(els)
          }
        val means = ev.crossJoin(broadcast(spine))
          .select(col("b"), col("c"), w.as("w"))
          .groupBy("b")
          .agg(sum(col("w")).as("n"), sum(col("w") * col("c")).as("sum_wc"))
          .select(col("b"),
                  round(col("sum_wc").cast("double") / col("n").cast("double"), 6)
                    .as("mean_c"))
        means.agg(array_sort(collect_list(col("mean_c"))).as("ms"))
          .select(lit(32L).as("n_resamples"),
                  element_at(col("ms"), 2).as("ci_lo"),
                  element_at(col("ms"), 31).as("ci_hi"))
      },
      Some(s"""WITH spine AS (SELECT unnest(generate_series(0, 31)) AS b),
             |ev AS (SELECT event_id, CAST(round(value * 100) AS BIGINT) AS c
             |       FROM events),
             |wts AS (SELECT b, c,
             |          CASE ${PoissonThresholds.zipWithIndex.map { case (t, k) =>
                          s"WHEN substr(md5(CAST(b AS VARCHAR) || ':' || CAST(event_id AS VARCHAR)), 1, 6) < '$t' THEN $k"
                        }.mkString(" ")}
             |          ELSE ${PoissonThresholds.size} END AS w
             |        FROM ev CROSS JOIN spine),
             |means AS (SELECT b,
             |            round(CAST(sum(w * c) AS DOUBLE)
             |                  / CAST(sum(w) AS DOUBLE), 6) AS mean_c
             |          FROM wts GROUP BY b)
             |SELECT CAST(32 AS BIGINT) AS n_resamples,
             |       (SELECT mean_c FROM means ORDER BY mean_c LIMIT 1 OFFSET 1)
             |         AS ci_lo,
             |       (SELECT mean_c FROM means ORDER BY mean_c DESC LIMIT 1 OFFSET 1)
             |         AS ci_hi""".stripMargin))
  )
}
