package graft.operators

import graft.{Decl, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Round-10 wave 79: hybrid-retrieval fusion and count-model
  * diagnostics — reciprocal rank fusion of the BM25 (sparse) and
  * embedding-cosine (dense) rankings for the same query document (the
  * standard hybrid-search combiner every RAG stack runs: rank-based,
  * so the two retrievers' incomparable score scales never touch), and
  * a negative-binomial method-of-moments fit of per-user event counts
  * (the overdispersion check that decides whether a Poisson rate model
  * is even admissible — var/mean ≫ 1 means it is not).
  *
  * Determinism: RRF consumes only INTEGER ranks from totally-ordered
  * cuts (score desc, id) — 1/(60+rank) is the same double in both
  * engines, missing ranks contribute exactly 0 via the outer join.
  * The NB moments come from exact DECIMAL(38,0) Σk/Σk² (associativity-
  * free), with identical expression trees downstream.
  *
  * Scale shape: both retrieval cuts are bounded top-k
  * (TakeOrderedAndProject); the fusion joins two ≤50-row lists. The NB
  * fit is one per-user shuffle + one scalar aggregate.
  */
object Round11w {

  val decls: Map[String, Decl] = Map(
    // RRF (k = 60) of BM25-top-15 (reusing the text_bm25_rank scorer
    // verbatim) and cosine-top-50 against document 0's embedding;
    // the query doc itself is excluded from both lists.
    "sim_reciprocal_rank_fusion" -> Decl(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val sparse = Round10nn.decls("text_bm25_rank").query(s, d)
          .filter(col("doc_id") =!= 0)
          .withColumn("ra",
            row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
          .select(col("doc_id"), col("ra"))
        val emb = Tables(s, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        val dense = emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id").as("doc_id"),
                  round(VectorOps.cosine(col("embedding"), col("qe")), 6)
                    .as("cos"))
          .orderBy(col("cos").desc, col("doc_id"))
          .limit(50)
          .withColumn("rb",
            row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))))
          .select(col("doc_id"), col("rb"))
        sparse.join(dense, Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("ra"), col("rb"),
                  (coalesce(lit(1.0) / (col("ra") + 60), lit(0.0)) +
                    coalesce(lit(1.0) / (col("rb") + 60), lit(0.0))).as("rrf"))
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(20)
          .select(col("doc_id"),
                  col("ra").cast("bigint").as("sparse_rank"),
                  col("rb").cast("bigint").as("dense_rank"),
                  round(col("rrf"), 6).as("rrf"))
      },
      Some {
        val bm25 = Round10nn.decls("text_bm25_rank").oracle.get
        s"""WITH bm AS ($bm25),
           |sparse AS (
           |  SELECT doc_id,
           |         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS ra
           |  FROM bm WHERE doc_id <> 0),
           |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
           |      FROM embeddings WHERE vec_id = 0),
           |dense0 AS (
           |  SELECT vec_id AS doc_id,
           |         round(list_cosine_similarity(
           |           list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qe), 6)
           |           AS cos
           |  FROM embeddings CROSS JOIN q WHERE vec_id <> 0
           |  ORDER BY cos DESC, doc_id LIMIT 50),
           |dense AS (
           |  SELECT doc_id,
           |         row_number() OVER (ORDER BY cos DESC, doc_id) AS rb
           |  FROM dense0),
           |fused AS (
           |  SELECT coalesce(sparse.doc_id, dense.doc_id) AS doc_id, ra, rb,
           |         -- CAST: bare 1.0 types DECIMAL in DuckDB and the
           |         -- division would stay DECIMAL (hash-risky)
           |         coalesce(CAST(1.0 AS DOUBLE) / (ra + 60), 0.0) +
           |           coalesce(CAST(1.0 AS DOUBLE) / (rb + 60), 0.0) AS rrf
           |  FROM sparse FULL OUTER JOIN dense USING (doc_id))
           |SELECT doc_id, CAST(ra AS BIGINT) AS sparse_rank,
           |       CAST(rb AS BIGINT) AS dense_rank,
           |       round(rrf, 6) AS rrf
           |FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
      }),

    // Negative-binomial method of moments on per-user event counts:
    // p = mean/var, r = mean²/(var − mean); the dispersion index
    // var/mean is the Poisson-adequacy verdict.
    "agg_negative_binomial_fit" -> Decl(
      (s, d) => {
        val perUser = Tables.events(s, d)
          .groupBy("user_id").agg(count(lit(1)).as("k"))
        perUser.agg(
            count(lit(1)).as("n"),
            sum(col("k").cast("decimal(38,0)")).as("sk"),
            sum((col("k") * col("k")).cast("decimal(38,0)")).as("skk"))
          .withColumn("mean", col("sk").cast("double") / col("n"))
          .withColumn("variance",
            (col("skk").cast("double") -
              col("sk").cast("double") * col("sk").cast("double") / col("n")) /
              (col("n") - 1))
          .withColumn("dispersion", col("variance") / col("mean"))
          .select(col("n").cast("bigint").as("n_users"),
                  round(col("mean"), 6).as("mean_events"),
                  round(col("variance"), 6).as("var_events"),
                  round(col("dispersion"), 6).as("dispersion_index"),
                  round(col("mean") * col("mean") /
                          (col("variance") - col("mean")), 6).as("nb_r"),
                  round(col("mean") / col("variance"), 6).as("nb_p"),
                  (col("variance") > col("mean")).as("overdispersed"))
      },
      Some("""WITH perUser AS (
             |  SELECT user_id, count(*) AS k FROM events GROUP BY user_id),
             |sums AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n,
             |         CAST(sum(CAST(k AS DECIMAL(38,0))) AS DOUBLE) AS sk,
             |         CAST(sum(CAST(k * k AS DECIMAL(38,0))) AS DOUBLE) AS skk
             |  FROM perUser),
             |m AS (
             |  SELECT n, sk / n AS mean,
             |         (skk - sk * sk / n) / (n - 1) AS variance
             |  FROM sums)
             |SELECT CAST(n AS BIGINT) AS n_users,
             |       round(mean, 6) AS mean_events,
             |       round(variance, 6) AS var_events,
             |       round(variance / mean, 6) AS dispersion_index,
             |       round(mean * mean / (variance - mean), 6) AS nb_r,
             |       round(mean / variance, 6) AS nb_p,
             |       variance > mean AS overdispersed
             |FROM m""".stripMargin))
  )
}
