package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 wave 54: retrieval and multiple-testing evaluation —
  * NDCG@15 composed on the declared BM25 ranking (the ranking-quality
  * number every search/RAG stack reports) and the Benjamini-Hochberg
  * step-up procedure (the FDR correction an experimentation platform
  * applies before acting on 25 per-segment tests).
  *
  * Determinism: graded relevance is the exact matched-term count; the
  * DCG/IDCG folds run in POSITION order on both engines (sorted-fold
  * discipline over ≤15 terms); the normal CDF is the same
  * Abramowitz-Stegun 26.2.17 polynomial written identically in both
  * engines (IEEE-identical doubles), and every p/threshold comparison
  * happens before the terminal 6-dp round.
  *
  * Scale shape: NDCG's ranked list is rank-limited (GlobalLimit 15
  * under the position window — ScaleSpec's bounded-window guard shape),
  * the ideal-gain ladder is a 3-cell conditional aggregate broadcast
  * onto a 15-row spine; BH runs entirely on the 25-nation grid
  * (domain-bounded — allowlisted in ScaleSpec with that reason).
  */
object Round10xx {

  /** Φ(x) for x ≥ 0, Abramowitz-Stegun 26.2.17 — written once and
    * rendered into BOTH engines' SQL so the double arithmetic is
    * operation-identical. `z` must be a non-negative expression.
    */
  private def phiSql(z: String): String = {
    val t = s"(1.0 / (1.0 + 0.2316419 * $z))"
    s"""(1.0 - 0.3989422804014327 * exp(-($z) * ($z) / 2.0) *
       | (0.319381530 * $t - 0.356563782 * $t * $t
       |  + 1.781477937 * $t * $t * $t - 1.821255978 * $t * $t * $t * $t
       |  + 1.330274429 * $t * $t * $t * $t * $t))""".stripMargin
  }

  val decls: Map[String, Decl] = Map(
    // NDCG@15 for the declared BM25 ranking. Graded relevance = number
    // of distinct query terms the document matches (the bm25 key's own
    // n_terms column, 1..3); gain 2^rel − 1. IDCG places the corpus's
    // best achievable relevances first: the (rel → doc count) ladder is
    // 3 conditional-aggregate cells, crossed onto a 15-position spine.
    "agg_ndcg_at_k" -> Decl(
      (s, d) => {
        val ranked = Round10nn.decls("text_bm25_rank").query(s, d)
          .withColumn("pos",
            row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
          .select(col("pos"), col("n_terms").cast("bigint").as("rel"))
        val dcg = ranked
          .agg(expr("round(aggregate(array_sort(collect_list(struct(pos, rel))), " +
                    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + " +
                    "(pow(2.0, x.rel) - 1.0) / log2(CAST(x.pos AS DOUBLE) + 1.0)), 6)")
                 .as("dcg"),
               count(lit(1)).as("n_ranked"))
        // rel ladder over ALL matching docs (not just the top 15)
        val docs = Tables(s, d, "documents")
        val tf = docs.select(col("doc_id"),
            explode(graft.functions.TextOps.tokens(col("text"))).as("term"))
          .filter(col("term").isin("data", "spark", "query"))
          .groupBy("doc_id").agg(countDistinct(col("term")).as("rel"))
        val ladder = tf.agg(
          sum(when(col("rel") === 3, 1L).otherwise(0L)).as("c3"),
          sum(when(col("rel") === 2, 1L).otherwise(0L)).as("c2"),
          sum(when(col("rel") === 1, 1L).otherwise(0L)).as("c1"))
        val ideal = s.range(1, 16).select(col("id").as("pos"))
          .crossJoin(broadcast(ladder))
          .select(col("pos"),
                  when(col("pos") <= col("c3"), 3L)
                    .when(col("pos") <= col("c3") + col("c2"), 2L)
                    .when(col("pos") <= col("c3") + col("c2") + col("c1"), 1L)
                    .otherwise(0L).as("rel"))
          .agg(expr("round(aggregate(array_sort(collect_list(struct(pos, rel))), " +
                    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + " +
                    "(pow(2.0, x.rel) - 1.0) / log2(CAST(x.pos AS DOUBLE) + 1.0)), 6)")
                 .as("idcg"))
        dcg.crossJoin(broadcast(ideal))
          .select(col("n_ranked"), col("dcg"), col("idcg"),
                  round(col("dcg") / col("idcg"), 6).as("ndcg"))
      },
      Some {
        val inner = Round10nn.decls("text_bm25_rank").oracle.get
        s"""WITH ranked AS ($inner),
           |pos AS (SELECT n_terms AS rel,
           |               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS pos
           |        FROM ranked),
           |dcg AS (SELECT round(list_sum(list(
           |                 (pow(2.0, rel) - 1.0) / log2(CAST(pos AS DOUBLE) + 1.0)
           |                 ORDER BY pos)), 6) AS dcg,
           |               count(*) AS n_ranked
           |        FROM pos),
           |tf AS (SELECT doc_id, count(DISTINCT term) AS rel
           |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |             FROM documents)
           |       WHERE term IN ('data', 'spark', 'query') GROUP BY doc_id),
           |ladder AS (SELECT sum(CASE WHEN rel = 3 THEN 1 ELSE 0 END) AS c3,
           |                  sum(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS c2,
           |                  sum(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS c1
           |           FROM tf),
           |ideal AS (SELECT round(list_sum(list(
           |                   (pow(2.0, CASE WHEN p <= c3 THEN 3
           |                             WHEN p <= c3 + c2 THEN 2
           |                             WHEN p <= c3 + c2 + c1 THEN 1
           |                             ELSE 0 END) - 1.0)
           |                   / log2(CAST(p AS DOUBLE) + 1.0) ORDER BY p)), 6)
           |                  AS idcg
           |          FROM generate_series(1, 15) AS g(p) CROSS JOIN ladder)
           |SELECT CAST(n_ranked AS BIGINT) AS n_ranked, dcg, idcg,
           |       round(dcg / idcg, 6) AS ndcg
           |FROM dcg CROSS JOIN ideal""".stripMargin
      }),

    // Benjamini-Hochberg FDR step-up over 25 per-nation one-sample
    // z-tests (nation mean balance vs the population): rank the
    // p-values ascending, k* = max rank with p ≤ rank·α/m (α = 0.05),
    // reject ranks ≤ k*. The naive per-test α would over-fire on 25
    // simultaneous segments — this is the correction that makes segment
    // scanning honest.
    "agg_benjamini_hochberg" -> Decl(
      (s, d) => {
        val cells = Tables(s, d, "customer")
          .select(col("c_nationkey").cast("bigint").as("nation"),
                  round(col("c_acctbal") * 100).cast("bigint").as("c"))
          .groupBy("nation")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
               sum(col("c") * col("c")).as("q"))
        val glob = cells.agg(sum("n").as("gn"), sum("s").as("gs"),
                             sum("q").as("gq"))
        val m = count(lit(1)).over(Window.partitionBy())
        val withZ = cells.crossJoin(broadcast(glob))
          .withColumn("z", expr(
            """abs(CAST(s AS DOUBLE) / n - CAST(gs AS DOUBLE) / gn) /
              |sqrt((CAST(gq AS DOUBLE) - CAST(gs AS DOUBLE) * gs / gn) / gn / n)
              |""".stripMargin))
          .withColumn("p", expr(s"2.0 * (1.0 - ${phiSql("z")})"))
        val rankedW = Window.orderBy(col("p").asc, col("nation").asc)
        val ranked = withZ
          .withColumn("rnk", row_number().over(rankedW).cast("long"))
          .withColumn("m_tests", m)
          .withColumn("thr",
            col("rnk").cast("double") * 0.05 / col("m_tests").cast("double"))
        val kstar = ranked
          .agg(coalesce(max(when(col("p") <= col("thr"), col("rnk"))), lit(0L))
                 .as("k"))
        ranked.crossJoin(broadcast(kstar))
          .select(col("nation"), col("n"),
                  round(col("z"), 6).as("z"),
                  round(col("p"), 6).as("p"),
                  col("rnk"),
                  round(col("thr"), 6).as("bh_threshold"),
                  when(col("rnk") <= col("k"), 1L).otherwise(0L).as("rejected"))
          .orderBy("rnk")
      },
      Some {
        s"""WITH cells AS (
           |  SELECT CAST(c_nationkey AS BIGINT) AS nation, count(*) AS n,
           |         sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
           |         sum(CAST(round(c_acctbal * 100) AS BIGINT)
           |             * CAST(round(c_acctbal * 100) AS BIGINT)) AS q
           |  FROM customer GROUP BY 1),
           |gpop AS (SELECT sum(n) AS gn, sum(s) AS gs, sum(q) AS gq FROM cells),
           |withz AS (
           |  SELECT nation, n,
           |         abs(CAST(s AS DOUBLE) / n - CAST(gs AS DOUBLE) / gn) /
           |         sqrt((CAST(gq AS DOUBLE) - CAST(gs AS DOUBLE) * gs / gn)
           |              / gn / n) AS z
           |  FROM cells CROSS JOIN gpop),
           |withp AS (SELECT nation, n, z, 2.0 * (1.0 - ${phiSql("z")}) AS p
           |          FROM withz),
           |ranked AS (
           |  SELECT nation, n, z, p,
           |         row_number() OVER (ORDER BY p, nation) AS rnk,
           |         count(*) OVER () AS m_tests
           |  FROM withp),
           |thr AS (SELECT *, CAST(rnk AS DOUBLE) * 0.05 / m_tests AS thr
           |        FROM ranked),
           |k AS (SELECT coalesce(max(CASE WHEN p <= thr THEN rnk END), 0) AS k
           |      FROM thr)
           |SELECT nation, CAST(n AS BIGINT) AS n,
           |       round(z, 6) AS z, round(p, 6) AS p,
           |       CAST(rnk AS BIGINT) AS rnk,
           |       round(thr, 6) AS bh_threshold,
           |       CAST(CASE WHEN rnk <= k THEN 1 ELSE 0 END AS BIGINT)
           |         AS rejected
           |FROM thr CROSS JOIN k ORDER BY rnk""".stripMargin
      })
  )
}
