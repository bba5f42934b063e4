package graft.operators

import graft.{Decl, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Round-10 wave 44: BM25 ranking — the retrieval scorer TF-IDF
  * pipelines actually graduate to (and the lexical half of every
  * RAG hybrid-search stack). Okapi BM25 with k1=1.2, b=0.75 and the
  * Lucene-style idf ln((N−df+0.5)/(df+0.5)+1), scored for a fixed
  * 3-term query against the whole corpus.
  *
  * Scale shape: the term filter lands BEFORE the tf explode aggregates
  * anything wide — only postings of the 3 query terms survive (the
  * inverted-index access pattern: work is O(Σ posting lengths), not
  * O(corpus)); df and the (N, avgdl) scalars are one bounded broadcast
  * each; the final cut is a TakeOrdered top-15, never a global sort.
  *
  * Determinism: dlen/avgdl/idf/contribution are each single IEEE
  * expression trees over exact integer statistics (identical in any
  * engine); the ≤3 per-doc contributions fold in TERM order
  * (sorted-fold discipline), and only the final sum rounds.
  */
object Round10nn {

  private val Query = Seq("data", "spark", "query")
  private def qlist = Query.map(t => s"'$t'").mkString(", ")

  val decls: Map[String, Decl] = Map(
    "text_bm25_rank" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val tok = docs.select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("term"))
        val dl = docs.select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("bigint").as("dlen"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
                           sum(col("dlen")).as("toklen"))
        val tf = tok.filter(col("term").isin(Query: _*))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
        val dfq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
        val contrib = tf.join(broadcast(dfq), "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("avgdl",
            col("toklen").cast("double") / col("n_docs").cast("double"))
          .withColumn("idf", log(
            (col("n_docs").cast("double") - col("dfreq") + 0.5d) /
              (col("dfreq") + 0.5d) + 1.0d))
          .withColumn("c",
            col("idf") * (col("cnt") * 2.2d) /
              (col("cnt") + lit(1.2d) * (lit(0.25d) + lit(0.75d) * col("dlen") / col("avgdl"))))
        contrib.groupBy("doc_id")
          .agg(count(lit(1)).as("n_terms"),
               expr("round(aggregate(array_sort(collect_list(struct(term, c))), " +
                 "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.c), 6)").as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(15)
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |            FROM documents),
             |dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY doc_id),
             |stats AS (SELECT count(*) AS n_docs,
             |                 CAST(sum(dlen) AS DOUBLE) / count(*) AS avgdl
             |          FROM dl),
             |tf AS (SELECT doc_id, term, count(*) AS cnt FROM tok
             |       WHERE term IN ($qlist) GROUP BY doc_id, term),
             |df AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
             |contrib AS (
             |  SELECT tf.doc_id, tf.term,
             |         ln((CAST(n_docs AS DOUBLE) - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
             |           * (cnt * 2.2)
             |           / (cnt + 1.2 * (0.25 + 0.75 * dlen / avgdl)) AS c
             |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
             |       CROSS JOIN stats)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
             |       round(list_sum(list(c ORDER BY term)), 6) AS bm25
             |FROM contrib GROUP BY doc_id
             |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin))
  )
}
