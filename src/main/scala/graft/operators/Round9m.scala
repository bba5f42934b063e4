package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-9 thirteenth wave: exact mergeable distinct counting via bitmap
  * aggregates, and the language-ID confusion matrix (classifier
  * evaluation as a first-class operator).
  */
object Round9m {

  val decls: Map[String, Decl] = Map(
    // Exact mergeable distinct — the roaring-bitmap pattern through
    // Spark's native bitmap aggregates: per (segment, bucket) a bitmap of
    // user-id bit positions, per-segment distinct = Σ bitmap_count, and
    // the ALL row merges the STORED per-segment bitmaps with
    // bitmap_or_agg — union cardinality without re-touching raw ids, the
    // exact complement to agg_hll_sketch_union's approximate rollup.
    // Unlike HLL this is oracle-Y: bitmap counting is exact, so DuckDB's
    // plain count(DISTINCT) must hash-match. Scale: state per group is
    // bucket-count × 4 KB bitmaps; ids shuffle once into (segment,
    // bucket) partials.
    "agg_bitmap_distinct" -> Decl(
      (s, d) => {
        val buckets = Tables.events(s, d)
          .select(col("event_type"),
                  expr("bitmap_bucket_number(user_id)").as("bkt"),
                  col("user_id"))
          .groupBy("event_type", "bkt")
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
        val perType = buckets
          .groupBy("event_type")
          .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))
        val allRow = buckets
          .groupBy("bkt")
          .agg(expr("bitmap_or_agg(bm)").as("bm"))
          .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))
          .select(lit("ALL").as("event_type"), col("n_distinct"))
        perType.unionByName(allRow).orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
             |         AS n_distinct
             |FROM events GROUP BY event_type
             |UNION ALL
             |SELECT 'ALL', CAST(count(DISTINCT user_id) AS BIGINT) FROM events
             |ORDER BY event_type""".stripMargin)),

    // Language-ID confusion matrix — classifier evaluation as an
    // operator: the (true, predicted) census of text_langid's stopword
    // voter plus per-truth recall in integer ppm (R14). Composes the
    // EXISTING declared key (query and oracle both reused, so the two
    // stay in lockstep if the classifier changes); output is bounded by
    // langs². The fixture languages share one vocabulary, so accuracy is
    // data-limited — the matrix is the point, not the score.
    "text_langid_confusion" -> Decl(
      (s, d) => {
        val pred = PipelineExt.decls("text_langid").query(s, d)
        val cells = pred.groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        val tot = cells.groupBy("lang").agg(sum(col("n")).as("n_true"))
        cells.join(broadcast(tot), "lang")
          .select(col("lang"), col("predicted"), col("n"),
                  expr("(n * 2000000L + n_true) div (2 * n_true)").as("recall_ppm"))
          .orderBy("lang", "predicted")
      },
      Some {
        val inner = PipelineExt.decls("text_langid").oracle.get
        s"""WITH pred AS ($inner),
           |cells AS (SELECT lang, predicted, count(*) AS n
           |          FROM pred GROUP BY 1, 2),
           |tot AS (SELECT lang, sum(n) AS n_true FROM cells GROUP BY 1)
           |SELECT cells.lang, predicted, CAST(n AS BIGINT) AS n,
           |       CAST((n * 2000000 + n_true) // (2 * n_true) AS BIGINT)
           |         AS recall_ppm
           |FROM cells JOIN tot USING (lang)
           |ORDER BY cells.lang, predicted""".stripMargin
      })
  )
}
