package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 sixteenth wave: first-order Markov transition mining over
  * per-user event sequences, and the multimodal plumbing pieces composed
  * into one end-to-end per-document feature pipeline.
  */
object Round9p {

  val decls: Map[String, Decl] = Map(
    // Markov transition matrix — P(next type | current type) from every
    // user's event sequence: the sequence-mining staple behind
    // next-action prediction and anomaly scoring. Transitions come from
    // ONE lag over the user partitioning (R2 tie-break), counts are
    // exact BIGINTs on the bounded type×type grid, and row-conditional
    // probabilities ship as integer ppm (R14). Scale: one window + one
    // bounded groupBy; the matrix is alphabet², never data-sized.
    "agg_markov_transitions" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val pairs = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  unix_micros(col("ts")).as("us"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"),
                   col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val tot = pairs.groupBy("from_type").agg(sum(col("n")).as("n_from"))
        pairs.join(broadcast(tot), "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
                  expr("(n * 2000000L + n_from) div (2 * n_from)").as("p_ppm"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |             epoch_us(ts) AS us,
             |             lead(event_type) OVER (PARTITION BY user_id
             |               ORDER BY epoch_us(ts), event_id) AS next_type
             |           FROM events),
             |p AS (SELECT event_type AS from_type, next_type AS to_type,
             |        count(*) AS n
             |      FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT from_type, sum(n) AS n_from FROM p GROUP BY 1)
             |SELECT p.from_type, to_type, CAST(n AS BIGINT) AS n,
             |       CAST((n * 2000000 + n_from) // (2 * n_from) AS BIGINT)
             |         AS p_ppm
             |FROM p JOIN t USING (from_type)
             |ORDER BY p.from_type, to_type""".stripMargin)),

    // End-to-end multimodal pipeline — the plumbing quartet composed into
    // one deliverable: binary payload in → 256-byte frame expansion
    // (typed mapPartitions, exactly where a decoder batches) → per-doc
    // feature aggregation (frame count, byte volume, mean head-byte as
    // integer ppm) joined back to the metadata. Proves the stages
    // compose as one lazy plan — the frame stage never materializes to
    // storage between steps.
    "multimodal_end2end" -> Decl(
      (s, d) => {
        val sp = s; import sp.implicits._
        val frames = Tables(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.flatMap { case (id, payload) =>
              payload.grouped(256).zipWithIndex.map {
                case (frame, i) => (id, i, frame.length, frame(0) & 0xFF)
              }
            }
          }
          .toDF("doc_id", "frame_id", "frame_bytes", "head_byte")
        val feat = frames.groupBy("doc_id")
          .agg(count(lit(1)).as("n_frames"),
               sum(col("frame_bytes").cast("bigint")).as("total_bytes"),
               sum(col("head_byte").cast("bigint")).as("head_sum"))
          .select(col("doc_id"), col("n_frames"), col("total_bytes"),
                  expr("(head_sum * 2000000L + n_frames) div (2 * n_frames)")
                    .as("mean_head_ppm"))
        Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"))
          .join(feat, "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH f AS (
             |  SELECT doc_id, i,
             |    least(256, n_chars - i * 256) AS fb,
             |    ascii(substr(text, i * 256 + 1, 1)) AS hb
             |  FROM documents,
             |    unnest(generate_series(0, CAST(ceil(n_chars / 256.0) AS INT) - 1)) t(i)
             |  WHERE i * 256 < n_chars),
             |g AS (SELECT doc_id, count(*) AS n_frames,
             |        sum(fb) AS total_bytes, sum(hb) AS head_sum
             |      FROM f GROUP BY 1)
             |SELECT d.doc_id, d.lang, CAST(n_frames AS BIGINT) AS n_frames,
             |       CAST(total_bytes AS BIGINT) AS total_bytes,
             |       CAST((head_sum * 2000000 + n_frames) // (2 * n_frames)
             |            AS BIGINT) AS mean_head_ppm
             |FROM documents d JOIN g USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin))
  )
}
