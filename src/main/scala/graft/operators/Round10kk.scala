package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 41: perceptual-hash near-duplicate detection over the
  * OPAQUE BINARY column — the multimodal twin of `dedup_simhash`. The
  * pipeline is the real production shape: binary payload → partition-
  * batched stub decode (a real system hands each batch to an image
  * decoder and thresholds an 8×8 DCT grid; the deterministic stand-in
  * thresholds a 64-point sample grid of the decoded content at its
  * mean) → per-band 16-bit signatures → banded LSH self-join →
  * exact-hamming verify.
  *
  * Pigeonhole completeness: 4 bands, radius 3 — any pair within
  * hamming ≤ 3 differs in at most 3 bands, so at least one band
  * matches and the LSH candidate set provably contains every true
  * pair. Hot buckets (band values shared by > MaxBucket docs) are
  * excluded on BOTH sides — the oracle mirrors the exclusion, so the
  * hash-match pins the exact degraded-completeness contract a scaled
  * deployment would run.
  *
  * Scale shape: signatures are one linear scan (no shuffle); the LSH
  * join shuffles on (band, value) buckets whose occupancy the cap
  * bounds, so pairs-per-doc is O(MaxBucket), never O(N). All
  * signature arithmetic is small exact integers — band values < 2^16,
  * hamming ≤ 64 — so no engine can disagree.
  */
object Round10kk {

  private val MaxBucket = 256
  private val MinPoints = 64

  val decls: Map[String, Decl] = Map(
    "multimodal_phash_dedup" -> Decl(
      (s, d) => {
        val sp = s; import sp.implicits._
        // near-dup test-bed (the dedup-family pattern): corpus ∪
        // perceptually-perturbed copies at +1M — a length-preserving
        // local change (uppercased 5-char prefix), the text stand-in for
        // "same image, slightly different pixels". ~85% of planted pairs
        // land inside the hamming≤3 contract; the rest are legitimately
        // outside it (same shape as dedup_simhash's 350/500 bound).
        val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
        val pert = docs.select((col("doc_id") + 1000000L).as("doc_id"),
          expr("concat(upper(substring(text, 1, 5)), substring(text, 6, length(text)))").as("text"))
        // the opaque binary column (same minting as multimodal_binary_meta)
        val bin = docs.unionAll(pert)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        val sig = bin.as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.flatMap { case (id, payload) =>
              // STUB decode: a real implementation decodes pixels; the
              // stand-in decodes the bytes back to text. Everything after
              // this line is the real pHash shape.
              val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
              val len = text.codePointCount(0, text.length)
              if (len < MinPoints) Iterator.empty
              else {
                val pts = Array.tabulate(64) { i =>
                  val p = (i.toLong * len / 64).toInt
                  text.codePointAt(text.offsetByCodePoints(0, p)).toLong
                }
                val total = pts.sum
                // bit i = sampled point above the grid mean (exact integer
                // cross-multiply — no division, no float)
                val bands = Array.tabulate(4) { b =>
                  var v = 0L
                  for (i <- 0 until 16)
                    if (pts(b * 16 + i) * 64 >= total) v |= (1L << i)
                  v
                }
                Iterator((id, bands(0), bands(1), bands(2), bands(3)))
              }
            }
          }
          .toDF("doc_id", "b0", "b1", "b2", "b3")
          .localCheckpoint(true)
        val long = sig.selectExpr("doc_id",
          "explode(array(struct(0 AS b, b0 AS v), struct(1 AS b, b1 AS v), " +
            "struct(2 AS b, b2 AS v), struct(3 AS b, b3 AS v))) AS e")
          .select(col("doc_id"), col("e.b"), col("e.v"))
        val cold = long.groupBy("b", "v").agg(count(lit(1)).as("n"))
          .filter(col("n") <= MaxBucket).select("b", "v")
        val inBucket = long.join(cold, Seq("b", "v"))
        val cand = inBucket.as("x")
          .join(inBucket.as("y"),
                col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
                  col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct()
        val ham = (0 to 3).map(i =>
          expr(s"bit_count(sa.b$i ^ sb.b$i)")).reduce(_ + _)
        cand
          .join(sig.as("sa"), col("a") === col("sa.doc_id"))
          .join(sig.as("sb"), col("b") === col("sb.doc_id"))
          .select(col("a"), col("b"), ham.cast("int").as("hamming"))
          .filter(col("hamming") <= 3)
          .orderBy("a", "b")
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000, upper(substr(text, 1, 5)) || substr(text, 6)
             |  FROM documents),
             |sig AS (
             |  SELECT doc_id,
             |         list_transform(range(0, 4), b ->
             |           list_sum(list_transform(range(0, 16), i ->
             |             CASE WHEN pts[b * 16 + i + 1] * 64 >= total
             |                  THEN 2 ** i ELSE 0 END))) AS bands
             |  FROM (
             |    SELECT doc_id, pts, CAST(list_sum(pts) AS BIGINT) AS total
             |    FROM (
             |      SELECT doc_id,
             |             list_transform(range(0, 64), i ->
             |               CAST(unicode(substr(text,
             |                 CAST(1 + i * length(text) // 64 AS INT), 1)) AS BIGINT)) AS pts
             |      FROM corpus WHERE length(text) >= $MinPoints))),
             |longs AS (
             |  SELECT doc_id, b, CAST(bands[b + 1] AS BIGINT) AS v
             |  FROM sig, unnest(range(0, 4)) AS t(b)),
             |cold AS (SELECT b, v FROM longs GROUP BY b, v
             |         HAVING count(*) <= $MaxBucket),
             |ib AS (SELECT doc_id, longs.b, longs.v FROM longs JOIN cold USING (b, v)),
             |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             |         FROM ib x JOIN ib y
             |           ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
             |ham AS (
             |  SELECT cand.a, cand.b,
             |         CAST(bit_count(xor(CAST(sa.bands[1] AS BIGINT), CAST(sb.bands[1] AS BIGINT)))
             |            + bit_count(xor(CAST(sa.bands[2] AS BIGINT), CAST(sb.bands[2] AS BIGINT)))
             |            + bit_count(xor(CAST(sa.bands[3] AS BIGINT), CAST(sb.bands[3] AS BIGINT)))
             |            + bit_count(xor(CAST(sa.bands[4] AS BIGINT), CAST(sb.bands[4] AS BIGINT)))
             |           AS INT) AS hamming
             |  FROM cand JOIN sig sa ON cand.a = sa.doc_id
             |            JOIN sig sb ON cand.b = sb.doc_id)
             |SELECT a, b, hamming FROM ham WHERE hamming <= 3
             |ORDER BY a, b""".stripMargin))
  )
}
