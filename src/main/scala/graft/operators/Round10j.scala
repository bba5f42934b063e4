package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 tenth wave: seasonal decomposition, diversity indices, corpus
  * vocabulary growth, and phone normalization. The decomposition keeps
  * every intermediate in EXACT integer units of 1/25 (the trend window
  * width) so no float survives past the single terminal rounding; all
  * other statistics follow the usual integer-sufficient-statistics rule.
  */
object Round10j {

  val decls: Map[String, Decl] = Map(
    // Additive seasonal decomposition of the hourly traffic series:
    // trend = centered 25-hour moving sum (kept as the SUM — integer,
    // i.e. 25× the mean), detrended = 25·c − trend25 (still integer),
    // seasonal(hour-of-day) = mean of detrended — one terminal rounded
    // division by 25·n. Both windows ride the BOUNDED global hour spine
    // (the aggregate collapses events first).
    "ts_seasonal_additive" -> Decl(
      (s, d) => {
        val spine = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 3600000000L").as("hr"))
          .agg(count(lit(1)).as("c"))
        val w = Window.orderBy("hr").rowsBetween(-12, 12)
        spine
          .withColumn("n_win", count(lit(1)).over(w))
          .withColumn("trend25", sum(col("c")).over(w))
          .filter(col("n_win") === 25) // full windows only
          .select(pmod(col("hr"), lit(24L)).as("hod"),
                  (col("c") * 25 - col("trend25")).as("detr25"))
          .groupBy("hod")
          .agg(count(lit(1)).as("n"), sum(col("detr25")).as("detr_sum25"))
          .select(col("hod"), col("n"), col("detr_sum25"),
                  round(col("detr_sum25").cast("double") / (col("n") * 25), 6)
                    .as("seasonal"))
          .orderBy("hod")
      },
      Some("""WITH spine AS (
             |  SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
             |         count(*) AS c
             |  FROM events GROUP BY 1),
             |t AS (SELECT hr, c,
             |        count(*) OVER w AS n_win,
             |        sum(c) OVER w AS trend25
             |      FROM spine
             |      WINDOW w AS (ORDER BY hr ROWS BETWEEN 12 PRECEDING
             |                   AND 12 FOLLOWING)),
             |detr AS (SELECT hr % 24 AS hod, c * 25 - trend25 AS detr25
             |         FROM t WHERE n_win = 25)
             |SELECT CAST(hod AS BIGINT) AS hod, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(detr25) AS BIGINT) AS detr_sum25,
             |       round(CAST(sum(detr25) AS DOUBLE) / (count(*) * 25), 6)
             |         AS seasonal
             |FROM detr GROUP BY hod ORDER BY hod""".stripMargin)),

    // Simpson diversity (1 − Σ share²) of each user's event-type mix —
    // the probability two random events differ in type; the quadratic
    // companion of agg_entropy_bygroup. (n² − Σc²)/n² keeps everything
    // integer until one terminal division.
    "agg_diversity_simpson" -> Decl(
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
          .groupBy("user_id")
          .agg(sum(col("c")).as("n"),
               sum(col("c") * col("c")).as("sum_c2"))
          .select(col("user_id"), col("n"),
                  round((col("n") * col("n") - col("sum_c2")).cast("double")
                        / (col("n") * col("n")).cast("double"), 6).as("simpson"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id, event_type, count(*) AS c
             |           FROM events GROUP BY 1, 2),
             |s AS (SELECT user_id, sum(c) AS n, sum(c * c) AS sum_c2
             |      FROM c GROUP BY user_id)
             |SELECT user_id, CAST(n AS BIGINT) AS n,
             |       round(CAST(n * n - sum_c2 AS DOUBLE)
             |             / CAST(n * n AS DOUBLE), 6) AS simpson
             |FROM s ORDER BY user_id""".stripMargin)),

    // Heaps'-law vocabulary growth: cumulative distinct words vs
    // cumulative tokens at every 50-document checkpoint, scanning the
    // corpus ONCE — vocabulary via first-occurrence doc (min doc_id per
    // word, the text_ngram_novelty machinery), both curves as cumulative
    // sums over the bounded checkpoint spine.
    "text_vocab_growth" -> Decl(
      (s, d) => {
        val tok = Tables(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val tokensPerCkpt = tok
          .groupBy(expr("doc_id div 50").as("ckpt"))
          .agg(count(lit(1)).as("toks"))
        val vocabPerCkpt = tok.groupBy("w").agg(min(col("doc_id")).as("first_doc"))
          .groupBy(expr("first_doc div 50").as("ckpt"))
          .agg(count(lit(1)).as("new_words"))
        // The checkpoint spine is doc_id div 50 — it grows WITH the
        // corpus, so both curves use the shared-order distributed prefix
        // sum (one range exchange, one local pass), never an
        // unpartitioned window (round-9 verdict family).
        val spine = tokensPerCkpt.join(vocabPerCkpt, Seq("ckpt"), "full")
          .select(col("ckpt"),
                  coalesce(col("toks"), lit(0L)).as("t0"),
                  coalesce(col("new_words"), lit(0L)).as("v0"))
        PrefixSum.cumsumLongs(spine, Seq(col("ckpt")),
            Seq(col("t0") -> "cum_tokens", col("v0") -> "cum_vocab"))
          .select("ckpt", "cum_tokens", "cum_vocab")
          .orderBy("ckpt")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |             FROM documents),
             |tpc AS (SELECT doc_id // 50 AS ckpt, count(*) AS toks
             |        FROM tok GROUP BY 1),
             |vpc AS (SELECT first_doc // 50 AS ckpt, count(*) AS new_words
             |        FROM (SELECT w, min(doc_id) AS first_doc FROM tok GROUP BY w)
             |        GROUP BY 1)
             |SELECT ckpt,
             |       CAST(sum(coalesce(toks, 0)) OVER (ORDER BY ckpt
             |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
             |       CAST(sum(coalesce(new_words, 0)) OVER (ORDER BY ckpt
             |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
             |FROM tpc FULL JOIN vpc USING (ckpt)
             |ORDER BY ckpt""".stripMargin)),

    // E.164 phone normalization: a deterministic formatted US number per
    // customer ("(303) 555-0142" style with noise punctuation), stripped
    // to digits and prefixed — regexp_replace + concat riding the scan,
    // the log-normalization scalar family.
    "scalar_phone_e164" -> Decl(
      (s, d) => {
        Tables(s, d, "customer")
          .select(col("c_custkey"),
                  concat(lit("("), lpad((col("c_custkey") % 800L + 200L).cast("string"), 3, "0"),
                         lit(") "), lpad((col("c_custkey") * 7L % 1000L).cast("string"), 3, "0"),
                         lit("-"), lpad((col("c_custkey") * 13L % 10000L).cast("string"), 4, "0"))
                    .as("raw"))
          .select(col("c_custkey"), col("raw"),
                  concat(lit("+1"), regexp_replace(col("raw"), "[^0-9]", ""))
                    .as("e164"),
                  length(regexp_replace(col("raw"), "[^0-9]", ""))
                    .cast("bigint").as("n_digits"))
          .orderBy("c_custkey")
      },
      Some("""WITH r AS (
             |  SELECT c_custkey,
             |         '(' || lpad(CAST(c_custkey % 800 + 200 AS VARCHAR), 3, '0') ||
             |         ') ' || lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0') ||
             |         '-' || lpad(CAST(c_custkey * 13 % 10000 AS VARCHAR), 4, '0') AS raw
             |  FROM customer)
             |SELECT c_custkey, raw,
             |       '+1' || regexp_replace(raw, '[^0-9]', '', 'g') AS e164,
             |       CAST(length(regexp_replace(raw, '[^0-9]', '', 'g')) AS BIGINT)
             |         AS n_digits
             |FROM r ORDER BY c_custkey""".stripMargin))
  )
}
