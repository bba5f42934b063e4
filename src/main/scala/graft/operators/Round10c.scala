package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 third wave: training-data governance and evaluation operators —
  * k-anonymity audit, snapshot drift profiling, exact ECDF grid, n-gram
  * novelty scoring, deterministic negative-pair sampling, and rolling
  * correlation. Determinism discipline as everywhere in the repo: counts
  * and cents stay BIGINT end-to-end, floats appear only in terminal
  * `round(x, 6)` ratios / one sqrt tree over exact integer sufficient
  * statistics, and every ORDER BY ends in a unique key (SURVEY §7.3).
  */
object Round10c {

  val decls: Map[String, Decl] = Map(
    // k-anonymity audit over quasi-identifiers (nation × segment ×
    // $1000-balance band): the privacy gate a training corpus derived
    // from user data must pass. Cells histogram by anonymity class
    // k_class = min(cell size, 6) — class 1..2 cells are re-identifiable.
    // One shuffle on the QI key with partial aggregation; the histogram
    // is a second bounded-key (6-row) aggregate.
    "quality_k_anonymity" -> Decl(
      (s, d) => {
        Tables(s, d, "customer")
          .select(col("c_nationkey"), col("c_mktsegment"),
                  floor(round(col("c_acctbal") * 100) / 100000.0d)
                    .cast("bigint").as("bal_band"))
          .groupBy("c_nationkey", "c_mktsegment", "bal_band")
          .agg(count(lit(1)).as("cell_n"))
          .groupBy(least(col("cell_n"), lit(6L)).as("k_class"))
          .agg(count(lit(1)).as("n_cells"),
               sum(col("cell_n")).as("n_customers"))
          .orderBy("k_class")
      },
      Some("""WITH cells AS (
             |  SELECT c_nationkey, c_mktsegment,
             |         CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT)
             |                    / 100000.0) AS BIGINT) AS bal_band,
             |         count(*) AS cell_n
             |  FROM customer GROUP BY 1, 2, 3)
             |SELECT CAST(least(cell_n, 6) AS BIGINT) AS k_class,
             |       CAST(count(*) AS BIGINT) AS n_cells,
             |       CAST(sum(cell_n) AS BIGINT) AS n_customers
             |FROM cells GROUP BY 1 ORDER BY k_class""".stripMargin)),

    // Snapshot drift: the same per-priority profile computed on two year
    // snapshots of orders, joined to a drift report — the data-quality
    // monitor between pipeline runs. Means never materialize as floats
    // until the one terminal rounded ratio of exact integer sums; the
    // cross-multiplied numerator (cb·na − ca·nb) is the exact drift sign.
    "quality_snapshot_drift" -> Decl(
      (s, d) => {
        val o = Tables(s, d, "orders")
          .select(col("o_orderpriority"),
                  year(col("o_orderdate")).as("yr"),
                  round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        val prof = o.filter(col("yr").isin(1996, 1997))
          .groupBy("o_orderpriority", "yr")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
        val a = prof.filter(col("yr") === 1996)
          .select(col("o_orderpriority"), col("n").as("na"), col("c").as("ca"))
        val b = prof.filter(col("yr") === 1997)
          .select(col("o_orderpriority"), col("n").as("nb"), col("c").as("cb"))
        a.join(b, "o_orderpriority")
          .select(col("o_orderpriority"), col("na"), col("nb"),
                  (col("cb") * col("na") - col("ca") * col("nb")).as("drift_num"),
                  round((col("cb").cast("double") / col("nb")
                          - col("ca").cast("double") / col("na"))
                        / (col("ca").cast("double") / col("na")) * 1e6, 6)
                    .as("drift_ppm"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH o AS (SELECT o_orderpriority, year(o_orderdate) AS yr,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |           FROM orders WHERE year(o_orderdate) IN (1996, 1997)),
             |prof AS (SELECT o_orderpriority, yr, count(*) AS n,
             |           CAST(sum(cents) AS BIGINT) AS c
             |         FROM o GROUP BY 1, 2)
             |SELECT a.o_orderpriority,
             |       CAST(a.n AS BIGINT) AS na, CAST(b.n AS BIGINT) AS nb,
             |       CAST(b.c * a.n - a.c * b.n AS BIGINT) AS drift_num,
             |       round((CAST(b.c AS DOUBLE) / b.n - CAST(a.c AS DOUBLE) / a.n)
             |             / (CAST(a.c AS DOUBLE) / a.n) * 1e6, 6) AS drift_ppm
             |FROM prof a JOIN prof b USING (o_orderpriority)
             |WHERE a.yr = 1996 AND b.yr = 1997
             |ORDER BY a.o_orderpriority""".stripMargin)),

    // Exact ECDF on a fixed $50k grid over order totals: per occupied
    // bucket, the cumulative count and F(x) — the distribution fingerprint
    // two pipeline runs diff against each other. One bounded-key (≤11)
    // aggregate; the cumulative sum runs over the 11-row bucket spine.
    "agg_ecdf_grid" -> Decl(
      (s, d) => {
        val w = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val bucketed = Tables(s, d, "orders")
          .select(least(floor(round(col("o_totalprice") * 100) / 5000000.0d), lit(10.0d))
                    .cast("bigint").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
        val total = bucketed.agg(sum("n").as("tot"))
        bucketed
          .select(col("bucket"), sum(col("n")).over(w).as("n_le"))
          .join(broadcast(total))
          .select(col("bucket"), col("n_le"),
                  round(col("n_le").cast("double") / col("tot") * 1e6, 6)
                    .as("f_ppm"))
          .orderBy("bucket")
      },
      Some("""WITH b AS (SELECT CAST(least(floor(CAST(round(o_totalprice * 100) AS BIGINT)
             |                            / 5000000.0), 10) AS BIGINT) AS bucket,
             |                  count(*) AS n
             |           FROM orders GROUP BY 1),
             |c AS (SELECT bucket,
             |        sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS n_le,
             |        sum(n) OVER () AS tot
             |      FROM b)
             |SELECT bucket, CAST(n_le AS BIGINT) AS n_le,
             |       round(CAST(n_le AS DOUBLE) / tot * 1e6, 6) AS f_ppm
             |FROM c ORDER BY bucket""".stripMargin)),

    // N-gram novelty: per doc (in doc_id order), the share of its distinct
    // word bigrams not seen in any earlier document — the incremental
    // value score for corpus curation (a doc full of already-seen n-grams
    // adds little). First-occurrence is min(doc_id) per gram: one shuffle
    // on the gram key with partial min, then one join back on the same
    // key — both corpus-sized but co-partitioned, no broadcast of
    // anything unbounded.
    "text_ngram_novelty" -> Decl(
      (s, d) => {
        val sh = Tables(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("doc_id"), explode(expr(
            "array_distinct(transform(slice(t, 1, size(t) - 1), (x, i) -> concat(x, ' ', t[i + 1])))"))
            .as("g"))
        val first = sh.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
        sh.join(first, "g")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
               sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
                 .as("n_novel"))
          .select(col("doc_id"), col("n_grams"), col("n_novel"),
                  round(col("n_novel").cast("double") / col("n_grams") * 1e6, 6)
                    .as("novelty_ppm"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sh AS (SELECT DISTINCT doc_id, g FROM (
             |  SELECT doc_id,
             |         unnest(list_transform(generate_series(1, len(t) - 1),
             |                               i -> t[i] || ' ' || t[i + 1])) AS g
             |  FROM tok WHERE len(t) >= 2)),
             |first AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g)
             |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             |       CAST(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_novel,
             |       round(CAST(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
             |                  AS DOUBLE) / count(*) * 1e6, 6) AS novelty_ppm
             |FROM sh JOIN first USING (g)
             |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin)),

    // Deterministic negative sampling for contrastive training: three
    // pseudo-random (Knuth-hash arithmetic, no RNG) partner docs per
    // anchor, self-pairs dropped, partner metadata joined back. Pure
    // integer arithmetic so both engines mint identical pairs; the
    // partner join is one co-partitioned shuffle on doc_id.
    "sample_negative_pairs" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val n = docs.agg(count(lit(1)).as("n"))
        val pairs = docs.select(col("doc_id"), col("lang"))
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("lang"),
                  explode(expr("array(1L, 2L, 3L)")).as("j"), col("n"))
          .select(col("doc_id"), col("lang"), col("j"),
                  pmod(col("doc_id") * lit(2654435761L) + col("j") * lit(40503L),
                       col("n")).as("neg_id"))
          .filter(col("neg_id") =!= col("doc_id"))
        pairs
          .join(docs.select(col("doc_id").as("neg_id"),
                            col("lang").as("neg_lang"),
                            col("source").as("neg_source")), "neg_id")
          .select(col("doc_id"), col("j"), col("neg_id"),
                  col("lang"), col("neg_lang"), col("neg_source"))
          .orderBy("doc_id", "j")
      },
      Some("""WITH n AS (SELECT count(*) AS n FROM documents),
             |pairs AS (
             |  SELECT d.doc_id, d.lang, j.j,
             |         (d.doc_id * 2654435761 + j.j * 40503) % n.n AS neg_id
             |  FROM documents d
             |       CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j
             |       CROSS JOIN n)
             |SELECT p.doc_id, CAST(p.j AS BIGINT) AS j,
             |       CAST(p.neg_id AS BIGINT) AS neg_id,
             |       p.lang, b.lang AS neg_lang, b.source AS neg_source
             |FROM pairs p JOIN documents b ON b.doc_id = p.neg_id
             |WHERE p.neg_id <> p.doc_id
             |ORDER BY p.doc_id, p.j""".stripMargin)),

    // Rolling 20-event Pearson correlation between a user's event value
    // and its sequence position — the trend-coupling monitor. All five
    // sufficient statistics are exact BIGINT window sums over the trailing
    // frame (cents ≤ 10⁵, rank ≤ 10⁴: no overflow within 2⁶³); the only
    // float is one terminal guarded sqrt tree rounded to 6 dp. The window
    // partitions by user (bounded per-user history), never globally.
    "window_rolling_corr" -> Decl(
      (s, d) => {
        val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val f = ord.rowsBetween(-19, 0)
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
                  round(col("value") * 100).cast("bigint").as("x"))
          .withColumn("y", row_number().over(ord).cast("bigint"))
          .select(col("user_id"), col("event_id"),
                  count(lit(1)).over(f).as("n"),
                  sum(col("x")).over(f).as("sx"), sum(col("y")).over(f).as("sy"),
                  sum(col("x") * col("x")).over(f).as("sxx"),
                  sum(col("y") * col("y")).over(f).as("syy"),
                  sum(col("x") * col("y")).over(f).as("sxy"))
          .filter(col("n") === 20)
          .select(col("user_id"), col("event_id"),
                  round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
                        / sqrt(nullif(((col("n") * col("sxx") - col("sx") * col("sx"))
                                 * (col("n") * col("syy") - col("sy") * col("sy")))
                                 .cast("double"), lit(0.0d))), 6)
                    .as("corr20"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id,
             |             CAST(round(value * 100) AS BIGINT) AS x,
             |             CAST(row_number() OVER
             |               (PARTITION BY user_id ORDER BY ts, event_id)
             |               AS BIGINT) AS y
             |           FROM events),
             |s AS (SELECT user_id, event_id,
             |        count(*) OVER w AS n,
             |        sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             |        sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
             |        sum(x * y) OVER w AS sxy
             |      FROM e
             |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id,
             |       round(CAST(n * sxy - sx * sy AS DOUBLE)
             |             / sqrt(CAST(nullif((n * sxx - sx * sx)
             |                                * (n * syy - sy * sy), 0)
             |                         AS DOUBLE)), 6) AS corr20
             |FROM s WHERE n = 20 ORDER BY user_id, event_id""".stripMargin))
  )
}
