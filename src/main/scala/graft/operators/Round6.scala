package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 operator keys — the incremental/analytic passes on top of the
  * round-1..5 surface: snapshot-incremental dedup (the "don't re-dedup
  * 100 TB for a 1 TB delta" shape), information-theoretic mixture
  * diagnostics, time-series gap-fill over a generated spine, a bigram-LM
  * quality score (the two-gram step past text_unigram_nll), frameless
  * window z-score outlier detection, the LEFT OUTER stream-stream join
  * (the state-expiry semantics the inner interval join doesn't cover),
  * and one-pass distributed PCA via a Gram-matrix Aggregator.
  *
  * 100 TB notes inline; the recurring theme: per-key bounded aggregates
  * and broadcast-sized stats tables everywhere, and the two genuinely
  * corpus-sized joins (incremental dedup's anti join, the bigram-LM join)
  * pinned to shuffle joins on their key — never a broadcast of an
  * unbounded side.
  */
object Round6 {

  /** The DuckDB oracle for graph_pagerank: the same 10 PageRank iterations
    * UNROLLED as chained CTEs (one per iteration), which keeps the full
    * fixpoint trajectory SQL-expressible and hash-checkable. Graph: node =
    * doc, out-degree 1 + doc_id%3; the k=1 edge is the cyclic shift
    * (doc_id + 1) mod n — a bijection for EVERY n, not just n coprime to
    * the stride (dst = (doc_id·7+k) mod n alone only covers residues
    * 1..3 mod 7 when 7 | n) — and the k∈{2,3} edges are (doc_id·7+k)
    * mod n. Every node therefore has ≥1 in-link, so no dangling-mass
    * term is needed and total rank mass stays exactly 1 (the
    * mean-normalized ranks sum to n).
    */
  private def pagerankOracleSql: String = {
    val b = new StringBuilder(
      """WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n, count(*) AS ni FROM documents),
        |e AS (SELECT doc_id AS src, 1 + doc_id % 3 AS outdeg,
        |             CASE WHEN t.k = 1 THEN (doc_id + 1) % nn.ni
        |                  ELSE (doc_id * 7 + t.k) % nn.ni END AS dst
        |      FROM documents CROSS JOIN nn, (VALUES (1), (2), (3)) t(k)
        |      WHERE t.k <= 1 + doc_id % 3),
        |pr0 AS (SELECT doc_id, 1.0/nn.n AS r FROM documents CROSS JOIN nn)""".stripMargin)
    (1 to 10).foreach { i =>
      b.append(s""",
        |pr$i AS (SELECT e.dst AS doc_id,
        |             0.15/(SELECT n FROM nn) + 0.85 * sum(p.r / e.outdeg) AS r
        |         FROM pr${i - 1} p JOIN e ON p.doc_id = e.src GROUP BY e.dst)""".stripMargin)
    }
    b.append("""
      |SELECT pr10.doc_id AS doc_id, round(pr10.r * nn.n, 6) AS rank_norm
      |FROM pr10 CROSS JOIN nn ORDER BY doc_id""".stripMargin)
    b.toString
  }

  val decls: Map[String, Decl] = Map(
    // ------------------------------------------------------------- graph
    // PageRank — web-graph quality scoring (the crawl-prioritization
    // signal next to the text quality filters). The Spark side is the
    // shape PageRank takes at a billion edges: the edge table is derived
    // ONCE, explicitly hash-partitioned on src, and persisted — every
    // iteration's join then reads the cached partitioning and only the
    // small (node, rank) table moves, one dst-keyed partial-agg shuffle
    // per iteration. (The single-SQL unrolled form was tried first and
    // REPLANS the edge derivation all 10 times — per-CTE-instance
    // expression ids defeat exchange reuse: 0 ReusedExchange, 62
    // Exchange.) Rank state is localCheckpoint'ed at the loop midpoint,
    // the dedup_connected_components lineage discipline. Rank mass
    // conservation and the teleport floor are asserted in OperatorSpec;
    // the DuckDB oracle hashes the identical unrolled trajectory.
    "graph_pagerank" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents").select(col("doc_id"))
        val nRows = Tables.rowCount(s, d, "documents")
        val n = nRows.toDouble
        val e = docs
          .select(col("doc_id").as("src"),
                  (lit(1L) + pmod(col("doc_id"), lit(3L))).cast("double").as("outdeg"))
          .select(col("src"), col("outdeg"),
                  explode(sequence(lit(1), (lit(1L) + pmod(col("src"), lit(3L))).cast("int")))
                    .as("k"))
          .select(col("src"), col("outdeg"),
                  when(col("k") === 1, pmod(col("src") + 1, lit(nRows)))
                    .otherwise(pmod(col("src") * 7 + col("k"), lit(nRows))).as("dst"))
          .repartition(s.sparkContext.defaultParallelism, col("src"))
          .persist()
        var pr = docs.select(col("doc_id"), lit(1.0 / n).as("r"))
        (1 to 10).foreach { i =>
          pr = pr.join(e, pr("doc_id") === e("src"))
            .groupBy(col("dst"))
            .agg((lit(0.15 / n) + lit(0.85) * sum(col("r") / col("outdeg"))).as("r"))
            .withColumnRenamed("dst", "doc_id")
          // truncate lineage mid-loop so the plan never deepens past ~5
          // iterations of join+agg (the CC loop hygiene)
          if (i == 5) pr = pr.localCheckpoint()
        }
        pr.select(col("doc_id"), round(col("r") * n, 6).as("rank_norm"))
          .orderBy("doc_id")
      },
      Some(pagerankOracleSql)),

    // CCNet-style perplexity bucketing — split each language's docs into
    // head/middle/tail thirds by unigram-LM NLL (the standard
    // quality-tier assignment for pretraining corpora). The LM scoring
    // pass is text_unigram_nll's (vocabulary-bounded broadcast). Tier
    // assignment is NOT an ntile window: `ntile(3) over (partition by
    // lang ...)` funnels every doc of a language through ONE task, and
    // language is the most skewed key in any corpus. Instead the
    // per-lang tertile THRESHOLDS are computed as an aggregate (one row
    // per language — exact interpolated percentile here; swap in
    // approx_percentile at 100 TB), broadcast back, and buckets assigned
    // by comparison — scan-parallel, same tiers. The thresholds are
    // ROUNDED to the same 6-decimal grid as the NLL values: the engines'
    // interpolation formulas differ by an ulp on tied inputs (DuckDB's
    // (1-f)·a + f·b form returned 3.4015459999999997 for a tie AT
    // 3.401546, flipping `nll > t` for the tied docs at sf0.1), while
    // the exact-math threshold is never closer than (b-a)/6 ≥ 1.67e-7
    // to a rounding boundary — so the 6-dp round absorbs the ulp noise
    // identically on both sides.
    "text_perplexity_bucket" -> Decl(
      (s, d) => {
        val tf = Pipeline.docsWithTokens(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), col("lang"), explode(col("toks")).as("term"))
        val lm = tf.groupBy("term").agg(count(lit(1)).as("cnt"))
        val tot = tf.agg(count(lit(1)).as("total"))
        val nll = tf.join(broadcast(lm), "term")
          .crossJoin(broadcast(tot))
          .groupBy("doc_id", "lang")
          .agg(round(-avg(log(col("cnt").cast("double") /
                            col("total").cast("double"))), 6).as("nll"))
        val th = nll.groupBy("lang")
          .agg(round(percentile(col("nll"), lit(1.0 / 3)), 6).as("t1"),
               round(percentile(col("nll"), lit(2.0 / 3)), 6).as("t2"))
        nll.join(broadcast(th), "lang")
          .select(col("doc_id"), col("lang"), col("nll"),
                  (lit(1) + when(col("nll") > col("t1"), 1).otherwise(0)
                          + when(col("nll") > col("t2"), 1).otherwise(0)).as("bucket"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             |lm AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
             |tot AS (SELECT count(*) AS total FROM tok),
             |nll AS (SELECT doc_id, lang,
             |          round(-avg(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))), 6) AS nll
             |        FROM tok JOIN lm USING (term) CROSS JOIN tot
             |        GROUP BY doc_id, lang),
             |th AS (SELECT lang,
             |         round(quantile_cont(nll, CAST(1 AS DOUBLE) / 3), 6) AS t1,
             |         round(quantile_cont(nll, CAST(2 AS DOUBLE) / 3), 6) AS t2
             |       FROM nll GROUP BY lang)
             |SELECT doc_id, nll.lang AS lang, nll,
             |       CAST(1 + CAST(nll > t1 AS INT) + CAST(nll > t2 AS INT) AS INT)
             |         AS bucket
             |FROM nll JOIN th ON nll.lang = th.lang ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------------------------- dedup
    // Snapshot-incremental dedup — the production shape of every corpus
    // refresh: the BASE snapshot is already deduped (its hash index
    // exists); only the incoming DELTA batch is grouped within itself
    // (keep the lowest delta id per content hash) and then anti-joined
    // against the base index. The fixture corpus has no natural dups, so
    // the delta is CONSTRUCTED (same planting family as dedup_exact):
    // case/whitespace-noised copies of the doc_id%5 slice (provably
    // base-duplicates), genuinely new docs from the doc_id%7 slice, and a
    // second copy of the %14 slice (provably within-delta dups). Survivors
    // = the new docs, one per hash. At 100 TB the base side never
    // re-scans its text — the index is (hash) only — and the anti join is
    // pinned to a shuffle join on the hash (a planner-chosen broadcast of
    // the base index is the OOM anti-pattern; the delta is the small
    // side, the base never is).
    "dedup_incremental" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
        val base = docs.select(md5(lower(trim(col("text")))).as("h"))
        val delta = docs.filter(pmod(col("doc_id"), lit(5L)) === 0)
            .select((col("doc_id") + 2000000L).as("delta_id"),
                    concat(upper(col("text")), lit(" ")).as("text"))
          .unionAll(docs.filter(pmod(col("doc_id"), lit(7L)) === 0)
            .select((col("doc_id") + 3000000L).as("delta_id"),
                    concat(col("text"), lit(" batch2")).as("text")))
          .unionAll(docs.filter(pmod(col("doc_id"), lit(14L)) === 0)
            .select((col("doc_id") + 4000000L).as("delta_id"),
                    concat(col("text"), lit(" batch2")).as("text")))
        delta
          .select(col("delta_id"), md5(lower(trim(col("text")))).as("h"))
          .groupBy("h")
          .agg(min("delta_id").as("delta_id"), count(lit(1)).as("n_in_delta"))
          .join(base.distinct().hint("shuffle_hash"), Seq("h"), "left_anti")
          .select(col("delta_id"), col("h"), col("n_in_delta"))
          .orderBy("delta_id")
      },
      Some("""WITH base AS (SELECT md5(lower(trim(text))) AS h FROM documents),
             |delta AS (
             |  SELECT doc_id + 2000000 AS delta_id, upper(text) || ' ' AS text
             |  FROM documents WHERE doc_id % 5 = 0
             |  UNION ALL
             |  SELECT doc_id + 3000000, text || ' batch2'
             |  FROM documents WHERE doc_id % 7 = 0
             |  UNION ALL
             |  SELECT doc_id + 4000000, text || ' batch2'
             |  FROM documents WHERE doc_id % 14 = 0),
             |canon AS (
             |  SELECT md5(lower(trim(text))) AS h, min(delta_id) AS delta_id,
             |         count(*) AS n_in_delta
             |  FROM delta GROUP BY 1)
             |SELECT delta_id, h, n_in_delta FROM canon c
             |WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.h = c.h)
             |ORDER BY delta_id""".stripMargin)),

    // Incremental NEAR-dup — the LSH twin of dedup_incremental, and the
    // pass production corpora actually run on every refresh: the BASE
    // corpus's banded LSH keys are the stored index (derived here,
    // bucketed by (band, sig) — the layout they'd persist in); the DELTA
    // batch (the planted perturbed twins, provably near-dups of base
    // docs) computes per-row signatures and probes the index. Candidates
    // are delta×base band collisions only — never delta×delta, never
    // base×base, and the base's TEXT is touched only for candidate
    // verification. Verify joins follow the minhashPairs discipline:
    // broadcast the small candidate-pair table, shuffle-join the shingle
    // sets. Oracle-N (LSH family); recall vs the planted pairs asserted
    // in OperatorSpec.
    "dedup_near_incremental" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val withSh = Pipeline.nearDupCorpus(s, d)
          .repartition(n, col("doc_id"))
          .select(col("doc_id"),
                  graft.functions.TextOps.shingleHashes(col("toks"), 3).as("hs"))
          .filter(size(col("hs")) > 0)
          .persist()
        val base = withSh.filter(col("doc_id") < 1000000L)
        val delta = withSh.filter(col("doc_id") >= 1000000L)
        val baseIndex = Minhash.bandedKeys(Minhash.signatures(base))
          .repartition(n, col("band"), col("sig"))
        val cand = Minhash.bandedKeys(Minhash.signatures(delta)).as("q")
          .join(baseIndex.as("x").hint("shuffle_hash"),
                col("q.band") === col("x.band") && col("q.sig") === col("x.sig"))
          .select(col("q.doc_id").as("delta_id"), col("x.doc_id").as("base_id"))
          .distinct()
        // candidates grow with delta × bucket density — never broadcast;
        // shuffle_hash keeps each task's build side partition-bounded
        cand
          .repartition(n, col("delta_id"))
          .join(withSh.select(col("doc_id").as("delta_id"), col("hs").as("hq"))
                  .hint("shuffle_hash"), "delta_id")
          .join(withSh.select(col("doc_id").as("base_id"), col("hs").as("hx"))
                  .hint("shuffle_hash"), "base_id")
          .select(col("delta_id"), col("base_id"),
                  round(size(array_intersect(col("hq"), col("hx"))).cast("double") /
                        (size(col("hq")) + size(col("hx")) -
                         size(array_intersect(col("hq"), col("hx")))).cast("double"), 6)
                    .as("jaccard"))
          .filter(col("jaccard") >= 0.5)
          .orderBy("delta_id", "base_id")
      },
      None),

    // ------------------------------------------------------------ source
    // XML source roundtrip — Spark 4 folded the spark-xml datasource into
    // core, making XML a first-class format next to the
    // csv/json/orc/text/binaryFile keys: write a bounded slice as
    // element-per-row XML, read it back DISTRIBUTED with an explicit
    // schema (inference on a feed you control is a silent-drift trap),
    // aggregate. The oracle runs the same aggregate over the original
    // table — equality proves the markup roundtrip lost nothing,
    // including full double precision through the text form.
    "source_xml_roundtrip" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_xmlsrc").toString
        Tables(s, d, "orders")
          .filter(col("o_orderkey") < 1000)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .write.mode("overwrite").option("rowTag", "order").format("xml").save(dir)
        s.read
          .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
          .option("rowTag", "order").format("xml").load(dir)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |round(sum(o_totalprice), 2) AS sum_price
             |FROM orders WHERE o_orderkey < 1000
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ------------------------------------------------------------- stats
    // Mixture diagnostics — marginal entropies of the lang and source
    // distributions and their mutual information (nats): THE summary
    // numbers a corpus-mixture dashboard shows (how skewed is each axis,
    // how correlated are they). One bounded-key groupBy over the corpus;
    // everything downstream is |langs|×|sources| rows of pure arithmetic,
    // identical in both engines (6-dp round absorbs summation-order float
    // noise per SURVEY §7.3).
    "agg_mutual_info" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""WITH j AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS c
                |           FROM documents GROUP BY lang, source),
                |l AS (SELECT lang, sum(c) AS cl FROM j GROUP BY lang),
                |s2 AS (SELECT source, sum(c) AS cs FROM j GROUP BY source),
                |t AS (SELECT sum(c) AS n FROM j)
                |SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_docs,
                |  (SELECT round(-sum((cl/n)*ln(cl/n)), 6) FROM l CROSS JOIN t) AS h_lang,
                |  (SELECT round(-sum((cs/n)*ln(cs/n)), 6) FROM s2 CROSS JOIN t) AS h_source,
                |  (SELECT round(sum((c/n)*ln((c*n)/(cl*cs))), 6)
                |   FROM j JOIN l USING (lang) JOIN s2 USING (source) CROSS JOIN t) AS mi_nats""".stripMargin)
      },
      Some("""WITH j AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS c
             |           FROM documents GROUP BY lang, source),
             |l AS (SELECT lang, sum(c) AS cl FROM j GROUP BY lang),
             |s2 AS (SELECT source, sum(c) AS cs FROM j GROUP BY source),
             |t AS (SELECT sum(c) AS n FROM j)
             |SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_docs,
             |  (SELECT round(-sum((cl/n)*ln(cl/n)), 6) FROM l CROSS JOIN t) AS h_lang,
             |  (SELECT round(-sum((cs/n)*ln(cs/n)), 6) FROM s2 CROSS JOIN t) AS h_source,
             |  (SELECT round(sum((c/n)*ln((c*n)/(cl*cs))), 6)
             |   FROM j JOIN l USING (lang) JOIN s2 USING (source) CROSS JOIN t) AS mi_nats""".stripMargin)),

    // ------------------------------------------------------- time series
    // Gap-filled hourly resample — the regularization pass every
    // time-series rollup needs: bucket events to the hour per type,
    // GENERATE the complete hour spine (sequence + explode, so missing
    // hours exist as rows), left-join the observed aggregates, and
    // forward-fill the gaps with the last observed hourly average.
    // ~215 of the 3600 (type, hour) cells are empty at sf0.01, so the
    // fill provably fires. Scale shape: the observed aggregate is one
    // bounded (type, hour) shuffle; the spine is |types|×|hours| rows —
    // calendar-bounded, broadcast; the fill window sorts per type, never
    // globally.
    "ts_gapfill_interp" -> Decl(
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"), col("value"))
        // Exact integer-micros mean, NOT round(avg(value), 6): the fixture
        // values have fixed decimal structure, so hourly means land exactly
        // ON 5e-7 boundaries where Spark's repr-HALF_UP and DuckDB's scaled
        // half-away round() disagree (hit at sf0.1). Summing half-up micros
        // as BIGINT is order-independent and exact; the half-up mean and
        // the /1e6 are the same IEEE ops on both engines — no round() left.
        val hourly = e.groupBy("event_type", "h")
          .agg(sum(floor(col("value") * 1000000.0 + 0.5).cast("bigint")).as("sm"),
               count(lit(1)).as("n_events"))
          .select(col("event_type"), col("h"), col("n_events"),
                  (floor(col("sm").cast("double") / col("n_events") + 0.5).cast("bigint") /
                   lit(1000000.0)).as("v_avg"))
        val spine = e.agg(min("h").as("h0"), max("h").as("h1"))
          .select(explode(expr("sequence(h0, h1, INTERVAL 1 HOUR)")).as("h"))
        val w = Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.select("event_type").distinct()
          .crossJoin(broadcast(spine))
          .join(hourly, Seq("event_type", "h"), "left")
          .select(col("event_type"), col("h"),
                  coalesce(col("n_events"), lit(0L)).as("n_events"),
                  col("v_avg"),
                  last("v_avg", ignoreNulls = true).over(w).as("v_filled"))
          .orderBy("event_type", "h")
      },
      Some("""WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h, value FROM events),
             |hourly AS (SELECT event_type, h,
             |             CAST(floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
             |                              AS DOUBLE) / count(*) + 0.5) AS BIGINT)
             |               / 1000000.0 AS v_avg,
             |             count(*) AS n_events
             |           FROM e GROUP BY event_type, h),
             |spine AS (SELECT unnest(generate_series((SELECT min(h) FROM e),
             |                                        (SELECT max(h) FROM e),
             |                                        INTERVAL 1 HOUR)) AS h),
             |types AS (SELECT DISTINCT event_type FROM e)
             |SELECT t.event_type AS event_type, s.h AS h,
             |       coalesce(hh.n_events, 0) AS n_events, hh.v_avg AS v_avg,
             |       last_value(hh.v_avg IGNORE NULLS) OVER (
             |         PARTITION BY t.event_type ORDER BY s.h
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
             |FROM types t CROSS JOIN spine s
             |LEFT JOIN hourly hh ON hh.event_type = t.event_type AND hh.h = s.h
             |ORDER BY event_type, h""".stripMargin)),

    // -------------------------------------------------------------- text
    // Bigram-LM negative log-likelihood — the two-gram step past
    // text_unigram_nll: score each document under an add-one-smoothed
    // bigram model of the corpus, p(w2|w1) = (c(w1 w2)+1)/(c(w1 ·)+V).
    // Unlike the unigram LM (vocabulary-bounded, broadcastable), the
    // bigram table grows with the corpus — so the doc-bigram ⋈ LM join
    // stays a SHUFFLE join keyed on the bigram, with map-side partial
    // counts; only V (one scalar) broadcasts.
    "text_bigram_nll" -> Decl(
      (s, d) => {
        val toks = Pipeline.docsWithTokens(s, d).select(col("doc_id"), col("toks"))
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        val bi = toks.filter(size(col("toks")) >= 2)
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(toks) - 1),
              |  i -> struct(element_at(toks, i) AS w1,
              |              concat(element_at(toks, i), ' ', element_at(toks, i + 1)) AS bg))"""
              .stripMargin)).as("p"))
          .select(col("doc_id"), col("p.w1").as("w1"), col("p.bg").as("bg"))
        val cbg = bi.groupBy("bg").agg(count(lit(1)).as("cbg"))
        val cw1 = bi.groupBy("w1").agg(count(lit(1)).as("cw1"))
        val v = toks.select(explode(col("toks")).as("w"))
          .agg(countDistinct("w").cast("double").as("v"))
        bi.join(cbg.hint("shuffle_hash"), "bg")
          .join(cw1.hint("shuffle_hash"), "w1")
          .crossJoin(broadcast(v))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
               round(-avg(log((col("cbg") + lit(1.0)) / (col("cw1") + col("v")))), 6)
                 .as("bigram_nll"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |b AS (SELECT doc_id,
             |        unnest(list_transform(generate_series(1, len(t)-1), i -> t[i])) AS w1,
             |        unnest(list_transform(generate_series(1, len(t)-1),
             |                              i -> t[i] || ' ' || t[i+1])) AS bg
             |      FROM tok WHERE len(t) >= 2),
             |cbg AS (SELECT bg, count(*) AS cbg FROM b GROUP BY bg),
             |cw1 AS (SELECT w1, count(*) AS cw1 FROM b GROUP BY w1),
             |v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v
             |      FROM (SELECT unnest(t) AS w FROM tok))
             |SELECT doc_id, count(*) AS n_bigrams,
             |       round(-avg(ln((cbg + 1.0)/(cw1 + v))), 6) AS bigram_nll
             |FROM b JOIN cbg USING (bg) JOIN cw1 USING (w1) CROSS JOIN v
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------ window
    // Per-type z-score outliers — per-type standardization, then keep
    // |z| > 2. NOT a window: event_type has a handful of values, so a
    // whole-partition window funnels each type's entire history through
    // ONE task — the classic low-cardinality-window scale killer. The
    // stats table is one row per type (KB-sized at any corpus scale), so
    // aggregate it, broadcast it back, and standardize at scan speed.
    // Zero-variance types are dropped EXPLICITLY (sigma > 0) in both
    // engines — without the guard Spark's x/0 → NULL filters the row but
    // DuckDB's IEEE x/0 → ±inf keeps it, an engine mismatch.
    // Population stddev — both engines share the definition.
    "window_zscore_outlier" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
        val stats = ev.groupBy("event_type")
          .agg(avg(col("value")).as("mu"), stddev_pop(col("value")).as("sigma"))
          .filter(col("sigma") > 0)
        ev.join(broadcast(stats), "event_type")
          .select(col("event_id"), col("event_type"), round(col("value"), 6).as("v"),
                  round((col("value") - col("mu")) / col("sigma"), 6).as("z"))
          .filter(abs(col("z")) > 2)
          .orderBy("event_id")
      },
      Some("""WITH st AS (
             |  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
             |  FROM events GROUP BY event_type),
             |z AS (
             |  SELECT event_id, e.event_type, round(value, 6) AS v,
             |         round((value - mu) / sigma, 6) AS z
             |  FROM events e JOIN st ON e.event_type = st.event_type
             |  WHERE sigma > 0)
             |SELECT event_id, event_type, v, z FROM z
             |WHERE abs(z) > 2 ORDER BY event_id""".stripMargin)),

    // --------------------------------------------------------- streaming
    // Stream-stream LEFT OUTER interval join, batch twin: every click,
    // paired with the same user's errors in the following 60 minutes —
    // and clicks with NO such error survive with NULL error columns. The
    // outer side is what the inner join (stream_stream_join) can't
    // express, and in streaming form it's the semantics watermark-driven
    // state expiry exists FOR: a left row emits its null match only once
    // the watermark proves no right row can still arrive (live twin in
    // StreamingSpec). NULLS FIRST pinned on both engines (Spark's ASC
    // default; DuckDB's is NULLS LAST).
    "stream_stream_outer" -> Decl(
      (s, d) => {
        val e = Tables.events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
        val errors = e.filter(col("event_type") === "error")
          .select(col("user_id").as("uid"), col("event_id").as("error_id"), col("ts").as("error_ts"))
        clicks.join(errors,
            col("user_id") === col("uid") &&
            col("error_ts") >= col("click_ts") &&
            col("error_ts") <= col("click_ts") + expr("INTERVAL 60 MINUTES"),
            "left_outer")
          .select(col("user_id"), col("click_id"), col("error_id"),
                  (col("error_ts").cast("long") - col("click_ts").cast("long")).as("gap_s"))
          .orderBy(col("user_id"), col("click_id"), col("error_id").asc_nulls_first)
      },
      Some("""SELECT c.user_id AS user_id, c.event_id AS click_id, e.event_id AS error_id,
             |  date_diff('second', CAST(c.ts AS TIMESTAMP), CAST(e.ts AS TIMESTAMP)) AS gap_s
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
             |  ON c.user_id = e.user_id
             | AND CAST(e.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
             | AND CAST(e.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL '60 minutes'
             |ORDER BY user_id, click_id, error_id NULLS FIRST""".stripMargin)),

    // -------------------------------------------------------------- join
    // Nearest-event as-of join — the attribution variant of join_asof:
    // each click pairs with the same user's temporally CLOSEST signup,
    // before or after (join_asof covers the backward-only case). Ties
    // break to the lowest signup id via min over a STRUCT — struct
    // ordering is lexicographic (diff first, id second) in both engines,
    // so no arithmetic encoding (a seconds·1e7 + id BIGINT aliases once
    // ids pass 1e7) and no nondeterministic tie. Shape: equi join on user_id with
    // per-user-bounded fan-out, then a partial-agg'd min_by — both
    // stages shuffle on user/click keys only, never on time.
    "join_asof_nearest" -> Decl(
      (s, d) => {
        val e = Tables.events(s, d)
        val c = e.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
        val sg = e.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id"), col("ts").as("sts"))
        c.join(sg, "user_id")
          .withColumn("diff_s", abs(col("sts").cast("long") - col("cts").cast("long")))
          .groupBy("click_id", "user_id")
          .agg(min(struct(col("diff_s"), col("signup_id")))
                 .getField("signup_id").as("nearest_signup_id"),
               min("diff_s").as("diff_s"))
          .orderBy("click_id")
      },
      Some("""WITH c AS (SELECT event_id AS click_id, user_id, ts AS cts
             |           FROM events WHERE event_type = 'click'),
             |s AS (SELECT event_id AS signup_id, user_id, ts AS sts
             |      FROM events WHERE event_type = 'signup')
             |SELECT c.click_id AS click_id, c.user_id AS user_id,
             |  (min({'d': abs(date_diff('second', sts, cts)), 'i': s.signup_id})).i
             |    AS nearest_signup_id,
             |  min(abs(date_diff('second', sts, cts))) AS diff_s
             |FROM c JOIN s USING (user_id)
             |GROUP BY c.click_id, c.user_id
             |ORDER BY click_id""".stripMargin)),

    // ------------------------------------------------------------ scalar
    // URL parsing family — parse_url PROTOCOL/HOST/PATH/QUERY-param, the
    // crawl-metadata toolkit next to dedup_url_canonical. The URLs are
    // CONSTRUCTED deterministically from columns, so the oracle is the
    // GROUND TRUTH (rebuild each part from the same columns) rather than
    // a second regex engine — any parse_url deviation surfaces as a
    // value mismatch. Pure per-row projection, scan speed.
    "scalar_url_parse" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""WITH u AS (
                |  SELECT doc_id,
                |    concat('https://', source, '.example.com/', lang, '/doc/',
                |           CAST(doc_id AS STRING), '?ref=', CAST(doc_id % 7 AS STRING),
                |           '&utm=x') AS url
                |  FROM documents)
                |SELECT doc_id, url,
                |  parse_url(url, 'PROTOCOL') AS proto,
                |  parse_url(url, 'HOST') AS host,
                |  parse_url(url, 'PATH') AS path,
                |  parse_url(url, 'QUERY', 'ref') AS ref
                |FROM u ORDER BY doc_id""".stripMargin)
      },
      Some("""SELECT doc_id,
             |  'https://' || source || '.example.com/' || lang || '/doc/' ||
             |    CAST(doc_id AS VARCHAR) || '?ref=' || CAST(doc_id % 7 AS VARCHAR) ||
             |    '&utm=x' AS url,
             |  'https' AS proto,
             |  source || '.example.com' AS host,
             |  '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path,
             |  CAST(doc_id % 7 AS VARCHAR) AS ref
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------- stats
    // Cohort retention — the product-analytics matrix (first-purchase
    // week × activity week × distinct active users): cohort assignment
    // is one per-user min, activity is one bounded (cohort, week)
    // aggregate; both shuffles key on user_id and the output scales with
    // weeks², never with events. Purchase-sliced so the cohorts actually
    // decay (full-stream cohorts collapse into week 1 at this density).
    "agg_cohort_retention" -> Decl(
      (s, d) => {
        val p = Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"))
        val fw = p.groupBy("user_id")
          .agg(date_trunc("week", min("ts")).cast("date").as("cohort"))
        p.join(fw, "user_id")
          .select(col("cohort"), date_trunc("week", col("ts")).cast("date").as("wk"),
                  col("user_id"))
          .groupBy("cohort", "wk")
          .agg(countDistinct("user_id").as("n_active"), count(lit(1)).as("n_purchases"))
          .orderBy("cohort", "wk")
      },
      Some("""WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
             |fw AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
             |       FROM p GROUP BY user_id)
             |SELECT cohort, CAST(date_trunc('week', p.ts) AS DATE) AS wk,
             |       count(DISTINCT p.user_id) AS n_active, count(*) AS n_purchases
             |FROM p JOIN fw USING (user_id)
             |GROUP BY 1, 2 ORDER BY cohort, wk""".stripMargin)),

    // Count-min-sketch heavy hitters — the frequency twin of the
    // HLL/KLL/top-k mergeable-sketch trio: per-partition CMS states
    // merge in one aggregate (state is eps×conf-bounded, ~56 KB here,
    // independent of row count), then the exact top keys are probed
    // against the sketch. The exact counts ride along so the
    // overestimate bound (CMS never undercounts; over by ≤ εN w.p.
    // 1−δ) is visible in the output and asserted in OperatorSpec.
    // Oracle-N: DuckDB has no CMS.
    "agg_cms_heavyhitter" -> Decl(
      (s, d) => {
        val keys = Tables(s, d, "lineitem").select(col("l_suppkey"))
        val top = keys.groupBy("l_suppkey").agg(count(lit(1)).as("exact_cnt"))
          .orderBy(desc("exact_cnt"), col("l_suppkey")).limit(5).collect()
        val bytes = keys
          .agg(count_min_sketch(col("l_suppkey"), lit(0.001), lit(0.99), lit(42)).as("cms"))
          .head().getAs[Array[Byte]](0)
        val cms = org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(bytes))
        import s.implicits._
        top.toSeq
          .map(r => (r.getLong(0), r.getLong(1), cms.estimateCount(r.getLong(0))))
          .toDF("l_suppkey", "exact_cnt", "cms_estimate")
          .orderBy(desc("exact_cnt"), col("l_suppkey"))
      },
      None),

    // ----------------------------------------------------------- vectors
    // One-pass distributed PCA (top principal component) — the embedding
    // whitening/compression step ANN and PQ indexes run at corpus scale:
    // a single Aggregator pass folds every vector into (n, Σx, Σxxᵀ)
    // (d + d(d+1)/2 doubles of state, ~17 KB at d=64 — the shuffle
    // carries ONE state per partition), the driver assembles the exact
    // covariance and power-iterates a 64×64 matrix. No oracle (DuckDB
    // has no eigen solver): OperatorSpec asserts the eigen residual
    // ‖Cv − λv‖ ≈ 0 and that no coordinate axis beats the component's
    // Rayleigh quotient. Deterministic: fixed start vector, fixed
    // iteration count, sign pinned (R8).
    "vec_pca_topcomponent" -> Decl(
      (s, d) => {
        val dim = 64
        val gramUdf = udaf(new graft.functions.VectorGramAgg(dim))
        val row = Tables(s, d, "embeddings")
          .agg(gramUdf(col("embedding")).as("g"))
          .select(col("g.n"), col("g.s"), col("g.g"))
          .head()
        val gram = graft.functions.GramState(
          row.getLong(0), row.getSeq[Double](1).toArray, row.getSeq[Double](2).toArray)
        val cov = graft.functions.VectorGramAgg.covariance(gram, dim)
        val (vec, lambda) = graft.functions.VectorGramAgg.topEigen(cov)
        val trace = (0 until dim).map(i => cov(i)(i)).sum
        import s.implicits._
        vec.zipWithIndex.toSeq
          .map { case (wgt, i) =>
            (i, math.rint(wgt * 1e6) / 1e6, math.rint(lambda / trace * 1e6) / 1e6) }
          .toDF("dim", "weight", "var_share")
          .orderBy("dim")
      },
      None))
}
