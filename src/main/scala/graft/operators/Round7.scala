package graft.operators

import graft.{Decl, Tables}
import graft.functions.BpeOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 additions: real subword tokenization, C4-style cross-document
  * span dedup, the scan-parallel (broadcast-threshold) formulation of
  * low-cardinality window analytics, and dangling-mass PageRank. */
object Round7 {

  /** DuckDB oracle for graph_pagerank_dangling: the same 10 iterations
    * unrolled as chained CTEs, each computing the dangling mass of the
    * previous rank vector and redistributing it uniformly. Nodes with
    * doc_id % 4 = 0 have NO out-edges by construction, so unlike
    * graph_pagerank's bijective graph the dangling term is load-bearing:
    * without it 0.85·dm of rank mass leaks per iteration and the
    * mass-conservation assertion fails.
    */
  private def pagerankDanglingOracleSql: String = {
    val b = new StringBuilder(
      """WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n, count(*) AS ni FROM documents),
        |e AS (SELECT doc_id AS src, 1 + doc_id % 2 AS outdeg,
        |             (doc_id * 3 + t.k) % nn.ni AS dst
        |      FROM documents CROSS JOIN nn, (VALUES (1), (2)) t(k)
        |      WHERE doc_id % 4 <> 0 AND t.k <= 1 + doc_id % 2),
        |pr0 AS (SELECT doc_id, 1.0/nn.n AS r FROM documents CROSS JOIN nn)""".stripMargin)
    (1 to 10).foreach { i =>
      b.append(s""",
        |d$i AS (SELECT sum(r) AS dm FROM pr${i - 1} WHERE doc_id % 4 = 0),
        |pr$i AS (SELECT nd.doc_id,
        |             0.15/(SELECT n FROM nn)
        |               + 0.85 * (coalesce(s.acc, 0) + d$i.dm/(SELECT n FROM nn)) AS r
        |         FROM documents nd
        |         LEFT JOIN (SELECT e.dst, sum(p.r / e.outdeg) AS acc
        |                    FROM pr${i - 1} p JOIN e ON p.doc_id = e.src
        |                    GROUP BY e.dst) s ON nd.doc_id = s.dst
        |         CROSS JOIN d$i)""".stripMargin)
    }
    b.append("""
      |SELECT pr10.doc_id AS doc_id, round(pr10.r * nn.n, 6) AS rank_norm
      |FROM pr10 CROSS JOIN nn ORDER BY doc_id""".stripMargin)
    b.toString
  }

  val decls: Map[String, Decl] = Map(
    // PageRank with DANGLING-NODE mass redistribution — graph_pagerank on
    // an arbitrary edge table. The §2 key's constructed graph guarantees
    // every node an out-edge, so it never exercises the term real link
    // graphs hit immediately (a crawl frontier is FULL of pages with no
    // outlinks yet); here 25% of nodes are sinks and each iteration
    // gathers their rank with one tiny aggregate (a 1-row broadcast, the
    // decontaminate/threshold pattern) and folds it into the teleport
    // floor. Same scale shape as graph_pagerank: edges derived once,
    // hash-partitioned on src, persisted; one dst-keyed shuffle per
    // iteration; rank state checkpointed at the loop midpoint. The
    // no-in-link case is covered too (nodes re-enter via LEFT join from
    // the node table, not from the edge aggregate).
    "graph_pagerank_dangling" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents").select(col("doc_id"))
        val nRows = Tables.rowCount(s, d, "documents")
        val n = nRows.toDouble
        val nodes = docs.select(col("doc_id").as("nid"))
        val e = docs
          .filter(pmod(col("doc_id"), lit(4L)) =!= 0)
          .select(col("doc_id").as("src"),
                  (lit(1L) + pmod(col("doc_id"), lit(2L))).cast("double").as("outdeg"))
          .select(col("src"), col("outdeg"),
                  explode(sequence(lit(1), (lit(1L) + pmod(col("src"), lit(2L))).cast("int")))
                    .as("k"))
          .select(col("src"), col("outdeg"),
                  pmod(col("src") * 3 + col("k"), lit(nRows)).as("dst"))
          .repartition(s.sparkContext.defaultParallelism, col("src"))
          .persist()
        var pr = docs.select(col("doc_id"), lit(1.0 / n).as("r"))
        (1 to 10).foreach { i =>
          val dm = pr.filter(pmod(col("doc_id"), lit(4L)) === 0)
            .agg(sum(col("r")).as("dm"))
          val inl = pr.join(e, pr("doc_id") === e("src"))
            .groupBy(col("dst"))
            .agg(sum(col("r") / col("outdeg")).as("acc"))
          val prev = pr
          // Unlike graph_pagerank, each step reads pr TWICE (dangling
          // aggregate + in-link propagation), so untruncated lineage
          // DOUBLES per iteration — a mid-loop checkpoint still left
          // 16 MiB task binaries by iteration 10. Truncate every step
          // (the rank state is one row per node, KBs at bench scale) and
          // drop the superseded generation's storage once the new one is
          // materialized.
          pr = nodes.join(inl, col("nid") === col("dst"), "left")
            .crossJoin(broadcast(dm))
            .select(col("nid").as("doc_id"),
                    (lit(0.15 / n) + lit(0.85) *
                      (coalesce(col("acc"), lit(0.0)) + col("dm") / n)).as("r"))
            .localCheckpoint()
          if (i > 1) prev.unpersist()
        }
        // every generation is materialized, so the edges are dead weight
        e.unpersist()
        pr.select(col("doc_id"), round(col("r") * n, 6).as("rank_norm"))
          .orderBy("doc_id")
      },
      Some(pagerankDanglingOracleSql)),

    // C4-style cross-document span dedup — the repeated-span removal pass
    // (C4 deduped exact three-sentence spans corpus-wide) that complements
    // the whole-document dedup family: per doc, how many of its
    // non-overlapping 16-token spans also appear VERBATIM in another
    // document. Spans hash to md5 inside the row (text never shuffles);
    // one hash-keyed shuffle counts span occurrences, and "shared with
    // another doc" is the exact min(doc)≠max(doc) probe — no
    // count-distinct expand. The per-doc totals reuse the doc_id
    // partitioning the explode inherits. The corpus's natural near-dups
    // make this live without planting (60 cross-doc spans at sf0.01).
    "dedup_span_cross" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val spans = Pipeline.docsWithTokens(s, d)
          .repartition(n, col("doc_id"))
          .select(col("doc_id"),
                  explode(expr(
                    """transform(sequence(0, greatest(size(toks) - 16, 0), 16),
                      |st -> CASE WHEN st + 16 <= size(toks)
                      |       THEN md5(concat_ws(' ', slice(toks, st + 1, 16))) END)"""
                      .stripMargin)).as("h"))
          .filter(col("h").isNotNull)
          .persist()
        // ONE h-keyed exchange feeds both the occurrence aggregate and the
        // semi-join probe side (reused exchange); the final per-doc join is
        // pinned shuffle_hash — both sides are corpus-sized row-per-doc
        // tables co-partitioned on doc_id, and a planner-chosen broadcast
        // of either is the unbounded-side OOM anti-pattern.
        val spansByH = spans.repartition(n, col("h"))
        val dup = spansByH
          .groupBy("h")
          .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
          .filter(col("mn") =!= col("mx"))
          .select("h")
        val totals = spans.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
        val dups = spansByH.join(dup.hint("shuffle_hash"), Seq("h"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("dup_spans"))
        // eager-materialize the small per-doc result, then release the big
        // exploded span cache — the dedup_containment discipline; without
        // it the persist leaks into the caller's session until clearCache
        val out = totals.join(dups.hint("shuffle_hash"), Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_spans"),
                  coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
                  round(coalesce(col("dup_spans"), lit(0L)).cast("double") /
                        col("n_spans"), 6).as("dup_frac"))
          .localCheckpoint(true)
        spans.unpersist()
        out.orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sp AS (SELECT doc_id, md5(array_to_string(t[st + 1 : st + 16], ' ')) AS h
             |       FROM (SELECT doc_id, t,
             |               unnest(generate_series(0, greatest(len(t) - 16, 0), 16)) AS st
             |             FROM tok)
             |       WHERE st + 16 <= len(t)),
             |dup AS (SELECT h FROM sp GROUP BY h HAVING min(doc_id) <> max(doc_id)),
             |tot AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY doc_id),
             |dd AS (SELECT doc_id, count(*) AS dup_spans
             |       FROM sp SEMI JOIN dup USING (h) GROUP BY doc_id)
             |SELECT doc_id, n_spans, coalesce(dup_spans, 0) AS dup_spans,
             |       round(CAST(coalesce(dup_spans, 0) AS DOUBLE) / n_spans, 6) AS dup_frac
             |FROM tot LEFT JOIN dd USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Shingle CONTAINMENT dedup — the asymmetric similarity Jaccard
    // misses: a short document wholly embedded in a longer one scores
    // n/min(sa,sb) ≈ 1 but a low Jaccard (the union is dominated by the
    // longer doc), and sub-document duplication is exactly what
    // quote-heavy / boilerplate corpora exhibit. Shares the df-capped
    // inverted-index intersection core with dedup_ngram_jaccard
    // (ngramIntersectionsLazy — one shingle-key exchange, pair space
    // bounded by the df ≤ 32 cap), so the only new work is the
    // containment finalizer. Both metrics over the SAME pair universe
    // keeps the two keys' oracles one CTE apart.
    "dedup_containment" -> Decl(
      (s, d) => {
        val (base, cached) = PipelineExt.ngramIntersectionsLazy(s, d)
        val out = base
          .withColumn("containment",
            round(col("n").cast("double") / least(col("sa"), col("sb")).cast("double"), 6))
          .filter(col("containment") >= 0.8)
          .select("id_a", "id_b", "containment")
          .localCheckpoint(true)
        cached.foreach(_.unpersist())
        out.orderBy("id_a", "id_b")
      },
      Some("""WITH tok AS (SELECT doc_id, lang, source, string_split(text, ' ') AS t FROM documents),
             |sh AS (SELECT DISTINCT doc_id, lang, source, g FROM (
             |  SELECT doc_id, lang, source,
             |         unnest(list_transform(generate_series(1, len(t) - 1),
             |                               i -> t[i] || ' ' || t[i + 1])) AS g
             |  FROM tok WHERE len(t) >= 2)),
             |df AS (SELECT lang, source, g, count(*) AS df
             |       FROM sh GROUP BY 1, 2, 3),
             |kept AS (SELECT sh.doc_id, sh.lang, sh.source, sh.g
             |         FROM sh JOIN df USING (lang, source, g) WHERE df <= 32),
             |sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
             |  FROM kept a JOIN kept b ON a.lang = b.lang AND a.source = b.source
             |                         AND a.g = b.g AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b,
             |       round(CAST(n AS DOUBLE) / least(sa.sz, sb.sz), 6) AS containment
             |FROM inter JOIN sizes sa ON sa.doc_id = id_a
             |           JOIN sizes sb ON sb.doc_id = id_b
             |WHERE round(CAST(n AS DOUBLE) / least(sa.sz, sb.sz), 6) >= 0.8
             |ORDER BY id_a, id_b""".stripMargin)),

    // Temperature-flattened domain resampling — the XLM-R/mT5 mixing rule
    // (sample domain i ∝ n_i^α, α<1 upweights low-resource domains)
    // next to mix_domain_rebalance's uniform-share special case. α=1/2
    // here, and the whole keep decision is INTEGER-exact across engines:
    // the weight is floor(sqrt(n_i)) — IEEE sqrt is correctly rounded,
    // so sqrt of an exact integer count is bit-identical everywhere —
    // and the keep test multiplies integers only (ticket·Z·n_i <
    // 1000·total·w_i), so there is no float boundary to disagree on, no
    // RNG, and re-running yields the same corpus (the property a
    // training-data pipeline needs for reproducible mixes). Oversampled
    // small domains cap at keep-all structurally (ticket ≤ 999). Scan
    // shape: per-domain stats are one tiny aggregate, broadcast back;
    // the decision rides the scan.
    "mix_temperature_sample" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents").select(col("doc_id"), col("lang"))
        val stats = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .withColumn("w", floor(sqrt(col("n_docs"))))
        val z = stats.agg(sum(col("w")).as("z"))
        val tot = docs.agg(count(lit(1)).as("total"))
        docs.join(broadcast(stats), "lang")
          .crossJoin(broadcast(z))
          .crossJoin(broadcast(tot))
          // (doc_id·2654435761) mod 1000 computed by congruence —
          // ((doc_id mod 1000)·761) mod 1000 is bit-identical and cannot
          // overflow, where the raw BIGINT product silently wraps in Spark
          // but raises in DuckDB once doc_id ≳ 3.4e9 (i.e. exactly at scale)
          .withColumn("ticket", pmod(pmod(col("doc_id"), lit(1000L)) * lit(761L), lit(1000L)))
          .filter(col("ticket") * col("z") * col("n_docs") <
                  lit(1000L) * col("total") * col("w"))
          .select(col("doc_id"), col("lang"), col("ticket"))
          .orderBy("doc_id")
      },
      Some("""WITH stats AS (SELECT lang, count(*) AS n_docs,
             |                      CAST(floor(sqrt(count(*))) AS BIGINT) AS w
             |               FROM documents GROUP BY lang),
             |z AS (SELECT sum(w) AS z FROM stats),
             |tot AS (SELECT count(*) AS total FROM documents)
             |SELECT doc_id, lang, ((doc_id % 1000) * 761) % 1000 AS ticket
             |FROM documents JOIN stats USING (lang) CROSS JOIN z CROSS JOIN tot
             |WHERE (((doc_id % 1000) * 761) % 1000) * z * n_docs < 1000 * total * w
             |ORDER BY doc_id""".stripMargin)),

    // The C4-style composite KEEP/DROP decision — the terminal step every
    // training-data pipeline runs: each document gets one verdict and the
    // FIRST triggering drop reason by fixed priority (duplicate > short >
    // repetitive > ok). Exact-dup canonicalization is the dedup_exact
    // family (md5 of normalized text, lowest id is canonical; noisy
    // planted copies make the signal live); short/repetitive are pure
    // per-row token stats. One hash-keyed shuffle total — the
    // canonical-id table is corpus-sized, so its join is pinned
    // shuffle_hash, and every other signal rides the scan.
    "pipeline_keep_decision" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
        val noisy = docs.filter(pmod(col("doc_id"), lit(10L)) === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"),
                  concat(upper(col("text")), lit("  ")).as("text"))
        val feats = docs.unionAll(noisy)
          .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"),
                  split(col("text"), " ").as("toks"))
          .select(col("doc_id"), col("h"), size(col("toks")).as("n_toks"),
                  (size(array_distinct(col("toks"))).cast("double") /
                   size(col("toks"))).as("ttr"))
        val canon = feats.groupBy("h").agg(min("doc_id").as("canon_id"))
        feats.join(canon.hint("shuffle_hash"), "h")
          .select(col("doc_id"),
                  when(col("doc_id") =!= col("canon_id"), "duplicate")
                    .when(col("n_toks") < 20, "short")
                    .when(col("ttr") < 0.35, "repetitive")
                    .otherwise("ok").as("reason"))
          .withColumn("keep", col("reason") === "ok")
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000, upper(text) || '  ' FROM documents
             |  WHERE doc_id % 10 = 3),
             |f AS (SELECT doc_id, md5(lower(trim(text))) AS h,
             |        len(string_split(text, ' ')) AS n_toks,
             |        CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             |          / len(string_split(text, ' ')) AS ttr
             |      FROM corpus),
             |canon AS (SELECT h, min(doc_id) AS canon_id FROM f GROUP BY h),
             |r AS (SELECT doc_id,
             |        CASE WHEN doc_id <> canon_id THEN 'duplicate'
             |             WHEN n_toks < 20 THEN 'short'
             |             WHEN ttr < 0.35 THEN 'repetitive'
             |             ELSE 'ok' END AS reason
             |      FROM f JOIN canon USING (h))
             |SELECT doc_id, reason, reason = 'ok' AS keep
             |FROM r ORDER BY doc_id""".stripMargin)),

    // As-of join WITH TOLERANCE — the variant every time-series asof API
    // exposes (pandas merge_asof's `tolerance`, kdb's wj): each purchase
    // takes the latest preceding click only if it is within 1 hour,
    // else NULL. Same scalable shape as join_asof (union + one ordered
    // window per user — never a per-row range probe); the tolerance is a
    // post-window comparison, so the plan is identical to the untoleranced
    // form. Oracle mirrors with a range-bounded LEFT JOIN + max().
    "join_asof_tolerance" -> Decl(
      (s, d) => {
        val e = Tables.events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(0).as("kind"),
                  col("ts").as("click_ts"), lit(null).cast("long").as("purchase_id"))
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("kind"),
                  lit(null).cast("timestamp").as("click_ts"),
                  col("event_id").as("purchase_id"))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.canon(
          clicks.unionAll(purch)
            .withColumn("lc", last("click_ts", ignoreNulls = true).over(w))
            .filter(col("kind") === 1)
            .select(col("purchase_id").as("event_id"), col("user_id"),
                    when(col("ts").cast("long") - col("lc").cast("long") <= 3600,
                         col("lc")).as("click_ts_1h")))
      },
      Some("""SELECT p.event_id, p.user_id, CAST(max(c.ts) AS TIMESTAMP) AS click_ts_1h
             |FROM events p LEFT JOIN events c
             |ON c.user_id = p.user_id AND c.event_type = 'click'
             |AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
             |AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL '1 hour'
             |WHERE p.event_type = 'purchase'
             |GROUP BY p.event_id, p.user_id ORDER BY ALL NULLS FIRST""".stripMargin)),

    // The scan-parallel twin of window_ntile_firstlast: per-segment
    // quartile assignment and extremes WITHOUT a window. The §2.5 key
    // declares the window semantics over a 5-value demo key (allowlisted
    // in ScaleSpec); this is the formulation that survives 100 TB — the
    // per-segment thresholds and extreme-struct minima are ONE tiny
    // aggregate row per segment, broadcast back, buckets assigned by
    // comparison at scan speed. Thresholds round to the 6-dp grid (the
    // text_perplexity_bucket rule: quantile-interpolation ulp noise on
    // tied inputs must not flip a comparison); extremes tie-break through
    // lexicographic struct min/max exactly like join_asof_nearest.
    "window_quartile_broadcast" -> Decl(
      (s, d) => {
        val c = Tables(s, d, "customer")
        val th = c.groupBy("c_mktsegment").agg(
          round(percentile(col("c_acctbal"), lit(0.25)), 6).as("q1"),
          round(percentile(col("c_acctbal"), lit(0.5)), 6).as("q2"),
          round(percentile(col("c_acctbal"), lit(0.75)), 6).as("q3"),
          min(struct(col("c_acctbal"), col("c_custkey")))
            .getField("c_custkey").as("poorest"),
          max(struct(col("c_acctbal"), col("c_custkey")))
            .getField("c_custkey").as("richest"))
        c.join(broadcast(th), "c_mktsegment")
          .select(col("c_custkey"), col("c_mktsegment"),
                  (lit(1) + when(col("c_acctbal") > col("q1"), 1).otherwise(0)
                          + when(col("c_acctbal") > col("q2"), 1).otherwise(0)
                          + when(col("c_acctbal") > col("q3"), 1).otherwise(0))
                    .as("quartile"),
                  col("poorest"), col("richest"))
          .orderBy("c_custkey")
      },
      Some("""WITH th AS (
             |  SELECT c_mktsegment,
             |         round(quantile_cont(c_acctbal, 0.25), 6) AS q1,
             |         round(quantile_cont(c_acctbal, 0.5), 6) AS q2,
             |         round(quantile_cont(c_acctbal, 0.75), 6) AS q3,
             |         (min({'b': c_acctbal, 'k': c_custkey})).k AS poorest,
             |         (max({'b': c_acctbal, 'k': c_custkey})).k AS richest
             |  FROM customer GROUP BY c_mktsegment)
             |SELECT c_custkey, c.c_mktsegment AS c_mktsegment,
             |       CAST(1 + CAST(c_acctbal > q1 AS INT) + CAST(c_acctbal > q2 AS INT)
             |              + CAST(c_acctbal > q3 AS INT) AS INT) AS quartile,
             |       poorest, richest
             |FROM customer c JOIN th ON c.c_mktsegment = th.c_mktsegment
             |ORDER BY c_custkey""".stripMargin)),
    // Real BPE token counting — the budget number of every training-data
    // pipeline (the regex run-length proxy in text_token_count is the
    // cheap approximation; this is the algorithm). Per-row native
    // expression (BpeTokenCount: ranked greedy merges, one compiled fold,
    // no shuffle — scan-speed like every sketch expression), with the
    // DuckDB oracle GENERATED from the same merge list: each rank-k merge
    // is one literal replace over paren-wrapped symbols, which reproduces
    // the left-to-right non-overlapping merge pass exactly, so the two
    // engines hash-match on the real algorithm rather than a proxy.
    // chars_per_token uses the word-chars only (whitespace carries no
    // subword), guarded against empty texts in both engines.
    "text_bpe_token_count" -> Decl(
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
                BpeOps.bpeTokenCount(col("text")).as("bpe_tokens"),
                size(filter(split(col("text"), " "), w => length(w) > 0))
                  .cast("int").as("ws_tokens"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |CAST(coalesce(list_sum(list_transform(
              |  list_filter(string_split(text, ' '), w -> len(w) > 0),
              |  w -> ${BpeOps.duckdbCountExpr("w")})), 0) AS INT) AS bpe_tokens,
              |CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS INT)
              |  AS ws_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)))
}
