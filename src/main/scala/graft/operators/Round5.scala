package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 operator keys — the pretraining-corpus passes the first four
  * rounds left uncovered (eval-set decontamination by n-gram and by
  * Bloom-prefiltered content hash, repetition/NLL quality scoring,
  * context-window sequence packing, overlapping chunking, int8 embedding
  * quantization, domain-mixture rebalancing, funnel analysis) plus the
  * source/sink variants (text lines, binaryFile, mergeSchema evolution,
  * zstd) and the IN / null-free NOT IN subquery predicate paths. Each is
  * DuckDB-oracled.
  *
  * 100 TB notes inline; the common theme is the same as Round4: every
  * query is either a pure per-row projection/filter (repetition ratio,
  * quantization, rebalance keep-filter — scan speed, shuffle-free) or a
  * broadcast-dim / bounded-key shape (decontamination joins the corpus
  * against the SMALL benchmark gram/hash set; packing windows within
  * shards; the LM and per-domain stat tables broadcast like dimensions).
  */
object Round5 {

  val decls: Map[String, Decl] = Map(
    // ---------------------------------------------------- decontamination
    // Benchmark decontamination — THE pass every pretraining corpus runs
    // before training: drop/flag any training doc sharing a word n-gram
    // with the held-out eval set. The fixture corpus has no natural eval
    // set, so one is CONSTRUCTED deterministically (docs with
    // doc_id % 100 = 7, last two tokens dropped — the same perturbation
    // family the near-dup operators plant), which guarantees each of those
    // originals is provably contaminated. 5-grams are hashed to 64 bits
    // per row (ShingleHashSet — the per-row distinct set, no global
    // dedup shuffle); the eval gram set is DISTINCT'd and broadcast, so
    // the corpus side is one scan + one bounded per-doc count. At 100 TB
    // the eval set is KBs-to-MBs (a benchmark suite) against TBs of
    // corpus: broadcast-semi-join at scan speed is exactly the right
    // asymmetry, and the output is per-contaminated-doc, not per-gram.
    "decontaminate_ngram" -> Decl(
      (s, d) => {
        val docs = Pipeline.docsWithTokens(s, d).select(col("doc_id"), col("toks"))
        val evalGrams = docs.filter(pmod(col("doc_id"), lit(100L)) === 7)
          .select(slice(col("toks"), lit(1),
                        greatest(size(col("toks")) - 2, lit(1))).as("toks"))
          .select(explode(graft.functions.TextOps.shingleHashes(col("toks"), 5)).as("g"))
          .distinct()
        docs
          // explicit-count repartition: the fixture corpus is one scan
          // split, and the gram explode + probe join would otherwise run
          // on one core (the standard pre-fan-out discipline, see
          // ScaleSpec's repartition gate)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"),
                  explode(graft.functions.TextOps.shingleHashes(col("toks"), 5)).as("g"))
          .join(broadcast(evalGrams), "g")
          // per-row ShingleHashSet is already distinct within a doc, so
          // count(*) counts distinct shared grams
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |g AS (SELECT DISTINCT doc_id,
             |        unnest(list_transform(generate_series(1, len(t) - 4),
             |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
             |               t[i+3] || ' ' || t[i+4])) AS g
             |      FROM tok WHERE len(t) >= 5),
             |evtok AS (SELECT t[1:greatest(len(t) - 2, 1)] AS t FROM tok
             |          WHERE doc_id % 100 = 7),
             |evg AS (SELECT DISTINCT
             |          unnest(list_transform(generate_series(1, len(t) - 4),
             |            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
             |                 t[i+3] || ' ' || t[i+4])) AS g
             |        FROM evtok WHERE len(t) >= 5)
             |SELECT doc_id, count(*) AS n_shared_grams
             |FROM g JOIN evg USING (g)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Bloom-prefiltered EXACT decontamination — the content-hash variant
    // of decontaminate_ngram: benchmark pages crawled verbatim (modulo
    // case/whitespace noise, planted here as upper+trailing-space copies
    // of the doc_id%100=7 slice) are flagged by normalized-hash equality.
    // The scale shape is sketch-prefilter-then-verify: the eval set's
    // Bloom filter (DataFrame.stat.bloomFilter, ~KBs for any benchmark
    // suite) rides the corpus scan as a codegen'd probe expression
    // (BloomMightContain) that drops ~everything BEFORE the shuffle, and
    // the exact semi-join verify touches only Bloom survivors — so the
    // output is EXACT (false positives die in the verify, making the
    // query oracle-able) while the shuffle is bounded by eval-set size,
    // not corpus size. Same pattern as Catalyst's own runtime bloom
    // pruning (ScaleSpec gates that one), applied as a declared operator.
    "decontaminate_bloom" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
        val evalHashes = docs
          .filter(pmod(col("doc_id"), lit(100L)) === 7)
          .select(md5(lower(trim(concat(upper(col("text")), lit("  ")))))
                    .as("h"))
          .distinct()
        // sketch built at construction time (one job over the tiny eval
        // side) — the same construction-time-materialization tradeoff the
        // pair pipelines make
        val bloom = evalHashes.stat.bloomFilter("h", 100000L, 0.01)
        val hashed = docs.select(col("doc_id"), md5(lower(trim(col("text")))).as("h"))
        hashed
          .filter(graft.functions.SketchOps.bloomMightContain(col("h"), bloom))
          .join(evalHashes, Seq("h"), "left_semi")
          .select(col("doc_id"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id FROM documents
             |WHERE md5(lower(trim(text))) IN (
             |  SELECT md5(lower(trim(upper(text) || '  ')))
             |  FROM documents WHERE doc_id % 100 = 7)
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------- text
    // Unigram-LM negative log-likelihood — the perplexity-family quality
    // filter: score every document against a reference unigram language
    // model (here: the corpus's own term distribution; in production a
    // held-out reference corpus). Two passes: (1) the LM table —
    // (term, count) + total, vocabulary-bounded, so at 100 TB it
    // broadcasts like any dimension; (2) explode tokens, broadcast-join
    // the LM, one bounded per-doc aggregate of -avg(ln p). High NLL =
    // out-of-distribution text (gibberish, wrong language, spam).
    "text_unigram_nll" -> Decl(
      (s, d) => {
        val tf = Pipeline.docsWithTokens(s, d)
          // pre-fan-out repartition, same discipline as decontaminate_ngram
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), explode(col("toks")).as("term"))
        val lm = tf.groupBy("term").agg(count(lit(1)).as("cnt"))
        val tot = tf.agg(count(lit(1)).as("total"))
        tf.join(broadcast(lm), "term")
          .crossJoin(broadcast(tot))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
               round(-avg(log(col("cnt").cast("double") /
                             col("total").cast("double"))), 6).as("nll"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |lm AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
             |tot AS (SELECT count(*) AS total FROM tok)
             |SELECT doc_id, count(*) AS n_tokens,
             |       round(-avg(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))), 6) AS nll
             |FROM tok JOIN lm USING (term) CROSS JOIN tot
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Repetition-ratio quality signal (the Gopher/RefinedWeb family):
    // fraction of repeated tokens and repeated bigrams within a document —
    // boilerplate and generated spam score high, natural text low. PURE
    // per-row projection (the distinct counts come from the per-row
    // ShingleHashSet / array_distinct), so at 100 TB this runs at scan
    // speed with no shuffle beyond the declared output order.
    "text_repetition_ratio" -> Decl(
      (s, d) => {
        val docs = Pipeline.docsWithTokens(s, d)
        docs.select(
          col("doc_id"),
          size(col("toks")).as("n_tokens"),
          round(lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
                           size(col("toks")), 6).as("tok_rep"),
          when(size(col("toks")) >= 2,
               round(lit(1.0) -
                     size(graft.functions.TextOps.shingleHashes(col("toks"), 2))
                       .cast("double") / (size(col("toks")) - 1), 6))
            .otherwise(0.0).as("bigram_rep"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
             |SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
             |  round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) AS tok_rep,
             |  CASE WHEN len(t) >= 2 THEN
             |    round(1.0 - CAST(len(list_distinct(
             |      list_transform(generate_series(1, len(t) - 1),
             |                     i -> t[i] || ' ' || t[i+1]))) AS DOUBLE)
             |          / (len(t) - 1), 6)
             |  ELSE 0.0 END AS bigram_rep
             |FROM tok ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------- packing
    // Context-window sequence packing — the concat-and-chunk pass that
    // turns a ragged document stream into fixed 2048-token training
    // sequences: docs are concatenated in doc_id order within a shard and
    // each doc records the sequence it starts in and its token offset
    // there. Shards (doc_id % 8) make the window partition-parallel: at
    // 100 TB the shard count scales with the cluster and each shard's
    // running sum is one partition-local window, never a global sort.
    "pack_sequences" -> Decl(
      (s, d) => {
        val docs = Pipeline.docsWithTokens(s, d)
          .select(col("doc_id"), pmod(col("doc_id"), lit(8L)).as("shard"),
                  size(col("toks")).as("n_tokens"))
        val w = Window.partitionBy("shard").orderBy("doc_id")
        docs
          .withColumn("start", sum(col("n_tokens").cast("bigint")).over(w) -
                               col("n_tokens"))
          .select(col("doc_id"), col("shard"), col("n_tokens"),
                  expr("start div 2048").as("seq_id"),
                  pmod(col("start"), lit(2048L)).as("offset"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, doc_id % 8 AS shard,
             |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
             |  FROM documents),
             |c AS (SELECT doc_id, shard, n_tokens,
             |        CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
             |             AS BIGINT) - n_tokens AS start
             |      FROM t)
             |SELECT doc_id, shard, n_tokens,
             |       CAST(start // 2048 AS BIGINT) AS seq_id,
             |       CAST(start % 2048 AS BIGINT) AS offset
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Overlapping token-window chunking — the RAG/embedding-prep pass
    // that splits long documents into fixed windows with overlap (64
    // tokens, stride 48): chunk s covers tokens [48s+1, 48s+64], so
    // consecutive chunks share 16 tokens and no token is lost. Pure
    // per-row fan-out (sequence → explode → slice), scan-parallel after
    // the usual pre-fan-out repartition; at 100 TB this runs at scan
    // speed and the chunk table is the input to the embedding stage.
    "text_chunk_overlap" -> Decl(
      (s, d) => {
        Pipeline.docsWithTokens(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), col("toks"),
                  explode(sequence(lit(0),
                    expr("((size(toks) - 1) div 48) * 48").cast("int"), lit(48)))
                    .as("start"))
          .select(col("doc_id"),
                  expr("start div 48").cast("bigint").as("chunk_id"),
                  least(lit(64), size(col("toks")) - col("start")).as("chunk_tokens"),
                  concat_ws(" ", slice(col("toks"), col("start") + 1, lit(64))).as("chunk_text"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |c AS (SELECT doc_id, t,
             |        unnest(generate_series(0, ((len(t) - 1) // 48) * 48, 48)) AS start
             |      FROM tok)
             |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id,
             |       CAST(least(64, len(t) - start) AS INT) AS chunk_tokens,
             |       array_to_string(t[start + 1 : least(start + 64, len(t))], ' ') AS chunk_text
             |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // Int8 embedding quantization — the 4× storage/bandwidth lever every
    // billion-vector store applies: per-vector symmetric scale
    // (127/max|v|), values mapped with floor(x·scale + 0.5) (explicit
    // half-up — both engines agree, unlike round()'s half-even ties on
    // doubles). Pure per-row HOF projection at scan speed; the rounded
    // scale rides along so consumers can dequantize. The quantized vector
    // is emitted as a SCALAR fingerprint (md5 over the comma-joined
    // values + element sum), not the raw array: round 5 proved the
    // driver's compare cannot sort/hash list columns (pandas
    // `unhashable type: numpy.ndarray`), and the md5 pins every element
    // and its order just as hard.
    "vec_quantize_int8" -> Decl(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val maxAbs = expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))")
        emb.select(col("vec_id"), maxAbs.as("max_abs"), col("embedding"))
          .select(col("vec_id"),
                  round(lit(127.0) / col("max_abs"), 6).as("scale"),
                  expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * " +
                       "(127.0 / max_abs) + 0.5) AS INT))").as("q"))
          .select(col("vec_id"), col("scale"),
                  expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)").as("q_sum"),
                  md5(expr("array_join(transform(q, x -> CAST(x AS STRING)), ',')"))
                    .as("q_md5"))
          .orderBy("vec_id")
      },
      Some("""WITH m AS (
             |  SELECT vec_id, embedding,
             |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
             |           (acc, x) -> greatest(acc, x)) AS max_abs
             |  FROM embeddings),
             |q AS (
             |  SELECT vec_id, round(127.0 / max_abs, 6) AS scale,
             |         list_transform(embedding,
             |           x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / max_abs) + 0.5) AS INT)) AS q
             |  FROM m)
             |SELECT vec_id, scale, CAST(list_sum(q) AS BIGINT) AS q_sum,
             |       md5(array_to_string(q, ',')) AS q_md5
             |FROM q ORDER BY vec_id""".stripMargin)),

    // -------------------------------------------------------------- join
    // Null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — the join
    // semantics where NULL keys MATCH each other instead of vanishing:
    // required whenever a nullable dimension key must still group its
    // unknowns together (e.g. joining records by possibly-missing
    // attribution). Nulls are planted deterministically on the 25-row
    // nation dim so the bounded self-join provably exercises the
    // null-matches-null row. Plans as a hash join (null-safe equality is
    // a valid hash key: null hashes like any value), not a nested loop.
    "join_null_safe_eq" -> Decl(
      (s, d) => {
        val n = Tables(s, d, "nation")
          .select(col("n_nationkey"),
                  when(pmod(col("n_nationkey"), lit(5L)) === 0, lit(null))
                    .otherwise(col("n_regionkey")).as("rk"))
        n.as("a").join(n.as("b"), col("a.rk") <=> col("b.rk"))
          .select(col("a.n_nationkey").as("nk_a"), col("b.n_nationkey").as("nk_b"),
                  col("a.rk").as("rk"))
          .orderBy("nk_a", "nk_b")
      },
      Some("""WITH n AS (SELECT n_nationkey,
             |  CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_regionkey END AS rk
             |  FROM nation)
             |SELECT a.n_nationkey AS nk_a, b.n_nationkey AS nk_b, a.rk AS rk
             |FROM n a JOIN n b ON a.rk IS NOT DISTINCT FROM b.rk
             |ORDER BY nk_a, nk_b""".stripMargin)),

    // ------------------------------------------------------------ scalar
    // Error-safe arithmetic — try_divide/try_add (the ANSI-mode escape
    // hatch): divide-by-zero and overflow yield NULL instead of failing
    // the job, which at 100 TB is the difference between one bad row and
    // a dead 6-hour pipeline. Zero denominators are planted via pmod so
    // every run provably exercises the null path.
    "scalar_try_arith" -> Decl(
      (s, d) => Tables(s, d, "orders")
        .select(col("o_orderkey"),
                pmod(col("o_orderkey"), lit(10L)).as("den"),
                round(try_divide(col("o_totalprice"),
                                 pmod(col("o_orderkey"), lit(10L))), 6).as("safe_div"),
                try_add(col("o_orderkey"), lit(Long.MaxValue)).as("safe_add"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderkey % 10 AS den,
             |CASE WHEN o_orderkey % 10 = 0 THEN NULL
             |     ELSE round(o_totalprice / (o_orderkey % 10), 6) END AS safe_div,
             |CASE WHEN o_orderkey <= 0 THEN o_orderkey + 9223372036854775807
             |     ELSE NULL END AS safe_add
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------------ window
    // Time-interval RANGE frame — a trailing 30-day window over the date
    // ordering (window_range_frame covers the NUMERIC range case; this is
    // the calendar-interval one every time-series rollup needs). RANGE
    // frames include ties (all same-date peers) identically in both
    // engines, and DATE arithmetic has no sub-second representation trap.
    // Partitioned by priority, so the sort is per-key, never global.
    "window_range_interval" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT o_orderkey, o_orderpriority, o_orderdate,
                |  count(*) OVER w AS n_trailing_30d,
                |  round(sum(o_totalprice) OVER w, 2) AS sum_trailing_30d
                |FROM orders
                |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
                |             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_orderpriority, o_orderdate,
             |  count(*) OVER w AS n_trailing_30d,
             |  round(sum(o_totalprice) OVER w, 2) AS sum_trailing_30d
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
             |             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
             |ORDER BY o_orderkey""".stripMargin)),

    // Grouping diagnostics — grouping()/grouping_id() over a rollup: the
    // SQL surface that tells subtotal rows apart from genuine NULL group
    // keys (agg_rollup covers the rollup itself; this covers the
    // disambiguation every BI layer on top of it needs).
    "agg_grouping_id" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
                |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
                |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
                |  count(*) AS n
                |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
                |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
             |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
             |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
             |  count(*) AS n
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // ------------------------------------------------------------ window
    // Forward fill — last_value(... IGNORE NULLS) over a running frame:
    // THE gap-filling pattern for sparse time series (carry the last
    // known reading forward). Nulls are planted deterministically
    // (every third event's value) so the fill provably fires; rows
    // before any non-null value stay NULL. Per-user partitions keep the
    // window sort partition-local at any scale.
    "window_forward_fill" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""WITH e AS (
                |  SELECT event_id, user_id,
                |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE round(value, 6) END AS v
                |  FROM events)
                |SELECT event_id, user_id, v,
                |  last_value(v) IGNORE NULLS OVER (
                |    PARTITION BY user_id ORDER BY event_id
                |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
                |FROM e ORDER BY event_id""".stripMargin)
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id,
             |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE round(value, 6) END AS v
             |  FROM events)
             |SELECT event_id, user_id, v,
             |  last_value(v IGNORE NULLS) OVER (
             |    PARTITION BY user_id ORDER BY event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
             |FROM e ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------- stats
    // Higher-moment statistics (skewness, excess kurtosis) from ONE pass
    // of power sums — the distributed-moments formulation: each partition
    // partial-aggregates (n, Σx, Σx², Σx³, Σx⁴), the shuffle carries five
    // scalars per group, and the moments assemble after the merge. The
    // built-in skewness()/kurtosis() are avoided on PURPOSE: their
    // bias-correction conventions differ across engines, while the raw
    // population moments below are pinned by explicit arithmetic that
    // both engines execute identically (6-dp round absorbs the
    // summation-order float noise).
    "agg_skew_kurtosis" -> Decl(
      (s, d) => {
        val x = col("o_totalprice").cast("double")
        Tables(s, d, "orders")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).cast("double").as("n"),
               sum(x).as("s1"), sum(x * x).as("s2"),
               sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
          .select(col("o_orderstatus"),
                  col("n").cast("bigint").as("n_rows"),
                  expr("""round((s3/n - 3*(s1/n)*(s2/n) + 2*pow(s1/n, 3)) /
                         |      pow(s2/n - pow(s1/n, 2), 1.5), 6)""".stripMargin)
                    .as("skewness"),
                  expr("""round((s4/n - 4*(s1/n)*(s3/n) + 6*pow(s1/n,2)*(s2/n)
                         |       - 3*pow(s1/n, 4)) /
                         |      pow(s2/n - pow(s1/n, 2), 2) - 3, 6)""".stripMargin)
                    .as("excess_kurtosis"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH m AS (
             |  SELECT o_orderstatus, CAST(count(*) AS DOUBLE) AS n,
             |         sum(o_totalprice) AS s1,
             |         sum(o_totalprice * o_totalprice) AS s2,
             |         sum(o_totalprice * o_totalprice * o_totalprice) AS s3,
             |         sum(o_totalprice * o_totalprice * o_totalprice * o_totalprice) AS s4
             |  FROM orders GROUP BY o_orderstatus)
             |SELECT o_orderstatus, CAST(n AS BIGINT) AS n_rows,
             |  round((s3/n - 3*(s1/n)*(s2/n) + 2*pow(s1/n, 3)) /
             |        pow(s2/n - pow(s1/n, 2), 1.5), 6) AS skewness,
             |  round((s4/n - 4*(s1/n)*(s3/n) + 6*pow(s1/n,2)*(s2/n) - 3*pow(s1/n, 4)) /
             |        pow(s2/n - pow(s1/n, 2), 2) - 3, 6) AS excess_kurtosis
             |FROM m ORDER BY o_orderstatus""".stripMargin)),

    // -------------------------------------------------------- predicates
    // IN (subquery) — a distinct Catalyst decorrelation path from the
    // EXISTS key (predicate_exists_subq): InSubquery rewrites to a left
    // SEMI join on the subquery output. Same scalable shape as any semi
    // join: the subquery side aggregates/dedups before the join.
    "predicate_in_subq" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT o_orderkey, o_totalprice
                |FROM orders
                |WHERE o_custkey IN (SELECT c_custkey FROM customer
                |                    WHERE c_acctbal > 9000)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_custkey IN (SELECT c_custkey FROM customer
             |                    WHERE c_acctbal > 9000)
             |ORDER BY o_orderkey""".stripMargin)),

    // NOT IN (subquery) — the classic three-valued-logic trap: if the
    // subquery produces ANY null, NOT IN yields no rows at all, so a
    // nullable subquery forces Spark into a null-aware anti join (the
    // per-row null-check formulation). Here the subquery key is provably
    // non-null, so the planner degrades NOT IN to a PLAIN broadcast anti
    // join (condition: none — verified in the physical plan) — which is
    // the point at scale: keep NOT IN subquery sides null-free, or the
    // engine pays the null-aware row-by-row check.
    "predicate_not_in_subq" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT c_custkey, c_acctbal
                |FROM customer
                |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                |                        WHERE o_totalprice > 400000)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
             |                        WHERE o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    // Boolean aggregates — bool_and/bool_or (ANY/EVERY), the predicate
    // summarization surface; partial-agg'd like any other aggregate.
    "agg_bool_any_every" -> Decl(
      (s, d) => Tables(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
             bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
             count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |bool_and(o_totalprice > 1000) AS all_over_1k,
             |bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
             |count(*) AS n
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ----------------------------------------------------- sources/sinks
    // Plain-text-lines source — spark.read.text, the rawest corpus entry
    // path (one line per document, the way web-scale text dumps actually
    // arrive). Roundtrip: write the corpus as a text file, read it back,
    // recover the per-length distribution; the oracle derives the same
    // distribution from the documents table (length(text) = n_chars is a
    // fixture invariant).
    "source_text_lines" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_textsrc").toString
        Tables(s, d, "documents").select(col("text"))
          .write.mode("overwrite").text(dir)
        s.read.text(dir)
          .groupBy(length(col("value")).as("len"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("len")
      },
      Some("""SELECT n_chars AS len, count(*) AS n_docs FROM documents
             |GROUP BY n_chars ORDER BY len""".stripMargin)),

    // Binary-file source — spark.read.format("binaryFile"), the ingestion
    // path for opaque media blobs (images/audio): each file surfaces as
    // (path, modificationTime, length, content BINARY). A bounded slice of
    // the corpus (doc_id < 200, so the file count is constant at every sf)
    // is materialized as one .bin file per doc, then read back
    // distributed; filename → doc_id, plus byte-level metadata the later
    // multimodal stages consume. The write side is driver-local by design
    // (blobs normally ALREADY exist on storage; the query under test is
    // the distributed read).
    "source_binaryfile" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_binsrc")
        Tables(s, d, "documents")
          .filter(col("doc_id") < 200)
          .select(col("doc_id"), col("text")).collect()
          .foreach { r =>
            java.nio.file.Files.write(
              dir.resolve(f"d${r.getLong(0)}%06d.bin"),
              r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        s.read.format("binaryFile").load(dir.toString)
          .select(
            regexp_extract(col("path"), "d(\\d+)\\.bin$", 1).cast("bigint").as("doc_id"),
            col("length").as("n_bytes"),
            ascii(substring(decode(col("content"), "UTF-8"), 1, 1)).cast("int")
              .as("head_byte"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |CAST(ascii(substr(text, 1, 1)) AS INT) AS head_byte
             |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)),

    // Schema-evolution read — two parquet batches with different column
    // sets (the v1 writer knew `lang`, the v2 writer added `source`)
    // merged at read time with mergeSchema: the union schema surfaces with
    // NULLs where a batch lacked the column. This is how a long-lived
    // 100 TB table absorbs writer upgrades without rewriting history.
    "source_schema_merge" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_evolve").toString
        val docs = Tables(s, d, "documents")
        docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
          .select(col("doc_id"), col("lang"))
          .write.mode("overwrite").parquet(s"$dir/batch=v1")
        docs.filter(pmod(col("doc_id"), lit(2L)) === 1)
          .select(col("doc_id"), col("lang"), col("source"))
          .write.mode("overwrite").parquet(s"$dir/batch=v2")
        s.read.option("mergeSchema", "true").parquet(dir)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
               count(col("source")).as("n_with_source"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |count(CASE WHEN doc_id % 2 = 1 THEN source END) AS n_with_source
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Columnar-codec sink — the same parquet roundtrip under zstd (the
    // 100 TB at-rest default: ~30% smaller than snappy at similar scan
    // speed). The data contract is codec-independent; what this key pins
    // is that the engine reads back what it wrote under a non-default
    // codec bit-for-bit.
    "sink_zstd_roundtrip" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_zstd").toString
        Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .write.mode("overwrite").option("compression", "zstd").parquet(dir)
        s.read.parquet(dir)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
               round(sum(col("o_totalprice")), 2).as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |round(sum(o_totalprice), 2) AS sum_price
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ------------------------------------------------------------ events
    // Funnel-depth analysis — ordered-sequence detection (view → click →
    // purchase) per user, the classic product-analytics pass engines ship
    // as windowFunnel/MATCH_RECOGNIZE. Each step is "earliest qualifying
    // event STRICTLY after the previous step's time": min-aggregate per
    // user, then a co-partitioned join feeding the next step — three
    // shuffles all keyed on user_id (exchange reuse collapses them at
    // plan time), partial-agg'd map-side, no window over the raw event
    // stream. Strict ts ordering (not event_id tie-break) keeps the
    // cross-engine semantics trivially identical. Depth: 0 = never
    // viewed, 3 = completed the funnel.
    "agg_funnel_depth" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min(col("ts")).as("t2"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts") > col("t2"))
          .groupBy("user_id").agg(min(col("ts")).as("t3"))
        ev.select("user_id").distinct()
          .join(v.select(col("user_id"), lit(1).as("s1")), Seq("user_id"), "left")
          .join(c.select(col("user_id"), lit(1).as("s2")), Seq("user_id"), "left")
          .join(p.select(col("user_id"), lit(1).as("s3")), Seq("user_id"), "left")
          .select(col("user_id"),
                  (coalesce(col("s1"), lit(0)) + coalesce(col("s2"), lit(0)) +
                   coalesce(col("s3"), lit(0))).as("funnel_depth"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
             |            FROM events),
             |v AS (SELECT user_id, min(ts) AS t1 FROM ev
             |      WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM ev e
             |      JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
             |      WHERE e.event_type = 'click' GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM ev e
             |      JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
             |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
             |SELECT u.user_id AS user_id,
             |       CAST((CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END) +
             |            (CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END) +
             |            (CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS INT)
             |         AS funnel_depth
             |FROM (SELECT DISTINCT user_id FROM ev) u
             |LEFT JOIN v ON u.user_id = v.user_id
             |LEFT JOIN c ON u.user_id = c.user_id
             |LEFT JOIN p ON u.user_id = p.user_id
             |ORDER BY u.user_id""".stripMargin)),

    // --------------------------------------------------------- mixtures
    // Domain-mixture rebalancing — flatten a skewed domain distribution
    // toward uniform ('en' is ~44% of the corpus; the target is
    // total/n_domains per language): each domain keeps
    // min(1, target/actual) of its docs. The keep decision is ALL-INTEGER
    // (ticket·n_docs·n_domains < 1000·total) so no float boundary can
    // disagree across engines, and the ticket is the usual multiplicative
    // hash (R8: no rand() — retries and engines agree per row). Shape:
    // tiny per-domain stat table broadcast against the scan, keep-filter
    // at I/O speed — the two-pass stats-then-filter every mixture
    // rebalancer runs at corpus scale.
    "mix_domain_rebalance" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents").select(col("doc_id"), col("lang"))
        val stats = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
        val tot = docs.agg(count(lit(1)).as("total"),
                           countDistinct(col("lang")).as("n_domains"))
        docs.join(broadcast(stats), "lang")
          .crossJoin(broadcast(tot))
          .withColumn("ticket", pmod(col("doc_id") * lit(879190747L), lit(1000L)))
          .filter(col("ticket") * col("n_docs") * col("n_domains") <
                  lit(1000L) * col("total"))
          .select(col("doc_id"), col("lang"), col("ticket"))
          .orderBy("doc_id")
      },
      Some("""WITH stats AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
             |tot AS (SELECT count(*) AS total, count(DISTINCT lang) AS n_domains
             |        FROM documents)
             |SELECT doc_id, lang, (doc_id * 879190747) % 1000 AS ticket
             |FROM documents JOIN stats USING (lang) CROSS JOIN tot
             |WHERE ((doc_id * 879190747) % 1000) * n_docs * n_domains < 1000 * total
             |ORDER BY doc_id""".stripMargin)))
}
