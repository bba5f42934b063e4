package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 operator keys — training-data-pipeline surface that the first
  * three rounds left uncovered, each with a DuckDB oracle.
  *
  * 100 TB notes per key are inline; the common theme is that every query is
  * either a pure per-row projection/filter (redaction, weighted sampling —
  * runs at scan speed, no shuffle) or a *blocked/bucketed* pair generator
  * (edit-distance dedup, bucketized range join — the pair space is bounded
  * by a key before any quadratic work happens).
  */
object Round4 {

  // Java∩RE2-safe patterns (SURVEY §7.3 R7): no backrefs, no lookaround.
  private val EmailRe = "[a-z0-9]+@[a-z0-9.]+\\.[a-z]+"
  private val PhoneRe = "\\+1-555-[0-9]{4}"

  val decls: Map[String, Decl] = Map(
    // ------------------------------------------------------------ text
    // PII redaction — the scrub pass every LLM training corpus runs before
    // anything else. The fixtures' word-soup text contains no natural PII,
    // so the input is *constructed deterministically from columns* (an
    // email and a phone per event) and then redacted; the assertions are
    // real because every row is guaranteed one match of each class.
    // Pure per-row regexp projection: at 100 TB this is scan-speed,
    // shuffle-free, and codegen'd (regexp_replace/regexp_count are native
    // expressions with compiled-pattern caching per task).
    "text_pii_redact" -> Decl(
      (s, d) => {
        val raw = concat(
          lit("contact user"), col("user_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad(pmod(col("event_id"), lit(10000L)).cast("string"), 4, "0"),
          lit(" re "), col("event_type"))
        Tables.events(s, d)
          .select(
            col("event_id"),
            regexp_replace(regexp_replace(raw, EmailRe, "<EMAIL>"),
                           PhoneRe, "<PHONE>").as("redacted"),
            (regexp_count(raw, lit(EmailRe)) +
             regexp_count(raw, lit(PhoneRe))).as("n_redactions"))
          .orderBy("event_id")
      },
      Some(s"""WITH raw AS (
             |  SELECT event_id,
             |  'contact user' || CAST(user_id AS VARCHAR) || '@example.com or +1-555-' ||
             |  lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') || ' re ' || event_type AS t
             |  FROM events)
             |SELECT event_id,
             |  regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
             |                 '$PhoneRe', '<PHONE>', 'g') AS redacted,
             |  CAST(len(regexp_extract_all(t, '$EmailRe')) +
             |       len(regexp_extract_all(t, '$PhoneRe')) AS INT) AS n_redactions
             |FROM raw ORDER BY event_id""".stripMargin)),

    // ---------------------------------------------------------- dedup
    // Edit-distance near-dup — the fuzzy-match family the MinHash/SimHash
    // keys don't cover (they see token sets; Levenshtein sees character
    // edits, catching typo-grade dups). Quadratic in the BLOCK, never the
    // corpus: pairs form only within (lang, source) and the distance runs
    // on a fixed 40-char prefix, so per-pair cost is bounded O(40²).
    // SCALE HONESTY (round-10 ScaleProbe): the fixture's (lang, source)
    // cardinality is fixed, so blocks grow with the corpus and pair count
    // grows quadratically — the probe measured 18× time at 10× data. That
    // is the exact-all-pairs-in-block LOWER BOUND of this declared
    // semantics (radius 20 of 40 chars defeats every lossless banding:
    // pigeonhole needs 21 bands of <2 chars). The linear-scaling
    // production shape is the candidate-gated variant declared right
    // below (dedup_edit_candidates). Threshold 20 on a 40-char prefix
    // admits only the planted near-dups (random word-soup pairs measure
    // ≥21, probed at sf0.01/sf0.1).
    "dedup_edit_distance" -> Decl(
      (s, d) => {
        val p = Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("source"),
                  substring(col("text"), 1, 40).as("p"))
        // Repartition the probe side BEFORE the join: the corpus parquet is
        // one row group (one scan partition), and the small build side gets
        // broadcast — without this the entire quadratic pair-gen +
        // distance loop pipelines on a single core (measured: ~4.5 s with
        // ~1-core utilization at sf0.1). The partition count must be
        // EXPLICIT: the probe rows are only ~100 B each, so AQE's
        // size-based coalescing folds a bare repartition(col) back into one
        // partition — it can't see that the join fans each row out into a
        // block's worth of pairs with an O(len²) residual per pair.
        val a = p.select(col("doc_id").as("id_a"), col("lang"), col("source"),
                         col("p").as("pa"))
          .repartition(s.sparkContext.defaultParallelism, col("id_a"))
        val b = p.select(col("doc_id").as("id_b"), col("lang").as("lang_b"),
                         col("source").as("source_b"), col("p").as("pb"))
        // 3-arg banded levenshtein early-exits above the threshold
        // (returns -1) — same output, less work per pair.
        a.join(b, col("lang") === col("lang_b") &&
                  col("source") === col("source_b") &&
                  col("id_a") < col("id_b"))
          .withColumn("dist", levenshtein(col("pa"), col("pb"), 20))
          .filter(col("dist") >= 0)
          .select("id_a", "id_b", "dist")
          .orderBy("id_a", "id_b")
      },
      Some("""WITH p AS (SELECT doc_id, lang, source, substring(text, 1, 40) AS p
             |           FROM documents)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       levenshtein(a.p, b.p) AS dist
             |FROM p a JOIN p b
             |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
             |WHERE levenshtein(a.p, b.p) <= 20
             |ORDER BY id_a, id_b""".stripMargin)),

    // The LINEAR-scaling edit-distance dedup: candidate pairs come from
    // the df≤32-capped word-bigram inverted index (dedup_ngram_jaccard's
    // exact candidate rule — pairs per doc bounded by df·|shingles|, not
    // block size), then the O(len·threshold) banded Levenshtein verifies
    // candidates only. The candidate gate is PART of the declared
    // semantics (mirrored exactly in the oracle), the same contract
    // discipline as the df cap in dedup_ngram_jaccard: typo-grade dups
    // share almost all bigrams, so rare-shingle co-occurrence recovers
    // them without ever enumerating a block. Candidate and verify joins
    // are all pinned shuffle_hash — nothing corpus-sized broadcasts.
    "dedup_edit_candidates" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val p = Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("source"),
                  substring(col("text"), 1, 40).as("p"),
                  split(col("text"), " ").as("t"))
        val sh = p.filter(size(col("t")) >= 2)
          .select(col("doc_id"), col("lang"), col("source"),
                  explode(expr("array_distinct(transform(slice(t, 1, size(t) - 1), (x, i) -> concat(x, ' ', t[i + 1])))"))
                    .as("g"))
        val dfc = sh.groupBy("lang", "source", "g").agg(count(lit(1)).as("df"))
        // the distinct-shingle df table grows with the corpus — pin the
        // cap join shuffle_hash so it can never broadcast
        val kept = sh
          .join(dfc.filter(col("df") <= 32).drop("df").hint("shuffle_hash"),
                Seq("lang", "source", "g"))
          .repartition(n, col("lang"), col("source"), col("g"))
        val cand = kept.as("a")
          .join(kept.as("b").hint("shuffle_hash"),
                col("a.lang") === col("b.lang") &&
                col("a.source") === col("b.source") &&
                col("a.g") === col("b.g") &&
                col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct()
        cand
          .repartition(n, col("id_a"))
          .join(p.select(col("doc_id").as("id_a"), col("p").as("pa"))
                  .hint("shuffle_hash"), "id_a")
          .join(p.select(col("doc_id").as("id_b"), col("p").as("pb"))
                  .hint("shuffle_hash"), "id_b")
          .withColumn("dist", levenshtein(col("pa"), col("pb"), 20))
          .filter(col("dist") >= 0)
          .select("id_a", "id_b", "dist")
          .orderBy("id_a", "id_b")
      },
      Some("""WITH p AS (SELECT doc_id, lang, source, substring(text, 1, 40) AS p,
             |                  string_split(text, ' ') AS t
             |           FROM documents),
             |sh AS (SELECT DISTINCT doc_id, lang, source, g FROM (
             |  SELECT doc_id, lang, source,
             |         unnest(list_transform(generate_series(1, len(t) - 1),
             |                               i -> t[i] || ' ' || t[i + 1])) AS g
             |  FROM p WHERE len(t) >= 2)),
             |dfx AS (SELECT lang, source, g, count(*) AS df
             |        FROM sh GROUP BY 1, 2, 3),
             |kept AS (SELECT sh.doc_id, sh.lang, sh.source, sh.g
             |         FROM sh JOIN dfx USING (lang, source, g) WHERE df <= 32),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |         FROM kept a JOIN kept b
             |           ON a.lang = b.lang AND a.source = b.source
             |          AND a.g = b.g AND a.doc_id < b.doc_id)
             |SELECT id_a, id_b, levenshtein(pa.p, pb.p) AS dist
             |FROM cand JOIN p pa ON pa.doc_id = id_a
             |          JOIN p pb ON pb.doc_id = id_b
             |WHERE levenshtein(pa.p, pb.p) <= 20
             |ORDER BY id_a, id_b""".stripMargin)),

    // ------------------------------------------------------------- agg
    // Deterministic per-group mode (heavy hitter): most frequent order
    // priority per status. Spark's native mode() is tie-nondeterministic
    // (and sf0.001 HAS a tie in status P, probed), so both engines use the
    // relational formulation with an explicit tie-break — count desc, then
    // lowest value. Two bounded-key shuffles (group count + 3-partition
    // window); at 100 TB the count is partial-aggregated map-side, so the
    // shuffle carries one row per (status, priority), not per order.
    "agg_mode_freq" -> Decl(
      (s, d) => {
        val counts = Tables(s, d, "orders")
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("cnt").desc, col("o_orderpriority").asc)
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_orderstatus"),
                  col("o_orderpriority").as("mode_priority"), col("cnt"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, mode_priority, cnt FROM (
             |  SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt,
             |  row_number() OVER (PARTITION BY o_orderstatus
             |       ORDER BY cnt DESC, o_orderpriority ASC) AS rn
             |  FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
             |        FROM orders GROUP BY 1, 2))
             |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin)),

    // Ordered string aggregation — LISTAGG ... WITHIN GROUP, the SQL:2016
    // surface (Spark 4 native). DISTINCT bounds the result to the 5
    // priority values, so the aggregated string can't grow with the data;
    // an unbounded LISTAGG at 100 TB would be a driver-sized string per
    // group and is exactly what this formulation avoids.
    "agg_listagg" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT o_orderstatus,
                |listagg(DISTINCT o_orderpriority, ',')
                |  WITHIN GROUP (ORDER BY o_orderpriority) AS prios
                |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""SELECT o_orderstatus,
             |string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prios
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ---------------------------------------------------------- window
    // Distribution analytics: cume_dist + nth_value over a tie-broken
    // order (R2). nth_value uses the explicit whole-partition frame on
    // both engines — the default running frame would make row N's value
    // depend on its position, which is a cross-engine trap.
    "window_distribution" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        val whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
                  round(cume_dist().over(w), 6).as("cd"),
                  nth_value(col("o_orderkey"), 2).over(whole).as("second_key"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |round(cume_dist() OVER w, 6) AS cd,
             |nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
             |    ORDER BY o_totalprice ASC, o_orderkey ASC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority
             |             ORDER BY o_totalprice ASC, o_orderkey ASC)
             |ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------------ join
    // Bucketized range join — the scale rewrite for a PURE range predicate
    // (no equi key at all). Naive planning is a nested-loop over
    // |orders|×|lineitem|; instead each order's 2-day window explodes into
    // its covered day buckets (sequence → explode, exactly 3 days) and each
    // lineitem lands in its one day bucket, turning the θ-join into an
    // equi join on `day` + a cheap residual. Replication factor = window
    // span / bucket width (3 here) — constant, data-independent. At
    // 100 TB: the same rewrite with a composite (day, hash-salt) key if a
    // single day is executor-hot. join_interval_overlap covers the
    // easier equi-key+range case; this is the no-key case.
    "join_range_bucketed" -> Decl(
      (s, d) => {
        val o = Tables(s, d, "orders")
          .filter(col("o_totalprice") > 490000)
          .select(col("o_orderkey"), col("o_orderdate"))
          .withColumn("day", explode(sequence(
            to_date(col("o_orderdate")),
            to_date(col("o_orderdate") + expr("INTERVAL 2 DAYS")))))
        val l = Tables(s, d, "lineitem")
          .select(col("l_shipdate"), col("l_extendedprice"))
          .withColumn("day", to_date(col("l_shipdate")))
        o.join(l, Seq("day"))
          .filter(col("l_shipdate") >= col("o_orderdate") &&
                  col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 2 DAYS"))
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_items"),
               round(sum(col("l_extendedprice")), 2).as("sum_price"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, count(*) AS n_items,
             |round(sum(l_extendedprice), 2) AS sum_price
             |FROM orders o JOIN lineitem l
             |  ON l.l_shipdate >= o.o_orderdate
             | AND l.l_shipdate < o.o_orderdate + INTERVAL 2 DAY
             |WHERE o.o_totalprice > 490000
             |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)),

    // URL canonicalization dedup — the web-corpus pass that collapses crawl
    // duplicates: case-insensitive scheme/host, trailing-slash variants,
    // and tracking query params all map to one canonical form. URLs are
    // constructed deterministically from event columns (scheme/host casing,
    // an every-third-row trailing slash, a utm_ param) so each
    // canonicalization rule provably fires. Pure per-row regexp + one
    // bounded-key groupBy — at 100 TB the canonical form is exactly the
    // dedup_exact hash-first shape, applied to URLs instead of text.
    "dedup_url_canonical" -> Decl(
      (s, d) => {
        val url = concat(
          lit("HTTP://Example"), pmod(col("user_id"), lit(5L)).cast("string"),
          lit(".COM/"), col("event_type"), lit("/"),
          pmod(col("event_id"), lit(7L)).cast("string"),
          when(pmod(col("event_id"), lit(3L)) === 0, "/").otherwise(""),
          lit("?utm_source=x&sid="), pmod(col("event_id"), lit(100L)).cast("string"))
        val host = lower(regexp_extract(url, "://([^/?#]+)", 1))
        val path = regexp_replace(regexp_extract(url, "://[^/?#]+([^?#]*)", 1), "/$", "")
        Tables.events(s, d)
          .select(concat(lit("https://"), host, path).as("canon_url"), col("event_id"))
          .groupBy("canon_url")
          .agg(count(lit(1)).as("n_dups"), min(col("event_id")).as("first_seen"))
          .orderBy("canon_url")
      },
      Some("""WITH u AS (
             |  SELECT event_id,
             |  'HTTP://Example' || CAST(user_id % 5 AS VARCHAR) || '.COM/' || event_type ||
             |  '/' || CAST(event_id % 7 AS VARCHAR) ||
             |  CASE WHEN event_id % 3 = 0 THEN '/' ELSE '' END ||
             |  '?utm_source=x&sid=' || CAST(event_id % 100 AS VARCHAR) AS url
             |  FROM events)
             |SELECT 'https://' || lower(regexp_extract(url, '://([^/?#]+)', 1)) ||
             |       regexp_replace(regexp_extract(url, '://[^/?#]+([^?#]*)', 1), '/$', '')
             |         AS canon_url,
             |       count(*) AS n_dups, min(event_id) AS first_seen
             |FROM u GROUP BY 1 ORDER BY canon_url""".stripMargin)),

    // HTML boilerplate strip — tag removal + entity decode + whitespace
    // collapse, the first step of any web-crawl text pipeline. The markup
    // is constructed around the fixture text so every rule fires on every
    // row. Scan-speed per-row regexps, shuffle-free.
    "text_html_strip" -> Decl(
      (s, d) => {
        val html = concat(
          lit("<div class=\"post\"><p>"), substring(col("text"), 1, 60),
          lit("</p><br/>&amp; <a href=\""), col("source"), lit("\">link</a></div>"))
        val stripped = trim(regexp_replace(
          regexp_replace(regexp_replace(html, "<[^>]+>", " "), "&amp;", "&"),
          " +", " "))
        Tables(s, d, "documents")
          .select(col("doc_id"), stripped.as("clean_text"),
                  regexp_count(html, lit("<[^>]+>")).as("n_tags"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
             |  SELECT doc_id,
             |  '<div class="post"><p>' || substring(text, 1, 60) ||
             |  '</p><br/>&amp; <a href="' || source || '">link</a></div>' AS html
             |  FROM documents)
             |SELECT doc_id,
             |  trim(regexp_replace(
             |    replace(regexp_replace(html, '<[^>]+>', ' ', 'g'), '&amp;', '&'),
             |    ' +', ' ', 'g')) AS clean_text,
             |  CAST(len(regexp_extract_all(html, '<[^>]+>')) AS INT) AS n_tags
             |FROM h ORDER BY doc_id""".stripMargin)),

    // Approximate heavy hitters — Spark 4's approx_top_k sketch (mergeable,
    // one pass): THE 100 TB frequent-items pattern, where an exact
    // global count would shuffle every distinct value. No DuckDB twin
    // (sketch internals are impl-defined) — OperatorSpec bounds it against
    // the exact top-k instead, per the approximate-ops contract.
    "agg_approx_topk" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT item AS term, count AS cnt
                |FROM (SELECT inline(approx_top_k(l_returnflag, 3)) FROM lineitem)
                |ORDER BY cnt DESC, term ASC""".stripMargin)
      },
      None),

    // Mergeable quantile sketch rollup — KLL (DataSketches, Spark 4
    // native): one pass builds a sketch per group; the global quantile
    // comes from MERGING the group sketches, never re-scanning the data.
    // With HLL-union (distinct counts) and approx_top_k (frequent items)
    // this completes the mergeable-sketch trio every 100 TB profiling
    // pipeline runs. The merge folds collect_list of per-group sketches —
    // bounded by GROUP COUNT (3 here), not data size. Sketch internals are
    // impl-defined → oracle-N; OperatorSpec bounds both levels against
    // exact percentiles.
    "agg_kll_quantile_merge" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""WITH g AS (
                |  SELECT o_orderstatus, kll_sketch_agg_double(o_totalprice) AS sk
                |  FROM orders GROUP BY o_orderstatus),
                |per_group AS (
                |  SELECT o_orderstatus,
                |         round(kll_sketch_get_quantile_double(sk, 0.5), 2) AS p50,
                |         round(kll_sketch_get_quantile_double(sk, 0.9), 2) AS p90
                |  FROM g),
                |merged AS (
                |  SELECT 'ALL' AS o_orderstatus,
                |         round(kll_sketch_get_quantile_double(m, 0.5), 2) AS p50,
                |         round(kll_sketch_get_quantile_double(m, 0.9), 2) AS p90
                |  FROM (SELECT aggregate(slice(sks, 2, size(sks) - 1), sks[0],
                |                         (acc, x) -> kll_sketch_merge_double(acc, x)) AS m
                |        FROM (SELECT collect_list(sk) AS sks FROM g)))
                |SELECT * FROM per_group UNION ALL SELECT * FROM merged
                |ORDER BY o_orderstatus""".stripMargin)
      },
      None),

    // Character-entropy quality signal — Shannon entropy of the per-doc
    // character distribution, the classic gibberish/boilerplate filter
    // (natural text sits in a narrow entropy band; repeated padding or
    // random noise falls outside it). Entropy is a PER-ROW property, so it
    // is one native expression (`CharEntropy`: count chars, fold -Σ p·ln p
    // in one compiled loop) — a scan-speed projection with no shuffle,
    // replacing the round-4 relational form (explode every character, two
    // grouped shuffles over ~1.5M scalar rows; ~28 executor-CPU-seconds at
    // sf0.1 against <0.1 for the fold). Entropy is irrational, so the 6 dp
    // round can't sit on a cross-engine summation boundary (unlike the
    // rounded products text_quality_score had to guard).
    "text_char_entropy" -> Decl(
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
                round(graft.functions.SketchOps.charEntropy(col("text")), 6)
                  .as("char_entropy"))
        .filter(col("char_entropy").isNotNull) // empty text has no char rows
        .orderBy("doc_id"),
      Some("""WITH c AS (
             |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
             |f AS (SELECT doc_id, ch, count(*) AS c FROM c WHERE ch <> ''
             |      GROUP BY 1, 2),
             |n AS (SELECT doc_id, sum(c) AS n FROM f GROUP BY 1)
             |SELECT f.doc_id,
             |       round(-sum((c / n) * ln(c / n)), 6) AS char_entropy
             |FROM f JOIN n USING (doc_id) GROUP BY f.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------- sample
    // Quality-weighted sampling — keep probability scales with document
    // length (a stand-in for any per-row quality score), capped at 90%.
    // Same no-RNG discipline as split_train_holdout (R8): a multiplicative
    // hash ticket makes every engine and every retry agree per row. Pure
    // scan filter: no shuffle, runs at I/O speed at any scale.
    "sample_weighted" -> Decl(
      (s, d) => {
        val ticket = pmod(col("doc_id") * lit(741103597L), lit(1000L))
        val keepBelow = least(expr("n_chars div 2"), lit(900L))
        Tables(s, d, "documents")
          .filter(ticket < keepBelow)
          .select(col("doc_id"), col("n_chars"), ticket.as("ticket"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_chars, (doc_id * 741103597) % 1000 AS ticket
             |FROM documents
             |WHERE (doc_id * 741103597) % 1000 < least(n_chars // 2, 900)
             |ORDER BY doc_id""".stripMargin)))
}
