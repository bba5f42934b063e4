package graft.operators

import graft.{Decl, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 additions: batch k-NN join (through the native bounded-heap
  * top-k plan), web-graph triangle counting, temperature-based epoch
  * upsampling, model-based (fixed-weight logistic) quality scoring, SCD2
  * interval construction, chi-square independence testing, and
  * SemDeDup-style semantic-cluster dedup.
  */
object Round8 {

  val decls: Map[String, Decl] = Map(
    // Batch k-NN JOIN — sim_cosine_topk answers ONE query; a real embedding
    // pipeline (retrieval eval, semantic dedup seeding, hard-negative
    // mining) asks thousands at once. The query set is bounded (every
    // 100th vector) and broadcast, so scoring is a scan-speed
    // BroadcastNestedLoop pass — never a shuffle of the corpus. Ranking
    // runs TWICE through the native bounded-heap TopKPerKey plan
    // (plans/TopKPerKey): first per (q_id, shard) — 64 deterministic
    // shards, so no single task ever streams one query's whole corpus,
    // the classic per-key window bottleneck — then per q_id over the
    // ≤ 5×64 survivors. Same total order (rounded cos desc, vec_id asc)
    // at both stages makes the two-stage result provably equal to the
    // direct top-5 the oracle computes.
    "sim_knn_join" -> Decl(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val q = emb.filter(pmod(col("vec_id"), lit(100L)) === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val scored = emb.select(col("vec_id"), col("embedding"))
          .crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
                  round(VectorOps.cosine(col("embedding"), col("qe")), 6).as("cos"),
                  pmod(col("vec_id"), lit(64L)).as("shard"))
        val partial = graft.plans.TopK.perKey(
          scored, Seq("q_id", "shard"), Seq("cos" -> true, "vec_id" -> false), 5)
        graft.plans.TopK.perKey(
            partial, Seq("q_id"), Seq("cos" -> true, "vec_id" -> false), 5)
          .select("q_id", "vec_id", "cos")
          .orderBy(col("q_id"), col("cos").desc, col("vec_id"))
      },
      Some("""WITH q AS (SELECT vec_id AS q_id,
             |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
             |           FROM embeddings WHERE vec_id % 100 = 0),
             |scored AS (
             |  SELECT q_id, e.vec_id AS vec_id,
             |         round(list_cosine_similarity(
             |           list_transform(e.embedding, x -> CAST(x AS DOUBLE)), qe), 6) AS cos
             |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id),
             |r AS (SELECT q_id, vec_id, cos,
             |        row_number() OVER (PARTITION BY q_id
             |                           ORDER BY cos DESC, vec_id ASC) AS rn
             |      FROM scored)
             |SELECT q_id, vec_id, cos FROM r WHERE rn <= 5
             |ORDER BY q_id, cos DESC, vec_id""".stripMargin)),

    // Triangle counting over the synthetic link graph (same deterministic
    // edge construction as graph_pagerank_dangling, sinks included) — the
    // standard graph-quality/community signal next to PageRank. Edges are
    // canonicalized to lo<hi orientation and deduped, so each triangle is
    // counted exactly once as a<b<c; the two joins are plain hash joins on
    // vertex keys. At 100 TB the orientation trick is what bounds the
    // wedge fan-out: a vertex's wedge count is quadratic in its OUT-degree
    // under the orientation, and orienting low→high id on a near-regular
    // graph (degree-ordered orientation on a skewed one) keeps that
    // bounded. The edge table is checkpointed once (KB-scale here; at
    // scale it would be a stored table) and reused by all three join legs.
    "graph_triangle_count" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val docs = Tables(s, d, "documents").select(col("doc_id"))
        val nRows = docs.count()
        val raw = docs.filter(pmod(col("doc_id"), lit(4L)) =!= 0)
          .select(col("doc_id").as("src"),
                  explode(sequence(lit(1), (lit(1L) + pmod(col("doc_id"), lit(2L)))
                    .cast("int"))).as("k"))
          .select(col("src"), pmod(col("src") * 3 + col("k"), lit(nRows)).as("dst"))
        val e = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
                  greatest(col("src"), col("dst")).as("b"))
          .distinct()
          .repartition(n, col("a"))
          .localCheckpoint(true)
        val tri = e.as("e1")
          .join(e.as("e2").hint("shuffle_hash"), col("e1.b") === col("e2.a"))
          .join(e.as("e3").hint("shuffle_hash"),
                col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .agg(count(lit(1)).as("n_triangles"))
        e.agg(count(lit(1)).as("n_edges")).crossJoin(broadcast(tri))
      },
      Some("""WITH nn AS (SELECT count(*) AS ni FROM documents),
             |raw AS (SELECT doc_id AS src, (doc_id * 3 + t.k) % nn.ni AS dst
             |        FROM documents CROSS JOIN nn, (VALUES (1), (2)) t(k)
             |        WHERE doc_id % 4 <> 0 AND t.k <= 1 + doc_id % 2),
             |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |      FROM raw WHERE src <> dst),
             |tri AS (SELECT count(*) AS n_triangles
             |        FROM e e1 JOIN e e2 ON e1.b = e2.a
             |                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
             |SELECT (SELECT count(*) FROM e) AS n_edges, n_triangles FROM tri"""
        .stripMargin)),

    // Epoch-count upsampling — the OTHER half of temperature mixing:
    // mix_temperature_sample DOWN-samples hot domains; a training run also
    // REPEATS low-resource domains for multiple epochs (the mT5/LLaMA data
    // recipe publishes exactly such per-domain epoch factors). epochs_i =
    // min(4, ceil(max_n / n_i)) in pure integer arithmetic (ceil-div as
    // (a+b-1) DIV b — no float anywhere), so the repeat factor is
    // bit-identical across engines and reproducible run-to-run. Per-domain
    // stats are one tiny broadcast aggregate; the ≤4× fan-out rides the
    // scan with no pre-explode shuffle (partitioning is the scan's, so AQE
    // has nothing to coalesce away).
    "mix_upsample_epochs" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents").select(col("doc_id"), col("lang"))
        val stats = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
        val mx = stats.agg(max(col("n_docs")).as("max_n"))
        docs.join(broadcast(stats), "lang")
          .crossJoin(broadcast(mx))
          .withColumn("epochs",
            least(lit(4L), expr("CAST((max_n + n_docs - 1) DIV n_docs AS BIGINT)")))
          .select(col("doc_id"), col("lang"),
                  explode(sequence(lit(1L), col("epochs"))).as("epoch"))
          .orderBy("doc_id", "epoch")
      },
      Some("""WITH stats AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
             |mx AS (SELECT max(n_docs) AS max_n FROM stats)
             |SELECT doc_id, lang,
             |       unnest(generate_series(1, least(4, (max_n + n_docs - 1) // n_docs)))
             |         AS epoch
             |FROM documents JOIN stats USING (lang) CROSS JOIN mx
             |ORDER BY doc_id, epoch""".stripMargin)),

    // Model-based quality scoring — the step after text_quality_score's
    // hand-tuned composite: a fixed-weight logistic regression over the
    // same cheap features (fastText/DCLM-style quality classifiers are
    // exactly this shape: featurize, dot with trained weights, sigmoid,
    // threshold). Weights are compile-time constants standing in for the
    // offline-trained model. Every feature is rounded to the 6-dp grid
    // FIRST (bit-identical inputs), the logit is one fixed left-to-right
    // linear combination (identical IEEE evaluation order in both
    // engines), and the keep decision compares the ROUNDED score — pure
    // per-row projection, scan-speed at any scale.
    "text_quality_logreg" -> Decl(
      (s, d) => Pipeline.docsWithTokens(s, d)
        .select(col("doc_id"),
                size(col("toks")).cast("int").as("n_toks"),
                round(size(array_distinct(col("toks"))).cast("double") /
                      size(col("toks")), 6).as("ttr"),
                round(col("n_chars").cast("double") / size(col("toks")), 6)
                  .as("mean_tok_len"),
                round(expr("size(filter(toks, x -> x = 'the' OR x = 'a'))")
                        .cast("double") / size(col("toks")), 6).as("stop_ratio"))
        .withColumn("z",
          lit(-3.0) + lit(0.02) * col("n_toks") + lit(2.5) * col("ttr") +
            lit(1.2) * col("stop_ratio") - lit(0.15) * col("mean_tok_len"))
        .select(col("doc_id"),
                round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("score"))
        .withColumn("keep", col("score") >= 0.5)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks
             |           FROM documents),
             |f AS (SELECT doc_id,
             |        CAST(len(toks) AS INT) AS n_toks,
             |        round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS ttr,
             |        round(CAST(n_chars AS DOUBLE) / len(toks), 6) AS mean_tok_len,
             |        round(CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a'))
             |              AS DOUBLE) / len(toks), 6) AS stop_ratio
             |      FROM t),
             |z AS (SELECT doc_id,
             |        -3.0 + 0.02 * n_toks + 2.5 * ttr + 1.2 * stop_ratio
             |          - 0.15 * mean_tok_len AS z
             |      FROM f)
             |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS score,
             |       round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS keep
             |FROM z ORDER BY doc_id""".stripMargin)),

    // SCD2 interval construction — turn an event change-log into
    // slowly-changing-dimension version rows ([valid_from, valid_to)
    // half-open intervals, open-ended current row): the warehouse pattern
    // every CDC ingest materializes before point-in-time joins (the as-of
    // family consumes exactly this shape). One window per user_id — a
    // high-cardinality key, so the partition-per-task shape scales (this
    // is what the low-cardinality window allowlist permits corpus-fed
    // windows to look like). (ts, event_id) ordering gives a unique total
    // order; version numbers are dense per user.
    "scd2_intervals" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("valid_from"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type").as("status"),
                  col("ts").as("valid_from"))
          .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
          .withColumn("version", row_number().over(w))
          .orderBy("user_id", "version")
      },
      Some("""SELECT user_id, event_id, event_type AS status,
             |  CAST(ts AS TIMESTAMP) AS valid_from,
             |  lead(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
             |    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS valid_to,
             |  CAST(row_number() OVER (PARTITION BY user_id
             |    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS INT) AS version
             |FROM events ORDER BY user_id, version""".stripMargin)),

    // Chi-square independence test of the lang×source mixture — the
    // hypothesis-test companion to agg_mutual_info's information-theoretic
    // view (corpus-dashboard: "did the crawl's source mix shift per
    // language?"). The contingency table is one bounded-key groupBy
    // (|langs|×|sources| cells); the full expected grid — including
    // zero-observed cells, which the groupBy alone would miss — comes from
    // crossing the two marginal aggregates, all KB-sized. Everything after
    // the counts is pure arithmetic; only the final 25-cell sum crosses
    // engines, absorbed by the 6-dp round.
    "agg_chi_square" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val o = docs.groupBy("lang", "source").agg(count(lit(1)).as("o"))
        val rt = docs.groupBy("lang").agg(count(lit(1)).as("rt"))
        val ct = docs.groupBy("source").agg(count(lit(1)).as("ct"))
        val tot = docs.agg(count(lit(1)).cast("double").as("n"))
        val grid = rt.crossJoin(ct).crossJoin(broadcast(tot))
          .join(o, Seq("lang", "source"), "left")
          .withColumn("e", col("rt") * col("ct") / col("n"))
          .withColumn("contrib",
            pow(coalesce(col("o"), lit(0L)) - col("e"), 2) / col("e"))
        val dims = docs.agg(
          ((countDistinct(col("lang")) - 1) * (countDistinct(col("source")) - 1))
            .as("dof"))
        grid.agg(round(sum(col("contrib")), 6).as("chi2")).crossJoin(broadcast(dims))
      },
      Some("""WITH o AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
             |rt AS (SELECT lang, count(*) AS rt FROM documents GROUP BY 1),
             |ct AS (SELECT source, count(*) AS ct FROM documents GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
             |grid AS (SELECT rt.lang, ct.source, rt.rt, ct.ct, coalesce(o.o, 0) AS obs
             |         FROM rt CROSS JOIN ct
             |         LEFT JOIN o ON o.lang = rt.lang AND o.source = ct.source),
             |c AS (SELECT sum(pow(obs - rt * ct / n.n, 2) / (rt * ct / n.n)) AS chi2
             |      FROM grid CROSS JOIN n)
             |SELECT round(chi2, 6) AS chi2,
             |  (SELECT (count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
             |   FROM documents) AS dof
             |FROM c""".stripMargin)),

    // SemDeDup-style semantic-cluster dedup — cluster the embedding space
    // (the same seeded 2-round Lloyd as sim_ann_ivf), then find near-dup
    // pairs WITHIN clusters only: the pair space is bounded by cell size
    // instead of corpus size, which is the published SemDeDup recipe for
    // billion-document semantic dedup (at 100 TB nlist grows with the
    // corpus to hold cell size constant — here it is the label-seeded cell
    // count). Planted swapped-coordinate twins (the dedup_embedding_cosine
    // corpus) make the signal live; near-identical vectors land in the
    // same cell, so planted recall is asserted in OperatorSpec rather than
    // oracled (cluster assignment is not DuckDB-expressible). Cell
    // assignment is the compiled CentroidAssign scan; the within-cell
    // self-join is pinned shuffle_hash on an explicit-count repartition —
    // never a broadcast of the corpus-sized assignment table.
    "dedup_semantic_cluster" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val emb = Tables(s, d, "embeddings")
        var cent = PipelineExt.ivfCentroidOf(
          emb.join(broadcast(PipelineExt.ivfLabelSeed(s, d)), "label")
            .select(col("cid"), col("embedding")))
          .localCheckpoint(true)
        for (_ <- 1 to 2)
          cent = PipelineExt.ivfCentroidOf(
            emb.join(PipelineExt.ivfAssignLazy(s, d, cent), "vec_id")
              .select(col("cid"), col("embedding")))
            .localCheckpoint(true)
        val rows = cent.select(col("cid"), col("centroid")).collect()
          .sortBy(_.getInt(0))
        val cids = rows.map(_.getInt(0))
        val cents = rows.map(_.getSeq[Float](1).toArray)
        val pert = emb.select(
          (col("vec_id") + 100000L).as("vec_id"),
          concat(array(element_at(col("embedding"), 2), element_at(col("embedding"), 1)),
                 slice(col("embedding"), lit(3), lit(62))).as("embedding"))
        val assigned = emb.select(col("vec_id"), col("embedding")).unionAll(pert)
          .repartition(n, col("vec_id"))
          .select(col("vec_id"), col("embedding"),
                  VectorOps.centroidAssign(col("embedding"), cids, cents).as("cid"))
          .repartition(n, col("cid"))
        assigned.as("a")
          .join(assigned.as("b").hint("shuffle_hash"),
                col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
          .withColumn("cos",
            round(VectorOps.cosine(col("a.embedding"), col("b.embedding")), 6))
          .filter(col("cos") >= 0.95)
          .select(col("a.cid").as("cid"), col("a.vec_id").as("id_a"),
                  col("b.vec_id").as("id_b"), col("cos"))
          .orderBy("cid", "id_a", "id_b")
      },
      None))
}
