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

  /** Unrolled 4-iteration synchronous label propagation over the same
    * deterministic undirected graph as graph_triangle_count. Each step is
    * one neighbor-label count plus a max-count/min-label argmax, expressed
    * as min over a ('nc' = -count, 'l' = label) struct — the lexicographic
    * struct-min trick both engines agree on bit-for-bit (no float anywhere).
    */
  /** Shared oracle CTE prefix building the deterministic undirected graph
    * used by graph_triangle_count / graph_label_propagation /
    * graph_bfs_layers (Round8b) — ends at the symmetrized `adj` table.
    */
  private[operators] def graphOracleCtes: String =
    """WITH nn AS (SELECT count(*) AS ni FROM documents),
      |raw AS (SELECT doc_id AS src, (doc_id * 3 + t.k) % nn.ni AS dst
      |        FROM documents CROSS JOIN nn, (VALUES (1), (2)) t(k)
      |        WHERE doc_id % 4 <> 0 AND t.k <= 1 + doc_id % 2),
      |c AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |      FROM raw WHERE src <> dst),
      |adj AS (SELECT a AS src, b AS dst FROM c UNION ALL SELECT b, a FROM c)"""
      .stripMargin

  private def lpaOracleSql: String = {
    val b = new StringBuilder(graphOracleCtes +
      """,
        |l0 AS (SELECT doc_id AS v, doc_id AS l FROM documents)""".stripMargin)
    (1 to 4).foreach { i =>
      b.append(s""",
        |l$i AS (SELECT p.v, coalesce(m.pick, p.l) AS l FROM l${i - 1} p LEFT JOIN (
        |    SELECT dst, (min({'nc': -cnt, 'l': l})).l AS pick FROM (
        |      SELECT adj.dst AS dst, q.l AS l, count(*) AS cnt
        |      FROM l${i - 1} q JOIN adj ON q.v = adj.src GROUP BY adj.dst, q.l) x
        |    GROUP BY dst) m ON m.dst = p.v)""".stripMargin)
    }
    b.append("""
      |SELECT v AS doc_id, l AS community FROM l4 ORDER BY v""".stripMargin)
    b.toString
  }

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
        val nRows = Tables.rowCount(s, d, "documents")
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
      None),

    // Synchronous label propagation (community detection) — the
    // community-structure signal next to PageRank (importance) and
    // triangle counting (local clustering): 4 rounds of "adopt the most
    // frequent neighbor label, ties to the smallest", labels seeded with
    // the vertex id. Entirely integer — the argmax is a lexicographic
    // struct-min over (-count, label), so there is no float boundary and
    // the full trajectory is hash-exact cross-engine. Scale shape is the
    // pagerank discipline: the symmetrized edge table is derived ONCE,
    // hash-partitioned on src, and persisted; each round moves only the
    // (vertex, label) table through one dst-keyed count shuffle, and the
    // label frame is lineage-truncated mid-loop.
    "graph_label_propagation" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val docs = Tables(s, d, "documents").select(col("doc_id"))
        val nRows = Tables.rowCount(s, d, "documents")
        val raw = docs.filter(pmod(col("doc_id"), lit(4L)) =!= 0)
          .select(col("doc_id").as("src"),
                  explode(sequence(lit(1), (lit(1L) + pmod(col("doc_id"), lit(2L)))
                    .cast("int"))).as("k"))
          .select(col("src"), pmod(col("src") * 3 + col("k"), lit(nRows)).as("dst"))
        val canon = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
                  greatest(col("src"), col("dst")).as("b"))
          .distinct()
        val adj = canon.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(canon.select(col("b").as("src"), col("a").as("dst")))
          .repartition(n, col("src"))
          .localCheckpoint(true)
        var lbl = docs.select(col("doc_id").as("v"), col("doc_id").as("l"))
        (1 to 4).foreach { i =>
          val pick = adj.join(lbl, adj("src") === lbl("v"))
            .groupBy(col("dst"), col("l")).agg(count(lit(1)).as("cnt"))
            .groupBy(col("dst"))
            .agg(min(struct((-col("cnt")).as("nc"), col("l").as("l")))
              .getField("l").as("pick"))
          lbl = lbl.join(pick, lbl("v") === pick("dst"), "left")
            .select(col("v"), coalesce(col("pick"), col("l")).as("l"))
          if (i == 2) lbl = lbl.localCheckpoint()
        }
        val out = lbl.select(col("v").as("doc_id"), col("l").as("community"))
          .orderBy("doc_id")
        adj.unpersist()
        out
      },
      Some(lpaOracleSql)),

    // Two-sample Kolmogorov–Smirnov test (click vs purchase event values) —
    // the distribution-shift detector a data pipeline runs between corpus
    // snapshots ("did the value distribution move?"). Entirely
    // integer-exact until ONE final division: values live on the 2-dp
    // grid, so they become exact cents; the ECDF gap at x is
    // |r1·n2 − r2·n1| in integers (a common-denominator cross-multiply,
    // no float ECDFs to compare), its max is an integer, and the reported
    // D = d_num/(n1·n2) is a single correctly-rounded IEEE division both
    // engines agree on bit-for-bit. The prefix sums run over the DISTINCT
    // value grid (bounded by the 2-dp domain, not the corpus), i.e. an
    // aggregate-fed window, never a corpus-fed one.
    "agg_ks_test" -> Decl(
      (s, d) => {
        val w = Window.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(round(col("value") * 100).cast("bigint").as("cents"),
                  col("event_type"))
        val grid = ev.groupBy("cents")
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
               sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
        grid
          .select(col("cents"), sum(col("c1")).over(w).as("r1"),
                  sum(col("c2")).over(w).as("r2"))
          .crossJoin(broadcast(
            ev.agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n1"),
                   sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                     .as("n2"))))
          .agg(max(abs(col("r1") * col("n2") - col("r2") * col("n1"))).as("d_num"),
               max(col("n1")).as("n1"), max(col("n2")).as("n2"))
          .select(col("n1"), col("n2"), col("d_num"),
                  (col("d_num").cast("double") / (col("n1") * col("n2"))).as("d"))
      },
      Some("""WITH ev AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type
             |            FROM events WHERE event_type IN ('click', 'purchase')),
             |grid AS (SELECT cents,
             |           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
             |           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
             |         FROM ev GROUP BY cents),
             |r AS (SELECT cents,
             |        sum(c1) OVER (ORDER BY cents
             |                      ROWS UNBOUNDED PRECEDING) AS r1,
             |        sum(c2) OVER (ORDER BY cents
             |                      ROWS UNBOUNDED PRECEDING) AS r2
             |      FROM grid),
             |n AS (SELECT sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
             |             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2
             |      FROM ev)
             |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             |       CAST(max(abs(r1 * n2 - r2 * n1)) AS BIGINT) AS d_num,
             |       CAST(max(abs(r1 * n2 - r2 * n1)) AS DOUBLE) / (n1 * n2) AS d
             |FROM r CROSS JOIN n GROUP BY n1, n2""".stripMargin)),

    // Welch's unequal-variance t-test (click vs purchase values) — the
    // mean-shift companion to the KS distribution test. The sufficient
    // statistics are EXACT integers (n, Σcents, Σcents² — the 2-dp grid
    // again), so partial aggregation is lossless and order-independent at
    // any scale; the t statistic and Welch–Satterthwaite dof are one fixed
    // arithmetic expression over those integers, written identically in
    // both engines (t is scale-invariant, so cents cancel), with the 6-dp
    // round absorbing terminal ulp noise.
    "agg_ttest_welch" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_type"),
                  round(col("value") * 100).cast("bigint").as("c"))
        ev.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
               sum(col("c") * col("c")).as("q"))
          .agg(max(when(col("event_type") === "click", col("n"))).as("n1"),
               max(when(col("event_type") === "click", col("s"))).as("s1"),
               max(when(col("event_type") === "click", col("q"))).as("q1"),
               max(when(col("event_type") === "purchase", col("n"))).as("n2"),
               max(when(col("event_type") === "purchase", col("s"))).as("s2"),
               max(when(col("event_type") === "purchase", col("q"))).as("q2"))
          .select(col("n1"), col("n2"),
                  round(col("s1").cast("double") / col("n1") / 100, 6).as("mean1"),
                  round(col("s2").cast("double") / col("n2") / 100, 6).as("mean2"),
                  expr("""round((CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2) /
                         | sqrt((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1)/(n1-1)/n1
                         |     + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n2)/(n2-1)/n2),
                         | 6)""".stripMargin).as("t"),
                  expr("""round(pow((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1)/(n1-1)/n1
                         |        + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n2)/(n2-1)/n2, 2)
                         | / (pow((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1)/(n1-1)/n1, 2)/(n1-1)
                         |  + pow((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n2)/(n2-1)/n2, 2)/(n2-1)),
                         | 4)""".stripMargin).as("dof"))
      },
      Some("""WITH g AS (SELECT event_type, count(*) AS n, sum(c) AS s, sum(c * c) AS q
             |  FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
             |        FROM events WHERE event_type IN ('click', 'purchase')) GROUP BY 1),
             |w AS (SELECT
             |  CAST(max(CASE WHEN event_type = 'click' THEN n END) AS BIGINT) AS n1,
             |  CAST(max(CASE WHEN event_type = 'click' THEN s END) AS BIGINT) AS s1,
             |  CAST(max(CASE WHEN event_type = 'click' THEN q END) AS BIGINT) AS q1,
             |  CAST(max(CASE WHEN event_type = 'purchase' THEN n END) AS BIGINT) AS n2,
             |  CAST(max(CASE WHEN event_type = 'purchase' THEN s END) AS BIGINT) AS s2,
             |  CAST(max(CASE WHEN event_type = 'purchase' THEN q END) AS BIGINT) AS q2
             |  FROM g)
             |SELECT n1, n2,
             |  round(CAST(s1 AS DOUBLE)/n1/100, 6) AS mean1,
             |  round(CAST(s2 AS DOUBLE)/n2/100, 6) AS mean2,
             |  round((CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2) /
             |   sqrt((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1)/(n1-1)/n1
             |       + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n2)/(n2-1)/n2),
             |   6) AS t,
             |  round(pow((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1)/(n1-1)/n1
             |          + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n2)/(n2-1)/n2, 2)
             |   / (pow((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1)/(n1-1)/n1, 2)/(n1-1)
             |    + pow((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n2)/(n2-1)/n2, 2)/(n2-1)),
             |   4) AS dof
             |FROM w""".stripMargin)),

    // Jensen–Shannon drift per source — "did src7's vocabulary drift from
    // the corpus?": JSD(source term distribution ‖ corpus term
    // distribution) in nats, the symmetric bounded cousin of
    // agg_mutual_info's KL machinery. Both distributions come from ONE
    // vocabulary-bounded (source, word) count aggregate; the corpus
    // marginal and the per-source totals are rollups of it, broadcast
    // back, and the zero-observed side (q>0, p=0 terms) comes from
    // crossing sources with the vocabulary — all KB-scale grids. The only
    // cross-engine surface is the per-source contribution sum, absorbed
    // by the 6-dp round (the agg_mutual_info precedent).
    "text_jsd_drift" -> Decl(
      (s, d) => {
        val cw = Pipeline.docsWithTokens(s, d)
          .select(col("source"), explode(col("toks")).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
          .localCheckpoint(true)
        val perSrc = cw.groupBy("source").agg(sum(col("c")).as("ns"))
        val vocab = cw.groupBy("w").agg(sum(col("c")).as("cg"))
        val tot = vocab.agg(sum(col("cg")).cast("double").as("n"))
        perSrc.crossJoin(vocab)
          .join(cw, Seq("source", "w"), "left")
          .crossJoin(broadcast(tot))
          .select(col("source"),
                  (coalesce(col("c"), lit(0L)).cast("double") / col("ns")).as("p"),
                  (col("cg") / col("n")).as("q"))
          .withColumn("m", (col("p") + col("q")) / 2)
          .withColumn("contrib",
            when(col("p") > 0, lit(0.5) * col("p") * log(col("p") / col("m")))
              .otherwise(0.0) +
            lit(0.5) * col("q") * log(col("q") / col("m")))
          .groupBy("source").agg(round(sum(col("contrib")), 6).as("jsd_nats"))
          .orderBy("source")
      },
      Some("""WITH cw AS (SELECT source, w.w AS w, count(*) AS c
             |            FROM documents, unnest(string_split(text, ' ')) w(w)
             |            GROUP BY source, w.w),
             |ps AS (SELECT source, sum(c) AS ns FROM cw GROUP BY source),
             |v AS (SELECT w, sum(c) AS cg FROM cw GROUP BY w),
             |t AS (SELECT CAST(sum(cg) AS DOUBLE) AS n FROM v),
             |grid AS (SELECT ps.source,
             |           CAST(coalesce(cw.c, 0) AS DOUBLE) / ps.ns AS p,
             |           v.cg / t.n AS q
             |         FROM ps CROSS JOIN v
             |         LEFT JOIN cw ON cw.source = ps.source AND cw.w = v.w
             |         CROSS JOIN t)
             |SELECT source,
             |  round(sum(CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q)/2))
             |                 ELSE 0 END
             |            + 0.5 * q * ln(q / ((p + q)/2))), 6) AS jsd_nats
             |FROM grid GROUP BY source ORDER BY source""".stripMargin)),

    // Deterministic exact-k uniform sample — "give me exactly 100 docs,
    // uniformly, reproducibly": rank by a cryptographic hash of the key
    // and take the k smallest. TABLESAMPLE/rand() are neither exact-k nor
    // re-runnable; the hash ticket is both, and the plan is a
    // TakeOrderedAndProject (per-partition bounded heap + driver merge of
    // k·partitions candidates), never a global sort — the only scalable
    // shape for top-k at 100 TB.
    "sample_hash_exactk" -> Decl(
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("ticket"))
        .orderBy("ticket")
        .limit(100),
      Some("""SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS ticket
             |FROM documents ORDER BY ticket LIMIT 100""".stripMargin)),

    // Registered-domain blocklist filter — the RefinedWeb/C4 URL-level
    // drop pass: extract the registered domain from each page's host and
    // anti-join a blocklist ON THE DOMAIN KEY (broadcast — blocklists are
    // KB–MB); subdomains (www., cdn.) are covered because the JOIN KEY is
    // the registered domain, not the full host — suffix semantics without
    // a per-entry LIKE scan, which is the non-scalable alternative. URLs
    // are synthesized from events the same way as dedup_url_canonical.
    "filter_domain_blocklist" -> Decl(
      (s, d) => {
        import s.implicits._
        val host = concat(
          when(pmod(col("event_id"), lit(2L)) === 0, "www.").otherwise("cdn."),
          lit("example"), pmod(col("user_id"), lit(5L)).cast("string"),
          lit(".com"))
        val block = Seq("example1.com", "example3.com").toDF("domain")
        Tables.events(s, d)
          .select(col("event_id"), host.as("host"))
          .withColumn("domain", regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
          .join(broadcast(block), Seq("domain"), "left_anti")
          .select(col("event_id"), col("host"))
          .orderBy("event_id")
      },
      Some("""WITH u AS (SELECT event_id,
             |  (CASE WHEN event_id % 2 = 0 THEN 'www.' ELSE 'cdn.' END) ||
             |  'example' || CAST(user_id % 5 AS VARCHAR) || '.com' AS host
             |  FROM events)
             |SELECT event_id, host FROM u
             |WHERE regexp_extract(host, '([^.]+\.[^.]+)$', 1)
             |      NOT IN ('example1.com', 'example3.com')
             |ORDER BY event_id""".stripMargin)))
}
