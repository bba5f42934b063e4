package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 wave 67: strongly connected components by distributed
  * forward-backward coloring (the data-parallel SCC algorithm: color
  * every vertex with its minimum ancestor, peel each color's root SCC
  * by a color-restricted backward sweep, repeat on the remainder —
  * every phase is a joins-and-aggregates superstep, no Tarjan stack)
  * and Burrows' Delta (the classical stylometric distance: z-scored
  * top-word relative frequencies per source, mean |Δz| between source
  * pairs — the authorship/provenance signal next to the Monroe
  * log-odds).
  *
  * SCC supersteps are DIAMETER-bounded, and the minted directed graph
  * is built to keep that diameter scale-independent: disjoint 8-vertex
  * blocks (cycles + stragglers + %4-dangling singletons), so coloring
  * fixpoints converge in ≤4 passes and the peel loop in 2 rounds at
  * EVERY scale factor (measured 50 / 500 / 5000 vertices — identical
  * superstep counts). That is the honest 100 TB shape: FB-coloring
  * costs O(SCC-DAG depth × diameter) supersteps and web-scale graphs
  * have small diameters; a single 100 M-vertex cycle is pathological
  * for every distributed SCC algorithm.
  */
object Round11k {

  private val BlockSize = 8L

  /** Directed block-minted edges: within each 8-vertex block,
    * v → base + ((off·3 + k) mod size) for k = 1..(1 + v mod 2),
    * skipping v ≡ 0 (mod 4) (dangling singleton SCCs by construction).
    */
  private def blockEdges(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents").select(col("doc_id"))
    val nRows = Tables.rowCount(s, d, "documents")
    val base = (col("doc_id") / BlockSize).cast("long") * BlockSize
    val size = least(lit(BlockSize), lit(nRows) - base)
    docs.filter(pmod(col("doc_id"), lit(4L)) =!= 0)
      .select(col("doc_id").as("src"),
              explode(sequence(lit(1), (lit(1L) + pmod(col("doc_id"), lit(2L)))
                .cast("int"))).as("k"),
              base.as("base"), size.as("bsz"))
      .select(col("src"),
              (col("base") + pmod((col("src") - col("base")) * 3 + col("k"),
                                  col("bsz"))).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  val decls: Map[String, Decl] = Map(
    // SCC ids (= min member) for every document. The oracle computes the
    // same partition from the full recursive-CTE transitive closure —
    // mutual reachability ground truth — so the hash-match proves the
    // peeling algorithm exact, not approximately-converged.
    "graph_scc_coloring" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        // Superstep latency, not data volume, bounds this operator at test
        // scale (round-10 profile: ~575 stages, 13 s warm from one job per
        // hop). So both fixpoint loops FUSE several hops into each
        // materialization job (same shuffle count, ~Hops× fewer jobs), and
        // convergence is read off the LAST hop of the SAME materialization
        // — min-propagation is monotone, so "the final hop changed
        // nothing" proves the fixpoint with no extra confirm pass. Hops
        // values are latency dials only; correctness is the fixpoint,
        // reached for any value ≥ 1.
        val Hops = 5   // forward-coloring hops per fused pass
        val BHops = 7  // backward-sweep hops per fused pass
        val edges = blockEdges(s, d)
          .repartition(n, col("src"))
          .localCheckpoint(true)
        var remaining = edges.select(col("src").as("v"))
          .unionAll(edges.select(col("dst").as("v")))
          .distinct()
          .localCheckpoint(true)
        var scc: DataFrame = remaining.filter(lit(false))
          .select(col("v"), col("v").as("scc"))
        var rounds = 0
        var left = remaining.count()
        while (left > 0 && rounds < 12) {
          // round 0's semi-joins are no-ops (remaining == all endpoints)
          val er =
            if (rounds == 0) edges
            else edges
              .join(remaining.select(col("v").as("src")), Seq("src"), "left_semi")
              .join(remaining.select(col("v").as("dst")), Seq("dst"), "left_semi")
              .localCheckpoint(true)
          // forward min-ancestor coloring to fixpoint (labels flow along
          // edge direction); the fused pass's last hop carries a `chg`
          // flag, so one tiny agg on the checkpointed step decides
          // convergence
          def colorStep(cd: DataFrame, withChg: Boolean): DataFrame = {
            val nbrMin = cd.join(er, col("v") === col("src"))
              .groupBy(col("dst")).agg(min(col("c")).as("m"))
            val j = cd.join(nbrMin, col("v") === col("dst"), "left")
            if (withChg)
              j.select(col("v"),
                       least(col("c"), coalesce(col("m"), col("c"))).as("c"),
                       (coalesce(col("m"), col("c")) < col("c"))
                         .cast("long").as("chg"))
            else
              j.select(col("v"),
                       least(col("c"), coalesce(col("m"), col("c"))).as("c"))
          }
          var color = remaining.select(col("v"), col("v").as("c"))
          var converged = false
          var pass = 0
          while (!converged && pass < 12) {
            var cur = color
            for (_ <- 1 until Hops) cur = colorStep(cur, withChg = false)
            val step = colorStep(cur, withChg = true).localCheckpoint(true)
            converged = step
              .agg(coalesce(sum(col("chg")), lit(0L))).first().getLong(0) == 0L
            color = step.select(col("v"), col("c"))
            pass += 1
          }
          if (!converged) throw new IllegalStateException(
            s"SCC coloring fixpoint did not converge within $pass passes")
          // peel: backward sweep from each color's root, restricted to
          // the color (sound: every SCC member shares the root's color
          // and every v→root path stays inside the SCC). `color` projects
          // the last fixpoint step, already checkpointed above. Each
          // fused pass stamps rows with the hop that first found them;
          // "nothing new at the final hop" proves the frontier is dead
          // (monotone growth), read in the same tiny agg as the size.
          val colored = color
          val ce = er
            .join(colored.select(col("v").as("src"), col("c").as("cs")), "src")
            .join(colored.select(col("v").as("dst"), col("c").as("cd")), "dst")
            .filter(col("cs") === col("cd"))
            .select(col("src"), col("dst"), col("cs").as("c"))
            .localCheckpoint(true)
          var reached = colored.filter(col("v") === col("c"))
            .select(col("v"), col("c"), lit(0L).as("h"))
          var grew = true
          var bp = 0
          var reachedCnt = 0L
          while (grew && bp < 12) {
            var cur = reached
            for (hh <- 1 to BHops) {
              val add = ce
                .join(cur.select(col("v").as("dst"), col("c")),
                      Seq("dst", "c"), "left_semi")
                .select(col("src").as("v"), col("c"), lit(hh.toLong).as("h"))
              cur = cur.unionAll(add)
                .groupBy("v", "c").agg(min(col("h")).as("h"))
            }
            val nxt = cur.localCheckpoint(true)
            val st = nxt
              .agg(count(lit(1)),
                   coalesce(sum((col("h") === BHops).cast("long")), lit(0L)))
              .first()
            reachedCnt = st.getLong(0)
            grew = st.getLong(1) > 0L
            // reset the stamps so next pass's hop numbers start fresh
            reached = nxt.select(col("v"), col("c"), lit(0L).as("h"))
            bp += 1
          }
          if (grew) throw new IllegalStateException(
            s"SCC backward sweep did not converge within $bp passes")
          scc = scc.unionAll(reached.select(col("v"), col("c").as("scc")))
          remaining = remaining
            .join(reached.select(col("v")), Seq("v"), "left_anti")
            .localCheckpoint(true)
          left -= reachedCnt
          rounds += 1
          if (sys.env.contains("GRAFT_SCC_DEBUG")) System.err.println(s"[scc] round=$rounds coloringPasses=$pass backwardPasses=$bp reached=$reachedCnt left=$left")
        }
        if (left > 0) throw new IllegalStateException(
          s"SCC peeling did not converge within $rounds rounds")
        // isolated docs (no edges) are their own SCC
        val out = Tables(s, d, "documents")
          .join(scc.select(col("v").as("doc_id"), col("scc")), Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("scc"), col("doc_id")).as("scc"))
          .localCheckpoint(true)
        out.orderBy("doc_id")
      },
      Some("""WITH RECURSIVE
             |nn AS (SELECT count(*) AS ni FROM documents),
             |e AS (SELECT DISTINCT src, dst FROM (
             |  SELECT doc_id AS src,
             |         (doc_id // 8) * 8 +
             |         ((doc_id - (doc_id // 8) * 8) * 3 + t.k) %
             |           least(8, nn.ni - (doc_id // 8) * 8) AS dst
             |  FROM documents CROSS JOIN nn, (VALUES (1), (2)) t(k)
             |  WHERE doc_id % 4 <> 0 AND t.k <= 1 + doc_id % 2) x
             |  WHERE src <> dst),
             |reach AS (
             |  SELECT src, dst FROM e
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src)
             |SELECT d.doc_id,
             |       least(d.doc_id,
             |             coalesce(min(CASE WHEN r2.src IS NOT NULL
             |                               THEN r.dst END), d.doc_id)) AS scc
             |FROM documents d
             |LEFT JOIN reach r ON r.src = d.doc_id
             |LEFT JOIN reach r2 ON r2.src = r.dst AND r2.dst = d.doc_id
             |GROUP BY d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Burrows' Delta over the 20 sources: relative frequencies of the
    // corpus top-30 words, z-scored across sources (sample σ), mean
    // |Δz| per source pair. Every aggregate is vocabulary- or
    // source-bounded: top-30 broadcast, 20×30 grid, 190 output pairs —
    // the corpus-sized work is ONE token-count shuffle.
    "text_burrows_delta" -> Decl(
      (s, d) => {
        val toks = Pipeline.docsWithTokens(s, d)
          .select(col("source"), explode(col("toks")).as("word"))
        val cnt = toks.groupBy("source", "word").agg(count(lit(1)).as("c"))
        val tot = toks.groupBy("source").agg(count(lit(1)).as("tot"))
        val top = toks.groupBy("word").agg(count(lit(1)).as("g"))
          .orderBy(col("g").desc, col("word").asc).limit(30)
          .select("word")
        val grid = tot.crossJoin(broadcast(top))
          .join(cnt, Seq("source", "word"), "left")
          .select(col("source"), col("word"),
                  (coalesce(col("c"), lit(0L)).cast("double") /
                   col("tot").cast("double")).as("f"))
        val stats = grid.groupBy("word")
          .agg(avg(col("f")).as("mu"), stddev_samp(col("f")).as("sd"))
        val z = grid.join(broadcast(stats), "word")
          .filter(col("sd") > 0)
          .select(col("source"), col("word"),
                  ((col("f") - col("mu")) / col("sd")).as("z"))
        z.as("a")
          .join(z.as("b"),
                col("a.word") === col("b.word") &&
                col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .agg(round(avg(abs(col("a.z") - col("b.z"))), 6).as("delta"))
          .orderBy("src_a", "src_b")
      },
      Some("""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS word
             |             FROM documents),
             |cnt AS (SELECT source, word, count(*) AS c FROM tok GROUP BY 1, 2),
             |tot AS (SELECT source, count(*) AS tot FROM tok GROUP BY 1),
             |top AS (SELECT word FROM (
             |  SELECT word, count(*) AS g FROM tok GROUP BY 1
             |  ORDER BY g DESC, word LIMIT 30)),
             |grid AS (SELECT t.source, p.word,
             |                CAST(coalesce(c.c, 0) AS DOUBLE) / t.tot AS f
             |         FROM tot t CROSS JOIN top p
             |         LEFT JOIN cnt c ON c.source = t.source AND c.word = p.word),
             |st AS (SELECT word, avg(f) AS mu, stddev_samp(f) AS sd
             |       FROM grid GROUP BY 1),
             |z AS (SELECT g.source, g.word, (g.f - st.mu) / st.sd AS z
             |      FROM grid g JOIN st ON g.word = st.word WHERE st.sd > 0)
             |SELECT a.source AS src_a, b.source AS src_b,
             |       round(avg(abs(a.z - b.z)), 6) AS delta
             |FROM z a JOIN z b ON a.word = b.word AND a.source < b.source
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
