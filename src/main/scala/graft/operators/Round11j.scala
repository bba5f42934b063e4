package graft.operators

import graft.{Decl, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 wave 66: distributed minimum spanning forest (Borůvka — the
  * one MST algorithm that is data-parallel by construction: every
  * component picks its lightest outgoing edge simultaneously, components
  * contract, and the component count at least halves per round, so a
  * 100 TB edge list finishes in O(log V) rounds of groupBy-min +
  * label-propagation — no priority queue, no sequential edge scan) and
  * MMR-diversified retrieval (maximal marginal relevance — the standard
  * redundancy-penalized re-ranking every RAG/retrieval stack runs after
  * the ANN cut).
  *
  * Determinism: MST edges order by the lexicographic (w, a, b) struct —
  * a total order, so the spanning forest is unique even with duplicate
  * weights (Kruskal under the same order yields the identical edge set;
  * Round11jSpec asserts exact equality). MMR scores fold rounded-6dp
  * cosines through the same 0.7·rel − 0.3·max-sim expression in both
  * engines; ties break by vec_id.
  */
object Round11j {

  val decls: Map[String, Decl] = Map(
    // Minimum spanning FOREST of the minted undirected doc graph (same
    // edge recipe as graph_triangle_count, Round8.scala:110) under
    // deterministic integer weights w = (a·31 + b·17) mod 997. Per
    // Borůvka round: one aggregate finds each component's lexicographic-
    // min (w, a, b) outgoing edge, the chosen pseudo-forest contracts by
    // pointer doubling over COMPONENT ids (a set that at least
    // halves per round — the corpus-sized vertex list never re-enters
    // the loop), and cross-component edges shrink monotonically. No
    // priority queue, no sequential pass — every step is a groupBy or a
    // bounded-iteration join, the 100 TB shape. Exact-unique forest →
    // Kruskal-equality asserted in Round11jSpec; rows-only driver check
    // (a recursive-SQL MST oracle is not reasonably expressible).
    "graph_mst_boruvka" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val docs = Tables(s, d, "documents").select(col("doc_id"))
        val nRows = Tables.rowCount(s, d, "documents")
        val raw = docs.filter(pmod(col("doc_id"), lit(4L)) =!= 0)
          .select(col("doc_id").as("src"),
                  explode(sequence(lit(1), (lit(1L) + pmod(col("doc_id"), lit(2L)))
                    .cast("int"))).as("k"))
          .select(col("src"), pmod(col("src") * 3 + col("k"), lit(nRows)).as("dst"))
        val edges = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
                  greatest(col("src"), col("dst")).as("b"))
          .distinct()
          .withColumn("w", pmod(col("a") * 31 + col("b") * 17, lit(997L)))
          .repartition(n, col("a"))
          .localCheckpoint(true)
        // Contracted-edge-list Borůvka: `cur` carries each surviving edge
        // with its endpoints' CURRENT component labels (a,b,w,ca,cb) and
        // only ever shrinks — intra-component edges are dropped for good
        // at relabel time, so round r's work is O(|crossing edges at r|),
        // not O(|E|) (the earlier edges×vertex-label re-join paid the
        // full edge list every round). The vertex table is never needed:
        // the output is the edge set, and labels live on the edges.
        var cur = edges
          .select(col("a"), col("b"), col("w"),
                  col("a").as("ca"), col("b").as("cb"))
          .localCheckpoint(true)
        var mst: DataFrame = edges.filter(lit(false))
          .select(col("a"), col("b"), col("w"))
        // chosen-edge frames stay persisted until the final mst
        // materialization (mst's lazy union reads them once more there)
        val pinned = scala.collection.mutable.ArrayBuffer[DataFrame]()
        val bcastRows = 2000000L
        var rounds = 0
        var crossing = cur.count()
        while (crossing > 0 && rounds < 15) {
          // lightest outgoing edge per component, lexicographic (w,a,b);
          // carry the partner component so the chosen set doubles as the
          // contraction's parent function t(g) = partner
          val pick = struct(col("w"), col("a"), col("b"))
          val chosen = cur
            .select(col("ca").as("g"), col("cb").as("partner"), pick.as("p"))
            .unionAll(cur.select(col("cb").as("g"), col("ca").as("partner"),
                                 pick.as("p")))
            .groupBy("g")
            .agg(min(struct(col("p"), col("partner"))).as("m"))
            .select(col("g"), col("m.p.w").as("w"), col("m.p.a").as("a"),
                    col("m.p.b").as("b"), col("m.partner").as("t"))
            .persist()
          pinned += chosen
          mst = mst.unionAll(chosen.select(col("a"), col("b"), col("w"))
                                   .distinct())
          // Contract the chosen pseudo-forest (out-degree 1, exactly one
          // mutual-min 2-cycle per tree — the total (w,a,b) edge order
          // guarantees it) to per-component roots. Two paths, picked by
          // the MEASURED crossing count:
          //  * small rounds — exactly the rows a broadcast exchange would
          //    ship to the driver anyway — run a driver union-find
          //    (path-halving; 2-cycle roots at the min endpoint) and
          //    broadcast the root map back: one job, no log-depth chain.
          //  * large rounds (100 TB early rounds) pointer-double
          //    distributed: two lazy squarings per materialized batch
          //    with a carried change flag.
          val roots: DataFrame =
            if (crossing <= bcastRows) {
              val par = new scala.collection.mutable.HashMap[Long, Long]()
              chosen.select(col("g"), col("t")).collect()
                .foreach(r => par(r.getLong(0)) = r.getLong(1))
              def root(x: Long): Long = {
                var a = x
                var b = par(a)
                while (par(b) != a && b != a) { // walk to the 2-cycle
                  val n = par(b); par(a) = n; a = b; b = n // path-halving
                }
                math.min(a, b)
              }
              val rows = par.keys.toArray.map(g => (g, root(g))).toSeq
              import s.implicits._
              broadcast(rows.toDF("g", "r"))
            } else {
              val t0 = chosen.select(col("g"), col("t"))
              var par = t0.as("x")
                .join(t0.as("y"), col("x.t") === col("y.g"), "left")
                .select(col("x.g").as("c"),
                        when(col("y.t") === col("x.g") && col("x.g") < col("x.t"),
                             col("x.g")).otherwise(col("x.t")).as("p"))
                .persist()
              var jumping = true
              var batches = 0
              while (jumping && batches < 10) {
                def square(q: DataFrame): DataFrame = q.as("x")
                  .join(q.as("y"), col("x.p") === col("y.c"), "left")
                  .select(col("x.c").as("c"),
                          coalesce(col("y.p"), col("x.p")).as("p"))
                val q1 = square(par)
                val p2 = q1.as("x")
                  .join(q1.as("y"), col("x.p") === col("y.c"), "left")
                  .select(col("x.c").as("c"),
                          coalesce(col("y.p"), col("x.p")).as("p"),
                          (coalesce(col("y.p"), col("x.p")) =!= col("x.p")).as("ch"))
                  .persist()
                jumping = p2.agg(max(col("ch"))).first().getBoolean(0)
                par = p2.select(col("c"), col("p"))
                batches += 1
              }
              if (jumping) throw new IllegalStateException(
                s"Borůvka pointer doubling did not converge within $batches batches")
              par.select(col("c").as("g"), col("p").as("r"))
            }
          // relabel surviving edges through the root map and drop the
          // now-intra-component ones permanently; ReuseExchange ships the
          // broadcast once for both sides
          val prev = cur
          cur = cur
            .join(roots.select(col("g").as("ca"), col("r").as("ra")), Seq("ca"), "left")
            .join(roots.select(col("g").as("cb"), col("r").as("rb")), Seq("cb"), "left")
            .select(col("a"), col("b"), col("w"),
                    coalesce(col("ra"), col("ca")).as("ca"),
                    coalesce(col("rb"), col("cb")).as("cb"))
            .filter(col("ca") =!= col("cb"))
            .localCheckpoint(true)
          prev.unpersist()
          crossing = cur.count()
          rounds += 1
        }
        if (crossing > 0) throw new IllegalStateException(
          s"Borůvka did not converge within $rounds rounds")
        val out = mst.localCheckpoint(true)
        pinned.foreach(_.unpersist())
        out.orderBy("a", "b")
      },
      None),

    // MMR-diversified top-10 for the vec_id-0 query: the ANN/brute cut
    // keeps the 64 most relevant candidates (one distributed
    // TakeOrderedAndProject — total order (rel desc, vec_id)), pairwise
    // candidate cosines are a 64×64 broadcast self-join, and the greedy
    // λ=0.7 selection folds over that BOUNDED score table on the driver
    // (k·|C| ≤ 640 comparisons — the sequential-by-definition part of
    // MMR, same driver-bounded-recursion precedent as ts_holt_winters).
    // The oracle replays the identical greedy recursion as a DuckDB
    // RECURSIVE CTE carrying the selected list.
    "sim_mmr_diversified" -> Decl(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        val cand = emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"),
                  round(VectorOps.cosine(col("embedding"), col("qe")), 6).as("rel"),
                  col("embedding"))
          .orderBy(col("rel").desc, col("vec_id").asc)
          .limit(64)
          .localCheckpoint(true)
        val sims = cand.as("x")
          .join(broadcast(cand.as("y")), col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
                  round(VectorOps.cosine(col("x.embedding"), col("y.embedding")), 6)
                    .as("sim"))
        val rel = cand.select(col("vec_id"), col("rel")).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val sim = sims.collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        def pairSim(x: Long, y: Long): Double =
          sim.getOrElse((math.min(x, y), math.max(x, y)), 0.0)
        val selected = scala.collection.mutable.ArrayBuffer[Long]()
        while (selected.size < 10) {
          val best = rel.keysIterator
            .filterNot(selected.contains)
            .map { c =>
              val maxSim =
                if (selected.isEmpty) 0.0
                else selected.iterator.map(t => pairSim(c, t)).max
              (0.7 * rel(c) - 0.3 * maxSim, c)
            }
            .minBy { case (score, id) => (-score, id) }
          selected += best._2
        }
        import s.implicits._
        selected.toSeq.zipWithIndex
          .map { case (id, i) => (i + 1L, id, rel(id)) }
          .toDF("rank", "vec_id", "rel")
          .orderBy("rank")
      },
      Some("""WITH RECURSIVE
             |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
             |      FROM embeddings WHERE vec_id = 0),
             |cand AS (
             |  SELECT vec_id, round(list_cosine_similarity(
             |           list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qe), 6) AS rel,
             |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
             |  FROM embeddings CROSS JOIN q WHERE vec_id <> 0
             |  ORDER BY rel DESC, vec_id ASC LIMIT 64),
             |ps AS (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |         round(list_cosine_similarity(a.e, b.e), 6) AS sim
             |  FROM cand a JOIN cand b ON a.vec_id < b.vec_id),
             |sel(step, ids) AS (
             |  SELECT 0, CAST([] AS BIGINT[])
             |  UNION ALL
             |  SELECT step + 1,
             |    list_append(ids, (
             |      SELECT c.vec_id FROM cand c
             |      WHERE NOT list_contains(sel.ids, c.vec_id)
             |      ORDER BY 0.7 * c.rel - 0.3 * coalesce((
             |          SELECT max(p.sim) FROM ps p
             |          WHERE (p.id_a = c.vec_id AND list_contains(sel.ids, p.id_b))
             |             OR (p.id_b = c.vec_id AND list_contains(sel.ids, p.id_a))), 0.0)
             |        DESC, c.vec_id ASC
             |      LIMIT 1))
             |  FROM sel WHERE step < 10)
             |SELECT u.pos AS rank, u.v AS vec_id, c.rel AS rel
             |FROM (SELECT unnest(ids) AS v, generate_subscripts(ids, 1) AS pos
             |      FROM sel WHERE step = 10) u
             |JOIN cand c ON c.vec_id = u.v
             |ORDER BY rank""".stripMargin))
  )
}
