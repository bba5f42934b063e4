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

  /** Hash-min label propagation to fixpoint over an undirected link set
    * (c, l) × (src, dst): the contraction step of Borůvka. Labels only
    * decrease, so a DECIMAL sum probe detects convergence in one cheap
    * aggregate per pass (the dedup_connected_components discipline —
    * PipelineExt.scala). Chosen-edge graphs are Borůvka pseudo-forests
    * (≤1 out-link per component), so the diameter — and the pass count —
    * is the longest chosen-edge chain, log-bounded in practice; the cap
    * fails loudly rather than returning a half-contracted forest.
    */
  private def minLabelFixpoint(init: DataFrame, links: DataFrame,
                               cap: Int): DataFrame = {
    var labels = init.persist()
    var prev: Option[DataFrame] = None
    var prevSum = java.math.BigDecimal.valueOf(-1L)
    var changed = true
    var iter = 0
    while (changed && iter < cap) {
      val nbrMin = labels.join(links, col("c") === col("src"))
        .groupBy(col("dst")).agg(min(col("l")).as("nbr_min"))
        .select(col("dst").as("nbr_id"), col("nbr_min"))
      val step = labels.join(nbrMin, col("c") === col("nbr_id"), "left")
        .select(col("c"),
                least(col("l"), coalesce(col("nbr_min"), col("l"))).as("l"))
      val next =
        if (iter % 5 == 4) step.localCheckpoint(true) else step.persist()
      val sumNow = next
        .agg(coalesce(sum(col("l").cast("decimal(38,0)")),
                      lit(java.math.BigDecimal.ZERO)))
        .first().getDecimal(0)
      changed = prevSum.compareTo(sumNow) != 0
      prevSum = sumNow
      prev.foreach(_.unpersist())
      prev = Some(next)
      labels = next
      iter += 1
    }
    if (changed) throw new IllegalStateException(
      s"label propagation did not converge within $cap passes")
    val out = labels.localCheckpoint(true)
    prev.foreach(_.unpersist())
    out
  }

  val decls: Map[String, Decl] = Map(
    // Minimum spanning FOREST of the minted undirected doc graph (same
    // edge recipe as graph_triangle_count, Round8.scala:110) under
    // deterministic integer weights w = (a·31 + b·17) mod 997. Per
    // Borůvka round: one aggregate finds each component's lexicographic-
    // min (w, a, b) outgoing edge, the chosen pseudo-forest contracts by
    // hash-min label propagation over COMPONENT ids (a set that at least
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
        // components over the vertices that HAVE edges (isolated docs can
        // never contribute an MST edge — they stay out of the loop)
        var comp = edges.select(col("a").as("v"))
          .unionAll(edges.select(col("b").as("v")))
          .distinct()
          .select(col("v"), col("v").as("c"))
          .persist()
        var mst: DataFrame = edges.filter(lit(false))
          .select(col("a"), col("b"), col("w"))
        var rounds = 0
        var crossing = 1L
        while (crossing > 0 && rounds < 15) {
          val ce = edges
            .join(comp.select(col("v").as("a"), col("c").as("ca")), "a")
            .join(comp.select(col("v").as("b"), col("c").as("cb")), "b")
            .filter(col("ca") =!= col("cb"))
            .persist()
          crossing = ce.count()
          if (crossing > 0) {
            // lightest outgoing edge per component, lexicographic (w,a,b)
            val pick = struct(col("w"), col("a"), col("b"))
            val chosen = ce.select(col("ca").as("g"), pick.as("p"))
              .unionAll(ce.select(col("cb").as("g"), pick.as("p")))
              .groupBy("g").agg(min(col("p")).as("p"))
              .select(col("p.w").as("w"), col("p.a").as("a"), col("p.b").as("b"))
              .distinct()
              .localCheckpoint(true)
            mst = mst.unionAll(chosen.select(col("a"), col("b"), col("w")))
            // contract: min-label over the chosen component links
            val links = ce
              .join(chosen, Seq("a", "b"), "left_semi")
              .select(col("ca").as("src"), col("cb").as("dst"))
              .unionAll(ce.join(chosen, Seq("a", "b"), "left_semi")
                          .select(col("cb").as("src"), col("ca").as("dst")))
              .distinct()
            val compIds = comp.select(col("c")).distinct()
              .select(col("c"), col("c").as("l"))
            val lab = minLabelFixpoint(compIds, links, 30)
            val next = comp
              .join(lab.select(col("c"), col("l")), "c")
              .select(col("v"), col("l").as("c"))
              .localCheckpoint(true)
            comp.unpersist()
            comp = next
          }
          ce.unpersist()
          rounds += 1
        }
        if (crossing > 0) throw new IllegalStateException(
          s"Borůvka did not converge within $rounds rounds")
        mst.localCheckpoint(true).orderBy("a", "b")
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
