package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-10 wave 55: sampled betweenness centrality — Brandes'
  * dependency accumulation from the %97 source sample over the shared
  * minted doc graph, truncated at depth 4 (the bfs_layers/harmonic
  * horizon). The last flagship centrality the graph family lacked: which
  * nodes sit ON the shortest paths, not merely near things.
  *
  * Scale shape: the forward pass is the harmonic key's multi-source BFS
  * keyed (src, v) — per hop one adjacency join + one anti-join, σ path
  * counts aggregated as exact BIGINTs with map-side combine; the
  * backward pass walks the ≤4 retained levels, each step one
  * level-to-level join. Nothing all-pairs; per-hop work is O(frontier
  * edges · sample size).
  *
  * Float determinism: path-count ratios are the one unavoidable float —
  * every δ fold and the final per-node accumulation run over
  * array_sort'ed collect_lists (the sorted-fold discipline), so the
  * association order is a pure function of the data. Oracle-N (sampled
  * + truncated, the harmonic/fixpoint class); Round10yySpec re-derives
  * the exact ladder with a driver-side Brandes.
  */
object Round10yy {

  val decls: Map[String, Decl] = Map(
    "graph_betweenness_sampled" -> Decl(
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
        val adj = canon.select(col("a").as("u"), col("b").as("w"))
          .unionAll(canon.select(col("b").as("u"), col("a").as("w")))
          .repartition(n, col("u"))
          .localCheckpoint(true)

        // forward: levels(i) = (s, v, sigma) for dist(s, v) = i
        val level0 = docs.filter(pmod(col("doc_id"), lit(97L)) === 0)
          .select(col("doc_id").as("s"), col("doc_id").as("v"),
                  lit(1L).as("sigma"))
          .localCheckpoint(true)
        val levels = scala.collection.mutable.ArrayBuffer(level0)
        var seen = level0.select(col("s"), col("v"))
        (1 to 4).foreach { _ =>
          val fr = levels.last
          val next = adj.join(fr, adj("u") === fr("v"))
            .groupBy(col("s"), col("w").as("v2"))
            .agg(sum(col("sigma")).as("sigma"))
            .join(seen.select(col("s").as("s2"), col("v").as("vs")),
                  col("s") === col("s2") && col("v2") === col("vs"), "left_anti")
            .select(col("s"), col("v2").as("v"), col("sigma"))
            .localCheckpoint(true)
          levels += next
          seen = seen.unionAll(next.select(col("s"), col("v")))
            .localCheckpoint(true)
        }

        // backward: delta(depth 4) = 0; walk levels down, one join each
        var withDelta: DataFrame =
          levels(4).withColumn("delta", lit(0.0d)) // deepest layer
        val deltas = scala.collection.mutable.ArrayBuffer(withDelta)
        (3 to 1 by -1).foreach { i =>
          val upper = deltas.last
            .select(col("s").as("su"), col("v").as("wv"),
                    col("sigma").as("sig_w"), col("delta").as("d_w"))
          val contribs = adj.join(upper, adj("w") === upper("wv"))
            .select(col("su").as("s"), col("u").as("v"), col("wv"),
                    col("sig_w"), col("d_w"))
          val lvl = levels(i)
          val dd = lvl.join(contribs, Seq("s", "v"), "left")
            .select(col("s"), col("v"), col("sigma"),
                    when(col("wv").isNull, lit(null))
                      .otherwise(struct(col("wv"),
                        (col("sigma").cast("double") / col("sig_w")) *
                          (lit(1.0d) + col("d_w"))))
                      .as("cell"))
            .groupBy("s", "v", "sigma")
            .agg(expr("aggregate(array_sort(collect_list(cell)), " +
                      "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.col2)")
                   .as("delta"))
            .localCheckpoint(true)
          deltas += dd
        }

        // betweenness(v) = Σ over sources of δ(s, v), v ≠ s — sorted fold
        val allDeltas = deltas.toSeq.map(_.select(col("s"), col("v"), col("delta")))
          .reduce(_ unionAll _)
          .filter(col("s") =!= col("v") && col("delta") > 0.0d)
        val out = allDeltas
          .groupBy("v")
          .agg(count(lit(1)).as("n_sources"),
               expr("round(aggregate(array_sort(collect_list(struct(s, delta))), " +
                    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.delta), 6)")
                 .as("betweenness"))
          .select(col("v").as("doc_id"), col("n_sources"), col("betweenness"))
          .orderBy("doc_id")
        adj.unpersist() // levels/deltas are eagerly checkpointed above
        out
      },
      None)
  )
}
