package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 fifteenth wave: sampled harmonic centrality (multi-source BFS
  * with exact-rational accumulation) and rolling skewness from exact
  * integer moment sums.
  */
object Round10o {

  val decls: Map[String, Decl] = Map(
    // Harmonic centrality from the %97 seed set (the bfs_layers sources),
    // depth ≤ 4, on the minted doc graph: per node Σ 1/d(s, v) over the
    // sampled sources. EXACT-RATIONAL TRICK: with d ∈ {1,2,3,4} the
    // contribution 12/d is an INTEGER — the whole accumulation stays
    // BIGINT twelfths until one terminal division. Multi-source BFS keyed
    // (src, v): per hop one adjacency join + one anti join against the
    // seen set; the oracle is DuckDB's native recursive CTE.
    "graph_harmonic_sampled" -> Decl(
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
        var seen = docs.filter(pmod(col("doc_id"), lit(97L)) === 0)
          .select(col("doc_id").as("s"), col("doc_id").as("v"), lit(0L).as("dist"))
        var frontier = seen
        (1 to 4).foreach { i =>
          val next = adj.join(frontier, adj("u") === frontier("v"))
            .select(col("s"), col("w").as("v")).distinct()
            .join(seen.select(col("s").as("s2"), col("v").as("v2")),
                  col("s") === col("s2") && col("v") === col("v2"), "left_anti")
            .select(col("s"), col("v"), lit(i.toLong).as("dist"))
            .localCheckpoint(true)
          seen = seen.unionAll(next).localCheckpoint(true)
          frontier = next
        }
        val out = seen.filter(col("dist") >= 1L)
          .groupBy("v")
          .agg(count(lit(1)).as("n_sources"),
               sum(expr("12L div dist")).as("harmonic12"))
          .select(col("v").as("doc_id"), col("n_sources"), col("harmonic12"),
                  round(col("harmonic12").cast("double") / 12.0d, 6).as("harmonic"))
          .orderBy("doc_id")
        adj.unpersist()
        out
      },
      Some("""WITH RECURSIVE nn AS (SELECT count(*) AS ni FROM documents),
             |raw AS (SELECT doc_id AS src, (doc_id * 3 + t.k) % nn.ni AS dst
             |        FROM documents CROSS JOIN nn, (VALUES (1), (2)) t(k)
             |        WHERE doc_id % 4 <> 0 AND t.k <= 1 + doc_id % 2),
             |canon AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |          FROM raw WHERE src <> dst),
             |adj AS (SELECT a AS u, b AS w FROM canon
             |        UNION ALL SELECT b AS u, a AS w FROM canon),
             |bfs(s, v, dist) AS (
             |  SELECT doc_id, doc_id, 0 FROM documents WHERE doc_id % 97 = 0
             |  UNION
             |  SELECT b.s, adj.w, b.dist + 1
             |  FROM bfs b JOIN adj ON adj.u = b.v
             |  WHERE b.dist < 4),
             |md AS (SELECT s, v, min(dist) AS dist FROM bfs GROUP BY s, v)
             |SELECT v AS doc_id, CAST(count(*) AS BIGINT) AS n_sources,
             |       CAST(sum(12 // dist) AS BIGINT) AS harmonic12,
             |       round(CAST(sum(12 // dist) AS DOUBLE) / 12.0, 6) AS harmonic
             |FROM md WHERE dist >= 1
             |GROUP BY v ORDER BY doc_id""".stripMargin)),

    // Rolling 20-event skewness of a user's value stream: Σx, Σx², Σx³
    // as exact BIGINT window sums (cents ≤ 10⁵ ⇒ Σx³ ≤ 2·10¹⁶ — no
    // overflow), the standardized third moment assembled in ONE terminal
    // double expression with identical operation order in both engines.
    "window_rolling_skew" -> Decl(
      (s, d) => {
        val f = Window.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(-19, 0)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  expr("unix_micros(ts)").as("us"),
                  round(col("value") * 100).cast("bigint").as("x"))
          .select(col("user_id"), col("event_id"),
                  count(lit(1)).over(f).as("n"),
                  sum(col("x")).over(f).as("s1"),
                  sum(col("x") * col("x")).over(f).as("s2"),
                  sum(col("x") * col("x") * col("x")).over(f).as("s3"))
          .filter(col("n") === 20)
          .select(col("user_id"), col("event_id"),
                  round(
                    ((col("s3").cast("double") / col("n")
                       - lit(3.0d) * (col("s1").cast("double") / col("n"))
                         * (col("s2").cast("double") / col("n"))
                       + lit(2.0d) * pow(col("s1").cast("double") / col("n"), 3))
                     / nullif(pow(col("s2").cast("double") / col("n")
                         - pow(col("s1").cast("double") / col("n"), 2), lit(1.5d)),
                         lit(0.0d))), 6).as("skew20"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |             CAST(epoch_us(ts) AS BIGINT) AS us,
             |             CAST(round(value * 100) AS BIGINT) AS x
             |           FROM events),
             |s AS (SELECT user_id, event_id,
             |        count(*) OVER w AS n,
             |        sum(x) OVER w AS s1,
             |        sum(x * x) OVER w AS s2,
             |        sum(x * x * x) OVER w AS s3
             |      FROM e
             |      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
             |                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id,
             |       round(
             |         (CAST(s3 AS DOUBLE) / n
             |            - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
             |            + 2.0 * pow(CAST(s1 AS DOUBLE) / n, 3))
             |         / nullif(pow(CAST(s2 AS DOUBLE) / n
             |             - pow(CAST(s1 AS DOUBLE) / n, 2), 1.5), 0.0), 6) AS skew20
             |FROM s WHERE n = 20 ORDER BY user_id, event_id""".stripMargin))
  )
}
