package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 seventh wave: per-node graph topology, weekly growth, robust
  * outlier fences, and template-shape detection. All-integer statistics
  * with terminal rounded ratios; bounded spines for every window; every
  * ORDER BY ends in a unique key.
  */
object Round10g {

  val decls: Map[String, Decl] = Map(
    // Per-node clustering coefficient on the minted doc graph (same edge
    // recipe as graph_triangle_count, reference Round8.scala:110): count
    // each oriented triangle once, credit its three corners via an
    // explode, and divide by the wedge capacity deg·(deg−1)/2 — exact
    // integers into one terminal ratio. The low→high orientation bounds
    // the wedge fan-out exactly as in the triangle census.
    "graph_clustering_coeff" -> Decl(
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
        val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        val tri = e.as("e1")
          .join(e.as("e2").hint("shuffle_hash"), col("e1.b") === col("e2.a"))
          .join(e.as("e3").hint("shuffle_hash"),
                col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
        val triPerNode = tri
          .select(explode(array(col("x"), col("y"), col("z"))).as("v"))
          .groupBy("v").agg(count(lit(1)).as("t"))
        deg.join(triPerNode, Seq("v"), "left")
          .filter(col("deg") >= 2)
          .select(col("v"), col("deg"), coalesce(col("t"), lit(0L)).as("t"),
                  round(coalesce(col("t"), lit(0L)).cast("double") * 2
                        / (col("deg") * (col("deg") - 1)).cast("double"), 6)
                    .as("cc"))
          .orderBy("v")
      },
      Some("""WITH nn AS (SELECT count(*) AS ni FROM documents),
             |raw AS (SELECT doc_id AS src, (doc_id * 3 + t.k) % nn.ni AS dst
             |        FROM documents CROSS JOIN nn, (VALUES (1), (2)) t(k)
             |        WHERE doc_id % 4 <> 0 AND t.k <= 1 + doc_id % 2),
             |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |      FROM raw WHERE src <> dst),
             |deg AS (SELECT v, count(*) AS deg FROM (
             |          SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
             |        GROUP BY v),
             |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |        FROM e e1 JOIN e e2 ON e1.b = e2.a
             |             JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |tpn AS (SELECT v, count(*) AS t FROM (
             |          SELECT x AS v FROM tri UNION ALL
             |          SELECT y AS v FROM tri UNION ALL
             |          SELECT z AS v FROM tri)
             |        GROUP BY v)
             |SELECT deg.v, CAST(deg AS BIGINT) AS deg,
             |       CAST(coalesce(t, 0) AS BIGINT) AS t,
             |       round(CAST(coalesce(t, 0) AS DOUBLE) * 2
             |             / CAST(deg * (deg - 1) AS DOUBLE), 6) AS cc
             |FROM deg LEFT JOIN tpn USING (v)
             |WHERE deg >= 2 ORDER BY deg.v""".stripMargin)),

    // Week-over-week growth per event type: weekly counts (one shuffle,
    // bounded spine) + one lag on the per-type week spine, growth as a
    // terminal ppm ratio of exact counts.
    "ts_week_over_week" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("wk")
        Tables.events(s, d)
          .groupBy(col("event_type"),
                   expr("unix_micros(ts) div 604800000000L").as("wk"))
          .agg(count(lit(1)).as("c"))
          .withColumn("prev_c", lag(col("c"), 1).over(w))
          .filter(col("prev_c").isNotNull)
          .select(col("event_type"), col("wk"), col("c"), col("prev_c"),
                  round((col("c") - col("prev_c")).cast("double")
                        / col("prev_c") * 1e6, 6).as("wow_ppm"))
          .orderBy("event_type", "wk")
      },
      Some("""WITH wkly AS (
             |  SELECT event_type,
             |         CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk,
             |         count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |lagd AS (SELECT event_type, wk, c,
             |           lag(c) OVER (PARTITION BY event_type ORDER BY wk) AS prev_c
             |         FROM wkly)
             |SELECT event_type, wk, CAST(c AS BIGINT) AS c,
             |       CAST(prev_c AS BIGINT) AS prev_c,
             |       round(CAST(c - prev_c AS DOUBLE) / prev_c * 1e6, 6) AS wow_ppm
             |FROM lagd WHERE prev_c IS NOT NULL
             |ORDER BY event_type, wk""".stripMargin)),

    // Tukey IQR outlier fences per return flag, fully exact: discrete
    // quartiles from the integer cumulative grid (agg_percentile_disc
    // machinery), fences in doubled cents (2q1 − 3·iqr) so the 1.5×
    // multiplier never leaves the integers, and outliers counted from the
    // SAME grid — the raw table is scanned exactly once.
    "quality_outlier_iqr" -> Decl(
      (s, d) => {
        val grid = Tables(s, d, "lineitem")
          .select(col("l_returnflag"),
                  round(col("l_extendedprice") * 100).cast("bigint").as("c"))
          .groupBy("l_returnflag", "c").agg(count(lit(1)).as("w"))
        val cw = Window.partitionBy("l_returnflag").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = grid.groupBy("l_returnflag").agg(sum(col("w")).as("n"))
        val q = grid
          .select(col("l_returnflag"), col("c"), col("w"),
                  sum(col("w")).over(cw).as("cum"))
          .join(broadcast(tot), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(min(when(col("cum") * 4 >= col("n"), col("c"))).as("q1"),
               min(when(col("cum") * 4 >= col("n") * 3, col("c"))).as("q3"))
        grid.join(broadcast(q), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(max(col("q1")).as("q1_cents"), max(col("q3")).as("q3_cents"),
               sum(when(col("c") * 2 < col("q1") * 2 - (col("q3") - col("q1")) * 3,
                        col("w")).otherwise(0L)).as("n_out_low"),
               sum(when(col("c") * 2 > col("q3") * 2 + (col("q3") - col("q1")) * 3,
                        col("w")).otherwise(0L)).as("n_out_high"))
          .orderBy("l_returnflag")
      },
      Some("""WITH grid AS (SELECT l_returnflag,
             |                CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
             |                count(*) AS w
             |              FROM lineitem GROUP BY 1, 2),
             |cum AS (SELECT l_returnflag, c, w,
             |          sum(w) OVER (PARTITION BY l_returnflag ORDER BY c
             |                       ROWS UNBOUNDED PRECEDING) AS cum,
             |          sum(w) OVER (PARTITION BY l_returnflag) AS n
             |        FROM grid),
             |q AS (SELECT l_returnflag,
             |        min(CASE WHEN cum * 4 >= n THEN c END) AS q1,
             |        min(CASE WHEN cum * 4 >= n * 3 THEN c END) AS q3
             |      FROM cum GROUP BY l_returnflag)
             |SELECT grid.l_returnflag,
             |       CAST(max(q1) AS BIGINT) AS q1_cents,
             |       CAST(max(q3) AS BIGINT) AS q3_cents,
             |       CAST(sum(CASE WHEN c * 2 < q1 * 2 - (q3 - q1) * 3
             |                     THEN w ELSE 0 END) AS BIGINT) AS n_out_low,
             |       CAST(sum(CASE WHEN c * 2 > q3 * 2 + (q3 - q1) * 3
             |                     THEN w ELSE 0 END) AS BIGINT) AS n_out_high
             |FROM grid JOIN q USING (l_returnflag)
             |GROUP BY grid.l_returnflag ORDER BY grid.l_returnflag""".stripMargin)),

    // Template-shape detection: documents sharing the exact word-length
    // silhouette of their first 12 words are near-certain boilerplate
    // instances. The shape string is bounded (≤12 short tokens), the
    // group-by runs on it directly, and only multi-doc groups surface.
    "text_template_shape" -> Decl(
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("doc_id"),
                  array_join(expr(
                    "transform(slice(split(text, ' '), 1, 12), x -> length(x))"),
                    "-").as("shape"))
          .groupBy("shape")
          .agg(count(lit(1)).as("n_docs"),
               min(col("doc_id")).as("first_doc"),
               max(col("doc_id")).as("last_doc"))
          .filter(col("n_docs") >= 2)
          .orderBy("shape")
      },
      Some("""WITH s AS (SELECT doc_id,
             |             array_to_string(list_transform(
             |               string_split(text, ' ')[1:12], x -> len(x)), '-')
             |               AS shape
             |           FROM documents)
             |SELECT shape, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(min(doc_id) AS BIGINT) AS first_doc,
             |       CAST(max(doc_id) AS BIGINT) AS last_doc
             |FROM s GROUP BY shape HAVING count(*) >= 2
             |ORDER BY shape""".stripMargin))
  )
}
