package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 76: partition modularity of the minted doc graph
  * (Newman's Q for the grouping documents already carry — their
  * `source` — answering "how assortative is the link structure by
  * source?" with NO iteration: unlike community DETECTION, community
  * SCORING is a single closed-form pass, so it gets a full DuckDB
  * oracle where label-propagation could not) and systematic interval
  * sampling (the survey-sampling design: every 101st row of a total
  * order, selected by a GLOBAL row index computed with the two-pass
  * distributed PrefixSum — never a single-task `row_number()` window).
  *
  * Determinism: modularity terms are exact integers (intra-edge and
  * endpoint-degree counts) over the canonical minted edge set; the
  * only float is the terminal 6-dp contribution. The systematic sample
  * is fully determined by the (l_orderkey, l_linenumber) total order.
  *
  * Scale shape: modularity = one edge-mint + two hash joins against
  * the label table + one groupBy — all linear in |E|. The sample's
  * global index costs one range exchange + one local scan + a
  * #partitions-row offset broadcast (PrefixSum.scala); the filter
  * keeps ~1/101 of rows with zero skew.
  */
object Round11t {

  val decls: Map[String, Decl] = Map(
    // Newman modularity Q = Σ_c [ e_c/m − (deg_c/2m)² ] of the
    // `source` partition over the minted undirected doc graph (same
    // edge recipe as graph_triangle_count / graph_mst_boruvka).
    "graph_modularity_partition" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val docs = Tables(s, d, "documents")
        val nRows = Tables.rowCount(s, d, "documents")
        val raw = docs.select(col("doc_id"))
          .filter(pmod(col("doc_id"), lit(4L)) =!= 0)
          .select(col("doc_id").as("src"),
                  explode(sequence(lit(1), (lit(1L) + pmod(col("doc_id"), lit(2L)))
                    .cast("int"))).as("k"))
          .select(col("src"), pmod(col("src") * 3 + col("k"), lit(nRows)).as("dst"))
        val e = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
                  greatest(col("src"), col("dst")).as("b"))
          .distinct()
          .repartition(n, col("a"))
        val lab = docs.select(col("doc_id"), col("source"))
        val labeled = e
          .join(lab.select(col("doc_id").as("a"), col("source").as("sa")), "a")
          .join(lab.select(col("doc_id").as("b"), col("source").as("sb")), "b")
          .localCheckpoint(true)
        val m = labeled.agg(count(lit(1)).as("m"))
        val deg = labeled.select(col("sa").as("source"))
          .unionAll(labeled.select(col("sb").as("source")))
          .groupBy("source").agg(count(lit(1)).as("deg"))
        val intra = labeled.filter(col("sa") === col("sb"))
          .groupBy(col("sa").as("source")).agg(count(lit(1)).as("intra"))
        deg.join(intra, Seq("source"), "left")
          .crossJoin(broadcast(m))
          .select(col("source"),
                  coalesce(col("intra"), lit(0L)).as("intra_edges"),
                  col("deg").as("degree_sum"),
                  round(coalesce(col("intra"), lit(0L)).cast("double") / col("m") -
                          (col("deg").cast("double") / (col("m") * 2)) *
                          (col("deg").cast("double") / (col("m") * 2)), 6)
                    .as("q_contrib"))
          .orderBy("source")
      },
      Some("""WITH nn AS (SELECT count(*) AS ni FROM documents),
             |raw AS (SELECT doc_id AS src, (doc_id * 3 + t.k) % nn.ni AS dst
             |        FROM documents CROSS JOIN nn, (VALUES (1), (2)) t(k)
             |        WHERE doc_id % 4 <> 0 AND t.k <= 1 + doc_id % 2),
             |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |      FROM raw WHERE src <> dst),
             |lab AS (SELECT doc_id, source FROM documents),
             |labeled AS (
             |  SELECT la.source AS sa, lb.source AS sb
             |  FROM e JOIN lab la ON la.doc_id = e.a
             |         JOIN lab lb ON lb.doc_id = e.b),
             |m AS (SELECT count(*) AS m FROM labeled),
             |deg AS (SELECT source, count(*) AS deg FROM (
             |          SELECT sa AS source FROM labeled
             |          UNION ALL SELECT sb FROM labeled)
             |        GROUP BY source),
             |intra AS (SELECT sa AS source, count(*) AS intra
             |          FROM labeled WHERE sa = sb GROUP BY sa)
             |SELECT deg.source,
             |       CAST(coalesce(intra, 0) AS BIGINT) AS intra_edges,
             |       CAST(deg AS BIGINT) AS degree_sum,
             |       round(CAST(coalesce(intra, 0) AS DOUBLE) / m.m -
             |             (CAST(deg AS DOUBLE) / (m.m * 2)) *
             |             (CAST(deg AS DOUBLE) / (m.m * 2)), 6) AS q_contrib
             |FROM deg LEFT JOIN intra USING (source) CROSS JOIN m
             |ORDER BY deg.source""".stripMargin)),

    // Every 101st lineitem (offset 7) of the (l_orderkey, l_linenumber)
    // total order — the classical systematic sample. The global index
    // is the distributed two-pass prefix sum, NOT an unpartitioned
    // row_number() window.
    "sample_systematic_interval" -> Decl(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
                  round(col("l_extendedprice") * 100).cast("bigint").as("cents"))
        PrefixSum.cumsumLong(li, Seq(col("l_orderkey"), col("l_linenumber")),
                             lit(1L), "idx")
          .filter(pmod(col("idx"), lit(101L)) === 7)
          .select(col("idx"), col("l_orderkey"), col("l_linenumber"), col("cents"))
          .orderBy("idx")
      },
      Some("""WITH r AS (
             |  SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
             |         CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             |         row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS idx
             |  FROM lineitem)
             |SELECT idx, l_orderkey, l_linenumber, cents
             |FROM r WHERE idx % 101 = 7
             |ORDER BY idx""".stripMargin))
  )
}
