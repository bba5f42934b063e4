package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 eleventh wave: RFM segmentation, nearest-neighbor retrieval,
  * collocation statistics, and leave-one-out target encoding. Exact
  * integer statistics; terminal rounded floats; deterministic tie-breaks
  * everywhere an argmin/ordering appears.
  */
object Round10k {

  val decls: Map[String, Decl] = Map(
    // RFM segmentation: recency/frequency/monetary per customer, each
    // dimension scored 1–3 by exact tercile thresholds (the discrete
    // integer-grid percentile machinery, broadcast back), segment =
    // 100·r + 10·f + m, segment census out. Two shuffles on natural keys
    // and a bounded threshold broadcast — no per-row sort anywhere.
    "agg_rfm_segmentation" -> Decl(
      (s, d) => {
        val maxDate = to_date(lit("1998-12-31"))
        val rfm = Tables(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(datediff(maxDate, max(col("o_orderdate")).cast("date"))
                 .cast("bigint").as("rec"),
               count(lit(1)).as("freq"),
               sum(round(col("o_totalprice") * 100).cast("bigint")).as("mon"))
          .localCheckpoint(true)
        // The recency/frequency grids are domain-bounded, but the monetary
        // grid grows ~|customers| — so ALL three tercile scans use the
        // distributed two-pass prefix sum (no unpartitioned window
        // anywhere; round-9 verdict item 2).
        def terciles(c: String) = {
          val grid = rfm.groupBy(col(c).as("v")).agg(count(lit(1)).as("w"))
          PrefixSum.cumsumLong(grid, Seq(col("v")), col("w"), "cum")
            .join(broadcast(rfm.agg(count(lit(1)).as("n"))))
            .agg(min(when(col("cum") * 3 >= col("n"), col("v"))).as(s"${c}_t1"),
                 min(when(col("cum") * 3 >= col("n") * 2, col("v"))).as(s"${c}_t2"))
        }
        def score(c: String) =
          when(col(c) <= col(s"${c}_t1"), 1L)
            .when(col(c) <= col(s"${c}_t2"), 2L).otherwise(3L)
        rfm.join(broadcast(terciles("rec")))
          .join(broadcast(terciles("freq")))
          .join(broadcast(terciles("mon")))
          // low recency = GOOD: invert the recency score so 3 = freshest
          .select(((lit(4L) - score("rec")) * 100L + score("freq") * 10L
                    + score("mon")).as("segment"))
          .groupBy("segment").agg(count(lit(1)).as("n_customers"))
          .orderBy("segment")
      },
      Some("""WITH rfm AS (
             |  SELECT o_custkey,
             |         CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
             |                        DATE '1998-12-31') AS BIGINT) AS rec,
             |         count(*) AS freq,
             |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS mon
             |  FROM orders GROUP BY o_custkey),
             |n AS (SELECT count(*) AS n FROM rfm),
             |tr AS (SELECT min(CASE WHEN cum * 3 >= n THEN v END) AS t1,
             |              min(CASE WHEN cum * 3 >= n * 2 THEN v END) AS t2
             |       FROM (SELECT v, sum(w) OVER (ORDER BY v
             |                      ROWS UNBOUNDED PRECEDING) AS cum
             |             FROM (SELECT rec AS v, count(*) AS w FROM rfm GROUP BY 1))
             |            CROSS JOIN n),
             |tf AS (SELECT min(CASE WHEN cum * 3 >= n THEN v END) AS t1,
             |              min(CASE WHEN cum * 3 >= n * 2 THEN v END) AS t2
             |       FROM (SELECT v, sum(w) OVER (ORDER BY v
             |                      ROWS UNBOUNDED PRECEDING) AS cum
             |             FROM (SELECT freq AS v, count(*) AS w FROM rfm GROUP BY 1))
             |            CROSS JOIN n),
             |tm AS (SELECT min(CASE WHEN cum * 3 >= n THEN v END) AS t1,
             |              min(CASE WHEN cum * 3 >= n * 2 THEN v END) AS t2
             |       FROM (SELECT v, sum(w) OVER (ORDER BY v
             |                      ROWS UNBOUNDED PRECEDING) AS cum
             |             FROM (SELECT mon AS v, count(*) AS w FROM rfm GROUP BY 1))
             |            CROSS JOIN n),
             |seg AS (
             |  SELECT (4 - CASE WHEN rec <= tr.t1 THEN 1
             |                   WHEN rec <= tr.t2 THEN 2 ELSE 3 END) * 100
             |         + (CASE WHEN freq <= tf.t1 THEN 1
             |                 WHEN freq <= tf.t2 THEN 2 ELSE 3 END) * 10
             |         + (CASE WHEN mon <= tm.t1 THEN 1
             |                 WHEN mon <= tm.t2 THEN 2 ELSE 3 END) AS segment
             |  FROM rfm CROSS JOIN tr CROSS JOIN tf CROSS JOIN tm)
             |SELECT CAST(segment AS BIGINT) AS segment,
             |       CAST(count(*) AS BIGINT) AS n_customers
             |FROM seg GROUP BY segment ORDER BY segment""".stripMargin)),

    // Nearest-neighbor retrieval on the minted customer geography: the
    // grid-blocked candidate join of join_spatial_grid, then the exact
    // argmin with a two-stage deterministic pick (min d², then min id
    // among ties) — no nondeterministic min_by anywhere.
    "join_nearest_geo" -> Decl(
      (s, d) => {
        val pts = Tables(s, d, "customer")
          .select(col("c_custkey").as("id"),
                  (col("c_custkey") * 17L % 12000L).as("slat"),
                  (col("c_custkey") * 31L % 36000L).as("slon"))
        val n = s.sparkContext.defaultParallelism
        val a = pts
          .select(col("id").as("id_a"), col("slat").as("lat_a"), col("slon").as("lon_a"),
                  explode(expr("array(-1L, 0L, 1L)")).as("dlat"))
          .select(col("id_a"), col("lat_a"), col("lon_a"), col("dlat"),
                  explode(expr("array(-1L, 0L, 1L)")).as("dlon"))
          .select(col("id_a"), col("lat_a"), col("lon_a"),
                  (expr("lat_a div 100") + col("dlat")).as("cl"),
                  (expr("lon_a div 100") + col("dlon")).as("cn"))
          .repartition(n, col("cl"), col("cn"))
        val b = pts.select(col("id").as("id_b"), col("slat").as("lat_b"),
                           col("slon").as("lon_b"),
                           expr("slat div 100").as("cl"), expr("slon div 100").as("cn"))
        val cand = a.join(b, Seq("cl", "cn"))
          .filter(col("id_a") =!= col("id_b"))
          .withColumn("d2", (col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b"))
                              + (col("lon_a") - col("lon_b")) * (col("lon_a") - col("lon_b")))
          .filter(col("d2") <= 100L * 100L)
          .select("id_a", "id_b", "d2")
          .localCheckpoint(true)
        // `best` has one row per point — corpus-sized, so the argmin
        // re-join must shuffle, never broadcast (round-10 probe family)
        val best = cand.groupBy("id_a").agg(min(col("d2")).as("min_d2"))
        cand.join(best.hint("shuffle_hash"), "id_a")
          .filter(col("d2") === col("min_d2"))
          .groupBy(col("id_a").as("c_custkey"))
          .agg(min(col("id_b")).as("nearest_id"), max(col("min_d2")).as("d2"))
          .orderBy("c_custkey")
      },
      Some("""WITH pts AS (SELECT c_custkey AS id,
             |               c_custkey * 17 % 12000 AS slat,
             |               c_custkey * 31 % 36000 AS slon
             |             FROM customer),
             |a AS (SELECT id AS id_a, slat AS lat_a, slon AS lon_a,
             |        slat // 100 + o.dlat AS cl, slon // 100 + o.dlon AS cn
             |      FROM pts CROSS JOIN (
             |        SELECT dl.dlat, dn.dlon
             |        FROM (SELECT unnest([-1, 0, 1]) AS dlat) dl
             |             CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dlon) dn) o),
             |b AS (SELECT id AS id_b, slat AS lat_b, slon AS lon_b,
             |        slat // 100 AS cl, slon // 100 AS cn
             |      FROM pts),
             |cand AS (
             |  SELECT id_a, id_b, (lat_a - lat_b) * (lat_a - lat_b)
             |         + (lon_a - lon_b) * (lon_a - lon_b) AS d2
             |  FROM a JOIN b USING (cl, cn)
             |  WHERE id_a <> id_b),
             |inr AS (SELECT * FROM cand WHERE d2 <= 10000),
             |best AS (SELECT id_a, min(d2) AS min_d2 FROM inr GROUP BY id_a)
             |SELECT inr.id_a AS c_custkey,
             |       CAST(min(id_b) AS BIGINT) AS nearest_id,
             |       CAST(max(min_d2) AS BIGINT) AS d2
             |FROM inr JOIN best USING (id_a)
             |WHERE inr.d2 = best.min_d2
             |GROUP BY inr.id_a ORDER BY c_custkey""".stripMargin)),

    // Dunning G² log-likelihood collocations: for every adjacent word
    // pair seen ≥ 16 times, the 2×2 contingency G² — THE collocation
    // statistic (stronger than PMI for rare pairs). All four observed
    // cells derive from exact integer bigram/unigram counts; the four
    // O·ln(O/E) terms are the only floats, rounded once. Sorted by the
    // rounded statistic with the pair as the unique tie-break.
    "text_collocation_g2" -> Decl(
      (s, d) => {
        val toks = Tables(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 2)
        val big = toks.select(explode(expr(
            "transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS w1, t[i + 1] AS w2))"))
            .as("p"))
          .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .agg(count(lit(1)).as("c12"))
          .localCheckpoint(true)
        val left = big.groupBy("w1").agg(sum(col("c12")).as("c1"))
        val right = big.groupBy("w2").agg(sum(col("c12")).as("c2"))
        val tot = big.agg(sum(col("c12")).as("nn"))
        def term(o: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
          when(o > 0, o.cast("double") * log(o.cast("double") / e)).otherwise(lit(0.0d))
        big.filter(col("c12") >= 16)
          .join(broadcast(left), "w1").join(broadcast(right), "w2")
          .crossJoin(broadcast(tot))
          .select(col("w1"), col("w2"), col("c12"),
            round(lit(2.0d) * (
              term(col("c12"), col("c1") * col("c2") / col("nn").cast("double")) +
              term(col("c1") - col("c12"),
                   col("c1").cast("double") * (col("nn") - col("c2")) / col("nn")) +
              term(col("c2") - col("c12"),
                   (col("nn") - col("c1")).cast("double") * col("c2") / col("nn")) +
              term(col("nn") - col("c1") - col("c2") + col("c12"),
                   (col("nn") - col("c1")).cast("double") * (col("nn") - col("c2"))
                     / col("nn"))), 6).as("g2"))
          .orderBy(col("g2").desc, col("w1"), col("w2"))
          .limit(50)
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
             |              FROM documents WHERE len(string_split(text, ' ')) >= 2),
             |big AS (SELECT w1, w2, count(*) AS c12 FROM (
             |          SELECT unnest(list_transform(generate_series(1, len(t) - 1),
             |                   i -> {'w1': t[i], 'w2': t[i + 1]}), recursive := true)
             |          FROM toks)
             |        GROUP BY 1, 2),
             |l AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY w1),
             |r AS (SELECT w2, sum(c12) AS c2 FROM big GROUP BY w2),
             |tot AS (SELECT sum(c12) AS nn FROM big),
             |g AS (SELECT big.w1, big.w2, c12,
             |        round(2.0 * (
             |          CASE WHEN c12 > 0 THEN c12 * ln(c12 /
             |            (c1 * c2 / CAST(nn AS DOUBLE))) ELSE 0.0 END +
             |          CASE WHEN c1 - c12 > 0 THEN (c1 - c12) * ln((c1 - c12) /
             |            (CAST(c1 AS DOUBLE) * (nn - c2) / nn)) ELSE 0.0 END +
             |          CASE WHEN c2 - c12 > 0 THEN (c2 - c12) * ln((c2 - c12) /
             |            (CAST(nn - c1 AS DOUBLE) * c2 / nn)) ELSE 0.0 END +
             |          CASE WHEN nn - c1 - c2 + c12 > 0
             |               THEN (nn - c1 - c2 + c12) * ln((nn - c1 - c2 + c12) /
             |            (CAST(nn - c1 AS DOUBLE) * (nn - c2) / nn)) ELSE 0.0 END), 6)
             |          AS g2
             |      FROM big JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tot
             |      WHERE c12 >= 16)
             |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, g2
             |FROM g ORDER BY g2 DESC, w1, w2 LIMIT 50""".stripMargin)),

    // Leave-one-out target encoding of event_type against the
    // high-value target — the ML feature that leaks without the
    // leave-one-out correction: per row, (Σy over the category − own y)
    // / (n − 1), all from one broadcast category aggregate and exact
    // integers until the terminal division.
    "agg_target_encode_loo" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
                  when(round(col("value") * 100).cast("bigint") > 50000L, 1L)
                    .otherwise(0L).as("y"))
        val cat = ev.groupBy("event_type")
          .agg(count(lit(1)).as("n_cat"), sum(col("y")).as("sum_y"))
        ev.join(broadcast(cat), "event_type")
          .select(col("event_id"), col("event_type"), col("y"),
                  round((col("sum_y") - col("y")).cast("double")
                        / (col("n_cat") - 1).cast("double"), 6).as("te_loo"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (SELECT event_id, event_type,
             |              CASE WHEN CAST(round(value * 100) AS BIGINT) > 50000
             |                   THEN 1 ELSE 0 END AS y
             |            FROM events),
             |cat AS (SELECT event_type, count(*) AS n_cat, sum(y) AS sum_y
             |        FROM ev GROUP BY event_type)
             |SELECT event_id, ev.event_type, CAST(y AS BIGINT) AS y,
             |       round(CAST(sum_y - y AS DOUBLE)
             |             / CAST(n_cat - 1 AS DOUBLE), 6) AS te_loo
             |FROM ev JOIN cat USING (event_type)
             |ORDER BY event_id""".stripMargin))
  )
}
