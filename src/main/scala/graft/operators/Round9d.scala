package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 fourth wave: rolling regression (trailing-frame OLS), sentence
  * segmentation stats, iterative k-core graph peeling, deterministic
  * surrogate-key minting, and per-group min-max feature scaling.
  */
object Round9d {

  /** Peel rounds for the k-core decomposition — fixed and mirrored in the
    * oracle's unrolled CTE stages.
    */
  private val KCoreK = 3

  val decls: Map[String, Decl] = Map(
    // Rolling OLS slope — the trend feature of monitoring/feature
    // pipelines: per user, the least-squares slope of the last 8 event
    // values against their within-user sequence position. All five
    // sufficient sums are exact BIGINT window sums over the trailing frame
    // (t = row_number ≤ per-user count, cents ≤ 1e8 — products far inside
    // 2⁶³), so the only float is the one terminal slope division, rounded
    // to 6 dp (R11's fixed-tree discipline applied to a window). One
    // user-partitioned sort serves the row_number AND all five sums.
    // Emitted only for full frames so the frame width is a constant of the
    // query, not data-dependent.
    "window_rolling_slope" -> Decl(
      (s, d) => {
        val seq = Window.partitionBy("user_id").orderBy("event_id")
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  round(col("value") * 100).cast("bigint").as("y"))
          .withColumn("t", row_number().over(seq).cast("bigint"))
        val f = Window.partitionBy("user_id").orderBy("t")
          .rowsBetween(-7, Window.currentRow)
        ev.select(col("user_id"), col("event_id"),
                  count(lit(1)).over(f).as("n"),
                  sum(col("t")).over(f).as("st"),
                  sum(col("y")).over(f).as("sy"),
                  sum(col("t") * col("t")).over(f).as("stt"),
                  sum(col("t") * col("y")).over(f).as("sty"))
          .filter(col("n") === 8)
          .select(col("user_id"), col("event_id"),
                  round((col("n") * col("sty") - col("st") * col("sy")).cast("double") /
                        (col("n") * col("stt") - col("st") * col("st")).cast("double"), 6)
                    .as("slope"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id,
             |         CAST(round(value * 100) AS BIGINT) AS y,
             |         CAST(row_number() OVER (PARTITION BY user_id
             |                                 ORDER BY event_id) AS BIGINT) AS t
             |  FROM events),
             |f AS (SELECT user_id, event_id,
             |        count(*) OVER w AS n,
             |        CAST(sum(t) OVER w AS BIGINT) AS st,
             |        CAST(sum(y) OVER w AS BIGINT) AS sy,
             |        CAST(sum(t * t) OVER w AS BIGINT) AS stt,
             |        CAST(sum(t * y) OVER w AS BIGINT) AS sty
             |      FROM ev
             |      WINDOW w AS (PARTITION BY user_id ORDER BY t
             |                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id,
             |       round(CAST(n * sty - st * sy AS DOUBLE) /
             |             CAST(n * stt - st * st AS DOUBLE), 6) AS slope
             |FROM f WHERE n = 8 ORDER BY user_id, event_id""".stripMargin)),

    // Sentence segmentation stats — the readability/quality features a
    // corpus filter computes per document: sentence count (split on
    // [.!?]+ runs, Java∩RE2-safe), word totals, and mean words per
    // sentence. Pure per-row projection over list HOFs — rides the scan,
    // no shuffle at any scale. Empty fragments are filtered on BOTH
    // engines (Spark's split keeps trailing empties, DuckDB's regexp
    // split keeps inner ones — the filter normalizes both).
    "text_sentence_stats" -> Decl(
      (s, d) => {
        Tables(s, d, "documents")
          .withColumn("sents", expr(
            "filter(transform(split(text, '[.!?]+'), s -> trim(s)), s -> s <> '')"))
          .select(col("doc_id"), col("lang"),
                  size(col("sents")).cast("bigint").as("n_sent"),
                  expr("""aggregate(sents, 0L,
                         (a, s) -> a + size(filter(split(s, ' '), w -> w <> '')))""")
                    .as("n_words"))
          .filter(col("n_sent") > 0)
          .select(col("doc_id"), col("lang"), col("n_sent"), col("n_words"),
                  round(col("n_words").cast("double") /
                        col("n_sent").cast("double"), 6).as("words_per_sent"))
          .orderBy("doc_id")
      },
      Some("""WITH s AS (
             |  SELECT doc_id, lang,
             |    list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
             |                               s -> trim(s)), s -> s <> '') AS sents
             |  FROM documents),
             |c AS (SELECT doc_id, lang,
             |        CAST(len(sents) AS BIGINT) AS n_sent,
             |        CAST(coalesce(list_sum(list_transform(sents,
             |          s -> len(list_filter(string_split(s, ' '), w -> w <> '')))), 0)
             |          AS BIGINT) AS n_words
             |      FROM s)
             |SELECT doc_id, lang, n_sent, n_words,
             |       round(CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE), 6)
             |         AS words_per_sent
             |FROM c WHERE n_sent > 0 ORDER BY doc_id""".stripMargin)),

    // k-core decomposition by iterative peeling (the dense-subgraph
    // extraction behind community / spam-cluster mining): each round drops
    // every vertex whose CURRENT degree is < k, until the 4-round unroll.
    // The natural fixture graphs densify with scale factor (min part
    // degree is already 8 at sf0.001), so no fixed k would ever peel —
    // the graph is SYNTHESIZED deterministically over the customer key
    // space (the graph_pagerank precedent): a ring (degree 2 — peels at
    // k=3), mod-arithmetic chords on every 4th node, and a small dense
    // core (nodes ≤ 20, +1/+2/+3 cliques-ish) that provably survives.
    // Measured cascade at all three SFs: edges shrink every round and
    // converge toward the 64-edge core — the census proves real peeling
    // dynamics, not a no-op filter. Scale shape: per round one degree
    // aggregate + two semi joins on the surviving edges; edges only
    // shrink, each round checkpointed once so round r+1 never recomputes
    // round r's lineage. Output is 4 census rows at any scale.
    "graph_kcore_peel" -> Decl(
      (s, d) => {
        val cust = Tables(s, d, "customer").select(col("c_custkey").as("u"))
        val nRow = cust.agg(max(col("u")).as("N"))
        val raw = cust.crossJoin(broadcast(nRow))
        val endpoints = raw
          .select(col("u"), (col("u") % col("N") + 1).as("x"))
          .unionByName(raw.filter(col("u") % 4 === 0)
            .select(col("u"), ((col("u") * 13 + 5) % col("N") + 1).as("x")))
          .unionByName(cust.filter(col("u") <= 20)
            .select(col("u"), (col("u") + 1).as("x")))
          .unionByName(cust.filter(col("u") <= 20)
            .select(col("u"), (col("u") + 2).as("x")))
          .unionByName(cust.filter(col("u") <= 20)
            .select(col("u"), (col("u") + 3).as("x")))
          .filter(col("u") =!= col("x"))
        var e = endpoints
          .select(least(col("u"), col("x")).as("lo"),
                  greatest(col("u"), col("x")).as("hi"))
          .distinct()
          .localCheckpoint(true)
        val out = Seq.newBuilder[org.apache.spark.sql.DataFrame]
        for (r <- 1 to 4) {
          val keep = e.select(col("lo").as("v"))
            .unionByName(e.select(col("hi").as("v")))
            .groupBy("v").agg(count(lit(1)).as("deg"))
            .filter(col("deg") >= KCoreK).select("v")
          e = e.join(keep.withColumnRenamed("v", "lo"), "lo")
            .join(keep.withColumnRenamed("v", "hi"), "hi")
            .select("lo", "hi").localCheckpoint(true)
          out += e.agg(count(lit(1)).as("n_edges"),
                       countDistinct(col("lo")).as("n_lo"),
                       countDistinct(col("hi")).as("n_hi"))
            .select(lit(r.toLong).as("peel_round"), col("n_edges"),
                    col("n_lo"), col("n_hi"))
        }
        out.result().reduce(_ unionByName _).orderBy("peel_round")
      },
      Some(s"""WITH n AS (SELECT max(c_custkey) AS N FROM customer),
             |raw AS (SELECT c_custkey AS u FROM customer),
             |ed AS (SELECT DISTINCT least(u, x) AS lo, greatest(u, x) AS hi FROM (
             |  SELECT u, (u % N) + 1 AS x FROM raw, n
             |  UNION ALL SELECT u, ((u*13+5) % N) + 1 FROM raw, n WHERE u % 4 = 0
             |  UNION ALL SELECT u, u + 1 FROM raw WHERE u <= 20
             |  UNION ALL SELECT u, u + 2 FROM raw WHERE u <= 20
             |  UNION ALL SELECT u, u + 3 FROM raw WHERE u <= 20
             |) WHERE u <> x),
             |d0 AS (SELECT v, count(*) AS c FROM
             |        (SELECT lo AS v FROM ed UNION ALL SELECT hi FROM ed) GROUP BY v),
             |e1 AS (SELECT * FROM ed WHERE lo IN (SELECT v FROM d0 WHERE c >= $KCoreK)
             |                          AND hi IN (SELECT v FROM d0 WHERE c >= $KCoreK)),
             |d1 AS (SELECT v, count(*) AS c FROM
             |        (SELECT lo AS v FROM e1 UNION ALL SELECT hi FROM e1) GROUP BY v),
             |e2 AS (SELECT * FROM e1 WHERE lo IN (SELECT v FROM d1 WHERE c >= $KCoreK)
             |                          AND hi IN (SELECT v FROM d1 WHERE c >= $KCoreK)),
             |d2 AS (SELECT v, count(*) AS c FROM
             |        (SELECT lo AS v FROM e2 UNION ALL SELECT hi FROM e2) GROUP BY v),
             |e3 AS (SELECT * FROM e2 WHERE lo IN (SELECT v FROM d2 WHERE c >= $KCoreK)
             |                          AND hi IN (SELECT v FROM d2 WHERE c >= $KCoreK)),
             |d3 AS (SELECT v, count(*) AS c FROM
             |        (SELECT lo AS v FROM e3 UNION ALL SELECT hi FROM e3) GROUP BY v),
             |e4 AS (SELECT * FROM e3 WHERE lo IN (SELECT v FROM d3 WHERE c >= $KCoreK)
             |                          AND hi IN (SELECT v FROM d3 WHERE c >= $KCoreK))
             |SELECT peel_round, CAST(n_edges AS BIGINT) AS n_edges,
             |       CAST(n_lo AS BIGINT) AS n_lo,
             |       CAST(n_hi AS BIGINT) AS n_hi FROM (
             |  SELECT 1 AS peel_round, count(*) AS n_edges,
             |         count(DISTINCT lo) AS n_lo, count(DISTINCT hi) AS n_hi FROM e1
             |  UNION ALL SELECT 2, count(*), count(DISTINCT lo), count(DISTINCT hi) FROM e2
             |  UNION ALL SELECT 3, count(*), count(DISTINCT lo), count(DISTINCT hi) FROM e3
             |  UNION ALL SELECT 4, count(*), count(DISTINCT lo), count(DISTINCT hi) FROM e4)
             |ORDER BY peel_round""".stripMargin)),

    // Deterministic surrogate-key minting — stable UUID-shaped ids derived
    // from the natural key (md5 → 8-4-4-4-12), the idempotent alternative
    // to uuid()/monotonically_increasing_id() that re-runs and both
    // engines reproduce bit-for-bit. Pure per-row projection; at 100 TB
    // this is the id-assignment pass of an entity-resolution pipeline
    // (same input row ⇒ same id on every run and every cluster size).
    "scalar_uuid_stable" -> Decl(
      (s, d) => {
        Tables(s, d, "orders")
          .withColumn("h", md5(concat(lit("uuid:"), col("o_orderkey").cast("string"))))
          .select(col("o_orderkey"),
                  concat_ws("-",
                    substring(col("h"), 1, 8), substring(col("h"), 9, 4),
                    substring(col("h"), 13, 4), substring(col("h"), 17, 4),
                    substring(col("h"), 21, 12)).as("stable_uuid"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' ||
             |  substr(h, 13, 4) || '-' || substr(h, 17, 4) || '-' ||
             |  substr(h, 21, 12) AS stable_uuid
             |FROM (SELECT o_orderkey,
             |        md5('uuid:' || CAST(o_orderkey AS VARCHAR)) AS h
             |      FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    // Per-group min-max feature scaling — the normalization pass before
    // model features ship: (x − min) / (max − min) per event type, on the
    // integer-cents grid. Group extremes come from a bounded groupBy
    // broadcast back onto the scan (the zscore/quartile scan-parallel
    // pattern — never a whole-partition window over the corpus); the one
    // float division per row is a single fixed tree rounded to 6 dp, with
    // the degenerate max==min group emitting 0 by explicit guard on both
    // engines.
    "window_minmax_scale" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
                  round(col("value") * 100).cast("bigint").as("c"))
        val ext = ev.groupBy("event_type")
          .agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
        ev.join(broadcast(ext), "event_type")
          .select(col("event_id"), col("event_type"),
                  when(col("hi") === col("lo"), lit(0.0))
                    .otherwise(round((col("c") - col("lo")).cast("double") /
                                     (col("hi") - col("lo")).cast("double"), 6))
                    .as("scaled"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (SELECT event_id, event_type,
             |              CAST(round(value * 100) AS BIGINT) AS c
             |            FROM events),
             |ext AS (SELECT event_type, min(c) AS lo, max(c) AS hi
             |        FROM ev GROUP BY 1)
             |SELECT ev.event_id, ev.event_type,
             |       CASE WHEN hi = lo THEN 0.0
             |            ELSE round(CAST(ev.c - lo AS DOUBLE) /
             |                       CAST(hi - lo AS DOUBLE), 6) END AS scaled
             |FROM ev JOIN ext USING (event_type)
             |ORDER BY ev.event_id""".stripMargin))
  )
}
