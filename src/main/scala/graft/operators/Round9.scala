package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 additions: exact integer-grid k-means (Lloyd), Bloom-filter
  * semi-join reduction, hourly-series autocorrelation, and feature hashing
  * (the "hashing trick") over document tokens.
  */
object Round9 {

  /** k and iteration count for vec_kmeans_lloyd — fixed so the oracle SQL
    * can unroll the same number of CTE stages.
    */
  private val K = 5
  private val Iters = 3

  /** Quantized dimension table: one row per (vec_id, dim index, integer
    * coordinate), the exact-arithmetic substrate for Lloyd iterations.
    * round(x·1000) on the float-widened double is identical in both
    * engines; |x| ≤ 303 on this data, so every later product stays far
    * inside int64 AND double-exact range (see vec_kmeans_lloyd).
    */
  private[operators] def quantized(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "e")))
      .select(col("vec_id"), col("i"),
              round(col("e").cast("double") * 1000).cast("bigint").as("x"))

  /** Initial centroid state: the K lexicographically-first vectors, each a
    * singleton cluster keyed by its own vec_id.
    */
  private def seedState(s: SparkSession, d: String, q: DataFrame): DataFrame = {
    val seeds = Tables(s, d, "embeddings")
      .select(col("vec_id")).orderBy("vec_id").limit(K)
    q.join(broadcast(seeds), "vec_id")
      .select(col("vec_id").as("cluster"), col("i"),
              col("x").as("cs"), lit(1L).as("cn"))
  }

  /** One Lloyd iteration: assign every vector to its nearest centroid (the
    * k×dim state is BROADCAST, so the corpus never shuffles for the
    * distance join), then re-derive the (Σx, n) state. Package-visible so
    * ScaleSpec can gate the plan shape of the stage the operator's
    * checkpoints would otherwise hide.
    */
  private[graft] def lloydStep(q: DataFrame, state: DataFrame): DataFrame = {
    val assign = q.join(broadcast(state), "i")
      .groupBy(col("vec_id"), col("cluster"))
      .agg(sum((col("cn") * col("x") - col("cs")) *
               (col("cn") * col("x") - col("cs"))).as("num"),
           max(col("cn")).as("cn"))
      .groupBy("vec_id")
      .agg(min(struct((col("num").cast("double") /
                       (col("cn") * col("cn")).cast("double")).as("d"),
                      col("cluster").as("c"))).as("m"))
      .select(col("vec_id"), col("m.c").as("cluster"))
    assign.join(q, "vec_id")
      .groupBy("cluster", "i")
      .agg(sum(col("x")).as("cs"), count(lit(1)).as("cn"))
  }

  /** Test probe: one un-checkpointed Lloyd stage over the real tables. */
  private[graft] def kmeansStageForPlan(s: SparkSession, d: String): DataFrame = {
    val q = quantized(s, d)
    lloydStep(q, seedState(s, d, q))
  }

  val decls: Map[String, Decl] = Map(
    // k-means (Lloyd) over the embedding table — the clustering primitive
    // under semantic dedup sharding, IVF coarse quantizers, and corpus
    // topic bucketing. Every arithmetic step is EXACT so the DuckDB twin
    // hash-matches bit-for-bit: coordinates quantize to the integer
    // 1/1000 grid; a centroid is carried as (Σx per dim, n) integer
    // pairs, never a float mean; the assignment metric multiplies the
    // squared distance through by n² — num = Σᵢ(n·xᵢ − sᵢ)² is an exact
    // BIGINT < 2⁵³ (|n·x−s| ≤ 2000·303·2, 64 dims) — and the single
    // IEEE division num/n² is the only float op, identical on both
    // engines because its operands are identical integers. Ties break by
    // cluster id through the lexicographic struct-min both engines share.
    // Scale shape: the state table is k×64 rows — broadcast — so each
    // iteration is one scan of the exploded fact plus ONE shuffle keyed
    // on vec_id (the assignment group-by); classic Lloyd-on-MapReduce.
    "vec_kmeans_lloyd" -> Decl(
      (s, d) => {
        val q = quantized(s, d).localCheckpoint(true)
        var state = seedState(s, d, q)
        for (_ <- 1 to Iters) {
          state = lloydStep(q, state).localCheckpoint(true)
        }
        state.groupBy("cluster")
          .agg(max(col("cn")).as("n"), sum(col("cs")).as("ssum"))
          .orderBy("cluster")
      },
      Some {
        val b = new StringBuilder(
          s"""WITH q AS (SELECT vec_id, u.i,
            |    CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000) AS BIGINT) AS x
            |  FROM embeddings,
            |       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u),
            |seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $K),
            |s0 AS (SELECT q.vec_id AS cluster, i, x AS cs, CAST(1 AS BIGINT) AS cn
            |       FROM q JOIN seeds USING (vec_id))""".stripMargin)
        (1 to Iters).foreach { it =>
          b.append(s""",
            |a$it AS (SELECT vec_id, (min({'d': CAST(num AS DOUBLE) / (cn * cn), 'c': cluster})).c AS cluster
            |  FROM (SELECT q.vec_id, s.cluster,
            |          CAST(sum((s.cn * q.x - s.cs) * (s.cn * q.x - s.cs)) AS BIGINT) AS num,
            |          max(s.cn) AS cn
            |        FROM q JOIN s${it - 1} s USING (i) GROUP BY 1, 2)
            |  GROUP BY vec_id),
            |s$it AS (SELECT a.cluster, q.i, CAST(sum(q.x) AS BIGINT) AS cs,
            |          CAST(count(*) AS BIGINT) AS cn
            |        FROM a$it a JOIN q USING (vec_id) GROUP BY 1, 2)""".stripMargin)
        }
        b.append(s"""
          |SELECT cluster, CAST(max(cn) AS BIGINT) AS n, CAST(sum(cs) AS BIGINT) AS ssum
          |FROM s$Iters GROUP BY cluster ORDER BY cluster""".stripMargin)
        b.toString
      }),

    // Bloom-filter semi-join reduction — the 100 TB join pattern this
    // exists to demonstrate: when a selective dim filter survives only a
    // few thousand keys, shipping a ~1 MB Bloom filter to every scan task
    // drops non-qualifying fact rows BEFORE the shuffle, so the exchange
    // carries the post-join row count instead of the full fact. (Spark's
    // AQE runtime bloom does this implicitly when thresholds align; this
    // operator makes the reduction explicit and plannable.) mightContain
    // admits false positives and NO false negatives, so the exact
    // broadcast join behind it makes the result identical to the plain
    // join — the oracle needs no bloom twin.
    "join_bloom_prefilter" -> Decl(
      (s, d) => {
        // materialize the 3-table dim ONCE — it feeds three consumers
        // (the count sizing the filter, the bloom aggregation, and the
        // broadcast join) which would otherwise each re-run the join
        val dim = Tables(s, d, "supplier")
          .join(Tables(s, d, "nation"),
                col("s_nationkey") === col("n_nationkey"))
          .join(Tables(s, d, "region").filter(col("r_name") === "ASIA"),
                col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("n_name"))
          .localCheckpoint(true)
        val keys = dim.select("s_suppkey")
        val bf = keys.stat.bloomFilter("s_suppkey",
          math.max(keys.count(), 1000L), 0.01)
        val mightContain = udf((k: Long) => bf.mightContainLong(k))
        Tables(s, d, "lineitem")
          .filter(mightContain(col("l_suppkey")))
          .select(col("l_suppkey"),
                  round(col("l_extendedprice") * 100).cast("bigint").as("c"))
          .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("cents"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS n,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Autocorrelation of the hourly click-count series at lags 1–3 — the
    // seasonality probe of a metrics pipeline. The series (hour → count)
    // is one shuffle over events; each lag pairs the TINY hourly grid
    // with itself (broadcast self-join on hr+lag, inner — only observed
    // hours pair, deterministically). Pearson r per lag comes from six
    // exact BIGINT sufficient sums via one fixed double formula tree per
    // output row (the R11 discipline — no float aggregation anywhere).
    "ts_autocorr" -> Decl(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .filter(col("event_type") === "click")
          .groupBy(expr("unix_micros(ts) div 3600000000").as("hr"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
        val lags = s.range(1, 4).select(col("id").as("lag"))
        val pairs = hourly.crossJoin(broadcast(lags))
          .join(broadcast(hourly.select(col("hr").as("hr2"), col("cnt").as("cnt2"))),
                col("hr2") === col("hr") + col("lag"))
          .select(col("lag"), col("cnt").as("x"), col("cnt2").as("y"))
        pairs.groupBy("lag")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
               sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
               sum(col("x") * col("x")).as("sxx"),
               sum(col("y") * col("y")).as("syy"))
          .selectExpr("lag", "n",
            // nullif pins the zero-variance degenerate case (all paired
            // hours equal) to NULL identically in both engines instead of
            // an engine-encoded NaN/Infinity the hash may not agree on
            """round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
              |nullif(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
              |       sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy), 0.0), 6)
              |AS r""".stripMargin)
          .orderBy("lag")
      },
      Some("""WITH hourly AS (
             |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
             |         count(*) AS cnt
             |  FROM events WHERE event_type = 'click' GROUP BY 1),
             |pairs AS (
             |  SELECT l.lag, a.cnt AS x, b.cnt AS y
             |  FROM hourly a
             |  CROSS JOIN (VALUES (1), (2), (3)) l(lag)
             |  JOIN hourly b ON b.hr = a.hr + l.lag),
             |st AS (SELECT lag, count(*) AS n,
             |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |         CAST(sum(x * y) AS BIGINT) AS sxy,
             |         CAST(sum(x * x) AS BIGINT) AS sxx,
             |         CAST(sum(y * y) AS BIGINT) AS syy
             |       FROM pairs GROUP BY lag)
             |SELECT CAST(lag AS BIGINT) AS lag, n,
             |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             |        nullif(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
             |               sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy), 0.0), 6)
             |  AS r
             |FROM st ORDER BY lag""".stripMargin)),

    // Feature hashing (the "hashing trick") — fixed-dimension sparse text
    // features without a vocabulary table: each token folds its character
    // codes through the polynomial hash h = (31·h + code) mod 1e9+7 (the
    // text_fingerprint primitive applied per token) and lands in bucket
    // h mod 64. Output is the 64-row bucket profile (document frequency +
    // total term frequency) — at corpus scale a bounded aggregate that
    // needs no dictionary shuffle, which is the whole point of hashed
    // features over tf-idf vocabularies. Integer-only → exact twin.
    "text_hash_features" -> Decl(
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("doc_id"),
                  explode(split(lower(col("text")), " ")).as("w"))
          .filter(col("w").rlike("^[a-z]+$"))
          .select(col("doc_id"), expr(
            """pmod(aggregate(
              |  transform(filter(split(w, ''), c -> c <> ''),
              |            c -> CAST(ascii(c) AS BIGINT)),
              |  CAST(0 AS BIGINT),
              |  (a, x) -> (a * 31 + x) % 1000000007), 64)""".stripMargin)
            .as("bucket"))
          .groupBy("bucket")
          .agg(countDistinct(col("doc_id")).as("df"),
               count(lit(1)).as("tf"))
          .orderBy("bucket")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, w
             |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
             |        FROM documents)
             |  WHERE regexp_matches(w, '^[a-z]+$')),
             |hashed AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        list_transform(string_split(w, ''),
             |                       c -> CAST(ord(c) AS BIGINT))),
             |      (a, x) -> (a * 31 + x) % 1000000007) % 64 AS bucket
             |  FROM tok)
             |SELECT bucket, count(DISTINCT doc_id) AS df, count(*) AS tf
             |FROM hashed GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // Matryoshka-truncation retrieval check — modern embedding stacks
    // serve a 16-dim prefix of a 64-dim vector for cheap first-stage
    // retrieval; this measures per-query whether the truncated index
    // returns the same top-1 neighbor as the full vector. Exactness:
    // dot products and squared norms are BIGINT sums on the 1/1000
    // integer grid; cosine is ONE fixed double expression over those
    // exact integers (identical IEEE ops both engines); argmax breaks
    // ties by vec_id through the shared struct-min. Scale shape: the
    // query set is bounded (every 50th vector) and BROADCAST, so
    // scoring is a scan of the exploded corpus with one (q,v)-keyed
    // shuffle — never a corpus×corpus join.
    "sim_matryoshka_recall" -> Decl(
      (s, d) => {
        val q = quantized(s, d).localCheckpoint(true)
        val norms = q.groupBy("vec_id").agg(sum(col("x") * col("x")).as("n2"))
        val normsT = q.filter(col("i") < 16)
          .groupBy("vec_id").agg(sum(col("x") * col("x")).as("n2"))
        val queries = q.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("i"), col("x").as("qx"))
        def top1(dims: DataFrame => DataFrame, nrm: DataFrame, out: String) =
          dims(q).join(broadcast(dims(queries)), "i")
            .filter(col("vec_id") =!= col("q_id"))
            .groupBy("q_id", "vec_id")
            .agg(sum(col("qx") * col("x")).as("dot"))
            .join(nrm.select(col("vec_id"), col("n2").as("nv")), "vec_id")
            .join(broadcast(nrm.select(col("vec_id").as("q_id"), col("n2").as("nq"))), "q_id")
            .groupBy("q_id")
            .agg(min(struct(
              (-(col("dot").cast("double") /
                 (sqrt(col("nv").cast("double")) * sqrt(col("nq").cast("double"))))).as("nd"),
              col("vec_id").as("v"))).as("m"))
            .select(col("q_id"), col("m.v").as(out))
        top1(identity, norms, "full_id")
          .join(top1(_.filter(col("i") < 16), normsT, "trunc_id"), "q_id")
          .select(col("q_id"), col("full_id"), col("trunc_id"),
                  (col("full_id") === col("trunc_id")).cast("int").as("agree"))
          .orderBy("q_id")
      },
      Some("""WITH q AS (SELECT vec_id, u.i,
             |    CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000) AS BIGINT) AS x
             |  FROM embeddings,
             |       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u),
             |qry AS (SELECT vec_id AS q_id, i, x AS qx FROM q WHERE vec_id % 50 = 0),
             |nf AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS n2 FROM q GROUP BY 1),
             |nt AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS n2 FROM q
             |       WHERE i <= 16 GROUP BY 1),
             |df AS (SELECT qry.q_id, q.vec_id, CAST(sum(qry.qx * q.x) AS BIGINT) AS dot
             |       FROM q JOIN qry USING (i) WHERE q.vec_id <> qry.q_id GROUP BY 1, 2),
             |tf AS (SELECT q_id,
             |    (min({'nd': -(CAST(dot AS DOUBLE) /
             |                  (sqrt(CAST(nv.n2 AS DOUBLE)) * sqrt(CAST(nq.n2 AS DOUBLE)))),
             |          'v': df.vec_id})).v AS full_id
             |  FROM df JOIN nf nv ON df.vec_id = nv.vec_id
             |          JOIN nf nq ON df.q_id = nq.vec_id GROUP BY q_id),
             |dt AS (SELECT qry.q_id, q.vec_id, CAST(sum(qry.qx * q.x) AS BIGINT) AS dot
             |       FROM q JOIN qry USING (i)
             |       WHERE q.vec_id <> qry.q_id AND i <= 16 GROUP BY 1, 2),
             |tt AS (SELECT q_id,
             |    (min({'nd': -(CAST(dot AS DOUBLE) /
             |                  (sqrt(CAST(nv.n2 AS DOUBLE)) * sqrt(CAST(nq.n2 AS DOUBLE)))),
             |          'v': dt.vec_id})).v AS trunc_id
             |  FROM dt JOIN nt nv ON dt.vec_id = nv.vec_id
             |          JOIN nt nq ON dt.q_id = nq.vec_id GROUP BY q_id)
             |SELECT q_id, full_id, trunc_id,
             |  CAST(full_id = trunc_id AS INT) AS agree
             |FROM tf JOIN tt USING (q_id) ORDER BY q_id""".stripMargin)),

    // Point-in-time join against SCD2 intervals — the feature-store
    // correctness primitive: each purchase event reads the dimension
    // VERSION that was valid at its timestamp (no leakage from future
    // versions). The dim side is the scd2_intervals construction
    // (status-change stream → [valid_from, valid_to) versions via lead);
    // the join is equi on user_id plus interval containment, so Spark
    // plans a hash/merge join with a residual range filter — per-user
    // state, never a cartesian. Half-open intervals make boundary hits
    // unambiguous in both engines.
    "join_pit_scd2" -> Decl(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("valid_from"), col("event_id"))
        val dim = Tables.events(s, d)
          .filter(col("event_type").isin("signup", "error"))
          .select(col("user_id"), col("event_id"), col("event_type").as("status"),
                  col("ts").as("valid_from"))
          .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
          .withColumn("version", row_number().over(w))
          .select(col("user_id").as("d_uid"), col("status"),
                  col("valid_from"), col("valid_to"), col("version"))
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
          .join(dim, col("user_id") === col("d_uid") &&
                     col("ts") >= col("valid_from") &&
                     (col("valid_to").isNull || col("ts") < col("valid_to")))
          .select(col("user_id"), col("event_id"), col("status"), col("version"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH dim AS (
             |  SELECT user_id, event_type AS status,
             |    CAST(ts AS TIMESTAMP) AS valid_from,
             |    lead(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS valid_to,
             |    CAST(row_number() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS INT) AS version
             |  FROM events WHERE event_type IN ('signup', 'error'))
             |SELECT f.user_id, f.event_id, dim.status, dim.version
             |FROM events f JOIN dim ON f.user_id = dim.user_id
             |  AND CAST(f.ts AS TIMESTAMP) >= dim.valid_from
             |  AND (dim.valid_to IS NULL OR CAST(f.ts AS TIMESTAMP) < dim.valid_to)
             |WHERE f.event_type = 'purchase'
             |ORDER BY f.user_id, f.event_id""".stripMargin)))
}
