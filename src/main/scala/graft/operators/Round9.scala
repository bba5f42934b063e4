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
  private def quantized(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "e")))
      .select(col("vec_id"), col("i"),
              round(col("e").cast("double") * 1000).cast("bigint").as("x"))

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
        val seeds = Tables(s, d, "embeddings")
          .select(col("vec_id")).orderBy("vec_id").limit(K)
        var state = q.join(broadcast(seeds), "vec_id")
          .select(col("vec_id").as("cluster"), col("i"),
                  col("x").as("cs"), lit(1L).as("cn"))
        for (_ <- 1 to Iters) {
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
          state = assign.join(q, "vec_id")
            .groupBy("cluster", "i")
            .agg(sum(col("x")).as("cs"), count(lit(1)).as("cn"))
            .localCheckpoint(true)
        }
        state.groupBy("cluster")
          .agg(max(col("cn")).as("n"), sum(col("cs")).as("ssum"))
          .orderBy("cluster")
      },
      Some {
        val b = new StringBuilder(
          """WITH q AS (SELECT vec_id, u.i,
            |    CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000) AS BIGINT) AS x
            |  FROM embeddings,
            |       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u),
            |seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5),
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
        val dim = Tables(s, d, "supplier")
          .join(Tables(s, d, "nation"),
                col("s_nationkey") === col("n_nationkey"))
          .join(Tables(s, d, "region").filter(col("r_name") === "ASIA"),
                col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("n_name"))
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
            """round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
              |(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
              | sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
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
             |        (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
             |         sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
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
             |FROM hashed GROUP BY bucket ORDER BY bucket""".stripMargin)))
}
