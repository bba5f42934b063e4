package graft.operators

/** relational, window, join, streaming-twin and TPC-H waves — consolidated from the append-only wave files
  * (round-11 verdict item 8); object names and query keys unchanged,
  * REGISTRY.md remains the per-key index.
  */

// ——— formerly Round10.scala ———
/** Round-10 first wave: the remaining classic TPC-H shapes the fixture
  * schema supports (Q4, Q5, Q14, Q15, Q19, Q22), adapted only where the
  * synthetic schema lacks a column (no l_commitdate/l_receiptdate, no
  * partsupp, no c_phone) and hardened per the repo's determinism rules:
  * money flows as round(expr·100) integer cents (SURVEY §7.3 R3), every
  * ORDER BY carries a unique tiebreaker (R2), and averages never surface
  * as floats — Q22's "above average balance" is the integer cross-multiply
  * `bal·n > Σbal`, exact in both engines.
  *
  * Scale notes (the reason these six are the canonical optimizer demos):
  * Q5 is the five-way star join — dims broadcast, the one fact shuffle is
  * on the orders⋈lineitem key, and the region filter prunes nation before
  * it ever touches the fact side. Q4/Q22 are correlated EXISTS / NOT
  * EXISTS that Catalyst decorrelates to semi/anti hash joins on the fact
  * key — no per-row subquery execution at any scale. Q14 is a single
  * fact⋈broadcast(part) pass with a conditional aggregate (no second scan
  * for the PROMO numerator). Q15's scalar-subquery max broadcasts one row
  * back over the supplier aggregate. Q19's disjunction of
  * brand/size/quantity conjuncts stays a single pushed scan predicate —
  * the parquet reader sees one OR-of-ANDs filter, not three scans
  * unioned.
  */
object Round10 {
  import graft.{Decl, Tables}


  private def q(spark: org.apache.spark.sql.SparkSession, d: String, sql: String) = {
    Tables.views(spark, d)
    spark.sql(sql)
  }

  /** Q4 adapted: no l_commitdate/l_receiptdate in the fixture, so "late
    * lineitem" becomes shipped >60 days after the order date — the same
    * correlated-EXISTS-with-arithmetic shape.
    */
  private val Q4 =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Q5: local-supplier volume — customer and supplier in the SAME nation,
    * nation in ASIA, one order year. */
  private val Q5 =
    """SELECT n_name,
      |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_c
      |FROM customer
      |  JOIN orders   ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue_c DESC, n_name""".stripMargin

  /** Q14 adapted: fixture p_type is the exact value 'PROMO' (not a
    * prefix); the promo share is emitted as the two exact cent sums, not
    * a float ratio. */
  private val Q14 =
    """SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
      |             THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
      |             ELSE 0 END) AS BIGINT) AS promo_revenue_c,
      |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |         AS total_revenue_c
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  /** Q15: top supplier by quarterly revenue; the max is a scalar subquery
    * over the same aggregate (Catalyst broadcasts the one-row max, no
    * second full scan of the fact table — the CTE is evaluated once per
    * reference but both references sit above the same 100-row supplier
    * aggregate, never the raw lineitem). */
  private val Q15 =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |           AS total_revenue_c
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue_c
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Q19 adapted (no l_shipmode/p_container): the disjunctive
    * brand/size/quantity predicate — one OR-of-ANDs filter the scan
    * evaluates in a single pass. */
  private val Q19 =
    """SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_c,
      |       CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** Q22 adapted: no c_phone, so the "promising inactive customer" cohort
    * groups by nation key instead of phone prefix. "Above the average
    * positive balance" is the integer cross-multiply bal·n > Σbal over
    * cents — no float average ever materializes, so engines cannot
    * disagree on reduction order. The NOT EXISTS decorrelates to a left
    * anti join of the 15 k-row customer side against orders' custkey set.
    */
  private val Q22 =
    """WITH pos AS (
      |  SELECT c_custkey, c_nationkey,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
      |       CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
      |FROM pos
      |WHERE bal_c * (SELECT count(*) FROM pos) > (SELECT sum(bal_c) FROM pos)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  val decls: Map[String, Decl] = Map(
    "tpch_q4"  -> Decl((s, d) => q(s, d, Q4),  Some(Q4)),
    "tpch_q5"  -> Decl((s, d) => q(s, d, Q5),  Some(Q5)),
    "tpch_q14" -> Decl((s, d) => q(s, d, Q14), Some(Q14)),
    "tpch_q15" -> Decl((s, d) => q(s, d, Q15), Some(Q15)),
    "tpch_q19" -> Decl((s, d) => q(s, d, Q19), Some(Q19)),
    "tpch_q22" -> Decl((s, d) => q(s, d, Q22), Some(Q22))
  )
}

// ——— formerly Round10d.scala ———
/** Round-10 fourth wave: entity resolution, inferential statistics, and
  * survival/periodicity analysis. Determinism discipline throughout:
  * integer sufficient statistics (cents, counts, dot products) end-to-end,
  * floats only in terminal rounded formulas (one sqrt / trig / exp-ln
  * tree over engine-identical double inputs), total ORDER BY with a
  * unique trailing key (SURVEY §7.3).
  */
object Round10d {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._


  val decls: Map[String, Decl] = Map(
    // Blocked fuzzy entity match — the record-linkage workhorse: parts
    // whose names are within edit distance 3, candidate space bounded by
    // (brand, type) blocking instead of the quadratic corpus. The banded
    // 3-arg levenshtein early-exits above the threshold. Per-part fuzzy
    // degree keeps the output linear in the entity count. 100 TB path:
    // the block key shuffles both sides co-partitioned; no block exceeds
    // a task (blocking keys are chosen with bounded selectivity).
    "join_fuzzy_name" -> Decl(
      (s, d) => {
        val p = Tables(s, d, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_name"))
        val n = s.sparkContext.defaultParallelism
        val a = p.select(col("p_partkey").as("id_a"), col("p_brand"),
                         col("p_type"), col("p_name").as("na"))
          .repartition(n, col("p_brand"), col("p_type"))
        val b = p.select(col("p_partkey").as("id_b"), col("p_brand").as("brand_b"),
                         col("p_type").as("type_b"), col("p_name").as("nb"))
        a.join(b, col("p_brand") === col("brand_b") &&
                  col("p_type") === col("type_b") &&
                  col("id_a") =!= col("id_b"))
          .withColumn("dist", levenshtein(col("na"), col("nb"), 3))
          .filter(col("dist") >= 0)
          .groupBy(col("id_a").as("p_partkey"))
          .agg(count(lit(1)).as("n_similar"),
               min(col("dist")).cast("bigint").as("min_dist"),
               min(col("id_b")).as("first_match"))
          .orderBy("p_partkey")
      },
      Some("""WITH a AS (SELECT p_partkey, p_brand, p_type, p_name FROM part)
             |SELECT a.p_partkey,
             |       CAST(count(*) AS BIGINT) AS n_similar,
             |       CAST(min(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS min_dist,
             |       CAST(min(b.p_partkey) AS BIGINT) AS first_match
             |FROM a JOIN a b
             |  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
             | AND a.p_partkey <> b.p_partkey
             |WHERE levenshtein(a.p_name, b.p_name) <= 3
             |GROUP BY a.p_partkey ORDER BY a.p_partkey""".stripMargin)),

    // Wilson 95% score interval for the per-type high-value event rate —
    // the statistically honest KPI bound (normal approximation fails at
    // small n; Wilson does not). k and n are exact integers off one
    // shuffle; the interval is one terminal sqrt formula.
    "agg_rate_wilson_ci" -> Decl(
      (s, d) => {
        val z = 1.96d
        Tables.events(s, d)
          .select(col("event_type"),
                  when(round(col("value") * 100).cast("bigint") > 50000L, 1L)
                    .otherwise(0L).as("hi"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("hi")).as("k"))
          .select(col("event_type"), col("n"), col("k"),
                  round(col("k").cast("double") / col("n"), 6).as("p_hat"),
                  round((col("k").cast("double") / col("n") + lit(z * z) / (col("n") * 2)
                          - lit(z) * sqrt((col("k").cast("double") / col("n"))
                              * (lit(1.0d) - col("k").cast("double") / col("n")) / col("n")
                              + lit(z * z) / (lit(4.0d) * col("n") * col("n"))))
                        / (lit(1.0d) + lit(z * z) / col("n")), 6).as("wilson_lo"),
                  round((col("k").cast("double") / col("n") + lit(z * z) / (col("n") * 2)
                          + lit(z) * sqrt((col("k").cast("double") / col("n"))
                              * (lit(1.0d) - col("k").cast("double") / col("n")) / col("n")
                              + lit(z * z) / (lit(4.0d) * col("n") * col("n"))))
                        / (lit(1.0d) + lit(z * z) / col("n")), 6).as("wilson_hi"))
          .orderBy("event_type")
      },
      Some("""WITH s AS (SELECT event_type, count(*) AS n,
             |             sum(CASE WHEN CAST(round(value * 100) AS BIGINT) > 50000
             |                      THEN 1 ELSE 0 END) AS k
             |           FROM events GROUP BY event_type)
             |SELECT event_type, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             |       round(CAST(k AS DOUBLE) / n, 6) AS p_hat,
             |       round((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (n * 2)
             |               - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
             |                   * (1.0 - CAST(k AS DOUBLE) / n) / n
             |                   + 1.96 * 1.96 / (4.0 * n * n)))
             |             / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_lo,
             |       round((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (n * 2)
             |               + 1.96 * sqrt((CAST(k AS DOUBLE) / n)
             |                   * (1.0 - CAST(k AS DOUBLE) / n) / n
             |                   + 1.96 * 1.96 / (4.0 * n * n)))
             |             / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_hi
             |FROM s ORDER BY event_type""".stripMargin)),

    // Dominant periodicity per event type: the lag (2..36 h) maximizing
    // the raw autocovariance Σ c_t·c_{t+L} per overlapping term — period
    // detection on the BOUNDED hourly spine (the aggregate collapses
    // events first; the lag fan-out is 35× a few-hundred-row table, and
    // the dot products are exact BIGINTs). Argmax tie-break: smaller lag.
    "ts_period_autocorr" -> Decl(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"),
                   expr("unix_micros(ts) div 3600000000L").as("hr"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(true)
        val lags = s.range(2, 37).select(col("id").as("lag"))
        val scored = hourly.crossJoin(broadcast(lags))
          .join(hourly.select(col("event_type").as("et2"),
                              col("hr").as("hr2"), col("c").as("c2")),
                col("et2") === col("event_type") &&
                col("hr2") === col("hr") + col("lag"))
          .groupBy("event_type", "lag")
          .agg(count(lit(1)).as("n_terms"),
               sum(col("c") * col("c2")).as("dot"))
        val w = Window.partitionBy("event_type")
          .orderBy((col("dot").cast("double") / col("n_terms")).desc, col("lag"))
        scored
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("lag").as("best_lag"),
                  col("n_terms"), col("dot"),
                  round(col("dot").cast("double") / col("n_terms"), 6)
                    .as("score_per_term"))
          .orderBy("event_type")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type,
             |         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
             |         count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |scored AS (
             |  SELECT a.event_type, l.lag, count(*) AS n_terms,
             |         sum(a.c * b.c) AS dot
             |  FROM hourly a
             |       CROSS JOIN (SELECT unnest(generate_series(2, 36)) AS lag) l
             |       JOIN hourly b ON b.event_type = a.event_type
             |                    AND b.hr = a.hr + l.lag
             |  GROUP BY 1, 2),
             |rk AS (SELECT event_type, lag, n_terms, dot,
             |         row_number() OVER (PARTITION BY event_type
             |           ORDER BY CAST(dot AS DOUBLE) / n_terms DESC, lag) AS rk
             |       FROM scored)
             |SELECT event_type, CAST(lag AS BIGINT) AS best_lag,
             |       CAST(n_terms AS BIGINT) AS n_terms, CAST(dot AS BIGINT) AS dot,
             |       round(CAST(dot AS DOUBLE) / n_terms, 6) AS score_per_term
             |FROM rk WHERE rk = 1 ORDER BY event_type""".stripMargin)),

    // Longest strictly-increasing value streak per user — the engagement
    // momentum metric, a gaps-and-islands composition: break flag via one
    // lag, island id via one running sum, max island size. All integer,
    // one user-partitioned sort shared by the three windows.
    "window_streak_increase" -> Decl(
      (s, d) => {
        val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
                  round(col("value") * 100).cast("bigint").as("x"))
          .withColumn("brk",
            when(col("x") > lag(col("x"), 1).over(ord), 0L).otherwise(1L))
          .withColumn("island", sum(col("brk")).over(cum))
          .groupBy("user_id", "island")
          .agg(count(lit(1)).as("run_len"))
          .groupBy("user_id")
          .agg(max(col("run_len")).as("max_run"),
               count(lit(1)).as("n_islands"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id,
             |             CAST(round(value * 100) AS BIGINT) AS x
             |           FROM events),
             |b AS (SELECT user_id, ts, event_id, x,
             |        CASE WHEN x > lag(x) OVER w THEN 0 ELSE 1 END AS brk
             |      FROM e
             |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |i AS (SELECT user_id, sum(brk) OVER
             |        (PARTITION BY user_id ORDER BY ts, event_id
             |         ROWS UNBOUNDED PRECEDING) AS island
             |      FROM b),
             |runs AS (SELECT user_id, island, count(*) AS run_len
             |         FROM i GROUP BY 1, 2)
             |SELECT user_id, CAST(max(run_len) AS BIGINT) AS max_run,
             |       CAST(count(*) AS BIGINT) AS n_islands
             |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Haversine great-circle distance from a minted deterministic lat/lon
    // per customer to the reference origin — the geo-enrichment scalar
    // family riding the scan. Coordinates are exact integer arithmetic
    // divided once; the trig tree rounds at 3 dp km, far above the ≤2 ulp
    // libm divergence between engines.
    "scalar_haversine_geo" -> Decl(
      (s, d) => {
        val r = 6371.0d
        Tables(s, d, "customer")
          .select(col("c_custkey"),
                  ((col("c_custkey") * 17L % 12000L).cast("double") / 100.0d
                    - 60.0d).as("lat"),
                  ((col("c_custkey") * 31L % 36000L).cast("double") / 100.0d
                    - 180.0d).as("lon"))
          .select(col("c_custkey"), col("lat"), col("lon"),
                  round(lit(2.0d * r) * asin(sqrt(
                    pow(sin(radians(col("lat")) / 2), 2)
                      + cos(radians(col("lat"))) * cos(lit(0.0d))
                        * pow(sin(radians(col("lon")) / 2), 2))), 3)
                    .as("km_from_origin"))
          .orderBy("c_custkey")
      },
      Some("""WITH g AS (SELECT c_custkey,
             |             CAST(c_custkey * 17 % 12000 AS DOUBLE) / 100.0 - 60.0 AS lat,
             |             CAST(c_custkey * 31 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
             |           FROM customer)
             |SELECT c_custkey, lat, lon,
             |       round(2.0 * 6371.0 * asin(sqrt(
             |         pow(sin(radians(lat) / 2), 2)
             |           + cos(radians(lat)) * cos(0.0)
             |             * pow(sin(radians(lon) / 2), 2))), 3) AS km_from_origin
             |FROM g ORDER BY c_custkey""".stripMargin)),

    // Kaplan–Meier survival over order→first-ship latency weeks (events
    // with negative latency excluded): at-risk counts by reverse
    // cumulative sum, survival as exp of the cumulative log-product —
    // both windows run over the BOUNDED week spine, and every input to
    // the float chain is an exact integer, so the sequential ln/exp tree
    // is bit-identical across engines.
    "ts_survival_km" -> Decl(
      (s, d) => {
        val lat = Tables(s, d, "lineitem")
          .groupBy("l_orderkey").agg(min(col("l_shipdate")).as("first_ship"))
          .join(Tables(s, d, "orders"),
                col("l_orderkey") === col("o_orderkey"))
          .select(datediff(col("first_ship").cast("date"),
                           col("o_orderdate").cast("date")).as("lat_days"))
          .filter(col("lat_days") >= 0)
          // `div` not `/`: Column./ is always double division in Spark
          .select(expr("CAST(lat_days AS BIGINT) div 7").as("wk"))
        val spine = lat.groupBy("wk").agg(count(lit(1)).as("d"))
        val wAll = Window.orderBy("wk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = spine.agg(sum("d").as("tot"))
        spine
          .join(broadcast(tot))
          .withColumn("cum_before", sum(col("d")).over(wAll) - col("d"))
          .withColumn("n_risk", col("tot") - col("cum_before"))
          // d == n_risk only on the final spine row (everyone left fails
          // there): ln(0) is an ERROR in DuckDB, not -inf, so that row's
          // survival is pinned to exactly 0 outside the log chain.
          .withColumn("lnterm",
            when(col("d") < col("n_risk"),
                 log(lit(1.0d) - col("d").cast("double") / col("n_risk")))
              .otherwise(lit(0.0d)))
          .withColumn("s_km",
            when(col("d") === col("n_risk"), lit(0.0d))
              .otherwise(round(exp(sum(col("lnterm")).over(wAll)), 6)))
          .select(col("wk"), col("d"), col("n_risk"), col("s_km"))
          .orderBy("wk")
      },
      Some("""WITH lat AS (
             |  SELECT CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
             |                        CAST(f.first_ship AS DATE)) AS BIGINT) AS lat_days
             |  FROM (SELECT l_orderkey, min(l_shipdate) AS first_ship
             |        FROM lineitem GROUP BY l_orderkey) f
             |       JOIN orders o ON f.l_orderkey = o.o_orderkey
             |  WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
             |                  CAST(f.first_ship AS DATE)) >= 0),
             |spine AS (SELECT lat_days // 7 AS wk, count(*) AS d
             |          FROM lat GROUP BY 1),
             |cum AS (SELECT wk, d,
             |          sum(d) OVER (ORDER BY wk ROWS UNBOUNDED PRECEDING) - d
             |            AS cum_before,
             |          sum(d) OVER () AS tot
             |        FROM spine),
             |km AS (SELECT wk, d, tot - cum_before AS n_risk,
             |         CASE WHEN d < tot - cum_before
             |              THEN ln(1.0 - CAST(d AS DOUBLE) / (tot - cum_before))
             |              ELSE 0.0 END AS lnterm
             |       FROM cum)
             |SELECT CAST(wk AS BIGINT) AS wk, CAST(d AS BIGINT) AS d,
             |       CAST(n_risk AS BIGINT) AS n_risk,
             |       CASE WHEN d = n_risk THEN 0.0
             |            ELSE round(exp(sum(lnterm) OVER
             |                   (ORDER BY wk ROWS UNBOUNDED PRECEDING)), 6)
             |       END AS s_km
             |FROM km ORDER BY wk""".stripMargin))
  )
}

// ——— formerly Round10e.scala ———
/** Round-10 fifth wave: spatial blocking, time-windowed funnels, decision
  * split search, and user-agent parsing. Same determinism discipline:
  * coordinates, timestamps, and class counts stay exact integers; floats
  * appear only in terminal rounded impurity/ratio formulas; every ORDER BY
  * ends in a unique key.
  */
object Round10e {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.functions._


  val decls: Map[String, Decl] = Map(
    // Grid-blocked spatial self-join — the scale pattern for "neighbors
    // within radius": points land in 1°×1° cells (integer centi-degree
    // coordinates, shifted non-negative so truncating div IS floor div),
    // side A fans out to its 3×3 cell neighborhood, the join runs
    // co-partitioned on the cell key, and the exact radius check is an
    // INTEGER d² ≤ R² compare (no float geometry anywhere). Candidates
    // per point are bounded by local density — never corpus size.
    "join_spatial_grid" -> Decl(
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
        a.join(b, Seq("cl", "cn"))
          .filter(col("id_a") =!= col("id_b"))
          .withColumn("d2", (col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b"))
                              + (col("lon_a") - col("lon_b")) * (col("lon_a") - col("lon_b")))
          .filter(col("d2") <= 100L * 100L)
          .groupBy(col("id_a").as("c_custkey"))
          .agg(count(lit(1)).as("n_neighbors"), min(col("d2")).as("min_d2"))
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
             |pairs AS (
             |  SELECT id_a, (lat_a - lat_b) * (lat_a - lat_b)
             |               + (lon_a - lon_b) * (lon_a - lon_b) AS d2
             |  FROM a JOIN b USING (cl, cn)
             |  WHERE id_a <> id_b)
             |SELECT id_a AS c_custkey, CAST(count(*) AS BIGINT) AS n_neighbors,
             |       CAST(min(d2) AS BIGINT) AS min_d2
             |FROM pairs WHERE d2 <= 10000
             |GROUP BY id_a ORDER BY c_custkey""".stripMargin)),

    // Time-windowed funnel conversion: each user's FIRST view, and the
    // earliest click that follows it within one hour — the as-of funnel
    // every product pipeline computes. Two conditional min-aggregates on
    // exact integer micros (one shuffle on user_id; the "click after
    // view" constraint is a second conditional min over the same group
    // via a self-join on the broadcast first-view table).
    "ts_conversion_window" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
                  expr("unix_micros(ts)").as("us"))
        val firstView = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("us")).as("view_us"))
        val conv = ev.filter(col("event_type") === "click")
          .join(firstView, "user_id")
          .filter(col("us") > col("view_us") &&
                  col("us") <= col("view_us") + 3600000000L)
          .groupBy("user_id").agg(min(col("us")).as("click_us"))
        firstView.join(conv, Seq("user_id"), "left")
          .select(col("user_id"), col("view_us"),
                  when(col("click_us").isNotNull, 1L).otherwise(0L).as("converted"),
                  (col("click_us") - col("view_us")).as("delay_us"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |              CAST(epoch_us(ts) AS BIGINT) AS us
             |            FROM events),
             |fv AS (SELECT user_id, min(us) AS view_us FROM ev
             |       WHERE event_type = 'view' GROUP BY user_id),
             |conv AS (SELECT ev.user_id, min(us) AS click_us
             |         FROM ev JOIN fv USING (user_id)
             |         WHERE event_type = 'click'
             |           AND us > view_us AND us <= view_us + 3600000000
             |         GROUP BY ev.user_id)
             |SELECT fv.user_id, view_us,
             |       CAST(CASE WHEN click_us IS NOT NULL THEN 1 ELSE 0 END
             |            AS BIGINT) AS converted,
             |       click_us - view_us AS delay_us
             |FROM fv LEFT JOIN conv USING (user_id)
             |ORDER BY fv.user_id""".stripMargin)),

    // Decision-stump split search: the $50-step threshold on event value
    // minimizing weighted Gini impurity of the is-click classification.
    // Class counts bucket once (one shuffle, ≤20 spine rows), cumulative
    // sums walk the threshold spine, and the impurity is one terminal
    // float per candidate — argmin tie-breaks on the smaller threshold.
    "agg_best_split_gini" -> Decl(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .select(least(expr("CAST(round(value * 100) AS BIGINT) div 5000"), lit(19L))
                    .as("b"),
                  when(col("event_type") === "click", 1L).otherwise(0L).as("y"))
          .groupBy("b").agg(count(lit(1)).as("n"), sum(col("y")).as("k"))
        val w = Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = ev.agg(sum("n").as("nt"), sum("k").as("kt"))
        val cands = ev
          .select(col("b"), sum(col("n")).over(w).as("nl"), sum(col("k")).over(w).as("kl"))
          .join(broadcast(tot))
          .filter(col("nl") < col("nt")) // a split must leave both sides non-empty
          .select(((col("b") + 1) * 5000L).as("t_cents"), col("nl"), col("kl"),
                  col("nt"), col("kt"))
        val gini = cands.withColumn("impurity",
          round((col("nl").cast("double") / col("nt"))
                  * (lit(1.0d)
                     - pow(col("kl").cast("double") / col("nl"), 2)
                     - pow((col("nl") - col("kl")).cast("double") / col("nl"), 2))
                + ((col("nt") - col("nl")).cast("double") / col("nt"))
                  * (lit(1.0d)
                     - pow((col("kt") - col("kl")).cast("double") / (col("nt") - col("nl")), 2)
                     - pow(((col("nt") - col("nl")) - (col("kt") - col("kl"))).cast("double")
                           / (col("nt") - col("nl")), 2)), 6))
        val best = Window.orderBy(col("impurity"), col("t_cents"))
        gini.withColumn("rk", row_number().over(best))
          .filter(col("rk") === 1)
          .select(col("t_cents"), col("nl"), col("kl"), col("impurity"))
      },
      Some("""WITH ev AS (SELECT least(CAST(round(value * 100) AS BIGINT) // 5000, 19) AS b,
             |              CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
             |            FROM events),
             |buckets AS (SELECT b, count(*) AS n, sum(y) AS k FROM ev GROUP BY b),
             |cum AS (SELECT b,
             |          sum(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS nl,
             |          sum(k) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS kl,
             |          sum(n) OVER () AS nt, sum(k) OVER () AS kt
             |        FROM buckets),
             |gini AS (SELECT (b + 1) * 5000 AS t_cents, nl, kl,
             |           round((CAST(nl AS DOUBLE) / nt)
             |                   * (1.0 - pow(CAST(kl AS DOUBLE) / nl, 2)
             |                          - pow(CAST(nl - kl AS DOUBLE) / nl, 2))
             |                 + (CAST(nt - nl AS DOUBLE) / nt)
             |                   * (1.0 - pow(CAST(kt - kl AS DOUBLE) / (nt - nl), 2)
             |                          - pow(CAST((nt - nl) - (kt - kl) AS DOUBLE)
             |                                / (nt - nl), 2)), 6) AS impurity
             |         FROM cum WHERE nl < nt)
             |SELECT CAST(t_cents AS BIGINT) AS t_cents, CAST(nl AS BIGINT) AS nl,
             |       CAST(kl AS BIGINT) AS kl, impurity
             |FROM gini ORDER BY impurity, t_cents LIMIT 1""".stripMargin)),

    // User-agent mint-and-parse: a deterministic synthetic UA string per
    // order, re-parsed into browser family, major version, and OS token
    // with RE2-safe regexes — the log-sessionization scalar family.
    // Pure per-row string work riding the scan.
    "scalar_useragent_parse" -> Decl(
      (s, d) => {
        Tables(s, d, "orders")
          .select(col("o_orderkey"),
                  concat(lit("Mozilla/5.0 ("),
                         element_at(expr("array('Windows NT 10.0', 'Macintosh', 'X11; Linux x86_64')"),
                                    (col("o_orderkey") % 3L + 1L).cast("int")),
                         lit(") "),
                         element_at(expr("array('Chrome', 'Firefox', 'Safari', 'Edge')"),
                                    (col("o_orderkey") % 4L + 1L).cast("int")),
                         lit("/"), (col("o_orderkey") % 40L + 80L).cast("string"),
                         lit("."), (col("o_orderkey") % 10L).cast("string"),
                         lit(".0")).as("ua"))
          .select(col("o_orderkey"), col("ua"),
                  regexp_extract(col("ua"), "(Chrome|Firefox|Safari|Edge)/([0-9]+)", 1)
                    .as("browser"),
                  regexp_extract(col("ua"), "(Chrome|Firefox|Safari|Edge)/([0-9]+)", 2)
                    .cast("bigint").as("major"),
                  regexp_extract(col("ua"), "\\(([^)]+)\\)", 1).as("os"))
          .orderBy("o_orderkey")
      },
      Some("""WITH ua AS (
             |  SELECT o_orderkey,
             |    'Mozilla/5.0 (' ||
             |    (['Windows NT 10.0', 'Macintosh', 'X11; Linux x86_64'])[CAST(o_orderkey % 3 + 1 AS INT)] ||
             |    ') ' ||
             |    (['Chrome', 'Firefox', 'Safari', 'Edge'])[CAST(o_orderkey % 4 + 1 AS INT)] ||
             |    '/' || CAST(o_orderkey % 40 + 80 AS VARCHAR) ||
             |    '.' || CAST(o_orderkey % 10 AS VARCHAR) || '.0' AS ua
             |  FROM orders)
             |SELECT o_orderkey, ua,
             |       regexp_extract(ua, '(Chrome|Firefox|Safari|Edge)/([0-9]+)', 1) AS browser,
             |       CAST(regexp_extract(ua, '(Chrome|Firefox|Safari|Edge)/([0-9]+)', 2)
             |            AS BIGINT) AS major,
             |       regexp_extract(ua, '\(([^)]+)\)', 1) AS os
             |FROM ua ORDER BY o_orderkey""".stripMargin))
  )
}

// ——— formerly Round10gg.scala ———
/** Round-10 thirty-third wave: symmetric top/bottom-k extremes on the
  * native bounded-heap operator (no low-cardinality window funnel).
  */
object Round10gg {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.functions._


  val decls: Map[String, Decl] = Map(
    // Top-3 and bottom-3 customers by balance per market segment — the
    // classic extremes report, but scale-safe: BOTH ends run on the
    // native TopKPerKey bounded heaps (segment is a 5-value key, so a
    // ranking window would funnel ~1/5 of the corpus through one task;
    // the heaps never materialize more than k rows per key). Bottom-end
    // tie-break mirrors the reversed order exactly in the oracle.
    "window_top_bottom_k" -> Decl(
      (s, d) => {
        val base = Tables(s, d, "customer")
          .select(col("c_mktsegment"), col("c_custkey"),
                  round(col("c_acctbal") * 100).cast("bigint").as("cents"))
        val top = graft.plans.TopK.perKey(base, Seq("c_mktsegment"),
            Seq("cents" -> true, "c_custkey" -> false), 3)
          .withColumn("side", lit("top"))
        val bottom = graft.plans.TopK.perKey(base, Seq("c_mktsegment"),
            Seq("cents" -> false, "c_custkey" -> true), 3)
          .withColumn("side", lit("bottom"))
        top.unionAll(bottom)
          .select("c_mktsegment", "side", "c_custkey", "cents")
          .orderBy("c_mktsegment", "side", "c_custkey")
      },
      Some("""WITH s AS (SELECT c_mktsegment, c_custkey,
             |             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
             |           FROM customer),
             |r AS (SELECT c_mktsegment, c_custkey, cents,
             |        row_number() OVER (PARTITION BY c_mktsegment
             |          ORDER BY cents DESC, c_custkey ASC) AS rt,
             |        row_number() OVER (PARTITION BY c_mktsegment
             |          ORDER BY cents ASC, c_custkey DESC) AS rb
             |      FROM s)
             |SELECT c_mktsegment, side, c_custkey, cents FROM (
             |  SELECT c_mktsegment, 'top' AS side, c_custkey, cents
             |  FROM r WHERE rt <= 3
             |  UNION ALL
             |  SELECT c_mktsegment, 'bottom' AS side, c_custkey, cents
             |  FROM r WHERE rb <= 3)
             |ORDER BY c_mktsegment, side, c_custkey""".stripMargin))
  )
}

// ——— formerly Round10kk.scala ———
/** Round-10 wave 41: perceptual-hash near-duplicate detection over the
  * OPAQUE BINARY column — the multimodal twin of `dedup_simhash`. The
  * pipeline is the real production shape: binary payload → partition-
  * batched stub decode (a real system hands each batch to an image
  * decoder and thresholds an 8×8 DCT grid; the deterministic stand-in
  * thresholds a 64-point sample grid of the decoded content at its
  * mean) → per-band 16-bit signatures → banded LSH self-join →
  * exact-hamming verify.
  *
  * Pigeonhole completeness: 4 bands, radius 3 — any pair within
  * hamming ≤ 3 differs in at most 3 bands, so at least one band
  * matches and the LSH candidate set provably contains every true
  * pair. Hot buckets (band values shared by > MaxBucket docs) are
  * excluded on BOTH sides — the oracle mirrors the exclusion, so the
  * hash-match pins the exact degraded-completeness contract a scaled
  * deployment would run.
  *
  * Scale shape: signatures are one linear scan (no shuffle); the LSH
  * join shuffles on (band, value) buckets whose occupancy the cap
  * bounds, so pairs-per-doc is O(MaxBucket), never O(N). All
  * signature arithmetic is small exact integers — band values < 2^16,
  * hamming ≤ 64 — so no engine can disagree.
  */
object Round10kk {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.functions._


  private val MaxBucket = 256
  private val MinPoints = 64

  val decls: Map[String, Decl] = Map(
    "multimodal_phash_dedup" -> Decl(
      (s, d) => {
        val sp = s; import sp.implicits._
        // near-dup test-bed (the dedup-family pattern): corpus ∪
        // perceptually-perturbed copies at +1M — a length-preserving
        // local change (uppercased 5-char prefix), the text stand-in for
        // "same image, slightly different pixels". ~85% of planted pairs
        // land inside the hamming≤3 contract; the rest are legitimately
        // outside it (same shape as dedup_simhash's 350/500 bound).
        val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
        val pert = docs.select((col("doc_id") + 1000000L).as("doc_id"),
          expr("concat(upper(substring(text, 1, 5)), substring(text, 6, length(text)))").as("text"))
        // the opaque binary column (same minting as multimodal_binary_meta)
        val bin = docs.unionAll(pert)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        val sig = bin.as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.flatMap { case (id, payload) =>
              // STUB decode: a real implementation decodes pixels; the
              // stand-in decodes the bytes back to text. Everything after
              // this line is the real pHash shape.
              val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
              val len = text.codePointCount(0, text.length)
              if (len < MinPoints) Iterator.empty
              else {
                val pts = Array.tabulate(64) { i =>
                  val p = (i.toLong * len / 64).toInt
                  text.codePointAt(text.offsetByCodePoints(0, p)).toLong
                }
                val total = pts.sum
                // bit i = sampled point above the grid mean (exact integer
                // cross-multiply — no division, no float)
                val bands = Array.tabulate(4) { b =>
                  var v = 0L
                  for (i <- 0 until 16)
                    if (pts(b * 16 + i) * 64 >= total) v |= (1L << i)
                  v
                }
                Iterator((id, bands(0), bands(1), bands(2), bands(3)))
              }
            }
          }
          .toDF("doc_id", "b0", "b1", "b2", "b3")
          .localCheckpoint(true)
        val long = sig.selectExpr("doc_id",
          "explode(array(struct(0 AS b, b0 AS v), struct(1 AS b, b1 AS v), " +
            "struct(2 AS b, b2 AS v), struct(3 AS b, b3 AS v))) AS e")
          .select(col("doc_id"), col("e.b"), col("e.v"))
        val cold = long.groupBy("b", "v").agg(count(lit(1)).as("n"))
          .filter(col("n") <= MaxBucket).select("b", "v")
        val inBucket = long.join(cold, Seq("b", "v"))
        val cand = inBucket.as("x")
          .join(inBucket.as("y"),
                col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
                  col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct()
        val ham = (0 to 3).map(i =>
          expr(s"bit_count(sa.b$i ^ sb.b$i)")).reduce(_ + _)
        cand
          .join(sig.as("sa"), col("a") === col("sa.doc_id"))
          .join(sig.as("sb"), col("b") === col("sb.doc_id"))
          .select(col("a"), col("b"), ham.cast("int").as("hamming"))
          .filter(col("hamming") <= 3)
          .orderBy("a", "b")
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000, upper(substr(text, 1, 5)) || substr(text, 6)
             |  FROM documents),
             |sig AS (
             |  SELECT doc_id,
             |         list_transform(range(0, 4), b ->
             |           list_sum(list_transform(range(0, 16), i ->
             |             CASE WHEN pts[b * 16 + i + 1] * 64 >= total
             |                  THEN 2 ** i ELSE 0 END))) AS bands
             |  FROM (
             |    SELECT doc_id, pts, CAST(list_sum(pts) AS BIGINT) AS total
             |    FROM (
             |      SELECT doc_id,
             |             list_transform(range(0, 64), i ->
             |               CAST(unicode(substr(text,
             |                 CAST(1 + i * length(text) // 64 AS INT), 1)) AS BIGINT)) AS pts
             |      FROM corpus WHERE length(text) >= $MinPoints))),
             |longs AS (
             |  SELECT doc_id, b, CAST(bands[b + 1] AS BIGINT) AS v
             |  FROM sig, unnest(range(0, 4)) AS t(b)),
             |cold AS (SELECT b, v FROM longs GROUP BY b, v
             |         HAVING count(*) <= $MaxBucket),
             |ib AS (SELECT doc_id, longs.b, longs.v FROM longs JOIN cold USING (b, v)),
             |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             |         FROM ib x JOIN ib y
             |           ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
             |ham AS (
             |  SELECT cand.a, cand.b,
             |         CAST(bit_count(xor(CAST(sa.bands[1] AS BIGINT), CAST(sb.bands[1] AS BIGINT)))
             |            + bit_count(xor(CAST(sa.bands[2] AS BIGINT), CAST(sb.bands[2] AS BIGINT)))
             |            + bit_count(xor(CAST(sa.bands[3] AS BIGINT), CAST(sb.bands[3] AS BIGINT)))
             |            + bit_count(xor(CAST(sa.bands[4] AS BIGINT), CAST(sb.bands[4] AS BIGINT)))
             |           AS INT) AS hamming
             |  FROM cand JOIN sig sa ON cand.a = sa.doc_id
             |            JOIN sig sb ON cand.b = sb.doc_id)
             |SELECT a, b, hamming FROM ham WHERE hamming <= 3
             |ORDER BY a, b""".stripMargin))
  )
}

// ——— formerly Round10r.scala ———
/** Round-10 eighteenth wave: SCD type-1 latest attributes, linear-weighted
  * moving averages in exact integers, and the named-WINDOW SQL surface.
  */
object Round10r {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._


  val decls: Map[String, Decl] = Map(
    // SCD type 1: each customer's CURRENT attributes from their latest
    // order (latest by date, orderkey tie-break) — the overwrite-history
    // dimension refresh. One row_number over the per-customer history.
    "scd1_latest_attrs" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        Tables(s, d, "orders")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
                  col("o_orderdate").cast("date").as("latest_date"),
                  col("o_orderstatus").as("cur_status"),
                  col("o_orderpriority").as("cur_priority"),
                  round(col("o_totalprice") * 100).cast("bigint").as("cur_cents"))
          .orderBy("o_custkey")
      },
      Some("""WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate,
             |             o_orderstatus, o_orderpriority, o_totalprice,
             |             row_number() OVER (PARTITION BY o_custkey
             |               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
             |           FROM orders)
             |SELECT o_custkey, o_orderkey AS latest_orderkey,
             |       CAST(o_orderdate AS DATE) AS latest_date,
             |       o_orderstatus AS cur_status,
             |       o_orderpriority AS cur_priority,
             |       CAST(round(o_totalprice * 100) AS BIGINT) AS cur_cents
             |FROM r WHERE rk = 1 ORDER BY o_custkey""".stripMargin)),

    // Linear-weighted moving average over the trailing 10 events: weights
    // 1..10 by recency, numerator and denominator EXACT BIGINTs via an
    // indexed fold over the frame-ordered collected window (both engines
    // materialize the frame in ORDER BY order), one terminal division.
    "window_weighted_ma" -> Decl(
      (s, d) => {
        val f = Window.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(-9, 0)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  expr("unix_micros(ts)").as("us"),
                  round(col("value") * 100).cast("bigint").as("x"))
          .withColumn("xs", collect_list(col("x")).over(f))
          .select(col("user_id"), col("event_id"),
                  expr("aggregate(zip_with(xs, sequence(1L, size(xs)), (x, i) -> x * i), 0L, (a, v) -> a + v)")
                    .as("wnum"),
                  expr("size(xs) * (size(xs) + 1L) div 2").as("wden"))
          .select(col("user_id"), col("event_id"), col("wnum"), col("wden"),
                  round(col("wnum").cast("double") / col("wden"), 6).as("wma"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |             CAST(epoch_us(ts) AS BIGINT) AS us,
             |             CAST(round(value * 100) AS BIGINT) AS x
             |           FROM events),
             |c AS (SELECT user_id, event_id,
             |        list(x) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS xs
             |      FROM e),
             |w AS (SELECT user_id, event_id,
             |        list_sum(list_transform(generate_series(1, len(xs)),
             |                                i -> xs[i] * i)) AS wnum,
             |        len(xs) * (len(xs) + 1) // 2 AS wden
             |      FROM c)
             |SELECT user_id, event_id, CAST(wnum AS BIGINT) AS wnum,
             |       CAST(wden AS BIGINT) AS wden,
             |       round(CAST(wnum AS DOUBLE) / wden, 6) AS wma
             |FROM w ORDER BY user_id, event_id""".stripMargin)),

    // Named WINDOW clause: one window specification shared by four
    // analytic functions — the SQL surface that keeps complex analytic
    // SELECTs readable (and lets the planner share one sort).
    "sql_named_window" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT o_custkey, o_orderkey,
                |       CAST(row_number() OVER w AS BIGINT) AS seq,
                |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                |            OVER wc AS BIGINT) AS run_cents,
                |       CAST(lag(o_orderkey) OVER w AS BIGINT) AS prev_key
                |FROM orders
                |WINDOW w AS (PARTITION BY o_custkey
                |             ORDER BY o_orderdate, o_orderkey),
                |       wc AS (PARTITION BY o_custkey
                |              ORDER BY o_orderdate, o_orderkey
                |              ROWS UNBOUNDED PRECEDING)
                |ORDER BY o_custkey, o_orderkey""".stripMargin)
      },
      Some("""SELECT o_custkey, o_orderkey,
             |       CAST(row_number() OVER w AS BIGINT) AS seq,
             |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |            OVER wc AS BIGINT) AS run_cents,
             |       CAST(lag(o_orderkey) OVER w AS BIGINT) AS prev_key
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey),
             |       wc AS (PARTITION BY o_custkey
             |              ORDER BY o_orderdate, o_orderkey
             |              ROWS UNBOUNDED PRECEDING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin))
  )
}

// ——— formerly Round10u.scala ———
/** Round-10 twenty-first wave: robust smoothing and serial-correlation
  * diagnostics, both fully exact until one terminal division.
  */
object Round10u {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._


  val decls: Map[String, Decl] = Map(
    // Tukey median-of-three smoother over each user's value stream: the
    // robust pre-filter that kills single-sample spikes before any
    // model sees them. median(a,b,c) = a+b+c − max − min stays in exact
    // integer cents; endpoints pass through unsmoothed.
    "window_median3_smooth" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  expr("unix_micros(ts)").as("us"),
                  round(col("value") * 100).cast("bigint").as("x"))
          .withColumn("p", lag(col("x"), 1).over(w))
          .withColumn("nx", lead(col("x"), 1).over(w))
        ev.select(col("user_id"), col("event_id"), col("x"),
                  when(col("p").isNull || col("nx").isNull, col("x"))
                    .otherwise(col("p") + col("x") + col("nx")
                      - greatest(col("p"), col("x"), col("nx"))
                      - least(col("p"), col("x"), col("nx"))).as("x_smooth"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |             CAST(epoch_us(ts) AS BIGINT) AS us,
             |             CAST(round(value * 100) AS BIGINT) AS x
             |           FROM events),
             |n AS (SELECT user_id, event_id, x,
             |        lag(x) OVER w AS p, lead(x) OVER w AS nx
             |      FROM e
             |      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
             |SELECT user_id, event_id, x,
             |       CAST(CASE WHEN p IS NULL OR nx IS NULL THEN x
             |                 ELSE p + x + nx - greatest(p, x, nx)
             |                      - least(p, x, nx) END AS BIGINT) AS x_smooth
             |FROM n ORDER BY user_id, event_id""".stripMargin)),

    // Durbin–Watson serial-correlation statistic of the hourly count
    // series per event type. The mean-centering stays EXACT by the
    // scale-cancelling transform y_t = n·c_t − S (integers): DW =
    // Σ(y_t − y_{t−1})² / Σy_t² is invariant to the n scaling, so no
    // float enters before the one terminal division. DW ≈ 2 means no
    // serial correlation; < 2 positive.
    "ts_durbin_watson" -> Decl(
      (s, d) => {
        val spine = Tables.events(s, d)
          .groupBy(col("event_type"),
                   expr("unix_micros(ts) div 3600000000L").as("hr"))
          .agg(count(lit(1)).as("c"))
        val tot = spine.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("ss"))
        val w = Window.partitionBy("event_type").orderBy("hr")
        spine.join(broadcast(tot), "event_type")
          .withColumn("y", col("n") * col("c") - col("ss"))
          .withColumn("py", lag(col("y"), 1).over(w))
          .groupBy("event_type")
          .agg(max(col("n")).as("n_hours"),
               sum(when(col("py").isNotNull,
                        (col("y") - col("py")) * (col("y") - col("py")))
                 .otherwise(0L)).as("num"),
               sum(col("y") * col("y")).as("den"))
          .select(col("event_type"), col("n_hours"), col("num"), col("den"),
                  round(col("num").cast("double") / col("den"), 6).as("dw"))
          .orderBy("event_type")
      },
      Some("""WITH spine AS (
             |  SELECT event_type,
             |         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
             |         count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |tot AS (SELECT event_type, count(*) AS n, sum(c) AS ss
             |        FROM spine GROUP BY event_type),
             |y AS (SELECT spine.event_type, hr, n, n * c - ss AS y
             |      FROM spine JOIN tot USING (event_type)),
             |l AS (SELECT event_type, n, y,
             |        lag(y) OVER (PARTITION BY event_type ORDER BY hr) AS py
             |      FROM y)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n_hours,
             |       CAST(sum(CASE WHEN py IS NOT NULL
             |                     THEN (y - py) * (y - py) ELSE 0 END) AS BIGINT)
             |         AS num,
             |       CAST(sum(y * y) AS BIGINT) AS den,
             |       round(CAST(sum(CASE WHEN py IS NOT NULL
             |                           THEN (y - py) * (y - py) ELSE 0 END)
             |                  AS DOUBLE) / sum(y * y), 6) AS dw
             |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}

// ——— formerly Round11h.scala ———
/** Round-10 wave 64: streaming cardinality (sliding-window HLL distinct
  * users — the dashboard number exact distinct can't provide without
  * unbounded state) and the table-statistics surface (ANALYZE TABLE →
  * catalog statistics → the optimizer's cost model).
  *
  * Scale shape: the HLL window state is a few KB per open window and
  * merges associatively across partitions and micro-batches; ANALYZE is
  * one scan per table and the stats it writes are exactly what CBO's
  * join-reorder reads at planning time.
  */
object Round11h {
  import graft.{Decl, Tables}
  import graft.streaming.StreamOps
  import org.apache.spark.sql.functions._


  val decls: Map[String, Decl] = Map(
    // Sliding distinct-users estimate. Oracle-N (sketch class: DuckDB's
    // approx_count_distinct runs a different sketch, so cross-engine
    // hash equality is impossible BY DESIGN); Round11hSpec pins
    // stream==batch sketch equality over MemoryStream and the ±5% error
    // bound against exact distinct per window.
    "stream_sliding_distinct" -> Decl(
      (s, d) => StreamOps.slidingDistinct(Tables.events(s, d))
        .orderBy("wstart"),
      None),

    // ANALYZE TABLE ... COMPUTE STATISTICS: persist three fixture slices
    // as catalog tables, analyze them, and read the ROW COUNTS back from
    // the catalog statistics (not from the data — the query's scan-free
    // path). The oracle recomputes the same counts from the base tables:
    // equality proves ANALYZE counted exactly. sizeInBytes/CBO wiring is
    // asserted in Round11hSpec.
    "sink_analyze_table_stats" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_stats")
        val tag = dir.getFileName.toString.filter(_.isDigit)
        val specs = Seq(
          ("region", s"stat_region_$tag"),
          ("nation", s"stat_nation_$tag"),
          ("supplier", s"stat_supplier_$tag"))
        val rows = specs.map { case (src, t) =>
          Tables(s, d, src).write.mode("overwrite")
            .option("path", dir.resolve(t).toString).saveAsTable(t)
          s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
          // the catalog is where ANALYZE persists; plan-level rowCount
          // additionally needs spark.sql.cbo.enabled (spec covers that)
          val meta = s.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(t))
          val n = meta.stats.flatMap(_.rowCount).map(_.longValue)
            .getOrElse(sys.error(s"ANALYZE left no rowCount for $t"))
          (src, n)
        }
        import s.implicits._
        rows.toDF("table_name", "analyzed_rows").orderBy("table_name")
      },
      Some("""SELECT table_name, CAST(n AS BIGINT) AS analyzed_rows FROM (
             |  SELECT 'region' AS table_name, count(*) AS n FROM region
             |  UNION ALL
             |  SELECT 'nation', count(*) FROM nation
             |  UNION ALL
             |  SELECT 'supplier', count(*) FROM supplier)
             |ORDER BY table_name""".stripMargin))
  )
}

// ——— formerly Round7.scala ———
/** Round-7 additions: real subword tokenization, C4-style cross-document
  * span dedup, the scan-parallel (broadcast-threshold) formulation of
  * low-cardinality window analytics, and dangling-mass PageRank. */
object Round7 {
  import graft.{Decl, Tables}
  import graft.functions.BpeOps
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._


  /** DuckDB oracle for graph_pagerank_dangling: the same 10 iterations
    * unrolled as chained CTEs, each computing the dangling mass of the
    * previous rank vector and redistributing it uniformly. Nodes with
    * doc_id % 4 = 0 have NO out-edges by construction, so unlike
    * graph_pagerank's bijective graph the dangling term is load-bearing:
    * without it 0.85·dm of rank mass leaks per iteration and the
    * mass-conservation assertion fails.
    */
  private def pagerankDanglingOracleSql: String = {
    val b = new StringBuilder(
      """WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n, count(*) AS ni FROM documents),
        |e AS (SELECT doc_id AS src, 1 + doc_id % 2 AS outdeg,
        |             (doc_id * 3 + t.k) % nn.ni AS dst
        |      FROM documents CROSS JOIN nn, (VALUES (1), (2)) t(k)
        |      WHERE doc_id % 4 <> 0 AND t.k <= 1 + doc_id % 2),
        |pr0 AS (SELECT doc_id, 1.0/nn.n AS r FROM documents CROSS JOIN nn)""".stripMargin)
    (1 to 10).foreach { i =>
      b.append(s""",
        |d$i AS (SELECT sum(r) AS dm FROM pr${i - 1} WHERE doc_id % 4 = 0),
        |pr$i AS (SELECT nd.doc_id,
        |             0.15/(SELECT n FROM nn)
        |               + 0.85 * (coalesce(s.acc, 0) + d$i.dm/(SELECT n FROM nn)) AS r
        |         FROM documents nd
        |         LEFT JOIN (SELECT e.dst, sum(p.r / e.outdeg) AS acc
        |                    FROM pr${i - 1} p JOIN e ON p.doc_id = e.src
        |                    GROUP BY e.dst) s ON nd.doc_id = s.dst
        |         CROSS JOIN d$i)""".stripMargin)
    }
    b.append("""
      |SELECT pr10.doc_id AS doc_id, round(pr10.r * nn.n, 6) AS rank_norm
      |FROM pr10 CROSS JOIN nn ORDER BY doc_id""".stripMargin)
    b.toString
  }

  val decls: Map[String, Decl] = Map(
    // PageRank with DANGLING-NODE mass redistribution — graph_pagerank on
    // an arbitrary edge table. The §2 key's constructed graph guarantees
    // every node an out-edge, so it never exercises the term real link
    // graphs hit immediately (a crawl frontier is FULL of pages with no
    // outlinks yet); here 25% of nodes are sinks and each iteration
    // gathers their rank with one tiny aggregate (a 1-row broadcast, the
    // decontaminate/threshold pattern) and folds it into the teleport
    // floor. Same scale shape as graph_pagerank: edges derived once,
    // hash-partitioned on src, persisted; one dst-keyed shuffle per
    // iteration; rank state checkpointed at the loop midpoint. The
    // no-in-link case is covered too (nodes re-enter via LEFT join from
    // the node table, not from the edge aggregate).
    "graph_pagerank_dangling" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents").select(col("doc_id"))
        val nRows = Tables.rowCount(s, d, "documents")
        val n = nRows.toDouble
        val nodes = docs.select(col("doc_id").as("nid"))
        val e = docs
          .filter(pmod(col("doc_id"), lit(4L)) =!= 0)
          .select(col("doc_id").as("src"),
                  (lit(1L) + pmod(col("doc_id"), lit(2L))).cast("double").as("outdeg"))
          .select(col("src"), col("outdeg"),
                  explode(sequence(lit(1), (lit(1L) + pmod(col("src"), lit(2L))).cast("int")))
                    .as("k"))
          .select(col("src"), col("outdeg"),
                  pmod(col("src") * 3 + col("k"), lit(nRows)).as("dst"))
          .repartition(s.sparkContext.defaultParallelism, col("src"))
          .persist()
        var pr = docs.select(col("doc_id"), lit(1.0 / n).as("r"))
        (1 to 10).foreach { i =>
          val dm = pr.filter(pmod(col("doc_id"), lit(4L)) === 0)
            .agg(sum(col("r")).as("dm"))
          val inl = pr.join(e, pr("doc_id") === e("src"))
            .groupBy(col("dst"))
            .agg(sum(col("r") / col("outdeg")).as("acc"))
          val prev = pr
          // Unlike graph_pagerank, each step reads pr TWICE (dangling
          // aggregate + in-link propagation), so untruncated lineage
          // DOUBLES per iteration — a mid-loop checkpoint still left
          // 16 MiB task binaries by iteration 10. Truncate every step
          // (the rank state is one row per node, KBs at bench scale) and
          // drop the superseded generation's storage once the new one is
          // materialized.
          pr = nodes.join(inl, col("nid") === col("dst"), "left")
            .crossJoin(broadcast(dm))
            .select(col("nid").as("doc_id"),
                    (lit(0.15 / n) + lit(0.85) *
                      (coalesce(col("acc"), lit(0.0)) + col("dm") / n)).as("r"))
            .localCheckpoint()
          if (i > 1) prev.unpersist()
        }
        // every generation is materialized, so the edges are dead weight
        e.unpersist()
        pr.select(col("doc_id"), round(col("r") * n, 6).as("rank_norm"))
          .orderBy("doc_id")
      },
      Some(pagerankDanglingOracleSql)),

    // C4-style cross-document span dedup — the repeated-span removal pass
    // (C4 deduped exact three-sentence spans corpus-wide) that complements
    // the whole-document dedup family: per doc, how many of its
    // non-overlapping 16-token spans also appear VERBATIM in another
    // document. Spans hash to md5 inside the row (text never shuffles);
    // one hash-keyed shuffle counts span occurrences, and "shared with
    // another doc" is the exact min(doc)≠max(doc) probe — no
    // count-distinct expand. The per-doc totals reuse the doc_id
    // partitioning the explode inherits. The corpus's natural near-dups
    // make this live without planting (60 cross-doc spans at sf0.01).
    "dedup_span_cross" -> Decl(
      (s, d) => {
        val n = s.sparkContext.defaultParallelism
        val spans = Pipeline.docsWithTokens(s, d)
          .repartition(n, col("doc_id"))
          .select(col("doc_id"),
                  explode(expr(
                    """transform(sequence(0, greatest(size(toks) - 16, 0), 16),
                      |st -> CASE WHEN st + 16 <= size(toks)
                      |       THEN md5(concat_ws(' ', slice(toks, st + 1, 16))) END)"""
                      .stripMargin)).as("h"))
          .filter(col("h").isNotNull)
          .persist()
        // ONE h-keyed exchange feeds both the occurrence aggregate and the
        // semi-join probe side (reused exchange); the final per-doc join is
        // pinned shuffle_hash — both sides are corpus-sized row-per-doc
        // tables co-partitioned on doc_id, and a planner-chosen broadcast
        // of either is the unbounded-side OOM anti-pattern.
        val spansByH = spans.repartition(n, col("h"))
        val dup = spansByH
          .groupBy("h")
          .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
          .filter(col("mn") =!= col("mx"))
          .select("h")
        val totals = spans.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
        val dups = spansByH.join(dup.hint("shuffle_hash"), Seq("h"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("dup_spans"))
        // eager-materialize the small per-doc result, then release the big
        // exploded span cache — the dedup_containment discipline; without
        // it the persist leaks into the caller's session until clearCache
        val out = totals.join(dups.hint("shuffle_hash"), Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_spans"),
                  coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
                  round(coalesce(col("dup_spans"), lit(0L)).cast("double") /
                        col("n_spans"), 6).as("dup_frac"))
          .localCheckpoint(true)
        spans.unpersist()
        out.orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sp AS (SELECT doc_id, md5(array_to_string(t[st + 1 : st + 16], ' ')) AS h
             |       FROM (SELECT doc_id, t,
             |               unnest(generate_series(0, greatest(len(t) - 16, 0), 16)) AS st
             |             FROM tok)
             |       WHERE st + 16 <= len(t)),
             |dup AS (SELECT h FROM sp GROUP BY h HAVING min(doc_id) <> max(doc_id)),
             |tot AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY doc_id),
             |dd AS (SELECT doc_id, count(*) AS dup_spans
             |       FROM sp SEMI JOIN dup USING (h) GROUP BY doc_id)
             |SELECT doc_id, n_spans, coalesce(dup_spans, 0) AS dup_spans,
             |       round(CAST(coalesce(dup_spans, 0) AS DOUBLE) / n_spans, 6) AS dup_frac
             |FROM tot LEFT JOIN dd USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Shingle CONTAINMENT dedup — the asymmetric similarity Jaccard
    // misses: a short document wholly embedded in a longer one scores
    // n/min(sa,sb) ≈ 1 but a low Jaccard (the union is dominated by the
    // longer doc), and sub-document duplication is exactly what
    // quote-heavy / boilerplate corpora exhibit. Shares the df-capped
    // inverted-index intersection core with dedup_ngram_jaccard
    // (ngramIntersectionsLazy — one shingle-key exchange, pair space
    // bounded by the df ≤ 32 cap), so the only new work is the
    // containment finalizer. Both metrics over the SAME pair universe
    // keeps the two keys' oracles one CTE apart.
    "dedup_containment" -> Decl(
      (s, d) =>
        // Round-12: the intersection core comes from the SHARED
        // ShingleIndex (one build per session serves this key,
        // dedup_ngram_jaccard, and dedup_connected_components); the τ cut
        // runs on the raw ratio first (round6(x) >= 0.8 ⇒ x >= 0.7999995 >
        // 0.7999) so the decimal round only touches survivors — pairs and
        // values bit-identical.
        ShingleIndex.intersections(s, d)
          .withColumn("rawc", col("n").cast("double") /
            least(col("sa"), col("sb")).cast("double"))
          .filter(col("rawc") >= 0.7999)
          .select(col("id_a"), col("id_b"), round(col("rawc"), 6).as("containment"))
          .filter(col("containment") >= 0.8)
          .orderBy("id_a", "id_b"),
      Some("""WITH tok AS (SELECT doc_id, lang, source, string_split(text, ' ') AS t FROM documents),
             |sh AS (SELECT DISTINCT doc_id, lang, source, g FROM (
             |  SELECT doc_id, lang, source,
             |         unnest(list_transform(generate_series(1, len(t) - 1),
             |                               i -> t[i] || ' ' || t[i + 1])) AS g
             |  FROM tok WHERE len(t) >= 2)),
             |df AS (SELECT lang, source, g, count(*) AS df
             |       FROM sh GROUP BY 1, 2, 3),
             |kept AS (SELECT sh.doc_id, sh.lang, sh.source, sh.g
             |         FROM sh JOIN df USING (lang, source, g) WHERE df <= 32),
             |sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
             |  FROM kept a JOIN kept b ON a.lang = b.lang AND a.source = b.source
             |                         AND a.g = b.g AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b,
             |       round(CAST(n AS DOUBLE) / least(sa.sz, sb.sz), 6) AS containment
             |FROM inter JOIN sizes sa ON sa.doc_id = id_a
             |           JOIN sizes sb ON sb.doc_id = id_b
             |WHERE round(CAST(n AS DOUBLE) / least(sa.sz, sb.sz), 6) >= 0.8
             |ORDER BY id_a, id_b""".stripMargin)),

    // Temperature-flattened domain resampling — the XLM-R/mT5 mixing rule
    // (sample domain i ∝ n_i^α, α<1 upweights low-resource domains)
    // next to mix_domain_rebalance's uniform-share special case. α=1/2
    // here, and the whole keep decision is INTEGER-exact across engines:
    // the weight is floor(sqrt(n_i)) — IEEE sqrt is correctly rounded,
    // so sqrt of an exact integer count is bit-identical everywhere —
    // and the keep test multiplies integers only (ticket·Z·n_i <
    // 1000·total·w_i), so there is no float boundary to disagree on, no
    // RNG, and re-running yields the same corpus (the property a
    // training-data pipeline needs for reproducible mixes). Oversampled
    // small domains cap at keep-all structurally (ticket ≤ 999). Scan
    // shape: per-domain stats are one tiny aggregate, broadcast back;
    // the decision rides the scan.
    "mix_temperature_sample" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents").select(col("doc_id"), col("lang"))
        val stats = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .withColumn("w", floor(sqrt(col("n_docs"))))
        val z = stats.agg(sum(col("w")).as("z"))
        val tot = docs.agg(count(lit(1)).as("total"))
        docs.join(broadcast(stats), "lang")
          .crossJoin(broadcast(z))
          .crossJoin(broadcast(tot))
          // (doc_id·2654435761) mod 1000 computed by congruence —
          // ((doc_id mod 1000)·761) mod 1000 is bit-identical and cannot
          // overflow, where the raw BIGINT product silently wraps in Spark
          // but raises in DuckDB once doc_id ≳ 3.4e9 (i.e. exactly at scale)
          .withColumn("ticket", pmod(pmod(col("doc_id"), lit(1000L)) * lit(761L), lit(1000L)))
          .filter(col("ticket") * col("z") * col("n_docs") <
                  lit(1000L) * col("total") * col("w"))
          .select(col("doc_id"), col("lang"), col("ticket"))
          .orderBy("doc_id")
      },
      Some("""WITH stats AS (SELECT lang, count(*) AS n_docs,
             |                      CAST(floor(sqrt(count(*))) AS BIGINT) AS w
             |               FROM documents GROUP BY lang),
             |z AS (SELECT sum(w) AS z FROM stats),
             |tot AS (SELECT count(*) AS total FROM documents)
             |SELECT doc_id, lang, ((doc_id % 1000) * 761) % 1000 AS ticket
             |FROM documents JOIN stats USING (lang) CROSS JOIN z CROSS JOIN tot
             |WHERE (((doc_id % 1000) * 761) % 1000) * z * n_docs < 1000 * total * w
             |ORDER BY doc_id""".stripMargin)),

    // The C4-style composite KEEP/DROP decision — the terminal step every
    // training-data pipeline runs: each document gets one verdict and the
    // FIRST triggering drop reason by fixed priority (duplicate > short >
    // repetitive > ok). Exact-dup canonicalization is the dedup_exact
    // family (md5 of normalized text, lowest id is canonical; noisy
    // planted copies make the signal live); short/repetitive are pure
    // per-row token stats. One hash-keyed shuffle total — the
    // canonical-id table is corpus-sized, so its join is pinned
    // shuffle_hash, and every other signal rides the scan.
    "pipeline_keep_decision" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
        val noisy = docs.filter(pmod(col("doc_id"), lit(10L)) === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"),
                  concat(upper(col("text")), lit("  ")).as("text"))
        val feats = docs.unionAll(noisy)
          .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"),
                  split(col("text"), " ").as("toks"))
          .select(col("doc_id"), col("h"), size(col("toks")).as("n_toks"),
                  (size(array_distinct(col("toks"))).cast("double") /
                   size(col("toks"))).as("ttr"))
        val canon = feats.groupBy("h").agg(min("doc_id").as("canon_id"))
        feats.join(canon.hint("shuffle_hash"), "h")
          .select(col("doc_id"),
                  when(col("doc_id") =!= col("canon_id"), "duplicate")
                    .when(col("n_toks") < 20, "short")
                    .when(col("ttr") < 0.35, "repetitive")
                    .otherwise("ok").as("reason"))
          .withColumn("keep", col("reason") === "ok")
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000, upper(text) || '  ' FROM documents
             |  WHERE doc_id % 10 = 3),
             |f AS (SELECT doc_id, md5(lower(trim(text))) AS h,
             |        len(string_split(text, ' ')) AS n_toks,
             |        CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             |          / len(string_split(text, ' ')) AS ttr
             |      FROM corpus),
             |canon AS (SELECT h, min(doc_id) AS canon_id FROM f GROUP BY h),
             |r AS (SELECT doc_id,
             |        CASE WHEN doc_id <> canon_id THEN 'duplicate'
             |             WHEN n_toks < 20 THEN 'short'
             |             WHEN ttr < 0.35 THEN 'repetitive'
             |             ELSE 'ok' END AS reason
             |      FROM f JOIN canon USING (h))
             |SELECT doc_id, reason, reason = 'ok' AS keep
             |FROM r ORDER BY doc_id""".stripMargin)),

    // As-of join WITH TOLERANCE — the variant every time-series asof API
    // exposes (pandas merge_asof's `tolerance`, kdb's wj): each purchase
    // takes the latest preceding click only if it is within 1 hour,
    // else NULL. Same scalable shape as join_asof (union + one ordered
    // window per user — never a per-row range probe); the tolerance is a
    // post-window comparison, so the plan is identical to the untoleranced
    // form. Oracle mirrors with a range-bounded LEFT JOIN + max().
    "join_asof_tolerance" -> Decl(
      (s, d) => {
        val e = Tables.events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(0).as("kind"),
                  col("ts").as("click_ts"), lit(null).cast("long").as("purchase_id"))
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("kind"),
                  lit(null).cast("timestamp").as("click_ts"),
                  col("event_id").as("purchase_id"))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.canon(
          clicks.unionAll(purch)
            .withColumn("lc", last("click_ts", ignoreNulls = true).over(w))
            .filter(col("kind") === 1)
            .select(col("purchase_id").as("event_id"), col("user_id"),
                    when(col("ts").cast("long") - col("lc").cast("long") <= 3600,
                         col("lc")).as("click_ts_1h")))
      },
      Some("""SELECT p.event_id, p.user_id, CAST(max(c.ts) AS TIMESTAMP) AS click_ts_1h
             |FROM events p LEFT JOIN events c
             |ON c.user_id = p.user_id AND c.event_type = 'click'
             |AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
             |AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL '1 hour'
             |WHERE p.event_type = 'purchase'
             |GROUP BY p.event_id, p.user_id ORDER BY ALL NULLS FIRST""".stripMargin)),

    // The scan-parallel twin of window_ntile_firstlast: per-segment
    // quartile assignment and extremes WITHOUT a window. The §2.5 key
    // declares the window semantics over a 5-value demo key (allowlisted
    // in ScaleSpec); this is the formulation that survives 100 TB — the
    // per-segment thresholds and extreme-struct minima are ONE tiny
    // aggregate row per segment, broadcast back, buckets assigned by
    // comparison at scan speed. Thresholds round to the 6-dp grid (the
    // text_perplexity_bucket rule: quantile-interpolation ulp noise on
    // tied inputs must not flip a comparison); extremes tie-break through
    // lexicographic struct min/max exactly like join_asof_nearest.
    "window_quartile_broadcast" -> Decl(
      (s, d) => {
        val c = Tables(s, d, "customer")
        val th = c.groupBy("c_mktsegment").agg(
          round(percentile(col("c_acctbal"), lit(0.25)), 6).as("q1"),
          round(percentile(col("c_acctbal"), lit(0.5)), 6).as("q2"),
          round(percentile(col("c_acctbal"), lit(0.75)), 6).as("q3"),
          min(struct(col("c_acctbal"), col("c_custkey")))
            .getField("c_custkey").as("poorest"),
          max(struct(col("c_acctbal"), col("c_custkey")))
            .getField("c_custkey").as("richest"))
        c.join(broadcast(th), "c_mktsegment")
          .select(col("c_custkey"), col("c_mktsegment"),
                  (lit(1) + when(col("c_acctbal") > col("q1"), 1).otherwise(0)
                          + when(col("c_acctbal") > col("q2"), 1).otherwise(0)
                          + when(col("c_acctbal") > col("q3"), 1).otherwise(0))
                    .as("quartile"),
                  col("poorest"), col("richest"))
          .orderBy("c_custkey")
      },
      Some("""WITH th AS (
             |  SELECT c_mktsegment,
             |         round(quantile_cont(c_acctbal, 0.25), 6) AS q1,
             |         round(quantile_cont(c_acctbal, 0.5), 6) AS q2,
             |         round(quantile_cont(c_acctbal, 0.75), 6) AS q3,
             |         (min({'b': c_acctbal, 'k': c_custkey})).k AS poorest,
             |         (max({'b': c_acctbal, 'k': c_custkey})).k AS richest
             |  FROM customer GROUP BY c_mktsegment)
             |SELECT c_custkey, c.c_mktsegment AS c_mktsegment,
             |       CAST(1 + CAST(c_acctbal > q1 AS INT) + CAST(c_acctbal > q2 AS INT)
             |              + CAST(c_acctbal > q3 AS INT) AS INT) AS quartile,
             |       poorest, richest
             |FROM customer c JOIN th ON c.c_mktsegment = th.c_mktsegment
             |ORDER BY c_custkey""".stripMargin)),
    // Real BPE token counting — the budget number of every training-data
    // pipeline (the regex run-length proxy in text_token_count is the
    // cheap approximation; this is the algorithm). Per-row native
    // expression (BpeTokenCount: ranked greedy merges, one compiled fold,
    // no shuffle — scan-speed like every sketch expression), with the
    // DuckDB oracle GENERATED from the same merge list: each rank-k merge
    // is one literal replace over paren-wrapped symbols, which reproduces
    // the left-to-right non-overlapping merge pass exactly, so the two
    // engines hash-match on the real algorithm rather than a proxy.
    // chars_per_token uses the word-chars only (whitespace carries no
    // subword), guarded against empty texts in both engines.
    "text_bpe_token_count" -> Decl(
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
                BpeOps.bpeTokenCount(col("text")).as("bpe_tokens"),
                size(filter(split(col("text"), " "), w => length(w) > 0))
                  .cast("int").as("ws_tokens"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |CAST(coalesce(list_sum(list_transform(
              |  list_filter(string_split(text, ' '), w -> len(w) > 0),
              |  w -> ${BpeOps.duckdbCountExpr("w")})), 0) AS INT) AS bpe_tokens,
              |CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS INT)
              |  AS ws_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)))
}

// ——— formerly Round8b.scala ———
/** Round-8 second wave: shuffle-free co-located bucketed join, two
  * rank/variance statistical tests on the exact integer-cents grid,
  * common-neighbor link prediction over the customer–part co-occurrence
  * graph, and a bit-exact dyadic EWMA window.
  */
object Round8b {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._


  /** Hot-part guardrail for the co-occurrence self-join: a part bought by
    * df customers contributes df² candidate pairs, so one viral part
    * (df = 10⁶ at corpus scale) would dominate the whole pair space.
    * Capping df bounds per-key fan-out at Cap² and total pairs at
    * Cap·|edges| — the MaxShingleDf discipline applied to co-purchase.
    * 40 BINDS on this fixture (max df 49–53), so the exclusion path is
    * oracle-exercised, not dead scale insurance.
    */
  private val MaxPartDf = PairIndex.MaxPartDf

  val decls: Map[String, Decl] = Map(
    // Co-located bucketed join — the canonical 100 TB shuffle eliminator:
    // both sides are written ONCE bucketed (and bucket-sorted) on the join
    // key, so every subsequent join on that key reads bucket i against
    // bucket i with ZERO exchange on either side — the repeated-join
    // workload (fact⋈dim every hour) pays the shuffle once at layout time
    // instead of per query. ScaleSpec pins the plan: the SortMergeJoin
    // subtree contains no ShuffleExchange. Table names are unique per
    // invocation (scratch sequence) so re-runs in one session never race;
    // the in-memory catalog entry dies with the session and the files with
    // the JVM (shared scratch shutdown hook).
    "join_bucketed_colocated" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_bktwh")
        val tag = dir.getFileName.toString.filter(_.isDigit)
        val ot = s"graft_bkt_orders_$tag"
        val ct = s"graft_bkt_customer_$tag"
        Tables(s, d, "orders")
          .write.format("parquet").mode("overwrite")
          .option("path", dir.resolve("orders").toString)
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable(ot)
        Tables(s, d, "customer")
          .write.format("parquet").mode("overwrite")
          .option("path", dir.resolve("customer").toString)
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable(ct)
        s.table(ot).hint("merge")
          .join(s.table(ct), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
               sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
          .orderBy("c_mktsegment")
      },
      // CAST the sum back to BIGINT: DuckDB's sum(BIGINT) yields HUGEINT,
      // which the driver's pandas bridge renders as float ("…e+10") and
      // hash-mismatches Spark's exact integer (round-8 advice).
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Mann–Whitney U (click vs error values) — the rank-sum companion to
    // agg_ks_test/agg_ttest_welch: nonparametric location shift with tie
    // handling. Midranks make U a half-integer, so both engines carry 2U
    // as an exact BIGINT: on the bounded distinct-cents grid, each value v
    // contributes c1(v)·(2·r2(v) − c2(v)) to 2U₁ (r2 = inclusive
    // cumulative count of the other sample — the same single window over
    // the grid KS uses), and 2U₁ + 2U₂ = 2n₁n₂ by construction. No float
    // enters until the one terminal halving, which is exact (.0/.5).
    "agg_mann_whitney" -> Decl(
      (s, d) => {
        val w = Window.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "error"))
          .select(round(col("value") * 100).cast("bigint").as("cents"),
                  col("event_type"))
        ev.groupBy("cents")
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
               sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("c2"))
          .select(col("c1"), col("c2"),
                  sum(col("c1")).over(w).as("r1"), sum(col("c2")).over(w).as("r2"))
          .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
               sum(col("c1") * (lit(2L) * col("r2") - col("c2"))).as("u1_x2"),
               sum(col("c2") * (lit(2L) * col("r1") - col("c1"))).as("u2_x2"))
          .select(col("n1"), col("n2"), col("u1_x2"), col("u2_x2"),
                  (col("u1_x2").cast("double") / 2.0).as("u1"))
      },
      Some("""WITH ev AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             |                   event_type
             |            FROM events WHERE event_type IN ('click', 'error')),
             |grid AS (SELECT cents,
             |           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
             |           sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS c2
             |         FROM ev GROUP BY cents),
             |r AS (SELECT c1, c2,
             |        sum(c1) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS r1,
             |        sum(c2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS r2
             |      FROM grid)
             |SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
             |       CAST(sum(c1 * (2 * r2 - c2)) AS BIGINT) AS u1_x2,
             |       CAST(sum(c2 * (2 * r1 - c1)) AS BIGINT) AS u2_x2,
             |       CAST(sum(c1 * (2 * r2 - c2)) AS DOUBLE) / 2.0 AS u1
             |FROM r""".stripMargin)),

    // One-way ANOVA F across all five event types — does mean value differ
    // by type? Per-group sufficient statistics (n, Σcents, Σcents²) are
    // exact BIGINTs (lossless partial aggregation at any scale, the
    // ttest_welch machinery widened to k groups); the bounded known group
    // set is pivoted to columns so the F formula is ONE fixed arithmetic
    // tree evaluated identically in both engines — never a float SUM over
    // rows whose order an engine could choose. Σsᵢ² stays in BIGINT
    // (≲1.4e18 at SF 1; the 100 TB variant would widen s to DECIMAL(38)
    // or carry group means, same plan shape).
    "agg_anova_f" -> Decl(
      (s, d) => {
        val types = Seq("click", "view", "purchase", "signup", "error")
        val st = Tables.events(s, d)
          .select(col("event_type"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
               sum(col("c") * col("c")).as("q"))
        val pivCols = types.zipWithIndex.flatMap { case (t, i) =>
          Seq(max(when(col("event_type") === t, col("n"))).as(s"n$i"),
              max(when(col("event_type") === t, col("s"))).as(s"s$i"),
              max(when(col("event_type") === t, col("q"))).as(s"q$i"))
        }
        val piv = st.agg(pivCols.head, pivCols.tail: _*)
        val bg = (0 until 5).map(i =>
          s"CAST(s$i * s$i AS DOUBLE) / n$i").mkString(" + ")
        piv.selectExpr(
            "n0 + n1 + n2 + n3 + n4 AS nn",
            "q0 + q1 + q2 + q3 + q4 AS qq",
            "s0 + s1 + s2 + s3 + s4 AS ss",
            s"$bg AS bg")
          .selectExpr(
            "nn AS n",
            "round(((bg - CAST(ss * ss AS DOUBLE) / nn) / 4) / " +
              "((qq - bg) / (nn - 5)), 6) AS f_stat")
      },
      Some {
        val types = Seq("click", "view", "purchase", "signup", "error")
        val piv = types.zipWithIndex.map { case (t, i) =>
          s"""max(CASE WHEN event_type = '$t' THEN n END) AS n$i,
             |max(CASE WHEN event_type = '$t' THEN s END) AS s$i,
             |max(CASE WHEN event_type = '$t' THEN q END) AS q$i""".stripMargin
        }.mkString(",\n")
        val bg = (0 until 5).map(i =>
          s"CAST(s$i * s$i AS DOUBLE) / n$i").mkString(" + ")
        s"""WITH st AS (SELECT event_type, count(*) AS n,
           |              sum(CAST(round(value * 100) AS BIGINT)) AS s,
           |              sum(CAST(round(value * 100) AS BIGINT) *
           |                  CAST(round(value * 100) AS BIGINT)) AS q
           |            FROM events GROUP BY event_type),
           |piv AS (SELECT
           |$piv
           |FROM st),
           |e AS (SELECT n0 + n1 + n2 + n3 + n4 AS nn,
           |             q0 + q1 + q2 + q3 + q4 AS qq,
           |             s0 + s1 + s2 + s3 + s4 AS ss,
           |             $bg AS bg
           |      FROM piv)
           |SELECT CAST(nn AS BIGINT) AS n,
           |       round(((bg - CAST(ss * ss AS DOUBLE) / nn) / 4) /
           |             ((qq - bg) / (nn - 5)), 6) AS f_stat
           |FROM e""".stripMargin
      }),

    // Common-neighbor link prediction over the customer–part co-purchase
    // graph: which customer pairs share the most distinct parts? The pair
    // generator is the part-keyed self-join of the deduped edge table —
    // fan-out bounded by MaxPartDf (df² pairs per part), total pair space
    // ≤ MaxPartDf·|edges| — then one (a, b) count and a bounded-heap
    // top-20 (TakeOrderedAndProject, never a global sort). Output stays
    // INTEGER (common, degrees over the SAME capped graph): a rounded
    // p/q Jaccard is exactly the repr-vs-scaled cross-engine round trap
    // (memory: round(avg) boundary), and the integers carry strictly more
    // information anyway.
    "graph_jaccard_neighbors" -> Decl(
      (s, d) => {
        // Pair counts and degrees come from the SHARED PairIndex (one
        // build per session serves this key and graph_adamic_adar —
        // round 11 ran the same capped pair exchange twice). The stored
        // table is pre-aggregated per pair (round-12: both consumers used
        // to re-group the 8.4M-row cell table), so this probe is a scan +
        // bounded top-20; deg is the stored per-customer distinct-part
        // degree over the same capped graph.
        val deg = PairIndex.deg(s, d)
        val pairs = PairIndex.pairs(s, d)
          .select("a", "b", "common")
          .orderBy(col("common").desc, col("a"), col("b"))
          .limit(20)
        // both degree lookups broadcast the 20-row top-k side (the second
        // join loses the size estimate after the first, and the planner
        // falls back to shuffling customer-cardinality deg against 20 rows)
        broadcast(broadcast(pairs)
            .join(deg.select(col("c").as("a"), col("deg").as("deg_a")), "a"))
          .join(deg.select(col("c").as("b"), col("deg").as("deg_b")), "b")
          .select(col("a"), col("b"), col("common"), col("deg_a"), col("deg_b"))
          .orderBy(col("common").desc, col("a"), col("b"))
      },
      Some(s"""WITH edges AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
             |               FROM orders JOIN lineitem
             |               ON o_orderkey = l_orderkey),
             |keep AS (SELECT p FROM edges GROUP BY p
             |         HAVING count(*) <= $MaxPartDf),
             |e AS (SELECT c, p FROM edges WHERE p IN (SELECT p FROM keep)),
             |deg AS (SELECT c, count(*) AS deg FROM e GROUP BY c),
             |pairs AS (SELECT x.c AS a, y.c AS b, count(*) AS common
             |          FROM e x JOIN e y ON x.p = y.p AND x.c < y.c
             |          GROUP BY x.c, y.c
             |          ORDER BY common DESC, a, b LIMIT 20)
             |SELECT a, b, common, da.deg AS deg_a, db.deg AS deg_b
             |FROM pairs JOIN deg da ON da.c = a JOIN deg db ON db.c = b
             |ORDER BY common DESC, a, b""".stripMargin)),

    // Gaps-and-islands: maximal runs of CONSECUTIVE active days per user
    // (streak detection — retention/engagement features). The classic
    // row_number trick: day − rank(day) is constant within a run, so one
    // distinct + one user-partitioned window + one groupBy find all
    // islands with no self-join (the naive "join day to day+1 and chase"
    // is O(run length) joins). Dates are carried as INTEGER day numbers
    // end to end: both engines truncate their native timestamp precision
    // (µs vs ns) to the same UTC day, and integer output is hash-safe
    // where date/interval encodings are not.
    "window_gap_islands" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("days")
        Tables.events(s, d)
          .select(col("user_id"),
                  datediff(col("ts").cast("date"), lit("1970-01-01")).as("days"))
          .distinct()
          .withColumn("grp", col("days") - row_number().over(w))
          .groupBy("user_id", "grp")
          .agg(min(col("days")).as("start_day"), max(col("days")).as("end_day"),
               count(lit(1)).as("len"))
          .select(col("user_id"), col("start_day"), col("end_day"), col("len"))
          .orderBy("user_id", "start_day")
      },
      Some("""WITH dd AS (SELECT DISTINCT user_id,
             |              CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
             |                AS days
             |            FROM events),
             |g AS (SELECT user_id, days,
             |        days - row_number() OVER (PARTITION BY user_id
             |                                  ORDER BY days) AS grp
             |      FROM dd)
             |SELECT user_id, min(days) AS start_day, max(days) AS end_day,
             |       count(*) AS len
             |FROM g GROUP BY user_id, grp
             |ORDER BY user_id, start_day""".stripMargin)),

    // Hourly OHLC resample of the event value stream — the time-series
    // downsample every metrics/market pipeline runs. Open/close are
    // argmin/argmax over (µs, event_id) via the lexicographic struct-min
    // trick (the ONLY deterministic cross-engine argmin; memory: DuckDB
    // min of a struct IS lexicographic). Both engines reduce the
    // timestamp to INTEGER microseconds first — ordering by raw ts would
    // diverge on sub-µs digits only DuckDB's nanos see. One partial-agg
    // groupBy on the bounded hour grid; everything stays BIGINT.
    "ts_resample_ohlc" -> Decl(
      (s, d) => {
        val us = expr("unix_micros(ts)")
        val c = round(col("value") * 100).cast("bigint")
        Tables.events(s, d)
          .select((us.cast("bigint") / lit(3600000000L)).cast("bigint").as("hr"),
                  us.as("us"), col("event_id"), c.as("c"))
          .groupBy("hr")
          .agg(min(struct(col("us"), col("event_id"), col("c")))("c").as("open"),
               max(col("c")).as("high"), min(col("c")).as("low"),
               max(struct(col("us"), col("event_id"), col("c")))("c").as("close"),
               count(lit(1)).as("n"), sum(col("c")).as("cents"))
          .orderBy("hr")
      },
      Some("""WITH e AS (SELECT epoch_ns(ts) // 1000 AS us, event_id,
             |             CAST(round(value * 100) AS BIGINT) AS c
             |           FROM events)
             |SELECT us // 3600000000 AS hr,
             |       (min({'u': us, 'e': event_id, 'c': c})).c AS open,
             |       max(c) AS high, min(c) AS low,
             |       (max({'u': us, 'e': event_id, 'c': c})).c AS close,
             |       count(*) AS n, CAST(sum(c) AS BIGINT) AS cents
             |FROM e GROUP BY 1 ORDER BY hr""".stripMargin)),

    // Grouped weighted median (lower): per return flag, the smallest
    // extended-price cent value whose cumulative quantity weight reaches
    // half the group total. The data-scale path is the bounded
    // distinct-cents grid — per-(flag, cents) integer weight sums — and
    // the cumulation is the DISTRIBUTED two-pass PrefixSum over the
    // (flag, cents) total order, NOT a flag-partitioned window: the grid
    // is near-unique prices, so a 3-value partition key would serialize
    // the whole grid sort onto 3 tasks (round-11 verdict). Per-flag
    // running weight = global prefix sum − the flag's starting offset (a
    // 3-row cumulation of per-flag totals, broadcast back). The pick is
    // min-over-qualifying with INTEGER comparison (2·cum ≥ tot — no
    // interpolated quantile ever crosses engines tie-exactly; memory:
    // quantile ulp ties).
    "agg_weighted_median" -> Decl(
      (s, d) => {
        // Round-13: eager checkpoint — the grid has FOUR consumer subtrees
        // (GridCum's sample and map passes, its internal per-key totals,
        // and `tot` below), each of which otherwise re-runs the lineitem
        // scan + grid aggregate (window_mad_outlier's measurement: the
        // lazy-persist alternative races the broadcast-build threads).
        val grid = Tables(s, d, "lineitem")
          .select(col("l_returnflag"),
                  round(col("l_extendedprice") * 100).cast("bigint").as("cents"),
                  col("l_quantity").cast("bigint").as("qty"))
          .groupBy("l_returnflag", "cents")
          .agg(sum(col("qty")).as("wsum"))
          .localCheckpoint(true)
        val tot = grid.groupBy("l_returnflag").agg(sum(col("wsum")).as("tot"))
        GridCum.perKeyCumsum(grid, "l_returnflag", "cents", "wsum", "cum")
          .join(broadcast(tot), "l_returnflag")
          .filter(lit(2L) * col("cum") >= col("tot"))
          .groupBy("l_returnflag")
          .agg(min(col("cents")).as("wmedian_cents"), max(col("tot")).as("qty_total"))
          .orderBy("l_returnflag")
      },
      Some("""WITH grid AS (SELECT l_returnflag,
             |                CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             |                sum(CAST(l_quantity AS BIGINT)) AS wsum
             |              FROM lineitem GROUP BY 1, 2),
             |cw AS (SELECT l_returnflag, cents,
             |         sum(wsum) OVER (PARTITION BY l_returnflag ORDER BY cents
             |                         ROWS UNBOUNDED PRECEDING) AS cum,
             |         sum(wsum) OVER (PARTITION BY l_returnflag) AS tot
             |       FROM grid)
             |SELECT l_returnflag, min(cents) AS wmedian_cents,
             |       CAST(max(tot) AS BIGINT) AS qty_total
             |FROM cw WHERE 2 * cum >= tot
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // BPE merge LEARNING — tokenizer training as a distributed pipeline
    // (text_bpe_token_count APPLIES a fixed merge list; this derives one).
    // The scale design: all per-iteration work runs on the DISTINCT-word
    // frequency table (bounded by vocabulary — ~10⁶ rows for a real
    // corpus — never corpus-sized), symbols ride the paren-encoded string
    // form where one ranked merge application IS a literal replace()
    // (memory: BPE replace-chain — exact because merge operands only come
    // from lower ranks), and each iteration collects exactly ONE argmax
    // row to the driver (count desc, pattern asc on the ASCII-only
    // alphabet, so both engines' orderings are binary-identical). Six
    // unrolled iterations mirror as six DuckDB CTE stages running the
    // REAL algorithm.
    "text_bpe_learn_merges" -> Decl(
      (s, d) => {
        import s.implicits._
        val vocab = Tables(s, d, "documents")
          .select(explode(split(lower(col("text")), " ")).as("w"))
          .filter(col("w").rlike("^[a-z]+$") && length(col("w")).between(2, 12))
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          // Spark split on '' keeps a trailing empty capture (Java regex
          // limit -1); DuckDB string_split does not — filter it so both
          // engines encode "(a)(b)(c)" identically
          .select(expr(
            "concat('(', array_join(filter(split(w, ''), x -> x <> ''), ')('), ')')")
            .as("e"), col("cnt"))
          .localCheckpoint(true)
        var cur = vocab
        val merges = Seq.newBuilder[(Int, String, Long)]
        for (i <- 1 to 6) {
          val top = cur
            .select(col("cnt"),
                    split(expr("substring(e, 2, length(e) - 2)"), "\\)\\(").as("sy"))
            .select(col("cnt"), explode(expr(
              "transform(slice(sy, 1, size(sy) - 1), (x, j) -> struct(x AS a, sy[j + 1] AS b))"))
              .as("pr"))
            .groupBy(concat(lit("("), col("pr.a"), lit(")("), col("pr.b"), lit(")"))
                       .as("pat"),
                     concat(lit("("), col("pr.a"), col("pr.b"), lit(")")).as("rep"))
            .agg(sum(col("cnt")).as("c"))
            .orderBy(col("c").desc, col("pat"))
            .limit(1).collect()(0)
          val (pat, rep) = (top.getAs[String]("pat"), top.getAs[String]("rep"))
          merges += ((i, pat, top.getAs[Long]("c")))
          // [a-z()] alphabet only — safe to inline in the SQL literal
          cur = cur.withColumn("e", expr(s"replace(e, '$pat', '$rep')"))
            .localCheckpoint(true)
        }
        merges.result().toDF("rank", "merge", "cnt").orderBy("rank")
      },
      Some {
        val base =
          """WITH w0 AS (
            |  SELECT '(' || array_to_string(string_split(w, ''), ')(') || ')' AS e,
            |         cnt
            |  FROM (SELECT w, count(*) AS cnt FROM (
            |          SELECT unnest(string_split(lower(text), ' ')) AS w
            |          FROM documents) t
            |        WHERE regexp_matches(w, '^[a-z]+$')
            |          AND len(w) BETWEEN 2 AND 12
            |        GROUP BY w))""".stripMargin
        val stages = (1 to 6).map { i =>
          s""",
            |p$i AS (SELECT '(' || l[i] || ')(' || l[i+1] || ')' AS pat,
            |              '(' || l[i] || l[i+1] || ')' AS rep, sum(cnt) AS c
            |       FROM (SELECT string_split(e[2:len(e)-1], ')(') AS l, cnt
            |             FROM w${i - 1}),
            |            LATERAL unnest(range(1, len(l))) AS t(i)
            |       GROUP BY 1, 2),
            |m$i AS (SELECT $i AS rank, pat, rep, c FROM p$i
            |       ORDER BY c DESC, pat LIMIT 1),
            |w$i AS (SELECT replace(e, m.pat, m.rep) AS e, cnt FROM w${i - 1}, m$i m)"""
            .stripMargin
        }.mkString
        val union = (1 to 6).map(i =>
          s"SELECT CAST(rank AS INTEGER) AS rank, pat AS merge, CAST(c AS BIGINT) AS cnt FROM m$i")
          .mkString("\n", "\nUNION ALL\n", "\nORDER BY rank")
        base + stages + union
      }),

    // Dynamic partition pruning — the other half of the layout story
    // (join_bucketed_colocated kills the shuffle; DPP kills the SCAN):
    // the fact table is written day-partitioned, the dim side carries a
    // selective filter, and Catalyst injects a dynamicpruning subquery so
    // the fact scan reads ONLY the day partitions the dim survives — at
    // 100 TB that is reading 1/7th of the table instead of filtering
    // 7/7ths post-scan. ScaleSpec pins the dynamicpruningexpression in
    // the fact scan's partition filters.
    "join_partition_pruned" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_dpp")
        val ev = Tables.events(s, d)
          .select(col("event_id"),
                  round(col("value") * 100).cast("bigint").as("c"),
                  datediff(col("ts").cast("date"), lit("1970-01-01")).as("day"))
        ev.write.partitionBy("day").parquet(dir.resolve("fact").toString)
        val fact = s.read.parquet(dir.resolve("fact").toString)
        val dim = ev.select(col("day")).distinct()
          .filter(pmod(col("day"), lit(7)) === 0)
        fact.join(dim, "day")
          .groupBy("day")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("cents"))
          .select(col("day").cast("int").as("day"), col("n"), col("cents"))
          .orderBy("day")
      },
      Some("""WITH ev AS (SELECT
             |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events)
             |SELECT day, count(*) AS n, CAST(sum(c) AS BIGINT) AS cents
             |FROM ev WHERE day % 7 = 0
             |GROUP BY day ORDER BY day""".stripMargin)),

    // Grouped OLS regression (value-cents against the day index, per
    // event type) — slope/intercept/r² from the five exact BIGINT
    // sufficient sums (n, Σx, Σy, Σxy, Σx², Σy²); each OUTPUT row's
    // formula reads only its own group's scalars, so it is a per-row
    // fixed double tree (no cross-row float aggregation anywhere — the
    // R11 discipline without even needing the pivot). Products like
    // Σx·Σy exceed int64, so the FORMULA runs in double; the SUMS never
    // do. Lossless partial aggregation at any scale.
    "agg_linreg" -> Decl(
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_type"),
                  datediff(col("ts").cast("date"), lit("1970-01-01"))
                    .cast("bigint").as("x"),
                  round(col("value") * 100).cast("bigint").as("y"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
               sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
               sum(col("x") * col("x")).as("sxx"),
               sum(col("y") * col("y")).as("syy"))
          .selectExpr("event_type", "n",
            """round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
              |      (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
              |AS slope""".stripMargin,
            """round((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) *
              |       ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
              |        (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))) /
              |      CAST(n AS DOUBLE), 6) AS intercept""".stripMargin,
            """round(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) *
              |       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)) /
              |      ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
              |       (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
              |AS r2""".stripMargin)
          .orderBy("event_type")
      },
      Some("""WITH st AS (SELECT event_type, count(*) AS n,
             |  sum(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)) AS sx,
             |  sum(CAST(round(value * 100) AS BIGINT)) AS sy,
             |  sum(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) *
             |      CAST(round(value * 100) AS BIGINT)) AS sxy,
             |  sum(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) *
             |      CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)) AS sxx,
             |  sum(CAST(round(value * 100) AS BIGINT) *
             |      CAST(round(value * 100) AS BIGINT)) AS syy
             |FROM events GROUP BY event_type)
             |SELECT event_type, CAST(n AS BIGINT) AS n,
             |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             |        (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
             |    AS slope,
             |  round((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) *
             |         ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             |          (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))) /
             |        CAST(n AS DOUBLE), 6) AS intercept,
             |  round(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) *
             |         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)) /
             |        ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
             |         (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
             |    AS r2
             |FROM st ORDER BY event_type""".stripMargin)),

    // Incremental aggregate maintenance — the materialized-view pattern:
    // a standing per-(type, day) aggregate parquet is MERGED with the
    // delta days' aggregate by re-aggregating the union of partial
    // states (sum-of-sums, sum-of-counts). Exact because the sufficient
    // statistics are integers (count, cents) — the same losslessness
    // that lets a 100 TB pipeline maintain aggregates per-partition
    // instead of recomputing history. The oracle is the full aggregate:
    // merge(partials) == aggregate(all) is the tested contract.
    "sink_incremental_agg" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d).select(
          col("event_type"),
          datediff(col("ts").cast("date"), lit("1970-01-01")).as("day"),
          round(col("value") * 100).cast("bigint").as("c"))
        val cut = ev.agg(min(col("day"))).head.getInt(0) + 15
        val dir = Tables.scratchDir("graft_incragg")
        ev.filter(col("day") < cut).groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("cents"))
          .write.parquet(dir.resolve("state").toString)
        val state = s.read.parquet(dir.resolve("state").toString)
        val delta = ev.filter(col("day") >= cut).groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("cents"))
        state.unionAll(delta)
          .groupBy("event_type", "day")
          .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
          .orderBy("event_type", "day")
      },
      Some("""SELECT event_type,
             |  CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day,
             |  count(*) AS n,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin)),

    // Spearman rank correlation (quantity vs discount) — the nonparametric
    // sibling of agg_corr_covar's Pearson. Midranks handle ties exactly:
    // 2·midrank(v) = 2·cum(v) − c(v) + 1 is an INTEGER computed on each
    // column's bounded distinct-value grid (50 quantities, 11 discounts —
    // broadcast back to rows; never a global rank window over the corpus),
    // and the six sufficient sums (n, Σx, Σy, Σx², Σy², Σxy over doubled
    // ranks) stay exact BIGINTs. ρ is one fixed double tree over those
    // scalars (n·Σxy overflows int64, so the FORMULA runs in double — the
    // SUMS never do; at SF ≳ 1 the squared sums would widen to
    // DECIMAL(38), same plan shape), with the 6-dp round absorbing
    // terminal ulp noise.
    "agg_spearman_corr" -> Decl(
      (s, d) => {
        def rankGrid(src: org.apache.spark.sql.DataFrame, vcol: String) = {
          val w = Window.orderBy(vcol)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          src.groupBy(vcol).agg(count(lit(1)).as("c"))
            .select(col(vcol),
                    (lit(2L) * sum(col("c")).over(w) - col("c") + 1L).as(s"r_$vcol"))
        }
        val li = Tables(s, d, "lineitem")
          .select(col("l_quantity").cast("bigint").as("q"),
                  round(col("l_discount") * 100).cast("bigint").as("disc"))
        val ranked = li
          .join(broadcast(rankGrid(li, "q")), "q")
          .join(broadcast(rankGrid(li, "disc")), "disc")
        ranked
          .agg(count(lit(1)).as("n"),
               sum(col("r_q")).as("sx"), sum(col("r_disc")).as("sy"),
               sum(col("r_q") * col("r_q")).as("sxx"),
               sum(col("r_disc") * col("r_disc")).as("syy"),
               sum(col("r_q") * col("r_disc")).as("sxy"))
          .selectExpr("n",
            """round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
              |(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
              | sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
              |AS rho""".stripMargin)
      },
      Some("""WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS q,
             |              CAST(round(l_discount * 100) AS BIGINT) AS disc
             |            FROM lineitem),
             |gq AS (SELECT q, 2 * sum(c) OVER (ORDER BY q
             |                ROWS UNBOUNDED PRECEDING) - c + 1 AS r_q
             |       FROM (SELECT q, count(*) AS c FROM li GROUP BY q)),
             |gd AS (SELECT disc, 2 * sum(c) OVER (ORDER BY disc
             |                ROWS UNBOUNDED PRECEDING) - c + 1 AS r_disc
             |       FROM (SELECT disc, count(*) AS c FROM li GROUP BY disc)),
             |r AS (SELECT r_q, r_disc FROM li JOIN gq USING (q)
             |      JOIN gd USING (disc)),
             |st AS (SELECT count(*) AS n,
             |         CAST(sum(r_q) AS BIGINT) AS sx,
             |         CAST(sum(r_disc) AS BIGINT) AS sy,
             |         CAST(sum(r_q * r_q) AS BIGINT) AS sxx,
             |         CAST(sum(r_disc * r_disc) AS BIGINT) AS syy,
             |         CAST(sum(r_q * r_disc) AS BIGINT) AS sxy
             |       FROM r)
             |SELECT CAST(n AS BIGINT) AS n,
             |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             |        (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
             |         sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
             |    AS rho
             |FROM st""".stripMargin)),

    // Layered BFS from a seed set over the shared deterministic graph —
    // the reachability/impact query (``which docs sit within 4 hops of
    // the flagged set?``). Frontier-at-a-time: each hop is ONE src-keyed
    // join against the checkpointed adjacency plus an anti-join against
    // the visited set, so per-hop work is O(frontier edges), never
    // all-pairs; distances are small integers and the oracle unrolls the
    // same four hops as CTEs. The adjacency is built once (the LPA/
    // triangle pattern: explicit repartition + localCheckpoint).
    "graph_bfs_layers" -> Decl(
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
        val adj = canon.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(canon.select(col("b").as("src"), col("a").as("dst")))
          .repartition(n, col("src"))
          .localCheckpoint(true)
        var dist = docs.filter(pmod(col("doc_id"), lit(97L)) === 0)
          .select(col("doc_id").as("v"), lit(0).as("dist"))
        var frontier = dist
        (1 to 4).foreach { i =>
          val next = adj.join(frontier, adj("src") === frontier("v"))
            .select(col("dst").as("v")).distinct()
            .join(dist.select(col("v").as("seen")),
                  col("v") === col("seen"), "left_anti")
            .select(col("v"), lit(i).as("dist"))
            .localCheckpoint(true)
          dist = dist.unionAll(next).localCheckpoint(true)
          frontier = next
        }
        val out = dist.select(col("v").as("doc_id"), col("dist")).orderBy("doc_id")
        adj.unpersist()
        out
      },
      Some {
        val b = new StringBuilder(Round8.graphOracleCtes +
          """,
            |d0 AS (SELECT doc_id AS v, 0 AS dist FROM documents
            |       WHERE doc_id % 97 = 0)""".stripMargin)
        (1 to 4).foreach { i =>
          b.append(s""",
            |f$i AS (SELECT DISTINCT adj.dst AS v
            |       FROM d${i - 1} JOIN adj ON d${i - 1}.v = adj.src
            |       WHERE adj.dst NOT IN (SELECT v FROM d${i - 1})),
            |d$i AS (SELECT v, dist FROM d${i - 1}
            |       UNION ALL SELECT v, $i FROM f$i)""".stripMargin)
        }
        b.append("""
          |SELECT v AS doc_id, CAST(dist AS INTEGER) AS dist
          |FROM d4 ORDER BY v""".stripMargin)
        b.toString
      }),

    // Multimodal resize STUB — completes the decode/resize/frame-sample
    // plumbing trio (multimodal_binary_meta, multimodal_frame_sample).
    // A real resize reads the payload at strided offsets per output
    // pixel; the deterministic fake samples 8 bytes at stride n/8 and
    // reduces them, so the Spark-side shape is real: binary column in,
    // per-row batched iteration over a partition, fixed-width feature
    // out. The oracle mirrors byte arithmetic as codepoint arithmetic —
    // valid because this corpus is pure ASCII (asserted: 0 rows where
    // octet_length ≠ len), the same contract multimodal_binary_meta
    // already documents for its head-byte.
    "multimodal_resize_stub" -> Decl(
      (s, d) => {
        val sp = s; import sp.implicits._
        Tables(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.map { case (id, payload) =>
              // STUB resize: a real implementation hands `payload` to an
              // image decoder and resamples; the strided byte probe below
              // has the same access pattern and is deterministic.
              val n = payload.length
              val stride = math.max(1, n / 8)
              var sum = 0L; var cnt = 0L
              var k = 0
              while (k < 8) {
                val pos = k * stride
                if (pos < n) { sum += payload(pos) & 0xFF; cnt += 1 }
                k += 1
              }
              (id, n.toLong, sum, cnt)
            }
          }
          .toDF("doc_id", "n_bytes", "feat_sum", "n_sampled")
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id, len(text) AS n,
             |             greatest(1, len(text) // 8) AS st, text
             |           FROM documents)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
             |  CAST(sum(CASE WHEN 1 + k * st <= n
             |           THEN ascii(substr(text, CAST(1 + k * st AS INTEGER), 1))
             |           ELSE 0 END) AS BIGINT) AS feat_sum,
             |  CAST(sum(CASE WHEN 1 + k * st <= n THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_sampled
             |FROM b, LATERAL unnest(range(0, 8)) AS t(k)
             |GROUP BY doc_id, n ORDER BY doc_id""".stripMargin)),

    // Bit-exact truncated EWMA (α = 1/2, depth 8) per user over the event
    // sequence: every weight is a dyadic rational (1/2 … 1/256) and cents
    // ≤ 2¹⁶, so every term AND every partial sum is exactly representable
    // in a double — the sum is order-independent and the two engines agree
    // bit-for-bit with NO rounding step (the general-α EWMA cannot cross
    // engines exactly; the dyadic one can). One window pass, 8 lags, all
    // inside whole-stage codegen. Ordered by event_id (the ingestion
    // sequence): ts carries sub-microsecond digits only DuckDB sees
    // (nanos parquet), so a ts ORDER BY is not cross-engine stable.
    "window_ewma_dyadic" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        val c = round(col("value") * 100).cast("bigint")
        val ewma = (0 until 8).map { k =>
          coalesce(lag(c, k).over(w), lit(0L)).cast("double") /
            math.pow(2.0, k + 1)
        }.reduce(_ + _)
        Tables.events(s, d)
          .filter(col("user_id") < 50)
          .select(col("event_id"), col("user_id"), ewma.as("ewma"))
          .orderBy("event_id")
      },
      Some {
        val terms = (0 until 8).map { k =>
          val w = "OVER (PARTITION BY user_id ORDER BY event_id)"
          val c = "CAST(round(value * 100) AS BIGINT)"
          val lagged = if (k == 0) c else s"coalesce(lag($c, $k) $w, 0)"
          s"CAST($lagged AS DOUBLE) / ${math.pow(2.0, k + 1)}"
        }.mkString(" + ")
        s"""SELECT event_id, user_id, $terms AS ewma
           |FROM events WHERE user_id < 50 ORDER BY event_id""".stripMargin
      }))
}

// ——— formerly Round9b.scala ———
/** Round-9 second wave: skyline (Pareto frontier) via the sort-based 2D
  * algorithm, CDC-log fold to a snapshot, Gini concentration of the corpus
  * source mix, and an exact rolling median window.
  */
object Round9b {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._


  val decls: Map[String, Decl] = Map(
    // 2-D skyline (Pareto frontier) over parts — cheapest-and-biggest:
    // a part survives iff no other part is both ≤ price and ≥ size with
    // one strict. (Skyline-in-Spark-SQL is a published operator
    // integration — EDBT 2023; the reference surface has no native twin,
    // so this is the §0-allowed extension path.) Spark runs the
    // SCALABLE shape: collapse to the bounded distinct-price grid, take
    // max size per price, one cumulative-max window over the ASC price
    // grid (rows to 1 preceding), broadcast the tiny grid back, and keep
    // rows that beat every strictly-cheaper price's max and every
    // equal-price strict max — linear after one shuffle, no self-join.
    // The oracle is the obviously-correct quadratic NOT EXISTS spec, so
    // the hash-match PROVES the window algorithm implements dominance.
    "topk_skyline_pareto" -> Decl(
      (s, d) => {
        val parts = Tables(s, d, "part")
          .select(col("p_partkey"),
                  round(col("p_retailprice") * 100).cast("bigint").as("price_c"),
                  col("p_size").cast("bigint").as("size"))
        // Distinct-price grid, then a TWO-LEVEL prefix max so no single
        // task ever scans the whole grid: an in-band cumulative max
        // (band-partitioned window), plus a band-level prefix computed on
        // the BOUNDED band table (price-range/10 rows regardless of data
        // size) and broadcast back. greatest(both, nulls-first) is the
        // "max size among all strictly cheaper prices".
        // grid feeds two consumers (band prefix + frontier); materialize
        // the part scan + distinct-price shuffle once
        val grid = parts.groupBy("price_c").agg(max(col("size")).as("pmax"))
          .withColumn("band", expr("price_c div 1000"))
          .localCheckpoint(true)
        val wIn = Window.partitionBy("band").orderBy("price_c")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wBand = Window.orderBy("band")
          .rowsBetween(Window.unboundedPreceding, -1)
        val bandPrefix = grid.groupBy("band").agg(max(col("pmax")).as("bmax"))
          .select(col("band"), max(col("bmax")).over(wBand).as("prev_band_max"))
        val frontier = grid
          .withColumn("in_band_prev", max(col("pmax")).over(wIn))
          .join(broadcast(bandPrefix), "band")
          .select(col("price_c"), col("pmax"),
                  greatest(coalesce(col("in_band_prev"), lit(Long.MinValue)),
                           coalesce(col("prev_band_max"), lit(Long.MinValue)))
                    .as("cheaper_max"))
        parts.join(broadcast(frontier), "price_c")
          .filter(col("size") > col("cheaper_max") && col("size") === col("pmax"))
          .select(col("p_partkey"), col("price_c"), col("size"))
          .orderBy("price_c", "p_partkey")
      },
      Some("""WITH p AS (SELECT p_partkey,
             |    CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
             |    CAST(p_size AS BIGINT) AS size
             |  FROM part)
             |SELECT p_partkey, price_c, size
             |FROM p r
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM p s
             |  WHERE s.price_c <= r.price_c AND s.size >= r.size
             |    AND (s.price_c < r.price_c OR s.size > r.size))
             |ORDER BY price_c, p_partkey""".stripMargin)),

    // CDC-log fold — the lakehouse apply step: a change stream (here the
    // per-user event log; 'error' = delete, anything else = upsert
    // carrying the value) folds into the current snapshot via per-key
    // last-writer-wins. One argmax per user (the struct-max trick on the
    // (ts, event_id) total order — no whole-partition window), then drop
    // keys whose final op is a delete. At 100 TB this is the standard
    // merge-on-read compaction kernel: per-key state, one shuffle.
    // Shared with graft.streaming.StreamOps.cdcSnapshot — the SAME fold
    // runs incrementally over MemoryStream in StreamingSpec (stream ==
    // batch asserted, delete arriving in a later micro-batch included).
    "cdc_apply_log" -> Decl(
      (s, d) => graft.streaming.StreamOps
        .cdcSnapshot(Tables.events(s, d)).orderBy("user_id"),
      Some("""WITH log AS (SELECT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
             |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events),
             |folded AS (SELECT user_id,
             |    max({'us': us, 'event_id': event_id, 'op': op, 'c': c}) AS last,
             |    count(*) AS n_changes
             |  FROM log GROUP BY user_id)
             |SELECT user_id, (last).c AS current_cents, n_changes
             |FROM folded WHERE (last).op = 'U'
             |ORDER BY user_id""".stripMargin)),

    // CUSUM change-point detection over the hourly click-count series —
    // the monitoring primitive for drift alarms. The one-sided CUSUM
    // recursion s_t = max(0, s_{t-1} + x_t − μ − k) has the closed form
    // s_t = prefix_t − min(0, min_{j≤t} prefix_j) with prefix the running
    // sum of deviations — two window functions, no sequential recursion.
    // Exactness: deviations are scaled to integers (e_i = 2n·x_i − 2S − n
    // encodes x_i − μ − ½ with μ = S/n, multiplied through by 2n), so the
    // prefix sums, running min, and the alarm comparison are all BIGINT —
    // no float ever. The windows run over the HOURLY GRID (bounded by the
    // time range, never corpus-sized), the same aggregated-grid discipline
    // as the rank-statistics keys.
    "window_cusum_changepoint" -> Decl(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .filter(col("event_type") === "click")
          .groupBy(expr("unix_micros(ts) div 3600000000").as("hr"))
          .agg(count(lit(1)).as("cnt"))
        val tot = hourly.agg(count(lit(1)).as("n"), sum(col("cnt")).as("st"))
        val w = Window.orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hourly.crossJoin(broadcast(tot))
          .select(col("hr"), col("cnt"), col("n"),
                  (lit(2L) * col("n") * col("cnt") - lit(2L) * col("st") - col("n"))
                    .as("e"))
          .select(col("hr"), col("cnt"), col("n"),
                  sum(col("e")).over(w).as("prefix"))
          .select(col("hr"), col("cnt"),
                  (col("prefix") -
                   least(min(col("prefix")).over(w), lit(0L))).as("cusum_x2n"),
                  col("n"))
          .select(col("hr"), col("cnt"), col("cusum_x2n"),
                  (col("cusum_x2n") > lit(8L) * col("n")).cast("int").as("alarm"))
          .orderBy("hr")
      },
      Some("""WITH hourly AS (
             |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
             |         count(*) AS cnt
             |  FROM events WHERE event_type = 'click' GROUP BY 1),
             |tot AS (SELECT count(*) AS n, CAST(sum(cnt) AS BIGINT) AS st
             |        FROM hourly),
             |dev AS (SELECT hr, cnt, n,
             |          2 * n * cnt - 2 * st - n AS e
             |        FROM hourly CROSS JOIN tot),
             |pre AS (SELECT hr, cnt, n,
             |          CAST(sum(e) OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING)
             |               AS BIGINT) AS prefix
             |        FROM dev),
             |cu AS (SELECT hr, cnt, n,
             |         prefix - least(CAST(min(prefix) OVER (ORDER BY hr
             |                   ROWS UNBOUNDED PRECEDING) AS BIGINT),
             |                 CAST(0 AS BIGINT)) AS cusum_x2n
             |       FROM pre)
             |SELECT hr, cnt, cusum_x2n,
             |  CAST(cusum_x2n > 8 * n AS INT) AS alarm
             |FROM cu ORDER BY hr""".stripMargin)),

    // Robust outlier flags via median absolute deviation — the
    // heavy-tail-safe twin of window_zscore_outlier (a single wild value
    // drags a mean+stddev gate; the median pair shrugs it off). Both
    // medians are LOWER medians picked off the bounded distinct-cents
    // grid by the weighted-median machinery (cumulative count ≥ half),
    // so every quantity compared — cents, med, |x−med|, MAD — is an
    // exact BIGINT; the flag is the integer comparison |x−med| > 3·MAD.
    // Output is the bounded per-type profile, not a row per event.
    "window_mad_outlier" -> Decl(
      (s, d) => {
        // Round-13 (guide §1.2 — don't recompute what you already have):
        // the r12 shape scanned `events` FOUR times (med grid, dev, mad
        // grid, final aggregate — 12.7 s task CPU at sf0.1). Everything
        // here is derivable from ONE (event_type, cents, count) grid:
        // the ad-grid is the c-grid with |c − med_c| folded over the SAME
        // multiplicities (dev rows are ev rows with ad attached, so
        // grouping dev by (type, ad) ≡ re-keying the c-grid by ad and
        // summing cw — exact integer arithmetic, identical rows), and the
        // final profile re-derives ad from the grid instead of re-scanning
        // events. The grid is lazily persisted: it is BOUNDED (distinct
        // cents × |enum|, post-aggregation — never corpus-sized) and has
        // three consumers.
        val ev = Tables.events(s, d)
          .select(col("event_type"),
                  round(col("value") * 100).cast("bigint").as("c"))
        // Eager localCheckpoints, NOT persist: every multi-consumer table
        // here is either the bounded grid or ≤|enum| rows, and each has
        // 3-4 consumer subtrees (GridCum's sample pass, its map pass, two
        // per-key-total aggregates) — some on broadcast-build threads. A
        // lazy persist RACES those threads and its columnar cache build
        // measured +5-6 s CPU on this key (the r12 GridCum-persist revert
        // saw the same); checkpoints materialize each table ONCE as plain
        // RDD blocks that every subtree then scans, so the events corpus
        // is read exactly once and no GridCum chain ever re-runs.
        val grid1 = ev.groupBy("event_type", "c").agg(count(lit(1)).as("cw"))
          .localCheckpoint(true)
        def lowerMedianOfGrid(grid: org.apache.spark.sql.DataFrame,
                              vcol: String) = {
          // distributed PrefixSum over the (type, value) order — a
          // type-partitioned window would serialize each value grid onto
          // |enum| tasks (round-12 gate)
          val tot = grid.groupBy("event_type").agg(sum(col("cw")).as("tot"))
          GridCum.perKeyCumsum(grid, "event_type", vcol, "cw", "cum")
            .join(broadcast(tot), "event_type")
            .filter(lit(2L) * col("cum") >= col("tot"))
            .groupBy("event_type").agg(min(col(vcol)).as(s"med_$vcol"))
            .localCheckpoint(true) // ≤|enum| rows; consumed 2-3×
        }
        val med = lowerMedianOfGrid(grid1, "c")
        val adGrid = grid1.join(broadcast(med), "event_type")
          .select(col("event_type"),
                  abs(col("c") - col("med_c")).as("ad"), col("cw"))
          .groupBy("event_type", "ad").agg(sum(col("cw")).as("cw"))
          .localCheckpoint(true) // bounded grid; GridCum consumes it 4×
        val mad = lowerMedianOfGrid(adGrid, "ad")
        grid1.join(broadcast(med), "event_type")
          .join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(sum(col("cw")).as("n"),
               max(col("med_c")).as("med_cents"),
               max(col("med_ad")).as("mad_cents"),
               sum(when(abs(col("c") - col("med_c")) > lit(3L) * col("med_ad"),
                        col("cw")).otherwise(lit(0L)))
                 .as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events),
             |g1 AS (SELECT event_type, c, count(*) AS cw
             |       FROM ev GROUP BY 1, 2),
             |m1 AS (SELECT event_type, min(c) AS med_c FROM (
             |    SELECT event_type, c,
             |      sum(cw) OVER (PARTITION BY event_type ORDER BY c
             |                    ROWS UNBOUNDED PRECEDING) AS cum,
             |      sum(cw) OVER (PARTITION BY event_type) AS tot
             |    FROM g1) WHERE 2 * cum >= tot GROUP BY 1),
             |dev AS (SELECT ev.event_type, c, abs(c - med_c) AS ad
             |        FROM ev JOIN m1 ON ev.event_type = m1.event_type),
             |g2 AS (SELECT event_type, ad, count(*) AS cw
             |       FROM dev GROUP BY 1, 2),
             |m2 AS (SELECT event_type, min(ad) AS med_ad FROM (
             |    SELECT event_type, ad,
             |      sum(cw) OVER (PARTITION BY event_type ORDER BY ad
             |                    ROWS UNBOUNDED PRECEDING) AS cum,
             |      sum(cw) OVER (PARTITION BY event_type) AS tot
             |    FROM g2) WHERE 2 * cum >= tot GROUP BY 1),
             |j AS (SELECT dev.event_type, c, ad, med_c, med_ad
             |      FROM dev JOIN m1 ON dev.event_type = m1.event_type
             |               JOIN m2 ON dev.event_type = m2.event_type)
             |SELECT event_type, count(*) AS n,
             |  CAST(max(med_c) AS BIGINT) AS med_cents,
             |  CAST(max(med_ad) AS BIGINT) AS mad_cents,
             |  CAST(sum(CAST(ad > 3 * med_ad AS BIGINT)) AS BIGINT) AS n_outliers
             |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Maximum drawdown per user — the peak-to-trough companion of the
    // CUSUM alarm (monitoring: "how far below its running peak did this
    // series fall"). The equity curve is the running sum of signed
    // purchase cents (per user, (ts, event_id)-ordered); drawdown_t =
    // runmax(curve) − curve_t, and the answer is its per-user max — all
    // three passes are frames over the SAME user-partitioned sort (one
    // shuffle, windows reuse the ordering), and every value is BIGINT.
    "window_drawdown_max" -> Decl(
      (s, d) => {
        val wRun = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "error"))
          .select(col("user_id"), col("ts"), col("event_id"),
                  when(col("event_type") === "purchase",
                       round(col("value") * 100).cast("bigint"))
                    .otherwise(-round(col("value") * 100).cast("bigint"))
                    .as("delta"))
          .select(col("user_id"), col("ts"), col("event_id"),
                  sum(col("delta")).over(wRun).as("curve"))
          .select(col("user_id"),
                  (max(col("curve")).over(wRun) - col("curve")).as("dd"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"), max(col("dd")).as("max_drawdown_cents"))
          .orderBy("user_id")
      },
      Some("""WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             |    CASE WHEN event_type = 'purchase'
             |         THEN CAST(round(value * 100) AS BIGINT)
             |         ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
             |  FROM events WHERE event_type IN ('purchase', 'error')),
             |c AS (SELECT user_id,
             |    CAST(sum(delta) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |      AS curve,
             |    ts, event_id
             |  FROM p),
             |dd AS (SELECT user_id,
             |    CAST(max(curve) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |      - curve AS dd
             |  FROM c)
             |SELECT user_id, count(*) AS n,
             |  CAST(max(dd) AS BIGINT) AS max_drawdown_cents
             |FROM dd GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Benford first-digit audit — the classic synthetic-data / fraud
    // smell test: natural multiplicative data follows P(d) = log10(1+1/d);
    // uniform synthetic values (this fixture) deviate hard, and the
    // operator quantifies it. First digits come from string arithmetic
    // (exact); observed counts are BIGINT; the only floats are the nine
    // fixed log10 constants and the terminal per-digit deviation, both
    // 6-dp rounded (ulp-safe — R3).
    "agg_benford_deviation" -> Decl(
      (s, d) => {
        Tables(s, d, "orders")
          .select(substring(round(col("o_totalprice") * 100).cast("bigint")
                              .cast("string"), 1, 1).cast("bigint").as("digit"))
          .filter(col("digit").between(1, 9))
          .groupBy("digit").agg(count(lit(1)).as("obs"))
          .withColumn("total", sum(col("obs")).over(
            Window.partitionBy()))
          .selectExpr("digit", "obs",
            "round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p",
            """round(CAST(obs AS DOUBLE) / CAST(total AS DOUBLE) -
              |      log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS deviation"""
              .stripMargin)
          .orderBy("digit")
      },
      Some("""WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
             |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
             |  FROM orders),
             |g AS (SELECT digit, count(*) AS obs FROM d
             |      WHERE digit BETWEEN 1 AND 9 GROUP BY digit),
             |t AS (SELECT CAST(sum(obs) AS BIGINT) AS total FROM g)
             |SELECT digit, obs,
             |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p,
             |  round(CAST(obs AS DOUBLE) / CAST(total AS DOUBLE) -
             |        log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS deviation
             |FROM g CROSS JOIN t ORDER BY digit""".stripMargin)),

    // Gini concentration of the corpus source mix — the inequality
    // summary a data-mixing dashboard reports next to the entropy /
    // chi-square keys: 0 = sources evenly represented, →1 = one source
    // dominates. Computed on the BOUNDED per-source count table (k rows)
    // with exact integer sums — rank the sorted counts, apply
    // G = (2·Σi·xᵢ − (k+1)·Σx) / (k·Σx) as one double tree, 6-dp round.
    "agg_gini_concentration" -> Decl(
      (s, d) => {
        val counts = Tables(s, d, "documents")
          .groupBy("source").agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy(col("cnt"), col("source"))
        counts.select(col("cnt"), row_number().over(w).cast("bigint").as("rk"))
          .agg(count(lit(1)).as("k"), sum(col("cnt")).as("tot"),
               sum(col("rk") * col("cnt")).as("wsum"))
          .selectExpr("k", "tot",
            """round((2.0 * CAST(wsum AS DOUBLE) -
              |       (CAST(k AS DOUBLE) + 1.0) * CAST(tot AS DOUBLE)) /
              |      (CAST(k AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS gini"""
              .stripMargin)
      },
      Some("""WITH counts AS (SELECT source, count(*) AS cnt
             |                FROM documents GROUP BY source),
             |ranked AS (SELECT cnt,
             |    CAST(row_number() OVER (ORDER BY cnt, source) AS BIGINT) AS rk
             |  FROM counts),
             |st AS (SELECT count(*) AS k, CAST(sum(cnt) AS BIGINT) AS tot,
             |              CAST(sum(rk * cnt) AS BIGINT) AS wsum
             |       FROM ranked)
             |SELECT k, tot,
             |  round((2.0 * CAST(wsum AS DOUBLE) -
             |         (CAST(k AS DOUBLE) + 1.0) * CAST(tot AS DOUBLE)) /
             |        (CAST(k AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS gini
             |FROM st""".stripMargin)),

    // Product-quantization ANN — completes the ANN ladder (brute-force,
    // LSH buckets, IVF lists, Matryoshka prefix): 64 dims split into 8
    // subspaces of 8; each subspace learns a 4-centroid codebook by the
    // SAME exact-integer Lloyd machinery as vec_kmeans_lloyd (centroids
    // as (Σx, n) pairs, n²-scaled distances, id tie-break), every vector
    // encodes to 8 codes, and query-time asymmetric distance is the sum
    // of 8 per-subspace LUT entries. Determinism: each LUT entry is one
    // IEEE division over exact integers, and the 8-entry sum folds in
    // SORTED subspace order via a HOF aggregate — never an engine-chosen
    // float summation order. Scale shape: codebooks and LUTs are
    // k×subspaces rows (broadcast); encoding is one vec-keyed shuffle;
    // candidates score by LUT join, not by touching raw vectors — the
    // memory-bandwidth trade PQ exists for. Approximate by design →
    // oracle-N; Round9Spec bounds recall@10 against exact cosine.
    "sim_ann_pq" -> Decl(
      (s, d) => {
        // Round-13 (verdict item 5): the codebook training and the corpus
        // encoding are built ONCE per (JVM, sf dir) into the shared
        // VecIndex warehouse (the PairIndex precedent) — every later run
        // (and the other PQ consumer's quantized scan) probes the stored
        // tables instead of re-running the Lloyd chain. The training body
        // below is byte-for-byte the former inline code over the stored
        // quantized table; all values are exact integers, so the parquet
        // round-trip is bit-identical to the localCheckpoint it replaces.
        val pqRoot = VecIndex.ensure("pq", d) { root =>
          val q = VecIndex.quantized(s, d)
          // --- codebook training: per-subspace k=4 Lloyd, 2 iterations
          val seeds = Tables(s, d, "embeddings")
            .select(col("vec_id")).orderBy("vec_id").limit(4)
          var state = q.join(broadcast(seeds), "vec_id")
            .select(col("s_id"), col("vec_id").as("cluster"), col("i"),
                    col("x").as("cs"), lit(1L).as("cn"))
          for (_ <- 1 to 2) {
            val assign = q.join(broadcast(state), Seq("s_id", "i"))
              .groupBy(col("vec_id"), col("s_id"), col("cluster"))
              .agg(sum((col("cn") * col("x") - col("cs")) *
                       (col("cn") * col("x") - col("cs"))).as("num"),
                   max(col("cn")).as("cn"))
              .groupBy("vec_id", "s_id")
              .agg(min(struct((col("num").cast("double") /
                               (col("cn") * col("cn")).cast("double")).as("d"),
                              col("cluster").as("c"))).as("m"))
              .select(col("vec_id"), col("s_id"), col("m.c").as("cluster"))
            state = assign.join(q, Seq("vec_id", "s_id"))
              .groupBy("s_id", "cluster", "i")
              .agg(sum(col("x")).as("cs"), count(lit(1)).as("cn"))
              .localCheckpoint(true)
          }
          state.write.parquet(s"$root/state")
          // --- encode every vector: nearest codebook entry per subspace
          q.join(broadcast(state), Seq("s_id", "i"))
            .groupBy(col("vec_id"), col("s_id"), col("cluster"))
            .agg(sum((col("cn") * col("x") - col("cs")) *
                     (col("cn") * col("x") - col("cs"))).as("num"),
                 max(col("cn")).as("cn"))
            .groupBy("vec_id", "s_id")
            .agg(min(struct((col("num").cast("double") /
                             (col("cn") * col("cn")).cast("double")).as("d"),
                            col("cluster").as("c"))).as("m"))
            .select(col("vec_id"), col("s_id"), col("m.c").as("code"))
            .write.parquet(s"$root/codes")
        }
        val q = VecIndex.quantized(s, d)
        val state = s.read.parquet(s"$pqRoot/state")
        val codes = s.read.parquet(s"$pqRoot/codes")
        // --- query-time LUT: exact distance query-subvector → centroid
        val queries = q.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("s_id"), col("i"), col("x").as("qx"))
        val lut = queries.join(broadcast(state), Seq("s_id", "i"))
          .groupBy(col("q_id"), col("s_id"), col("cluster"))
          .agg(sum((col("cn") * col("qx") - col("cs")) *
                   (col("cn") * col("qx") - col("cs"))).as("num"),
               max(col("cn")).as("cn"))
          .select(col("q_id"), col("s_id"), col("cluster").as("code"),
                  (col("num").cast("double") /
                   (col("cn") * col("cn")).cast("double")).as("d"))
        // --- ADC scoring: candidates fold their 8 LUT entries in sorted
        // subspace order (fixed fold order → bit-stable double sum)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("adc"), col("vec_id"))
        codes.join(broadcast(lut), Seq("s_id", "code"))
          .filter(col("vec_id") =!= col("q_id"))
          .groupBy("q_id", "vec_id")
          .agg(collect_list(struct(col("s_id"), col("d"))).as("parts"))
          .select(col("q_id"), col("vec_id"),
                  expr("aggregate(array_sort(parts), CAST(0.0 AS DOUBLE), (a, p) -> a + p.d)")
                    .as("adc"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("q_id"), col("rank"), col("vec_id"))
          .orderBy("q_id", "rank")
      },
      None),

    // Versioned-snapshot sink with time travel — the table-format
    // mechanism under every lakehouse (snapshot isolation by manifest):
    // each commit writes immutable data files plus a manifest listing
    // the files visible in that version; "as of v" reads resolve the
    // manifest and scan exactly its files — old versions stay readable
    // after new commits, no copy. Here: v1 commits the early orders, v2
    // appends the rest; the query reads BOTH versions through their
    // manifests and aggregates. The oracle computes the same two
    // aggregates from the base table — equality proves snapshot reads
    // see exactly their committed slice. Manifests are driver-side KB
    // JSON (at scale: a metadata store), data files never rewrite.
    "sink_snapshot_time_travel" -> Decl(
      (s, d) => {
        import java.nio.file.{Files, Paths}
        val dir = Tables.scratchDir("graft_snap")
        val orders = Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
                  datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
                    .as("day"))
        val cut = orders.agg(min(col("day"))).head.getInt(0) + 365
        val f1 = dir.resolve("data_v1"); val f2 = dir.resolve("data_v2")
        orders.filter(col("day") < cut).write.parquet(f1.toString)
        orders.filter(col("day") >= cut).write.parquet(f2.toString)
        Files.writeString(dir.resolve("v1.manifest"), f1.toString)
        Files.writeString(dir.resolve("v2.manifest"), s"$f1\n$f2")
        def asOf(v: String) = {
          val files = Files.readString(dir.resolve(s"$v.manifest"))
            .split("\n").toSeq
          s.read.parquet(files: _*)
        }
        Seq("v1", "v2").map { v =>
          asOf(v).agg(count(lit(1)).as("n"),
                      sum(round(col("o_totalprice") * 100).cast("bigint"))
                        .as("cents"))
            .select(lit(v).as("version"), col("n"), col("cents"))
        }.reduce(_.unionAll(_)).orderBy("version")
      },
      Some("""WITH o AS (SELECT o_totalprice,
             |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day
             |  FROM orders),
             |cut AS (SELECT min(day) + 365 AS cut FROM o)
             |SELECT 'v1' AS version, count(*) AS n,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM o CROSS JOIN cut WHERE day < cut
             |UNION ALL
             |SELECT 'v2' AS version, count(*) AS n,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM o
             |ORDER BY version""".stripMargin)),

    // Dremel-style nested round-trip — orders written as one row per
    // order carrying a REPEATED GROUP of its line items (array<struct>),
    // the columnar-shredding shape parquet was built for (PAPERS.md:
    // Dremel, VLDB 2020). The declared result re-flattens via explode
    // and aggregates; the oracle computes the same aggregate from the
    // FLAT join — equality proves the nest→shred→read→unnest cycle
    // lost nothing. Scale shape: one order-keyed shuffle to nest;
    // the nested file then serves point lookups and per-order scans
    // without any join at read time (the Dremel trade).
    "source_nested_roundtrip" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_nested")
        Tables(s, d, "orders")
          .join(Tables(s, d, "lineitem"),
                col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderpriority"))
          .agg(array_sort(collect_list(struct(
                 col("l_linenumber").as("ln"),
                 col("l_quantity").cast("bigint").as("qty"),
                 round(col("l_extendedprice") * 100).cast("bigint").as("pc"))))
               .as("lines"))
          .write.parquet(dir.resolve("orders_nested").toString)
        s.read.parquet(dir.resolve("orders_nested").toString)
          .select(col("o_orderpriority"),
                  explode(col("lines")).as("l"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_lines"),
               sum(col("l.qty")).as("qty"), sum(col("l.pc")).as("cents"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_lines,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Exact rolling median (15-row centered frame) of per-user purchase
    // cents — the robust-trend window the moving_avg key can't fake on
    // heavy-tailed values. Both engines materialize the frame as a
    // sorted integer list and pick the lower-median element — no
    // interpolation ever crosses engines (memory: quantile ulp ties).
    // The frame is FIXED WIDTH, so state per window is O(15) — the
    // legitimate scale shape for rolling robust stats (contrast:
    // whole-partition windows are banned by the ScaleSpec sweep).
    "window_rolling_median" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id")).rowsBetween(-7, 7)
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .select(col("user_id"), col("event_id"),
                  collect_list(col("c")).over(w).as("frame"))
          .select(col("user_id"), col("event_id"),
                  expr("sort_array(frame)[CAST((size(frame) - 1) / 2 AS INT)]")
                    .as("med_cents"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events WHERE event_type = 'purchase'),
             |framed AS (SELECT user_id, event_id,
             |    list(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                  ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING) AS frame
             |  FROM p)
             |SELECT user_id, event_id,
             |  list_sort(frame)[CAST(floor((len(frame) - 1) / 2) AS INT) + 1]
             |    AS med_cents
             |FROM framed ORDER BY user_id, event_id""".stripMargin)))
}

// ——— formerly Round9d.scala ———
/** Round-9 fourth wave: rolling regression (trailing-frame OLS), sentence
  * segmentation stats, iterative k-core graph peeling, deterministic
  * surrogate-key minting, and per-group min-max feature scaling.
  */
object Round9d {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._


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

// ——— formerly Round9g.scala ———
/** Round-9 seventh wave: snapshot diffing (CDC generation), A/B test
  * statistics, percent-of-total reporting, and percent-change windows.
  */
object Round9g {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._


  val decls: Map[String, Decl] = Map(
    // Snapshot diff — generate a change feed from two table versions (the
    // REVERSE of cdc_apply_log, Delta's "change data feed from snapshots"):
    // classify every key as insert / delete / update / unchanged via one
    // full outer join on the key, report bounded per-class counts and the
    // exact cents delta. The two versions are deterministic slices of the
    // orders fixture (v1 drops keys ≡0 mod 10, v2 drops ≡1 mod 10 and
    // bumps prices on keys ≡0 mod 7), so all four classes are provably
    // non-empty. Scale: one key-partitioned shuffle join of two scans,
    // output bounded at 4 rows forever.
    "cdc_snapshot_diff" -> Decl(
      (s, d) => {
        val base = Tables(s, d, "orders")
          .select(col("o_orderkey").as("k"),
                  round(col("o_totalprice") * 100).cast("bigint").as("c"))
        val v1 = base.filter(col("k") % 10 =!= 0)
          .select(col("k").as("k1"), col("c").as("c1"))
        val v2 = base.filter(col("k") % 10 =!= 1)
          .select(col("k").as("k2"),
                  (col("c") + when(col("k") % 7 === 0, 500L).otherwise(0L))
                    .as("c2"))
        v1.join(v2, col("k1") === col("k2"), "full_outer")
          .select(
            when(col("k1").isNull, "insert")
              .when(col("k2").isNull, "delete")
              .when(col("c1") =!= col("c2"), "update")
              .otherwise("unchanged").as("change_type"),
            (coalesce(col("c2"), lit(0L)) - coalesce(col("c1"), lit(0L)))
              .as("delta"))
          .groupBy("change_type")
          .agg(count(lit(1)).as("n"), sum(col("delta")).as("delta_cents"))
          .orderBy("change_type")
      },
      Some("""WITH base AS (SELECT o_orderkey AS k,
             |                CAST(round(o_totalprice * 100) AS BIGINT) AS c
             |              FROM orders),
             |v1 AS (SELECT k AS k1, c AS c1 FROM base WHERE k % 10 <> 0),
             |v2 AS (SELECT k AS k2,
             |         c + CASE WHEN k % 7 = 0 THEN 500 ELSE 0 END AS c2
             |       FROM base WHERE k % 10 <> 1),
             |d AS (SELECT CASE WHEN k1 IS NULL THEN 'insert'
             |                  WHEN k2 IS NULL THEN 'delete'
             |                  WHEN c1 <> c2 THEN 'update'
             |                  ELSE 'unchanged' END AS change_type,
             |        coalesce(c2, 0) - coalesce(c1, 0) AS delta
             |      FROM v1 FULL OUTER JOIN v2 ON k1 = k2)
             |SELECT change_type, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(delta) AS BIGINT) AS delta_cents
             |FROM d GROUP BY change_type ORDER BY change_type""".stripMargin)),

    // Two-proportion A/B test — the experimentation readout: users split
    // into deterministic cohorts by key parity, "converted" = a
    // purchase-HEAVY user (5·purchases ≥ events — an integer comparison
    // that cannot saturate the way "any purchase" does on a dense event
    // stream, where p=1 zeroes the pooled variance); the pooled
    // two-proportion z-statistic comes from the four exact BIGINT counts
    // in ONE fixed double tree rounded to 6 dp (R11), with an explicit
    // degenerate-p guard shared by both engines. Scale: the corpus
    // collapses to per-user rows in one aggregate before any statistics.
    "agg_ab_test_z" -> Decl(
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_ev"),
               sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                 .as("n_pur"))
          .select((col("user_id") % 2).as("cohort"),
                  when(col("n_pur") * 5 >= col("n_ev"), 1L).otherwise(0L)
                    .as("conv"))
        val w = users.groupBy("cohort")
          .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
        w.agg(
            max(when(col("cohort") === 0, col("n"))).as("n0"),
            max(when(col("cohort") === 0, col("x"))).as("x0"),
            max(when(col("cohort") === 1, col("n"))).as("n1"),
            max(when(col("cohort") === 1, col("x"))).as("x1"))
          .select(col("n0"), col("x0"), col("n1"), col("x1"),
            when(col("x0") + col("x1") === 0 ||
                 col("x0") + col("x1") === col("n0") + col("n1"), lit(0.0))
              .otherwise(round(
                (col("x0").cast("double") / col("n0").cast("double") -
                 col("x1").cast("double") / col("n1").cast("double")) /
                sqrt(((col("x0") + col("x1")).cast("double") /
                      (col("n0") + col("n1")).cast("double")) *
                     (lit(1.0) - (col("x0") + col("x1")).cast("double") /
                      (col("n0") + col("n1")).cast("double")) *
                     (lit(1.0) / col("n0").cast("double") +
                      lit(1.0) / col("n1").cast("double"))), 6)).as("z"))
      },
      Some("""WITH u AS (SELECT user_id,
             |             CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase'
             |                               THEN 1 ELSE 0 END) >= count(*)
             |                  THEN 1 ELSE 0 END AS conv
             |           FROM events GROUP BY user_id),
             |c AS (SELECT user_id % 2 AS cohort, conv FROM u),
             |w AS (SELECT cohort, count(*) AS n, sum(conv) AS x
             |      FROM c GROUP BY cohort),
             |p AS (SELECT CAST(max(CASE WHEN cohort = 0 THEN n END) AS BIGINT) AS n0,
             |             CAST(max(CASE WHEN cohort = 0 THEN x END) AS BIGINT) AS x0,
             |             CAST(max(CASE WHEN cohort = 1 THEN n END) AS BIGINT) AS n1,
             |             CAST(max(CASE WHEN cohort = 1 THEN x END) AS BIGINT) AS x1
             |      FROM w)
             |SELECT n0, x0, n1, x1,
             |       CASE WHEN x0 + x1 = 0 OR x0 + x1 = n0 + n1 THEN 0.0
             |       ELSE round((CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE) -
             |              CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)) /
             |             sqrt((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) *
             |                  (1.0 - CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) *
             |                  (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))), 6)
             |       END AS z
             |FROM p""".stripMargin)),

    // Percent-of-total report — each (returnflag, linestatus) group's
    // revenue share of its returnflag total: the share-of-parent rollup
    // every BI layer emits. Both levels are aggregates (group cents, then
    // flag totals joined back broadcast), so NO window ever touches corpus
    // rows and the output is bounded by the enum cross product. Shares are
    // one division rounded to 6 dp over exact BIGINT cents.
    "agg_pct_of_total" -> Decl(
      (s, d) => {
        val g = Tables(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum(round(col("l_extendedprice") * 100).cast("bigint")).as("cents"))
        val tot = g.groupBy("l_returnflag").agg(sum(col("cents")).as("flag_total"))
        g.join(broadcast(tot), "l_returnflag")
          .select(col("l_returnflag"), col("l_linestatus"), col("cents"),
                  round(col("cents").cast("double") /
                        col("flag_total").cast("double"), 6).as("share"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""WITH g AS (SELECT l_returnflag, l_linestatus,
             |             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
             |           FROM lineitem GROUP BY 1, 2),
             |t AS (SELECT l_returnflag, sum(cents) AS flag_total
             |      FROM g GROUP BY 1)
             |SELECT g.l_returnflag, g.l_linestatus, CAST(g.cents AS BIGINT) AS cents,
             |       round(CAST(g.cents AS DOUBLE) / CAST(t.flag_total AS DOUBLE), 6)
             |         AS share
             |FROM g JOIN t USING (l_returnflag)
             |ORDER BY g.l_returnflag, g.l_linestatus""".stripMargin)),

    // Percent change between consecutive events per user — the delta
    // readout of monitoring dashboards: (cur − prev) / prev on the
    // integer-cents grid, NULL-safe on a zero or missing predecessor via
    // explicit guards shared by both engines. One high-cardinality-key
    // window. The ratio ships as exact INTEGER parts-per-million with
    // arithmetic half-away rounding ((2·10⁶·|a| + |b|) div 2|b|) — at
    // ~100 k rows a float round(·, 6) hit a 5e-7 boundary where Spark's
    // exact-BigDecimal and DuckDB's float-multiply roundings disagree
    // (measured: one row in 98 494), so NO engine round() is trusted.
    "window_pct_change" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .withColumn("prev", lag(col("c"), 1).over(w))
          .filter(col("prev").isNotNull && col("prev") =!= 0)
          .select(col("user_id"), col("event_id"),
                  (signum((col("c") - col("prev")) * col("prev")).cast("bigint") *
                   expr("(abs(c - prev) * 2000000L + abs(prev)) div (2 * abs(prev))"))
                    .as("pct_change_ppm"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH p AS (SELECT user_id, event_id,
             |             CAST(round(value * 100) AS BIGINT) AS c,
             |             lag(CAST(round(value * 100) AS BIGINT)) OVER
             |               (PARTITION BY user_id ORDER BY event_id) AS prev
             |           FROM events)
             |SELECT user_id, event_id,
             |       CAST(CAST(sign((c - prev) * prev) AS BIGINT) *
             |            ((abs(c - prev) * 2000000 + abs(prev)) // (2 * abs(prev)))
             |            AS BIGINT) AS pct_change_ppm
             |FROM p WHERE prev IS NOT NULL AND prev <> 0
             |ORDER BY user_id, event_id""".stripMargin))
  )
}

// ——— formerly Round9k.scala ———
/** Round-9 eleventh wave: the classic TPC-H benchmark queries the fixture
  * schema supports verbatim (Q3, Q6, Q10, Q18), as declared contract keys
  * — the flagship multi-join analytics shapes a user of any warehouse
  * engine runs on day one, adapted only where the synthetic schema lacks
  * a column (no o_shippriority / c_address) and hardened per the repo's
  * determinism rules: money flows as round(expr·100) integer cents (the
  * 0-dp round both engines compute identically on the same double — R3's
  * safe member), dates surface as DATE (R4), and every ORDER BY carries a
  * unique tiebreaker (R2).
  *
  * Scale notes: Q3/Q10 are selective fact joins that Catalyst plans as
  * broadcast(dim)⋈shuffle(fact) with the date filters pushed to the
  * parquet scans; Q6 is a pure pushed-filter scan aggregate (the
  * vectorized-reader speed-of-light query); Q18's HAVING subquery is one
  * self-aggregate semi join on the order key.
  */
object Round9k {
  import graft.{Decl, Tables}


  private def q(spark: org.apache.spark.sql.SparkSession, d: String, sql: String) = {
    Tables.views(spark, d)
    spark.sql(sql)
  }

  private val Q3 =
    """SELECT l_orderkey,
      |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_c,
      |       CAST(o_orderdate AS DATE) AS order_date
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue_c DESC, l_orderkey LIMIT 10""".stripMargin

  private val Q6 =
    """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_c
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  private val Q10 =
    """SELECT c_custkey, c_name,
      |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_c,
      |       round(c_acctbal, 2) AS acctbal, n_name
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |              JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue_c DESC, c_custkey LIMIT 20""".stripMargin

  private val Q18 =
    """SELECT c_name, c_custkey, o_orderkey,
      |       CAST(o_orderdate AS DATE) AS order_date,
      |       CAST(round(o_totalprice * 100) AS BIGINT) AS total_c,
      |       CAST(sum(l_quantity) AS BIGINT) AS qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY total_c DESC, o_orderkey LIMIT 100""".stripMargin

  val decls: Map[String, Decl] = Map(
    "tpch_q3"  -> Decl((s, d) => q(s, d, Q3),  Some(Q3)),
    "tpch_q6"  -> Decl((s, d) => q(s, d, Q6),  Some(Q6)),
    "tpch_q10" -> Decl((s, d) => q(s, d, Q10), Some(Q10)),
    "tpch_q18" -> Decl((s, d) => q(s, d, Q18), Some(Q18))
  )
}

// ——— formerly Round9o.scala ———
/** Round-9 fifteenth wave: bounce rate over sessionization, cumulative
  * distinct (novelty curves), and the dataset-card summary report.
  */
object Round9o {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._


  val decls: Map[String, Decl] = Map(
    // Bounce rate — single-event sessions over total sessions, the
    // product-analytics KPI built on the gaps-and-islands sessionizer
    // (window_sessionize_batch's machinery): sessions form where the
    // per-user gap exceeds 10 minutes, a session's size is one bounded
    // groupBy, and the per-type rate ships as integer ppm (R14). One
    // user-partitioned window + two aggregates; nothing corpus-wide.
    "agg_bounce_rate" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val sessions = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  unix_micros(col("ts")).as("us"))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn("new_s",
            when(col("prev_us").isNull ||
                 col("us") - col("prev_us") > 600000000L, 1L).otherwise(0L))
          .withColumn("sid", sum(col("new_s")).over(
            Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sid")
          .agg(count(lit(1)).as("n_events"),
               min(col("event_type")).as("first_type"))
        sessions.groupBy("first_type")
          .agg(count(lit(1)).as("n_sessions"),
               sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
          .select(col("first_type"), col("n_sessions"), col("n_bounces"),
                  expr("(n_bounces * 2000000L + n_sessions) div (2 * n_sessions)")
                    .as("bounce_ppm"))
          .orderBy("first_type")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |             epoch_us(ts) AS us,
             |             lag(epoch_us(ts)) OVER
             |               (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
             |               AS prev_us
             |           FROM events),
             |f AS (SELECT user_id, event_id, event_type, us,
             |        CASE WHEN prev_us IS NULL OR us - prev_us > 600000000
             |             THEN 1 ELSE 0 END AS new_s
             |      FROM e),
             |g AS (SELECT user_id, event_type,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                         ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM f),
             |sess AS (SELECT user_id, sid, count(*) AS n_events,
             |           min(event_type) AS first_type
             |         FROM g GROUP BY 1, 2)
             |SELECT first_type, CAST(count(*) AS BIGINT) AS n_sessions,
             |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_bounces,
             |       CAST((sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 2000000
             |             + count(*)) // (2 * count(*)) AS BIGINT) AS bounce_ppm
             |FROM sess GROUP BY first_type ORDER BY first_type""".stripMargin)),

    // Cumulative distinct — the novelty curve: per user in event order,
    // how many DISTINCT event types seen so far. The rolling-distinct
    // trick: flag each (user, type)'s FIRST occurrence with one
    // row_number, then a running sum of flags — two windows over the
    // same high-cardinality user partitioning, never a collect_set
    // buffer. Emitted at each event (the curve), totals bounded by the
    // type alphabet.
    "window_cumulative_distinct" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  unix_micros(col("ts")).as("us"))
        val firstW = Window.partitionBy("user_id", "event_type")
          .orderBy(col("us"), col("event_id"))
        val cumW = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("is_first",
            when(row_number().over(firstW) === 1, 1L).otherwise(0L))
          .select(col("user_id"), col("event_id"),
                  sum(col("is_first")).over(cumW).as("n_types_seen"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |             epoch_us(ts) AS us FROM events),
             |f AS (SELECT user_id, event_id, us,
             |        CASE WHEN row_number() OVER
             |               (PARTITION BY user_id, event_type ORDER BY us, event_id)
             |             = 1 THEN 1 ELSE 0 END AS is_first
             |      FROM e)
             |SELECT user_id, event_id,
             |       CAST(sum(is_first) OVER (PARTITION BY user_id
             |         ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |         AS n_types_seen
             |FROM f ORDER BY user_id, event_id""".stripMargin)),

    // Dataset card — the corpus-release summary every training-data
    // pipeline publishes: doc and language counts, token and byte
    // volume, exact-duplicate docs, and the short-doc fraction, stacked
    // long as (metric, value) BIGINT rows. Each statistic is one
    // aggregate over the documents scan (dup detection reuses the
    // md5-of-normalized-text grouping); the report is metric-count rows
    // at any corpus size.
    "pipeline_dataset_card" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val base = docs.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("n_chars")).as("total_chars"),
          sum(size(expr("filter(split(text, ' '), w -> w <> '')")).cast("bigint"))
            .as("total_tokens"),
          sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("n_short"))
        val dups = docs
          .groupBy(md5(lower(trim(col("text")))).as("h"))
          .agg(count(lit(1)).as("k"))
          .agg(coalesce(sum(when(col("k") > 1, col("k"))), lit(0L))
            .as("n_dup_docs"))
        base.crossJoin(dups)
          .select(explode(array(
            struct(lit("n_docs").as("metric"), col("n_docs").as("value")),
            struct(lit("n_langs").as("metric"), col("n_langs").as("value")),
            struct(lit("n_sources").as("metric"), col("n_sources").as("value")),
            struct(lit("total_chars").as("metric"), col("total_chars").as("value")),
            struct(lit("total_tokens").as("metric"), col("total_tokens").as("value")),
            struct(lit("n_short_docs").as("metric"), col("n_short").as("value")),
            struct(lit("n_exact_dup_docs").as("metric"), col("n_dup_docs").as("value"))
          )).as("m"))
          .select(col("m.metric").as("metric"), col("m.value").as("value"))
          .orderBy("metric")
      },
      Some("""WITH base AS (
             |  SELECT count(*) AS n_docs,
             |    count(DISTINCT lang) AS n_langs,
             |    count(DISTINCT source) AS n_sources,
             |    sum(n_chars) AS total_chars,
             |    sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
             |      AS total_tokens,
             |    sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS n_short
             |  FROM documents),
             |dups AS (SELECT coalesce(sum(CASE WHEN k > 1 THEN k END), 0)
             |           AS n_dup_docs
             |         FROM (SELECT md5(lower(trim(text))) AS h, count(*) AS k
             |               FROM documents GROUP BY 1))
             |SELECT metric, CAST(value AS BIGINT) AS value FROM (
             |  SELECT 'n_docs' AS metric, n_docs AS value FROM base
             |  UNION ALL SELECT 'n_langs', n_langs FROM base
             |  UNION ALL SELECT 'n_sources', n_sources FROM base
             |  UNION ALL SELECT 'total_chars', total_chars FROM base
             |  UNION ALL SELECT 'total_tokens', total_tokens FROM base
             |  UNION ALL SELECT 'n_short_docs', n_short FROM base
             |  UNION ALL SELECT 'n_exact_dup_docs', n_dup_docs FROM dups)
             |ORDER BY metric""".stripMargin))
  )
}

// ——— formerly Round9q.scala ———
/** Round-9 seventeenth wave: the typed Dataset API's per-group surface —
  * groupByKey + mapGroups (arbitrary compiled per-group logic) and
  * cogroup (the typed two-sided grouped merge) — both oracled against
  * relational formulations, proving the typed path computes the same
  * answers the declarative path does.
  */
object Round9q {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.functions._


  val decls: Map[String, Decl] = Map(
    // groupByKey + mapGroups — the escape hatch for per-group logic the
    // aggregate DSL can't express, here a per-customer order summary
    // computed in compiled Scala over each group's (small) order set.
    // Determinism: the group iterator's order is NOT guaranteed, so the
    // fold uses only order-insensitive reductions (count, exact cents
    // sum, struct-style min by (price desc, key asc) via explicit
    // comparison). Scale: one hash shuffle on the group key; per-group
    // state is O(1) — the shape survives any group size, unlike a
    // sort-and-buffer mapGroups.
    "typed_map_groups" -> Decl(
      (s, d) => {
        val sp = s; import sp.implicits._
        Tables.typed.orders(s, d)
          .groupByKey(_.o_custkey)
          .mapGroups { (ck, os) =>
            var n = 0L
            var cents = 0L
            var bestPrice = Long.MinValue
            var bestKey = Long.MaxValue
            os.foreach { o =>
              val c = math.rint(o.o_totalprice * 100).toLong
              n += 1; cents += c
              if (c > bestPrice || (c == bestPrice && o.o_orderkey < bestKey)) {
                bestPrice = c; bestKey = o.o_orderkey
              }
            }
            (ck, n, cents, bestKey)
          }
          .toDF("c_custkey", "n_orders", "cents", "top_orderkey")
          .orderBy("c_custkey")
      },
      Some("""SELECT o_custkey AS c_custkey, count(*) AS n_orders,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS cents,
             |  (min({'p': -CAST(round(o_totalprice * 100) AS BIGINT),
             |        'k': o_orderkey})).k AS top_orderkey
             |FROM orders GROUP BY o_custkey ORDER BY c_custkey""".stripMargin)),

    // cogroup — the typed two-sided grouped merge: customers and their
    // orders co-partitioned on the key, each pair of group iterators
    // handed to compiled logic (here: an outer summary that keeps
    // order-less customers, which a plain mapGroups over a join would
    // drop). The relational oracle is the LEFT JOIN + GROUP BY
    // equivalent. Scale: ONE co-partitioned shuffle of both sides —
    // exactly a shuffle join's data movement, with arbitrary merge logic
    // instead of a join condition.
    "typed_cogroup_join" -> Decl(
      (s, d) => {
        val sp = s; import sp.implicits._
        val custs = Tables.typed.customer(s, d).groupByKey(_.c_custkey)
        val orders = Tables.typed.orders(s, d).groupByKey(_.o_custkey)
        custs.cogroup(orders) { (ck, cs, os) =>
          cs.toSeq.headOption.map { c =>
            var n = 0L
            var cents = 0L
            os.foreach { o =>
              n += 1; cents += math.rint(o.o_totalprice * 100).toLong
            }
            (ck, c.c_mktsegment, n, cents)
          }.iterator
        }
          .toDF("c_custkey", "segment", "n_orders", "cents")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment AS segment,
             |  CAST(count(o_orderkey) AS BIGINT) AS n_orders,
             |  CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
             |       AS BIGINT) AS cents
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin))
  )
}

// ——— formerly Round9s.scala ———
/** Round-9 nineteenth wave: TPC-H Q7 (role-playing dimensions),
  * run-length encoding of event sequences, and Cohen's d effect size.
  */
object Round9s {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._


  private val Q7 =
    """SELECT supp_nation, cust_nation, l_year,
      |       CAST(sum(vol_c) AS BIGINT) AS revenue_c
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         year(l_shipdate) AS l_year,
      |         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
      |           AS vol_c
      |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      |       JOIN orders ON o_orderkey = l_orderkey
      |       JOIN customer ON c_custkey = o_custkey
      |       JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |       JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE n1.n_name <> n2.n_name
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  val decls: Map[String, Decl] = Map(
    // TPC-H Q7 — volume shipping between nation PAIRS: the role-playing
    // dimension pattern (the same nation table joined twice, once as the
    // supplier's nation and once as the customer's). Catalyst broadcasts
    // both 25-row roles; the fact side crosses one shuffle for the final
    // bounded (nation², year) aggregate. Money as integer cents per the
    // repo's R3-safe 0-dp rounding.
    "tpch_q7" -> Decl(
      (s, d) => { Tables.views(s, d); s.sql(Q7) },
      Some(Q7)),

    // Run-length encoding — compress each user's event-type sequence
    // into maximal runs (the trajectory-compression pass of session
    // modeling, and the row-level RLE idea under every columnar codec):
    // the gaps-and-islands constant rn_all − rn_type identifies runs,
    // one groupBy emits (run start, type, length). Two windows sharing
    // the user-partitioned sort; output is runs, not events.
    "window_runlength_encode" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  unix_micros(col("ts")).as("us"))
        val wAll = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val wType = Window.partitionBy("user_id", "event_type")
          .orderBy(col("us"), col("event_id"))
        ev.withColumn("isl",
            row_number().over(wAll) - row_number().over(wType))
          .groupBy(col("user_id"), col("event_type"), col("isl"))
          .agg(count(lit(1)).as("run_len"), min(col("event_id")).as("first_event"))
          .select(col("user_id"), col("event_type"), col("run_len"),
                  col("first_event"))
          .orderBy("user_id", "first_event")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |             epoch_us(ts) AS us FROM events),
             |f AS (SELECT user_id, event_id, event_type,
             |        row_number() OVER (PARTITION BY user_id
             |          ORDER BY us, event_id) -
             |        row_number() OVER (PARTITION BY user_id, event_type
             |          ORDER BY us, event_id) AS isl
             |      FROM e)
             |SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS run_len,
             |       CAST(min(event_id) AS BIGINT) AS first_event
             |FROM f GROUP BY user_id, event_type, isl
             |ORDER BY user_id, first_event""".stripMargin)),

    // Cohen's d — the effect-size companion to agg_ttest_welch's
    // significance: standardized mean difference of click vs error
    // values from the SAME exact integer sufficient statistics
    // (n, Σc, Σc²) pivoted to columns (R11), pooled SD and d in one
    // fixed double tree rounded to 6 dp. Significance says "real";
    // effect size says "big enough to matter".
    "agg_cohens_d" -> Decl(
      (s, d) => {
        val st = Tables.events(s, d)
          .filter(col("event_type").isin("click", "error"))
          .select(col("event_type"), round(col("value") * 100).cast("bigint").as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
               sum(col("c") * col("c")).as("ss"))
        st.agg(
            max(when(col("event_type") === "click", col("n"))).as("n1"),
            max(when(col("event_type") === "click", col("s"))).as("s1"),
            max(when(col("event_type") === "click", col("ss"))).as("ss1"),
            max(when(col("event_type") === "error", col("n"))).as("n2"),
            max(when(col("event_type") === "error", col("s"))).as("s2"),
            max(when(col("event_type") === "error", col("ss"))).as("ss2"))
          .select(col("n1"), col("n2"),
            round(
              (col("s1").cast("double") / col("n1").cast("double") -
               col("s2").cast("double") / col("n2").cast("double")) /
              sqrt(((col("ss1").cast("double") -
                     col("s1").cast("double") * col("s1").cast("double") /
                       col("n1").cast("double")) +
                    (col("ss2").cast("double") -
                     col("s2").cast("double") * col("s2").cast("double") /
                       col("n2").cast("double"))) /
                   (col("n1") + col("n2") - 2).cast("double")), 6).as("cohens_d"))
      },
      Some("""WITH st AS (SELECT event_type, count(*) AS n,
             |    sum(CAST(round(value * 100) AS BIGINT)) AS s,
             |    sum(CAST(round(value * 100) AS BIGINT) *
             |        CAST(round(value * 100) AS BIGINT)) AS ss
             |  FROM events WHERE event_type IN ('click', 'error')
             |  GROUP BY event_type),
             |p AS (SELECT
             |    CAST(max(CASE WHEN event_type = 'click' THEN n END) AS BIGINT) AS n1,
             |    CAST(max(CASE WHEN event_type = 'click' THEN s END) AS BIGINT) AS s1,
             |    CAST(max(CASE WHEN event_type = 'click' THEN ss END) AS BIGINT) AS ss1,
             |    CAST(max(CASE WHEN event_type = 'error' THEN n END) AS BIGINT) AS n2,
             |    CAST(max(CASE WHEN event_type = 'error' THEN s END) AS BIGINT) AS s2,
             |    CAST(max(CASE WHEN event_type = 'error' THEN ss END) AS BIGINT) AS ss2
             |  FROM st)
             |SELECT n1, n2,
             |  round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
             |         CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
             |        sqrt(((CAST(ss1 AS DOUBLE) -
             |               CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) /
             |                 CAST(n1 AS DOUBLE)) +
             |              (CAST(ss2 AS DOUBLE) -
             |               CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) /
             |                 CAST(n2 AS DOUBLE))) /
             |             CAST(n1 + n2 - 2 AS DOUBLE)), 6) AS cohens_d
             |FROM p""".stripMargin))
  )
}

// ——— formerly Round9w.scala ———
/** Round-9 twenty-third wave: on-balance volume (signed cumulative flow)
  * and Kendall's τ-b rank correlation on the bounded paired grid.
  */
object Round9w {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._


  val decls: Map[String, Decl] = Map(
    // On-balance volume — the signed cumulative flow indicator: each
    // event contributes its cents with the SIGN of the value change
    // (up-move accumulates, down-move drains, unchanged contributes
    // nothing). One lag + one running sum over the same user-partitioned
    // sort, every quantity an exact BIGINT — the finance twin of
    // window_drawdown_max's running-extreme machinery.
    "window_obv_flow" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        val cum = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .withColumn("prev", lag(col("c"), 1).over(w))
          .withColumn("flow",
            when(col("prev").isNull || col("c") === col("prev"), 0L)
              .when(col("c") > col("prev"), col("c"))
              .otherwise(-col("c")))
          .select(col("user_id"), col("event_id"),
                  sum(col("flow")).over(cum).as("obv"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |             CAST(round(value * 100) AS BIGINT) AS c,
             |             lag(CAST(round(value * 100) AS BIGINT)) OVER
             |               (PARTITION BY user_id ORDER BY event_id) AS prev
             |           FROM events),
             |f AS (SELECT user_id, event_id,
             |        CASE WHEN prev IS NULL OR c = prev THEN 0
             |             WHEN c > prev THEN c ELSE -c END AS flow
             |      FROM e)
             |SELECT user_id, event_id,
             |       CAST(sum(flow) OVER (PARTITION BY user_id ORDER BY event_id
             |                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |         AS obv
             |FROM f ORDER BY user_id, event_id""".stripMargin)),

    // Kendall's τ-b — the concordance rank correlation completing the
    // pair with agg_spearman_corr: hourly click vs purchase cents paired
    // by hour, every (i, j) hour pair classified concordant / discordant
    // by the INTEGER product sign (x_i−x_j)(y_i−y_j), tie corrections
    // from integer counts, one terminal sqrt tree rounded to 6 dp. The
    // pair self-join is bounded-grid² (hours, not events) — the corpus
    // crosses one aggregate shuffle only.
    "agg_kendall_tau" -> Decl(
      (s, d) => {
        val g = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .groupBy(expr("unix_micros(ts) div 3600000000L").as("hr"))
          .pivot("event_type", Seq("click", "purchase"))
          .agg(sum(round(col("value") * 100).cast("bigint")))
          .filter(col("click").isNotNull && col("purchase").isNotNull)
          .select(col("hr"), col("click").as("x"), col("purchase").as("y"))
          .localCheckpoint(true)
        val pairs = g.as("a").join(g.as("b"), col("a.hr") < col("b.hr"))
          .select(((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")))
                    .as("prod"),
                  (col("a.x") === col("b.x")).cast("long").as("tx"),
                  (col("a.y") === col("b.y")).cast("long").as("ty"))
        pairs.agg(count(lit(1)).as("n0"),
                  sum(when(col("prod") > 0, 1L).otherwise(0L)).as("c"),
                  sum(when(col("prod") < 0, 1L).otherwise(0L)).as("dd"),
                  sum(col("tx")).as("n1"), sum(col("ty")).as("n2"))
          .select(col("n0"), col("c"), col("dd"),
            round((col("c") - col("dd")).cast("double") /
                  sqrt((col("n0") - col("n1")).cast("double") *
                       (col("n0") - col("n2")).cast("double")), 6).as("tau_b"))
      },
      Some("""WITH g AS (SELECT epoch_us(ts) // 3600000000 AS hr,
             |    sum(CASE WHEN event_type = 'click'
             |        THEN CAST(round(value * 100) AS BIGINT) END) AS x,
             |    sum(CASE WHEN event_type = 'purchase'
             |        THEN CAST(round(value * 100) AS BIGINT) END) AS y
             |  FROM events WHERE event_type IN ('click', 'purchase')
             |  GROUP BY 1
             |  HAVING x IS NOT NULL AND y IS NOT NULL),
             |p AS (SELECT (a.x - b.x) * (a.y - b.y) AS prod,
             |        CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             |        CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
             |      FROM g a JOIN g b ON a.hr < b.hr),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n0,
             |         CAST(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |         CAST(sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd,
             |         CAST(sum(tx) AS BIGINT) AS n1,
             |         CAST(sum(ty) AS BIGINT) AS n2
             |       FROM p)
             |SELECT n0, c, dd,
             |  round(CAST(c - dd AS DOUBLE) /
             |        sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE)), 6)
             |    AS tau_b
             |FROM st""".stripMargin))
  )
}

// ——— formerly Round9x.scala ———
/** Round-9 twenty-fourth wave: turning-point census (local extrema per
  * series) and Luhn checksum validation — both pure integer arithmetic.
  */
object Round9x {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._


  val decls: Map[String, Decl] = Map(
    // Turning points — strict local maxima / minima per user's value
    // series: the zigzag/swing census of trend analysis. One lag + one
    // lead on the shared user sort, strict integer comparisons only
    // (plateau points are neither), bounded per-user output row.
    "window_turning_points" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .withColumn("p", lag(col("c"), 1).over(w))
          .withColumn("nx", lead(col("c"), 1).over(w))
          .filter(col("p").isNotNull && col("nx").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_interior"),
               sum(when(col("c") > col("p") && col("c") > col("nx"), 1L)
                 .otherwise(0L)).as("n_peaks"),
               sum(when(col("c") < col("p") && col("c") < col("nx"), 1L)
                 .otherwise(0L)).as("n_troughs"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |             CAST(round(value * 100) AS BIGINT) AS c,
             |             lag(CAST(round(value * 100) AS BIGINT)) OVER w AS p,
             |             lead(CAST(round(value * 100) AS BIGINT)) OVER w AS nx
             |           FROM events
             |           WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_interior,
             |  CAST(sum(CASE WHEN c > p AND c > nx THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_peaks,
             |  CAST(sum(CASE WHEN c < p AND c < nx THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_troughs
             |FROM e WHERE p IS NOT NULL AND nx IS NOT NULL
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Luhn checksum — the mod-10 check-digit validation behind card and
    // id-number intake: a synthetic 8-digit account number is minted from
    // the order key, its Luhn check digit computed by the doubled-digit
    // fold, and the full 9-digit number re-validated (valid = 1 on every
    // row — the oracle hashes the PROOF). Pure per-row integer/HOF
    // arithmetic riding the scan (the fold is over the padded 8-char
    // digit array, positions from the right alternate doubling).
    "scalar_luhn_check" -> Decl(
      (s, d) => {
        Tables(s, d, "orders")
          .select(col("o_orderkey"),
                  lpad((col("o_orderkey") % 100000000L).cast("string"), 8, "0")
                    .as("acct"))
          // sum over digits: from the right, double every odd position
          // (1-indexed from the right = positions 1,3,5,7 of the reversed
          // string), subtract 9 when the doubled digit exceeds 9
          .withColumn("luhn_sum", expr(
            """aggregate(
              |  transform(split(reverse(acct), ''),
              |    (ch, i) -> CASE
              |      WHEN ch = '' THEN 0L
              |      WHEN i % 2 = 0 THEN
              |        CASE WHEN CAST(ch AS BIGINT) * 2 > 9
              |             THEN CAST(ch AS BIGINT) * 2 - 9
              |             ELSE CAST(ch AS BIGINT) * 2 END
              |      ELSE CAST(ch AS BIGINT) END),
              |  0L, (a, x) -> a + x)""".stripMargin))
          .withColumn("check_digit", (lit(10L) - col("luhn_sum") % 10L) % 10L)
          .select(col("o_orderkey"),
                  concat(col("acct"), col("check_digit").cast("string"))
                    .as("account_number"),
                  col("check_digit"))
          .orderBy("o_orderkey")
      },
      Some("""WITH a AS (SELECT o_orderkey,
             |    lpad(CAST(o_orderkey % 100000000 AS VARCHAR), 8, '0') AS acct
             |  FROM orders),
             |s AS (SELECT o_orderkey, acct,
             |    list_sum(list_transform(string_split(reverse(acct), ''),
             |      (ch, i) -> CASE
             |        WHEN (i - 1) % 2 = 0 THEN
             |          CASE WHEN CAST(ch AS BIGINT) * 2 > 9
             |               THEN CAST(ch AS BIGINT) * 2 - 9
             |               ELSE CAST(ch AS BIGINT) * 2 END
             |        ELSE CAST(ch AS BIGINT) END)) AS luhn_sum
             |  FROM a)
             |SELECT o_orderkey,
             |  acct || CAST((10 - luhn_sum % 10) % 10 AS VARCHAR)
             |    AS account_number,
             |  CAST((10 - luhn_sum % 10) % 10 AS BIGINT) AS check_digit
             |FROM s ORDER BY o_orderkey""".stripMargin))
  )
}

// ——— round-12 wave 106: typed Dataset API — flatMapGroups & reduceGroups ———
/** Round-12 wave 106: the two typed grouped surfaces the family still
  * lacked — variable-fan-out `flatMapGroups` and the semigroup
  * `mapValues(...).reduceGroups` pair. Exact-integer group logic keeps
  * the compiled closures hash-twin-safe.
  */
object TypedWave106 {
  import graft.{Decl, Tables}
  import org.apache.spark.sql.functions._

  val decls: Map[String, Decl] = Map(
    // flatMapGroups: per customer, emit one row PER ORDER whose total
    // strictly exceeds the customer's mean order value — the comparison
    // is the EXACT integer cross-multiply c·n > Σc (no division), and
    // the group buffers at most the customer's order count (≤ ~40 on
    // TPC-H at any SF — per-key bounded, not corpus-bounded). The
    // variable fan-out (0..n rows per group) is the API point mapGroups
    // can't express.
    "typed_flatmap_groups" -> Decl(
      (s, d) => {
        val sp = s; import sp.implicits._
        Tables.typed.orders(s, d)
          .groupByKey(_.o_custkey)
          .flatMapGroups { (ck, os) =>
            val buf = os.map(o =>
              (o.o_orderkey, math.rint(o.o_totalprice * 100).toLong)).toSeq
            val n = buf.size.toLong
            val tot = buf.map(_._2).sum
            buf.iterator.collect {
              case (ok, c) if c * n > tot => (ck, ok, c, n)
            }
          }
          .toDF("c_custkey", "o_orderkey", "cents", "n_orders")
          .orderBy("c_custkey", "o_orderkey")
      },
      Some("""WITH t AS (
             |  SELECT o_custkey AS c_custkey,
             |         CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |              AS BIGINT) AS tot
             |  FROM orders GROUP BY o_custkey)
             |SELECT c_custkey, o_orderkey,
             |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |       n AS n_orders
             |FROM orders JOIN t ON o_custkey = c_custkey
             |WHERE CAST(round(o_totalprice * 100) AS BIGINT) * n > tot
             |ORDER BY c_custkey, o_orderkey""".stripMargin)),

    // mapValues + reduceGroups: lineitems reduce per order under the
    // associative merge (Σ quantity-units, min ship-micros) — the typed
    // semigroup fold whose state never buffers the group (contrast the
    // flatMapGroups key above). Top-20 by the reduced quantity keeps the
    // output bounded.
    "typed_reduce_groups" -> Decl(
      (s, d) => {
        val sp = s; import sp.implicits._
        Tables.typed.lineitem(s, d)
          .groupByKey(_.l_orderkey)
          .mapValues { l =>
            // epoch micros from the java.sql.Timestamp (UTC session)
            val us = l.l_shipdate.getTime / 1000 * 1000000L +
              l.l_shipdate.getNanos / 1000
            (math.rint(l.l_quantity * 100).toLong, us)
          }
          .reduceGroups((a, b) =>
            (a._1 + b._1, math.min(a._2, b._2)))
          .map { case (ok, (q, ship)) => (ok, q, ship) }
          .toDF("l_orderkey", "qty_units", "first_ship_us")
          .orderBy(col("qty_units").desc, col("l_orderkey"))
          .limit(20)
      },
      Some("""SELECT l_orderkey,
             |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
             |            AS BIGINT) AS qty_units,
             |       CAST(min(epoch_us(CAST(l_shipdate AS TIMESTAMP)))
             |            AS BIGINT) AS first_ship_us
             |FROM lineitem GROUP BY l_orderkey
             |ORDER BY qty_units DESC, l_orderkey LIMIT 20""".stripMargin))
  )
}
