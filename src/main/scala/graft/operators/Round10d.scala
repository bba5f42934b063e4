package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 fourth wave: entity resolution, inferential statistics, and
  * survival/periodicity analysis. Determinism discipline throughout:
  * integer sufficient statistics (cents, counts, dot products) end-to-end,
  * floats only in terminal rounded formulas (one sqrt / trig / exp-ln
  * tree over engine-identical double inputs), total ORDER BY with a
  * unique trailing key (SURVEY §7.3).
  */
object Round10d {

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
