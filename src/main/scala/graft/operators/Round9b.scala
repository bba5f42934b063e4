package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 second wave: skyline (Pareto frontier) via the sort-based 2D
  * algorithm, CDC-log fold to a snapshot, Gini concentration of the corpus
  * source mix, and an exact rolling median window.
  */
object Round9b {

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
        val ev = Tables.events(s, d)
          .select(col("event_type"),
                  round(col("value") * 100).cast("bigint").as("c"))
        def lowerMedian(src: org.apache.spark.sql.DataFrame, vcol: String) = {
          val w = Window.partitionBy("event_type").orderBy(vcol)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val grid = src.groupBy("event_type", vcol)
            .agg(count(lit(1)).as("cw"))
          val tot = grid.groupBy("event_type").agg(sum(col("cw")).as("tot"))
          grid.select(col("event_type"), col(vcol),
                      sum(col("cw")).over(w).as("cum"))
            .join(broadcast(tot), "event_type")
            .filter(lit(2L) * col("cum") >= col("tot"))
            .groupBy("event_type").agg(min(col(vcol)).as(s"med_$vcol"))
        }
        val med = lowerMedian(ev, "c")
        val dev = ev.join(broadcast(med), "event_type")
          .select(col("event_type"), col("c"), col("med_c"),
                  abs(col("c") - col("med_c")).as("ad"))
        val mad = lowerMedian(dev.select(col("event_type"), col("ad")), "ad")
        dev.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
               max(col("med_c")).as("med_cents"),
               max(col("med_ad")).as("mad_cents"),
               sum((col("ad") > lit(3L) * col("med_ad")).cast("bigint"))
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
        val q = Round9.quantized(s, d)
          .withColumn("s_id", expr("i div 8")).localCheckpoint(true)
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
        // --- encode every vector: nearest codebook entry per subspace
        val codes = q.join(broadcast(state), Seq("s_id", "i"))
          .groupBy(col("vec_id"), col("s_id"), col("cluster"))
          .agg(sum((col("cn") * col("x") - col("cs")) *
                   (col("cn") * col("x") - col("cs"))).as("num"),
               max(col("cn")).as("cn"))
          .groupBy("vec_id", "s_id")
          .agg(min(struct((col("num").cast("double") /
                           (col("cn") * col("cn")).cast("double")).as("d"),
                          col("cluster").as("c"))).as("m"))
          .select(col("vec_id"), col("s_id"), col("m.c").as("code"))
          .localCheckpoint(true)
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
