package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 fifth wave: spatial blocking, time-windowed funnels, decision
  * split search, and user-agent parsing. Same determinism discipline:
  * coordinates, timestamps, and class counts stay exact integers; floats
  * appear only in terminal rounded impurity/ratio formulas; every ORDER BY
  * ends in a unique key.
  */
object Round10e {

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
