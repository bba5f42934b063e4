package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 third wave — the data-quality / pipeline-operations family a
  * production 100 TB corpus store runs nightly (column profiling,
  * referential-integrity audit, constraint checking), plus deterministic
  * per-key reservoir sampling through the native TopKPerKey plan and two
  * exact-integer time-series diagnostics (seasonal profile,
  * cross-correlation).
  *
  * Scale doctrine shared by the family: every report's OUTPUT is bounded
  * by schema size (columns × constraints × FK edges), never by data size,
  * and every input pass is a single scan feeding partial aggregates — the
  * shapes that survive 1000 executors unchanged.
  */
object Round9c {

  /** Per-column profile entries stacked long — built from ONE aggregate
    * row so the table is scanned once (plus the unavoidable count-distinct
    * Expand), then exploded driver-free into (column, stat) rows.
    */
  val decls: Map[String, Decl] = Map(
    // Column profiler (Deequ/Great-Expectations "analyze" pass): one scan
    // of lineitem computes n / nulls / exact NDV / min / max for six
    // representative columns (two int keys, two doubles-as-cents, one
    // string, one timestamp), emitted LONG (one row per column) so the
    // report schema is fixed while the profiled table is arbitrary.
    // Numeric min/max ride an integer-cents lattice; the timestamp maps
    // to epoch micros; the string column reports NULL bounds (cross-engine
    // string collation is not part of the contract). The count-distinct
    // Expand is the exact-NDV price — the approximate profiler variant is
    // agg_approx_distinct's HLL. Output is bounded by column count: 6 rows
    // at any data scale.
    "profile_column_stats" -> Decl(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        def cents(c: String) = round(col(c) * 100).cast("bigint")
        val one = li.agg(
          count(lit(1)).as("n"),
          // l_orderkey
          countDistinct(col("l_orderkey")).as("ok_ndv"),
          min(col("l_orderkey")).as("ok_min"), max(col("l_orderkey")).as("ok_max"),
          // l_partkey
          countDistinct(col("l_partkey")).as("pk_ndv"),
          min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
          // l_quantity (integer-valued doubles; cents lattice for generality)
          countDistinct(col("l_quantity")).as("qt_ndv"),
          min(cents("l_quantity")).as("qt_min"), max(cents("l_quantity")).as("qt_max"),
          // l_extendedprice
          countDistinct(col("l_extendedprice")).as("ep_ndv"),
          min(cents("l_extendedprice")).as("ep_min"), max(cents("l_extendedprice")).as("ep_max"),
          // l_returnflag (string: NDV only)
          countDistinct(col("l_returnflag")).as("rf_ndv"),
          // l_shipdate → epoch micros
          countDistinct(col("l_shipdate")).as("sd_ndv"),
          min(unix_micros(col("l_shipdate").cast("timestamp"))).as("sd_min"),
          max(unix_micros(col("l_shipdate").cast("timestamp"))).as("sd_max"))
        one.select(explode(array(
            struct(lit("l_orderkey").as("col_name"), col("n"),
                   col("ok_ndv").as("ndv"), col("ok_min").as("min_v"), col("ok_max").as("max_v")),
            struct(lit("l_partkey").as("col_name"), col("n"),
                   col("pk_ndv").as("ndv"), col("pk_min").as("min_v"), col("pk_max").as("max_v")),
            struct(lit("l_quantity").as("col_name"), col("n"),
                   col("qt_ndv").as("ndv"), col("qt_min").as("min_v"), col("qt_max").as("max_v")),
            struct(lit("l_extendedprice").as("col_name"), col("n"),
                   col("ep_ndv").as("ndv"), col("ep_min").as("min_v"), col("ep_max").as("max_v")),
            struct(lit("l_returnflag").as("col_name"), col("n"),
                   col("rf_ndv").as("ndv"), lit(null).cast("bigint").as("min_v"),
                   lit(null).cast("bigint").as("max_v")),
            struct(lit("l_shipdate").as("col_name"), col("n"),
                   col("sd_ndv").as("ndv"), col("sd_min").as("min_v"), col("sd_max").as("max_v"))
          )).as("p"))
          .select(col("p.col_name").as("col_name"), col("p.n").as("n_rows"),
                  col("p.ndv").as("n_distinct"), col("p.min_v").as("min_v"),
                  col("p.max_v").as("max_v"))
          .orderBy("col_name")
      },
      Some("""WITH a AS (
             |  SELECT count(*) AS n,
             |    count(DISTINCT l_orderkey) AS ok_ndv,
             |      min(l_orderkey) AS ok_min, max(l_orderkey) AS ok_max,
             |    count(DISTINCT l_partkey) AS pk_ndv,
             |      min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
             |    count(DISTINCT l_quantity) AS qt_ndv,
             |      min(CAST(round(l_quantity * 100) AS BIGINT)) AS qt_min,
             |      max(CAST(round(l_quantity * 100) AS BIGINT)) AS qt_max,
             |    count(DISTINCT l_extendedprice) AS ep_ndv,
             |      min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS ep_min,
             |      max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS ep_max,
             |    count(DISTINCT l_returnflag) AS rf_ndv,
             |    count(DISTINCT l_shipdate) AS sd_ndv,
             |      min(epoch_us(l_shipdate)) AS sd_min,
             |      max(epoch_us(l_shipdate)) AS sd_max
             |  FROM lineitem)
             |SELECT col_name, CAST(n AS BIGINT) AS n_rows,
             |       CAST(ndv AS BIGINT) AS n_distinct,
             |       CAST(min_v AS BIGINT) AS min_v, CAST(max_v AS BIGINT) AS max_v
             |FROM (
             |  SELECT 'l_orderkey' AS col_name, n, ok_ndv AS ndv, ok_min AS min_v, ok_max AS max_v FROM a
             |  UNION ALL SELECT 'l_partkey', n, pk_ndv, pk_min, pk_max FROM a
             |  UNION ALL SELECT 'l_quantity', n, qt_ndv, qt_min, qt_max FROM a
             |  UNION ALL SELECT 'l_extendedprice', n, ep_ndv, ep_min, ep_max FROM a
             |  UNION ALL SELECT 'l_returnflag', n, rf_ndv, NULL, NULL FROM a
             |  UNION ALL SELECT 'l_shipdate', n, sd_ndv, sd_min, sd_max FROM a)
             |ORDER BY col_name""".stripMargin)),

    // Referential-integrity audit across the star schema: per FK edge, the
    // child row count and the orphan count (child keys with no parent).
    // Fixture FKs are intact, so a PARTIAL parent snapshot (only 'F'-status
    // orders — a deterministic stand-in for a broken incremental load)
    // provides the provably non-zero violation path; the audit exercises
    // both outcomes. Scale: the lineitem edges are ONE left join on
    // l_orderkey computing both edge verdicts in the same pass (parent
    // presence + parent-snapshot presence as two conditional counts);
    // dimension edges broadcast their parents. Output = 5 rows at any
    // data size.
    "quality_fk_orphans" -> Decl(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val ord = Tables(s, d, "orders")
        val edge1 = li
          .join(ord.select(col("o_orderkey"), col("o_orderstatus")),
                col("l_orderkey") === col("o_orderkey"), "left_outer")
          .agg(count(lit(1)).as("n_child"),
               count(when(col("o_orderkey").isNull, 1)).as("miss_all"),
               count(when(col("o_orderkey").isNull ||
                          col("o_orderstatus") =!= "F", 1)).as("miss_f"))
          .select(explode(array(
            struct(lit("lineitem->orders").as("edge"),
                   col("n_child"), col("miss_all").as("n_orphans")),
            struct(lit("lineitem->orders[F]").as("edge"),
                   col("n_child"), col("miss_f").as("n_orphans")))).as("e"))
          .select(col("e.edge").as("edge"), col("e.n_child").as("n_child"),
                  col("e.n_orphans").as("n_orphans"))
        def dimEdge(name: String, child: DataFrame, ck: String,
                    parent: DataFrame, pk: String): DataFrame =
          child.join(broadcast(parent.select(col(pk))),
                     col(ck) === col(pk), "left_outer")
            .agg(count(lit(1)).as("n_child"),
                 count(when(col(pk).isNull, 1)).as("n_orphans"))
            .select(lit(name).as("edge"), col("n_child"), col("n_orphans"))
        val cust = Tables(s, d, "customer")
        val nat = Tables(s, d, "nation")
        edge1
          .unionByName(dimEdge("orders->customer", ord, "o_custkey", cust, "c_custkey"))
          .unionByName(dimEdge("customer->nation", cust, "c_nationkey", nat, "n_nationkey"))
          .unionByName(dimEdge("supplier->nation", Tables(s, d, "supplier"),
                               "s_nationkey", nat, "n_nationkey"))
          .orderBy("edge")
      },
      Some("""WITH e1 AS (
             |  SELECT count(*) AS n_child,
             |    count(*) FILTER (WHERE o.o_orderkey IS NULL) AS miss_all,
             |    count(*) FILTER (WHERE o.o_orderkey IS NULL OR o.o_orderstatus <> 'F') AS miss_f
             |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
             |SELECT edge, CAST(n_child AS BIGINT) AS n_child,
             |       CAST(n_orphans AS BIGINT) AS n_orphans FROM (
             |  SELECT 'lineitem->orders' AS edge, n_child, miss_all AS n_orphans FROM e1
             |  UNION ALL SELECT 'lineitem->orders[F]', n_child, miss_f FROM e1
             |  UNION ALL
             |  SELECT 'orders->customer', count(*),
             |         count(*) FILTER (WHERE c.c_custkey IS NULL)
             |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
             |  UNION ALL
             |  SELECT 'customer->nation', count(*),
             |         count(*) FILTER (WHERE n.n_nationkey IS NULL)
             |  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  UNION ALL
             |  SELECT 'supplier->nation', count(*),
             |         count(*) FILTER (WHERE n.n_nationkey IS NULL)
             |  FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey)
             |ORDER BY edge""".stripMargin)),

    // Constraint report (the Deequ "verification" pass): one row per
    // declared constraint with rows checked, violation count, and a 0/1
    // verdict. Constraints chosen to exercise both verdicts on the
    // fixtures: uniqueness (n − NDV), domain membership, range bounds, and
    // an intentionally-failing tight range. Each source table contributes
    // ONE aggregate scan; the report is constraint-count rows forever.
    "quality_constraint_report" -> Decl(
      (s, d) => {
        val ord = Tables(s, d, "orders")
        val li = Tables(s, d, "lineitem")
        val oAgg = ord.agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("ndv"),
          count(when(!col("o_orderstatus").isin("F", "O", "P"), 1)).as("bad_status"))
          .select(explode(array(
            struct(lit("orders.o_orderkey UNIQUE").as("constraint_name"),
                   col("n").as("n_checked"), (col("n") - col("ndv")).as("n_violations")),
            struct(lit("orders.o_orderstatus IN (F,O,P)").as("constraint_name"),
                   col("n").as("n_checked"), col("bad_status").as("n_violations"))))
            .as("c"))
        val lAgg = li.agg(
          count(lit(1)).as("n"),
          count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)).as("bad_qty"),
          count(when(col("l_discount") < 0 || col("l_discount") > 0.05, 1)).as("bad_disc"),
          count(when(col("l_extendedprice").isNull, 1)).as("null_price"))
          .select(explode(array(
            struct(lit("lineitem.l_quantity IN [1,50]").as("constraint_name"),
                   col("n").as("n_checked"), col("bad_qty").as("n_violations")),
            struct(lit("lineitem.l_discount IN [0,0.05]").as("constraint_name"),
                   col("n").as("n_checked"), col("bad_disc").as("n_violations")),
            struct(lit("lineitem.l_extendedprice NOT NULL").as("constraint_name"),
                   col("n").as("n_checked"), col("null_price").as("n_violations"))))
            .as("c"))
        oAgg.unionByName(lAgg)
          .select(col("c.constraint_name").as("constraint_name"),
                  col("c.n_checked").as("n_checked"),
                  col("c.n_violations").as("n_violations"),
                  when(col("c.n_violations") === 0, 1L).otherwise(0L).as("passed"))
          .orderBy("constraint_name")
      },
      Some("""WITH o AS (SELECT count(*) AS n, count(DISTINCT o_orderkey) AS ndv,
             |    count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')) AS bad_status
             |  FROM orders),
             |l AS (SELECT count(*) AS n,
             |    count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS bad_qty,
             |    count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.05) AS bad_disc,
             |    count(*) FILTER (WHERE l_extendedprice IS NULL) AS null_price
             |  FROM lineitem)
             |SELECT constraint_name, CAST(n_checked AS BIGINT) AS n_checked,
             |       CAST(n_violations AS BIGINT) AS n_violations,
             |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
             |FROM (
             |  SELECT 'orders.o_orderkey UNIQUE' AS constraint_name, n AS n_checked,
             |         n - ndv AS n_violations FROM o
             |  UNION ALL SELECT 'orders.o_orderstatus IN (F,O,P)', n, bad_status FROM o
             |  UNION ALL SELECT 'lineitem.l_quantity IN [1,50]', n, bad_qty FROM l
             |  UNION ALL SELECT 'lineitem.l_discount IN [0,0.05]', n, bad_disc FROM l
             |  UNION ALL SELECT 'lineitem.l_extendedprice NOT NULL', n, null_price FROM l)
             |ORDER BY constraint_name""".stripMargin)),

    // Deterministic per-key reservoir sample — exact k rows per key with
    // uniform-hash tickets (md5 over the unique key, so re-runs and
    // engines agree bit-for-bit; the streaming/distributed-safe stand-in
    // for rand()-based reservoir sampling). Runs through the NATIVE
    // TopKPerKey plan: bounded k-row heap per key after one hash shuffle —
    // never a per-group sort — so a group with 10⁹ rows costs k slots of
    // state. Oracle is the row_number formulation, proving the custom
    // operator equals the stock plan on ticket order.
    "sample_reservoir_perkey" -> Decl(
      (s, d) => {
        val t = Tables(s, d, "orders")
          .withColumn("ticket", md5(concat(lit("rsv"), col("o_orderkey").cast("string"))))
        graft.plans.TopK.perKey(
            t, Seq("o_orderpriority"),
            Seq("ticket" -> false, "o_orderkey" -> false), 4)
          .select(col("o_orderpriority"), col("o_orderkey"), col("ticket"))
          .orderBy("o_orderpriority", "ticket", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey, ticket FROM (
             |  SELECT o_orderpriority, o_orderkey,
             |         md5('rsv' || CAST(o_orderkey AS VARCHAR)) AS ticket,
             |         row_number() OVER (PARTITION BY o_orderpriority
             |           ORDER BY md5('rsv' || CAST(o_orderkey AS VARCHAR)) ASC,
             |                    o_orderkey ASC) AS rn
             |  FROM orders)
             |WHERE rn <= 4 ORDER BY o_orderpriority, ticket, o_orderkey""".stripMargin)),

    // Hour-of-day seasonal profile per event type — the detector baseline
    // behind "is this hour anomalous for this stream". Grid is bounded
    // (5 types × 24 hours) so per-cell sums are one partial-aggregating
    // shuffle; the peak flag compares EXACT integers: cell deviation
    // |sum_c·n_t − sum_t·n_c| (the cross-multiplied distance of the cell
    // mean from the type mean) against the type's max via a struct-max
    // broadcast — no float mean ever compared. Products stay ≪ 2⁶³ (cents
    // ≤ 1e6·n, n ≤ 1e5 at sf0.1; the 100 TB variant widens to DECIMAL(38)
    // unchanged in shape).
    "ts_seasonal_hourofday" -> Decl(
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(col("event_type"), hour(col("ts")).cast("bigint").as("hod"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .groupBy("event_type", "hod")
          .agg(count(lit(1)).as("n_c"), sum(col("c")).as("sum_c"))
        val types = cells.groupBy("event_type")
          .agg(sum(col("n_c")).as("n_t"), sum(col("sum_c")).as("sum_t"))
        val dev = cells.join(broadcast(types), "event_type")
          .withColumn("dev_x",
            abs(col("sum_c") * col("n_t") - col("sum_t") * col("n_c")))
        val peak = dev.groupBy("event_type")
          .agg(max(struct(col("dev_x"), col("hod"))).as("m"))
          .select(col("event_type"), col("m.hod").as("peak_hod"))
        dev.join(broadcast(peak), "event_type")
          .select(col("event_type"), col("hod"), col("n_c"), col("sum_c"),
                  col("dev_x"),
                  when(col("hod") === col("peak_hod"), 1L).otherwise(0L)
                    .as("is_peak"))
          .orderBy("event_type", "hod")
      },
      Some("""WITH cells AS (
             |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
             |         count(*) AS n_c,
             |         sum(CAST(round(value * 100) AS BIGINT)) AS sum_c
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, sum(n_c) AS n_t, sum(sum_c) AS sum_t
             |      FROM cells GROUP BY 1),
             |d AS (SELECT c.event_type, c.hod, c.n_c, c.sum_c,
             |        abs(c.sum_c * t.n_t - t.sum_t * c.n_c) AS dev_x
             |      FROM cells c JOIN t USING (event_type)),
             |p AS (SELECT event_type,
             |        (max({'x': dev_x, 'h': hod})).h AS peak_hod
             |      FROM d GROUP BY 1)
             |SELECT d.event_type, d.hod, CAST(d.n_c AS BIGINT) AS n_c,
             |       CAST(d.sum_c AS BIGINT) AS sum_c,
             |       CAST(d.dev_x AS BIGINT) AS dev_x,
             |       CAST(CASE WHEN d.hod = p.peak_hod THEN 1 ELSE 0 END AS BIGINT)
             |         AS is_peak
             |FROM d JOIN p USING (event_type)
             |ORDER BY event_type, hod""".stripMargin)),

    // Cross-correlation of the hourly click-value and purchase-value
    // series at lags −2..+2 — "does stream A lead stream B". The hourly
    // grid is bounded (data-independent in width), so the lag alignment is
    // a self-join on hour+lag over that grid; all six sufficient sums are
    // exact BIGINTs per R10/R11 and only the terminal Pearson tree runs in
    // double, rounded to 6 dp. Scale: the grid aggregate is the only
    // corpus-sized pass; everything after is O(hours × lags).
    "ts_crosscorr_lagged" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_type"),
                  expr("unix_micros(ts) div 3600000000L").as("hr"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .groupBy("event_type", "hr").agg(sum(col("c")).as("v"))
        val a = ev.filter(col("event_type") === "click")
          .select(col("hr").as("ha"), col("v").as("x"))
        val b = ev.filter(col("event_type") === "purchase")
          .select(col("hr").as("hb"), col("v").as("y"))
        val lags = a.sparkSession.range(-2, 3).select(col("id").as("lag"))
        a.crossJoin(broadcast(lags))
          .join(b, col("hb") === col("ha") + col("lag"))
          .groupBy("lag")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
               sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
               sum(col("x") * col("y")).as("sxy"))
          .select(col("lag"), col("n"),
            round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
               sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
              .as("r"))
          .orderBy("lag")
      },
      Some("""WITH g AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             |         sum(CAST(round(value * 100) AS BIGINT)) AS v
             |  FROM events WHERE event_type IN ('click', 'purchase')
             |  GROUP BY 1, 2),
             |a AS (SELECT hr AS ha, v AS x FROM g WHERE event_type = 'click'),
             |b AS (SELECT hr AS hb, v AS y FROM g WHERE event_type = 'purchase'),
             |s AS (SELECT l.lag, count(*) AS n,
             |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |        CAST(sum(x * x) AS BIGINT) AS sxx,
             |        CAST(sum(y * y) AS BIGINT) AS syy,
             |        CAST(sum(x * y) AS BIGINT) AS sxy
             |      FROM a CROSS JOIN (VALUES (-2),(-1),(0),(1),(2)) l(lag)
             |           JOIN b ON b.hb = a.ha + l.lag
             |      GROUP BY 1)
             |SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
             |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
             |         (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
             |          sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS r
             |FROM s ORDER BY lag""".stripMargin))
  )
}
