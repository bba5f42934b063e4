package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 seventh wave: snapshot diffing (CDC generation), A/B test
  * statistics, percent-of-total reporting, and percent-change windows.
  */
object Round9g {

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
