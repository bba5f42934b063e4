package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 twelfth wave: IGNORE NULLS window semantics, inline VALUES
  * lookup joins, semver ordering, and tail risk (CVaR). Usual discipline:
  * exact integers, terminal rounded floats, unique-key total orders.
  */
object Round10l {

  val decls: Map[String, Decl] = Map(
    // IGNORE NULLS window navigation: error rows null out their value;
    // each row recovers the most recent and the second-distinct-recent
    // non-null readings in its trailing 10-row frame — the sparse-sensor
    // navigation surface (first_value/nth_value IGNORE NULLS). Window
    // partitions by user (bounded per-user history).
    "window_nth_ignore_nulls" -> Decl(
      (s, d) => {
        val f = Window.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(-9, 0)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  expr("unix_micros(ts)").as("us"),
                  when(col("event_type") =!= "error",
                       round(col("value") * 100).cast("bigint")).as("x"))
          .select(col("user_id"), col("event_id"), col("x"),
                  last(col("x"), ignoreNulls = true).over(f).as("last_good"),
                  first(col("x"), ignoreNulls = true).over(f).as("oldest_good"),
                  count(col("x")).over(f).as("n_good"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |             CAST(epoch_us(ts) AS BIGINT) AS us,
             |             CASE WHEN event_type <> 'error'
             |                  THEN CAST(round(value * 100) AS BIGINT) END AS x
             |           FROM events)
             |SELECT user_id, event_id, x,
             |       last_value(x IGNORE NULLS) OVER w AS last_good,
             |       first_value(x IGNORE NULLS) OVER w AS oldest_good,
             |       CAST(count(x) OVER w AS BIGINT) AS n_good
             |FROM e
             |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
             |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    // Inline VALUES lookup join — the literal dimension table every ETL
    // embeds (priority → SLA weight) joined against the fact, entirely in
    // SQL. The VALUES relation is a local one-pass table Catalyst
    // broadcasts for free.
    "sql_values_lookup" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT w.sla_hours, CAST(count(*) AS BIGINT) AS n_orders,
                |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                |         AS cents
                |FROM orders
                |     JOIN (VALUES ('1-URGENT', 4), ('2-HIGH', 12), ('3-MEDIUM', 24),
                |                  ('4-NOT SPECIFIED', 72), ('5-LOW', 168))
                |          AS w(prio, sla_hours)
                |       ON o_orderpriority = w.prio
                |GROUP BY w.sla_hours ORDER BY w.sla_hours""".stripMargin)
      },
      Some("""SELECT w.sla_hours, CAST(count(*) AS BIGINT) AS n_orders,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS cents
             |FROM orders
             |     JOIN (VALUES ('1-URGENT', 4), ('2-HIGH', 12), ('3-MEDIUM', 24),
             |                  ('4-NOT SPECIFIED', 72), ('5-LOW', 168))
             |          AS w(prio, sla_hours)
             |       ON o_orderpriority = w.prio
             |GROUP BY w.sla_hours ORDER BY w.sla_hours""".stripMargin)),

    // Semver mint/parse/order: a deterministic version string per part,
    // split into numeric (major, minor, patch), compared against a pin,
    // and given a zero-padded sortable key — the package-metadata scalar
    // family. Pure per-row integer/string work.
    "scalar_semver_compare" -> Decl(
      (s, d) => {
        Tables(s, d, "part")
          .select(col("p_partkey"),
                  concat((col("p_partkey") % 4L).cast("string"), lit("."),
                         (col("p_partkey") % 30L).cast("string"), lit("."),
                         (col("p_partkey") % 10L).cast("string")).as("ver"))
          .withColumn("major", split(col("ver"), "\\.").getItem(0).cast("bigint"))
          .withColumn("minor", split(col("ver"), "\\.").getItem(1).cast("bigint"))
          .withColumn("patch", split(col("ver"), "\\.").getItem(2).cast("bigint"))
          .select(col("p_partkey"), col("ver"), col("major"), col("minor"), col("patch"),
                  when(col("major") > 2L ||
                       (col("major") === 2L && (col("minor") > 0L || col("patch") > 0L)),
                       1L).otherwise(0L).as("newer_than_2_0_0"),
                  concat(lpad(col("major").cast("string"), 4, "0"), lit("."),
                         lpad(col("minor").cast("string"), 4, "0"), lit("."),
                         lpad(col("patch").cast("string"), 4, "0")).as("sort_key"))
          .orderBy("p_partkey")
      },
      Some("""WITH v AS (
             |  SELECT p_partkey,
             |         CAST(p_partkey % 4 AS VARCHAR) || '.' ||
             |         CAST(p_partkey % 30 AS VARCHAR) || '.' ||
             |         CAST(p_partkey % 10 AS VARCHAR) AS ver
             |  FROM part),
             |p AS (SELECT p_partkey, ver,
             |        CAST(string_split(ver, '.')[1] AS BIGINT) AS major,
             |        CAST(string_split(ver, '.')[2] AS BIGINT) AS minor,
             |        CAST(string_split(ver, '.')[3] AS BIGINT) AS patch
             |      FROM v)
             |SELECT p_partkey, ver, major, minor, patch,
             |       CAST(CASE WHEN major > 2 OR (major = 2 AND (minor > 0 OR patch > 0))
             |                 THEN 1 ELSE 0 END AS BIGINT) AS newer_than_2_0_0,
             |       lpad(CAST(major AS VARCHAR), 4, '0') || '.' ||
             |       lpad(CAST(minor AS VARCHAR), 4, '0') || '.' ||
             |       lpad(CAST(patch AS VARCHAR), 4, '0') AS sort_key
             |FROM p ORDER BY p_partkey""".stripMargin)),

    // Conditional value-at-risk (expected shortfall): the mean of the
    // worst 5% of order totals per priority — the tail the P99 dashboard
    // hides. Fully exact: the 95th discrete percentile from the integer
    // cumulative grid, the tail mass and its cent sum from the SAME grid
    // (boundary values weighted by exactly how much of their multiplicity
    // falls in the tail), one terminal division.
    "agg_tail_cvar" -> Decl(
      (s, d) => {
        val grid = Tables(s, d, "orders")
          .select(col("o_orderpriority").as("pr"),
                  round(col("o_totalprice") * 100).cast("bigint").as("c"))
          .groupBy("pr", "c").agg(count(lit(1)).as("w"))
        val cw = Window.partitionBy("pr").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = grid
          .select(col("pr"), col("c"), col("w"), sum(col("w")).over(cw).as("cum"))
          .join(broadcast(grid.groupBy("pr").agg(sum(col("w")).as("n"))), "pr")
        // tail size k = ceil(n/20); a grid row contributes
        // min(w, max(0, cum − (n − k))) rows to the tail
        cum
          .withColumn("k", expr("(n + 19) div 20"))
          .withColumn("in_tail",
            greatest(lit(0L), least(col("w"), col("cum") - (col("n") - col("k")))))
          .filter(col("in_tail") > 0)
          .groupBy("pr")
          .agg(max(col("k")).as("k"),
               sum(col("in_tail")).as("tail_n"),
               sum(col("in_tail") * col("c")).as("tail_cents"))
          .select(col("pr").as("o_orderpriority"), col("k"), col("tail_n"),
                  col("tail_cents"),
                  expr("tail_cents div tail_n").as("cvar_cents"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH grid AS (SELECT o_orderpriority AS pr,
             |                CAST(round(o_totalprice * 100) AS BIGINT) AS c,
             |                count(*) AS w
             |              FROM orders GROUP BY 1, 2),
             |cum AS (SELECT pr, c, w,
             |          sum(w) OVER (PARTITION BY pr ORDER BY c
             |                       ROWS UNBOUNDED PRECEDING) AS cum,
             |          sum(w) OVER (PARTITION BY pr) AS n
             |        FROM grid),
             |tail AS (SELECT pr, c, w, cum, n, (n + 19) // 20 AS k,
             |           greatest(0, least(w, cum - (n - (n + 19) // 20)))
             |             AS in_tail
             |         FROM cum)
             |SELECT pr AS o_orderpriority, CAST(max(k) AS BIGINT) AS k,
             |       CAST(sum(in_tail) AS BIGINT) AS tail_n,
             |       CAST(sum(in_tail * c) AS BIGINT) AS tail_cents,
             |       CAST(sum(in_tail * c) // sum(in_tail) AS BIGINT) AS cvar_cents
             |FROM tail WHERE in_tail > 0
             |GROUP BY pr ORDER BY o_orderpriority""".stripMargin))
  )
}
