package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 nineteenth wave: TPC-H Q7 (role-playing dimensions),
  * run-length encoding of event sequences, and Cohen's d effect size.
  */
object Round9s {

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
