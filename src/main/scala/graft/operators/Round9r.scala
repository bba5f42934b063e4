package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 eighteenth wave: discrete-time survival hazards, graph degree
  * assortativity, and the Lorenz concentration curve — each exact on a
  * bounded grid with at most one terminal float tree.
  */
object Round9r {

  val decls: Map[String, Decl] = Map(
    // Discrete-time hazard — survival analysis without float products
    // (the Kaplan–Meier trap): per capped gap-week k, the hazard is
    // events(k) / at-risk(k) where at-risk is the reverse cumulative
    // count over the BOUNDED 13-week grid, so every quantity is an exact
    // BIGINT and the hazard ships as integer ppm (R14). Inputs are the
    // inter-purchase gaps (ts_interpurchase_hist's machinery). The
    // churn/retention readout of any subscription pipeline.
    "ts_discrete_hazard" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("dt").asc, col("o_orderkey").asc)
        val gaps = Tables(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
                  col("o_orderdate").cast("date").as("dt"))
          .withColumn("prev", lag(col("dt"), 1).over(w))
          .filter(col("prev").isNotNull)
          .select(least(floor(datediff(col("dt"), col("prev")) / 7).cast("bigint"),
                        lit(12L)).as("k"))
          .groupBy("k").agg(count(lit(1)).as("n_events"))
        val rev = Window.orderBy(col("k").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        gaps.select(col("k"), col("n_events"),
                    sum(col("n_events")).over(rev).as("n_at_risk"))
          .select(col("k"), col("n_at_risk"), col("n_events"),
                  expr("(n_events * 2000000L + n_at_risk) div (2 * n_at_risk)")
                    .as("hazard_ppm"))
          .orderBy("k")
      },
      Some("""WITH p AS (
             |  SELECT CAST(o_orderdate AS DATE) AS dt,
             |         lag(CAST(o_orderdate AS DATE)) OVER w AS prev
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey
             |               ORDER BY CAST(o_orderdate AS DATE) ASC,
             |                        o_orderkey ASC)),
             |g AS (SELECT least(CAST(floor(date_diff('day', prev, dt) / 7)
             |                        AS BIGINT), 12) AS k,
             |        count(*) AS n_events
             |      FROM p WHERE prev IS NOT NULL GROUP BY 1),
             |r AS (SELECT k, n_events,
             |        sum(n_events) OVER (ORDER BY k DESC
             |                            ROWS UNBOUNDED PRECEDING) AS n_at_risk
             |      FROM g)
             |SELECT k, CAST(n_at_risk AS BIGINT) AS n_at_risk,
             |       CAST(n_events AS BIGINT) AS n_events,
             |       CAST((n_events * 2000000 + n_at_risk) // (2 * n_at_risk)
             |            AS BIGINT) AS hazard_ppm
             |FROM r ORDER BY k""".stripMargin)),

    // Degree assortativity — do high-degree nodes attach to high-degree
    // nodes? Pearson correlation of endpoint degrees over the
    // SYMMETRIZED edge list (both directions, the undirected convention)
    // of the deterministic kcore graph (ring + chords + core, bounded
    // degree by construction). Degrees are bounded ints, the six
    // sufficient sums are exact BIGINTs, and r is one fixed double tree
    // rounded to 6 dp (R11). One degree aggregate + two hash joins keyed
    // on the endpoints.
    "graph_assortativity" -> Decl(
      (s, d) => {
        val cust = Tables(s, d, "customer").select(col("c_custkey").as("u"))
        val nRow = cust.agg(max(col("u")).as("N"))
        val raw = cust.crossJoin(broadcast(nRow))
        val ed = raw
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
          .select(least(col("u"), col("x")).as("lo"),
                  greatest(col("u"), col("x")).as("hi"))
          .distinct()
          .localCheckpoint(true)
        val deg = ed.select(col("lo").as("v")).unionByName(ed.select(col("hi").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        val sym = ed.select(col("lo").as("a"), col("hi").as("b"))
          .unionByName(ed.select(col("hi").as("a"), col("lo").as("b")))
          .join(deg.select(col("v").as("a"), col("deg").as("dx")), "a")
          .join(deg.select(col("v").as("b"), col("deg").as("dy")), "b")
        sym.agg(count(lit(1)).as("m"),
                sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
                sum(col("dx") * col("dx")).as("sxx"),
                sum(col("dy") * col("dy")).as("syy"),
                sum(col("dx") * col("dy")).as("sxy"))
          .select(col("m"),
            round((col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")) *
               sqrt((col("m") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
              .as("assortativity"))
      },
      Some("""WITH n AS (SELECT max(c_custkey) AS N FROM customer),
             |raw AS (SELECT c_custkey AS u FROM customer),
             |ed AS (SELECT DISTINCT least(u, x) AS lo, greatest(u, x) AS hi FROM (
             |  SELECT u, (u % N) + 1 AS x FROM raw, n
             |  UNION ALL SELECT u, ((u*13+5) % N) + 1 FROM raw, n WHERE u % 4 = 0
             |  UNION ALL SELECT u, u + 1 FROM raw WHERE u <= 20
             |  UNION ALL SELECT u, u + 2 FROM raw WHERE u <= 20
             |  UNION ALL SELECT u, u + 3 FROM raw WHERE u <= 20
             |) WHERE u <> x),
             |deg AS (SELECT v, count(*) AS deg FROM
             |         (SELECT lo AS v FROM ed UNION ALL SELECT hi FROM ed)
             |        GROUP BY v),
             |sym AS (SELECT a, b FROM (SELECT lo AS a, hi AS b FROM ed
             |                          UNION ALL SELECT hi, lo FROM ed)),
             |j AS (SELECT da.deg AS dx, db.deg AS dy
             |      FROM sym JOIN deg da ON da.v = sym.a
             |               JOIN deg db ON db.v = sym.b),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS m,
             |         CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
             |         CAST(sum(dx * dx) AS BIGINT) AS sxx,
             |         CAST(sum(dy * dy) AS BIGINT) AS syy,
             |         CAST(sum(dx * dy) AS BIGINT) AS sxy
             |       FROM j)
             |SELECT m,
             |  round(CAST(m * sxy - sx * sy AS DOUBLE) /
             |        (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
             |         sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6) AS assortativity
             |FROM st""".stripMargin)),

    // Lorenz curve — cumulative revenue share of customer deciles, the
    // visual behind the Gini number (agg_gini_concentration). Deciles
    // come from VALUE thresholds on the bounded distinct-cents grid
    // (the percentile_disc machinery at q = 0.1 … 0.9, broadcast and
    // assigned by comparison — scan-parallel, never a global rank over
    // all customers); per-decile totals are exact BIGINTs and the
    // cumulative share ships as ppm over the 10-row grid.
    "agg_lorenz_curve" -> Decl(
      (s, d) => {
        val cust = Tables(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
        // The distinct-cents grid here is PER-CUSTOMER SUMS, which grow
        // ~|customers| (they don't saturate like a raw 2-dp value domain)
        // — so the cumulative count is the distributed two-pass prefix
        // sum, not an unpartitioned window (round-9 verdict family).
        val grid = cust.groupBy("cents").agg(count(lit(1)).as("w"))
        val tot = grid.agg(sum(col("w")).as("n"))
        val cum = PrefixSum.cumsumLong(grid, Seq(col("cents")), col("w"), "cum")
          .crossJoin(broadcast(tot))
        // threshold for decile d = smallest cents with 10·cum ≥ d·n
        val thresholds = cum
          .select(col("cents"), col("cum"), col("n"),
                  explode(expr("sequence(1L, 9L)")).as("dq"))
          .filter(col("cum") * 10 >= col("dq") * col("n"))
          .groupBy("dq").agg(min(col("cents")).as("thr"))
        val assigned = cust.crossJoin(broadcast(
            thresholds.groupBy().pivot("dq", (1 to 9).map(_.toString))
              .agg(first(col("thr")))))
          .select(col("cents"),
            (lit(1L) +
             (1 to 9).map(i => when(col(i.toString).isNotNull &&
                                    col("cents") > col(i.toString), 1L)
                                 .otherwise(0L))
               .reduce(_ + _)).as("decile"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("cents"))
        val cumD = Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val total = assigned.agg(sum(col("cents")).as("all_cents"))
        assigned
          .select(col("decile"), col("n_cust"), col("cents"),
                  sum(col("cents")).over(cumD).as("cum_cents"))
          .crossJoin(broadcast(total))
          .select(col("decile"), col("n_cust"), col("cents"),
                  expr("(cum_cents * 2000000L + all_cents) div (2 * all_cents)")
                    .as("cum_share_ppm"))
          .orderBy("decile")
      },
      Some("""WITH cust AS (SELECT o_custkey,
             |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
             |  FROM orders GROUP BY 1),
             |grid AS (SELECT cents, count(*) AS w FROM cust GROUP BY 1),
             |cum AS (SELECT cents,
             |          sum(w) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum,
             |          sum(w) OVER () AS n
             |        FROM grid),
             |thr AS (SELECT dq, min(cents) AS thr
             |        FROM cum, (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) q(dq)
             |        WHERE cum * 10 >= dq * n GROUP BY dq),
             |a AS (SELECT c.cents,
             |        1 + (SELECT count(*) FROM thr WHERE c.cents > thr.thr)
             |          AS decile
             |      FROM cust c),
             |g AS (SELECT decile, count(*) AS n_cust, sum(cents) AS cents
             |      FROM a GROUP BY 1),
             |f AS (SELECT decile, n_cust, cents,
             |        sum(cents) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
             |          AS cum_cents,
             |        sum(cents) OVER () AS all_cents
             |      FROM g)
             |SELECT CAST(decile AS BIGINT) AS decile,
             |       CAST(n_cust AS BIGINT) AS n_cust,
             |       CAST(cents AS BIGINT) AS cents,
             |       CAST((cum_cents * 2000000 + all_cents) // (2 * all_cents)
             |            AS BIGINT) AS cum_share_ppm
             |FROM f ORDER BY decile""".stripMargin))
  )
}
