package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 73: dynamic programming on bounded spines — dynamic
  * time warping between the daily purchase and click series (the
  * classical elastic-alignment distance; cost matrix is pure BIGINT so
  * the DP is exact) and 2-state HMM Viterbi decoding of the daily
  * high/low activity regime (the standard latent-regime smoother next
  * to the Kalman/Holt-Winters state-space keys).
  *
  * Determinism: DTW costs are |Δcount| integers — no float anywhere.
  * Viterbi runs in log space on integer observations × the same ln
  * constants; ties prefer the high state via >= in BOTH engines. Both
  * DPs recurse on the driver over the 30-day grid (the ts_holt_winters
  * discipline) and both oracles replay the identical recursion as
  * DuckDB recursive CTEs (DTW cell-by-cell with the rolling two-row
  * state; Viterbi carrying both candidate paths).
  *
  * Scale shape: each key reduces the corpus to the calendar-bounded
  * day grid in ONE aggregate; the DP itself is O(30²)/O(30) on
  * constant-size state. DTW over data-sized series would need the
  * banded/FastDTW variant — out of declared scope, documented here.
  */
object Round11q {

  val decls: Map[String, Decl] = Map(
    "ts_dtw_distance" -> Decl(
      (s, d) => {
        def series(et: String): Array[Long] = {
          val daily = Tables.events(s, d)
            .filter(col("event_type") === et)
            .groupBy(datediff(col("ts").cast("date"), to_date(lit("2023-12-31")))
                       .cast("bigint").as("t"))
            .agg(count(lit(1)).as("n"))
          s.range(1, 31).select(col("id").as("t"))
            .join(daily, Seq("t"), "left")
            .select(col("t"), coalesce(col("n"), lit(0L)).as("n"))
            .orderBy("t").collect().map(_.getLong(1))
        }
        val (a, b) = (series("purchase"), series("click"))
        val n = a.length
        var prev = new Array[Long](n)
        var cur = new Array[Long](n)
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) {
            val cost = math.abs(a(i) - b(j))
            cur(j) =
              if (i == 0 && j == 0) cost
              else if (i == 0) cost + cur(j - 1)
              else if (j == 0) cost + prev(0)
              else cost + math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
            j += 1
          }
          val t = prev; prev = cur; cur = t
          i += 1
        }
        val dtw = prev(n - 1)
        import s.implicits._
        Seq((n.toLong, dtw,
             BigDecimal(dtw.toDouble / (2 * n - 2))
               .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("n", "dtw_cost", "cost_per_step")
      },
      Some("""WITH RECURSIVE
             |a AS (SELECT g.t, CAST(coalesce(d.n, 0) AS BIGINT) AS v
             |      FROM generate_series(1, 30) g(t)
             |      LEFT JOIN (SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |                 FROM events WHERE event_type = 'purchase'
             |                 GROUP BY 1) d
             |        ON date_diff('day', DATE '2023-12-31', d.day) = g.t),
             |b AS (SELECT g.t, CAST(coalesce(d.n, 0) AS BIGINT) AS v
             |      FROM generate_series(1, 30) g(t)
             |      LEFT JOIN (SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |                 FROM events WHERE event_type = 'click'
             |                 GROUP BY 1) d
             |        ON date_diff('day', DATE '2023-12-31', d.day) = g.t),
             |av AS (SELECT list(v ORDER BY t) AS l FROM a),
             |bv AS (SELECT list(v ORDER BY t) AS l FROM b),
             |dp(step, i, j, prev, cur) AS (
             |  SELECT 0, 1, 0, CAST(NULL AS BIGINT[]), CAST([] AS BIGINT[])
             |  UNION ALL
             |  SELECT step + 1, x.ni, x.nj, x.np,
             |         x.cc || [abs(av.l[x.ni] - bv.l[x.nj]) +
             |                  CASE WHEN x.ni = 1 AND x.nj = 1 THEN 0
             |                       WHEN x.ni = 1 THEN x.cc[x.nj - 1]
             |                       WHEN x.nj = 1 THEN x.np[1]
             |                       ELSE least(x.np[x.nj], x.np[x.nj - 1],
             |                                  x.cc[x.nj - 1])
             |                  END]
             |  FROM dp CROSS JOIN av CROSS JOIN bv,
             |       LATERAL (SELECT
             |           CASE WHEN dp.j = 30 THEN dp.i + 1 ELSE dp.i END AS ni,
             |           CASE WHEN dp.j = 30 THEN 1 ELSE dp.j + 1 END AS nj,
             |           CASE WHEN dp.j = 30 THEN dp.cur ELSE dp.prev END AS np,
             |           CASE WHEN dp.j = 30 THEN CAST([] AS BIGINT[])
             |                ELSE dp.cur END AS cc) x
             |  WHERE step < 900)
             |SELECT 30 AS n, cur[30] AS dtw_cost,
             |       round(CAST(cur[30] AS DOUBLE) / 58, 6) AS cost_per_step
             |FROM dp WHERE step = 900""".stripMargin)),

    // Viterbi decode of the daily high/low regime: obs y_t = (day's
    // purchase cents × 30 > total cents); emissions 0.7/0.25,
    // transitions 0.85/0.15/0.30/0.70, uniform init; ties prefer hi.
    "ts_hmm_viterbi" -> Decl(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(datediff(col("ts").cast("date"), to_date(lit("2023-12-31")))
                     .cast("bigint").as("t"))
          .agg(sum(round(col("value") * 100).cast("bigint")).as("c"))
        val spine = s.range(1, 31).select(col("id").as("t"))
          .join(daily, Seq("t"), "left")
          .select(col("t"), coalesce(col("c"), lit(0L)).as("c"))
          .orderBy("t").collect().map(_.getLong(1))
        val total = spine.sum
        val y = spine.map(c => if (c * 30L > total) 1 else 0)
        def lg(x: Double) = math.log(x)
        def e(hi: Boolean, obs: Int): Double =
          if (hi) { if (obs == 1) lg(0.7) else lg(0.3) }
          else { if (obs == 1) lg(0.25) else lg(0.75) }
        var vHi = lg(0.5) + e(hi = true, y(0))
        var vLo = lg(0.5) + e(hi = false, y(0))
        var pHi = List("hi"); var pLo = List("lo")
        (1 until 30).foreach { t =>
          val toHiFromHi = vHi + lg(0.85); val toHiFromLo = vLo + lg(0.30)
          val toLoFromHi = vHi + lg(0.15); val toLoFromLo = vLo + lg(0.70)
          val (nvHi, npHi) =
            if (toHiFromHi >= toHiFromLo) (e(hi = true, y(t)) + toHiFromHi, "hi" :: pHi)
            else (e(hi = true, y(t)) + toHiFromLo, "hi" :: pLo)
          val (nvLo, npLo) =
            if (toLoFromHi >= toLoFromLo) (e(hi = false, y(t)) + toLoFromHi, "lo" :: pHi)
            else (e(hi = false, y(t)) + toLoFromLo, "lo" :: pLo)
          vHi = nvHi; vLo = nvLo; pHi = npHi; pLo = npLo
        }
        val path = (if (vHi >= vLo) pHi else pLo).reverse
        import s.implicits._
        path.zipWithIndex.map { case (st, i) => (i + 1L, y(i), st) }
          .toDF("day", "obs", "state")
          .orderBy("day")
      },
      Some(s"""WITH RECURSIVE daily AS (
              |  SELECT date_diff('day', DATE '2023-12-31', CAST(ts AS DATE)) AS t,
              |         sum(CAST(round(value * 100) AS BIGINT)) AS c
              |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
              |spine AS (SELECT g.t, coalesce(c, 0) AS c
              |          FROM generate_series(1, 30) g(t)
              |          LEFT JOIN daily ON daily.t = g.t),
              |tot AS (SELECT sum(c) AS tc FROM spine),
              |obs AS (SELECT t, CASE WHEN c * 30 > tot.tc THEN 1 ELSE 0 END AS y
              |        FROM spine CROSS JOIN tot),
              |ol AS (SELECT list(y ORDER BY t) AS l FROM obs),
              |vit(t, vhi, vlo, phi, plo) AS (
              |  SELECT 1,
              |         CAST(${lgs(0.5)} AS DOUBLE) +
              |           CASE WHEN ol.l[1] = 1 THEN CAST(${lgs(0.7)} AS DOUBLE)
              |                ELSE CAST(${lgs(0.3)} AS DOUBLE) END,
              |         CAST(${lgs(0.5)} AS DOUBLE) +
              |           CASE WHEN ol.l[1] = 1 THEN CAST(${lgs(0.25)} AS DOUBLE)
              |                ELSE CAST(${lgs(0.75)} AS DOUBLE) END,
              |         ['hi'], ['lo']
              |  FROM ol
              |  UNION ALL
              |  SELECT t + 1,
              |    (CASE WHEN ol.l[t + 1] = 1 THEN CAST(${lgs(0.7)} AS DOUBLE)
              |          ELSE CAST(${lgs(0.3)} AS DOUBLE) END) +
              |      greatest(vhi + CAST(${lgs(0.85)} AS DOUBLE),
              |               vlo + CAST(${lgs(0.30)} AS DOUBLE)),
              |    (CASE WHEN ol.l[t + 1] = 1 THEN CAST(${lgs(0.25)} AS DOUBLE)
              |          ELSE CAST(${lgs(0.75)} AS DOUBLE) END) +
              |      greatest(vhi + CAST(${lgs(0.15)} AS DOUBLE),
              |               vlo + CAST(${lgs(0.70)} AS DOUBLE)),
              |    (CASE WHEN vhi + CAST(${lgs(0.85)} AS DOUBLE) >=
              |               vlo + CAST(${lgs(0.30)} AS DOUBLE)
              |          THEN phi ELSE plo END) || ['hi'],
              |    (CASE WHEN vhi + CAST(${lgs(0.15)} AS DOUBLE) >=
              |               vlo + CAST(${lgs(0.70)} AS DOUBLE)
              |          THEN phi ELSE plo END) || ['lo']
              |  FROM vit CROSS JOIN ol WHERE t < 30),
              |fin AS (SELECT CASE WHEN vhi >= vlo THEN phi ELSE plo END AS p
              |        FROM vit WHERE t = 30)
              |SELECT u.pos AS day, ol.l[u.pos] AS obs, u.st AS state
              |FROM (SELECT unnest(p) AS st, generate_subscripts(p, 1) AS pos
              |      FROM fin) u CROSS JOIN ol
              |ORDER BY day""".stripMargin))
  )

  /** ln as a SQL-literal string (round-trips exactly as a double). */
  private def lgs(x: Double): String = math.log(x).toString
}
