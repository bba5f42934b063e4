package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 61: multiresolution signal analysis — the unnormalized
  * Haar wavelet energy ladder over the daily revenue series (which
  * timescale carries the variance: day-to-day jitter, weekly cycle, or
  * the fortnight trend) and additive Holt-Winters (level + trend +
  * weekly seasonality, the classical forecaster), whose sequential
  * recurrence the oracle replays as a DuckDB RECURSIVE CTE carrying the
  * seasonal ring as a list — a sequential-recurrence oracle, not a
  * batch one.
  *
  * Determinism: Haar is pure BIGINT (unnormalized sums/differences of
  * exact cents; energies are exact cents²). Holt-Winters recurses over
  * the calendar-bounded 30-day grid with IDENTICAL arithmetic on both
  * engines (same init means folded in day order, same update order);
  * only the output rounds, at 4 dp to absorb the recursion's last-ulp
  * drift.
  *
  * Scale shape: both keys collapse the corpus to the calendar-day grid
  * in one map-side-combined aggregate; the Haar ladder is 5 bounded
  * halving aggregates, and the HW recursion runs on the driver over the
  * collected 30-row grid (calendar-bounded — the IPF/markov pattern).
  */
object Round11e {

  private val Alpha = 0.3
  private val Beta = 0.1
  private val Gamma = 0.2

  val decls: Map[String, Decl] = Map(
    // Haar energy ladder: daily revenue cents over Jan 1-30, zero-padded
    // to 32; level k halves the series (approx = pairwise sum, detail =
    // odd − even) and reports the exact detail energy Σd². Level 1 is
    // day-to-day noise, level 3 ≈ the weekly cycle, level 5 the
    // fortnight contrast.
    "ts_haar_energy" -> Decl(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(datediff(col("ts").cast("date"), to_date(lit("2023-12-31")))
                     .cast("bigint").as("t"))
          .agg(sum(round(col("value") * 100).cast("bigint")).as("v"))
        var level = s.range(1, 33).select(col("id").as("t"))
          .join(daily, Seq("t"), "left")
          .select(col("t"), coalesce(col("v"), lit(0L)).as("v"))
        val energies = (1 to 5).map { k =>
          val paired = level
            .select(expr("(t + 1) div 2").as("t"),
                    when(col("t") % 2 === 1, col("v")).otherwise(lit(0L))
                      .as("odd"),
                    when(col("t") % 2 === 0, col("v")).otherwise(lit(0L))
                      .as("even"))
            .groupBy("t")
            .agg(sum(col("odd") + col("even")).as("v"),
                 sum(col("odd") - col("even")).as("dd"))
          val e = paired.agg(
            lit(k.toLong).as("level"), count(lit(1)).as("n_coeffs"),
            sum(col("dd") * col("dd")).as("energy_cents2"))
          level = paired.select(col("t"), col("v"))
          e
        }
        energies.reduce(_ unionAll _).orderBy("level")
      },
      Some {
        // unrolled 5-level ladder; each CTE halves the previous
        val b = new StringBuilder(
          """WITH daily AS (
            |  SELECT date_diff('day', DATE '2023-12-31', CAST(ts AS DATE))
            |           AS t,
            |         sum(CAST(round(value * 100) AS BIGINT)) AS v
            |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
            |l0 AS (SELECT g.t, coalesce(v, 0) AS v
            |       FROM generate_series(1, 32) AS g(t)
            |       LEFT JOIN daily ON daily.t = g.t)""".stripMargin)
        (1 to 5).foreach { k =>
          b.append(s""",
            |l$k AS (SELECT (t + 1) // 2 AS t,
            |              sum(v) AS v,
            |              sum(CASE WHEN t % 2 = 1 THEN v ELSE -v END) AS dd
            |       FROM l${k - 1} GROUP BY 1)""".stripMargin)
        }
        b.append("""
          |SELECT level, CAST(n_coeffs AS BIGINT) AS n_coeffs,
          |       CAST(energy_cents2 AS BIGINT) AS energy_cents2
          |FROM (""".stripMargin)
        b.append((1 to 5).map { k =>
          s"""SELECT $k AS level, count(*) AS n_coeffs,
             |       sum(dd * dd) AS energy_cents2 FROM l$k""".stripMargin
        }.mkString("\n UNION ALL\n"))
        b.append(")\nORDER BY level")
        b.toString
      }),

    // Additive Holt-Winters (α=0.3, β=0.1, γ=0.2, weekly period) on the
    // same daily series: init from week 1 (level = week-1 mean, trend =
    // (week-2 mean − week-1 mean)/7, seasonals = week-1 deviations),
    // recurse days 8..30, then forecast 7 days ahead. One row per day:
    // the one-step-ahead fit (or forecast) and the residual. The oracle
    // replays the exact recurrence as a recursive CTE whose state row
    // carries (level, trend, seasonal-ring list).
    "ts_holt_winters" -> Decl(
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(datediff(col("ts").cast("date"), to_date(lit("2023-12-31")))
                     .cast("bigint").as("t"))
          .agg(sum(round(col("value") * 100).cast("bigint")).as("c"))
        val spine = s.range(1, 31).select(col("id").as("t"))
          .join(daily, Seq("t"), "left")
          .select(col("t"), coalesce(col("c"), lit(0L)).as("c"))
          .orderBy("t").collect()
        val y = spine.map(r => r.getLong(1).toDouble / 100.0) // index 0 = day 1
        val m1 = (0 until 7).map(y).sum / 7.0
        val m2 = (7 until 14).map(y).sum / 7.0
        var lvl = m1
        var trd = (m2 - m1) / 7.0
        var ring = (0 until 7).map(i => y(i) - m1).toArray // s_{t-6..t}
        val rows = scala.collection.mutable.ArrayBuffer[(Long, Option[Double], Double, Option[Double])]()
        (8 to 30).foreach { t =>
          val sOld = ring(0)
          val fit = lvl + trd + sOld
          val yt = y(t - 1)
          val newLvl = Alpha * (yt - sOld) + (1 - Alpha) * (lvl + trd)
          val newTrd = Beta * (newLvl - lvl) + (1 - Beta) * trd
          val newS = Gamma * (yt - newLvl) + (1 - Gamma) * sOld
          ring = ring.drop(1) :+ newS
          lvl = newLvl; trd = newTrd
          rows += ((t.toLong, Some(yt), fit, Some(yt - fit)))
        }
        (1 to 7).foreach { h =>
          rows += ((30L + h, None, lvl + h * trd + ring(h - 1), None))
        }
        def r4(x: Double): Double =
          BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        val out = rows.toSeq.map { case (t, yv, f, res) =>
          (t, yv.map(r4), r4(f), res.map(r4))
        }
        s.createDataFrame(out)
          .toDF("day", "actual", "fitted", "residual")
          .orderBy("day")
      },
      Some(s"""WITH RECURSIVE daily AS (
             |  SELECT date_diff('day', DATE '2023-12-31', CAST(ts AS DATE))
             |           AS t,
             |         sum(CAST(round(value * 100) AS BIGINT)) AS c
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |y AS (SELECT g.t, CAST(coalesce(c, 0) AS DOUBLE) / 100.0 AS y
             |      FROM generate_series(1, 30) AS g(t)
             |      LEFT JOIN daily ON daily.t = g.t),
             |init AS (
             |  SELECT list_sum(list(y ORDER BY t) FILTER (WHERE t <= 7)) / 7.0 AS m1,
             |         list_sum(list(y ORDER BY t) FILTER (WHERE t BETWEEN 8 AND 14))
             |           / 7.0 AS m2,
             |         list(y - (SELECT list_sum(list(y ORDER BY t)) / 7.0
             |                   FROM y WHERE t <= 7) ORDER BY t)
             |           FILTER (WHERE t <= 7) AS ring
             |  FROM y),
             |hw(t, lvl, trd, ring, yt, fit) AS (
             |  SELECT 7, m1, (m2 - m1) / 7.0, ring,
             |         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
             |  FROM init
             |  UNION ALL
             |  SELECT hw.t + 1,
             |         $Alpha * (y.y - hw.ring[1])
             |           + ${1 - Alpha} * (hw.lvl + hw.trd),
             |         $Beta * (($Alpha * (y.y - hw.ring[1])
             |                   + ${1 - Alpha} * (hw.lvl + hw.trd)) - hw.lvl)
             |           + ${1 - Beta} * hw.trd,
             |         hw.ring[2:7] ||
             |           [$Gamma * (y.y - ($Alpha * (y.y - hw.ring[1])
             |                             + ${1 - Alpha} * (hw.lvl + hw.trd)))
             |            + ${1 - Gamma} * hw.ring[1]],
             |         y.y,
             |         hw.lvl + hw.trd + hw.ring[1]
             |  FROM hw JOIN y ON y.t = hw.t + 1
             |  WHERE hw.t < 30),
             |fits AS (SELECT t AS day, yt AS actual, fit FROM hw WHERE t >= 8),
             |fin AS (SELECT lvl, trd, ring FROM hw WHERE t = 30),
             |fc AS (SELECT 30 + h AS day, CAST(NULL AS DOUBLE) AS actual,
             |              lvl + h * trd + ring[h] AS fit
             |       FROM fin CROSS JOIN generate_series(1, 7) AS g(h))
             |SELECT day,
             |       round(actual, 4) AS actual,
             |       round(fit, 4) AS fitted,
             |       round(actual - fit, 4) AS residual
             |FROM (SELECT * FROM fits UNION ALL SELECT * FROM fc)
             |ORDER BY day""".stripMargin))
  )
}
