package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Round-10 wave 69: farthest-point sampling (the k-center greedy
  * coreset — the standard diversity/active-learning selection: each
  * round keeps the point farthest from everything already kept, a
  * 2-approximation of the k-center objective) and the 1-D Kalman
  * filter (local-level state-space smoothing of a daily series — the
  * principled EWMA whose gain adapts from the modeled noise ratio).
  *
  * Determinism: k-center distances are index-ordered zip_with folds
  * (float→double promotion, no shuffle-order summation); argmax breaks
  * ties by vec_id. The Kalman recursion runs the identical IEEE
  * expression sequence in both engines (driver fold here, recursive
  * CTE in the oracle — the ts_holt_winters discipline,
  * Round11e.scala), rounded at 4 dp on output.
  *
  * Scale shape: each k-center round is ONE scan computing min-distance
  * against ≤k broadcast-literal centers followed by a
  * TakeOrderedAndProject(1) — O(k·n) dots total, never a pair shuffle.
  * The Kalman series is the bounded 30-day grid: one corpus-sized
  * aggregate, then driver-side state recursion over 30 rows.
  */
object Round11m {

  private val KCenters = 12
  private val Q = 25.0   // process noise variance
  private val R = 400.0  // observation noise variance

  /** ‖a − b‖₂ with b a Scala constant vector, folded in index order. */
  private def distToConst(e: Column, b: Seq[Double]): Column =
    sqrt(aggregate(
      zip_with(e, typedLit(b), (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x))

  val decls: Map[String, Decl] = Map(
    // Greedy k-center from seed vec_id 0: rank, picked vector, and its
    // distance-to-selected-set at pick time. The oracle replays the
    // same greedy recursion as a recursive CTE and recomputes each
    // pick's distance post-hoc (identical by the greedy invariant).
    "sample_kcenter_greedy" -> Decl(
      (s, d) => {
        val emb = Tables(s, d, "embeddings").select("vec_id", "embedding")
          .localCheckpoint(true)
        val seed = emb.filter(col("vec_id") === 0)
          .select("embedding").collect()(0)
          .getSeq[Float](0).map(_.toDouble).toSeq
        val chosen = scala.collection.mutable.ArrayBuffer[(Long, Seq[Double], Double)](
          (0L, seed, 0.0))
        while (chosen.size < KCenters) {
          val minDist = chosen.map { case (_, e, _) =>
            distToConst(col("embedding"), e) }.reduce(least(_, _))
          val pick = emb
            .filter(!col("vec_id").isInCollection(chosen.map(_._1)))
            .select(col("vec_id"), col("embedding"), minDist.as("dist"))
            .orderBy(col("dist").desc, col("vec_id").asc)
            .limit(1).collect()(0)
          chosen += ((pick.getLong(0),
                      pick.getSeq[Float](1).map(_.toDouble).toSeq,
                      pick.getDouble(2)))
        }
        import s.implicits._
        chosen.toSeq.zipWithIndex
          .map { case ((id, _, dist), i) =>
            (i + 1L, id, BigDecimal(dist).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble) }
          .toDF("rank", "vec_id", "dist")
          .orderBy("rank")
      },
      Some(s"""WITH RECURSIVE
              |v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
              |             AS e FROM embeddings),
              |sel(step, ids) AS (
              |  SELECT 1, [CAST(0 AS BIGINT)]
              |  UNION ALL
              |  SELECT step + 1, list_append(ids, (
              |      SELECT c.vec_id FROM v c
              |      WHERE NOT list_contains(sel.ids, c.vec_id)
              |      ORDER BY (SELECT min(list_distance(c.e, m.e))
              |                FROM v m WHERE list_contains(sel.ids, m.vec_id)) DESC,
              |               c.vec_id ASC
              |      LIMIT 1))
              |  FROM sel WHERE step < $KCenters),
              |u AS (SELECT unnest(ids) AS vid, generate_subscripts(ids, 1) AS pos
              |      FROM sel WHERE step = $KCenters)
              |SELECT u.pos AS rank, u.vid AS vec_id,
              |       round(coalesce(min(list_distance(va.e, vb.e)), 0.0), 6) AS dist
              |FROM u
              |JOIN v va ON va.vec_id = u.vid
              |LEFT JOIN u u2 ON u2.pos < u.pos
              |LEFT JOIN v vb ON vb.vec_id = u2.vid
              |GROUP BY u.pos, u.vid
              |ORDER BY rank""".stripMargin)),

    // Local-level Kalman filter over the 30-day purchase-cents series
    // (y = daily sum in dollars): predict P+Q, gain K = P'/(P'+R),
    // update level. Day 1 initializes l = y₁, P = R (gain reported
    // NULL). Output: day, actual, filtered level, gain.
    "ts_kalman_filter_1d" -> Decl(
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
        val y = spine.map(r => r.getLong(1).toDouble / 100.0)
        var l = y(0)
        var p = R
        val rows = scala.collection.mutable.ArrayBuffer[
          (Long, Double, Double, Option[Double])]((1L, y(0), l, None))
        (2 to 30).foreach { t =>
          val k = (p + Q) / (p + Q + R)
          val yt = y(t - 1)
          l = l + k * (yt - l)
          p = (1 - k) * (p + Q)
          rows += ((t.toLong, yt, l, Some(k)))
        }
        def r4(x: Double): Double =
          BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        import s.implicits._
        rows.toSeq.map { case (t, yt, lv, k) => (t, r4(yt), r4(lv), k.map(r4)) }
          .toDF("day", "actual", "level", "gain")
          .orderBy("day")
      },
      Some(s"""WITH RECURSIVE daily AS (
              |  SELECT date_diff('day', DATE '2023-12-31', CAST(ts AS DATE)) AS t,
              |         sum(CAST(round(value * 100) AS BIGINT)) AS c
              |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
              |y AS (SELECT g.t, CAST(coalesce(c, 0) AS DOUBLE) / 100.0 AS y
              |      FROM generate_series(1, 30) AS g(t)
              |      LEFT JOIN daily ON daily.t = g.t),
              |kf(t, lvl, p, yt, k) AS (
              |  -- p must start as DOUBLE: a bare 400.0 literal types the
              |  -- whole recursive column DECIMAL(4,1) and truncates the
              |  -- covariance every step
              |  SELECT 1, (SELECT y FROM y WHERE t = 1), CAST($R AS DOUBLE),
              |         (SELECT y FROM y WHERE t = 1), CAST(NULL AS DOUBLE)
              |  UNION ALL
              |  SELECT kf.t + 1,
              |         kf.lvl + ((kf.p + $Q) / (kf.p + $Q + $R)) * (y.y - kf.lvl),
              |         (1 - (kf.p + $Q) / (kf.p + $Q + $R)) * (kf.p + $Q),
              |         y.y,
              |         (kf.p + $Q) / (kf.p + $Q + $R)
              |  FROM kf JOIN y ON y.t = kf.t + 1
              |  WHERE kf.t < 30)
              |SELECT t AS day, round(yt, 4) AS actual, round(lvl, 4) AS level,
              |       round(k, 4) AS gain
              |FROM kf ORDER BY day""".stripMargin))
  )
}
