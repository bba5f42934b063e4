package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 68: Johnson-Lindenstrauss random projection (the
  * dimensionality-reduction workhorse: a fixed ±1 sign matrix maps
  * 64-dim embeddings to 16 dims with distance distortion bounded by the
  * JL lemma — the cheap precursor to ANN indexing and the theory behind
  * SimHash-style sketches) and epsilon-greedy bandit replay (offline
  * policy evaluation by the replay method of Li et al. (WSDM'11): walk
  * the logged event stream day by day, let the policy pick an arm from
  * the PRIOR days' cumulative reward means, and score it on the
  * held-out logged pulls of that arm that day).
  *
  * Determinism: the sign matrix is a compile-time LCG constant inlined
  * BOTH as a Spark literal and as a list literal in the oracle SQL, and
  * every norm folds in index order inside one codegen'd higher-order
  * expression (no shuffle-order float summation). The bandit walk is
  * pure window algebra over the bounded day × arm grid — cumulative
  * integer cent sums, identical division inputs in both engines, and a
  * lexicographic struct-min argmax with (−mean, arm) tiebreak; the
  * deterministic exploration schedule (every 5th day, arm index
  * (day·7) mod |arms|) replaces the coin flip so replay is exactly
  * reproducible.
  *
  * Scale shape: projection is one scan (16×64 multiply-adds per row, no
  * shuffle); the pair sample joins on a computed partner id (plain hash
  * join). Replay's only corpus-sized work is the daily (day, arm)
  * aggregate; everything after runs on the |days|×|arms| grid.
  */
object Round11l {

  /** 16×64 ±1 sign matrix from the shared LCG recipe (compile-time
    * deterministic, same constant inlined into the oracle SQL). */
  private[operators] val JlSigns: Seq[Seq[Double]] = {
    var state = 0x2545F4914F6CDD1DL
    Seq.fill(16)(Seq.fill(64) {
      state = state * 6364136223846793005L + 1442695040888963407L
      if ((state >>> 63) == 0L) 1.0 else -1.0
    })
  }

  private def jlSqlLiteral: String =
    JlSigns.map(_.map(v => if (v > 0) "1.0" else "-1.0")
      .mkString("[", ",", "]")).mkString("[", ",", "]")

  val decls: Map[String, Decl] = Map(
    // Per-pair distance distortion of the JL map p(v) = R·v / √16 on the
    // deterministic stride-97 pair sample. Round11lSpec asserts the JL
    // concentration (mean ratio ≈ 1, tails bounded); the oracle replays
    // the identical fold.
    "vec_random_projection_jl" -> Decl(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val nVec = Tables.rowCount(s, d, "embeddings")
        val a = emb.filter(pmod(col("vec_id"), lit(5L)) === 0)
          .select(col("vec_id").as("id_a"),
                  pmod(col("vec_id") + 97, lit(nVec)).as("id_b"),
                  col("embedding").as("ea"))
          .filter(col("id_a") =!= col("id_b"))
        val pairs = a.join(
          emb.select(col("vec_id").as("id_b"), col("embedding").as("eb")), "id_b")
        val diff = zip_with(col("ea"), col("eb"),
          (x, y) => x.cast("double") - y.cast("double"))
        val dOrig = sqrt(aggregate(diff, lit(0.0), (acc, x) => acc + x * x))
        val rCol = typedLit(JlSigns)
        val projSq = aggregate(rCol, lit(0.0), (acc, row) => {
          val c = aggregate(zip_with(row, diff, (r, x) => r * x),
                            lit(0.0), (a2, x) => a2 + x) * 0.25
          acc + c * c
        })
        pairs
          .filter(dOrig > 0)
          .select(col("id_a"), col("id_b"),
                  round(dOrig, 6).as("d_orig"),
                  round(sqrt(projSq) / dOrig, 6).as("ratio"))
          .orderBy("id_a")
      },
      Some(s"""WITH nn AS (SELECT count(*) AS n FROM embeddings),
              |r AS (SELECT CAST($jlSqlLiteral AS DOUBLE[][]) AS m),
              |p AS (SELECT a.vec_id AS id_a, (a.vec_id + 97) % nn.n AS id_b,
              |             list_transform(a.embedding, x -> CAST(x AS DOUBLE)) AS ea
              |      FROM embeddings a CROSS JOIN nn
              |      WHERE a.vec_id % 5 = 0 AND (a.vec_id + 97) % nn.n <> a.vec_id),
              |j AS (SELECT p.id_a, p.id_b,
              |             list_transform(range(1, 65),
              |               i -> p.ea[i] - CAST(b.embedding[i] AS DOUBLE)) AS diff
              |      FROM p JOIN embeddings b ON b.vec_id = p.id_b),
              |q AS (SELECT id_a, id_b,
              |             sqrt(list_sum(list_transform(diff, x -> x * x))) AS d_orig,
              |             sqrt(list_sum(list_transform(r.m,
              |               row -> pow(0.25 * list_dot_product(row, diff), 2)))) AS d_proj
              |      FROM j CROSS JOIN r)
              |SELECT id_a, id_b, round(d_orig, 6) AS d_orig,
              |       round(d_proj / d_orig, 6) AS ratio
              |FROM q WHERE d_orig > 0
              |ORDER BY id_a""".stripMargin)),

    // Day-by-day epsilon-greedy replay over the event log: arms =
    // event_type, reward = exact cents of `value`, exploit = argmax of
    // cumulative prior mean, explore on the fixed schedule. Output per
    // day: the policy's pick, how it chose, the logged pulls it is
    // scored on, and the replay reward estimate.
    "agg_bandit_replay" -> Decl(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .select(to_date(col("ts")).as("day"), col("event_type").as("arm"),
                  round(col("value") * 100).cast("bigint").as("cents"))
        val daily = ev.groupBy("day", "arm")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
        val days = daily.select("day").distinct()
        val arms = daily.select("arm").distinct()
        val minDay = days.agg(min(col("day")).as("d0"))
        val grid = days.crossJoin(broadcast(arms))
          .join(daily, Seq("day", "arm"), "left")
          .select(col("day"), col("arm"),
                  coalesce(col("n"), lit(0L)).as("n"),
                  coalesce(col("c"), lit(0L)).as("c"))
          .crossJoin(broadcast(minDay))
          .withColumn("day_num", datediff(col("day"), col("d0")) + 1)
        // windows over the bounded |days|×|arms| replay grid
        val wCum = Window.partitionBy("arm").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wArm = Window.partitionBy("day").orderBy("arm")
        val scored = grid
          .withColumn("cum_n", coalesce(sum(col("n")).over(wCum), lit(0L)))
          .withColumn("cum_c", coalesce(sum(col("c")).over(wCum), lit(0L)))
          .withColumn("mean", when(col("cum_n") > 0,
            col("cum_c").cast("double") / col("cum_n").cast("double"))
            .otherwise(lit(0.0)))
          .withColumn("arm_idx", row_number().over(wArm) - 1)
        val nArms = arms.count()
        val wDay = Window.partitionBy("day")
        val picked = scored
          .withColumn("explore", pmod(col("day_num"), lit(5L)) === 2)
          .withColumn("best_arm",
            min(struct((col("mean") * -1).as("nm"), col("arm").as("a")))
              .over(wDay).getField("a"))
          .withColumn("chosen", when(col("explore"),
              col("arm_idx") === pmod(col("day_num") * 7, lit(nArms)))
            .otherwise(col("arm") === col("best_arm")))
          .filter(col("chosen"))
        picked.select(col("day"),
                      when(col("explore"), lit("explore"))
                        .otherwise(lit("exploit")).as("method"),
                      col("arm"), col("n").as("matched_n"),
                      round(when(col("n") > 0,
                          col("c").cast("double") / col("n").cast("double") / 100.0)
                        .otherwise(lit(0.0)), 6).as("est_reward"))
          .orderBy("day")
      },
      Some("""WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type AS arm,
             |                   CAST(round(value * 100) AS BIGINT) AS cents
             |            FROM events),
             |daily AS (SELECT day, arm, count(*) AS n, sum(cents) AS c
             |          FROM ev GROUP BY 1, 2),
             |grid AS (SELECT dd.day, aa.arm, coalesce(daily.n, 0) AS n,
             |                coalesce(daily.c, 0) AS c,
             |                datediff('day', (SELECT min(day) FROM daily), dd.day) + 1
             |                  AS day_num
             |         FROM (SELECT DISTINCT day FROM daily) dd
             |         CROSS JOIN (SELECT DISTINCT arm FROM daily) aa
             |         LEFT JOIN daily ON daily.day = dd.day AND daily.arm = aa.arm),
             |scored AS (SELECT *,
             |    coalesce(sum(n) OVER (PARTITION BY arm ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_n,
             |    coalesce(sum(c) OVER (PARTITION BY arm ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_c,
             |    row_number() OVER (PARTITION BY day ORDER BY arm) - 1 AS arm_idx
             |  FROM grid),
             |m AS (SELECT *, CASE WHEN cum_n > 0
             |                     THEN CAST(cum_c AS DOUBLE) / cum_n
             |                     ELSE 0.0 END AS mean FROM scored),
             |picked AS (SELECT *,
             |    day_num % 5 = 2 AS explore,
             |    (min({'nm': -mean, 'a': arm}) OVER (PARTITION BY day)).a AS best_arm
             |  FROM m)
             |SELECT day,
             |       CASE WHEN explore THEN 'explore' ELSE 'exploit' END AS method,
             |       arm, n AS matched_n,
             |       round(CASE WHEN n > 0
             |                  THEN CAST(c AS DOUBLE) / n / 100.0
             |                  ELSE 0.0 END, 6) AS est_reward
             |FROM picked
             |WHERE CASE WHEN explore
             |           THEN arm_idx = (day_num * 7) %
             |                (SELECT count(DISTINCT arm) FROM daily)
             |           ELSE arm = best_arm END
             |ORDER BY day""".stripMargin))
  )
}
