package graft.operators

import graft.{Decl, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Round-10 wave 59: preference-strength fitting (Bradley-Terry — the
  * pairwise-comparison model under every preference/reward pipeline)
  * and hard-negative triplet mining over the embedding corpus (the
  * metric-learning data-prep step: for each anchor, the closest
  * same-label positive and the closest wrong-label negative, with the
  * margin that decides whether the triplet is worth training on).
  *
  * Scale shape: BT collapses orders to the calendar-month × nation grid
  * (one aggregate; grid bounded by time span × nation enum), minted
  * matches and the MM fixpoint run on the driver over that constant
  * table — the markov/IPF pattern. Triplet mining broadcasts a FIXED
  * 16-anchor panel against one corpus scan (16n scored pairs, two
  * conditional max-struct aggregates — no corpus×corpus join; the ANN
  * bucketed variant is the declared sim_ann_* path).
  *
  * Determinism: match minting is exact-integer ranking with nationkey
  * tie-breaks; cosines round to 6 dp BEFORE the argmax (both engines
  * compare identical doubles, ties broken by vec_id); the MM iteration
  * is a fixed 200-sweep driver loop.
  */
object Round11c {

  /** One Bradley-Terry MM sweep (Hunter 2004): p_i ← W_i / Σ_j n_ij/(p_i+p_j),
    * then renormalize to Σp = 1. */
  private[graft] def mmSweep(
      teams: Seq[Long],
      wins: Map[Long, Long],
      nPairs: Map[(Long, Long), Long],
      p: Map[Long, Double]): Map[Long, Double] = {
    val next = teams.map { i =>
      val denom = teams.iterator.filter(_ != i).map { j =>
        nPairs.getOrElse(if (i < j) (i, j) else (j, i), 0L).toDouble /
          (p(i) + p(j))
      }.sum
      i -> (if (denom > 0) wins.getOrElse(i, 0L).toDouble / denom else p(i))
    }.toMap
    val z = next.values.sum
    next.map { case (k, v) => k -> v / z }
  }

  val decls: Map[String, Decl] = Map(
    // Bradley-Terry strengths for the 25 nations from minted monthly
    // revenue contests: within each calendar month, rank nations by
    // exact revenue cents (nationkey tie-break) and let each nation
    // "beat" the next-ranked one — a bounded, deterministic comparison
    // stream. Fit by 200 MM sweeps on the driver. Oracle-N (fixpoint
    // class); the spec pins the stationarity of the fitted point and
    // re-derives the match counts independently.
    "agg_bradley_terry" -> Decl(
      (s, d) => {
        val monthly = Tables(s, d, "orders")
          .join(Tables(s, d, "customer"),
                col("o_custkey") === col("c_custkey"))
          .groupBy(trunc(col("o_orderdate").cast("date"), "month").as("m"),
                   col("c_nationkey").cast("bigint").as("nation"))
          .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
          .collect()
          .map(r => (r.getDate(0), r.getLong(1), r.getLong(2)))
        val matches = monthly.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
          val ranked = rows.sortBy(x => (-x._3, x._2)).map(_._2)
          ranked.zip(ranked.tail) // winner -> loser, consecutive ranks
        }
        val teams = monthly.map(_._2).distinct.sorted.toSeq
        val wins = matches.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val losses = matches.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val nPairs = matches
          .map { case (a, b) => if (a < b) (a, b) else (b, a) }
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        var p = teams.map(_ -> 1.0 / teams.size).toMap
        (1 to 200).foreach(_ => p = mmSweep(teams, wins, nPairs, p))
        def r6(x: Double): Double = math.round(x * 1e6) / 1e6
        val rows = teams.map { t =>
          (t, wins.getOrElse(t, 0L), losses.getOrElse(t, 0L), r6(p(t)))
        }
        s.createDataFrame(rows)
          .toDF("nation", "wins", "losses", "bt_strength")
          .orderBy("nation")
      },
      None),

    // Hard-negative triplet mining: for each of the 16 panel anchors,
    // the highest-cosine SAME-label vector (the positive) and the
    // highest-cosine OTHER-label vector (the hard negative), plus the
    // triplet margin. Negative margins mark label-boundary violations —
    // exactly the triplets metric learning wants.
    "vec_triplet_mining" -> Decl(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val anchors = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("aid"), col("embedding").as("av"),
                  col("label").as("albl"))
        emb.crossJoin(broadcast(anchors))
          .filter(col("vec_id") =!= col("aid"))
          .select(col("aid"), col("albl"), col("vec_id").as("vid"),
                  col("label").as("lbl"),
                  round(VectorOps.cosine(col("embedding"), col("av")), 6)
                    .as("cos"))
          .groupBy("aid")
          .agg(
            max(when(col("lbl") === col("albl"),
                     struct(col("cos"), (-col("vid")).as("nv")))).as("p"),
            max(when(col("lbl") =!= col("albl"),
                     struct(col("cos"), (-col("vid")).as("nv")))).as("g"))
          .select(col("aid"),
                  (-col("p.nv")).as("pos_id"), col("p.cos").as("pos_cos"),
                  (-col("g.nv")).as("neg_id"), col("g.cos").as("neg_cos"),
                  round(col("p.cos") - col("g.cos"), 6).as("margin"))
          .orderBy("aid")
      },
      Some("""WITH a AS (SELECT vec_id AS aid,
             |                  list_transform(embedding, x -> CAST(x AS DOUBLE))
             |                    AS av,
             |                  label AS albl
             |           FROM embeddings WHERE vec_id < 16),
             |s AS (SELECT aid, albl, vec_id AS vid, label AS lbl,
             |             round(list_cosine_similarity(
             |               list_transform(embedding, x -> CAST(x AS DOUBLE)),
             |               av), 6) AS cos
             |      FROM embeddings CROSS JOIN a
             |      WHERE vec_id <> aid),
             |pos AS (SELECT aid, vid, cos,
             |          row_number() OVER (PARTITION BY aid
             |            ORDER BY cos DESC, vid ASC) AS rn
             |        FROM s WHERE lbl = albl),
             |neg AS (SELECT aid, vid, cos,
             |          row_number() OVER (PARTITION BY aid
             |            ORDER BY cos DESC, vid ASC) AS rn
             |        FROM s WHERE lbl <> albl)
             |SELECT pos.aid AS aid,
             |       pos.vid AS pos_id, pos.cos AS pos_cos,
             |       neg.vid AS neg_id, neg.cos AS neg_cos,
             |       round(pos.cos - neg.cos, 6) AS margin
             |FROM pos JOIN neg ON pos.aid = neg.aid
             |WHERE pos.rn = 1 AND neg.rn = 1
             |ORDER BY aid""".stripMargin))
  )
}
