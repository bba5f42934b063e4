package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 wave 53: the skyline (Pareto-dominance) operator — the
  * classic multi-objective DB operator — on the distributed exclusive
  * prefix-min, and Markov removal-effect attribution (the data-driven
  * successor to first/last-touch: a channel's credit is how much
  * conversion probability the journey chain loses without it).
  *
  * Scale shape: the skyline collapses the corpus to the distinct-price
  * grid (one map-side-combined aggregate), runs PrefixSum's scan-
  * parallel exclusive cummin over the grid's total order — never an
  * unpartitioned window — and joins the surviving price levels back
  * broadcast. The Markov chain collapses journeys to a ≤6×6 transition
  * matrix (alphabet-bounded forever); the absorbing-chain solve runs on
  * the driver over that constant-size matrix, exactly like the declared
  * PCA/stationary-distribution fixpoint keys.
  */
object Round10ww {

  /** Deterministic absorption probability into `conv` from every state:
    * fixed 400 synchronous iterations of a(s) = Σ_t P(s,t)·a(t) with
    * a(conv)=1, a(null)=0 — geometric convergence to well under 1e-12 for
    * any substochastic journey chain, identical float path every run.
    */
  private[operators] def absorb(
      states: Seq[String],
      p: Map[(String, String), Double]): Map[String, Double] = {
    val transient = states.filterNot(s => s == "conv" || s == "null")
    var a = transient.map(_ -> 0.0).toMap
    var it = 0
    while (it < 400) {
      a = transient.map { s =>
        val hit = p.getOrElse((s, "conv"), 0.0)
        val flow = transient.iterator
          .map(t => p.getOrElse((s, t), 0.0) * a(t)).sum
        s -> (hit + flow)
      }.toMap
      it += 1
    }
    a ++ Map("conv" -> 1.0, "null" -> 0.0)
  }

  val decls: Map[String, Decl] = Map(
    // Skyline / Pareto frontier of parts minimizing (price, size): a part
    // survives iff no other part is <= on both dimensions and < on one.
    // Reduce to the distinct-price grid (min size per price), take the
    // EXCLUSIVE prefix-min of size over ascending price (strictly-better-
    // price best size), keep price levels that strictly improve it, then
    // rehydrate the rows at each surviving level whose size equals the
    // level minimum (equal (price,size) twins are mutually non-dominated
    // and all kept).
    "agg_skyline_pareto" -> Decl(
      (s, d) => {
        val parts = Tables(s, d, "part")
          .select(col("p_partkey"),
                  round(col("p_retailprice") * 100).cast("bigint").as("cents"),
                  col("p_size").cast("bigint").as("size"))
        val grid = parts.groupBy("cents").agg(min(col("size")).as("msize"))
        val sky = PrefixSum
          .cumminLongExclusive(grid, Seq(col("cents").asc), col("msize"), "m1")
          .filter(col("msize") < col("m1"))
          .select(col("cents"), col("msize"))
        parts.join(broadcast(sky), Seq("cents"))
          .filter(col("size") === col("msize"))
          .select(col("p_partkey"), col("cents"), col("size"))
          .orderBy("cents", "p_partkey")
      },
      Some("""WITH p AS (SELECT p_partkey,
             |             CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
             |             CAST(p_size AS BIGINT) AS size
             |           FROM part),
             |g AS (SELECT cents, min(size) AS msize FROM p GROUP BY cents),
             |m AS (SELECT cents, msize,
             |             min(msize) OVER (ORDER BY cents
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |               AS m1
             |      FROM g)
             |SELECT p_partkey, cents, size
             |FROM p JOIN m USING (cents)
             |WHERE size = msize AND (m1 IS NULL OR msize < m1)
             |ORDER BY cents, p_partkey""".stripMargin)),

    // Markov removal-effect attribution: journeys = each user's ordered
    // event types up to the FIRST purchase, absorbed into 'conv'
    // (purchased) or 'null' (never). Transition counts live on the
    // bounded (start+4)×(4+conv+null) grid; the driver solves absorption
    // probability from 'start' for the full chain and for each channel-
    // removed chain (transitions INTO the removed channel reroute to
    // 'null'); removal effect = 1 − P_removed/P_full, shares normalize
    // to 1. Oracle-N (fixpoint class, like agg_markov_stationary);
    // Round10wwSpec re-derives the whole ladder with an independent
    // Gaussian-elimination solve and pins invariants.
    "ts_markov_removal_attribution" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  unix_micros(col("ts")).as("us"))
          .withColumn("pidx",
            min(when(col("event_type") === "purchase",
                     struct(col("us"), col("event_id"))))
              .over(Window.partitionBy("user_id")))
          .filter(col("pidx").isNull ||
                  struct(col("us"), col("event_id")) <= col("pidx"))
        val asState = (c: org.apache.spark.sql.Column) =>
          when(c === "purchase", lit("conv")).otherwise(c)
        val steps = ev
          .withColumn("nxt", lead(col("event_type"), 1).over(w))
          .select(
            asState(col("event_type")).as("from_state"),
            coalesce(asState(col("nxt")),
                     when(col("pidx").isNotNull, "conv").otherwise("null"))
              .as("to_state"))
          .filter(col("from_state") =!= "conv")
        val firsts = ev.groupBy("user_id")
          .agg(min(struct(col("us"), col("event_id"), col("event_type")))
                 .as("f"))
          .select(lit("start").as("from_state"),
                  asState(col("f.event_type")).as("to_state"))
        val counts = steps.unionByName(firsts)
          .groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
          .collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        val states = Seq("start", "click", "error", "signup", "view",
                         "conv", "null")
        val outBy = counts.groupBy(_._1._1).view
          .mapValues(_.values.sum.toDouble).toMap
        val pFull = counts.map { case ((f, t), n) => (f, t) -> n / outBy(f) }
        val full = absorb(states, pFull)("start")
        val channels = Seq("click", "error", "signup", "view")
        val effects = channels.map { c =>
          val pRm = pFull.collect {
            case ((f, t), v) if f != c && t == c => (f, "null") -> v
            case ((f, t), v) if f != c && t != c => (f, t) -> v
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          c -> math.max(0.0, 1.0 - absorb(states, pRm)("start") / full)
        }
        val totalEffect = effects.map(_._2).sum
        def r6(x: Double): Double = math.round(x * 1e6) / 1e6
        val rows = effects.map { case (c, e) =>
          (c, r6(e), r6(e / totalEffect))
        }
        s.createDataFrame(rows)
          .toDF("channel", "removal_effect", "credit_share")
          .orderBy("channel")
      },
      None)
  )
}
