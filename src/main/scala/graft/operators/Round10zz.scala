package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 56: experiment power analysis (the minimum-detectable-
  * effect table a platform shows before any test launches) and iterative
  * proportional fitting (survey raking — reweight a crossed sample to
  * match declared marginal totals, the standard bias-correction step
  * before any weighted readout).
  *
  * Scale shape: power analysis is one map-side-combined moment aggregate
  * per event type (5 rows forever); raking collapses the corpus to the
  * 25×5 (nation × segment) grid — the IPF fixpoint then runs driver-side
  * on that constant-size table, the markov/PCA pattern.
  */
object Round10zz {

  val decls: Map[String, Decl] = Map(
    // Per-metric MDE at 80% power / 5% two-sided α, equal-split design:
    // mde_abs = (z_{0.975} + z_{0.8}) · √(2σ²/n̄) with n̄ = per-arm size
    // (half the observed n). Everything from exact (n, Σc, Σc²) BIGINTs;
    // the z constants are the literature values, identical text in both
    // engines.
    "agg_power_analysis_mde" -> Decl(
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_type"),
                  round(col("value") * 100).cast("bigint").as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
               sum(col("c") * col("c")).as("q"))
          .select(col("event_type"), col("n"),
                  round(col("sc").cast("double") / col("n") / 100.0, 6)
                    .as("mean"),
                  expr("""round(sqrt((CAST(q AS DOUBLE)
                         |  - CAST(sc AS DOUBLE) * sc / n) / (n - 1)) / 100.0,
                         | 6)""".stripMargin).as("sd"),
                  expr("""round((1.959964 + 0.841621) *
                         | sqrt(2.0 * ((CAST(q AS DOUBLE)
                         |   - CAST(sc AS DOUBLE) * sc / n) / (n - 1))
                         |   / (CAST(n AS DOUBLE) / 2.0)) / 100.0, 6)"""
                    .stripMargin).as("mde_abs"),
                  expr("""round((1.959964 + 0.841621) *
                         | sqrt(2.0 * ((CAST(q AS DOUBLE)
                         |   - CAST(sc AS DOUBLE) * sc / n) / (n - 1))
                         |   / (CAST(n AS DOUBLE) / 2.0))
                         | / (CAST(sc AS DOUBLE) / n), 6)""".stripMargin)
                    .as("mde_rel"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  round(CAST(sum(c) AS DOUBLE) / count(*) / 100.0, 6) AS mean,
             |  round(sqrt((CAST(sum(c * c) AS DOUBLE)
             |    - CAST(sum(c) AS DOUBLE) * sum(c) / count(*))
             |    / (count(*) - 1)) / 100.0, 6) AS sd,
             |  round((1.959964 + 0.841621) *
             |    sqrt(2.0 * ((CAST(sum(c * c) AS DOUBLE)
             |      - CAST(sum(c) AS DOUBLE) * sum(c) / count(*))
             |      / (count(*) - 1))
             |      / (CAST(count(*) AS DOUBLE) / 2.0)) / 100.0, 6) AS mde_abs,
             |  round((1.959964 + 0.841621) *
             |    sqrt(2.0 * ((CAST(sum(c * c) AS DOUBLE)
             |      - CAST(sum(c) AS DOUBLE) * sum(c) / count(*))
             |      / (count(*) - 1))
             |      / (CAST(count(*) AS DOUBLE) / 2.0))
             |    / (CAST(sum(c) AS DOUBLE) / count(*)), 6) AS mde_rel
             |FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // IPF raking to uniform target margins (every nation 1/|nations|,
    // every segment 1/|segments| of the population): 40 synchronous
    // row-scale/column-scale sweeps over the collected 25×5 grid —
    // deterministic float path, converges geometrically for a strictly
    // positive table. Output: cell weights and the raked (weighted)
    // counts. Oracle-N (fixpoint class); Round10zzSpec pins both margin
    // constraints and cross-checks uniqueness via a doubled-iteration
    // run.
    "agg_ipf_raking" -> Decl(
      (s, d) => {
        val cells = Tables(s, d, "customer")
          .groupBy(col("c_nationkey").cast("bigint").as("nation"),
                   col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        val nations = cells.map(_._1).distinct.sorted
        val segments = cells.map(_._2).distinct.sorted
        val total = cells.map(_._3).sum.toDouble
        val rowT = total / nations.length
        val colT = total / segments.length
        var w = cells.map { case (nk, sg, n) => (nk, sg) -> n.toDouble }.toMap
        var it = 0
        while (it < 40) {
          val rowS = nations.map(nk =>
            nk -> segments.iterator.map(sg => w.getOrElse((nk, sg), 0.0)).sum)
            .toMap
          w = w.map { case ((nk, sg), v) => (nk, sg) -> v * rowT / rowS(nk) }
          val colS = segments.map(sg =>
            sg -> nations.iterator.map(nk => w.getOrElse((nk, sg), 0.0)).sum)
            .toMap
          w = w.map { case ((nk, sg), v) => (nk, sg) -> v * colT / colS(sg) }
          it += 1
        }
        def r6(x: Double): Double = math.round(x * 1e6) / 1e6
        val rows = cells.map { case (nk, sg, n) =>
          val raked = w((nk, sg))
          (nk, sg, n, r6(raked / n), r6(raked))
        }.sortBy(x => (x._1, x._2)).toSeq
        s.createDataFrame(rows)
          .toDF("nation", "segment", "n", "weight", "raked")
      },
      None)
  )
}
