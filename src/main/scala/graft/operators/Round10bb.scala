package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 twenty-eighth wave: the Markov stationary distribution
  * (completing the chain family) and rectangle-containment geofencing.
  */
object Round10bb {

  val decls: Map[String, Decl] = Map(
    // Stationary distribution of the event-type Markov chain: the
    // long-run behavioral mix the transition matrix converges to. The
    // 5×5 matrix collects to the driver (KB — the BPE/CMS documented
    // pattern), 64 power iterations run in exact driver arithmetic, and
    // the result returns as a DataFrame. Oracle-N by declared contract:
    // DuckDB has no fixpoint surface — Round10bbSpec pins πP = π
    // (residual < 1e-12), Σπ = 1, and agreement with the empirical
    // long-run share.
    "agg_markov_stationary" -> Decl(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val trans = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  expr("unix_micros(ts)").as("us"))
          .withColumn("nxt", lead(col("event_type"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
          .agg(count(lit(1)).as("n"))
          .collect()
        val states = trans.flatMap(r => Seq(r.getString(0), r.getString(1)))
          .distinct.sorted
        val idx = states.zipWithIndex.toMap
        val counts = Array.ofDim[Double](states.length, states.length)
        trans.foreach(r => counts(idx(r.getString(0)))(idx(r.getString(1))) =
          r.getLong(2).toDouble)
        val rowSums = counts.map(_.sum)
        val p = counts.zipWithIndex.map { case (row, i) => row.map(_ / rowSums(i)) }
        var pi = Array.fill(states.length)(1.0 / states.length)
        for (_ <- 1 to 64)
          pi = states.indices.map(j =>
            states.indices.foldLeft(0.0)((acc, i) => acc + pi(i) * p(i)(j))).toArray
        import s.implicits._
        states.zip(pi).map { case (st, v) => (st, math.rint(v * 1e9) / 1e9) }
          .toSeq.toDF("event_type", "stationary_p")
          .orderBy("event_type")
      },
      None),

    // Rectangle containment (geofencing): each nation owns a minted
    // lon/lat rectangle; customers (minted points, the spatial-family
    // coordinates) assign by pure integer range compares against the
    // BROADCAST 25-row fence table — the classic small-dim spatial join
    // that never needs grid blocking. Unfenced points fall out; the
    // census reports per-fence population and bounding extremes.
    "join_point_in_rect" -> Decl(
      (s, d) => {
        val pts = Tables(s, d, "customer")
          .select(col("c_custkey"),
                  (col("c_custkey") * 17L % 12000L).as("slat"),
                  (col("c_custkey") * 31L % 36000L).as("slon"))
        val rects = Tables(s, d, "nation")
          .select(col("n_nationkey"),
                  (col("n_nationkey") % 5L * 2400L).as("lat_lo"),
                  (col("n_nationkey") % 5L * 2400L + 2400L).as("lat_hi"),
                  (col("n_nationkey") * 1440L % 36000L).as("lon_lo"),
                  (col("n_nationkey") * 1440L % 36000L + 7200L).as("lon_hi"))
        pts.join(broadcast(rects),
                 col("slat") >= col("lat_lo") && col("slat") < col("lat_hi") &&
                 col("slon") >= col("lon_lo") && col("slon") < col("lon_hi"))
          .groupBy("n_nationkey")
          .agg(count(lit(1)).as("n_inside"),
               min(col("c_custkey")).as("first_cust"),
               max(col("slon")).as("max_lon"))
          .orderBy("n_nationkey")
      },
      Some("""WITH pts AS (SELECT c_custkey,
             |               c_custkey * 17 % 12000 AS slat,
             |               c_custkey * 31 % 36000 AS slon
             |             FROM customer),
             |rects AS (SELECT n_nationkey,
             |            n_nationkey % 5 * 2400 AS lat_lo,
             |            n_nationkey % 5 * 2400 + 2400 AS lat_hi,
             |            n_nationkey * 1440 % 36000 AS lon_lo,
             |            n_nationkey * 1440 % 36000 + 7200 AS lon_hi
             |          FROM nation)
             |SELECT n_nationkey, CAST(count(*) AS BIGINT) AS n_inside,
             |       CAST(min(c_custkey) AS BIGINT) AS first_cust,
             |       CAST(max(slon) AS BIGINT) AS max_lon
             |FROM pts JOIN rects
             |  ON slat >= lat_lo AND slat < lat_hi
             | AND slon >= lon_lo AND slon < lon_hi
             |GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin))
  )
}
