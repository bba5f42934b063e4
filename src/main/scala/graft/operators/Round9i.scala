package graft.operators

import graft.{Decl, Sql, Tables}
import org.apache.spark.sql.functions._

/** Round-9 ninth wave: the SQL-session ETL surface as a contract key,
  * two-component PCA by deflation, an integer-exact log-scale histogram,
  * and HLL set-intersection estimation by inclusion–exclusion.
  */
object Round9i {

  val decls: Map[String, Decl] = Map(
    // Multi-statement ETL through the SQL session (graft.Sql + the
    // restart-surviving GraftCatalog): seed a warehouse table from one
    // slice, append two more slices with INSERT INTO … SELECT, read the
    // final table back and aggregate. The oracle recomputes the same
    // report straight from the base table — equality proves the
    // seed+append mutation path loses and duplicates nothing. This is the
    // reference's user-facing surface (DDL + DML + query in one session)
    // exercised as a declared key, not just in SqlSpec.
    "sql_insert_select_etl" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_etlwh")
        val wh = dir.toString
        // table name unique per invocation: GraftCatalog.restore keeps the
        // FIRST registered path on a name collision, so a session re-run
        // with a fixed name would silently append into the previous run's
        // table (the saveAsTable discipline from join_bucketed_colocated)
        val t = s"etl_sales_${dir.getFileName.toString.filter(_.isDigit)}"
        Tables(s, d, "orders").createOrReplaceTempView("orders")
        Tables(s, d, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderstatus"),
                  round(col("o_totalprice") * 100).cast("bigint").as("cents"))
          .write.mode("overwrite").parquet(s"$wh/$t")
        graft.GraftCatalog.restore(s, wh)
        Sql.execute(s, wh,
          s"""INSERT INTO $t
            |SELECT o_orderkey, o_orderstatus,
            |       CAST(round(o_totalprice * 100) AS BIGINT)
            |FROM orders WHERE o_orderstatus = 'O'""".stripMargin)
        Sql.execute(s, wh,
          s"""INSERT INTO $t
            |SELECT o_orderkey, o_orderstatus,
            |       CAST(round(o_totalprice * 100) AS BIGINT)
            |FROM orders WHERE o_orderstatus = 'P'""".stripMargin)
        s.read.parquet(s"$wh/$t")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS cents
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // Two-component PCA by deflation: the Gram-state Aggregator collapses
    // the corpus to d + d(d+1)/2 doubles in one pass (the 100 TB shape —
    // state size is dimension-, not data-bounded); the driver runs the
    // deterministic power iteration, deflates (C − λ₁v₁v₁ᵀ), and re-runs
    // for the second component. Oracle-N (no eigen solver in DuckDB);
    // Round9iSpec pins orthogonality |v₁·v₂| ≈ 0, the eigen ordering
    // λ₁ ≥ λ₂ > 0, and both residuals — the spectral ladder past
    // vec_pca_topcomponent's single component.
    "vec_pca_top2_deflate" -> Decl(
      (s, d) => {
        val dim = 64
        val gramUdf = udaf(new graft.functions.VectorGramAgg(dim))
        val row = Tables(s, d, "embeddings")
          .agg(gramUdf(col("embedding")).as("g"))
          .select(col("g.n"), col("g.s"), col("g.g"))
          .head()
        val gram = graft.functions.GramState(
          row.getLong(0), row.getSeq[Double](1).toArray, row.getSeq[Double](2).toArray)
        val cov = graft.functions.VectorGramAgg.covariance(gram, dim)
        val (v1, l1) = graft.functions.VectorGramAgg.topEigen(cov)
        val deflated = Array.tabulate(dim, dim)((i, j) => cov(i)(j) - l1 * v1(i) * v1(j))
        val (v2, l2) = graft.functions.VectorGramAgg.topEigen(deflated)
        val trace = (0 until dim).map(i => cov(i)(i)).sum
        import s.implicits._
        (v1.zipWithIndex.map { case (w, i) =>
            (1L, i.toLong, math.rint(w * 1e6) / 1e6, math.rint(l1 / trace * 1e6) / 1e6) } ++
         v2.zipWithIndex.map { case (w, i) =>
            (2L, i.toLong, math.rint(w * 1e6) / 1e6, math.rint(l2 / trace * 1e6) / 1e6) })
          .toSeq.toDF("component", "dim", "weight", "var_share")
          .orderBy("component", "dim")
      },
      None),

    // Log₂-scale histogram — the heavy-tail profile (latency/price/size
    // distributions) with INTEGER-EXACT bucketing: bucket = ⌊log₂ c⌋
    // computed as length(bin(c)) − 1, a string-length identity with no
    // floating log anywhere (a float log2 would disagree between engines
    // within an ulp of each power of two — exactly the values every
    // bucket boundary sits on). One partial-aggregating shuffle over the
    // ~30-row bucket space.
    "agg_log2_histogram" -> Decl(
      (s, d) => {
        Tables(s, d, "lineitem")
          .select(round(col("l_extendedprice") * 100).cast("bigint").as("c"))
          .filter(col("c") >= 1)
          .select((length(bin(col("c"))) - 1).cast("bigint").as("bucket"), col("c"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), min(col("c")).as("min_c"), max(col("c")).as("max_c"))
          .orderBy("bucket")
      },
      Some("""WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
             |           FROM lineitem),
             |b AS (SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS bucket, c
             |      FROM c WHERE c >= 1)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             |       CAST(min(c) AS BIGINT) AS min_c, CAST(max(c) AS BIGINT) AS max_c
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // HLL set-intersection estimate by inclusion–exclusion — "how many
    // users did BOTH X and Y" from mergeable per-segment sketches, without
    // re-scanning raw data: |A∩B| ≈ est(A) + est(B) − est(A ∪ B), the
    // union sketch merged from the two stored segment sketches. The sketch
    // path never shuffles user ids — each side collapses to a KB register
    // array. Oracle-N (sketch estimates are impl-defined); Round9iSpec
    // bounds every estimate against the exact distinct counts.
    "agg_hll_intersection" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
        val sk = ev.filter(col("event_type").isin("click", "purchase"))
          .groupBy("event_type")
          .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        sk.agg(
            max(when(col("event_type") === "click", col("sk"))).as("ska"),
            max(when(col("event_type") === "purchase", col("sk"))).as("skb"))
          .select(
            expr("round(hll_sketch_estimate(ska))").cast("bigint").as("est_a"),
            expr("round(hll_sketch_estimate(skb))").cast("bigint").as("est_b"),
            expr("round(hll_sketch_estimate(hll_union(ska, skb)))").cast("bigint")
              .as("est_union"))
          .select(col("est_a"), col("est_b"), col("est_union"),
                  (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"))
      },
      None)
  )
}
