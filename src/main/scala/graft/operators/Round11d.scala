package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 60: two-way ANOVA with interaction (the factorial
  * experiment readout the one-way key can't give: does segment's effect
  * on balance DIFFER by nation?) and the parquet bloom-filter sink (the
  * point-lookup data-skipping layer beyond min/max statistics).
  *
  * Determinism: every sum-of-squares derives from exact BIGINT cell
  * moments; the s²/n terms square through DECIMAL(38,0)/HUGEINT (the
  * global cents sum squared clears BIGINT already at sf0.1) and
  * floor-divide back to integers (≤1 cent² quantization per cell
  * against SS ~1e13 — sub-ulp) so no float sum ever crosses a merge;
  * F ratios are terminal 6-dp doubles from identical formulas. The one
  * remaining BIGINT ceiling is Σc² (~sf100); wider is the documented
  * DECIMAL(38,0) swap.
  *
  * Scale shape: ANOVA is one scan → 125-cell grid → three bounded
  * aggregates; the bloom sink writes one pass and reads back with an
  * equality predicate the bloom filter serves from footer metadata
  * (Round11dSpec opens the footer and asserts the filter exists).
  */
object Round11d {

  val decls: Map[String, Decl] = Map(
    // Two-way ANOVA, factors nation (a=25) × segment (b=5), response =
    // account balance in cents. Sequential (Type-I) sums of squares on
    // the unbalanced design: SS_A, SS_B, SS_AB = SS_cells − SS_A − SS_B,
    // SS_E = Σc² − Σ_ij s²/n. One output row per source with df, SS
    // (cents², exact within the integer-div quantization), F and eta².
    "agg_two_way_anova" -> Decl(
      (s, d) => {
        val base = Tables(s, d, "customer")
          .select(col("c_nationkey").cast("bigint").as("a"),
                  col("c_mktsegment").as("b"),
                  round(col("c_acctbal") * 100).cast("bigint").as("c"))
        val cells = base.groupBy("a", "b")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
               sum(col("c") * col("c")).as("q"))
        val g = cells.agg(
          sum("n").as("n_tot"), sum("sc").as("s_tot"), sum("q").as("q_tot"),
          countDistinct("a").as("na"), countDistinct("b").as("nb"),
          count(lit(1)).as("ncells"),
          sum(expr("cast((cast(sc as decimal(38,0)) * sc) div n as bigint)"))
            .as("ss_cells_raw"))
        val ma = cells.groupBy("a")
          .agg(sum("n").as("n"), sum("sc").as("sc"))
          .agg(sum(expr("cast((cast(sc as decimal(38,0)) * sc) div n as bigint)"))
            .as("ss_a_raw"))
        val mb = cells.groupBy("b")
          .agg(sum("n").as("n"), sum("sc").as("sc"))
          .agg(sum(expr("cast((cast(sc as decimal(38,0)) * sc) div n as bigint)"))
            .as("ss_b_raw"))
        val stats = g.crossJoin(broadcast(ma)).crossJoin(broadcast(mb))
          .withColumn("cm",
            expr("cast((cast(s_tot as decimal(38,0)) * s_tot) div n_tot as bigint)"))
          .withColumn("ss_a", col("ss_a_raw") - col("cm"))
          .withColumn("ss_b", col("ss_b_raw") - col("cm"))
          .withColumn("ss_ab",
            col("ss_cells_raw") - col("ss_a_raw") - col("ss_b_raw") + col("cm"))
          .withColumn("ss_e", col("q_tot") - col("ss_cells_raw"))
          .withColumn("ss_t", col("q_tot") - col("cm"))
          .withColumn("df_a", col("na") - 1L)
          .withColumn("df_b", col("nb") - 1L)
          .withColumn("df_ab", (col("na") - 1L) * (col("nb") - 1L))
          .withColumn("df_e", col("n_tot") - col("ncells"))
        def row(src: String, ss: String, df: String) =
          stats.select(lit(src).as("source"), col(ss).as("ss_cents2"),
                       col(df).as("df"),
                       round((col(ss).cast("double") / col(df)) /
                             (col("ss_e").cast("double") / col("df_e")), 6)
                         .as("f_stat"),
                       round(col(ss).cast("double") / col("ss_t"), 6)
                         .as("eta_sq"))
        row("nation", "ss_a", "df_a")
          .unionAll(row("segment", "ss_b", "df_b"))
          .unionAll(row("interaction", "ss_ab", "df_ab"))
          .orderBy("source")
      },
      Some("""WITH base AS (SELECT CAST(c_nationkey AS BIGINT) AS a,
             |                     c_mktsegment AS b,
             |                     CAST(round(c_acctbal * 100) AS BIGINT) AS c
             |              FROM customer),
             |cells AS (SELECT a, b, count(*) AS n, sum(c) AS sc,
             |                 sum(c * c) AS q
             |          FROM base GROUP BY a, b),
             |g AS (SELECT sum(n) AS n_tot, sum(sc) AS s_tot, sum(q) AS q_tot,
             |             count(DISTINCT a) AS na, count(DISTINCT b) AS nb,
             |             count(*) AS ncells,
             |             CAST(sum((CAST(sc AS HUGEINT) * sc) // n) AS BIGINT) AS ss_cells_raw
             |      FROM cells),
             |ma AS (SELECT CAST(sum((CAST(sc AS HUGEINT) * sc) // n) AS BIGINT)
             |                AS ss_a_raw FROM (
             |         SELECT a, sum(n) AS n, sum(sc) AS sc
             |         FROM cells GROUP BY a)),
             |mb AS (SELECT CAST(sum((CAST(sc AS HUGEINT) * sc) // n) AS BIGINT)
             |                AS ss_b_raw FROM (
             |         SELECT b, sum(n) AS n, sum(sc) AS sc
             |         FROM cells GROUP BY b)),
             |st AS (SELECT *,
             |              CAST((CAST(s_tot AS HUGEINT) * s_tot) // n_tot AS BIGINT) AS cm
             |       FROM g CROSS JOIN ma CROSS JOIN mb),
             |ss AS (SELECT ss_a_raw - cm AS ss_a, ss_b_raw - cm AS ss_b,
             |              ss_cells_raw - ss_a_raw - ss_b_raw + cm AS ss_ab,
             |              q_tot - ss_cells_raw AS ss_e, q_tot - cm AS ss_t,
             |              na - 1 AS df_a, nb - 1 AS df_b,
             |              (na - 1) * (nb - 1) AS df_ab,
             |              n_tot - ncells AS df_e
             |       FROM st)
             |SELECT source, CAST(ss_cents2 AS BIGINT) AS ss_cents2,
             |       CAST(df AS BIGINT) AS df,
             |       round((CAST(ss_cents2 AS DOUBLE) / df)
             |             / (CAST(ss_e AS DOUBLE) / df_e), 6) AS f_stat,
             |       round(CAST(ss_cents2 AS DOUBLE) / ss_t, 6) AS eta_sq
             |FROM (SELECT 'nation' AS source, ss_a AS ss_cents2, df_a AS df,
             |             ss_e, df_e, ss_t FROM ss
             |      UNION ALL
             |      SELECT 'segment', ss_b, df_b, ss_e, df_e, ss_t FROM ss
             |      UNION ALL
             |      SELECT 'interaction', ss_ab, df_ab, ss_e, df_e, ss_t FROM ss)
             |ORDER BY source""".stripMargin)),

    // Parquet bloom-filter sink: write lineitem with a bloom filter on
    // l_partkey (point-lookup skipping for a column whose min/max ranges
    // are useless — every file spans the whole key domain), read back
    // through an equality predicate. The oracle reproduces the lookup on
    // the base table — roundtrip + filter correctness; the spec opens
    // the parquet footer and asserts the bloom filter is really there.
    "sink_parquet_bloom_roundtrip" -> Decl(
      (s, d) => {
        val out = Tables.scratchDir("graft_bloom").resolve("li_bloom").toString
        Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
                  round(col("l_extendedprice") * 100).cast("bigint")
                    .as("cents"))
          .write.mode("overwrite")
          .option("parquet.bloom.filter.enabled#l_partkey", "true")
          .option("parquet.bloom.filter.expected.ndv#l_partkey", "200000")
          // a fully dictionary-encoded chunk writes NO bloom (the
          // dictionary already is one); real bloom columns disable
          // dictionary so the filter exists at every cardinality
          .option("parquet.enable.dictionary#l_partkey", "false")
          .parquet(out)
        s.read.parquet(out)
          .filter(col("l_partkey") % 1000 === 7)
          .groupBy("l_partkey")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
          .orderBy("l_partkey")
      },
      Some("""SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |            AS BIGINT) AS cents
             |FROM lineitem WHERE l_partkey % 1000 = 7
             |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin))
  )

  /** Latest bloom-sink scratch dir (name sort = creation order) — for
    * the footer-inspection spec. */
  private[graft] def latestBloomDir(): java.nio.file.Path = {
    val root = Tables.scratchRootForTest
    val dirs = java.nio.file.Files.list(root).iterator()
    var best: java.nio.file.Path = null
    while (dirs.hasNext) {
      val p = dirs.next()
      if (p.getFileName.toString.startsWith("graft_bloom-") &&
          (best == null ||
           p.getFileName.toString > best.getFileName.toString)) best = p
    }
    require(best != null, "no graft_bloom scratch dir — run the key first")
    best.resolve("li_bloom")
  }
}
