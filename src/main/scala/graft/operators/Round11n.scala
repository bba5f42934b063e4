package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 70: isotonic calibration (the monotone regression every
  * score-calibration pipeline runs — here via the MINIMAX closed form
  * fit_i = max_{j≤i} min_{k≥i} wavg(y, j..k), which turns the
  * sequential pool-adjacent-violators loop into three bounded-grid
  * joins: fully declarative, no recursion, exact integer interval sums)
  * and manifest-driven min/max file skipping (the Iceberg/Delta
  * data-skipping shape: a file-level statistics manifest built in one
  * scan prunes which parquet files a range predicate reads at all).
  *
  * Scale shape: isotonic runs ONE corpus aggregate into a 10-bucket
  * grid; the O(B³) minimax enumeration lives on that constant grid
  * (220 interval rows). File skipping scans the manifest (one row per
  * file — KB-scale for a million-file table), reads ONLY overlapping
  * files, and re-filters; Round11nSpec asserts the skipped plan touches
  * strictly fewer files while the oracle proves result equality.
  */
object Round11n {

  val decls: Map[String, Decl] = Map(
    // Isotonic (non-decreasing) calibration of the F-status rate vs
    // o_totalprice decile. Interval averages are exact BIGINT ratios
    // (Σ hits / Σ n over bucket ranges); both engines evaluate the same
    // minimax over the same rationals, so the fit hash-matches without
    // any float gymnastics. Round11nSpec checks equality with an
    // independent PAVA implementation.
    "agg_isotonic_calibration" -> Decl(
      (s, d) => {
        val orders = Tables(s, d, "orders")
        val maxP = orders.agg(max(col("o_totalprice")).as("mx"))
        val buckets = orders.crossJoin(broadcast(maxP))
          .select(least(lit(9), floor(col("o_totalprice") * 10 / col("mx"))
                    .cast("int")).as("bucket"),
                  when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("hit"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), sum(col("hit")).as("f"))
        // prefix sums over the bounded bucket grid -> O(B^2) interval sums
        val b = buckets.select(col("bucket"), col("n"), col("f"))
        val iv = b.as("lo").join(b.as("hi"),
            col("lo.bucket") <= col("hi.bucket"))
          .join(b.as("m"),
            col("m.bucket") >= col("lo.bucket") &&
            col("m.bucket") <= col("hi.bucket"))
          .groupBy(col("lo.bucket").as("j"), col("hi.bucket").as("k"))
          .agg((sum(col("m.f")).cast("double") /
                sum(col("m.n")).cast("double")).as("a"))
        // fit_i = max_{j<=i} min_{k>=i} A(j,k)
        val inner = b.select(col("bucket").as("i"))
          .join(iv, col("j") <= col("i") && col("k") >= col("i"))
          .groupBy(col("i"), col("j")).agg(min(col("a")).as("mn"))
        val fit = inner.groupBy(col("i")).agg(max(col("mn")).as("iso"))
        buckets.join(fit, col("bucket") === col("i"))
          .select(col("bucket"), col("n"),
                  round(col("f").cast("double") / col("n").cast("double"), 6)
                    .as("raw_rate"),
                  round(col("iso"), 6).as("iso_rate"))
          .orderBy("bucket")
      },
      Some("""WITH mx AS (SELECT max(o_totalprice) AS mx FROM orders),
             |bk AS (SELECT least(9, CAST(floor(o_totalprice * 10 / mx.mx) AS INT))
             |              AS bucket,
             |              CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
             |       FROM orders CROSS JOIN mx),
             |b AS (SELECT bucket, count(*) AS n, sum(hit) AS f
             |      FROM bk GROUP BY bucket),
             |iv AS (SELECT lo.bucket AS j, hi.bucket AS k,
             |              CAST(sum(m.f) AS DOUBLE) / sum(m.n) AS a
             |       FROM b lo JOIN b hi ON lo.bucket <= hi.bucket
             |       JOIN b m ON m.bucket BETWEEN lo.bucket AND hi.bucket
             |       GROUP BY 1, 2),
             |inner_min AS (SELECT i.bucket AS i, iv.j, min(iv.a) AS mn
             |              FROM b i JOIN iv ON iv.j <= i.bucket AND iv.k >= i.bucket
             |              GROUP BY 1, 2),
             |fit AS (SELECT i, max(mn) AS iso FROM inner_min GROUP BY i)
             |SELECT b.bucket, b.n,
             |       round(CAST(b.f AS DOUBLE) / b.n, 6) AS raw_rate,
             |       round(fit.iso, 6) AS iso_rate
             |FROM b JOIN fit ON fit.i = b.bucket
             |ORDER BY b.bucket""".stripMargin)),

    // Range-cluster lineitem by l_shipdate into 8 files, build a
    // per-file (path, min, max) manifest in one scan, then answer a
    // date-range query by reading ONLY the files whose range overlaps.
    // The result must equal the plain full-scan filter (the oracle);
    // the pruned path list itself is the point — at a million files the
    // manifest is the difference between opening 8 footers and 8 000.
    "scan_manifest_minmax_skip" -> Decl(
      (s, d) => {
        val dir = Tables.scratchDir("graft_manifest").toString
        Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
                  to_date(col("l_shipdate")).as("ship_day"),
                  col("l_quantity"))
          .repartitionByRange(8, col("ship_day"))
          .write.mode("overwrite").parquet(dir)
        // one scan builds the manifest (a stored table in production)
        val manifest = s.read.parquet(dir)
          .groupBy(col("_metadata.file_path").as("path"))
          .agg(min(col("ship_day")).as("lo"), max(col("ship_day")).as("hi"))
          .collect()
        val (from, to) = ("1995-06-01", "1995-08-31")
        val keep = manifest
          .filter(r => r.getDate(1).toString <= to && r.getDate(2).toString >= from)
          .map(_.getString(0))
        require(keep.nonEmpty && keep.length < manifest.length,
                s"manifest must actually skip files (${keep.length}/${manifest.length})")
        s.read.parquet(keep: _*)
          .filter(col("ship_day").between(from, to))
          .groupBy(col("ship_day"))
          .agg(count(lit(1)).as("n"),
               sum(col("l_quantity")).cast("bigint").as("qty"))
          .orderBy("ship_day")
      },
      Some("""SELECT CAST(l_shipdate AS DATE) AS ship_day, count(*) AS n,
             |       CAST(sum(l_quantity) AS BIGINT) AS qty
             |FROM lineitem
             |WHERE CAST(l_shipdate AS DATE)
             |      BETWEEN DATE '1995-06-01' AND DATE '1995-08-31'
             |GROUP BY 1
             |ORDER BY 1""".stripMargin))
  )
}
