package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-9 fourteenth wave: lakehouse VACUUM (retention-driven physical
  * file removal under snapshot isolation) and PCA whitening as a
  * fit→apply pipeline (the learned transform broadcast over the scan).
  */
object Round9n {

  val decls: Map[String, Decl] = Map(
    // VACUUM — the retention pass every snapshot-isolated table needs:
    // v1 commits two immutable files, v2 COMPACTS them into one rewritten
    // file (dropping the 'P' rows — a delete folded into compaction),
    // retention then expires v1, and vacuum physically deletes every file
    // no LIVE manifest references. The declared result reads v2 AFTER the
    // vacuum — proving the rewrite is self-contained — and reports the
    // exact removed-file census (single-file commits by construction, so
    // the count is deterministic). The oracle recomputes v2's content
    // from the base table. At 100 TB this is the storage-reclaim job:
    // manifests are KB metadata, data files never rewrite except by
    // compaction, and vacuum is a pure metadata-diff + delete.
    "sink_snapshot_vacuum" -> Decl(
      (s, d) => {
        import java.nio.file.{Files, Paths}
        val dir = Tables.scratchDir("graft_vacuum")
        val orders = Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
                  round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        val f1 = dir.resolve("part_a.parquet")
        val f2 = dir.resolve("part_b.parquet")
        val f3 = dir.resolve("compacted.parquet")
        orders.filter(col("o_orderkey") % 2 === 0)
          .coalesce(1).write.parquet(f1.toString)
        orders.filter(col("o_orderkey") % 2 =!= 0)
          .coalesce(1).write.parquet(f2.toString)
        Files.writeString(dir.resolve("v1.manifest"), s"$f1\n$f2")
        // v2 = compaction + delete of the 'P' slice, one rewritten file
        s.read.parquet(f1.toString, f2.toString)
          .filter(col("o_orderstatus") =!= "P")
          .coalesce(1).write.parquet(f3.toString)
        Files.writeString(dir.resolve("v2.manifest"), f3.toString)
        // retention expires v1 → live = {v2} → referenced = {f3}
        Files.delete(dir.resolve("v1.manifest"))
        val live = Files.list(dir).iterator()
        val referenced = scala.jdk.CollectionConverters.IteratorHasAsScala(live)
          .asScala.filter(_.toString.endsWith(".manifest"))
          .flatMap(m => Files.readString(m).split("\n")).toSet
        val removed = Seq(f1, f2, f3).count { f =>
          if (!referenced.contains(f.toString)) {
            // recursive delete of the parquet directory
            Files.walk(f).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => Files.deleteIfExists(p))
            true
          } else false
        }
        s.read.parquet(f3.toString)
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
          .select(lit("v2_after_vacuum").as("version"), col("n"), col("cents"),
                  lit(removed.toLong).as("files_removed"))
      },
      Some("""SELECT 'v2_after_vacuum' AS version,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS cents,
             |       CAST(2 AS BIGINT) AS files_removed
             |FROM orders WHERE o_orderstatus <> 'P'""".stripMargin)),

    // PCA whitening APPLY — the fit→transform split of an ML pipeline:
    // the fit is the one-pass Gram state + driver eigen (exactly
    // vec_pca_top2_deflate's machinery); the apply broadcasts (μ·v, v,
    // λ) as literal arrays and projects each sampled vector with a fixed
    // LEFT-FOLD dot product (aggregate over zip_with — deterministic
    // float order, unlike a grouped sum), z_k = (x·v_k − μ·v_k)/√λ_k.
    // Oracle-N (eigen); Round9nSpec pins unit variance of the whitened
    // coordinates over the full corpus and determinism across runs.
    "vec_pca_whiten_apply" -> Decl(
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
        val mu = gram.s.map(_ / gram.n)
        def dotMu(v: Array[Double]) = mu.zip(v).map { case (a, b) => a * b }.sum
        val (c1, c2) = (dotMu(v1), dotMu(v2))
        def proj(v: Array[Double], c: Double, l: Double, name: String) = {
          val varr = array(v.toIndexedSeq.map(lit): _*)
          round((expr_dot(varr) - lit(c)) / lit(math.sqrt(l)), 6).as(name)
          }
        def expr_dot(varr: org.apache.spark.sql.Column) =
          aggregate(zip_with(col("embedding"), varr,
                             (x, w) => x.cast("double") * w),
                    lit(0.0), (acc, p) => acc + p)
        Tables(s, d, "embeddings")
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id"),
                  proj(v1, c1, l1, "z1"), proj(v2, c2, l2, "z2"))
          .orderBy("vec_id")
      },
      None)
  )
}
