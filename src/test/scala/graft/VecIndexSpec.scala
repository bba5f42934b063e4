package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** VecIndex invariants (round-13, verdict item 5): the ANN ladder's
  * trained artifacts — the shared quantized table, the PQ codebooks and
  * codes, the IVFPQ coarse/residual codebooks and codes, the IVF
  * centroids and cells — are each built AT MOST ONCE per (JVM, sf dir),
  * and every later consumer probes the stored tables (the
  * PairIndex/ShingleIndex one-build discipline). Output equality with
  * the former inline trainings is pinned separately: bit-identical
  * dumps at sf0.01 AND sf0.1 (the trainings are exact-integer / 6-dp
  * rounded, so the parquet round-trip preserves every value), plus the
  * Round9Spec / Round10hhSpec recall bounds.
  */
class VecIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.icu.caseMappings.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("one build serves the whole ANN ladder, twice over") {
    val before = graft.operators.VecIndex.builds.get()
    val pq1 = SparkEntry.queries("sim_ann_pq")(spark, sf).collect()
    val ivfpq1 = SparkEntry.queries("sim_ann_ivfpq_residual")(spark, sf).collect()
    val ivf1 = SparkEntry.queries("sim_ann_ivf")(spark, sf).collect()
    assert(pq1.nonEmpty && ivfpq1.nonEmpty && ivf1.nonEmpty)
    val afterFirst = graft.operators.VecIndex.builds.get()
    // 4 artifact families at most: q, pq, ivfpq, ivf
    assert(afterFirst - before <= 4,
           s"expected <= 4 artifact builds, saw ${afterFirst - before}")
    // second pass: pure probes, ZERO new builds, identical rows
    val pq2 = SparkEntry.queries("sim_ann_pq")(spark, sf).collect()
    val ivfpq2 = SparkEntry.queries("sim_ann_ivfpq_residual")(spark, sf).collect()
    val ivf2 = SparkEntry.queries("sim_ann_ivf")(spark, sf).collect()
    assert(graft.operators.VecIndex.builds.get() == afterFirst,
           "a re-run re-trained an artifact instead of probing the store")
    assert(pq1.toSeq == pq2.toSeq && ivfpq1.toSeq == ivfpq2.toSeq &&
           ivf1.toSeq == ivf2.toSeq,
           "stored-probe results must equal the first (building) run's")
  }
}
