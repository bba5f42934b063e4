package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-65 bounds: multiprobe candidates are a strict superset of the
  * single-probe key's (so recall can only rise) and hit a recall floor
  * against the exact >=0.90 pair set; the Misra-Gries two-pass answer
  * equals the exact heavy-hitter set by brute force.
  */
class Round11iSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.icu.caseMappings.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("sim_ann_lsh_multiprobe: non-vacuous planted truth, recall floor, superset") {
    val multi = SparkEntry.queries("sim_ann_lsh_multiprobe")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(multi.nonEmpty, "multiprobe returned 0 pairs — vacuous again")

    // exact >= 0.90 pair set, brute force over the SAME planted corpus the
    // key retrieves from (every planted (v, v+1000000) pair has cosine
    // >= sqrt(1-0.09) = 0.9539 by construction, so truth >= 500 pairs —
    // assert non-emptiness UNCONDITIONALLY, never guard on it)
    val emb = graft.operators.Round11i.plantedEmbeddings(spark, sf)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = (for {
      i <- emb.indices; j <- (i + 1) until emb.length
      if cos(emb(i)._2, emb(j)._2) >= 0.90
    } yield {
      val (x, y) = (emb(i)._1, emb(j)._1)
      (math.min(x, y), math.max(x, y))
    }).toSet
    assert(truth.size >= emb.length / 2,
           s"planted truth must cover every row pair, got ${truth.size}")
    val recall = truth.count(multi).toDouble / truth.size
    assert(recall >= 0.9, s"multiprobe recall $recall over ${truth.size}")

    // superset: single-probe candidates on the SAME planted corpus are
    // contained in the multiprobe candidates (flip 0 is the home bucket)
    val planted = graft.operators.Round11i.plantedEmbeddings(spark, sf)
    val singleCand = graft.operators.Round11i
      .srpCandidates(planted, 4, graft.operators.PipelineExt.SrpBitsPerTable,
                     multiprobe = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multiCand = graft.operators.Round11i
      .srpCandidates(planted, 4, graft.operators.PipelineExt.SrpBitsPerTable,
                     multiprobe = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(singleCand.subsetOf(multiCand),
           s"missing ${(singleCand -- multiCand).take(5)} single-probe candidates")
    // and multiprobe recall over truth is no worse than single-probe's
    val singleHits = truth.count { case (a, b) =>
      singleCand((a, b)) && cos(emb.find(_._1 == a).get._2,
                                emb.find(_._1 == b).get._2) >= 0.90 }
    assert(truth.count(multiCand) >= singleHits)
  }

  test("srpCandidates struct fallback equals the packed path for >= 2^31 ids") {
    // Round-13 id-width guard: ids outside [0, 2^31) must take the struct
    // pair encoding and produce the SAME candidate set (bucketing depends
    // only on the embedding, so shifting every id by 2^31 shifts each
    // emitted pair by exactly that amount).
    val planted = graft.operators.Round11i.plantedEmbeddings(spark, sf)
    val shift = 1L << 31
    val packed = graft.operators.Round11i
      .srpCandidates(planted, 4, graft.operators.PipelineExt.SrpBitsPerTable,
                     multiprobe = true)
      .collect().map(r => (r.getLong(0) + shift, r.getLong(1) + shift)).toSet
    val structP = graft.operators.Round11i
      .srpCandidates(planted.withColumn("vec_id", col("vec_id") + shift),
                     4, graft.operators.PipelineExt.SrpBitsPerTable,
                     multiprobe = true, idsPacked = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(structP == packed,
           s"struct fallback diverged: ${(structP -- packed).take(3)} extra, " +
           s"${(packed -- structP).take(3)} missing")
    // the guard itself must report the real fixture domain as packable
    assert(graft.operators.Round11i.plantedIdsPacked(spark, sf),
           "fixture vec_ids must take the packed fast path")
  }

  test("agg_heavy_hitters_mg_exact equals the exact heavy-hitter set") {
    val rows = SparkEntry.queries("agg_heavy_hitters_mg_exact")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val counts = Tables(spark, sf, "documents")
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = counts.values.sum
    val want = counts.filter { case (_, c) => c * 64L > n }
    assert(want.nonEmpty, "fixture has no heavy hitters — test is vacuous")
    assert(rows == want, s"got ${rows.size} vs ${want.size} exact")
  }
}
