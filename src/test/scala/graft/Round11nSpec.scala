package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-70 bounds: the minimax isotonic fit equals an independent
  * pool-adjacent-violators run (and is monotone); manifest skipping
  * returns exactly the full-scan answer (its internal require already
  * fails the query if no file was skipped).
  */
class Round11nSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.icu.caseMappings.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("agg_isotonic_calibration equals PAVA and is monotone") {
    val rows = SparkEntry.queries("agg_isotonic_calibration")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val iso = rows.map(_._4)
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a - 1e-9 },
           s"fit must be non-decreasing: ${iso.toSeq}")

    // independent PAVA over the same (n, f) buckets
    val orders = Tables(spark, sf, "orders")
    val mx = orders.agg(max(col("o_totalprice"))).first().getDouble(0)
    val raw = orders.select(
        least(lit(9), floor(col("o_totalprice") * 10 / mx).cast("int")).as("b"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("h"))
      .groupBy("b").agg(count(lit(1)).as("n"), sum(col("h")).as("f"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    case class Block(w: Long, s: Long) { def avg: Double = s.toDouble / w }
    val st = scala.collection.mutable.Stack[Block]()
    raw.foreach { case (_, n, f) =>
      var b = Block(n, f)
      while (st.nonEmpty && st.top.avg >= b.avg - 1e-12) {
        val t = st.pop(); b = Block(t.w + b.w, t.s + b.s)
      }
      st.push(b)
    }
    val pava = st.toSeq.reverse.flatMap(b => Seq.fill(b.w.toInt)(b.avg))
    // expand block fits back to buckets by weight: instead compare per
    // bucket by re-walking blocks
    val fits = scala.collection.mutable.ArrayBuffer[Double]()
    var idx = 0
    st.toSeq.reverse.foreach { b =>
      var w = 0L
      while (w < b.w && idx < raw.length) { // blocks cover buckets in order
        fits += b.avg
        w += raw(idx)._2
        idx += 1
      }
    }
    assert(fits.length == rows.length, s"${fits.length} vs ${rows.length}")
    rows.map(_._4).zip(fits).zipWithIndex.foreach { case ((got, want), i) =>
      assert(math.abs(got - want) < 1e-6, s"bucket $i: $got vs $want")
    }
    val _ = pava // silence unused (sanity construction above)
  }

  test("scan_manifest_minmax_skip equals the full-scan filter") {
    val got = SparkEntry.queries("scan_manifest_minmax_skip")(spark, sf)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    val want = Tables(spark, sf, "lineitem")
      .select(to_date(col("l_shipdate")).as("d"), col("l_quantity"))
      .filter(col("d").between("1995-06-01", "1995-08-31"))
      .groupBy("d")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("bigint").as("q"))
      .orderBy("d")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.sameElements(want))
  }
}
