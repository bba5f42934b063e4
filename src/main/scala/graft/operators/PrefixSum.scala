package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed cumulative sum — the scan-parallel replacement for
  * `Window.orderBy(...)` with no partition spec, which funnels the entire
  * ordered input through ONE task (the round-9 verdict's last confirmed
  * 100×-scale killer, agg_abc_classification / agg_rfm_segmentation).
  *
  * Classic two-pass parallel prefix sum:
  *   1. range-partition on the total order, sort within partitions, and
  *      compute each partition's LOCAL running sum in one `mapPartitions`
  *      pass (no shuffle beyond the range exchange itself);
  *   2. aggregate one total per partition (#partitions rows — bounded by
  *      cluster size, not data size), prefix-sum THAT tiny table with an
  *      ordinary window, and broadcast the per-partition offsets back.
  *
  * cum(row) = localCum(row) + offset(partition). Rows and values are
  * identical to the single-task window for any TOTAL order (callers must
  * tie-break), so oracles are unchanged; wall-clock is O(n/p) per task
  * instead of O(n) on one task at every scale.
  */
object PrefixSum {

  /** Append column `out` = running sum of `value` (a BIGINT expression,
    * any sign; NULL contributes 0) over the total order `order`. Every
    * input column is preserved.
    */
  def cumsumLong(df: DataFrame, order: Seq[Column], value: Column,
                 out: String): DataFrame =
    cumsumLongs(df, order, Seq(value -> out))

  /** Append column `out` = running MIN of `value` over all STRICT
    * predecessors in the total order `order` (exclusive — the current row
    * does not see itself; the first row gets Long.MaxValue, the "no
    * predecessor" sentinel). Same two-pass shape as the cumsum: local
    * exclusive scan + inclusive per-partition totals, then a window over
    * the ≤#partitions totals and one broadcast join back. The skyline
    * operator's dominance test is exactly this scan.
    */
  def cumminLongExclusive(df: DataFrame, order: Seq[Column], value: Column,
                          out: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sparkContext.defaultParallelism, 1)
    // NULL is the min-identity (skipped), same null discipline as cumsum
    val parted = df.withColumn("__pmv",
        coalesce(value.cast("bigint"), lit(Long.MaxValue)))
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
    val vIdx = parted.schema.fieldIndex("__pmv")
    val schema = parted.schema
      .add("__lx", LongType, nullable = false)  // exclusive running min
      .add("__lc", LongType, nullable = false)  // inclusive running min
    val local = parted.mapPartitions { rows =>
      var acc = Long.MaxValue
      rows.map { r =>
        val prior = acc
        acc = math.min(acc, r.getLong(vIdx))
        Row.fromSeq(r.toSeq ++ Seq(prior, acc))
      }
    }(Encoders.row(schema))
      // Lazy persist, NOT localCheckpoint: checkpoint (even eager=false)
      // finalizes the AQE plan and runs every upstream stage at BUILD time.
      // persist defers to the first action, then both consumers (offsets
      // aggregate + final join) share ONE materialization — which also
      // pins the range boundaries and __pid assignment they must agree on.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"))
      .agg(min(col("__lc")).as("__pt"))
      .select(col("__pid"),
              coalesce(min(col("__pt")).over(wo), lit(Long.MaxValue))
                .as("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, least(col("__lx"), col("__off")))
      .drop("__pid", "__pmv", "__lx", "__lc", "__off")
  }

  /** Multi-column variant: several running sums sharing ONE total order
    * and therefore one range exchange + one local pass (text_vocab_growth
    * needs cumulative tokens AND cumulative vocabulary over the same
    * checkpoint spine).
    */
  def cumsumLongs(df: DataFrame, order: Seq[Column],
                  values: Seq[(Column, String)]): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sparkContext.defaultParallelism, 1)
    val k = values.size
    val withV = values.zipWithIndex.foldLeft(df) { case (d, ((v, _), i)) =>
      // NULL contributes 0, matching sum() OVER's null-skipping semantics
      d.withColumn(s"__psv$i", coalesce(v.cast("bigint"), lit(0L)))
    }
    val parted = withV
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
    val vIdx = (0 until k).map(i => parted.schema.fieldIndex(s"__psv$i"))
    val schema = (0 until k).foldLeft(parted.schema) { (sc, i) =>
      sc.add(s"__lc$i", LongType, nullable = false)
    }
    // Pass 1: per-partition running sums. A deliberate mapPartitions — the
    // running accumulators are exactly the per-partition imperative shape
    // the API exists for, and it keeps the pass single-scan with zero
    // state beyond k Longs.
    val local = parted.mapPartitions { rows =>
      val acc = new Array[Long](k)
      rows.map { r =>
        var i = 0
        while (i < k) { acc(i) += r.getLong(vIdx(i)); i += 1 }
        Row.fromSeq(r.toSeq ++ acc)
      }
    }(Encoders.row(schema))
      // Lazy persist, NOT localCheckpoint: checkpoint (even eager=false)
      // finalizes the AQE plan and runs every upstream stage at BUILD time.
      // persist defers to the first action, then both consumers (offsets
      // aggregate + final join) share ONE materialization — which also
      // pins the range boundaries and __pid assignment they must agree on.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Pass 2: one row per partition; the unpartitioned window below runs
    // over ≤ #partitions rows (cluster-bounded, never data-bounded).
    val wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    // Partition totals are sum(value), NOT max(running sum): the two only
    // coincide for non-negative inputs, and the contract allows negatives
    // (net change, refunds).
    val offsets = local.groupBy(col("__pid"))
      .agg(sum(col("__psv0")).as("__pt0"),
           (1 until k).map(i => sum(col(s"__psv$i")).as(s"__pt$i")): _*)
      .select(col("__pid") +:
        (0 until k).map(i =>
          coalesce(sum(col(s"__pt$i")).over(wo), lit(0L)).as(s"__off$i")): _*)
    val joined = local.join(broadcast(offsets), "__pid")
    val withOut = values.zipWithIndex.foldLeft(joined) {
      case (d, ((_, out), i)) =>
        d.withColumn(out, col(s"__lc$i") + col(s"__off$i"))
    }
    val helper = Seq("__pid") ++
      (0 until k).flatMap(i => Seq(s"__psv$i", s"__lc$i", s"__off$i"))
    withOut.drop(helper: _*)
  }
}
