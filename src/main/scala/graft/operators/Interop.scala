package graft.operators

import graft.{Decl, Tables}
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float8Vector}
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.12's interop cell — the Arrow-vectorized UDF path.
  *
  * A vectorized (pandas-style) UDF is, mechanically, "ship each partition
  * to the worker as Arrow record batches, compute over the columnar
  * buffers, ship batches back". This container has no Python runtime for
  * library code, so the worker here is in-JVM — but the batch plumbing is
  * the real thing: rows are batched into genuine Arrow value vectors
  * (`BigIntVector`/`Float8Vector` from the bundled arrow-vector, the same
  * memory format `mapInArrow`/`mapInPandas` workers receive), the
  * transform runs over those columnar buffers, and results stream back as
  * rows. Batch size 4096 mirrors
  * `spark.sql.execution.arrow.maxRecordsPerBatch`'s intent: bounded
  * per-batch memory regardless of partition size — the property that
  * keeps the exchange safe at 100 TB.
  *
  * Allocator lifecycle: one child allocator scope per batch, closed in a
  * finally — Arrow accounts off-heap buffers strictly, and a leaked
  * vector fails the allocator close loudly (better than an executor
  * OOM'ing silently at scale).
  */
object Interop {

  val decls: Map[String, Decl] = Map(
    // Price-tier classification computed inside Arrow batches: cents =
    // round(price·100) and tier = cents div 10000, vectorized over the
    // columnar buffers. The DuckDB oracle recomputes both relationally —
    // the hash-match proves the Arrow exchange is value-exact (no
    // row-order, null, or rounding drift through the batch boundary).
    "udf_arrow_vectorized" -> Decl(
      (s, d) => {
        val src = Tables(s, d, "part")
          .select(col("p_partkey"), col("p_retailprice"))
        val outSchema = StructType(Seq(
          StructField("p_partkey", LongType),
          StructField("cents", LongType),
          StructField("tier", LongType)))
        src.mapPartitions { rows =>
          rows.grouped(4096).flatMap { chunk =>
            val alloc = new RootAllocator(Long.MaxValue)
            val keyV = new BigIntVector("p_partkey", alloc)
            val priceV = new Float8Vector("p_retailprice", alloc)
            try {
              val n = chunk.size
              keyV.allocateNew(n); priceV.allocateNew(n)
              var i = 0
              chunk.foreach { r =>
                if (r.isNullAt(0)) keyV.setNull(i) else keyV.setSafe(i, r.getLong(0))
                if (r.isNullAt(1)) priceV.setNull(i)
                else priceV.setSafe(i, r.getDouble(1))
                i += 1
              }
              keyV.setValueCount(n); priceV.setValueCount(n)
              val out = new Array[Row](n)
              var j = 0
              while (j < n) {
                val k: java.lang.Long =
                  if (keyV.isNull(j)) null else java.lang.Long.valueOf(keyV.get(j))
                if (priceV.isNull(j)) out(j) = Row(k, null, null)
                else {
                  val cents = Math.round(priceV.get(j) * 100.0d)
                  out(j) = Row(k, cents, cents / 10000L)
                }
                j += 1
              }
              out.toSeq
            } finally { keyV.close(); priceV.close(); alloc.close() }
          }
        }(Encoders.row(outSchema))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |       CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
             |       CAST(round(p_retailprice * 100) AS BIGINT) // 10000 AS tier
             |FROM part ORDER BY p_partkey""".stripMargin))
  )
}
