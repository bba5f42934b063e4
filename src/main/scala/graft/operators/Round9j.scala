package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-9 tenth wave: recursive-CTE transitive closure, the interval
  * date-arithmetic family, and strided audio-style windowing over opaque
  * binary payloads (completing the multimodal plumbing quartet).
  */
object Round9j {

  val decls: Map[String, Decl] = Map(
    // Recursive transitive closure — hierarchy walking (category trees,
    // org charts, BOM rollups) through Spark 4's WITH RECURSIVE. The
    // hierarchy is the deterministic binary-lift chain anc ← anc div 2
    // over part keys (every node's ancestor path toward 1), capped at 5
    // hops because Spark runs ONE JOB PER RECURSION STEP — the
    // recursion-granularity lesson from recursive_cte_spine: bounded
    // depth is a query constant, and per-hop work is one scan of the
    // previous frontier. Output: the per-hop census of the closure.
    "recursive_cte_closure" -> Decl(
      (s, d) => {
        Tables.views(s, d)
        s.sql("""WITH RECURSIVE a(node, anc, hop) AS (
                |  SELECT p_partkey, CAST(p_partkey AS BIGINT), 0 FROM part
                |  UNION ALL
                |  SELECT node, anc div 2, hop + 1 FROM a
                |  WHERE anc > 1 AND hop < 5
                |)
                |SELECT hop, count(*) AS n, sum(anc) AS anc_sum
                |FROM a GROUP BY hop ORDER BY hop""".stripMargin)
      },
      Some("""WITH RECURSIVE a(node, anc, hop) AS (
             |  SELECT p_partkey, CAST(p_partkey AS BIGINT), 0 FROM part
             |  UNION ALL
             |  SELECT node, anc // 2, hop + 1 FROM a
             |  WHERE anc > 1 AND hop < 5
             |)
             |SELECT CAST(hop AS INT) AS hop, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(anc) AS BIGINT) AS anc_sum
             |FROM a GROUP BY hop ORDER BY hop""".stripMargin)),

    // Interval / calendar arithmetic family — the date-math surface every
    // reporting layer leans on: +3 months (end-of-month clamped the same
    // way by both engines), +45 days, last day of month, and integer year
    // distance from a fixed epoch. All outputs are DATEs or BIGINTs (R4:
    // never a raw date_trunc TIMESTAMP).
    "scalar_interval_arith" -> Decl(
      (s, d) => {
        Tables(s, d, "orders")
          .select(col("o_orderkey"),
                  col("o_orderdate").cast("date").as("d"))
          .select(col("o_orderkey"),
                  add_months(col("d"), 3).as("plus_3mo"),
                  date_add(col("d"), 45).as("plus_45d"),
                  last_day(col("d")).as("month_end"),
                  (year(col("d")) - lit(1995)).cast("bigint").as("years_since_95"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
             |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY AS DATE) AS plus_45d,
             |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |  CAST(year(o_orderdate) - 1995 AS BIGINT) AS years_since_95
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Strided overlapping windows over an opaque "audio" payload — the
    // fourth member of the multimodal plumbing family (meta / frames /
    // resize / windows): 128-byte windows at stride 64 (50% overlap, the
    // STFT batch shape), per-window byte count and integer "energy" (sum
    // of unsigned bytes — the deterministic stub standing in for a real
    // DSP kernel; media libs aren't in this container). Typed-Dataset
    // mapPartitions does the row expansion exactly where a real decoder
    // would batch; ASCII payloads make the SQL oracle expressible.
    "multimodal_audio_window_stub" -> Decl(
      (s, d) => {
        val sp = s; import sp.implicits._
        Tables(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.flatMap { case (id, payload) =>
              val starts = Iterator.from(0, 64).takeWhile(_ < payload.length)
              starts.zipWithIndex.map { case (st, w) =>
                val end = math.min(st + 128, payload.length)
                var energy = 0L
                var i = st
                while (i < end) { energy += payload(i) & 0xFF; i += 1 }
                (id, w.toLong, (end - st).toLong, energy)
              }
            }
          }
          .toDF("doc_id", "win_id", "win_bytes", "energy")
          .orderBy("doc_id", "win_id")
      },
      Some("""SELECT doc_id, CAST(w AS BIGINT) AS win_id,
             |  CAST(least(128, n_chars - w * 64) AS BIGINT) AS win_bytes,
             |  CAST(list_sum(list_transform(
             |    range(CAST(w * 64 + 1 AS INT),
             |          CAST(least(w * 64 + 128, n_chars) + 1 AS INT)),
             |    j -> ascii(substr(text, j, 1)))) AS BIGINT) AS energy
             |FROM documents,
             |     unnest(generate_series(0,
             |       CAST(ceil(n_chars / 64.0) AS INT) - 1)) t(w)
             |WHERE w * 64 < n_chars
             |ORDER BY doc_id, win_id""".stripMargin))
  )
}
