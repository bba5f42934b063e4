package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 seventeenth wave: dynamic partition overwrite (the lakehouse
  * partial-refresh primitive), growth accounting, and binary-column
  * scalar work.
  */
object Round10q {

  val decls: Map[String, Decl] = Map(
    // Dynamic partition overwrite: refresh ONE partition of a
    // status-partitioned table in place (the nightly partial reload) —
    // partitions not present in the incoming batch survive untouched.
    // The oracle reproduces the final state relationally: non-F rows as
    // written, F rows re-derived. Dynamic mode only changes overwrites
    // of EXISTING partitioned dirs, and every other sink key writes a
    // fresh scratch dir, so setting it session-wide is safe.
    "sink_dynamic_partition_overwrite" -> Decl(
      (s, d) => {
        val out = Tables.scratchDir("graft_dynpo").resolve("orders_ps").toString
        val base = Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
                  round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        base.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        base.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderstatus"),
                  (col("cents") * 2).as("cents"))
          .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
        Tables.canon(
          s.read.parquet(out).select("o_orderkey", "o_orderstatus", "cents"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |       CAST(CASE WHEN o_orderstatus = 'F'
             |                 THEN CAST(round(o_totalprice * 100) AS BIGINT) * 2
             |                 ELSE CAST(round(o_totalprice * 100) AS BIGINT) END
             |            AS BIGINT) AS cents
             |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin)),

    // Growth accounting: per week, active users split into new (first
    // week ever) vs returning — the canonical product growth table. One
    // per-user first-week aggregate broadcast back onto the weekly
    // activity grid.
    "ts_new_vs_returning" -> Decl(
      (s, d) => {
        val act = Tables.events(s, d)
          .select(col("user_id"),
                  expr("unix_micros(ts) div 604800000000L").as("wk"))
          .distinct()
        val first = act.groupBy("user_id").agg(min(col("wk")).as("first_wk"))
        act.join(broadcast(first), "user_id")
          .groupBy("wk")
          .agg(count(lit(1)).as("n_active"),
               sum(when(col("wk") === col("first_wk"), 1L).otherwise(0L)).as("n_new"))
          .select(col("wk"), col("n_active"), col("n_new"),
                  (col("n_active") - col("n_new")).as("n_returning"))
          .orderBy("wk")
      },
      Some("""WITH act AS (SELECT DISTINCT user_id,
             |               CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
             |             FROM events),
             |f AS (SELECT user_id, min(wk) AS first_wk FROM act GROUP BY user_id)
             |SELECT wk, CAST(count(*) AS BIGINT) AS n_active,
             |       CAST(sum(CASE WHEN wk = first_wk THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_new,
             |       CAST(count(*) - sum(CASE WHEN wk = first_wk THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_returning
             |FROM act JOIN f USING (user_id)
             |GROUP BY wk ORDER BY wk""".stripMargin)),

    // Binary-column scalar work: a 16-byte digest blob per document,
    // sliced to its 4-byte prefix (the shard key pattern for content-
    // addressed stores), byte length audited — binary substring/hex/
    // length riding the scan. The oracle mirrors at the hex-string level
    // (hex(substring(blob, 1, 4)) ≡ first 8 hex chars).
    "scalar_binary_ops" -> Decl(
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
          .select(col("doc_id"),
                  hex(substring(unhex(col("h")), 1, 4)).as("prefix_hex"),
                  length(unhex(col("h"))).cast("bigint").as("n_bytes"),
                  (pmod(conv(substring(col("h"), 1, 8), 16, 10).cast("bigint"),
                        lit(64L))).as("shard"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (SELECT doc_id, md5(text) AS h FROM documents)
             |SELECT doc_id, upper(substr(h, 1, 8)) AS prefix_hex,
             |       CAST(octet_length(unhex(h)) AS BIGINT) AS n_bytes,
             |       CAST(CAST(('0x' || substr(h, 1, 8))::BIGINT AS BIGINT) % 64
             |            AS BIGINT) AS shard
             |FROM h ORDER BY doc_id""".stripMargin))
  )
}
