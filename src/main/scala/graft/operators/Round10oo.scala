package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 45: the Write–Audit–Publish (WAP) pattern — the
  * lakehouse ingestion discipline where a batch lands in a STAGING
  * location, constraint audits run against the staged files (not the
  * in-memory frame — the audit must see exactly what a reader would),
  * violating rows are quarantined, and only the clean subset is
  * atomically published by manifest (the sink_snapshot_time_travel
  * mechanism: publishing is a metadata write, data files never
  * rewrite).
  *
  * The minted batch plants two violation classes on deterministic key
  * rules (negated totalprice on orderkey ≡ 0 mod 97, null priority on
  * orderkey ≡ 1 mod 101), so the audit's work is verifiable: the
  * oracle recomputes the quarantine/publish split from the base table
  * with the same rules — equality proves the staged-file audit saw
  * every row and classified each exactly once.
  *
  * Scale shape: audit predicates are one pass over the staged scan
  * (each constraint a conditional aggregate — no per-constraint
  * re-scan); publish moves KB of manifest, not data.
  */
object Round10oo {

  val decls: Map[String, Decl] = Map(
    "sink_write_audit_publish" -> Decl(
      (s, d) => {
        import java.nio.file.Files
        val dir = Tables.scratchDir("graft_wap")
        // the incoming batch, with planted violations
        val batch = Tables(s, d, "orders")
          .select(col("o_orderkey"),
            when(pmod(col("o_orderkey"), lit(97L)) === 0,
                 -col("o_totalprice")).otherwise(col("o_totalprice"))
              .as("o_totalprice"),
            when(pmod(col("o_orderkey"), lit(101L)) === 1, lit(null))
              .otherwise(col("o_orderpriority")).as("o_orderpriority"))
        // WRITE: stage the batch
        val staging = dir.resolve("staging")
        batch.write.mode("overwrite").parquet(staging.toString)
        // AUDIT: constraints evaluated against the staged FILES
        val staged = s.read.parquet(staging.toString)
        val audited = staged.withColumn("violation",
          when(col("o_totalprice") <= 0, lit("nonpositive_price"))
            .when(col("o_orderpriority").isNull, lit("null_priority"))
            .otherwise(lit(null)))
        val clean = audited.filter(col("violation").isNull)
          .drop("violation")
        val quarantine = dir.resolve("quarantine")
        audited.filter(col("violation").isNotNull)
          .write.mode("overwrite").parquet(quarantine.toString)
        // PUBLISH: clean data files + a manifest naming them (atomic —
        // readers resolve the manifest, which appears only after audit)
        val published = dir.resolve("published")
        clean.write.mode("overwrite").parquet(published.toString)
        Files.writeString(dir.resolve("current.manifest"), published.toString)
        // report from the PUBLISHED/QUARANTINED files, not the frames
        val pubDf = s.read.parquet(
          Files.readString(dir.resolve("current.manifest")))
        val qDf = s.read.parquet(quarantine.toString)
        val pub = pubDf.agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
          .select(lit("published").as("stage"), col("n"), col("cents"))
        val quar = qDf.groupBy(col("violation").as("stage"))
          .agg(count(lit(1)).as("n"),
               sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
        pub.unionAll(quar).orderBy("stage")
      },
      Some("""WITH batch AS (
             |  SELECT o_orderkey,
             |         CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice
             |              ELSE o_totalprice END AS price,
             |         CASE WHEN o_orderkey % 101 = 1 THEN NULL
             |              ELSE o_orderpriority END AS prio
             |  FROM orders),
             |tagged AS (
             |  SELECT *, CASE WHEN price <= 0 THEN 'nonpositive_price'
             |                 WHEN prio IS NULL THEN 'null_priority'
             |            END AS violation
             |  FROM batch)
             |SELECT 'published' AS stage, count(*) AS n,
             |       CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM tagged WHERE violation IS NULL
             |UNION ALL
             |SELECT violation AS stage, count(*) AS n,
             |       CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM tagged WHERE violation IS NOT NULL GROUP BY violation
             |ORDER BY stage""".stripMargin))
  )
}
