package graft.operators

import graft.{Decl, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 fifteenth wave: bounce rate over sessionization, cumulative
  * distinct (novelty curves), and the dataset-card summary report.
  */
object Round9o {

  val decls: Map[String, Decl] = Map(
    // Bounce rate — single-event sessions over total sessions, the
    // product-analytics KPI built on the gaps-and-islands sessionizer
    // (window_sessionize_batch's machinery): sessions form where the
    // per-user gap exceeds 10 minutes, a session's size is one bounded
    // groupBy, and the per-type rate ships as integer ppm (R14). One
    // user-partitioned window + two aggregates; nothing corpus-wide.
    "agg_bounce_rate" -> Decl(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val sessions = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  unix_micros(col("ts")).as("us"))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn("new_s",
            when(col("prev_us").isNull ||
                 col("us") - col("prev_us") > 600000000L, 1L).otherwise(0L))
          .withColumn("sid", sum(col("new_s")).over(
            Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sid")
          .agg(count(lit(1)).as("n_events"),
               min(col("event_type")).as("first_type"))
        sessions.groupBy("first_type")
          .agg(count(lit(1)).as("n_sessions"),
               sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
          .select(col("first_type"), col("n_sessions"), col("n_bounces"),
                  expr("(n_bounces * 2000000L + n_sessions) div (2 * n_sessions)")
                    .as("bounce_ppm"))
          .orderBy("first_type")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |             epoch_us(ts) AS us,
             |             lag(epoch_us(ts)) OVER
             |               (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
             |               AS prev_us
             |           FROM events),
             |f AS (SELECT user_id, event_id, event_type, us,
             |        CASE WHEN prev_us IS NULL OR us - prev_us > 600000000
             |             THEN 1 ELSE 0 END AS new_s
             |      FROM e),
             |g AS (SELECT user_id, event_type,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                         ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM f),
             |sess AS (SELECT user_id, sid, count(*) AS n_events,
             |           min(event_type) AS first_type
             |         FROM g GROUP BY 1, 2)
             |SELECT first_type, CAST(count(*) AS BIGINT) AS n_sessions,
             |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_bounces,
             |       CAST((sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 2000000
             |             + count(*)) // (2 * count(*)) AS BIGINT) AS bounce_ppm
             |FROM sess GROUP BY first_type ORDER BY first_type""".stripMargin)),

    // Cumulative distinct — the novelty curve: per user in event order,
    // how many DISTINCT event types seen so far. The rolling-distinct
    // trick: flag each (user, type)'s FIRST occurrence with one
    // row_number, then a running sum of flags — two windows over the
    // same high-cardinality user partitioning, never a collect_set
    // buffer. Emitted at each event (the curve), totals bounded by the
    // type alphabet.
    "window_cumulative_distinct" -> Decl(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
                  unix_micros(col("ts")).as("us"))
        val firstW = Window.partitionBy("user_id", "event_type")
          .orderBy(col("us"), col("event_id"))
        val cumW = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("is_first",
            when(row_number().over(firstW) === 1, 1L).otherwise(0L))
          .select(col("user_id"), col("event_id"),
                  sum(col("is_first")).over(cumW).as("n_types_seen"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |             epoch_us(ts) AS us FROM events),
             |f AS (SELECT user_id, event_id, us,
             |        CASE WHEN row_number() OVER
             |               (PARTITION BY user_id, event_type ORDER BY us, event_id)
             |             = 1 THEN 1 ELSE 0 END AS is_first
             |      FROM e)
             |SELECT user_id, event_id,
             |       CAST(sum(is_first) OVER (PARTITION BY user_id
             |         ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |         AS n_types_seen
             |FROM f ORDER BY user_id, event_id""".stripMargin)),

    // Dataset card — the corpus-release summary every training-data
    // pipeline publishes: doc and language counts, token and byte
    // volume, exact-duplicate docs, and the short-doc fraction, stacked
    // long as (metric, value) BIGINT rows. Each statistic is one
    // aggregate over the documents scan (dup detection reuses the
    // md5-of-normalized-text grouping); the report is metric-count rows
    // at any corpus size.
    "pipeline_dataset_card" -> Decl(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val base = docs.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("n_chars")).as("total_chars"),
          sum(size(expr("filter(split(text, ' '), w -> w <> '')")).cast("bigint"))
            .as("total_tokens"),
          sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("n_short"))
        val dups = docs
          .groupBy(md5(lower(trim(col("text")))).as("h"))
          .agg(count(lit(1)).as("k"))
          .agg(coalesce(sum(when(col("k") > 1, col("k"))), lit(0L))
            .as("n_dup_docs"))
        base.crossJoin(dups)
          .select(explode(array(
            struct(lit("n_docs").as("metric"), col("n_docs").as("value")),
            struct(lit("n_langs").as("metric"), col("n_langs").as("value")),
            struct(lit("n_sources").as("metric"), col("n_sources").as("value")),
            struct(lit("total_chars").as("metric"), col("total_chars").as("value")),
            struct(lit("total_tokens").as("metric"), col("total_tokens").as("value")),
            struct(lit("n_short_docs").as("metric"), col("n_short").as("value")),
            struct(lit("n_exact_dup_docs").as("metric"), col("n_dup_docs").as("value"))
          )).as("m"))
          .select(col("m.metric").as("metric"), col("m.value").as("value"))
          .orderBy("metric")
      },
      Some("""WITH base AS (
             |  SELECT count(*) AS n_docs,
             |    count(DISTINCT lang) AS n_langs,
             |    count(DISTINCT source) AS n_sources,
             |    sum(n_chars) AS total_chars,
             |    sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
             |      AS total_tokens,
             |    sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS n_short
             |  FROM documents),
             |dups AS (SELECT coalesce(sum(CASE WHEN k > 1 THEN k END), 0)
             |           AS n_dup_docs
             |         FROM (SELECT md5(lower(trim(text))) AS h, count(*) AS k
             |               FROM documents GROUP BY 1))
             |SELECT metric, CAST(value AS BIGINT) AS value FROM (
             |  SELECT 'n_docs' AS metric, n_docs AS value FROM base
             |  UNION ALL SELECT 'n_langs', n_langs FROM base
             |  UNION ALL SELECT 'n_sources', n_sources FROM base
             |  UNION ALL SELECT 'total_chars', total_chars FROM base
             |  UNION ALL SELECT 'total_tokens', total_tokens FROM base
             |  UNION ALL SELECT 'n_short_docs', n_short FROM base
             |  UNION ALL SELECT 'n_exact_dup_docs', n_dup_docs FROM dups)
             |ORDER BY metric""".stripMargin))
  )
}
