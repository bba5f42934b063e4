package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY §2.9 — event-time transformations shared by the batch twins
  * (declared queries with DuckDB oracles) and the Structured Streaming
  * paths (StreamingSpec drives the same functions over `MemoryStream`
  * input; the unified Dataset API means one definition serves both).
  *
  * Scale: every grouping here keys on (window, type) or (user, session) —
  * streaming state is partitioned by key across executors and evicted by
  * watermark, so state size is bounded by active keys × window horizon,
  * not by stream length.
  */
object StreamOps {

  /** 1-hour tumbling windows per event_type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sv"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sv"))

  /** 1-hour windows sliding every 15 minutes (each event lands in 4). */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sv"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sv"))

  /** 1-hour sliding (15-min) distinct-user estimate per window — the
    * streaming cardinality shape: exact distinct needs unbounded per-key
    * state, the HLL++ sketch keeps it at a few KB per window and merges
    * associatively across partitions AND micro-batches (register-wise
    * max — order-independent, so stream == batch exactly).
    */
  def slidingDistinct(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(col("w.start").as("wstart"), col("approx_users"))

  /** Per-user session windows with a 10-minute gap. Spark's boundary
    * semantics (verified in StreamingSpec): the session absorbs events while
    * the gap to the previous event is <= 10 min; only a strictly greater gap
    * starts a new session.
    */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sv"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n"), col("sv"))

  /** CDC last-writer-wins fold (the cdc_apply_log semantics): per key,
    * keep the latest change on the (µs, event_id) total order; a final
    * 'error' op deletes the key from the snapshot. max/count state merges
    * associatively, so the streaming incremental fold is exact — a delete
    * arriving in a later micro-batch removes the key, a newer upsert
    * resurrects it, identically to the batch fold.
    */
  def cdcSnapshot(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
              expr("unix_micros(ts)").as("us"), col("event_id"),
              when(col("event_type") === "error", lit("D"))
                .otherwise(lit("U")).as("op"),
              round(col("value") * 100).cast("bigint").as("c"))
      .groupBy("user_id")
      .agg(max(struct(col("us"), col("event_id"), col("op"), col("c"))).as("last"),
           count(lit(1)).as("n_changes"))
      .filter(col("last.op") === "U")
      .select(col("user_id"), col("last.c").as("current_cents"),
              col("n_changes"))

  /** Hourly OHLC bars (the ts_resample_ohlc semantics as a streaming
    * aggregate): open/close are lexicographic struct-min/max over integer
    * microseconds + event_id — min/max aggregates merge associatively, so
    * the streaming incremental state is exact, and the tie-break is
    * deterministic across batch and stream. Everything stays BIGINT.
    */
  def ohlc(events: DataFrame): DataFrame = {
    val us = expr("unix_micros(ts)").cast("bigint")
    val c = round(col("value") * 100).cast("bigint")
    events
      .select(window(col("ts"), "1 hour").as("w"), us.as("us"),
              col("event_id"), c.as("c"))
      .groupBy("w")
      .agg(min(struct(col("us"), col("event_id"), col("c")))("c").as("open"),
           max(col("c")).as("high"), min(col("c")).as("low"),
           max(struct(col("us"), col("event_id"), col("c")))("c").as("close"),
           count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("open"), col("high"),
              col("low"), col("close"), col("n"))
  }
}
