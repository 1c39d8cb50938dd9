package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2B Q38–Q39).
  *
  * These are plan builders over an unbounded input (MemoryStream in tests;
  * file/rate sources in production — Kafka is out of scope in this
  * zero-egress build). Semantics:
  *
  *  - [[hourlyCounts]]: event-time tumbling aggregate with a 10-minute
  *    watermark — rows later than (max event time − 10 min) are dropped and
  *    finalized windows are emitted exactly once (append mode).
  *  - [[dedupEvents]]: stateful streaming dedup on event_id bounded by the
  *    watermark, so state does not grow without bound (the 100 TB-stream
  *    requirement: state size is O(events within the watermark), not O(all
  *    events ever)).
  *
  * The batch duals (q35_tumbling / q38_late_data / q30_dedup_exact) are the
  * oracle-checked variants; these streaming plans are verified by golden
  * MemoryStream tests (StreamingSpec) asserting the late-drop and
  * exactly-once-per-key behavior the oracle cannot express.
  */
object Streams {

  /** Expected input schema: (event_id long, ts timestamp, value double). */
  def hourlyCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("n_events"),
        col("sum_value"))

  /** Watermark-bounded stateful dedup: first arrival per event_id wins. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
