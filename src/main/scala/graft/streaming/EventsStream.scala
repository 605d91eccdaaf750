package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the F-group operators.
  *
  * Each takes an unbounded DataFrame with schema
  * (event_id: long, user_id: long, event_type: string, ts: long  // ns
  *  value: double) — the same shape `Tables.events` yields — converts the
  * nanosecond epoch to an event-time timestamp, and applies a watermark so
  * state is bounded: window/session state is dropped once the watermark
  * passes, which is what lets these run indefinitely on a 1000-executor
  * cluster. Exercised in StreamingSpec with MemoryStream; the batch
  * equivalents in [[Events]] are what the DuckDB oracle verifies.
  */
object EventsStream {

  /** Nanosecond epoch → TimestampType (microsecond precision, ample for
    * windowing; the exact-integer batch forms keep the raw ns).
    */
  private def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros((col("ts") / 1000L).cast("long")))

  /** Streaming e1: tumbling 1-hour counts/sums per event type. */
  def tumblingAggStream(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(floor(col("value") * 1000).cast("long")).as("sum_value_milli"))
      .select(
        unix_timestamp(col("window.start")).as("hour_ts"),
        col("event_type"), col("cnt"), col("sum_value_milli"))

  /** Streaming e2: 30-min-gap session windows per user — the built-in
    * session_window keeps one merging state per open session and emits on
    * watermark close.
    */
  def sessionizeStream(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "2 hours")
      .groupBy(session_window(col("event_time"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming e3: first event per (user, type) — dropDuplicates with the
    * watermark bounding the dedup state.
    */
  def dedupStream(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "2 hours")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"))
}
