package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation for streams: tumbling windows with a
  * watermark bounding state and late data (the standard
  * readStream → watermark → window → agg shape).
  *
  * State per (window, event_type) is one aggregate row; the watermark lets
  * Spark drop windows older than `lateness`, so state is bounded by
  * (watermark horizon / window size) × type cardinality regardless of
  * stream length.
  */
object StreamingAnalytics {

  /** Tumbling-window counts/sums per event type over a streaming frame with
    * columns (ts: timestamp, event_type, value). Append mode emits each
    * window once it is closed by the watermark. */
  def windowedRollup(events: DataFrame, windowLength: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming exact deduplication — the ingest-time twin of
    * [[graft.operators.Dedup.exact]]: first arrival of each content hash
    * passes through, replays and duplicates within the watermark horizon
    * are dropped, and `dropDuplicatesWithinWatermark` evicts per-hash state
    * once the watermark passes it — state is bounded by the horizon's
    * distinct-content volume, not the stream's lifetime (the property that
    * makes dedup viable on an unbounded crawl feed).
    *
    * Input: a streaming frame with (ts: timestamp, doc_id, text). */
  def streamingDedup(docs: DataFrame, lateness: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("content_hash")
}
