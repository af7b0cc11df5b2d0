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
}
