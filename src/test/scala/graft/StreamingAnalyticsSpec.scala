package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAnalytics

/** Watermarked tumbling-window aggregation: windows close when the
  * watermark passes, late-but-within-lateness data still counts. */
class StreamingAnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("windows emit on watermark passage; in-lateness stragglers are counted") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Timestamp, String, Double)]
    val query = StreamingAnalytics.windowedRollup(
        input.toDF().toDF("ts", "event_type", "value"),
        windowLength = "1 hour", lateness = "30 minutes")
      .writeStream.format("memory").queryName("rollup")
      .outputMode("append").start()
    try {
      // hour-0 events plus one straggler within lateness
      input.addData((ts(0, 10), "click", 1.0), (ts(0, 50), "click", 2.0), (ts(1, 5), "view", 5.0))
      query.processAllAvailable()
      input.addData((ts(0, 55), "click", 4.0)) // late for hour 0 but inside 30 min lateness
      query.processAllAvailable()
      assert(spark.table("rollup").count() === 0) // nothing closed yet

      // advance event time past hour0.end + lateness → hour-0 window closes
      input.addData((ts(2, 0), "view", 1.0))
      query.processAllAvailable()
      val closed = spark.table("rollup").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value"))).toSet
      assert(closed === Set(("click", 3L, 7.0))) // straggler included
    } finally query.stop()
  }

  test("streaming dedup passes first arrivals and drops in-horizon duplicates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Timestamp, Long, String)]
    val query = graft.streaming.StreamingAnalytics.streamingDedup(
        input.toDF().toDF("ts", "doc_id", "text"), lateness = "1 hour")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData((ts(0, 0), 1L, "alpha"), (ts(0, 5), 2L, "beta"))
      query.processAllAvailable()
      input.addData((ts(0, 10), 3L, "alpha")) // duplicate content within horizon
      query.processAllAvailable()
      input.addData((ts(0, 20), 4L, "gamma"))
      query.processAllAvailable()
      val out = spark.table("dedup").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(out === Set(1L, 2L, 4L)) // doc 3 dropped as a content duplicate
    } finally query.stop()
  }
}
