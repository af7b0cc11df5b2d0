package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
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

  test("replayRollup flushes every window and equals the batch rollup") {
    import spark.implicits._
    val ldt = (h: Int, m: Int) => java.time.LocalDateTime.of(2024, 1, 1, h, m)
    val events = Seq(
      (ldt(0, 10), "click", 1.5), (ldt(0, 40), "click", 2.0),
      (ldt(0, 50), "view", 3.0), (ldt(1, 5), "click", 4.0),
      (ldt(2, 30), "view", 0.5), (ldt(2, 45), "view", 1.0))
      .toDF("ts", "event_type", "value")
    val streamed = StreamingAnalytics.replayRollup(events, batches = 2)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("window_start"),
        r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value"))).toSet
    // the LAST window must be present too — only the flush sentinels make
    // append mode emit it
    assert(streamed === Set(
      (ldt(0, 0), "click", 2L, 3.5), (ldt(0, 0), "view", 1L, 3.0),
      (ldt(1, 0), "click", 1L, 4.0), (ldt(2, 0), "view", 2L, 1.5)))
  }

  test("replaySessions: session windows merge at the exact-gap boundary like batch") {
    import spark.implicits._
    val ldt = (h: Int, m: Int) => java.time.LocalDateTime.of(2024, 1, 1, h, m)
    // user 1: 0:00 then 0:30 — EXACTLY the 30-min gap; session_window's
    // touching-windows-merge must agree with the batch rule (ts > prev+gap
    // splits, equality merges). 1:30 is a genuine split. user 2 isolates.
    val events = Seq(
      (ldt(0, 0), 1L, 1.0), (ldt(0, 30), 1L, 2.0), (ldt(1, 30), 1L, 4.0),
      (ldt(0, 5), 2L, 8.0))
      .toDF("ts", "user_id", "value")
    val got = StreamingAnalytics.replaySessions(events, batches = 2).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.time.LocalDateTime]("session_start"),
        r.getAs[java.time.LocalDateTime]("session_end"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
    assert(got === Set(
      (1L, ldt(0, 0), ldt(1, 0), 2L, 3.0), // exact-gap event merged; end = last + gap
      (1L, ldt(1, 30), ldt(2, 0), 1L, 4.0),
      (2L, ldt(0, 5), ldt(0, 35), 1L, 8.0)))
  }

  test("rollup and sessions replay the same staged chunk set") {
    import spark.implicits._
    val ldt = (h: Int, m: Int) => java.time.LocalDateTime.of(2024, 1, 1, h, m)
    // full event schema → both gates derive the IDENTICAL replay source and
    // the second gate must reuse the first's staged chunks
    val events = Seq(
      (ldt(0, 10), "click", 1L, 1.5), (ldt(0, 40), "view", 1L, 2.0),
      (ldt(1, 30), "click", 2L, 4.0))
      .toDF("ts", "event_type", "user_id", "value")
    val before = StreamingAnalytics.stagedChunkSets
    val rollup = StreamingAnalytics.replayRollup(events, batches = 2).collect()
    val afterRollup = StreamingAnalytics.stagedChunkSets
    val sessions = StreamingAnalytics.replaySessions(events, batches = 2).collect()
    assert(StreamingAnalytics.stagedChunkSets === afterRollup,
      "sessions gate staged a second chunk set instead of reusing the rollup's")
    assert(afterRollup === before + 1)
    // and both gates still produce their own correct results off it
    assert(rollup.map(r => (r.getAs[java.time.LocalDateTime]("window_start"),
      r.getAs[String]("event_type"), r.getAs[Long]("n_events"))).toSet
      === Set((ldt(0, 0), "click", 1L), (ldt(0, 0), "view", 1L), (ldt(1, 0), "click", 1L)))
    assert(sessions.map(_.getAs[Long]("user_id")).toSet === Set(1L, 2L))
  }

  test("replayStreamJoin: view state survives chunks; horizon bounds the match") {
    import spark.implicits._
    val ldt = (h: Int, m: Int) => java.time.LocalDateTime.of(2024, 1, 1, h, m)
    // user 1: one view, purchases at +20 min (same chunk), +55 min (a LATER
    // chunk — the state-survival case), +70 min (outside the 1 h horizon);
    // user 2: purchase with no prior view
    val events = Seq(
      (ldt(0, 10), "view", 1L, 0.0),
      (ldt(0, 30), "purchase", 1L, 5.0),
      (ldt(1, 5), "purchase", 1L, 6.0),
      (ldt(1, 20), "purchase", 1L, 7.0),
      (ldt(0, 45), "purchase", 2L, 8.0))
      .toDF("ts", "event_type", "user_id", "value")
    val got = StreamingAnalytics.replayStreamJoin(events, batches = 3).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.time.LocalDateTime]("purchase_ts"),
        r.getAs[Long]("delay_s")))
    assert(got.toSeq === Seq(
      (1L, ldt(0, 30), 1200L),
      (1L, ldt(1, 5), 3300L)))
  }

  test("replayDedup emits exactly one survivor per content hash") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"), (4L, "gamma"),
      (5L, "beta"), (6L, "alpha")).toDF("doc_id", "text")
    val out = StreamingAnalytics.replayDedup(docs, batches = 3).collect()
    assert(out.length === 3) // alpha, beta, gamma
    assert(out.forall(_.getAs[Long]("n_passed") === 1L))
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

  test("threshold alerts fire once, at the crossing row, across batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingAnalytics.CentsEvent

    val input = MemoryStream[(Timestamp, String, Long, Long)]
    val typed = input.toDF().toDF("ts", "event_type", "user_id", "cents")
      .selectExpr("CAST(ts AS TIMESTAMP_NTZ) AS ts", "event_type", "user_id", "cents")
      .as[CentsEvent]
    val query = graft.streaming.StreamingAnalytics.thresholdAlerts(typed, 100L,
        horizon = java.time.Duration.ofDays(3650))
      .toDF().writeStream.format("memory").queryName("alerts")
      .outputMode("append").start()
    try {
      // user 1 reaches 100 only with the second batch's event; user 2 never
      input.addData((ts(0, 0), "a", 1L, 60L), (ts(0, 5), "a", 2L, 50L))
      query.processAllAvailable()
      assert(spark.table("alerts").count() === 0)
      input.addData((ts(0, 10), "a", 1L, 40L), (ts(0, 15), "a", 1L, 999L))
      query.processAllAvailable()
      val out = spark.table("alerts").collect()
      assert(out.length === 1, "exactly one alert despite two over-threshold rows")
      assert(out.head.getAs[Long]("user_id") === 1L)
      assert(out.head.getAs[Long]("cum_cents") === 100L, "fires AT the crossing row")
    } finally query.stop()
  }

  test("replayCmsTopk: streamed counters equal the batch sketch; overestimate is one-sided") {
    import spark.implicits._
    val ldt = (h: Int, m: Int) => java.time.LocalDateTime.of(2024, 1, 1, h, m)
    val events = Seq(
      (ldt(0, 10), "click", 1L, 1.0), (ldt(0, 40), "click", 2L, 1.0),
      (ldt(0, 50), "view", 3L, 1.0), (ldt(1, 5), "click", 4L, 1.0),
      (ldt(1, 30), "view", 5L, 1.0), (ldt(1, 45), "view", 6L, 1.0))
      .toDF("ts", "event_type", "user_id", "value")
    val r = StreamingAnalytics.replayCmsTopk(events, batches = 2).collect()
    val byKey = r.map(x => (x.getAs[java.time.LocalDateTime]("window_start"),
      x.getAs[String]("event_type")) ->
      (x.getAs[Long]("occurrences"), x.getAs[Long]("cms_estimate"),
        x.getAs[Long]("overestimate"))).toMap
    assert(byKey.keySet === Set((ldt(0, 0), "click"), (ldt(0, 0), "view"),
      (ldt(1, 0), "click"), (ldt(1, 0), "view")))
    assert(byKey((ldt(0, 0), "click"))._1 === 2L)
    assert(byKey((ldt(1, 0), "view"))._1 === 2L)
    // CMS can only over-count, and with 2 types in 64 buckets it's exact here
    assert(r.forall(_.getAs[Long]("overestimate") >= 0L))
    assert(r.forall(x => x.getAs[Long]("cms_estimate") === x.getAs[Long]("occurrences")))
  }

  test("replayHdrSliding: streamed registers equal the batch sliding sketch bit-for-bit") {
    import spark.implicits._
    // 4 days, values spanning unit buckets, octave buckets, zeros (the
    // reserved −1 bucket) and nulls (excluded on both paths); multiple
    // chunks so registers really merge across micro-batches
    val rnd = new scala.util.Random(7)
    val events = (0 until 400).map { i =>
      val day = i % 4
      val v: java.lang.Double =
        if (i % 37 == 0) null
        else if (i % 11 == 0) 0.0
        else rnd.nextInt(5000) / 100.0 + day
      (java.time.LocalDateTime.of(2024, 3, 1 + day, i % 24, i % 60),
        "e" + (i % 3), i.toLong % 7, v)
    }.toDF("ts", "event_type", "user_id", "value")
    val streamed = StreamingAnalytics.replayHdrSliding(events, batches = 3)
      .collect().map(_.toSeq)
    val batch = graft.operators.Sketches.hdrSlidingQuantiles(events)
      .collect().map(_.toSeq)
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("windowedHdrRegisters: state is O(grid buckets) per day, not O(events)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // one day of high-volume wide-range traffic, then a next-day flush row:
    // emitted register rows for the day must stay under the grid bound
    // (octaves × 2^s sub-buckets + the exact unit buckets + the reserved
    // −1 bucket) no matter how many events flowed through
    val input = MemoryStream[(Timestamp, Double)]
    val query = StreamingAnalytics.windowedHdrRegisters(
        input.toDF().toDF("ts", "value"), windowLength = "1 day",
        lateness = "30 minutes")
      .writeStream.format("memory").queryName("hdr_regs")
      .outputMode("append").start()
    try {
      val rnd = new scala.util.Random(11)
      val day = (m: Int) => Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
      val n = 20000
      input.addData((0 until n).map(i =>
        (day(i % 1440), math.abs(rnd.nextLong() % 100000000L) / 100.0)))
      query.processAllAvailable()
      input.addData(Seq((Timestamp.valueOf("2024-01-03 01:00:00"), 1.0)))
      query.processAllAvailable()
      input.addData(Seq((Timestamp.valueOf("2024-01-03 02:00:00"), 1.0)))
      query.processAllAvailable()
      val regs = spark.table("hdr_regs")
        .filter(col("window_start") === Timestamp.valueOf("2024-01-01 00:00:00"))
        .collect()
      val s = 5
      val gridBound = (1 << (s + 1)) + (63 - s) * (1 << s) + 1
      assert(regs.nonEmpty)
      assert(regs.length <= gridBound,
        s"${regs.length} register rows for one day exceeds grid bound $gridBound")
      // and they really summarize all n events
      assert(regs.map(_.getAs[Long]("cnt")).sum === n.toLong)
    } finally query.stop()
  }

  test("dsirResample: deterministic Gumbel-top-k, keys descending, rank dense") {
    import graft.functions.TextOps
    import spark.implicits._
    val docs = (1L to 30L)
      .map(i => (i, if (i % 3 == 0) "alpha beta" else "gamma delta", if (i % 3 == 0) "en" else "zz"))
      .toDF("doc_id", "text", "lang")
    val a = TextOps.dsirResample(docs, k = 10).collect()
    val b = TextOps.dsirResample(docs, k = 10).collect()
    assert(a.length === 10)
    assert(a.map(_.getAs[Long]("sample_rank")).toSeq === (1L to 10L))
    val keys = a.map(_.getAs[Long]("gkey_nano"))
    assert(keys.zip(keys.tail).forall { case (x, y) => x >= y }, "keys must descend")
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "no rand(): identical draws")
    // target-language docs carry strictly higher log-weights; with 10 of 30
    // slots the en docs (10 of them) should dominate the sample
    val enIds = a.map(_.getAs[Long]("doc_id")).count(_ % 3 == 0)
    assert(enIds >= 7, s"importance resampling must favor target-like docs, got $enIds/10")
  }

  test("replayHeavyHitters: exact report under heavy truncation, any chunking") {
    import spark.implicits._
    val ldt = (h: Int, m: Int) => java.time.LocalDateTime.of(2024, 1, 1, h, m)
    // one whale (200 rows) + 400 thin users (2 rows each): distinct keys
    // (401) dwarf the k=4-per-shard counters, so the MG decrement loop
    // fires constantly — the whale must still be the exact, only report
    // 201 whale rows, not 200: freq·(k+1) > n is STRICT, and 200·5 = 1000
    // sits exactly on the n = 1000 boundary (verified: the gate and oracle
    // agree the boundary case is out)
    val rows =
      (0 until 201).map(i => (ldt(i / 60, i % 60), 1L, 1.0)) ++
      (2L to 401L).flatMap(u => Seq(
        (ldt((u % 4).toInt, (u % 60).toInt), u, 1.0),
        (ldt(4 + (u % 3).toInt, (u % 60).toInt), u, 1.0)))
    val events = rows.toDF("ts", "user_id", "value")
    val n = rows.size.toLong // 1001
    for (batches <- Seq(2, 5)) {
      val got = StreamingAnalytics
        .replayHeavyHitters(events, batches = batches, k = 4, nShards = 2)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("occurrences"),
          r.getAs[Long]("share_ppm")))
      // 201 * 5 > 1001; 2 * 5 < 1001 — exactly the whale survives, with
      // its exact count: the MG candidate pass may not lose it no matter
      // how the replay chunks the stream
      assert(got.toSeq === Seq((1L, 201L, 201L * 1000000L / n)),
        s"batches=$batches: wrong report ${got.toSeq} (n=$n)")
    }
  }

  test("a negative-id heavy hitter is data, not a sentinel — it must surface") {
    // round-12 advice: sign-only sentinel routing sent every negative-id
    // row to the drained flush shard, silently excluding a negative-id
    // whale from the MG candidate pass. Sentinels are now matched by
    // their explicit (__flush__, −1) marker, so this whale must report.
    import spark.implicits._
    val ldt = (h: Int, m: Int) => java.time.LocalDateTime.of(2024, 1, 1, h, m)
    val rows =
      (0 until 120).map(i => (ldt(i / 60, i % 60), -5L, 1.0)) ++
      (2L to 101L).flatMap(u => Seq(
        (ldt((u % 4).toInt, (u % 60).toInt), u, 1.0),
        (ldt(4 + (u % 3).toInt, (u % 60).toInt), u, 1.0)))
    val events = rows.toDF("ts", "user_id", "value")
    val n = rows.size.toLong // 320
    val got = StreamingAnalytics
      .replayHeavyHitters(events, batches = 3, k = 4, nShards = 2)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("occurrences")))
    assert(got.toSeq === Seq((-5L, 120L)),
      s"negative-id whale missing or wrong: ${got.toSeq} (n=$n)")
  }
}
