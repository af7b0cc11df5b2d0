package graft

import java.time.LocalDateTime

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAnalytics
import graft.streaming.StreamingAnalytics.{Alert, CentsEvent}

/** Bounded alert state (round-12 verdict #3): thresholdAlerts' per-user
  * counter EXPIRES after an idle horizon (event-time timeout) and the
  * latch re-arms — one alert per idle-separated limit session. The hash
  * gate pins expiry-off batch equivalence; these tests pin the expiry
  * path itself: the state row actually leaves the store, and a
  * reappearing user starts a fresh session that may alert again.
  */
class AlertExpirySpec extends AnyFunSuite {
  import TestSpark._

  private def at(min: Int): LocalDateTime =
    LocalDateTime.of(2024, 3, 1, 0, 0).plusMinutes(min)

  test("idle users' counters expire (state bounded) and the latch re-arms") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[CentsEvent]
    val query = StreamingAnalytics
      .thresholdAlerts(input.toDS(), thresholdCents = 100L,
        horizon = java.time.Duration.ofMinutes(10))
      .writeStream.format("memory").queryName("alert_expiry")
      .outputMode("append").start()
    try {
      // batch 1: IDLE crosses (alert #1, latch fires); LIVE stays under
      input.addData(
        CentsEvent(at(0), "spend", 1L, 60L),
        CentsEvent(at(1), "spend", 1L, 50L), // cum 110 ≥ 100 → alert
        CentsEvent(at(2), "spend", 2L, 10L))
      query.processAllAvailable()
      // batch 2: LIVE advances the watermark past IDLE's horizon (1+10)
      input.addData(CentsEvent(at(30), "spend", 2L, 10L))
      query.processAllAvailable()
      // batch 3: IDLE's timeout fires — counter expires, latch re-arms
      input.addData(CentsEvent(at(31), "spend", 2L, 10L))
      query.processAllAvailable()
      val stateRows = query.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows === 1, s"state rows $stateRows — expected LIVE only " +
        "(IDLE's expired counter must leave the store)")

      // batch 4: IDLE reappears in a fresh session; the running total
      // restarts from zero (not 110) and must cross again to re-alert
      input.addData(CentsEvent(at(40), "spend", 1L, 70L))
      query.processAllAvailable()
      val afterUnder = spark.table("alert_expiry").as[Alert].collect()
      assert(afterUnder.count(_.user_id == 1L) === 1,
        "70 < threshold in the fresh session — no premature re-alert, no " +
          "carry-over from the expired counter")
      input.addData(CentsEvent(at(41), "spend", 1L, 40L)) // cum 110 again
      query.processAllAvailable()
      val alerts = spark.table("alert_expiry").as[Alert].collect()
        .filter(_.user_id == 1L).sortBy(_.alert_ts.toString)
      assert(alerts.map(a => (a.alert_ts, a.cum_cents)).toSeq ===
        Seq((at(1), 110L), (at(41), 110L)),
        "one alert per idle-separated session, each from a zero-based total")
    } finally query.stop()
  }

  // Round-13 ADVICE (medium): Spark 4.1.2 evicts iff timeoutTimestamp <
  // watermark — STRICTLY (FlatMapGroupsWithStateExecBase$InputProcessor;
  // verified in the shipped jar's bytecode, lcmp/ifge). A watermark that
  // lands EXACTLY on the timer must NOT expire the session; one tick past
  // it must. The oracle's reset condition mirrors this (strict > in
  // OracleSql's ub3 CTE) — this probe pins the engine side of that pair.
  test("watermark exactly AT the timer keeps the session; past it expires") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[CentsEvent]
    val query = StreamingAnalytics
      .thresholdAlerts(input.toDS(), thresholdCents = 100L,
        horizon = java.time.Duration.ofMinutes(10))
      .writeStream.format("memory").queryName("alert_eq_probe")
      .outputMode("append").start()
    try {
      // IDLE's last event at t=0 → timer T = t0 + 10 min (wm is 0 here,
      // so the wm+1 clamp is inert)
      input.addData(CentsEvent(at(0), "spend", 1L, 60L))
      query.processAllAvailable()
      // LIVE advances the watermark to EXACTLY T: the no-data extra batch
      // checks T < wm — equality, so IDLE's state must survive
      input.addData(CentsEvent(at(10), "spend", 2L, 10L))
      query.processAllAvailable()
      // IDLE reappears: 60 carried + 50 = 110 crosses ONLY if the state
      // survived the equality watermark
      input.addData(CentsEvent(at(10).plusSeconds(30), "spend", 1L, 50L))
      query.processAllAvailable()
      val alerts1 = spark.table("alert_eq_probe").as[Alert].collect()
        .filter(_.user_id == 1L)
      assert(alerts1.map(_.cum_cents).toSeq === Seq(110L),
        "state expired at wm == timer — eviction must be STRICT (timer < wm)")

      // now user 3: last event sets T3, then the watermark moves ONE
      // second PAST it — the counter must expire (fresh session restarts
      // from zero, 50 < 100 → no alert)
      input.addData(CentsEvent(at(20), "spend", 3L, 60L))
      query.processAllAvailable()
      input.addData(CentsEvent(at(30).plusSeconds(1), "spend", 2L, 10L))
      query.processAllAvailable()
      input.addData(CentsEvent(at(31), "spend", 3L, 50L))
      query.processAllAvailable()
      val alerts3 = spark.table("alert_eq_probe").as[Alert].collect()
        .filter(_.user_id == 3L)
      assert(alerts3.isEmpty,
        "counter survived wm > timer — the horizon must expire idle state")
    } finally query.stop()
  }

  test("a live user under the horizon never expires mid-session") {
    // the fold itself: latch semantics unchanged when state persists
    val (st1, out1) = StreamingAnalytics.foldAlertBatch(7L, None,
      Seq(CentsEvent(at(0), "spend", 7L, 60L)), 100L)
    assert(out1.isEmpty && st1.cents === 60L && !st1.fired)
    val (st2, out2) = StreamingAnalytics.foldAlertBatch(7L, Some(st1),
      Seq(CentsEvent(at(5), "spend", 7L, 50L)), 100L)
    assert(out2.map(_.cum_cents) === Seq(110L) && st2.fired)
    // fired latch holds within the session — no duplicate alerts
    val (st3, out3) = StreamingAnalytics.foldAlertBatch(7L, Some(st2),
      Seq(CentsEvent(at(6), "spend", 7L, 500L)), 100L)
    assert(out3.isEmpty && st3.cents === 610L && st3.fired)
  }
}
