package graft

import java.time.LocalDateTime

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tx
import graft.streaming.StreamingFifo

/** Incremental matcher over a MemoryStream: state (the unmatched-earned
  * queue) must carry across micro-batches and produce the same matches the
  * batch matcher computes on the full data. */
class StreamingFifoSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(day: Int): LocalDateTime = LocalDateTime.of(2024, 1, day, 0, 0)

  test("queue state carries matches across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Tx]
    val query = StreamingFifo.matchStream(input.toDS())
      .writeStream.format("memory").queryName("fifo_events")
      .outputMode("append").start()

    try {
      // batch 1: two earned, one spent → E1 matched to S1, E2 left in state
      input.addData(
        Tx("E1", "C1", 100.0, ts(1), "earned"),
        Tx("E2", "C1", 50.0, ts(2), "earned"),
        Tx("S1", "C1", -80.0, ts(3), "spent"))
      query.processAllAvailable()
      val batch1 = spark.table("fifo_events").as[StreamingFifo.MatchEvent].collect()
      assert(batch1.map(e => (e.EARNED_ID, e.REDEEMID)).toSet === Set(("E1", "S1")))

      // batch 2: a spent arrives with no new earned → must consume E2 from STATE
      input.addData(Tx("X1", "C1", -30.0, ts(4), "expired"))
      query.processAllAvailable()
      val all = spark.table("fifo_events").as[StreamingFifo.MatchEvent].collect()
      assert(all.map(e => (e.EARNED_ID, e.REDEEMID)).toSet ===
        Set(("E1", "S1"), ("E2", "X1")))
      assert(all.find(_.EARNED_ID == "E2").get.REDEEMER_TYPE === "expired")

      // batch 3: spent with empty queue → no event
      input.addData(Tx("S9", "C1", -10.0, ts(5), "spent"))
      query.processAllAvailable()
      assert(spark.table("fifo_events").count() === 2)

      // customers stay independent
      input.addData(
        Tx("E9", "C2", 10.0, ts(6), "earned"),
        Tx("S8", "C2", -10.0, ts(7), "spent"))
      query.processAllAvailable()
      val c2 = spark.table("fifo_events").as[StreamingFifo.MatchEvent].collect()
        .filter(_.CUSTOMERID == "C2")
      assert(c2.map(e => (e.EARNED_ID, e.REDEEMID)).toSet === Set(("E9", "S8")))
    } finally {
      query.stop()
    }
  }

  test("streaming match log agrees with the batch matcher on replayed data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val data = Seq(
      Tx("E1", "C1", 10.0, ts(1), "earned"),
      Tx("S1", "C1", -5.0, ts(2), "spent"),
      Tx("E2", "C1", 20.0, ts(3), "earned"),
      Tx("E3", "C1", 30.0, ts(4), "earned"),
      Tx("X1", "C1", -7.0, ts(5), "expired"),
      Tx("S2", "C1", -2.0, ts(6), "spent"))

    val input = MemoryStream[Tx]
    val query = StreamingFifo.matchStream(input.toDS())
      .writeStream.format("memory").queryName("fifo_replay")
      .outputMode("append").start()
    try {
      data.grouped(2).foreach { chunk => input.addData(chunk: _*); query.processAllAvailable() }
      val streamed = spark.table("fifo_replay").as[StreamingFifo.MatchEvent].collect()
        .map(e => (e.EARNED_ID, e.REDEEMID)).toSet

      val batch = redeemMap(graft.operators.FifoMatcher.matchTransactions(data.toDF()))
        .collect { case (id, Some(r)) => (id, r) }.toSet
      assert(streamed === batch)
    } finally {
      query.stop()
    }
  }

  test("late earned row retracts and re-pairs downstream matches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Tx]
    val query = StreamingFifo.matchStreamEventTime(input.toDS())
      .writeStream.format("memory").queryName("fifo_corrections")
      .outputMode("append").start()
    try {
      // batch 1 (in order): E2 then S1 → pairing (E2, S1)
      input.addData(
        Tx("E2", "C1", 50.0, ts(2), "earned"),
        Tx("S1", "C1", -10.0, ts(3), "spent"))
      query.processAllAvailable()
      val b1 = spark.table("fifo_corrections").as[StreamingFifo.CorrectionEvent].collect()
      assert(b1.map(e => (e.EARNED_ID, e.REDEEMID, e.ACTION)).toSet ===
        Set(("E2", "S1", "add")))

      // batch 2: E1 arrives LATE with an EARLIER event time — FIFO now
      // pairs (E1, S1); the old (E2, S1) must be retracted
      input.addData(Tx("E1", "C1", 100.0, ts(1), "earned"))
      query.processAllAvailable()
      val all = spark.table("fifo_corrections").as[StreamingFifo.CorrectionEvent].collect()
      assert(all.filter(_.REV === 2).map(e => (e.EARNED_ID, e.REDEEMID, e.ACTION)).toSet ===
        Set(("E2", "S1", "retract"), ("E1", "S1", "add")))

      // the folded log must equal the batch pairing over the full history
      val standing = StreamingFifo.standingMatches(spark.table("fifo_corrections"))
        .as[(String, String)].collect().toSet
      assert(standing === Set(("E1", "S1")))

      // batch 3: a late spent shifts nothing before it but consumes E2
      input.addData(Tx("S2", "C1", -5.0, ts(4), "spent"))
      query.processAllAvailable()
      val standing2 = StreamingFifo.standingMatches(spark.table("fifo_corrections"))
        .as[(String, String)].collect().toSet
      assert(standing2 === Set(("E1", "S1"), ("E2", "S2")))
    } finally {
      query.stop()
    }
  }

  test("lateness-bounded state pruning preserves the final standing matches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // lateness bound of 2 days; arrivals never later than 1 day behind
    val input = MemoryStream[Tx]
    val query = StreamingFifo
      .matchStreamEventTime(input.toDS(), Some(java.time.Duration.ofDays(2)))
      .writeStream.format("memory").queryName("fifo_pruned")
      .outputMode("append").start()
    try {
      input.addData(
        Tx("E1", "C1", 10.0, ts(1), "earned"),
        Tx("S1", "C1", -5.0, ts(2), "spent"))
      query.processAllAvailable()
      // (E1, S1) is now stable once later events push the cutoff past day 2
      input.addData(
        Tx("E2", "C1", 20.0, ts(10), "earned"),
        Tx("S2", "C1", -5.0, ts(11), "spent"))
      query.processAllAvailable()
      // late-but-in-bound earned: pairs with S2's slot downstream of the
      // pruned prefix — (E1, S1) must survive untouched in the fold
      input.addData(Tx("E3", "C1", 30.0, ts(9), "earned"))
      query.processAllAvailable()
      val standing = StreamingFifo.standingMatches(spark.table("fifo_pruned"))
        .as[(String, String)].collect().toSet
      assert(standing === Set(("E1", "S1"), ("E3", "S2")))
    } finally {
      query.stop()
    }
  }

  test("replayLedgerLate rebuilds the exact batch ledger under delayed earned rows") {
    import spark.implicits._
    val data = Seq(
      Tx("E1", "C1", 10.0, ts(1), "earned"),
      Tx("S1", "C2", -5.0, ts(2), "spent"),
      Tx("E2", "C1", 20.0, ts(3), "earned"),
      Tx("E9", "C2", 30.0, ts(4), "earned"),
      Tx("X1", "C1", -7.0, ts(5), "expired"),
      Tx("S2", "C1", -2.0, ts(6), "spent"),
      Tx("E3", "C1", 40.0, ts(7), "earned"))
    val ledger = graft.streaming.StreamingFifo.replayLedgerLate(data.toDF(), batches = 3)
      .orderBy("TRANS_ID").collect()
    val batch = graft.operators.FifoMatcher.matchTransactions(data.toDF())
      .orderBy("TRANS_ID").collect()
    assert(ledger.toSeq === batch.toSeq)
  }

  test("idle customers evict via event-time timeout and state is bounded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def at(min: Int): LocalDateTime = LocalDateTime.of(2024, 3, 1, 0, 0).plusMinutes(min)

    val input = MemoryStream[Tx]
    val query = StreamingFifo
      .matchStreamEvicting(input.toDS(), java.time.Duration.ofMinutes(10))
      .writeStream.format("memory").queryName("fifo_evicting")
      .outputMode("append").start()
    try {
      // batch 1: IDLE1 queues two earned; ACTIVE stays live throughout
      input.addData(
        Tx("I1E1", "IDLE1", 10.0, at(0), "earned"),
        Tx("I1E2", "IDLE1", 10.0, at(1), "earned"),
        Tx("A1E1", "ACTIVE", 10.0, at(2), "earned"))
      query.processAllAvailable()
      // batch 2 advances the watermark past IDLE1's idle horizon (1min+10min)
      input.addData(Tx("A1S1", "ACTIVE", -5.0, at(30), "spent"))
      query.processAllAvailable()
      // batch 3: the timeout fires — IDLE1's queue snapshots to the log
      input.addData(Tx("A1E2", "ACTIVE", 10.0, at(31), "earned"))
      query.processAllAvailable()

      val log = spark.table("fifo_evicting").as[StreamingFifo.QueueEvent].collect()
      val evicted = log.filter(_.ACTION == "evict_earned")
      assert(evicted.map(e => (e.EARNED_ID, e.POS)).toSet ===
        Set(("I1E1", 0), ("I1E2", 1)), s"log was ${log.toSeq}")
      // the snapshot boundary is IDLE1's max folded event time
      assert(evicted.forall(_.MATCHED_AT === at(1)))
      // state is BOUNDED: IDLE1's row is gone, only ACTIVE remains
      val stateRows = query.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows === 1, s"state rows $stateRows, expected ACTIVE only")

      // a reappearing IDLE1 folds from EMPTY state (provisional output —
      // the batch rebuild supersedes it): a spent queues, emits nothing
      input.addData(Tx("I1S1", "IDLE1", -5.0, at(32), "spent"))
      query.processAllAvailable()
      assert(!spark.table("fifo_evicting").as[StreamingFifo.QueueEvent].collect()
        .exists(e => e.ACTION == "match" && e.CUSTOMERID == "IDLE1"))
    } finally query.stop()
  }

  test("evicting replay restores snapshots and rebuilds the exact batch ledger") {
    import spark.implicits._
    def at(min: Int): LocalDateTime = LocalDateTime.of(2024, 3, 1, 0, 0).plusMinutes(min)
    val data = Seq(
      // IDLE1: earned queue evicts mid-replay, two se arrive after — the
      // rebuild must restore the snapshot and match both
      Tx("I1E1", "IDLE1", 10.0, at(0), "earned"),
      Tx("I1E2", "IDLE1", 10.0, at(1), "earned"),
      Tx("I1S1", "IDLE1", -5.0, at(55), "spent"),
      Tx("I1X1", "IDLE1", -5.0, at(56), "expired"),
      // GONE: evicted, never returns — stays unmatched
      Tx("G1E1", "GONE", 10.0, at(2), "earned"),
      // PENDING: a pending-se snapshot (the two-sided queue's other side),
      // matched by an earned arriving after the eviction
      Tx("P1S1", "PENDING", -5.0, at(3), "spent"),
      Tx("P1E1", "PENDING", 10.0, at(57), "earned"),
      // ACTIVE: rows in every chunk — never evicted
      Tx("A1E1", "ACTIVE", 10.0, at(5), "earned"),
      Tx("A1S1", "ACTIVE", -5.0, at(20), "spent"),
      Tx("A1E2", "ACTIVE", 10.0, at(35), "earned"),
      Tx("A1X1", "ACTIVE", -5.0, at(50), "expired"))

    // evictions must actually FIRE during the replay (both queue sides)
    val log = StreamingFifo.replayEvictingLog(data.toDF(), batches = 4).collect()
    val actions = log.map(r => (r.getAs[String]("CUSTOMERID"), r.getAs[String]("ACTION")))
    assert(actions.contains(("IDLE1", "evict_earned")), s"log: ${actions.toSeq}")
    assert(actions.contains(("PENDING", "evict_se")), s"log: ${actions.toSeq}")

    val ledger = StreamingFifo.replayLedgerEvicting(data.toDF(), batches = 4)
      .orderBy("TRANS_ID").collect()
    val batch = graft.operators.FifoMatcher.matchTransactions(data.toDF())
      .orderBy("TRANS_ID").collect()
    assert(ledger.toSeq === batch.toSeq)
  }

  test("event-time matcher evicts idle customers and bounds state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def at(min: Int): LocalDateTime = LocalDateTime.of(2024, 3, 1, 0, 0).plusMinutes(min)

    val input = MemoryStream[Tx]
    val query = StreamingFifo
      .matchStreamEventTimeEvicting(input.toDS(),
        lateness = java.time.Duration.ofMinutes(10),
        idle = java.time.Duration.ofMinutes(25))
      .writeStream.format("memory").queryName("et_evicting")
      .outputMode("append").start()
    try {
      input.addData(
        Tx("I1E1", "IDLE1", 10.0, at(0), "earned"),
        Tx("I1E2", "IDLE1", 10.0, at(1), "earned"),
        Tx("A1E1", "ACTIVE", 10.0, at(2), "earned"))
      query.processAllAvailable()
      // watermark → 40−10=30 ≥ IDLE1 last(1)+idle(25): timeout armed
      input.addData(Tx("A1S1", "ACTIVE", -5.0, at(40), "spent"))
      query.processAllAvailable()
      // the batch in which IDLE1's timeout fires
      input.addData(Tx("A1E2", "ACTIVE", 10.0, at(41), "earned"))
      query.processAllAvailable()

      val log = spark.table("et_evicting")
        .as[StreamingFifo.CorrectionEvent].collect()
      val snap = log.filter(_.ACTION == "evict_earned")
      // snapshot entries carry their OWN event times — the (ts, id) sort
      // key reconstructs queue order without a position column
      assert(snap.map(e => (e.EARNED_ID, e.MATCHED_AT)).toSet ===
        Set(("I1E1", at(0)), ("I1E2", at(1))), s"log was ${log.toSeq}")
      assert(log.count(e => e.ACTION == "evict_bound" && e.CUSTOMERID == "IDLE1") === 1)
      // state is BOUNDED: IDLE1's row is gone, only ACTIVE remains
      val stateRows = query.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows === 1, s"state rows $stateRows, expected ACTIVE only")
    } finally query.stop()
  }

  test("evicting late replay restores snapshots and rebuilds the exact batch ledger") {
    import spark.implicits._
    def at(min: Int): LocalDateTime = LocalDateTime.of(2024, 3, 1, 0, 0).plusMinutes(min)
    val data = Seq(
      // IDLE1: earned queue evicts mid-replay; an se arrives long after —
      // the rebuild must restore the snapshot and match it
      Tx("I1E1", "IDLE1", 10.0, at(0), "earned"),
      Tx("I1E2", "IDLE1", 10.0, at(1), "earned"),
      Tx("I1S1", "IDLE1", -5.0, at(110), "spent"),
      // GONE: evicted, never returns — stays unmatched
      Tx("G1E1", "GONE", 10.0, at(2), "earned"),
      // PENDING: a pending-se snapshot, matched by a later earned
      Tx("P1S1", "PENDING", -5.0, at(3), "spent"),
      Tx("P1E1", "PENDING", 10.0, at(112), "earned"),
      // ACTIVE: rows throughout — never evicted; exercises the
      // correction path (adds/retracts) alongside the eviction path
      Tx("A1E1", "ACTIVE", 10.0, at(5), "earned"),
      Tx("A1S1", "ACTIVE", -5.0, at(30), "spent"),
      Tx("A1E2", "ACTIVE", 10.0, at(60), "earned"),
      Tx("A1X1", "ACTIVE", -5.0, at(90), "expired"),
      Tx("A1E3", "ACTIVE", 10.0, at(111), "earned"))

    // evictions must actually FIRE during the replay (both queue sides)
    val log = StreamingFifo.replayLateEvictingLog(data.toDF(), batches = 4).collect()
    val actions = log.map(r => (r.getAs[String]("CUSTOMERID"), r.getAs[String]("ACTION")))
    assert(actions.contains(("IDLE1", "evict_earned")), s"log: ${actions.toSeq}")
    assert(actions.contains(("PENDING", "evict_se")), s"log: ${actions.toSeq}")
    assert(actions.contains(("GONE", "evict_bound")), s"log: ${actions.toSeq}")

    val ledger = StreamingFifo.replayLedgerLateEvicting(data.toDF(), batches = 4)
      .orderBy("TRANS_ID").collect()
    val batch = graft.operators.FifoMatcher.matchTransactions(data.toDF())
      .orderBy("TRANS_ID").collect()
    assert(ledger.toSeq === batch.toSeq)
  }

  test("replayLedger rebuilds the exact batch ledger across chunked state") {
    import spark.implicits._
    val data = Seq(
      Tx("E1", "C1", 10.0, ts(1), "earned"),
      Tx("S1", "C2", -5.0, ts(2), "spent"), // se before any earned for C2
      Tx("E2", "C1", 20.0, ts(3), "earned"),
      Tx("E9", "C2", 30.0, ts(4), "earned"),
      Tx("X1", "C1", -7.0, ts(5), "expired"),
      Tx("S2", "C1", -2.0, ts(6), "spent"),
      Tx("E3", "C1", 40.0, ts(7), "earned"))
    val ledger = graft.streaming.StreamingFifo.replayLedger(data.toDF(), batches = 4)
      .orderBy("TRANS_ID").collect()
    val batch = graft.operators.FifoMatcher.matchTransactions(data.toDF())
      .orderBy("TRANS_ID").collect()
    assert(ledger.toSeq === batch.toSeq)
  }
}
