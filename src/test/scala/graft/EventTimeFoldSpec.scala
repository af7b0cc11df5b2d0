package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tx
import graft.streaming.StreamingFifo
import graft.streaming.StreamingFifo.{CorrectionEvent, EventTimeState}

/** Drives [[StreamingFifo.foldEventTimeBatch]] — the pure per-batch fold the
  * streaming closure wraps — directly, which is what makes the lateness
  * bound's STATE claims testable (verdict r7 #3): with a bound engaged,
  * per-customer state must stay O(events inside the lateness window) while
  * the folded correction log still reproduces the batch FIFO pairing; and a
  * beyond-bound arrival must surface as an observable `drop_late` event,
  * never a silent corruption (ADVICE r7, StreamingFifo beyond-bound item).
  */
class EventTimeFoldSpec extends AnyFunSuite {

  private val empty = EventTimeState(0, Nil, Nil, Nil, Long.MinValue)
  private def ts(min: Int): LocalDateTime = LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(min)
  private def earned(id: String, min: Int) = Tx(id, "C1", 10.0, ts(min), "earned")
  private def spent(id: String, min: Int) = Tx(id, "C1", -10.0, ts(min), "spent")

  /** Reference pairing: k-th earned ↔ k-th spent/expired under (ts, id). */
  private def batchPairs(rows: Seq[Tx]): Seq[(String, String)] = {
    val sorted = rows.sortBy(t => (t.timestamp.toString, t.transaction_id))
    sorted.filter(_.transaction_type == "earned").map(_.transaction_id)
      .zip(sorted.filter(t => t.transaction_type == "spent" || t.transaction_type == "expired")
        .map(_.transaction_id))
  }

  /** Fold a correction log to standing (earned → redeem) pairs: latest
    * revision per earned id wins and must be an "add" — the
    * [[StreamingFifo.standingMatches]] rule, driver-side. */
  private def fold(log: Seq[CorrectionEvent]): Map[String, String] =
    log.filter(e => e.ACTION == "add" || e.ACTION == "retract")
      .groupBy(_.EARNED_ID).flatMap { case (eid, evs) =>
        // same-revision retract+add resolves to the add (standingMatches rule)
        val last = evs.maxBy(e => (e.REV, if (e.ACTION == "add") 1 else 0))
        if (last.ACTION == "add") Some(eid -> last.REDEEMID) else None
      }

  private def run(batches: Seq[Seq[Tx]], latenessMicros: Option[Long])
      : (EventTimeState, Seq[CorrectionEvent], Seq[Int]) = {
    var st = empty
    val log = Seq.newBuilder[CorrectionEvent]
    val sizes = Seq.newBuilder[Int]
    batches.foreach { b =>
      val (next, evs) = StreamingFifo.foldEventTimeBatch("C1", st, b, latenessMicros)
      st = next
      log ++= evs
      sizes += next.earned.size + next.se.size
    }
    (st, log.result(), sizes.result())
  }

  private val minuteMicros = 60L * 1000000L

  test("unbounded: late arrival re-pairs downstream and fold matches batch") {
    val b1 = Seq(earned("E1", 0), earned("E3", 20), spent("S1", 30), spent("S2", 40))
    val b2 = Seq(earned("E2", 10)) // late: event time before E3
    val (_, log, _) = run(Seq(b1, b2), None)
    assert(fold(log) === batchPairs(b1 ++ b2).toMap)
    // the shifted pair E3→S2 must have been corrected via retract+add
    assert(log.exists(e => e.ACTION == "retract" && e.EARNED_ID == "E3"))
    assert(fold(log)("E2") === "S2")
  }

  test("bounded: state stays within the lateness window while fold matches batch") {
    // 40 batches, each one earned+spent pair 10 minutes apart; bound = 25 min
    val batches = (0 until 40).map(k =>
      Seq(earned(f"E$k%03d", 10 * (2 * k)), spent(f"S$k%03d", 10 * (2 * k + 1))))
    val (st, log, sizes) = run(batches, Some(25 * minuteMicros))
    assert(fold(log) === batchPairs(batches.flatten).toMap)
    // stable-prefix pruning must actually fire: unbounded state would grow
    // to 80 events; bounded keeps only events inside ~the lateness window
    assert(sizes.max <= 6,
      s"state should stay within the lateness window, saw max ${sizes.max}")
    assert(st.earned.size + st.se.size <= 6)
    assert(st.prunedThrough > Long.MinValue, "pruning never fired")
    assert(!log.exists(_.ACTION == "drop_late"),
      "admissible arrivals must never be dropped")
  }

  test("bounded: admissible late arrival (within bound) still re-pairs exactly") {
    val b1 = Seq(earned("E1", 0), earned("E3", 20), spent("S1", 30), spent("S2", 40))
    val b2 = Seq(earned("E2", 10)) // 30 min late relative to max seen (40)
    val (_, log, _) = run(Seq(b1, b2), Some(60 * minuteMicros))
    assert(fold(log) === batchPairs(b1 ++ b2).toMap)
    assert(!log.exists(_.ACTION == "drop_late"))
  }

  test("bounded: beyond-bound arrival is dropped OBSERVABLY, not silently kept") {
    // drive far enough that the early history is pruned, then inject an
    // arrival older than the pruned boundary
    val batches = (0 until 10).map(k =>
      Seq(earned(f"E$k%03d", 10 * (2 * k)), spent(f"S$k%03d", 10 * (2 * k + 1))))
    val violation = Seq(earned("EVIL", 5)) // inside the long-pruned prefix
    val (st, log, _) = run(batches :+ violation, Some(25 * minuteMicros))
    val drops = log.filter(_.ACTION == "drop_late")
    assert(drops.map(_.EARNED_ID) === Seq("EVIL"), "the violation must be surfaced")
    assert(drops.head.REDEEMID === "")
    // the drop must not have perturbed the standing pairing of kept history
    assert(fold(log) === batchPairs(batches.flatten).toMap)
    assert(!st.earned.exists(_._2 == "EVIL"), "dropped row must not enter state")
  }

  test("whale batch: one large batch folds in one pass with correct pairing") {
    // 5k pairs in a single batch — the shape that was O(n²) under per-element
    // appends; correctness check here, the bound is structural (builder+concat)
    val big = (0 until 5000).flatMap(k =>
      Seq(earned(f"E$k%05d", 2 * k), spent(f"S$k%05d", 2 * k + 1)))
    val (st, log, _) = run(Seq(big), None)
    assert(fold(log) === batchPairs(big).toMap)
    // unbounded mode keeps the full history in state by design
    assert(st.earned.size === 5000 && st.se.size === 5000)
  }
}
