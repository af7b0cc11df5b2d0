package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Tx

/** Incremental FIFO matching over a transaction stream — the extension the
  * reference sketches but defers (reference: README.md:184-219 "reprocess
  * affected customers"; SURVEY §2.10).
  *
  * State per customer is exactly the matcher's queue: the ordered list of
  * not-yet-redeemed earned TRANS_IDs. Each micro-batch folds its rows into
  * that state and emits a *match event log* — `(customer, earned id,
  * redeemer id, redeemer type, event time)` — rather than re-emitting full
  * ledger rows: append-mode streams cannot retract an "unmatched" earned row
  * that a later batch matches, so the unmatched set lives in state and the
  * match log is the incremental output (the batch matcher remains the
  * source of truth for full-ledger rebuilds).
  *
  * Ordering contract: rows are processed in (timestamp, transaction_id)
  * order *within* a batch; across batches, arrival order stands in for event
  * order. True event-time FIFO under late data would need retractions or
  * per-customer reprocessing — precisely why the reference defers it
  * (reference: README.md:208-216).
  *
  * Scale: state is O(unmatched earned) per customer, keyed by customer —
  * the same shuffle key as the batch matcher; no global state.
  */
object StreamingFifo {

  /** Two-sided queue state: unmatched earned AND unmatched spent/expired.
    * Carrying the se side is required for batch-parity — the reference's
    * queue holds the customer's FULL earned list (later-dated earned
    * included), so an se arriving before any earned still matches the first
    * earned that ever arrives. At most one of the two queues is non-empty.
    * pendingSe holds (transaction_id, transaction_type). */
  case class CustomerQueue(availableEarned: Seq[String], pendingSe: Seq[(String, String)])

  case class MatchEvent(
      CUSTOMERID: String,
      EARNED_ID: String,
      REDEEMID: String,
      REDEEMER_TYPE: String,
      MATCHED_AT: java.time.LocalDateTime)

  def matchStream(txns: Dataset[Tx]): Dataset[MatchEvent] = {
    implicit val stateEnc = Encoders.product[CustomerQueue]
    implicit val outEnc = Encoders.product[MatchEvent]
    implicit val keyEnc = Encoders.STRING

    txns.groupByKey(_.customer_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (customerId: String, rows: Iterator[Tx], state: GroupState[CustomerQueue]) =>
          val sorted = rows.toIndexedSeq.sortBy(t => (t.timestamp, t.transaction_id))(
            Ordering.Tuple2(
              Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _),
              Ordering.String))
          // ArrayDeque queues: O(1) amortized append AND removeHead, so a
          // whale customer ingesting a b-row batch onto an n-deep queue pays
          // O(n + b), not the O((n + b)²) of per-element `list :+ x`
          val earned = scala.collection.mutable.ArrayDeque.from(
            state.getOption.map(_.availableEarned).getOrElse(Nil))
          val pendingSe = scala.collection.mutable.ArrayDeque.from(
            state.getOption.map(_.pendingSe).getOrElse(Nil))
          val events = Seq.newBuilder[MatchEvent]
          sorted.foreach { t =>
            t.transaction_type match {
              case "earned" =>
                if (pendingSe.nonEmpty) {
                  // an older se was waiting for balance — this earned redeems it
                  val (seId, seType) = pendingSe.removeHead()
                  events += MatchEvent(customerId, t.transaction_id, seId, seType, t.timestamp)
                } else earned.append(t.transaction_id)
              case "spent" | "expired" =>
                if (earned.nonEmpty) {
                  events += MatchEvent(customerId, earned.removeHead(), t.transaction_id,
                    t.transaction_type, t.timestamp)
                } else {
                  // no balance yet — waits for a future earned (batch parity:
                  // the k-th se always matches the k-th earned, dates ignored)
                  pendingSe.append((t.transaction_id, t.transaction_type))
                }
              case _ => // invalid types are the validation layer's concern
            }
          }
          state.update(CustomerQueue(earned.toSeq, pendingSe.toSeq))
          events.result().iterator
      }
  }

  // ---- event-time matching with late-data retraction (SURVEY §7.7) ----

  /** One entry of the correction log emitted by [[matchStreamEventTime]]:
    * ACTION is "add" or "retract", REV the per-customer revision that
    * produced it. The standing ledger at any point is, per earned id, the
    * highest-REV event (an "add" means the pair holds; a "retract" without
    * a same-REV "add" means the earned row is back to unmatched). */
  case class CorrectionEvent(
      CUSTOMERID: String,
      EARNED_ID: String,
      REDEEMID: String,
      REDEEMER_TYPE: String,
      MATCHED_AT: java.time.LocalDateTime,
      ACTION: String,
      REV: Int)

  /** Per-customer state for event-time matching: the full event-time-sorted
    * history of both sides plus the currently-standing emitted assignment
    * (earned_id, redeem_id, type, matched_at_micros). With a lateness bound
    * the stable prefix is pruned away (see [[matchStreamEventTime]]) and
    * `prunedThrough` records the largest event time (micros) inside any
    * pruned prefix — the point of no return: an arrival at or before it
    * would have to insert into history this operator no longer holds, so it
    * is DROPPED with an observable `drop_late` correction event rather than
    * silently appended into the kept suffix (which would corrupt the
    * pairing with no signal). Without a bound, state is O(customer history)
    * — the price of exact unbounded-late correctness. */
  case class EventTimeState(
      rev: Int,
      earned: Seq[(Long, String)],
      se: Seq[(Long, String, String)],
      standing: Seq[(String, String, String, Long)],
      prunedThrough: Long)

  private val microEpoch = java.time.LocalDateTime.of(1970, 1, 1, 0, 0)
  private def toMicros(t: java.time.LocalDateTime): Long =
    java.time.temporal.ChronoUnit.MICROS.between(microEpoch, t)
  private def ofMicros(u: Long): java.time.LocalDateTime =
    microEpoch.plus(u, java.time.temporal.ChronoUnit.MICROS)

  /** TRUE event-time FIFO matching under late data — the extension the
    * reference defers as "reprocess affected customers"
    * (reference: README.md:208-216). Where [[matchStream]] treats arrival
    * order as event order (a late earned row would mis-pair everything after
    * it), this operator re-derives the customer's assignment from its merged
    * event-time history on every batch that touches the customer, and emits
    * only the DELTA as add/retract [[CorrectionEvent]]s: a late earned row
    * arriving mid-stream shifts the FIFO pairing downstream of its insertion
    * point, so every shifted pair gets a retract of the old match and an add
    * of the new one, all at the same revision.
    *
    * Equivalence: the batch matcher pairs the k-th spent/expired with the
    * k-th earned under (timestamp, transaction_id) order, so the recompute
    * is a zip of the two sorted histories — folding the correction log by
    * latest revision per earned id reproduces the batch ledger exactly,
    * regardless of how arrival interleaves ([[replayLedgerLate]] gates this
    * through the DuckDB hash gate with deliberately-delayed rows).
    *
    * Scale: only customers WITH new rows are touched per batch (the
    * reference's "affected customers" set — flatMapGroupsWithState invokes
    * exactly those groups), keyed by the same customer shuffle key as the
    * batch matcher. Unbounded lateness needs the full history in state;
    * passing `lateness` prunes the stable prefix — once both sides' k-th
    * elements are older than (max seen − lateness), no admissible arrival
    * can insert before index k on either side, so pairs below k can never
    * shift again and leave state. State then holds O(events within the
    * lateness window) per customer, the standard watermark trade-off. */
  def matchStreamEventTime(txns: Dataset[Tx],
      lateness: Option[java.time.Duration] = None): Dataset[CorrectionEvent] = {
    implicit val stateEnc = Encoders.product[EventTimeState]
    implicit val outEnc = Encoders.product[CorrectionEvent]
    implicit val keyEnc = Encoders.STRING
    val latenessMicros = lateness.map(_.toNanos / 1000L)

    txns.groupByKey(_.customer_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (customerId: String, rows: Iterator[Tx], state: GroupState[EventTimeState]) =>
          val st = state.getOption.getOrElse(
            EventTimeState(0, Nil, Nil, Nil, Long.MinValue))
          val (next, events) = foldEventTimeBatch(customerId, st, rows, latenessMicros)
          state.update(next)
          events.iterator
      }
  }

  /** One micro-batch of event-time matching, as a pure state fold — the
    * streaming closure above is just this function under
    * `flatMapGroupsWithState`, which is what lets the bounded-state spec
    * drive many batches through it directly and assert on the returned
    * state (stable-prefix pruning actually firing) without a state store.
    *
    * Batch ingestion is O(n + b log b + n log n) for an n-deep history and
    * b-row batch: new arrivals accumulate in a builder and concatenate
    * once (the old per-element `seq :+ x` paid O(n) per append — O(n·b)
    * for a whale customer's large batch — before the same sort). */
  private[graft] def foldEventTimeBatch(
      customerId: String,
      st: EventTimeState,
      rows: IterableOnce[Tx],
      latenessMicros: Option[Long]): (EventTimeState, Seq[CorrectionEvent]) = {
    val newEarned = Seq.newBuilder[(Long, String)]
    val newSe = Seq.newBuilder[(Long, String, String)]
    val dropped = Seq.newBuilder[Tx]
    rows.iterator.foreach { t =>
      val micros = toMicros(t.timestamp)
      if (micros <= st.prunedThrough) {
        // beyond-bound arrival: its insertion point is inside (or tied
        // with) history already pruned from state, so its true FIFO
        // pairing is unrecoverable. Dropping silently would corrupt the
        // correction log invisibly; instead the row is excluded from
        // pairing and surfaced as an observable `drop_late` event.
        dropped += t
      } else t.transaction_type match {
        case "earned" => newEarned += ((micros, t.transaction_id))
        case "spent" | "expired" =>
          newSe += ((micros, t.transaction_id, t.transaction_type))
        case _ => // invalid types are the validation layer's concern
      }
    }
    val earned = (st.earned ++ newEarned.result()).sortBy(identity)
    val se = (st.se ++ newSe.result()).sortBy(s => (s._1, s._2))
    // FIFO index pairing over the merged event-time histories
    val pairs = earned.zip(se).map { case ((te, eid), (ts, sid, styp)) =>
      (eid, sid, styp, math.max(te, ts))
    }
    val oldMap = st.standing.map(p => p._1 -> p).toMap
    val newMap = pairs.map(p => p._1 -> p).toMap
    val rev = st.rev + 1
    val events = Seq.newBuilder[CorrectionEvent]
    // retract pairs that vanished or changed (sorted for determinism)
    st.standing.sortBy(_._1).foreach { case old @ (eid, sid, styp, at) =>
      if (!newMap.get(eid).contains(old))
        events += CorrectionEvent(customerId, eid, sid, styp, ofMicros(at),
          "retract", rev)
    }
    // add pairs that are new or changed
    pairs.foreach { case p @ (eid, sid, styp, at) =>
      if (!oldMap.get(eid).contains(p))
        events += CorrectionEvent(customerId, eid, sid, styp, ofMicros(at),
          "add", rev)
    }
    // beyond-bound drops, after the adds so same-batch folding stays stable;
    // a dropped row never entered pairing, so its id has no "add" and the
    // standing fold keeps it unmatched — divergence is visible, not silent
    dropped.result().sortBy(t => (t.timestamp, t.transaction_id))(
      Ordering.Tuple2(
        Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _),
        Ordering.String)).foreach { t =>
      events += CorrectionEvent(customerId, t.transaction_id, "",
        t.transaction_type, t.timestamp, "drop_late", rev)
    }
    // prune the stable prefix under a lateness bound: drop the same
    // COUNT from both sides so downstream indices stay aligned
    val (earnedKept, seKept, standingKept, prunedThrough) = latenessMicros match {
      case Some(bound) if earned.nonEmpty || se.nonEmpty =>
        val maxSeen = (earned.map(_._1) ++ se.map(_._1)).max
        val cutoff = maxSeen - bound
        val stable = (0 until math.min(earned.size, se.size))
          .takeWhile(k => earned(k)._1 < cutoff && se(k)._1 < cutoff)
          .size
        val prunedIds = earned.take(stable).map(_._2).toSet
        val boundary =
          if (stable == 0) st.prunedThrough
          else math.max(st.prunedThrough,
            math.max(earned(stable - 1)._1, se(stable - 1)._1))
        (earned.drop(stable), se.drop(stable),
          pairs.filterNot(p => prunedIds.contains(p._1)), boundary)
      case _ => (earned, se, pairs, st.prunedThrough)
    }
    (EventTimeState(rev, earnedKept, seKept,
      standingKept.map(p => (p._1, p._2, p._3, p._4)), prunedThrough), events.result())
  }

  /** Fold a [[CorrectionEvent]] log to the standing matches: per earned id,
    * the highest-revision event wins; it must be an "add" for the pair to
    * stand (a same-revision retract+add pair resolves to the add). */
  def standingMatches(log: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("EARNED_ID").orderBy(col("REV").desc, col("ACTION"))
    log.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1 && col("ACTION") === "add")
      .select(col("EARNED_ID").as("TRANS_ID"), col("REDEEMID"))
  }

  /** Replay with DELIBERATE late data: rows are chunked by event-time range
    * (like [[replayLedger]]), but a deterministic subset of earned rows —
    * `pmod(hash(transaction_id), 4) = 0` — is delayed by one chunk, so batch
    * k+1 carries earned rows whose event times precede everything in batch
    * k's range. The final ledger folds the correction log and must
    * hash-match the batch oracle (the driver gate: `streaming_late_match`,
    * same `fifo_match` SQL). */
  def replayLedgerLate(txns: DataFrame, batches: Int = 3,
      lateness: Option[java.time.Duration] = None): DataFrame = {
    val log = replayLateLog(txns, batches, lateness)
    graft.operators.FifoMatcher.renameToSpec(txns)
      .join(standingMatches(log), Seq("TRANS_ID"), "left")
      .select("TRANS_ID", "TCTYPE", "CREATEDAT", "CUSTOMERID", "AMOUNT", "REDEEMID")
  }

  /** The raw correction log of a delayed replay — the shared substrate of
    * the late-ledger gates and the drops audit (which needs the log's
    * `drop_late` rows, not just the folded ledger). */
  private def replayLateLog(txns: DataFrame, batches: Int,
      lateness: Option[java.time.Duration]): DataFrame = {
    val spark = txns.sparkSession
    implicit val txEnc = Encoders.product[Tx]
    val src = txns
      .select("transaction_id", "customer_id", "amount", "timestamp", "transaction_type")
    val dirs = FileReplay.stageChunksDelayed(src, "timestamp", batches,
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(col("transaction_id")),
        org.apache.spark.sql.functions.lit(4)) === 0 &&
        col("transaction_type") === "earned")
    val events = matchStreamEventTime(
      FileReplay.stream(spark, src.schema, dirs).as[Tx], lateness)
    FileReplay.runToParquet(events.toDF(), dirs)
  }

  /** [[replayLedgerLate]] with the lateness bound ENGAGED at exactly one
    * chunk span — the 100-TB mode where per-customer state holds only the
    * lateness window instead of the full history. The replay delays rows
    * exactly one chunk, so a one-chunk bound admits every delayed row (no
    * `drop_late` fires) while the stable prefix leaves state after each
    * batch; the folded ledger must still hash-match the batch `fifo_match`
    * oracle (the driver gate: `streaming_late_match_bounded`). The bound is
    * ⌈span/batches⌉ + 1 µs from a 2-value min/max aggregate — a driver-side
    * scalar, the same boundary class as the replay chunker's own range
    * probe. */
  def replayLedgerLateBounded(txns: DataFrame, batches: Int = 3): DataFrame =
    replayLedgerLate(txns, batches, oneChunkLateness(txns, batches))

  /** The ⌈span/batches⌉ + 1 µs lateness bound shared by the bounded ledger
    * gate and its drops audit — a 2-value min/max aggregate, driver-side
    * scalar (the same boundary class as the replay chunker's range probe). */
  private def oneChunkLateness(txns: DataFrame,
      batches: Int): Option[java.time.Duration] = {
    import org.apache.spark.sql.functions.{max, min}
    val mm = txns.agg(min(col("timestamp")), max(col("timestamp"))).head()
    if (mm.isNullAt(0)) None
    else {
      val lo = toMicros(mm.getAs[java.time.LocalDateTime](0))
      val hi = toMicros(mm.getAs[java.time.LocalDateTime](1))
      val chunk = (hi - lo) / batches + 2 // ⌈span/batches⌉ + 1 µs margin
      Some(java.time.Duration.of(chunk, java.time.temporal.ChronoUnit.MICROS))
    }
  }

  /** One-row audit of the bounded late replay, gating the drop COUNTER
    * itself (verdict r8 stretch #8): `n_drop_late` counts the log's
    * beyond-bound `drop_late` events, and the DuckDB twin hardcodes 0 —
    * the replay delays rows exactly one chunk and the bound admits a full
    * chunk, so ANY nonzero drop count (a pruning bug, a bound
    * mis-derivation, a chunker regression) fails the hash gate instead of
    * hiding inside a still-correct-looking ledger. `n_txns`/`n_matched`
    * pin the ledger volume the drops are audited against. */
  def replayLedgerLateBoundedAudit(txns: DataFrame, batches: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit}
    val log = replayLateLog(txns, batches, oneChunkLateness(txns, batches))
    val ledger = graft.operators.FifoMatcher.renameToSpec(txns)
      .join(standingMatches(log), Seq("TRANS_ID"), "left")
    ledger.agg(count(lit(1)).as("n_txns"), count(col("REDEEMID")).as("n_matched"))
      .crossJoin(log.filter(col("ACTION") === "drop_late")
        .agg(count(lit(1)).as("n_drop_late")))
  }

  /** Replay a batch transaction table through [[matchStream]] in
    * `batches` event-ordered micro-batches and rebuild the full matched
    * ledger from the emitted match log — the correctness-gate harness that
    * proves streaming ≡ batch ≡ the DuckDB oracle (its oracle IS the batch
    * `fifo_match` SQL).
    *
    * Fully distributed (round 4 — the MemoryStream harness this replaces
    * collected the input table to the driver): chunks are staged by a
    * Spark job per event-time range, replayed through a `readStream` file
    * source one file per trigger, and the match log lands in a parquet
    * sink read back as a batch frame. Chunk boundaries still split
    * customers' histories mid-queue, so state carry-over across
    * micro-batches is what the hash gate exercises; event-time-range
    * chunking preserves the operator's arrival-order-is-event-order
    * contract across batches ([[FileReplay]]). */
  def replayLedger(txns: DataFrame, batches: Int = 3): DataFrame = {
    val spark = txns.sparkSession
    implicit val txEnc = Encoders.product[Tx]
    val src = txns
      .select("transaction_id", "customer_id", "amount", "timestamp", "transaction_type")
    val dirs = FileReplay.stageChunks(src, "timestamp", batches)
    val events = matchStream(FileReplay.stream(spark, src.schema, dirs).as[Tx])
    val log = FileReplay.runToParquet(events.toDF(), dirs)
      .select(col("EARNED_ID").as("TRANS_ID"), col("REDEEMID"))
    graft.operators.FifoMatcher.renameToSpec(txns)
      .join(log, Seq("TRANS_ID"), "left")
      .select("TRANS_ID", "TCTYPE", "CREATEDAT", "CUSTOMERID", "AMOUNT", "REDEEMID")
  }
}
