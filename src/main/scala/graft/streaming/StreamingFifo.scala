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
  * the same shuffle key as the batch matcher; no global state. Under
  * [[matchStream]]'s NoTimeout that still grows with customers × time over
  * a years-long stream; [[matchStreamEvicting]] bounds it to customers
  * active within an idle horizon by snapshotting quiet customers' queues
  * to the output log and restoring them in batch on reappearance.
  */
object StreamingFifo {

  /** Replay state partition count for the FIFO queue folds. The fold is
    * O(batch rows) queue arithmetic — trivial compute — so the per-trigger
    * cost is state-store commits and task scheduling, which scale with the
    * partition count: the round-16 JIT-controlled interleaved sweep on
    * the evicted gate (reps 5-8 of an alternating 4/8 sequence, sf0.1,
    * local[32]) measured 4 -> 6.05/6.14 s vs 8 -> 6.59/6.60 s per call
    * (16 -> ~9.3 s in the coarse first pass). 4 balances that against
    * per-partition batch growth at larger corpora; deployments override
    * with the
    * `graft.replay.statePartitions` session conf (FileReplay honors it
    * above this default). The analytics replays keep 8 — their per-batch
    * fold compute is heavier and 4 measured SLOWER there (round-14
    * alerts sweep). */
  private val FifoStateParts = 4

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

  /** The within-batch sort shared by every arrival-order formulation:
    * (timestamp, transaction_id), the batch matcher's own order. */
  private[graft] def sortTx(rows: Seq[Tx]): IndexedSeq[Tx] =
    rows.toIndexedSeq.sortBy(t => (t.timestamp, t.transaction_id))(
      Ordering.Tuple2(
        Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _),
        Ordering.String))

  /** The two-sided queue fold shared by [[matchStream]], the evicting
    * variant, and the batch restore pass — ONE implementation of the
    * matcher's queue semantics, so the eviction/restore cycle cannot drift
    * from the always-resident path.
    *
    * ArrayDeque queues: O(1) amortized append AND removeHead, so a whale
    * customer ingesting a b-row batch onto an n-deep queue pays O(n + b),
    * not the O((n + b)²) of per-element `list :+ x`. Both deques are
    * mutated in place; the caller snapshots them into its state. */
  private[graft] def foldQueue(customerId: String,
      earned: scala.collection.mutable.ArrayDeque[String],
      pendingSe: scala.collection.mutable.ArrayDeque[(String, String)],
      sorted: Seq[Tx]): Seq[MatchEvent] = {
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
    events.result()
  }

  def matchStream(txns: Dataset[Tx]): Dataset[MatchEvent] = {
    implicit val stateEnc = Encoders.product[CustomerQueue]
    implicit val outEnc = Encoders.product[MatchEvent]
    implicit val keyEnc = Encoders.STRING

    txns.groupByKey(_.customer_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (customerId: String, rows: Iterator[Tx], state: GroupState[CustomerQueue]) =>
          val earned = scala.collection.mutable.ArrayDeque.from(
            state.getOption.map(_.availableEarned).getOrElse(Nil))
          val pendingSe = scala.collection.mutable.ArrayDeque.from(
            state.getOption.map(_.pendingSe).getOrElse(Nil))
          val events = foldQueue(customerId, earned, pendingSe, sortTx(rows.toIndexedSeq))
          state.update(CustomerQueue(earned.toSeq, pendingSe.toSeq))
          events.iterator
      }
  }

  // ---- bounded state: idle-customer eviction + batch-store restore ----

  /** [[CustomerQueue]] plus the boundary the eviction snapshot carries:
    * `foldedThroughMicros` is the max event time (µs, NTZ) this customer's
    * state has folded — everything at or before it is reflected in the
    * emitted match events and, at eviction, in the snapshot. */
  case class EvictingQueue(availableEarned: Seq[String],
      pendingSe: Seq[(String, String)], foldedThroughMicros: Long)

  /** One line of the evicting matcher's output log — matches AND eviction
    * snapshots share the sink (the sink IS the batch store the reference's
    * "reprocess affected customers" design assumes, README.md:208-216):
    *  - ACTION "match": (EARNED_ID, REDEEMID, REDEEMER_TYPE) as in
    *    [[MatchEvent]]; POS is -1.
    *  - ACTION "evict_earned": EARNED_ID holds a queued unmatched earned id,
    *    POS its queue position; MATCHED_AT is the snapshot boundary
    *    (the customer's foldedThrough event time).
    *  - ACTION "evict_se": REDEEMID/REDEEMER_TYPE hold a pending
    *    spent/expired id and type, POS its queue position. */
  case class QueueEvent(
      CUSTOMERID: String,
      EARNED_ID: String,
      REDEEMID: String,
      REDEEMER_TYPE: String,
      MATCHED_AT: java.time.LocalDateTime,
      ACTION: String,
      POS: Int)

  /** [[Tx]] widened with the instant-typed copy of the event time that the
    * watermark tracks (watermarks need TIMESTAMP, the corpus is NTZ —
    * the same cast discipline as StreamingAnalytics' windows). */
  case class TxWm(transaction_id: String, customer_id: String, amount: Double,
      timestamp: java.time.LocalDateTime, transaction_type: String,
      wm_ts: java.sql.Timestamp)

  /** Reserved customer id for the watermark-flush sentinel row the replay
    * appends; filtered from the log before any rebuild. */
  private[graft] val SentinelId = "\u0000wm_sentinel"

  /** [[matchStream]] with BOUNDED state — the round-11 verdict's one
    * scale-killer-shaped gap: under `NoTimeout` a years-long production
    * stream accretes a queue for every customer ever seen (customers ×
    * time). Here a customer idle past `idle` (event time, watermark-driven)
    * has its state SNAPSHOT to the output log as `evict_*` rows and
    * removed; the log's sink is the batch store, so the snapshot is durable
    * and restoration is the reference's own "reprocess affected customers"
    * design (reference: README.md:208-216), executed by
    * [[replayLedgerEvicting]]: a customer that reappears after eviction is
    * re-folded IN BATCH from snapshot + post-eviction rows — the snapshot
    * alone is sufficient, never the full history.
    *
    * Post-eviction stream output for a reappeared customer is PROVISIONAL
    * (the operator folds from empty state — it cannot see the snapshot);
    * the rebuild discards it by the `MATCHED_AT > first-eviction boundary`
    * cut, which is airtight under the arrival-order-is-event-order
    * contract: every post-eviction row carries a strictly later event time
    * than anything folded before the eviction. An empty queue evicts
    * silently (nothing to snapshot, nothing to restore — empty state IS
    * the batch matcher's state at that point, so the stream's subsequent
    * output for that customer stays authoritative).
    *
    * Scale: state is O(customers active within the idle horizon), the
    * watermark trade-off; the timeout uses EVENT time, so replay/backfill
    * at any wall-clock speed evicts identically. */
  def matchStreamEvicting(txns: Dataset[Tx],
      idle: java.time.Duration): Dataset[QueueEvent] = {
    implicit val stateEnc = Encoders.product[EvictingQueue]
    implicit val outEnc = Encoders.product[QueueEvent]
    implicit val keyEnc = Encoders.STRING
    implicit val txWmEnc = Encoders.product[TxWm]
    val idleMs = math.max(1L, idle.toMillis)

    txns.withColumn("wm_ts", col("timestamp").cast("timestamp")).as[TxWm]
      .withWatermark("wm_ts", "0 seconds")
      .groupByKey(_.customer_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (customerId: String, rows: Iterator[TxWm], state: GroupState[EvictingQueue]) =>
          if (state.hasTimedOut) {
            val st = state.get
            val at = ofMicros(st.foldedThroughMicros)
            val snapshot =
              st.availableEarned.zipWithIndex.map { case (id, i) =>
                QueueEvent(customerId, id, "", "", at, "evict_earned", i)
              } ++ st.pendingSe.zipWithIndex.map { case ((id, typ), i) =>
                QueueEvent(customerId, "", id, typ, at, "evict_se", i)
              }
            state.remove()
            snapshot.iterator
          } else {
            val wmRows = rows.toIndexedSeq
            val sorted = sortTx(wmRows.map(w =>
              Tx(w.transaction_id, w.customer_id, w.amount, w.timestamp,
                w.transaction_type)))
            val prev = state.getOption
            val earned = scala.collection.mutable.ArrayDeque.from(
              prev.map(_.availableEarned).getOrElse(Nil))
            val pendingSe = scala.collection.mutable.ArrayDeque.from(
              prev.map(_.pendingSe).getOrElse(Nil))
            val events = foldQueue(customerId, earned, pendingSe, sorted)
            val foldedThrough = math.max(
              prev.map(_.foldedThroughMicros).getOrElse(Long.MinValue),
              sorted.map(t => toMicros(t.timestamp)).max)
            state.update(EvictingQueue(earned.toSeq, pendingSe.toSeq, foldedThrough))
            // event-time idle timeout; clamped above the current watermark
            // (setTimeoutTimestamp rejects timestamps the watermark already
            // passed — a customer whose last row is older than the horizon
            // evicts at the next watermark advance)
            val lastMs = wmRows.map(_.wm_ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(lastMs + idleMs, state.getCurrentWatermarkMs + 1))
            events.map(m => QueueEvent(m.CUSTOMERID, m.EARNED_ID, m.REDEEMID,
              m.REDEEMER_TYPE, m.MATCHED_AT, "match", -1)).iterator
          }
      }
  }

  /** Replay through [[matchStreamEvicting]] and rebuild the full matched
    * ledger — the correctness gate proving the eviction/restore cycle is
    * lossless (driver gate: `streaming_evicted_match`, oracle = the batch
    * `fifo_match` SQL).
    *
    * The idle timeout is half a chunk span, so customers quiet for a chunk
    * evict mid-replay and customers that reappear later exercise the
    * restore; a far-future sentinel row (reserved customer, filtered from
    * the log) forms the final chunk so the last watermark advance flushes
    * pending timeouts — without it the file source never triggers the
    * batch in which they fire.
    *
    * Rebuild, per customer (all relational, no driver rows):
    *  1. never evicted → its stream matches stand as-is;
    *  2. evicted → matches at or before the FIRST eviction boundary stand
    *     (later stream output is provisional — folded from empty state);
    *     the first snapshot's queues + the batch table's rows strictly
    *     after the boundary re-fold through [[foldQueue]] in one
    *     cogroup pass, exactly the reference's "reprocess affected
    *     customers". Multiple evict/reappear cycles collapse to the first:
    *     later snapshots are derived from provisional state and are
    *     discarded with it.
    * Equivalence: pre-boundary stream fold ≡ batch fold of the prefix
    * (proven by `streaming_match`); the snapshot is exactly the fold state
    * at the boundary; the restore continues it over the suffix in event
    * order — so the union IS the batch fold of the full history. */
  def replayLedgerEvicting(txns: DataFrame, batches: Int = 6): DataFrame = {
    val src = txns
      .select("transaction_id", "customer_id", "amount", "timestamp", "transaction_type")
    // staged: the rebuild reads the sink's ~50 small part files three times
    // (first-eviction census, surviving matches, snapshot rows) — one scan
    // instead of three (round-16, guide §1.2/§6 small-file economics)
    val log = graft.RunHygiene.stage(replayEvictingLog(txns, batches))
    graft.operators.FifoMatcher.renameToSpec(txns)
      .join(evictingMatches(src, log), Seq("TRANS_ID"), "left")
      .select("TRANS_ID", "TCTYPE", "CREATEDAT", "CUSTOMERID", "AMOUNT", "REDEEMID")
  }

  /** The raw match-plus-snapshot log of an evicting replay (sentinel row
    * already filtered) — split out so the spec can assert evictions
    * actually fire, not just that the rebuilt ledger matches. */
  private[graft] def replayEvictingLog(txns: DataFrame, batches: Int): DataFrame = {
    import org.apache.spark.sql.functions.{lit, max => fmax, min => fmin}
    val spark = txns.sparkSession
    implicit val txEnc = Encoders.product[Tx]
    val src = txns
      .select("transaction_id", "customer_id", "amount", "timestamp", "transaction_type")
    // persisted HERE so the idle-horizon min/max below and stageChunks'
    // own range probe + partitioned write share one source scan
    // (stageChunks re-persists the same Dataset — a no-op — and drops the
    // cache when staging completes)
    src.persist()
    val mm = src.agg(fmin(col("timestamp")), fmax(col("timestamp"))).head()
    val (idle, sentinels) =
      if (mm.isNullAt(0)) (java.time.Duration.ofSeconds(1), Seq.empty[DataFrame])
      else {
        val lo = toMicros(mm.getAs[java.time.LocalDateTime](0))
        val hi = toMicros(mm.getAs[java.time.LocalDateTime](1))
        val chunkMicros = (hi - lo) / batches + 1
        val idle = java.time.Duration.of(math.max(1000L, chunkMicros / 2),
          java.time.temporal.ChronoUnit.MICROS)
        // one sentinel row past every possible timeout (last event + idle),
        // so the final batch's watermark flushes all pending evictions
        val sentinelTs = ofMicros(hi + 2 * (idle.toNanos / 1000L) + 1000000L)
        (idle, Seq(spark.createDataset(
          Seq(Tx(SentinelId, SentinelId, 0.0, sentinelTs, "earned"))).toDF()))
      }
    val dirs = FileReplay.stageChunks(src, "timestamp", batches, sentinels)
    val events = matchStreamEvicting(
      FileReplay.stream(spark, src.schema, dirs).as[Tx], idle)
    FileReplay.runToParquet(events.toDF(), dirs, statePartitions = FifoStateParts)
      .filter(col("CUSTOMERID") =!= lit(SentinelId))
  }

  /** The standing (TRANS_ID, REDEEMID) assignment from an evicting-matcher
    * log: surviving stream matches ∪ the batch re-fold of evicted
    * customers' snapshot + post-eviction rows (see [[replayLedgerEvicting]]
    * for the correctness argument). */
  private def evictingMatches(src: DataFrame, log: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{min => fmin}
    implicit val txEnc = Encoders.product[Tx]
    implicit val qEnc = Encoders.product[QueueEvent]
    implicit val mEnc = Encoders.product[MatchEvent]
    implicit val keyEnc = Encoders.STRING
    val evicts = log.filter(col("ACTION").startsWith("evict"))
    // the FIRST eviction per customer: everything the stream emitted after
    // it (matches AND later snapshots) is provisional and discarded
    val firstEvict = evicts.groupBy("CUSTOMERID")
      .agg(fmin(col("MATCHED_AT")).as("EVICTED_AT"))
    val valid = log.filter(col("ACTION") === "match")
      .join(firstEvict, Seq("CUSTOMERID"), "left")
      .filter(col("EVICTED_AT").isNull || col("MATCHED_AT") <= col("EVICTED_AT"))
      .select(col("EARNED_ID").as("TRANS_ID"), col("REDEEMID"))
    val snapshot = evicts.join(firstEvict, Seq("CUSTOMERID"))
      .filter(col("MATCHED_AT") === col("EVICTED_AT"))
      .select("CUSTOMERID", "EARNED_ID", "REDEEMID", "REDEEMER_TYPE",
        "MATCHED_AT", "ACTION", "POS")
    // rows strictly after the boundary: event-range chunking makes ties
    // impossible across it (the boundary is the customer's max folded ts)
    val post = src
      .join(firstEvict.withColumnRenamed("CUSTOMERID", "customer_id"),
        Seq("customer_id"))
      .filter(col("timestamp") > col("EVICTED_AT")).drop("EVICTED_AT")
    val restored = snapshot.as[QueueEvent].groupByKey(_.CUSTOMERID)
      .cogroup(post.as[Tx].groupByKey(_.customer_id)) { (cid, snapIt, rowIt) =>
        val rows = rowIt.toIndexedSeq
        if (rows.isEmpty) Iterator.empty // evicted, never reappeared
        else {
          val sn = snapIt.toIndexedSeq
          val earned = scala.collection.mutable.ArrayDeque.from(
            sn.filter(_.ACTION == "evict_earned").sortBy(_.POS).map(_.EARNED_ID))
          val pendingSe = scala.collection.mutable.ArrayDeque.from(
            sn.filter(_.ACTION == "evict_se").sortBy(_.POS)
              .map(e => (e.REDEEMID, e.REDEEMER_TYPE)))
          foldQueue(cid, earned, pendingSe, sortTx(rows)).iterator
        }
      }
    valid.union(restored.toDF()
      .select(col("EARNED_ID").as("TRANS_ID"), col("REDEEMID")))
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

  /** [[EventTimeState]] plus the eviction boundary: `foldedThroughMicros`
    * is the max event time this incarnation has folded — the cut point the
    * rebuild uses, exactly [[EvictingQueue]]'s role for the arrival-order
    * matcher. */
  case class EvictingEventState(
      rev: Int,
      earned: Seq[(Long, String)],
      se: Seq[(Long, String, String)],
      standing: Seq[(String, String, String, Long)],
      prunedThrough: Long,
      foldedThroughMicros: Long)

  /** [[matchStreamEventTime]] with BOUNDED state (round-12 verdict #3 —
    * the last NoTimeout matcher): a customer idle past `idle` (event time,
    * watermark-driven) has its pruned-suffix state SNAPSHOT to the
    * correction log as `evict_*` rows and removed; [[replayLedgerLateEvicting]]
    * restores reappeared customers in one relational cogroup from snapshot
    * + post-eviction rows.
    *
    * The lateness bound is MANDATORY here (it is what keeps the snapshot
    * suffix-sized), and `idle` must exceed it strictly: eviction fires only
    * once the watermark passes lastFolded + idle, and any later-admitted
    * row sits above watermark − lateness ≥ lastFolded + (idle − lateness)
    * — STRICTLY after the snapshot boundary. That strict event-time
    * separation is what makes the first-eviction cut airtight even though
    * this operator exists to absorb late data: pre-eviction corrections
    * carry MATCHED_AT ≤ boundary (pair times never exceed the fold
    * horizon), post-eviction provisional output carries MATCHED_AT >
    * boundary, and the first snapshot's entry rows (which carry their own
    * event times, ≤ boundary) separate from any later incarnation's (all
    * > boundary) by the same line.
    *
    * Snapshot encoding, all in the correction log's own schema:
    * `evict_earned`/`evict_se` carry the kept suffix entries at their own
    * event times (the (ts, id) sort key reconstructs queue order — no
    * position column needed), `evict_standing` the standing suffix pairs,
    * `evict_pruned` the point of no return, `evict_bound` the boundary;
    * all at the incarnation's REV, which the restore continues from so
    * re-fold corrections outrank every kept pre-eviction rev.
    *
    * Scale: state is O(events within the lateness window) × O(customers
    * active within the idle horizon) — both watermark trades, nothing
    * accretes with customers × time. */
  def matchStreamEventTimeEvicting(txns: Dataset[Tx],
      lateness: java.time.Duration,
      idle: java.time.Duration): Dataset[CorrectionEvent] = {
    require(idle.compareTo(lateness) > 0,
      s"idle ($idle) must strictly exceed the lateness bound ($lateness): " +
        "eviction may only fire once a customer's late window has fully " +
        "passed, else an admissible late row could land below the snapshot " +
        "boundary and the rebuild's cut would misclassify it")
    implicit val stateEnc = Encoders.product[EvictingEventState]
    implicit val outEnc = Encoders.product[CorrectionEvent]
    implicit val keyEnc = Encoders.STRING
    implicit val txWmEnc = Encoders.product[TxWm]
    val latenessMicros = lateness.toNanos / 1000L
    val idleMs = math.max(1L, idle.toMillis)

    txns.withColumn("wm_ts", col("timestamp").cast("timestamp")).as[TxWm]
      .withWatermark("wm_ts", s"$latenessMicros microseconds")
      .groupByKey(_.customer_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (customerId: String, rows: Iterator[TxWm], state: GroupState[EvictingEventState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            val out = Seq.newBuilder[CorrectionEvent]
            st.earned.foreach { case (ts, id) =>
              out += CorrectionEvent(customerId, id, "", "", ofMicros(ts),
                "evict_earned", st.rev)
            }
            st.se.foreach { case (ts, id, typ) =>
              out += CorrectionEvent(customerId, "", id, typ, ofMicros(ts),
                "evict_se", st.rev)
            }
            st.standing.foreach { case (eid, sid, styp, at) =>
              out += CorrectionEvent(customerId, eid, sid, styp, ofMicros(at),
                "evict_standing", st.rev)
            }
            if (st.prunedThrough > Long.MinValue)
              out += CorrectionEvent(customerId, "", "", "",
                ofMicros(st.prunedThrough), "evict_pruned", st.rev)
            out += CorrectionEvent(customerId, "", "", "",
              ofMicros(st.foldedThroughMicros), "evict_bound", st.rev)
            state.remove()
            out.result().iterator
          } else {
            val wmRows = rows.toIndexedSeq
            val txs = wmRows.map(w =>
              Tx(w.transaction_id, w.customer_id, w.amount, w.timestamp,
                w.transaction_type))
            val prev = state.getOption
            val inner = prev
              .map(p => EventTimeState(p.rev, p.earned, p.se, p.standing, p.prunedThrough))
              .getOrElse(EventTimeState(0, Nil, Nil, Nil, Long.MinValue))
            val (next, events) =
              foldEventTimeBatch(customerId, inner, txs, Some(latenessMicros))
            val foldedThrough = math.max(
              prev.map(_.foldedThroughMicros).getOrElse(Long.MinValue),
              txs.map(t => toMicros(t.timestamp)).max)
            state.update(EvictingEventState(next.rev, next.earned, next.se,
              next.standing, next.prunedThrough, foldedThrough))
            val lastMs = wmRows.map(_.wm_ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(lastMs + idleMs, state.getCurrentWatermarkMs + 1))
            events.iterator
          }
      }
  }

  /** Replay the DELAYED-rows harness through [[matchStreamEventTimeEvicting]]
    * and rebuild the full ledger — the gate proving late-data correction
    * and idle-customer eviction compose losslessly (driver gate:
    * `streaming_evicted_late_match`, oracle = the batch `fifo_match` SQL).
    *
    * Parameters: lateness = one chunk span + margin (admits every delayed
    * row, zero `drop_late` by construction), idle = two chunk spans
    * (strictly exceeds lateness; customers quiet for two chunks evict
    * mid-replay and reappearing delayed rows exercise the restore); a
    * far-future sentinel row flushes pending timeouts. Timing gives the
    * strict separation the operator requires even without relying on the
    * engine's own late-row filtering: a row arriving after its customer's
    * eviction sits at least one full chunk above the snapshot boundary
    * (eviction needed the watermark ≥ boundary + idle; the arrival batch's
    * rows sit within lateness of that watermark).
    *
    * Rebuild, per customer — [[replayLedgerEvicting]]'s protocol on the
    * correction log: (1) never evicted → corrections stand; (2) evicted →
    * corrections at or before the FIRST boundary stand (pruned pairs'
    * final adds included — they left state before the snapshot), the first
    * snapshot re-folds with rows strictly after the boundary through
    * [[foldEventTimeBatch]] at REV snapshot+1 (outranking every kept
    * pre-eviction correction per earned id), and post-eviction provisional
    * output is discarded by the boundary cut. */
  def replayLedgerLateEvicting(txns: DataFrame, batches: Int = 6): DataFrame = {
    val src = txns
      .select("transaction_id", "customer_id", "amount", "timestamp", "transaction_type")
    // staged for the rebuild's three sink scans — see replayLedgerEvicting
    val log = graft.RunHygiene.stage(replayLateEvictingLog(txns, batches))
    graft.operators.FifoMatcher.renameToSpec(txns)
      .join(eventTimeEvictedMatches(src, log), Seq("TRANS_ID"), "left")
      .select("TRANS_ID", "TCTYPE", "CREATEDAT", "CUSTOMERID", "AMOUNT", "REDEEMID")
  }

  /** The raw correction-plus-snapshot log of a delayed evicting replay
    * (sentinel filtered) — split out so the spec can assert evictions and
    * restores actually fire, not just that the rebuilt ledger matches. */
  private[graft] def replayLateEvictingLog(txns: DataFrame, batches: Int): DataFrame = {
    import org.apache.spark.sql.functions.{lit, max => fmax, min => fmin}
    val spark = txns.sparkSession
    implicit val txEnc = Encoders.product[Tx]
    val src = txns
      .select("transaction_id", "customer_id", "amount", "timestamp", "transaction_type")
    // one source scan for the horizon probe + staging — see replayEvictingLog
    src.persist()
    val mm = src.agg(fmin(col("timestamp")), fmax(col("timestamp"))).head()
    val (lateness, idle, sentinels) =
      if (mm.isNullAt(0))
        (java.time.Duration.ofSeconds(1), java.time.Duration.ofSeconds(2),
          Seq.empty[DataFrame])
      else {
        val lo = toMicros(mm.getAs[java.time.LocalDateTime](0))
        val hi = toMicros(mm.getAs[java.time.LocalDateTime](1))
        val chunk = (hi - lo) / batches + 2 // ⌈span/batches⌉ + 1 µs margin
        val lateness = java.time.Duration.of(chunk,
          java.time.temporal.ChronoUnit.MICROS)
        val idle = java.time.Duration.of(chunk * 2,
          java.time.temporal.ChronoUnit.MICROS)
        // past every possible timeout (last event + idle) plus the
        // watermark delay (lateness), so the final watermark advance
        // flushes all pending evictions
        val sentinelTs = ofMicros(hi + chunk * 4 + 2000000L)
        (lateness, idle, Seq(spark.createDataset(
          Seq(Tx(SentinelId, SentinelId, 0.0, sentinelTs, "earned"))).toDF()))
      }
    val dirs = FileReplay.stageChunksDelayed(src, "timestamp", batches,
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(col("transaction_id")),
        org.apache.spark.sql.functions.lit(4)) === 0 &&
        col("transaction_type") === "earned",
      sentinels)
    val events = matchStreamEventTimeEvicting(
      FileReplay.stream(spark, src.schema, dirs).as[Tx], lateness, idle)
    FileReplay.runToParquet(events.toDF(), dirs, statePartitions = FifoStateParts)
      .filter(col("CUSTOMERID") =!= lit(SentinelId))
  }

  /** The standing (TRANS_ID, REDEEMID) assignment from an evicting
    * event-time log: kept pre-boundary corrections ∪ the snapshot re-fold
    * of reappeared customers (see [[replayLedgerLateEvicting]] for the
    * correctness argument). */
  private def eventTimeEvictedMatches(src: DataFrame, log: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{min => fmin}
    implicit val txEnc = Encoders.product[Tx]
    implicit val ceEnc = Encoders.product[CorrectionEvent]
    implicit val keyEnc = Encoders.STRING
    val firstEvict = log.filter(col("ACTION") === "evict_bound")
      .groupBy("CUSTOMERID").agg(fmin(col("MATCHED_AT")).as("EVICTED_AT"))
    val corrections = log.filter(col("ACTION").isin("add", "retract"))
      .join(firstEvict, Seq("CUSTOMERID"), "left")
      .filter(col("EVICTED_AT").isNull || col("MATCHED_AT") <= col("EVICTED_AT"))
      .drop("EVICTED_AT")
    // the FIRST snapshot's rows: every entry/standing/pruned/bound row of
    // the first incarnation sits at or below the boundary; every later
    // incarnation's sits strictly above it (post rows only)
    val snapshot = log.filter(col("ACTION").startsWith("evict"))
      .join(firstEvict, Seq("CUSTOMERID"))
      .filter(col("MATCHED_AT") <= col("EVICTED_AT"))
      .drop("EVICTED_AT")
    val post = src
      .join(firstEvict.withColumnRenamed("CUSTOMERID", "customer_id"),
        Seq("customer_id"))
      .filter(col("timestamp") > col("EVICTED_AT")).drop("EVICTED_AT")
    val logCols = log.columns
    val refold = snapshot.as[CorrectionEvent].groupByKey(_.CUSTOMERID)
      .cogroup(post.as[Tx].groupByKey(_.customer_id)) { (cid, snapIt, rowIt) =>
        val rows = rowIt.toIndexedSeq
        if (rows.isEmpty) Iterator.empty // evicted, never reappeared
        else {
          val sn = snapIt.toIndexedSeq
          val earned = sn.filter(_.ACTION == "evict_earned")
            .map(e => (toMicros(e.MATCHED_AT), e.EARNED_ID)).sortBy(identity)
          val se = sn.filter(_.ACTION == "evict_se")
            .map(e => (toMicros(e.MATCHED_AT), e.REDEEMID, e.REDEEMER_TYPE))
            .sortBy(s => (s._1, s._2))
          val standing = sn.filter(_.ACTION == "evict_standing")
            .map(e => (e.EARNED_ID, e.REDEEMID, e.REDEEMER_TYPE,
              toMicros(e.MATCHED_AT)))
          val pruned = sn.filter(_.ACTION == "evict_pruned")
            .map(e => toMicros(e.MATCHED_AT))
            .foldLeft(Long.MinValue)(math.max)
          val rev = sn.map(_.REV).max
          val st = EventTimeState(rev, earned, se, standing, pruned)
          // no lateness bound in the batch re-fold: the ≤ prunedThrough
          // drop check still applies via the restored state
          foldEventTimeBatch(cid, st, sortTx(rows), None)._2.iterator
        }
      }
    standingMatches(corrections.unionByName(
      refold.toDF().select(logCols.map(col): _*)))
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
    FileReplay.runToParquet(events.toDF(), dirs, statePartitions = FifoStateParts)
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
    val log = FileReplay.runToParquet(events.toDF(), dirs, statePartitions = FifoStateParts)
      .select(col("EARNED_ID").as("TRANS_ID"), col("REDEEMID"))
    graft.operators.FifoMatcher.renameToSpec(txns)
      .join(log, Seq("TRANS_ID"), "left")
      .select("TRANS_ID", "TCTYPE", "CREATEDAT", "CUSTOMERID", "AMOUNT", "REDEEMID")
  }
}
