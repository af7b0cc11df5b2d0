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
          var earned = state.getOption.map(_.availableEarned.toList).getOrElse(Nil)
          var pendingSe = state.getOption.map(_.pendingSe.toList).getOrElse(Nil)
          val events = Seq.newBuilder[MatchEvent]
          sorted.foreach { t =>
            t.transaction_type match {
              case "earned" =>
                pendingSe match {
                  case (seId, seType) :: rest =>
                    // an older se was waiting for balance — this earned redeems it
                    events += MatchEvent(customerId, t.transaction_id, seId, seType, t.timestamp)
                    pendingSe = rest
                  case Nil => earned = earned :+ t.transaction_id
                }
              case "spent" | "expired" =>
                earned match {
                  case oldest :: rest =>
                    events += MatchEvent(customerId, oldest, t.transaction_id,
                      t.transaction_type, t.timestamp)
                    earned = rest
                  case Nil =>
                    // no balance yet — waits for a future earned (batch parity:
                    // the k-th se always matches the k-th earned, dates ignored)
                    pendingSe = pendingSe :+ ((t.transaction_id, t.transaction_type))
                }
              case _ => // invalid types are the validation layer's concern
            }
          }
          state.update(CustomerQueue(earned, pendingSe))
          events.result().iterator
      }
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
