package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
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

  case class CustomerQueue(availableEarned: Seq[String])

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
          var queue = state.getOption.map(_.availableEarned.toList).getOrElse(Nil)
          val events = Seq.newBuilder[MatchEvent]
          sorted.foreach { t =>
            t.transaction_type match {
              case "earned" => queue = queue :+ t.transaction_id
              case "spent" | "expired" =>
                queue match {
                  case oldest :: rest =>
                    events += MatchEvent(customerId, oldest, t.transaction_id,
                      t.transaction_type, t.timestamp)
                    queue = rest
                  case Nil => // no balance available — spent stays unmatched
                }
              case _ => // invalid types are the validation layer's concern
            }
          }
          state.update(CustomerQueue(queue))
          events.result().iterator
      }
  }
}
