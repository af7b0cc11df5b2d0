package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental (delta) FIFO matching — the batch form of the reference's
  * deferred daily-processing design (reference: README.md:184-219:
  * "process only deltas, reprocess affected customers, merge").
  *
  * State between runs is the **open-earned table**: earned transactions not
  * yet redeemed, with their original CREATEDAT (per customer this IS the
  * FIFO queue). Each delta run:
  *
  *   1. unions open earned (older by the append-only contract) with the
  *      batch's new earned, ranks per customer by (CREATEDAT, TRANS_ID);
  *   2. ranks the batch's spent/expired the same way;
  *   3. rank-equality join = the FIFO match (SURVEY §2.8 equivalence);
  *   4. matched earned → emitted matches; unmatched earned → next state.
  *
  * Append-only contract: a batch's transactions must not predate prior
  * batches (same assumption the reference's design makes; out-of-order
  * history would need re-matching affected customers — see StreamingFifo's
  * Scaladoc for why).
  *
  * Equivalence to a full rebuild under that contract is property-tested in
  * IncrementalMatcherSpec. Both inputs/outputs are plain DataFrames, so the
  * state table parquets between runs exactly like the other staging
  * boundaries.
  */
object IncrementalMatcher {

  /** Open-transaction state schema — BOTH sides of the match:
    * `customer_id, transaction_id, timestamp, amount, transaction_type`.
    *
    * Carrying unmatched spent/expired is load-bearing: the reference's queue
    * is initialized with the customer's FULL earned list, so a spent
    * processed "before" an earned that is merely later-dated still matches
    * it (k-th se ↔ k-th earned, dates never compared). Incrementally that
    * means an se with an empty earned pool must wait in state for a future
    * batch's earned — the property test caught exactly this. */
  def emptyState(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("customer_id", StringType),
        StructField("transaction_id", StringType),
        StructField("timestamp", TimestampNTZType),
        StructField("amount", DoubleType),
        StructField("transaction_type", StringType))))
  }

  /** One delta run.
    * @param openState prior state (emptyState for the first run)
    * @param batch     new canonical transactions
    * @return (matches, newOpenState) — matches carry
    *         (customer_id, earned_id, redeem_id, redeemer_type) */
  def matchDelta(openState: DataFrame, batch: DataFrame): (DataFrame, DataFrame) = {
    val w = Window.partitionBy("customer_id").orderBy("timestamp", "transaction_id")
    val cols = Seq("customer_id", "transaction_id", "timestamp", "amount", "transaction_type")

    // append-only contract ⇒ state rows are older than batch rows, so a
    // plain (timestamp, id) rank over the union reproduces global order
    val pool = openState.unionByName(batch.select(cols.map(col): _*))
    val earnedPool = pool.filter(col("transaction_type") === "earned")
      .withColumn("rk", row_number().over(w))
    val sePool = pool.filter(col("transaction_type").isin("spent", "expired"))
      .withColumn("rk", row_number().over(w))

    val joined = earnedPool.join(
      sePool.select(col("customer_id"), col("rk"),
        col("transaction_id").as("redeem_id"),
        col("transaction_type").as("redeemer_type")),
      Seq("customer_id", "rk"), "full")

    val matches = joined
      .filter(col("redeem_id").isNotNull && col("transaction_id").isNotNull)
      .select(col("customer_id"), col("transaction_id").as("earned_id"),
        col("redeem_id"), col("redeemer_type"))

    // leftovers of BOTH sides are the next state
    val leftEarned = joined.filter(col("redeem_id").isNull && col("transaction_id").isNotNull)
      .select(cols.map(col): _*)
    val leftSe = sePool.join(
        earnedPool.select(col("customer_id"), col("rk")), Seq("customer_id", "rk"), "left_anti")
      .select(cols.map(col): _*)

    (matches, leftEarned.unionByName(leftSe))
  }

  /** Correctness-gate harness: split the canonical transactions at the
    * midpoint timestamp, run two [[matchDelta]] passes (state parqueted
    * in-session via persist), and rebuild the full matched ledger in the
    * fifo_match output shape. Under the append-only contract the result
    * must equal a single full [[FifoMatcher.matchTransactions]] run — the
    * gated oracle IS the fifo_match SQL. */
  def twoBatchLedger(txns: DataFrame): DataFrame = {
    val cols = Seq("customer_id", "transaction_id", "timestamp", "amount", "transaction_type")
    val t = txns.select(cols.map(col): _*)
    val mm = t.agg(min("timestamp"), max("timestamp")).collect()(0)
    val (lo, hi) = (mm.getAs[java.time.LocalDateTime](0), mm.getAs[java.time.LocalDateTime](1))
    val pivot = lo.plusSeconds(java.time.Duration.between(lo, hi).toSeconds / 2)
    val (m1, s1raw) = matchDelta(emptyState(txns.sparkSession), t.filter(col("timestamp") < lit(pivot)))
    val s1 = graft.RunHygiene.stage(s1raw)
    val (m2, _) = matchDelta(s1, t.filter(col("timestamp") >= lit(pivot)))
    val matches = m1.unionByName(m2)
      .select(col("earned_id").as("TRANS_ID"), col("redeem_id").as("REDEEMID"))
    FifoMatcher.renameToSpec(t).join(matches, Seq("TRANS_ID"), "left")
      .select("TRANS_ID", "TCTYPE", "CREATEDAT", "CUSTOMERID", "AMOUNT", "REDEEMID")
  }
}
