package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.{BalanceAnalytics, FifoMatcher, Validators}

/** Balance analytics + validators over the documented walkthrough fixture
  * (reference: doc/FIFO_MATCHING_FLOW.md:84-148). */
class BalanceAnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val matched = FifoMatcher.matchTransactions(tx(
    ("E001", "C001", 100.0, "2024-01-01", "earned"),
    ("E002", "C001", 50.0, "2024-01-02", "earned"),
    ("E003", "C001", 75.0, "2024-01-03", "earned"),
    ("S001", "C001", -80.0, "2024-01-05", "spent"),
    ("S002", "C001", -40.0, "2024-01-06", "spent"),
    ("X001", "C001", -30.0, "2024-06-01", "expired")))

  test("balance history accumulates per type in order") {
    val h = BalanceAnalytics.balanceHistory(matched)
      .orderBy("transaction_date", "transaction_id").collect()
    assert(h.length === 6)
    val last = h.last
    assert(last.getAs[Double]("cumulative_earned") === 225.0)
    assert(last.getAs[Double]("cumulative_spent") === 120.0)
    assert(last.getAs[Double]("cumulative_expired") === 30.0)
    assert(last.getAs[Double]("current_balance") === 75.0)
    // after S001: all three earned (225) accumulated, spent 80 → 145
    val afterS001 = h(3)
    assert(afterS001.getAs[String]("transaction_id") === "S001")
    assert(afterS001.getAs[Double]("current_balance") === 145.0)
  }

  test("current balances take the last row per customer") {
    val cur = BalanceAnalytics.currentBalances(BalanceAnalytics.balanceHistory(matched)).collect()
    assert(cur.length === 1)
    assert(cur.head.getAs[Double]("current_balance") === 75.0)
  }

  test("report summary unifies the reference's mismatched alert keys") {
    val cur = BalanceAnalytics.currentBalances(BalanceAnalytics.balanceHistory(matched))
    val r = BalanceAnalytics.reportSummary(matched, cur).collect().head
    assert(r.getAs[Long]("total_transactions") === 6L)
    assert(r.getAs[Long]("matching_records_count") === 3L)
    assert(r.getAs[Long]("total_customers") === 1L)
    assert(r.getAs[Long]("customers_with_positive_balance") === 1L)
    assert(r.getAs[Double]("total_earned") === 225.0)
  }

  test("balance equation flags amount-mismatched matches (faithful V8)") {
    // earned 225 vs spent 120 + expired 30 + remaining 0 → discrepancy 75
    val eq = Validators.balanceEquation(matched).collect().head
    assert(eq.getAs[Double]("discrepancy") === 75.0)
    assert(!eq.getAs[Boolean]("balanced"))
  }

  test("referential integrity and chronology pass on well-formed output") {
    assert(Validators.invalidRedeemIds(matched).count() === 0)
    // X001 redeems E003 (earned 01-03 < expired 06-01): no violation
    assert(Validators.chronologyViolations(matched).count() === 0)
    assert(Validators.duplicatePairs(matched).count() === 0)
  }

  test("chronology violation detected in strict mode") {
    val m = FifoMatcher.matchTransactions(tx(
      ("S001", "C001", -50.0, "2024-01-01", "spent"),
      ("E001", "C001", 100.0, "2024-01-05", "earned")))
    val v = Validators.chronologyViolations(m).collect()
    assert(v.length === 1)
    assert(v.head.getAs[String]("earned_id") === "E001")
  }

  test("required-fields check names missing columns") {
    val full = tx(("T1", "C1", 1.0, "2024-01-01", "earned"))
    assert(Validators.missingRequiredFields(full) === Seq.empty)
    assert(Validators.missingRequiredFields(full.drop("amount", "timestamp")) ===
      Seq("amount", "timestamp"))
  }

  test("source quality counts nulls and bad enums") {
    val dirty = tx(
      ("T1", "C1", 10.0, "2024-01-01", "earned"),
      ("T2", "C1", -5.0, "2024-01-02", "refunded"), // invalid type
      ("T3", "C1", 3.0, "2024-01-03", "spent"))
      .withColumn("customer_id",
        org.apache.spark.sql.functions.when(col("transaction_id") === "T3", null)
          .otherwise(col("customer_id")))
    val q = Validators.sourceQuality(dirty).collect().head
    assert(q.getAs[Long]("row_count") === 3L)
    assert(q.getAs[Long]("null_customer_id") === 1L)
    assert(q.getAs[Long]("invalid_type_count") === 1L)
    assert(q.getAs[Long]("non_numeric_amount") === 0L)
  }
}
