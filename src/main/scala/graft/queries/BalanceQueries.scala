package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** The reference's 12-query analytic corpus
  * (reference: src/sample_queries.sql:1-319), as DataFrame builders over
  * `customer_balance_history` / `customer_current_balances`.
  *
  * Every query carries a fully deterministic total order (the reference's
  * bare `ORDER BY transaction_date DESC` is tie-broken with transaction_id)
  * so results are reproducible across engines and runs.
  *
  * The dominant idiom — "latest row per customer on/before a date" — is a
  * ranking window after a pushed-down date filter; at scale the `<= date`
  * predicate reaches the parquet scan and the window shuffles once on
  * customer_id.
  */
object BalanceQueries {

  private def ts(lit0: String) = lit(lit0).cast(TimestampNTZType)

  private val wLatest = Window.partitionBy("customer_id")
    .orderBy(col("transaction_date").desc, col("transaction_id").desc)

  /** Q1 (reference: src/sample_queries.sql:10-29): balance for specific
    * customers as of a date. */
  def q1BalanceAsOf(history: DataFrame, customers: Seq[String], asOf: String): DataFrame =
    history
      .filter(col("customer_id").isin(customers: _*) && col("transaction_date") <= ts(asOf))
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1)
      .select(col("customer_id"),
        col("transaction_date").as("balance_as_of_date"),
        col("current_balance").as("thrive_cash_balance"))
      .orderBy("customer_id")

  /** Q2 (:49-57): current balance for specific customers. */
  def q2CurrentBalance(current: DataFrame, customers: Seq[String]): DataFrame =
    current
      .filter(col("customer_id").isin(customers: _*))
      .select(col("customer_id"), col("current_balance").as("thrive_cash_balance"),
        col("cumulative_earned"), col("cumulative_spent"), col("cumulative_expired"))
      .orderBy("customer_id")

  /** Q3 (:65-77): complete balance history for one customer. */
  def q3History(history: DataFrame, customer: String): DataFrame =
    history.filter(col("customer_id") === customer)
      .orderBy("transaction_date", "transaction_id")

  /** Q4 (:85-105): month-end balance per month for one customer. */
  def q4MonthEnd(history: DataFrame, customer: String): DataFrame = {
    val w = Window
      .partitionBy(col("customer_id"), date_trunc("month", col("transaction_date")))
      .orderBy(col("transaction_date").desc, col("transaction_id").desc)
    history.filter(col("customer_id") === customer)
      .withColumn("month", date_trunc("month", col("transaction_date")).cast(TimestampNTZType))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("customer_id"), col("month"),
        col("transaction_date").as("last_transaction_date"),
        col("current_balance").as("month_end_balance"))
      .orderBy("month")

  }

  /** Q5 (:113-132): customers with balance above threshold on a date. */
  def q5AboveThreshold(history: DataFrame, asOf: String, threshold: Double): DataFrame =
    history.filter(col("transaction_date") <= ts(asOf))
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1 && col("current_balance") > threshold)
      .select(col("customer_id"),
        col("transaction_date").as("balance_as_of_date"), col("current_balance"))
      .orderBy(col("current_balance").desc, col("customer_id"))

  /** Q6 (:140-167): balance change between two dates for one customer —
    * two as-of scalar aggregates joined on the key. */
  def q6BalanceChange(history: DataFrame, customer: String, start: String, end: String): DataFrame = {
    def asOf(d: String, alias: String) =
      history.filter(col("customer_id") === customer && col("transaction_date") <= ts(d))
        .withColumn("rn", row_number().over(wLatest))
        .filter(col("rn") === 1)
        .select(col("customer_id"), col("current_balance").as(alias))
    asOf(start, "start_balance")
      .join(asOf(end, "end_balance"), Seq("customer_id"))
      .withColumn("balance_change", col("end_balance") - col("start_balance"))
      .withColumn("pct_change",
        round(col("balance_change") / nullif(col("start_balance"), lit(0.0)) * 100, 2))
  }

  /** Q7 (:175-200): top-10 customers by balance on a date. */
  def q7TopBalances(history: DataFrame, asOf: String, k: Int = 10): DataFrame =
    history.filter(col("transaction_date") <= ts(asOf))
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1)
      .select(col("customer_id"), col("transaction_date").as("balance_as_of_date"),
        col("current_balance"), col("cumulative_earned"),
        col("cumulative_spent"), col("cumulative_expired"))
      .orderBy(col("current_balance").desc, col("customer_id"))
      .limit(k)

  /** Q8 (:208-227): customers with exactly zero balance on a date. */
  def q8ZeroBalance(history: DataFrame, asOf: String): DataFrame =
    history.filter(col("transaction_date") <= ts(asOf))
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1 && col("current_balance") === 0.0)
      .select(col("customer_id"), col("transaction_date").as("balance_as_of_date"),
        col("current_balance"))
      .orderBy("customer_id")

  /** Q9 (:235-253): balance distribution stats across customers on a date. */
  def q9BalanceStats(history: DataFrame, asOf: String): DataFrame =
    history.filter(col("transaction_date") <= ts(asOf))
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1)
      .agg(
        countDistinct(col("customer_id")).as("total_customers"),
        round(avg(col("current_balance")), 2).as("avg_balance"),
        round(min(col("current_balance")), 2).as("min_balance"),
        round(max(col("current_balance")), 2).as("max_balance"),
        round(sum(col("current_balance")), 2).as("total_balance"))

  /** Q10 (:261-271): transactions on a specific day for one customer. */
  def q10DayTransactions(history: DataFrame, customer: String, day: String): DataFrame =
    history.filter(col("customer_id") === customer && to_date(col("transaction_date")) === lit(day).cast("date"))
      .select(col("customer_id"), col("transaction_date"), col("transaction_id"),
        col("transaction_type"), col("transaction_amount"),
        col("current_balance").as("balance_after_transaction"))
      .orderBy("transaction_date", "transaction_id")

  /** Q11 (:279-301): daily balance snapshots for one customer in a range. */
  def q11DailySnapshots(history: DataFrame, customer: String, from: String, until: String): DataFrame = {
    val w = Window.partitionBy(col("customer_id"), to_date(col("transaction_date")))
      .orderBy(col("transaction_date").desc, col("transaction_id").desc)
    history
      .filter(col("customer_id") === customer &&
        col("transaction_date") >= ts(from) && col("transaction_date") < ts(until))
      // midnight NTZ rather than DATE: date-typed parquet round-trips
      // differently across readers (object vs datetime64), timestamps don't
      .withColumn("date", to_date(col("transaction_date")).cast(TimestampNTZType))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("customer_id"), col("date"),
        col("transaction_date").as("last_transaction_time"), col("current_balance"))
      .orderBy("date")
  }

  /** Q12 (:309-319): customers who earned but never spent nor expired. */
  def q12NeverSpent(current: DataFrame): DataFrame =
    current.filter(col("cumulative_spent") === 0.0 &&
        col("cumulative_expired") === 0.0 && col("cumulative_earned") > 0.0)
      .select("customer_id", "current_balance", "cumulative_earned",
        "cumulative_spent", "cumulative_expired")
      .orderBy(col("cumulative_earned").desc, col("customer_id"))
}
