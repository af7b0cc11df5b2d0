package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.OracleSql.Params

/** The analytic corpus as Spark SQL strings — the reference's
  * `src/sample_queries.sql` adapted (near-)verbatim and run through
  * Catalyst over temp views, exactly how its finance users consume it
  * (SURVEY §3.3). Every query also has a DataFrame twin in
  * [[BalanceQueries]]; SqlParitySpec proves the two produce identical rows.
  *
  * Adaptations from the reference text: parameter literals, explicit
  * `transaction_id` tie-breaks on every `ORDER BY ... DESC` rank (the
  * reference's bare sort is nondeterministic on timestamp ties), and
  * TIMESTAMP_NTZ casts so literals match the column type under any session
  * timezone. */
object BalanceQueriesSql {

  /** Register the pipeline outputs under the reference's table names. */
  def registerViews(history: DataFrame, current: DataFrame): Unit = {
    history.createOrReplaceTempView("customer_balance_history")
    current.createOrReplaceTempView("customer_current_balances")
  }

  private def ntz(l: String) = s"CAST('$l' AS TIMESTAMP_NTZ)"

  /** name → SQL, same keys as SparkEntry's q01..q12. */
  val sql: Map[String, String] = Map(
    // reference: src/sample_queries.sql:10-29
    "q01_balance_asof" -> s"""
      WITH ranked_balances AS (
        SELECT customer_id, transaction_date, current_balance,
               ROW_NUMBER() OVER (PARTITION BY customer_id
                                  ORDER BY transaction_date DESC, transaction_id DESC) AS rn
        FROM customer_balance_history
        WHERE customer_id IN ('${Params.CustA}', '${Params.CustB}')
          AND transaction_date <= ${ntz(Params.AsOf)}
      )
      SELECT customer_id, transaction_date AS balance_as_of_date,
             current_balance AS thrive_cash_balance
      FROM ranked_balances WHERE rn = 1 ORDER BY customer_id""",

    // reference :49-57
    "q02_current_balance" -> s"""
      SELECT customer_id, current_balance AS thrive_cash_balance,
             cumulative_earned, cumulative_spent, cumulative_expired
      FROM customer_current_balances
      WHERE customer_id IN ('${Params.CustA}', '${Params.CustB}')
      ORDER BY customer_id""",

    // reference :65-77
    "q03_history" -> s"""
      SELECT customer_id, transaction_date, transaction_id, transaction_type,
             transaction_amount, cumulative_earned, cumulative_spent,
             cumulative_expired, current_balance
      FROM customer_balance_history
      WHERE customer_id = '${Params.CustA}'
      ORDER BY transaction_date, transaction_id""",

    // reference :85-105
    "q04_month_end" -> s"""
      WITH monthly_balances AS (
        SELECT customer_id,
               CAST(DATE_TRUNC('month', transaction_date) AS TIMESTAMP_NTZ) AS month,
               transaction_date, current_balance,
               ROW_NUMBER() OVER (PARTITION BY customer_id, DATE_TRUNC('month', transaction_date)
                                  ORDER BY transaction_date DESC, transaction_id DESC) AS rn
        FROM customer_balance_history
        WHERE customer_id = '${Params.CustA}'
      )
      SELECT customer_id, month, transaction_date AS last_transaction_date,
             current_balance AS month_end_balance
      FROM monthly_balances WHERE rn = 1 ORDER BY month""",

    // reference :113-132
    "q05_above_threshold" -> s"""
      WITH balances_on_date AS (
        SELECT customer_id, transaction_date, current_balance,
               ROW_NUMBER() OVER (PARTITION BY customer_id
                                  ORDER BY transaction_date DESC, transaction_id DESC) AS rn
        FROM customer_balance_history
        WHERE transaction_date <= ${ntz(Params.AsOf)}
      )
      SELECT customer_id, transaction_date AS balance_as_of_date, current_balance
      FROM balances_on_date WHERE rn = 1 AND current_balance > ${Params.Threshold}
      ORDER BY current_balance DESC, customer_id""",

    // reference :140-167
    "q06_balance_change" -> s"""
      WITH balance_start AS (
        SELECT customer_id, current_balance AS start_balance
        FROM (SELECT customer_id, current_balance,
                     ROW_NUMBER() OVER (PARTITION BY customer_id
                                        ORDER BY transaction_date DESC, transaction_id DESC) AS rn
              FROM customer_balance_history
              WHERE customer_id = '${Params.CustA}'
                AND transaction_date <= ${ntz(Params.Start)})
        WHERE rn = 1
      ),
      balance_end AS (
        SELECT customer_id, current_balance AS end_balance
        FROM (SELECT customer_id, current_balance,
                     ROW_NUMBER() OVER (PARTITION BY customer_id
                                        ORDER BY transaction_date DESC, transaction_id DESC) AS rn
              FROM customer_balance_history
              WHERE customer_id = '${Params.CustA}'
                AND transaction_date <= ${ntz(Params.End)})
        WHERE rn = 1
      )
      SELECT bs.customer_id, bs.start_balance, be.end_balance,
             (be.end_balance - bs.start_balance) AS balance_change,
             ROUND((be.end_balance - bs.start_balance) / NULLIF(bs.start_balance, 0) * 100, 2) AS pct_change
      FROM balance_start bs JOIN balance_end be ON bs.customer_id = be.customer_id""",

    // reference :175-200
    "q07_top_balances" -> s"""
      WITH balances_on_date AS (
        SELECT customer_id, transaction_date, current_balance, cumulative_earned,
               cumulative_spent, cumulative_expired,
               ROW_NUMBER() OVER (PARTITION BY customer_id
                                  ORDER BY transaction_date DESC, transaction_id DESC) AS rn
        FROM customer_balance_history
        WHERE transaction_date <= ${ntz(Params.AsOf)}
      )
      SELECT customer_id, transaction_date AS balance_as_of_date, current_balance,
             cumulative_earned, cumulative_spent, cumulative_expired
      FROM balances_on_date WHERE rn = 1
      ORDER BY current_balance DESC, customer_id LIMIT 10""",

    // reference :208-227
    "q08_zero_balance" -> s"""
      WITH balances_on_date AS (
        SELECT customer_id, transaction_date, current_balance,
               ROW_NUMBER() OVER (PARTITION BY customer_id
                                  ORDER BY transaction_date DESC, transaction_id DESC) AS rn
        FROM customer_balance_history
        WHERE transaction_date <= ${ntz(Params.AsOf)}
      )
      SELECT customer_id, transaction_date AS balance_as_of_date, current_balance
      FROM balances_on_date WHERE rn = 1 AND current_balance = 0
      ORDER BY customer_id""",

    // reference :235-253
    "q09_balance_stats" -> s"""
      WITH balances_on_date AS (
        SELECT customer_id, current_balance,
               ROW_NUMBER() OVER (PARTITION BY customer_id
                                  ORDER BY transaction_date DESC, transaction_id DESC) AS rn
        FROM customer_balance_history
        WHERE transaction_date <= ${ntz(Params.AsOf)}
      )
      SELECT COUNT(DISTINCT customer_id) AS total_customers,
             ROUND(AVG(current_balance), 2) AS avg_balance,
             ROUND(MIN(current_balance), 2) AS min_balance,
             ROUND(MAX(current_balance), 2) AS max_balance,
             ROUND(SUM(current_balance), 2) AS total_balance
      FROM balances_on_date WHERE rn = 1""",

    // reference :261-271
    "q10_day_transactions" -> s"""
      SELECT customer_id, transaction_date, transaction_id, transaction_type,
             transaction_amount, current_balance AS balance_after_transaction
      FROM customer_balance_history
      WHERE customer_id = '${Params.CustA}'
        AND DATE(transaction_date) = DATE '${Params.Day}'
      ORDER BY transaction_date, transaction_id""",

    // reference :279-301
    "q11_daily_snapshots" -> s"""
      WITH daily_balances AS (
        SELECT customer_id,
               CAST(DATE(transaction_date) AS TIMESTAMP_NTZ) AS date,
               transaction_date, current_balance,
               ROW_NUMBER() OVER (PARTITION BY customer_id, DATE(transaction_date)
                                  ORDER BY transaction_date DESC, transaction_id DESC) AS rn
        FROM customer_balance_history
        WHERE customer_id = '${Params.CustA}'
          AND transaction_date >= ${ntz(Params.MonthFrom)}
          AND transaction_date < ${ntz(Params.MonthUntil)}
      )
      SELECT customer_id, date, transaction_date AS last_transaction_time, current_balance
      FROM daily_balances WHERE rn = 1 ORDER BY date""",

    // reference :309-319
    "q12_never_spent" -> s"""
      SELECT customer_id, current_balance, cumulative_earned, cumulative_spent,
             cumulative_expired
      FROM customer_current_balances
      WHERE cumulative_spent = 0 AND cumulative_expired = 0 AND cumulative_earned > 0
      ORDER BY cumulative_earned DESC, customer_id""")

  def run(spark: SparkSession, name: String): DataFrame = spark.sql(sql(name))
}
