package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BalanceAnalytics, FifoMatcher}
import graft.queries.{BalanceQueries, BalanceQueriesSql}
import graft.queries.OracleSql.Params
import graft.sources.Tables

/** Each analytic query has two faces — the adapted reference SQL through
  * spark.sql and the DataFrame builder. Both must produce identical rows in
  * identical order over real data (sf0.001). */
class SqlParitySpec extends AnyFunSuite {
  import TestSpark._

  private lazy val history = {
    val h = BalanceAnalytics.balanceHistory(
      FifoMatcher.matchTransactions(Tables.transactions(spark, "/root/testdata/sf0.001")))
      .persist()
    h.count()
    h
  }
  private lazy val current = BalanceAnalytics.currentBalances(history)

  private lazy val dfQueries: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
    "q01_balance_asof" -> (() => BalanceQueries.q1BalanceAsOf(history, Seq(Params.CustA, Params.CustB), Params.AsOf)),
    "q02_current_balance" -> (() => BalanceQueries.q2CurrentBalance(current, Seq(Params.CustA, Params.CustB))),
    "q03_history" -> (() => BalanceQueries.q3History(history, Params.CustA)),
    "q04_month_end" -> (() => BalanceQueries.q4MonthEnd(history, Params.CustA)),
    "q05_above_threshold" -> (() => BalanceQueries.q5AboveThreshold(history, Params.AsOf, Params.Threshold)),
    "q06_balance_change" -> (() => BalanceQueries.q6BalanceChange(history, Params.CustA, Params.Start, Params.End)),
    "q07_top_balances" -> (() => BalanceQueries.q7TopBalances(history, Params.AsOf)),
    "q08_zero_balance" -> (() => BalanceQueries.q8ZeroBalance(history, Params.AsOf)),
    "q09_balance_stats" -> (() => BalanceQueries.q9BalanceStats(history, Params.AsOf)),
    "q10_day_transactions" -> (() => BalanceQueries.q10DayTransactions(history, Params.CustA, Params.Day)),
    "q11_daily_snapshots" -> (() => BalanceQueries.q11DailySnapshots(history, Params.CustA, Params.MonthFrom, Params.MonthUntil)),
    "q12_never_spent" -> (() => BalanceQueries.q12NeverSpent(current)))

  BalanceQueriesSql.sql.keys.toSeq.sorted.foreach { name =>
    test(s"$name: spark.sql twin matches the DataFrame builder") {
      BalanceQueriesSql.registerViews(history, current)
      val viaSql = BalanceQueriesSql.run(spark, name)
      val viaDf = dfQueries(name)()
      assert(viaSql.columns.toSeq === viaDf.columns.toSeq, "column names")
      val a = viaSql.collect().map(_.toSeq).toSeq
      val b = viaDf.collect().map(_.toSeq).toSeq
      assert(a === b, s"$name rows differ")
    }
  }
}
