package graft

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import graft.operators.Tx

/** One shared local session for the whole suite. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Canonical transaction fixture builder (FIXTURES.md §1):
    * (transaction_id, customer_id, amount, "yyyy-MM-ddTHH:mm:ss" | "yyyy-MM-dd", type). */
  def tx(rows: (String, String, Double, String, String)*): DataFrame = {
    val data = rows.map { case (id, cust, amt, ts, tpe) =>
      val t = if (ts.contains("T")) LocalDateTime.parse(ts) else LocalDateTime.parse(ts + "T00:00:00")
      Tx(id, cust, amt, t, tpe)
    }
    spark.createDataset(data)(Encoders.product[Tx]).toDF()
  }

  /** matched output → TRANS_ID → Option(REDEEMID). */
  def redeemMap(matched: DataFrame): Map[String, Option[String]] =
    matched.collect().map(r =>
      r.getAs[String]("TRANS_ID") -> Option(r.getAs[String]("REDEEMID"))).toMap
}
