package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Driver-side xlsx → parquet staging converter — the entry point a user of
  * the reference pipeline points at the real `tc_raw_data.xlsx` feed
  * (reference: src/thrive_cash_processing_dag.py:88-137).
  *
  * Usage: `runMain graft.sources.XlsxToParquet <xlsx> <outDir>`
  *
  * Writes, exactly like the reference's download_data task:
  *  - `<outDir>/transactions.parquet` — the TC_Data sheet under the
  *    enforced transaction contract, partitioned by transaction_type
  *    (the 3-way earned/spent/expired staging split, :110-120);
  *  - `<outDir>/sales.parquet`, `<outDir>/customers.parquet` — the Sales
  *    and Customers sheets staged as-is (:123-125; the reference never
  *    consumes them downstream, they are staged for parity).
  *
  * From here `ThrivePipeline` / `spark.read.parquet` take over — the xlsx
  * itself is a single unsplittable file, so conversion is deliberately a
  * one-shot driver job, not a distributed scan. */
object XlsxToParquet {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: XlsxToParquet <xlsx> <outDir>")
    val (xlsx, outDir) = (args(0), args(1))
    // getOrCreate may return a pre-existing session (e.g. the test
    // harness's) — only stop what this main itself created
    val preExisting = SparkSession.getDefaultSession.isDefined
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val txns = XlsxReader.readTransactions(spark, xlsx)
    txns.write.mode(SaveMode.Overwrite)
      .partitionBy("transaction_type")
      .parquet(s"$outDir/transactions.parquet")
    Seq("Sales" -> "sales", "Customers" -> "customers").foreach { case (sheet, out) =>
      XlsxReader.sheetDf(spark, xlsx, sheet)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$out.parquet")
    }
    println(s"staged ${txns.count()} transactions + sales + customers under $outDir")
    if (!preExisting) spark.stop()
  }
}
