package graft

import org.apache.spark.sql.SparkSession

/** Scratch runner: print one named query's formatted physical plan. */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    SparkEntry.queries(args(0))(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
