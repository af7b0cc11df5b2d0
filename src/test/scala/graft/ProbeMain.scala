package graft

import org.apache.spark.sql.SparkSession

/** Scratch runner: dump one named query's result for oracle comparison. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Array(name, sfDir, out) = args
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    println(s"[probe] wrote $out")
    spark.stop()
  }
}
