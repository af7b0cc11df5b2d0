package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: time the FileReplay staging job shapes in isolation
  * (3-chunk and 24-chunk sets over the events replay projection), then one
  * full alerts replay — separates staging cost from stream-run cost. */
object StagingProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    spark.range(0, 1L << 20).selectExpr("sum(id)").collect()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $tag%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val events = graft.sources.Tables.events(spark, sfDir)
    val src = events
      .withColumn("event_type", col("event_type"))
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
    for (rep <- 1 to 2) {
      println(s"[stage] --- rep $rep ---")
      t("chunks3")(graft.streaming.FileReplay.stageChunks(src, "ts", 3))
      t("chunks24")(graft.streaming.FileReplay.stageChunks(src, "ts", 24))
      val alerts = t("alerts-full")(
        graft.streaming.StreamingAnalytics.replayThresholdAlerts(events).count())
      println(s"[stage] alerts rows: $alerts")
      RunHygiene.drainStages(spark)
    }
    spark.stop()
  }
}
