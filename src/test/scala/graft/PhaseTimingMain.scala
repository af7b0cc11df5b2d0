package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-audit helper (r10 verdict #6): times the incremental-index
  * lifecycle PHASES separately — build, append, compact, probe — at a
  * given corpus dir, so PLANS.md can state which phase scales with what.
  * Usage: sbt "Test/runMain graft.PhaseTimingMain <sfDir> [reps]".
  * First rep absorbs session init; report the later reps. */
object PhaseTimingMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $tag%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    for (rep <- 1 to reps) {
      println(s"[phase] --- rep $rep (${if (rep == 1) "init-absorbing, discard" else "report"}) ---")
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val h = substring(md5(col("doc_id").cast("string")), 1, 1)
      val idx = graft.RunHygiene.scratch(spark,
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
          "graft_phase_" + java.util.UUID.randomUUID.toString.take(8)).toString)
      t("build")(graft.operators.Dedup.buildIncrementalIndex(docs.filter(h >= "8"), idx))
      t("append")(graft.operators.Dedup.appendToIncrementalIndex(
        docs.filter(h >= "4" && h < "8"), idx))
      t("compact")(graft.operators.Dedup.compactIncrementalIndex(spark, idx))
      val n = t("probe")(graft.operators.Dedup.incrementalNearDupsIndexed(
        docs.filter(h < "4"), idx).count())
      println(s"[phase] probe pairs: $n")
      RunHygiene.drainStages(spark)
    }
    spark.stop()
  }
}
