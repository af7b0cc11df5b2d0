package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode

/** Round-16 deliverable writer: `plans/r16/<query>_<suffix>.txt` formatted
  * physical plans for every gate the optimization round touches. The plan
  * of each CURRENT SparkEntry gate expression is dumped verbatim — run
  * once at the round's start (`before`) and once after the changes
  * (`after`). Streaming replay gates are omitted: their cost is trigger
  * machinery (micro-batch count, sink/checkpoint constants), not a
  * dumpable batch plan. Usage:
  * sbt "Test/runMain graft.PlanDumpR16Main before [sfDir] [outDir]". */
object PlanDumpR16Main {
  val Gates: Seq[String] = Seq(
    "ann_cosine_topk", "ann_lsh_topk", "ann_rrf_fusion", "ann_sq_topk",
    "ann_bq_topk", "ann_matryoshka_topk", "ann_ivf_topk", "ann_pq_topk",
    "ann_recall_eval", "ann_recall_drift", "ann_rebuild_recovery",
    "ann_ivf_indexed", "ann_ivf_indexed_append", "ann_ivf_indexed_compacted",
    "embed_kmeans", "embed_outlier_dist", "embed_pq_codes",
    "sample_diversity", "dedup_semantic", "ann_filtered_topk")

  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(2).getOrElse("plans/r16")
    Files.createDirectories(Paths.get(outDir))
    Gates.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote ${name}_$suffix (${txt.length} chars)")
      RunHygiene.drainStages(spark)
    }
    spark.stop()
  }
}
