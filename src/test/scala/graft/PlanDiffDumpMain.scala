package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Round-15 deliverable writer: `plans/r15/<query>_before.txt` /
  * `_after.txt` formatted physical plans for every query the optimization
  * round touched. "Before" re-builds the pre-round gate expression from
  * the unchanged operator entry points (fresh per-gate frames; the BPE
  * gates are omitted — their change is job-count, the learn loop runs
  * once per session instead of three times, not plan shape); "after" is
  * the current SparkEntry wiring (session-shared localCheckpoint frames).
  * Usage: sbt "Test/runMain graft.PlanDiffDumpMain [sfDir] [outDir]". */
object PlanDiffDumpMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("plans/r15")
    Files.createDirectories(Paths.get(outDir))
    def fmt(df: DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    def dump(name: String, suffix: String, df: DataFrame): Unit = {
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), fmt(df))
      println(s"[plandiff] wrote $name" + s"_$suffix")
    }
    import graft.operators.{Dedup, Graph, TrainPrep}
    import graft.queries.RelationalQueries
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)

    // BEFORE: the pre-round per-gate expressions (operators unchanged)
    val before: Seq[(String, () => DataFrame)] = Seq(
      ("dedup_clusters", () => Dedup.dedupClusters(Dedup.simhashPairs(docs))),
      ("dedup_clusters_star", () => Dedup.dedupClustersStar(Dedup.simhashPairs(docs))),
      ("dedup_keep_best", () => Dedup.keepBest(docs, Dedup.simhashPairs(docs))),
      ("graph_pagerank", () => Graph.pageRank(Dedup.simhashPairs(docs))),
      ("graph_kcore", () => Graph.kCore(Dedup.simhashPairs(docs))),
      ("train_leakage_audit", () => TrainPrep.leakageAudit(docs, Dedup.simhashPairs(docs))),
      ("train_splits_safe", () => TrainPrep.leakageSafeSplits(docs, Dedup.simhashPairs(docs))),
      ("dedup_ngram_jaccard", () => Dedup.ngramJaccard(docs)),
      ("dedup_minhash_lsh", () => Dedup.minhashLshAuto(docs)),
      ("dedup_lsh_recall", () => Dedup.lshRecallEval(docs)),
      ("dedup_lsh_scurve", () => Dedup.lshScurve(docs)),
      ("basket_pairs", () => RelationalQueries.basketPairs(li)),
      ("graph_triangles", () => RelationalQueries.basketTriangles(li)),
      ("graph_link_prediction", () => {
        val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        val e = op.as("a").join(op.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .select("pa", "pb")
        Graph.linkPrediction(e)
      }))
    before.foreach { case (name, f) =>
      dump(name, "before", f())
      RunHygiene.drainStages(spark)
    }
    // AFTER: the current registry wiring (shared frames)
    before.map(_._1).foreach { name =>
      dump(name, "after", SparkEntry.queries(name)(spark, sfDir))
      RunHygiene.drainStages(spark)
    }
    spark.stop()
  }
}
