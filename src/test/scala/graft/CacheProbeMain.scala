package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: replicate Bench's per-query drain ordering for the
  * shared-pair-graph consumers and print per-gate wall seconds plus the
  * storage entries Spark actually holds — bisects cache-invalidation
  * effects that BenchOne (no drains) cannot see. Not a spec. */
object CacheProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 1L << 20).selectExpr("sum(id)").collect()
    def storage(): String = {
      val cm = spark.sharedState.cacheManager
      s"cacheManager.isEmpty=${cm.isEmpty}"
    }
    val useShared = args.headOption.contains("shared")
    if (useShared) {
      val t0 = System.nanoTime()
      SparkEntry.materializeDedupShared(spark, sfDir)
      println(f"materialize ${(System.nanoTime() - t0) / 1e9}%6.2f s  ${storage()}")
    }
    import graft.operators.{Dedup, Graph, TrainPrep}
    import graft.sources.Tables
    def fresh(name: String): Long = {
      val docs = Tables.documents(spark, sfDir)
      val pairs = Dedup.simhashPairs(docs)
      name match {
        case "dedup_clusters" => Dedup.dedupClusters(pairs).count()
        case "dedup_clusters_star" => Dedup.dedupClustersStar(pairs).count()
        case "dedup_keep_best" => Dedup.keepBest(docs, pairs).count()
        case "graph_kcore" => Graph.kCore(pairs).count()
        case "graph_pagerank" => Graph.pageRank(pairs).count()
        case "train_leakage_audit" => TrainPrep.leakageAudit(docs, pairs).count()
        case "train_splits_safe" => TrainPrep.leakageSafeSplits(docs, pairs).count()
      }
    }
    Seq("dedup_clusters", "dedup_clusters_star", "dedup_keep_best",
      "graph_kcore", "graph_pagerank", "train_leakage_audit",
      "train_splits_safe").foreach { name =>
      val t = System.nanoTime()
      val n = if (useShared) SparkEntry.queries(name)(spark, sfDir).count()
        else fresh(name)
      println(f"$name%-24s ${(System.nanoTime() - t) / 1e9}%6.2f s  rows=$n")
      RunHygiene.drainStages(spark)
    }
    spark.stop()
  }
}
