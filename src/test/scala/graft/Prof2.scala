package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: job-level timing inside dedupClusters (test scope). */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pairs = graft.operators.Dedup.simhashPairs(docs)
    val p = pairs.persist(lvl)
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .persist(lvl)
    time("edges-materialize")(edges.count())
    p.unpersist()
    var cached = edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("cluster_id"))
      .select(col("src").as("doc_id"), col("cluster_id").as("prev"), col("cluster_id"))
      .persist(lvl)
    var labels = cached.select("doc_id", "cluster_id")
    var converged = false
    var iter = 0
    while (!converged && iter < 50) {
      val neighborMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("cluster_id").as("nb_label")), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nb_label")).as("nb_min"))
      val next = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("cluster_id").as("prev"),
          least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id"))).as("cluster_id"))
        .persist(lvl)
      val changed = time(s"round-${iter}-changed")(
        next.filter(col("cluster_id") =!= col("prev")).count())
      println(s"[prof] round $iter changed=$changed")
      cached.unpersist()
      cached = next
      labels = next.select("doc_id", "cluster_id")
      converged = changed == 0
      iter += 1
    }
    time("final-orderBy-count")(labels.orderBy("doc_id").count())
    spark.stop()
  }
}
