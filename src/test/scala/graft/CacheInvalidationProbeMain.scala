package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: does unpersisting an operator's INTERNAL staged frame
  * invalidate a session-lived cache built on top of it? (CacheManager
  * re-compiles dependent entries on uncache — if so, session-shared
  * frames must be localCheckpoint'd, not persisted.) */
object CacheInvalidationProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    spark.range(0, 1L << 20).selectExpr("sum(id)").collect()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val shared = t("build+persist+count") {
      val p = graft.operators.Dedup.ngramJaccard(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    t("cached count #1")(shared.count())
    t("drainStages")(RunHygiene.drainStages(spark))
    t("count after drain")(shared.count())
    t("count again")(shared.count())
    val proj = t("stage projection + count") {
      val q = RunHygiene.stage(shared.select("doc_a", "doc_b")); q.count(); q
    }
    t("drainStages #2")(RunHygiene.drainStages(spark))
    t("count after proj drain")(shared.count())
    spark.stop()
  }
}
