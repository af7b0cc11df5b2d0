package graft

import org.apache.spark.sql.SparkSession

/** Param sweep for the ann_rebuild_recovery demonstration (round-13
  * verdict #3): prints (twin, drifted, rebuilt) recall and the two gaps
  * for candidate (nCentroids, nProbe, k, nQueries) configs on one sfDir.
  * Usage: sbt "Test/runMain graft.RecoverySweepMain <sfDir>". */
object RecoverySweepMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val configs = Seq(
      // (nCentroids, nProbe, k, nQueries): the shipped config. Round-14
      // grid results (full 8-config sweep on sf0.01, passers re-swept on
      // all four corpora): nc=16/np=2 is the only config whose drifted row
      // fails the twin tolerance everywhere; iters=2 was also tried and
      // fails sf0.01 (twin_gap 60k), so the gate keeps iters=3.
      (16, 2, 10, 10))
    for ((nc, np, k, nq) <- configs) {
      val rows = graft.operators.Similarity
        .ivfRebuildRecovery(emb, nQueries = nq, k = k, nCentroids = nc, nProbe = np)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("recall_micro")).toMap
      val twin = rows("twin"); val drift = rows("drifted"); val reb = rows("rebuilt")
      println(f"[sweep] nc=$nc%2d np=$np k=$k%2d nq=$nq%2d  twin=$twin%7d drifted=$drift%7d " +
        f"rebuilt=$reb%7d  twin_gap=${twin - drift}%7d gain=${reb - drift}%7d " +
        (if (twin - drift > 100000 && reb >= twin - 100000 && reb >= drift) "PASS" else "fail"))
    }
    spark.stop()
  }
}
