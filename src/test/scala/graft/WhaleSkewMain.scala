package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Whale-customer skew evidence for the matcher family (r11 verdict #6):
  * the FIFO window partitions by CUSTOMERID, so one whale customer bounds
  * one task. This main replicates the sf transactions `mult`× (distinct
  * ids), remaps ~19% of all rows (md5 cut) onto ONE customer, runs the
  * primary windowed matcher on the balanced and whale variants, and
  * prints wall time plus the per-stage task-duration spread (max vs
  * median) from a task-end listener — the measurable PLANS.md cites.
  * Usage: sbt "Test/runMain graft.WhaleSkewMain <sfDir> [mult]". */
object WhaleSkewMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(20)

    val taskMs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null && e.taskMetrics != null)
          taskMs.add((e.stageId, e.taskInfo.duration))
    }
    spark.sparkContext.addSparkListener(listener)

    val base = graft.sources.Tables.transactions(spark, sfDir)
    // mult× replication with distinct ids: the id suffix keeps every
    // (timestamp, id) sort key unique; timestamps unchanged
    val big = (0 until mult).map { i =>
      base.withColumn("transaction_id", concat(col("transaction_id"), lit(s"_r$i")))
    }.reduce(_ unionByName _)
    val whaleCut = substring(md5(col("transaction_id").cast("binary")), 1, 1) < "3"
    val whale = big.withColumn("customer_id",
      when(whaleCut, lit("WHALE")).otherwise(col("customer_id")))

    // one measurement discipline for every variant: PLANS.md compares the
    // primary and salted numbers, so both MUST come from the same block
    def run(tag: String, df: org.apache.spark.sql.DataFrame,
        matcher: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          graft.operators.FifoMatcher.matchTransactions): Unit = {
      val staged = graft.RunHygiene.stage(df)
      staged.count() // isolate the matcher from the synthesis cost
      taskMs.clear()
      val t0 = System.nanoTime()
      // aggregate over REDEEMID so the optimizer cannot elide the windows
      // (a bare count() drops the unreferenced Window operators entirely)
      val n = matcher(staged)
        .agg(count(col("REDEEMID"))).head().getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      val byStage = {
        import scala.jdk.CollectionConverters._
        taskMs.asScala.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      }
      println(f"[whale] $tag%-9s rows=$n%9d wall=$wall%6.2f s")
      byStage.toSeq.sortBy(-_._2.max).take(3).foreach { case (sid, ds) =>
        val med = ds(ds.size / 2)
        println(f"[whale]   stage $sid%5d tasks=${ds.size}%3d " +
          f"max=${ds.max}%6d ms median=$med%6d ms spread=${ds.max.toDouble / math.max(1L, med)}%5.1fx")
      }
      RunHygiene.drainStages(spark)
    }
    // the round-12 #6 hole: the whale's rows all share ONE timestamp, so
    // time-range salting alone would land them in a single bucket — the
    // sampled TRANS_ID sub-split is what splits this shape
    val oneTs = java.time.LocalDateTime.of(2024, 6, 15, 12, 0)
    val whale1ts = whale.withColumn("timestamp",
      when(col("customer_id") === "WHALE", lit(oneTs)).otherwise(col("timestamp")))

    // first run absorbs session init; report the labeled runs
    run("warmup", big)
    run("balanced", big)
    run("whale", whale)
    // the two-stage distributed rank on the same whale corpus: the whale's
    // history splits across buckets, so the max task shrinks toward median
    run("w-salted", whale, graft.operators.FifoMatcher.matchTransactionsSalted(_))
    // equal-timestamp whale: primary (one task bounds it) vs the salted
    // variant with the id-range sub-split engaged
    run("1ts-prim", whale1ts)
    run("1ts-salt", whale1ts, graft.operators.FifoMatcher.matchTransactionsSalted(_))

    // round-13 verdict #4 evidence: an equal-timestamp whale holding ≥50%
    // of the corpus, with the sub-split's DRIVER footprint measured
    // directly — the boundary derivation collects O(runs × buckets)
    // values (a bounded COUNT), never a fixed rate of the whale.
    val whale50 = big.withColumn("customer_id",
        when(substring(md5(col("transaction_id").cast("binary")), 1, 1) < "8",
          lit("WHALE")).otherwise(col("customer_id")))
      .withColumn("timestamp",
        when(col("customer_id") === "WHALE", lit(oneTs)).otherwise(col("timestamp")))
    run("50p1ts-s", whale50, graft.operators.FifoMatcher.matchTransactionsSalted(_))
    locally {
      val t = whale50
        .withColumnRenamed("transaction_id", "TRANS_ID")
        .withColumnRenamed("transaction_type", "TCTYPE")
        .withColumnRenamed("timestamp", "CREATEDAT")
        .withColumnRenamed("customer_id", "CUSTOMERID")
        .withColumnRenamed("amount", "AMOUNT")
      val mm = t.agg(min(col("CREATEDAT")), max(col("CREATEDAT")), count(lit(1))).head()
      val epoch = java.time.LocalDateTime.of(1970, 1, 1, 0, 0)
      def mic(x: java.time.LocalDateTime): Long =
        java.time.temporal.ChronoUnit.MICROS.between(epoch, x)
      val lo = mic(mm.getAs[java.time.LocalDateTime](0))
      val span = mic(mm.getAs[java.time.LocalDateTime](1)) - lo + 1
      val total = mm.getLong(2)
      val bucket = expr(
        s"cast(((unix_micros(cast(CREATEDAT as timestamp)) - ${lo}L) * 16L) div ${span}L as int)")
      val sided = t.withColumn("is_earned", col("TCTYPE") === "earned")
      val bs = graft.operators.FifoMatcher.subSplitBoundaries(
        sided, 16, bucket, total)
      val nCuts = bs.map(_._2.size).sum
      val bytes = bs.map { case ((cust, _, _), cuts) =>
        cust.length + cuts.map { case (_, id) => 16 + id.length }.sum }.sum
      println(f"[whale] 50p1ts sub-split driver footprint: corpus=$total%d rows, " +
        f"runs=${bs.size}%d, boundaries=$nCuts%d, approx_bytes=$bytes%d " +
        "(O(runs x buckets), independent of whale size)")
    }
    spark.stop()
  }
}
