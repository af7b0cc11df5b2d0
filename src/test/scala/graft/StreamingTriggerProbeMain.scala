package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Round-16 measurement probe (verdict #7): per-trigger cost breakdown for
  * the file-replay streaming gates. Attaches a StreamingQueryListener and
  * prints each micro-batch's durationMs map (triggerExecution, and its
  * components: latestOffset/getBatch listing, queryPlanning, walCommit,
  * addBatch, commitOffsets) plus the state-store commit metrics — the
  * numbers that adjudicate where the per-trigger floor actually goes.
  * Usage: sbt "Test/runMain graft.StreamingTriggerProbeMain <gate> [sfDir]". */
object StreamingTriggerProbeMain {
  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse("streaming_evicted_match")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[probe] query started ${e.id}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        val state = Option(p.stateOperators).toSeq.flatten.map { s =>
          s"rows=${s.numRowsTotal} commitMs=${s.commitTimeMs} mem=${s.memoryUsedBytes}"
        }.mkString("; ")
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=$dur state{$state}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[probe] query terminated")
    })
    val parts = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(""))
    parts.foreach { sp =>
      if (sp.nonEmpty) spark.conf.set("graft.replay.statePartitions", sp)
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        SparkEntry.queries(gate)(spark, sfDir).count()
        println(f"[probe] $gate stateParts=${if (sp.isEmpty) "dflt" else sp} " +
          f"rep $rep total ${(System.nanoTime() - t0) / 1e9}%.2f s")
        RunHygiene.drainStages(spark)
      }
    }
    spark.stop()
  }
}
