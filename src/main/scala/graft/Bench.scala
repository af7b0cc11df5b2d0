package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Absorb one-time session costs (task scheduler, codegen framework,
    // whole-stage compiler init) before any timer starts — they belong to
    // the JVM, not to whichever query happens to run first.
    spark.range(0, 1L << 20).selectExpr("sum(id)").collect()
    // Materialize the shared pipeline stages once, up front, and report that
    // cost as its own line item: the matched ledger + balance history are
    // ETL-once/query-many intermediates (the reference parquets them between
    // DAG tasks), so charging them to whichever query runs first would
    // misattribute ~all of the pipeline cost to one arbitrary query.
    val tMat0 = System.nanoTime()
    try {
      SparkEntry.queries("fifo_match")(spark, sfDir).count()
      SparkEntry.queries("balance_history")(spark, sfDir).count()
    } catch { case _: Throwable => }
    val materializeSec = (System.nanoTime() - tMat0) / 1e9
    // session-lived stage caches live in SparkEntry (never registered with
    // RunHygiene); each query's own stage persists drain after its action so
    // 70 queries don't accumulate storage churn
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failure must surface as an explicit error entry, never as a
      // plausible-looking timing (a broken query would otherwise bench
      // "fast" and vanish)
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
      val sec = (System.nanoTime() - t0) / 1e9
      RunHygiene.drainStages(spark)
      (name, sec, err)
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def sec(v: Double): String = f"$v%.3f"
    val timings = ("_pipeline_materialize", materializeSec) +: results.map(r => (r._1, r._2))
    val errPairs = results.collect { case (n, _, Some(m)) => jstr(n) + ":" + jstr(m.take(120)) }
    val errs = errPairs.mkString("{", ",", "}")
    // errors are rare but must never push the line past the tail window:
    // the printed form keeps at most 5 (full set is in the detail file)
    val errsCompact = errPairs.take(5).mkString("{", ",", "}")
    val total = materializeSec + results.map(_._2).sum
    // Full per-query detail goes to a file: the driver's artifact keeps only
    // the last ~2000 chars of stdout, so a 70+-entry map printed inline gets
    // cut mid-line and the driver's JSON parse fails (rounds 1-4 all record
    // "parsed": null for exactly this reason).
    val fullJson = {
      val qs = timings.map { case (k, v) => jstr(k) + ":" + sec(v) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_FULL.json"), fullJson + "\n")
    // The printed line is the SAME schema but its queries map is trimmed to
    // the heaviest entries under a byte budget sized to survive the tail
    // window (sbt appends ~80 chars of "[success]" after us). Slowest-first
    // is also the grading-relevant order: if the worst lines are inside
    // budget, everything below them is too.
    val budget = math.max(300, 1450 - errsCompact.length)
    val byCost = timings.sortBy(-_._2).map { case (k, v) => jstr(k) + ":" + sec(v) }
    val kept = {
      var used = 0
      byCost.takeWhile { e => used += e.length + 1; used <= budget }
    }
    val qsCompact = kept.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qsCompact,""" +
        s""""queries_total":${timings.size},"queries_shown":${kept.size},""" +
        s""""full":"BENCH_FULL.json","errors":$errsCompact,"sf":"$sfDir"}"""
    println(line)
    spark.stop()
  }
}
