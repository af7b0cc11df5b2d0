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
    val qs = (("_pipeline_materialize", materializeSec) +: results.map(r => (r._1, r._2)))
      .map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (n, _, Some(m)) => jstr(n) + ":" + jstr(m) }
      .mkString("{", ",", "}")
    val total = materializeSec + results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
