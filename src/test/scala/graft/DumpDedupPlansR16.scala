package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object DumpDedupPlansR16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def fmt(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val docs = graft.sources.Tables.documents(spark, dir)
    // BEFORE: the pre-round gate expression (operator over raw documents)
    Files.writeString(Paths.get("plans/r16/dedup_containment_before.txt"),
      fmt(graft.operators.Dedup.containmentPairs(docs)))
    RunHygiene.drainStages(spark)
    // AFTER: the gate (shared-shingle consumer)
    Files.writeString(Paths.get("plans/r16/dedup_containment_after.txt"),
      fmt(SparkEntry.queries("dedup_containment")(spark, dir)))
    println("[dump] done")
    spark.stop()
  }
}
