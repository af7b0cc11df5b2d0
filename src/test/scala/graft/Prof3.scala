package graft
import org.apache.spark.sql.SparkSession
object Prof3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  n=$n")
    }
    time("warmup")(docs.count())
    time("simhash-pairs")(graft.operators.Dedup.simhashPairs(docs).count())
    time("clusters-full")(graft.operators.Dedup.dedupClusters(
      graft.operators.Dedup.simhashPairs(docs)).count())
    time("clusters-again")(graft.operators.Dedup.dedupClusters(
      graft.operators.Dedup.simhashPairs(docs)).count())
    spark.stop()
  }
}
