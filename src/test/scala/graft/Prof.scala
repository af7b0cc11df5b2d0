package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-level timing of the text hot path (test scope). */
object Prof {
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
    time("warmup-count")(docs.count())
    time("tokens")(graft.functions.TextOps.withTokens(docs)
      .select(sum(size(col("toks")))).collect().head.getLong(0))
    time("shingles")(graft.functions.TextOps.withShingles(docs)
      .select(sum(size(col("sh")))).collect().head.getLong(0))
    time("shingles-again")(graft.functions.TextOps.withShingles(docs)
      .select(sum(size(col("sh")))).collect().head.getLong(0))
    time("hv-md5")(graft.functions.TextOps.withShingles(docs)
      .withColumn("hv", transform(col("sh"), x =>
        conv(substring(md5(x.cast("binary")), 1, 8), 16, 10).cast("long")))
      .select(sum(size(col("hv")))).collect().head.getLong(0))
    time("full-ngram")(graft.operators.Dedup.ngramJaccard(docs).count())
    time("full-minhash")(graft.operators.Dedup.minhashLsh(docs).count())
    // ngram internals
    import org.apache.spark.sql.expressions.Window
    val sh = graft.functions.TextOps.withShingles(docs, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inv = sh.select(col("doc_id"), size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))
    val dfreq = inv.groupBy("shingle").agg(count(lit(1)).as("dfreq"))
    time("dfreq")(dfreq.count())
    val w = Window.partitionBy("doc_id").orderBy("dfreq", "shingle")
    val prefix = inv.join(dfreq, Seq("shingle"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(0.5) * col("sz")) + 1)
      .select("doc_id", "shingle")
    time("prefix")(prefix.count())
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("candidates")(candidates.count())
    spark.stop()
  }
}
