package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-level timing of the bench hot paths (test scope). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s  n=$n")
    }
    time("warmup-docs")(docs.count())
    time("warmup-emb")(emb.count())

    // ---- dedup_winnow_pairs (107.8 s in BENCH_r02) ----
    time("winnow-fingerprints")(graft.functions.TextOps.winnowFingerprints(docs).count())
    val fp = graft.functions.TextOps.winnowFingerprints(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("winnow-fp-materialize")(fp.count())
    val wj = fp.as("a").join(fp.as("b"),
        col("a.fingerprint") === col("b.fingerprint") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= 2)
    time("winnow-join-only")(wj.count())
    time("winnow-full")(graft.operators.Dedup.winnowPairs(docs).count())
    fp.unpersist()

    // hot fingerprint check
    val hot = graft.functions.TextOps.winnowFingerprints(docs)
      .groupBy("fingerprint").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc).limit(5).collect()
    println("[prof] hottest fingerprints: " + hot.mkString(", "))

    // ---- dedup_ngram_jaccard (43.2 s) ----
    time("ngram-full")(graft.operators.Dedup.ngramJaccard(docs).count())

    // ---- embed_neardup_exact (38.6 s) ----
    val nd = graft.operators.Similarity.nearDupPairs(emb, 0.45)
    time("neardup-exact-count")(nd.count())
    time("neardup-exact-again")(nd.count())
    val scoredOnly = {
      graft.functions.VectorExpressions.register(spark)
      val withNorm = emb.select(col("vec_id"), col("embedding"),
        graft.operators.Similarity.l2Norm(col("embedding")).as("norm"))
      val a = withNorm.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
        col("norm").as("norm_a"))
      val b = withNorm.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
        col("norm").as("norm_b"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("cosine_sim", round(
          graft.operators.Similarity.dotProduct(col("emb_a"), col("emb_b")) /
            graft.operators.Similarity.safeDenom(col("norm_a") * col("norm_b")), 6))
        .filter(col("cosine_sim") >= 0.45)
        .select("vec_a", "vec_b", "cosine_sim")
    }
    time("neardup-exact-nosort")(scoredOnly.count())

    // ---- embed_neardup_pairs / LSH (38.1 s) ----
    time("neardup-lsh-full")(graft.operators.Similarity.nearDupPairsLsh(emb, 0.45).count())
    locally {
      graft.functions.VectorExpressions.register(spark)
      val planes = Array.tabulate(5 * 48 * 64) { i =>
        graft.operators.Similarity.planeComponent(i / 64, i % 64) }
      val srp = graft.functions.HashExpressions.registerSrp(spark, planes, 5, 48, 64)
      val codes = emb.select(col("vec_id"),
          posexplode(call_function(srp, col("embedding"))).as(Seq("tbl", "code")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("lsh-codes")(codes.count())
      val candidates = codes.as("a").join(codes.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.code") === col("b.code") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .distinct()
      time("lsh-candidates")(candidates.count())
      codes.unpersist()
    }

    // ---- dedup_clusters (29.7 s) ----
    time("simhash-only")(graft.operators.Dedup.simhash(docs).count())
    time("simhash-pairs")(graft.operators.Dedup.simhashPairs(docs).count())
    val sp = graft.operators.Dedup.simhashPairs(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("simhash-pairs-materialize")(sp.count())
    time("clusters-from-cached")(graft.operators.Dedup.dedupClusters(sp).count())
    time("clusters-full")(graft.operators.Dedup.dedupClusters(
      graft.operators.Dedup.simhashPairs(docs)).count())

    spark.stop()
  }
}
