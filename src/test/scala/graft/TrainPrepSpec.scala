package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainPrep

/** Semantics pins for the training-set preparation operators. */
class TrainPrepSpec extends AnyFunSuite {
  import TestSpark._

  private def docs(rows: (Long, String)*) = {
    import org.apache.spark.sql.Encoders
    spark.createDataset(rows.toSeq)(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .toDF("doc_id", "text")
  }

  test("splits are growth-stable: adding docs never moves an existing doc") {
    val small = TrainPrep.assignSplits(docs((1L, "a"), (2L, "b"), (3L, "c")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val grown = TrainPrep.assignSplits(
      docs((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    small.foreach { case (id, split) => assert(grown(id) === split) }
  }

  test("split fractions are content-independent and roughly honored") {
    val many = docs((0L until 1000L).map(i => (i, s"doc $i")): _*)
    val byText = TrainPrep.assignSplits(many)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash of doc_id, 10/10/80 buckets of 100 — exact counts are a property
    // of md5, but each class must be populated and train must dominate
    assert(byText.keySet === Set("train", "validation", "test"))
    assert(byText("train") > byText("validation") && byText("train") > byText("test"))
    assert(byText.values.sum === 1000L)
  }

  test("epoch shuffle: distinct permutations per epoch, dense per-shard ranks, reproducible") {
    val d = docs((0L until 30L).map(i => (i, s"doc $i")): _*)
    val out = TrainPrep.epochShuffle(d, epochs = 3, docsPerShard = 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.length === 90) // every doc appears once per epoch
    val orders = (0L until 3L).map { e =>
      out.filter(_._2 == e).sortBy(_._3).map(_._1).toSeq
    }
    orders.foreach(o => assert(o.toSet === (0L until 30L).toSet))
    // different epochs, different permutations (md5 salting)
    assert(orders.distinct.size === 3)
    // dense ranks 1..n within the single shard
    assert(out.filter(_._2 == 0L).map(_._3).sorted.toSeq === (1L to 30L))
    // reproducible
    assert(TrainPrep.epochShuffle(d, epochs = 3, docsPerShard = 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq === out.toSeq)
  }

  test("leakage-safe splits never let a near-dup pair straddle a boundary") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = graft.operators.Dedup.simhashPairs(d)
    val splits = TrainPrep.leakageSafeSplits(d, pairs).cache()
    val straddle = pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
    assert(straddle.count() === 0L)
    // every doc is assigned exactly once, to a real split
    assert(splits.count() === d.count())
    assert(splits.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "validation", "test")))
    splits.unpersist()
  }

  test("leakage-safe splits degrade to the per-doc split off the pair graph") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = graft.operators.Dedup.simhashPairs(d).cache()
    val paired = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val safe = TrainPrep.leakageSafeSplits(d, pairs)
      .join(paired, Seq("doc_id"), "left_anti")
      .select("doc_id", "split")
    val plain = TrainPrep.assignSplits(d)
      .join(paired, Seq("doc_id"), "left_anti")
      .select("doc_id", "split")
    // singleton clusters hash their own id — identical to assignSplits
    assert(safe.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(safe).count() === 0L)
    pairs.unpersist()
  }

  test("packing is a contiguous token stream per shard") {
    // 3 docs of 300 tokens in one shard with maxTokens=512:
    // doc 0 at (pack 0, offset 0); doc 1 starts at 300 and SPANS into pack 1;
    // doc 2 starts at 600 -> pack 1, offset 88
    val text300 = Seq.fill(300)("w").mkString(" ")
    val out = TrainPrep.packSequences(
        docs((0L, text300), (1L, text300), (2L, text300)), maxTokens = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((0L, 300L, 0L, 0L), (1L, 300L, 0L, 300L), (2L, 300L, 1L, 88L)))
  }

  test("shards pack independently") {
    val text300 = Seq.fill(300)("w").mkString(" ")
    // docsPerShard=2: docs 0,1 in shard 0; doc 2 restarts at (shard 1, pack 0, offset 0)
    val out = TrainPrep.packSequences(
        docs((0L, text300), (1L, text300), (2L, text300)),
        maxTokens = 512, docsPerShard = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((0L, 0L, 0L, 0L), (1L, 0L, 0L, 300L), (2L, 1L, 0L, 0L)))
  }
}
