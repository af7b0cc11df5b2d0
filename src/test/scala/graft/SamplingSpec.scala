package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, Sketches, TrainPrep}

class SamplingSpec extends AnyFunSuite {
  import TestSpark._

  test("stratified sample keeps exactly ceil(n*pct/100) per stratum, deterministically") {
    import spark.implicits._
    // strata of deliberately awkward sizes: ceil(7*20/100)=2, ceil(10*20/100)=2,
    // ceil(3*20/100)=1
    val docs = ((1 to 7).map((_, "a")) ++ (8 to 17).map((_, "b")) ++ (18 to 20).map((_, "c")))
      .toDF("doc_id", "lang")
    val s = Sampling.stratifiedSample(docs, "lang", pct = 20)
    val counts = s.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    // deterministic: same input → same sample
    assert(s.collect().toSeq === Sampling.stratifiedSample(docs, "lang", pct = 20).collect().toSeq)
    // ranks are 1..k within each stratum
    assert(s.filter($"stratum" === "b").select("sample_rank").as[Long].collect().sorted
      === Array(1L, 2L))
  }

  test("whale stratum splits across hash shares and keeps exact counts") {
    import spark.implicits._
    // one whale stratum (5000 rows) over a small bound, two tail strata
    val docs = ((1 to 5000).map((_, "whale")) ++ (5001 to 5007).map((_, "a")) ++
      (5008 to 5017).map((_, "b"))).toDF("doc_id", "lang")
    val s = Sampling.stratifiedSample(docs, "lang", pct = 20,
      whaleBound = 1000, shares = 8)
    val rows = s.collect()
    val counts = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // exact ceil(n*pct/100) per stratum even through the apportioned path
    assert(counts === Map("whale" -> 1000, "a" -> 2, "b" -> 2))
    // small strata take the global-rank path: identical to the unguarded call
    val unguarded = Sampling.stratifiedSample(docs.filter($"lang" =!= "whale"), "lang", pct = 20)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.filter(_.getString(1) != "whale")
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet === unguarded)
    // sample_rank stays unique per stratum (share-interleaved id)
    val whaleRanks = rows.filter(_.getString(1) == "whale").map(_.getLong(2))
    assert(whaleRanks.distinct.length === whaleRanks.length)
    // multi-task execution: the ranking window runs per (stratum, share) —
    // the plan partitions on both, and the kept set spans many shares
    assert(s.queryExecution.executedPlan.toString.contains("hashpartitioning(stratum"))
    val keptShares = s.filter($"stratum" === "whale").select("doc_id").as[Int].collect()
      .map(id => Sampling.shareOf(id.toString, 8)).distinct
    assert(keptShares.length === 8, s"kept docs landed in only ${keptShares.length} shares")
    // determinism through the apportioned path
    assert(Sampling.stratifiedSample(docs, "lang", pct = 20, whaleBound = 1000, shares = 8)
      .collect().toSeq === rows.toSeq)
  }

  test("weighted mix applies per-source rates and is append-stable") {
    import spark.implicits._
    val docs = (1 to 1000).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val weights = Map("src0" -> 100, "src1" -> 0)
    val m = Sampling.weightedMix(docs, weights, defaultPct = 50)
    val bySrc = m.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") === 250L) // 100% kept
    assert(!bySrc.contains("src1")) // 0% kept
    // default-rate sources land near 50% (hash-uniform, 250 draws)
    assert(bySrc("src2") > 75L && bySrc("src2") < 175L)
    // append stability: adding docs never changes an existing doc's fate
    val kept = m.select("doc_id").as[Int].collect().toSet
    val more = (1 to 2000).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val kept2 = Sampling.weightedMix(more, weights, defaultPct = 50)
      .select("doc_id").as[Int].collect().toSet
    assert(kept.subsetOf(kept2))
    assert(kept2.filter(_ <= 1000) === kept)
  }

  test("curriculum bins: fixed-width bins, open last bin, stable shards") {
    import spark.implicits._
    val docs = Seq(
      (1, "short text"), // 2 tokens -> bin 0
      (2, Seq.fill(70)("w").mkString(" ")), // 70 -> bin 1
      (3, Seq.fill(600)("w").mkString(" ")) // 600 -> capped at bin 7
    ).toDF("doc_id", "text")
    val c = TrainPrep.curriculumBins(docs).collect()
      .map(r => r.getAs[Int]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("bin"), r.getAs[Long]("shard"))).toMap
    assert(c(1) === ((2L, 0L, c(1)._3)))
    assert(c(2)._2 === 1L)
    assert(c(3)._1 === 600L)
    assert(c(3)._2 === 7L)
    assert(c.values.forall { case (_, _, s) => s >= 0 && s < 4 })
  }

  test("weighted top-k: size k, deterministic, and weight-biased") {
    import spark.implicits._
    // two weight classes: heavy docs (weight 1000) vs light docs (weight 10)
    val docs = (1 to 2000).map(i =>
      (i, if (i <= 1000) "heavy" else "light", if (i <= 1000) 1000L else 10L))
      .toDF("doc_id", "source", "n_chars")
    val s = Sampling.weightedTopK(docs, k = 200)
    val rows = s.collect()
    assert(rows.length === 200)
    // ranks are dense 1..k
    assert(rows.map(_.getAs[Long]("sample_rank")).sorted === (1L to 200L).toArray)
    // determinism: same draw every run
    assert(Sampling.weightedTopK(docs, k = 200).collect().toSeq === rows.toSeq)
    // weight bias: E[heavy share] = 1000/1010 per draw; at k=200 the heavy
    // class must dominate overwhelmingly (P[light > 40] is astronomically small)
    val heavy = rows.count(_.getAs[String]("source") == "heavy")
    assert(heavy > 160, s"only $heavy/200 from the heavy class")
    // es_key is a valid ES key: ln(u)/w <= 0 always
    assert(rows.forall(_.getAs[Long]("es_key_nano") <= 0L))
    // plans as a top-k, not a global sort
    assert(s.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("weighted top-k with equal weights reduces to a uniform hash sample") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, conv, md5, substring}
    val docs = (1 to 500).map(i => (i, "s", 7L)).toDF("doc_id", "source", "n_chars")
    // equal weights: ln(u)/7 is monotone in the id hash, so the drawn SET
    // is exactly the k LARGEST-hash docs — a uniform hash sample
    val es = Sampling.weightedTopK(docs, k = 50).select("doc_id").as[Int].collect().toSet
    val topHash = docs.select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
          .cast("long").as("hv"))
      .orderBy(col("hv").desc, col("doc_id"))
      .limit(50).select("doc_id").as[Int].collect().toSet
    assert(es === topHash)
  }

  test("token-budget sample is the greedy hash-order prefix per source") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 40 docs of 25 tokens across two sources; budget 100 → the first four
    // docs in (hash, id) order per source survive, the fifth's prior is 100
    val docs = (1 to 40).map { i =>
      (i.toLong, Seq.fill(25)("w").mkString(" "), if (i % 2 == 0) "even" else "odd")
    }.toDF("doc_id", "text", "source")
    val kept = Sampling.tokenBudgetSample(docs, budgetTokens = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(kept.length === 8)
    assert(kept.groupBy(_._2).view.mapValues(_.length).toMap === Map("even" -> 4, "odd" -> 4))
    assert(kept.forall(_._4 <= 100L))
    // the kept set is exactly the 4 smallest (hash, id) per source
    val hashOrder = docs.select(col("doc_id"), col("source"),
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
          .cast("long").as("hv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = hashOrder.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._1)).take(4).map(_._1).toSeq
    }.toSet
    assert(kept.map(_._1).toSet === expect)
  }

  test("token-budget sample keeps the budget-crossing doc, drops the rest") {
    import spark.implicits._
    // one source, token counts 60/60/60: doc ordering is by hash, prior of
    // the 2nd doc is 60 < 100 (kept, cum 120), 3rd doc prior 120 (dropped)
    val docs = Seq(
      (1L, Seq.fill(60)("w").mkString(" "), "s"),
      (2L, Seq.fill(60)("w").mkString(" "), "s"),
      (3L, Seq.fill(60)("w").mkString(" "), "s")
    ).toDF("doc_id", "text", "source")
    val kept = Sampling.tokenBudgetSample(docs, budgetTokens = 100L).collect()
    assert(kept.length === 2)
    assert(kept.map(_.getLong(3)).max === 120L) // crossing doc survives
  }

  test("HLL estimate is exact-ish at gate scale and within the error regime at 10k") {
    import spark.implicits._
    val big = (1 to 10000).toDF("id")
    val r = Sketches.hllDistinct(big, "id").collect().head
    assert(r.getAs[Long]("m") === 64L)
    assert(r.getAs[Long]("exact_distinct") === 10000L)
    // raw estimator at m=64: standard error ~1.04/sqrt(64) = 13%; allow 3 SE
    assert(r.getAs[Double]("rel_error") < 0.4,
      s"estimate ${r.getAs[Double]("est_distinct")} too far from 10000")
  }
}
