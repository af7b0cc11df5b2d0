package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps
import graft.operators.{Dedup, Multimodal, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {
  import TestSpark._

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = docs(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat", // near-dup of 1
    3L -> "completely different words about spark engines here",
    4L -> "the quick brown fox jumps over the lazy dog", // exact dup of 1
    5L -> "tiny")

  test("exact dedup groups identical texts") {
    val groups = Dedup.exact(corpus).collect()
    val dupGroup = groups.filter(_.getAs[Long]("group_size") > 1)
    assert(dupGroup.length === 1)
    assert(dupGroup.head.getAs[Long]("canonical_doc_id") === 1L)
    assert(dupGroup.head.getAs[Long]("group_size") === 2L)
  }

  test("ngram jaccard finds near and exact dups, skips short docs") {
    val pairs = Dedup.ngramJaccard(corpus)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup → jaccard 1.0
    assert(pairs.contains((1L, 2L))) // near dup (7/9 shingles shared... ≥ 0.5)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L)) // < 3 tokens: no shingles
  }

  test("incremental near-dedup: new batch vs existing corpus, cross-side pairs only") {
    import org.apache.spark.sql.functions.col
    // new batch = docs 4,5; existing = 1,2,3. Expect ONLY cross-side pairs:
    // (4,1) exact and (4,2) near — never existing-existing (1,2) or new-new.
    val newBatch = corpus.filter(col("doc_id") >= 4L)
    val existing = corpus.filter(col("doc_id") < 4L)
    val pairs = Dedup.incrementalNearDups(newBatch, existing)
      .collect()
      .map(r => (r.getAs[Long]("new_doc_id"), r.getAs[Long]("existing_doc_id"),
        r.getAs[Double]("jaccard"))).toList
    assert(pairs.map(p => (p._1, p._2)) === List((4L, 1L), (4L, 2L)))
    assert(pairs.head._3 === 1.0) // 4 is an exact dup of 1
    assert(pairs(1)._3 >= 0.5 && pairs(1)._3 < 1.0)

    // differential: cross-side restriction of the one-corpus join must agree
    val full = Dedup.ngramJaccard(corpus).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val crossFromFull = full.filter { case (a, b) =>
      (a >= 4L) != (b >= 4L)
    }.map { case (a, b) => if (a >= 4L) (a, b) else (b, a) }
    assert(pairs.map(p => (p._1, p._2)).toSet === crossFromFull)
  }

  test("density escape hatch: a saturated estimate fails fast naming minhashLsh") {
    val e = intercept[IllegalStateException] {
      Dedup.ngramJaccard(corpus, maxCandidateEstimate = 0L)
    }
    assert(e.getMessage.contains("minhashLsh"), "directive must name the scale tool")
    assert(e.getMessage.contains("candidate estimate"),
      "message must carry the measured estimate")
  }

  test("indexed incremental dedup (persisted snapshot) equals the rebuild path") {
    import org.apache.spark.sql.functions.col
    val newBatch = corpus.filter(col("doc_id") >= 4L)
    val existing = corpus.filter(col("doc_id") < 4L)
    val idx = java.nio.file.Files.createTempDirectory("graft_idx_spec_").toString
    Dedup.buildIncrementalIndex(existing, idx)
    val indexed = Dedup.incrementalNearDupsIndexed(newBatch, idx).collect()
      .map(r => (r.getAs[Long]("new_doc_id"), r.getAs[Long]("existing_doc_id"),
        r.getAs[Double]("jaccard"))).toList
    val rebuilt = Dedup.incrementalNearDups(newBatch, existing).collect()
      .map(r => (r.getAs[Long]("new_doc_id"), r.getAs[Long]("existing_doc_id"),
        r.getAs[Double]("jaccard"))).toList
    // the two paths rank under different (both lossless) shingle orders;
    // exact verification must erase the difference entirely
    assert(indexed === rebuilt)
    assert(indexed.map(p => (p._1, p._2)) === List((4L, 1L), (4L, 2L)))
  }

  test("index lifecycle: append under the frozen order, compact refreshes it, probe unchanged") {
    import org.apache.spark.sql.functions.col
    val newBatch = corpus.filter(col("doc_id") >= 4L)      // docs 4, 5
    val base = corpus.filter(col("doc_id") === 1L)          // snapshot: doc 1
    val appended = corpus.filter(col("doc_id") === 2L || col("doc_id") === 3L)
    def probe(idx: String) = Dedup.incrementalNearDupsIndexed(newBatch, idx)
      .collect()
      .map(r => (r.getAs[Long]("new_doc_id"), r.getAs[Long]("existing_doc_id"),
        r.getAs[Double]("jaccard"))).toList
    val idx = java.nio.file.Files.createTempDirectory("graft_cmp_spec_").toString
    Dedup.buildIncrementalIndex(base, idx)
    Dedup.appendToIncrementalIndex(appended, idx)
    // doc 3's shingles exist only in the APPEND batch: under the frozen
    // snapshot order they carry dfreq 0 (rank-first) and no dfreq/ row
    val dfreqBefore = spark.read.parquet(Dedup.resolvedTreePath(idx, "dfreq"))
      .collect().map(_.getAs[String]("shingle")).toSet
    assert(!dfreqBefore.exists(_.contains("spark")),
      "append must NOT touch the frozen dfreq tree")
    // the probe against the appended (pre-compaction) index is already
    // complete: cross-side pairs (4,1) exact and (4,2) near
    val before = probe(idx)
    assert(before.map(p => (p._1, p._2)) === List((4L, 1L), (4L, 2L)))
    // a probe PLAN resolved before the swap — the concurrent-probe shape:
    // its generation is fixed at construction, and compaction must retain
    // that generation's trees so the late materialization still reads a
    // consistent order (round-10 verdict #3)
    val preSwapProbe = Dedup.incrementalNearDupsIndexed(newBatch, idx)
    val genBefore = Dedup.indexGeneration(idx)
    Dedup.compactIncrementalIndex(spark, idx)
    assert(Dedup.indexGeneration(idx) === genBefore + 1,
      "compaction must advance the manifest generation atomically")
    // the pre-swap probe materializes AFTER the swap, bit-identical
    assert(preSwapProbe.collect()
      .map(r => (r.getAs[Long]("new_doc_id"), r.getAs[Long]("existing_doc_id"),
        r.getAs[Double]("jaccard"))).toList === before)
    // compaction re-derives dfreq from the index's own arrays tree — the
    // appended docs' shingles now carry their true frequencies
    val dfreqAfter = spark.read.parquet(Dedup.resolvedTreePath(idx, "dfreq"))
      .collect().map(_.getAs[String]("shingle")).toSet
    assert(dfreqAfter.exists(_.contains("spark")),
      "compaction must refresh dfreq from the full index")
    // and the probe result is bit-identical across the swap (both orders
    // are lossless; exact verification erases the difference)
    assert(probe(idx) === before)
    // a second compaction prunes the stale generation but retains the
    // previous one (bounded two-generation footprint)
    Dedup.compactIncrementalIndex(spark, idx)
    assert(probe(idx) === before)
    val root = new java.io.File(idx)
    val treeDirs = root.listFiles().map(_.getName).filter(_.startsWith("dfreq")).sorted
    assert(treeDirs.length === 2, s"expected two retained dfreq generations, got ${treeDirs.toList}")
    // equal to the from-scratch rebuild over base+appended as well
    val rebuilt = Dedup.incrementalNearDups(newBatch, corpus.filter(col("doc_id") < 4L))
      .collect()
      .map(r => (r.getAs[Long]("new_doc_id"), r.getAs[Long]("existing_doc_id"),
        r.getAs[Double]("jaccard"))).toList
    assert(probe(idx) === rebuilt)
  }

  test("compaction cadence: the refreshed order restores the candidate ratio") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = graft.operators.Dedup.compactionCadence(docs).collect()
      .map(r => r.getAs[String]("phase") ->
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_probe_docs"))).toMap
    val (candApp, nApp) = rows("appended")
    val (candCmp, nCmp) = rows("compacted")
    assert(nApp === nCmp, "probe population is phase-invariant")
    // the frozen order ranks every appended-only shingle first at dfreq 0,
    // so pre-compaction prefixes over-select — strictly, on this corpus
    assert(candCmp < candApp,
      s"compaction must cut candidate volume: appended $candApp vs compacted $candCmp")
    // and the restored ratio is the rule's trigger signal: well under half
    assert(candCmp * 2 < candApp,
      s"expected a >2x restoration, got $candApp -> $candCmp")
  }

  test("minhash LSH finds the same dups as exact jaccard here") {
    val lsh = Dedup.minhashLsh(corpus)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(lsh.contains((1L, 4L)))
    assert(lsh.contains((1L, 2L)))
  }

  test("simhash: identical docs share sketch; near-dups are close") {
    val s = Dedup.simhash(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash16")).toMap
    assert(s(1L) === s(4L))
    val hamming = java.lang.Long.bitCount(s(1L) ^ s(2L))
    assert(hamming <= 6, s"near-dup hamming distance $hamming")
    val pairs = Dedup.simhashPairs(corpus)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("token stats, quality, language id, fingerprint") {
    val st = TextOps.tokenStats(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(st(1L).getAs[Long]("n_tokens") === 9L)
    assert(st(1L).getAs[Long]("n_unique_tokens") === 8L) // "the" twice

    val q = TextOps.qualityScore(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(q(1L).getAs[Long]("n_stopwords") === 2L) // "the" ×2
    assert(q(1L).getAs[Double]("punct_ratio") === 0.0)

    val lang = TextOps.languageId(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(lang(1L) === "en")
    assert(lang(5L) === "und")

    val fp = TextOps.fingerprint(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fingerprint")).toMap
    assert(fp(1L) === fp(4L))
    assert(fp(1L) !== fp(3L))
  }

  private def embeddings(rows: (Long, Seq[Float])*): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private val vecs = embeddings(
    0L -> Seq(1f, 0f, 0f, 0f),
    1L -> Seq(0.9f, 0.1f, 0f, 0f), // close to 0
    2L -> Seq(0f, 1f, 0f, 0f),
    3L -> Seq(0f, 0f, 1f, 0f),
    4L -> Seq(-1f, 0f, 0f, 0f))

  test("brute-force cosine top-k ranks by similarity") {
    val res = Similarity.bruteForceTopK(vecs, nQueries = 1, k = 2).collect()
    assert(res.length === 2)
    assert(res(0).getAs[Long]("neighbor_id") === 1L) // most similar to vec 0
    assert(res(0).getAs[Double]("cosine_sim") > 0.99)
    assert(res(1).getAs[Double]("cosine_sim") === 0.0)
  }

  test("near-dup pairs by cosine threshold") {
    val pairs = Similarity.nearDupPairs(vecs, 0.9).collect()
    assert(pairs.length === 1)
    assert((pairs.head.getAs[Long]("vec_a"), pairs.head.getAs[Long]("vec_b")) === (0L, 1L))
  }

  test("LSH-blocked near-dup pairs equal the exact all-pairs result on sf0.001") {
    val emb = graft.sources.Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001")
    val exact = Similarity.nearDupPairs(emb, 0.45).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    val lsh = Similarity.nearDupPairsLsh(emb, 0.45)
    // the scale property: candidate generation is keyed joins, never a
    // cartesian/broadcast-nested-loop product
    assert(!lsh.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val got = lsh.collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    assert(got === exact) // 100% recall with the b=5,T=48 plane family
  }

  test("lsh bucketing keeps identical vectors together") {
    val dup = embeddings(0L -> Seq.fill(64)(0.5f), 1L -> Seq.fill(64)(0.5f),
      2L -> Seq.tabulate(64)(i => if (i % 2 == 0) 1f else -1f))
    val b = dup.withColumn("bucket", Similarity.lshBucket(org.apache.spark.sql.functions.col("embedding"), 4))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("bucket")).toMap
    assert(b(0L) === b(1L))
  }

  test("pair kernels mirror the join formulation on degenerate vectors") {
    import org.apache.spark.sql.functions.col
    // duplicate vec_id (never a self-pair), zero vector (null cosine →
    // dropped), NaN component (NaN sorts greatest in both engines' SQL
    // comparison, so a NaN cosine PASSES the threshold and is emitted —
    // Spark's round() passes NaN through; BigDecimal.valueOf would throw)
    val df = embeddings(
      0L -> Seq(1f, 0f, 0f, 0f),
      0L -> Seq(1f, 0f, 0f, 0f), // duplicated id
      1L -> Seq(0f, 0f, 0f, 0f), // zero vector
      2L -> Seq(Float.NaN, 1f, 0f, 0f),
      3L -> Seq(0.99f, 0.14f, 0f, 0f))
    val out = graft.operators.Similarity.nearDupPairs(df, 0.9, blocks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(!out.exists(p => p._1 == p._2), "no self-pairs from duplicate ids")
    // zero vector: denom 0 against finite vectors → null cosine → dropped;
    // against the NaN vector denom is 0·NaN = NaN (NaN === 0 is false, so
    // safeDenom passes it through) → NaN cosine → emitted, like the join
    assert(!out.exists(p => Set(p._1, p._2) == Set(0L, 1L) || Set(p._1, p._2) == Set(1L, 3L)),
      "zero vector drops against finite vectors (null cosine)")
    val nanPairs = out.filter(p => p._1 == 2L || p._2 == 2L)
    assert(nanPairs.nonEmpty && nanPairs.forall(p => p._3.isNaN),
      "NaN cosine passes the threshold as in Spark SQL comparison semantics")
    assert(out.exists(p => (p._1, p._2) == (0L, 3L) && p._3 >= 0.9))
  }

  test("pair kernels skip null embeddings like the join's null propagation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((0L, Some(Seq(1f, 0f))), (1L, Option.empty[Seq[Float]]),
        (2L, Some(Seq(1f, 0f))))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.nearDupPairs(df, 0.5, blocks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((0L, 2L)))
  }

  test("compiled lsh bucket equals the declarative column on real vectors") {
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001")
    val rows = emb
      .withColumn("ref", Similarity.lshBucket(col("embedding"), 4))
      .withColumn("fast", Similarity.lshBucketCompiled(TestSpark.spark, col("embedding"), 4))
      .select(col("ref").cast("long"), col("fast"))
      .collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("IVF with full probing equals brute force; partial probing has recall") {
    val emb = graft.sources.Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001")
    val bf = Similarity.bruteForceTopK(emb, nQueries = 5, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // probing ALL cells must reproduce exact brute force
    val full = Similarity.ivfTopK(emb, nQueries = 5, k = 5, nCentroids = 4, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(full === bf)
    // partial probing: sane output shape and non-trivial recall
    val part = Similarity.ivfTopK(emb, nQueries = 5, k = 5, nCentroids = 4, nProbe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(part.size === 25)
    val recall = (part intersect bf).size.toDouble / bf.size
    assert(recall >= 0.2, s"recall $recall")
  }

  test("keep-best dedup keeps the cleanest member, not the lowest id") {
    import spark.implicits._
    // cluster {1,2,3}: doc 3 is longest/cleanest -> survivor despite max id;
    // cluster {5,6}: tie on quality -> lowest id 5 survives; doc 9 singleton
    val d = docs(
      1L -> "short text",
      2L -> "short text here",
      3L -> Seq.fill(50)("clean").mkString(" "),
      5L -> "same quality text here now",
      6L -> "same quality text here now",
      9L -> "unpaired document")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.keepBest(d, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.map(_._1).toSet === Set(1L, 2L, 6L)) // removed rows only
    assert(out.filter(_._2 == 1L).forall(_._3 == 3L)) // survivor is the cleanest
    assert(out.filter(_._2 == 5L).forall(_._3 == 5L)) // quality tie -> lowest id
    assert(!out.exists(_._1 == 9L)) // singletons never emit
  }

  test("kmeans clusters: total assignment, consistent sizes, separable toy data") {
    // two tight groups around e1 and e2; k=2 with init from the two lowest
    // ids (one from each axis) must separate them
    val toy = embeddings(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(0.9f, 0.1f, 0f, 0f),
      3L -> Seq(0.1f, 0.9f, 0f, 0f),
      4L -> Seq(0.8f, 0f, 0.1f, 0f),
      5L -> Seq(0f, 0.8f, 0.1f, 0f))
    val out = Similarity.kmeansClusters(toy, nCentroids = 2, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L, 5L)) // every vector labeled once
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster(0L) === Set(0L, 2L, 4L)) // the e1 group with its init
    assert(byCluster(1L) === Set(1L, 3L, 5L))
    assert(out.forall { case (_, c, sz) => sz === byCluster(c).size.toLong })
  }

  test("diversity sample caps per cluster and matches the hash-rank choice") {
    val emb = graft.sources.Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001")
    val cap = 3
    val s = Similarity.diversitySample(emb, perCluster = cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s.forall(_._3 <= cap))
    // per cluster: ranks are dense from 1 and the kept ids are the cap
    // lowest (hash, id) members of that cluster's full assignment
    val full = Similarity.kmeansClusters(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    def hv(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16)
    }
    s.groupBy(_._2).foreach { case (cluster, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length).map(_.toLong))
      val expect = full.filter(_._2 == cluster).map(_._1)
        .sortBy(id => (hv(id), id)).take(cap).toSet
      assert(rows.map(_._1).toSet === expect, s"cluster $cluster")
    }
  }

  test("phash groups: hand-computed bits, identical payloads group, singletons drop") {
    // 16 'a' + 16 'z': 32 one-char blocks, global mean 109.5 — the 'z'
    // half (bits 16..31) exceeds it, the 'a' half doesn't
    val half = "a" * 16 + "z" * 16
    val d = docs(1L -> half, 2L -> half, 3L -> "completely different text here")
    val out = Multimodal.phashGroups(Multimodal.withMedia(d)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L)) // the singleton never emits
    assert(out.forall(_._2 === 0xFFFF0000L))
    assert(out.forall(_._3 === 1L)) // canonical = min member
    assert(out.forall(_._4 === 2L))
  }

  test("pq codes: valid ranges, near-nonnegative error, m=1 equals kmeans") {
    val emb = graft.sources.Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001")
    val pq = Similarity.pqCodes(emb).collect()
    assert(pq.nonEmpty)
    pq.foreach { r =>
      (1 to 4).foreach(i => assert(r.getLong(i) >= 0L && r.getLong(i) < 8L))
      // ||v-c||^2 recomposed from fp paths may dip a few micro-units negative
      if (!r.isNullAt(5)) assert(r.getLong(5) >= -8L, s"err ${r.getLong(5)}")
    }
    // degenerate PQ (one subspace = the whole vector) IS the k-means
    // quantizer: codes must match cluster labels exactly
    val one = Similarity.pqCodes(emb, m = 1, subDim = 64, k = 8, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val km = Similarity.kmeansClusters(emb, nCentroids = 8, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === km)
  }

  test("pq ADC top-k: shape, per-query monotone scores, non-trivial recall") {
    val emb = graft.sources.Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001")
    val pq = Similarity.pqTopK(emb, nQueries = 5, kTop = 5).collect()
    assert(pq.length === 25)
    pq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getLong(3))
      assert(ordered.map(_.getLong(3)).toSeq === (1L to 5L))
      val scores = ordered.map(_.getAs[Long]("adc_micros"))
      assert(scores.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
    // compressed scan must still find a decent share of the true top-5 —
    // measured against EXACT L2 (ADC approximates L2, not cosine; the
    // brute-force cosine ranking is a different metric on unnormalized
    // vectors and not the right baseline)
    val all = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val exact = (0L until 5L).flatMap { qid =>
      val qe = all(qid)
      all.toSeq.filter(_._1 != qid)
        .map { case (id, v) =>
          var d2 = 0.0
          var i = 0
          while (i < 64) { val t = qe(i) - v(i); d2 += t * t; i += 1 }
          (id, d2)
        }
        .sortBy { case (id, d2) => (d2, id) }.take(5).map(p => (qid, p._1))
    }.toSet
    val got = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"ADC recall $recall vs exact L2")
  }

  test("multimodal image decode: real PNG round-trip matches the analytic pixels") {
    val media = Multimodal.withImagePayloads(corpus)
    assert(media.schema("media").dataType.typeName === "binary")
    // payloads must be genuine PNGs (magic bytes), not passthrough buffers
    val payload = media.filter(org.apache.spark.sql.functions.col("doc_id") === 1L)
      .collect().head.getAs[Array[Byte]]("media")
    assert(payload.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // decode output must equal the fixture formula, computed independently
    for (id <- feats.keys) {
      val w = 4 + java.lang.Math.floorMod(id, 5L).toInt
      val h = 3 + java.lang.Math.floorMod(id, 4L).toInt
      val pix = for { y <- 0 until h; x <- 0 until w }
        yield java.lang.Math.floorMod(id * 31 + 7L * x + 13L * y, 256L)
      val r = feats(id)
      assert(r.getAs[Long]("img_w") === w.toLong, s"doc $id width")
      assert(r.getAs[Long]("img_h") === h.toLong, s"doc $id height")
      assert(r.getAs[Long]("px_sum") === pix.sum, s"doc $id pixel sum")
      assert(r.getAs[Long]("px_min") === pix.min, s"doc $id pixel min")
      assert(r.getAs[Long]("px_max") === pix.max, s"doc $id pixel max")
    }
  }

  test("multimodal resize and frame sampling keep schema and determinism") {
    val media = Multimodal.withMedia(corpus)
    val resized = Multimodal.resize(media, targetBytes = 16).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(resized(1L).getAs[Array[Byte]]("media").length === 16)
    assert(resized(1L).getAs[Long]("orig_bytes") === 43L)
    assert(resized(5L).getAs[Array[Byte]]("media").length === 4) // "tiny" shorter than target
    // deterministic: same input → same bytes
    val again = Multimodal.resize(media, targetBytes = 16).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("media").toSeq).toMap
    assert(again(1L) === resized(1L).getAs[Array[Byte]]("media").toSeq)

    val frames = Multimodal.sampleFrames(media, frameBytes = 10, everyNth = 2).collect()
      .filter(_.getAs[Long]("doc_id") == 1L)
    // 43 bytes → 5 chunks (10,10,10,10,3) → sampled indexes 0,2,4
    assert(frames.map(_.getAs[Int]("frame_index")).sorted.toSeq === Seq(0, 2, 4))
    assert(frames.find(_.getAs[Int]("frame_index") == 4).get.getAs[Long]("n_bytes") === 3L)
    assert(frames.forall(_.getAs[String]("frame_md5").length === 32))
  }

  test("ivf indexed probe: replays ivfTopK exactly and prunes to the probed cell partitions") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idx = "/tmp/graft_spec_ivf_idx"
    Similarity.buildIvfIndex(emb, idx)
    val indexed = Similarity.ivfIndexedTopK(emb, idx)
    assert(indexed.collect().toSeq === Similarity.ivfTopK(emb).collect().toSeq)
    val p = indexed.queryExecution.executedPlan.toString
    val postingsScans = p.linesIterator.filter(_.contains(s"$idx/cells")).mkString("\n")
    assert(postingsScans.contains("PartitionFilters") && postingsScans.contains("cell"),
      s"postings scan must carry a cell partition filter:\n$p")
  }

  test("ivf posting compaction: one file per cell, probe bit-identical across the swap") {
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val isNew = org.apache.spark.sql.functions.substring(
      org.apache.spark.sql.functions.md5(
        col("vec_id").cast("string").cast("binary")), 1, 1) < "2"
    val idx = java.nio.file.Files.createTempDirectory("graft_ivfcmp_spec_").toString
    Similarity.buildIvfIndex(emb.filter(!isNew), idx)
    Similarity.appendToIvfIndex(emb.filter(isNew), idx)
    val before = Similarity.ivfIndexedTopK(emb, idx).collect().toSeq
    // the append left multiple posting files in the touched cells
    def cellFiles(gen: Int): Map[String, Int] = {
      val root = new java.io.File(
        graft.operators.IndexManifest.treePath(idx, "cells", gen))
      Option(root.listFiles()).toSeq.flatten.filter(_.getName.startsWith("cell="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val genBefore = graft.operators.IndexManifest.generation(idx)
    assert(cellFiles(genBefore).values.exists(_ > 1),
      "append must have fragmented at least one cell's postings")
    // a probe PLAN resolved pre-swap must stay valid after it (retention)
    val preSwapProbe = Similarity.ivfIndexedTopK(emb, idx)
    Similarity.compactIvfIndex(spark, idx)
    val genAfter = graft.operators.IndexManifest.generation(idx)
    assert(genAfter === genBefore + 1, "compaction must advance the manifest")
    assert(preSwapProbe.collect().toSeq === before,
      "pre-swap probe must read the retained generation bit-identically")
    // fresh probe reads the compacted tree: identical results, 1 file/cell,
    // and the partition pruning survives the generation swap
    val freshProbe = Similarity.ivfIndexedTopK(emb, idx)
    assert(freshProbe.collect().toSeq === before)
    val fp = freshProbe.queryExecution.executedPlan.toString
    val compactedScan = fp.linesIterator
      .filter(_.contains(s"cells_g$genAfter")).mkString("\n")
    assert(compactedScan.contains("PartitionFilters") && compactedScan.contains("cell"),
      s"compacted postings scan must keep the cell partition filter:\n$fp")
    val after = cellFiles(genAfter)
    assert(after.nonEmpty && after.values.forall(_ === 1),
      s"compacted cells must hold exactly one posting file each: $after")
  }
}
