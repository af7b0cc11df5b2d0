package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{FuzzyJoin, Search}

/** Round-8 retrieval additions: BM25 lexical top-k, lexical×dense hybrid
  * fusion, and the edit-distance fuzzy join (lossless q-gram blocking). */
class SearchFuzzySpec extends AnyFunSuite {
  import TestSpark._

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- BM25 ----

  test("bm25TopK: rare matching term dominates; self excluded; k bound") {
    // query doc 0: "alpha beta"; alpha is rare (docs 1 only), beta common
    val d = docsDf(
      (0L, "alpha beta"),
      (1L, "alpha gamma gamma"),
      (2L, "beta gamma gamma"),
      (3L, "beta beta gamma"),
      (4L, "gamma gamma gamma"))
    val r = Search.bm25TopK(d, nQueries = 1, k = 10).collect()
    assert(r.forall(_.getLong(0) == 0L))
    assert(r.forall(_.getLong(1) != 0L), "query doc must not rank itself")
    // doc 4 shares no term with the query: pruned entirely
    assert(!r.exists(_.getLong(1) == 4L))
    val byRank = r.sortBy(_.getAs[Long]("rank")).map(_.getLong(1)).toSeq
    // rare 'alpha' (df=2) outweighs common 'beta' (df=3): doc 1 first
    assert(byRank.head === 1L)
    // scores strictly positive and ranks contiguous from 1
    assert(r.forall(_.getAs[Long]("score_micro") > 0L))
    assert(r.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to byRank.size))
  }

  test("bm25TopK: longer doc scores below shorter doc at equal tf (length normalization)") {
    val filler = (1 to 30).map(i => s"f$i").mkString(" ")
    val d = docsDf(
      (0L, "needle"),
      (1L, "needle pad pad"),
      (2L, s"needle $filler"))
    val r = Search.bm25TopK(d, nQueries = 1, k = 10).collect()
      .map(x => x.getLong(1) -> x.getAs[Long]("score_micro")).toMap
    assert(r(1L) > r(2L), "same tf, longer doc must score lower")
  }

  test("bm25 persisted index: build+append+compact probes ≡ the census path") {
    val d = docsDf(
      (0L, "alpha beta"),
      (1L, "alpha gamma gamma"),
      (2L, "beta gamma gamma"),
      (3L, "beta beta gamma"),
      (4L, "gamma gamma gamma"),
      (5L, "alpha alpha beta"),
      (6L, ""), // empty doc: no postings, but counts in n_docs
      (7L, "beta delta"))
    val expected = Search.bm25TopK(d, nQueries = 2, k = 3).collect().toSeq

    val idx = java.nio.file.Files.createTempDirectory("graft_bm25_spec_").toString
    try {
      // split by parity: build on evens, append odds — union is the corpus
      Search.buildBm25Index(d.filter(col("doc_id") % 2 === 0), idx)
      Search.appendToBm25Index(d.filter(col("doc_id") % 2 === 1), idx)
      val appended = Search.bm25IndexedTopK(d, idx, nQueries = 2, k = 3).collect().toSeq
      assert(appended === expected, "append-path probe must equal the census path")

      // compaction is identity; the generation pointer must advance and
      // the previous generation stay readable (retained through the swap)
      val genBefore = graft.operators.IndexManifest.generation(idx)
      Search.compactBm25Index(spark, idx)
      assert(graft.operators.IndexManifest.generation(idx) === genBefore + 1)
      val compacted = Search.bm25IndexedTopK(d, idx, nQueries = 2, k = 3).collect().toSeq
      assert(compacted === expected, "compacted probe must be bit-identical")
      // df partials re-merged: exactly one row per term in the new tree
      val dfreq = spark.read.parquet(graft.operators.IndexManifest.treePath(
        idx, "dfreq", genBefore + 1))
      assert(dfreq.groupBy("term").count().filter(col("count") > 1).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
    }
  }

  // ---- hybrid fusion ----

  test("hybridRrf: a doc top in BOTH retrievers outranks single-list docs") {
    import spark.implicits._
    val d = docsDf(
      (0L, "alpha beta"),
      (1L, "alpha beta"),   // lexical twin of the query
      (2L, "gamma delta"),  // lexically unrelated
      (3L, "alpha epsilon"))
    // embeddings: id 1 is also the dense nearest neighbor of query 0
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.14f), 0),
      (2L, Array(0.95f, 0.31f), 0),
      (3L, Array(0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val r = Search.hybridRrf(d, e, nQueries = 1, k = 3, poolK = 3).collect()
    val first = r.minBy(_.getAs[Long]("fused_rank"))
    assert(first.getLong(1) === 1L)
    // fused contributions: present-in-one-list rows carry a null rank on the
    // other side and still fuse (full outer join semantics)
    assert(r.exists(x => x.isNullAt(x.fieldIndex("rank_lex")) ||
      x.isNullAt(x.fieldIndex("rank_dense"))))
  }

  // ---- fuzzy join ----

  private def bruteForcePairs(names: Seq[String], d: Int): Set[(String, String)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    (for {
      a <- names; b <- names
      if a < b && lev(a, b) <= d
    } yield (a, b)).toSet
  }

  test("editDistancePairs: matches brute force on a name corpus (lossless blocking)") {
    import spark.implicits._
    val names = Seq(
      "blue bolt", "blue belt", "glue bolt", "red widget", "red wídget",
      "old ring", "cold ring", "gold ring", "bold rings", "totally other",
      "ab", "ba", "abc", "xyz", "abcd", // short bucket: gram filter unsafe here
      "anchor", "anchors", "rancho", "plume", "plumes")
    val df = names.map(Tuple1(_)).toDF("p_name")
    val got = FuzzyJoin.editDistancePairs(df, d = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === bruteForcePairs(names, 2))
  }

  test("editDistancePairs: reports the exact distance and respects threshold 1") {
    import spark.implicits._
    val df = Seq("cold bolt", "old bolt", "old belt", "warm bolt")
      .map(Tuple1(_)).toDF("p_name")
    val rows = FuzzyJoin.editDistancePairs(df, d = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("edit_distance")).toMap
    assert(rows.keySet === Set(("cold bolt", "old bolt"), ("old belt", "old bolt")))
    assert(rows.values.forall(_ == 1L))
  }

  test("editDistancePairs: duplicate input rows collapse to the distinct name domain") {
    import spark.implicits._
    val df = Seq("old rod", "old rod", "old rod", "red rod")
      .map(Tuple1(_)).toDF("p_name")
    val rows = FuzzyJoin.editDistancePairs(df, d = 2).collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "old rod" && rows.head.getString(1) === "red rod")
  }

  test("canonicalNames: transitive chain canonicalizes to the lexicographic min; singletons self-map") {
    import spark.implicits._
    // chain: "belt 00" ~1~ "belt 01" ~1~ "belt 11" (endpoints are 2 apart,
    // still one cluster); "unrelated thing" is a singleton
    val df = Seq("belt 01", "belt 11", "belt 00", "unrelated thing")
      .map(Tuple1(_)).toDF("p_name")
    val r = FuzzyJoin.canonicalNames(df, d = 1).collect()
      .map(x => x.getString(0) -> (x.getString(1), x.getAs[Long]("cluster_size"))).toMap
    assert(r("belt 00") === ("belt 00", 3L))
    assert(r("belt 01") === ("belt 00", 3L))
    assert(r("belt 11") === ("belt 00", 3L))
    assert(r("unrelated thing") === ("unrelated thing", 1L))
  }

  // ---- grouped least squares ----

  test("linregProfile: exact linear relation recovers slope/intercept with r2=1; constant x yields nulls") {
    import spark.implicits._
    import graft.operators.Validators
    // source a: y = 3x + 2 exactly (x = token count, y = n_chars)
    val a = Seq((1L, "t", 5L), (2L, "t t", 8L), (3L, "t t t", 11L), (4L, "t t t t", 14L))
      .map { case (id, txt, nc) => (id, txt, "a", nc) }
    // source b: constant x (every doc has 2 tokens) → degenerate fit
    val b = Seq((10L, "u u", 7L), (11L, "v v", 9L))
      .map { case (id, txt, nc) => (id, txt, "b", nc) }
    val docs = (a ++ b).toDF("doc_id", "text", "source", "n_chars")
    val r = Validators.linregProfile(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("a").getAs[Double]("slope") === 3.0)
    assert(r("a").getAs[Double]("intercept") === 2.0)
    assert(r("a").getAs[Double]("r2") === 1.0)
    assert(r("a").getAs[Long]("n") === 4L)
    assert(r("b").isNullAt(r("b").fieldIndex("slope")))
    assert(r("b").isNullAt(r("b").fieldIndex("r2")))
  }

  test("phraseTopK: counts CONSECUTIVE occurrences only; reordered tokens do not match") {
    val d = docsDf(
      (0L, "fast table scan"),         // phrase = "fast table"
      (1L, "fast table fast table x"), // 2 consecutive occurrences
      (2L, "table fast go"),           // reversed — no match
      (3L, "a fast table b"))          // 1 occurrence
    val r = Search.phraseTopK(d, nQueries = 1, k = 10).collect()
    val counts = r.map(x => x.getLong(1) -> x.getAs[Long]("n_occurrences")).toMap
    assert(counts === Map(1L -> 2L, 3L -> 1L))
    assert(r.forall(_.getAs[String]("phrase") == "fast table"))
    val first = r.minBy(_.getAs[Long]("rank"))
    assert(first.getLong(1) === 1L)
  }

  test("corrProfile: perfect positive and negative correlations; zero-variance axis yields null") {
    import graft.operators.Validators
    import spark.implicits._
    // flag A: price = 100*qty (r=+1), discount = constant (null corr)
    // flag B: price decreases as qty increases (r=-1), discount tracks price (r=+1)
    val rows = Seq(
      ("A", 1.0, 100.0, 0.05), ("A", 2.0, 200.0, 0.05), ("A", 3.0, 300.0, 0.05),
      ("B", 1.0, 300.0, 0.03), ("B", 2.0, 200.0, 0.02), ("B", 3.0, 100.0, 0.01))
    val li = rows.toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
    val r = Validators.corrProfile(li).collect().map(x => x.getString(0) -> x).toMap
    assert(r("A").getAs[Double]("corr_qty_price") === 1.0)
    assert(r("A").isNullAt(r("A").fieldIndex("corr_disc_price")))
    assert(r("B").getAs[Double]("corr_qty_price") === -1.0)
    assert(r("B").getAs[Double]("corr_disc_price") === 1.0)
    assert(r("A").getAs[Long]("n") === 3L)
  }
}
