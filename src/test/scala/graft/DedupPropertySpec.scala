package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Dedup

/** Property-based pins for the two lossless rewrites landed in round 2:
  *
  *  1. the prefix-filtered ngramJaccard must equal the plain full
  *     inverted-index join on arbitrary corpora (the Bayardo-style filter
  *     is provably lossless at the threshold; this checks our
  *     prefix-length/ordering arithmetic against a reference impl);
  *  2. the single-pass codegen MinHash signature must equal the
  *     per-position array_min(transform(...)) formulation bit-for-bit.
  *
  * Small vocabularies deliberately force hot (high-doc-frequency) shingles,
  * repeated docs, and boundary-size documents (< n tokens).
  */
class DedupPropertySpec extends AnyFunSuite {
  import TestSpark._

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 25)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 12)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "dog", "cat")) // tiny vocab → hot shingles
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def docsDf(docs: List[(Long, String)]) = {
    import org.apache.spark.sql.Encoders
    spark.createDataset(docs)(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .toDF("doc_id", "text")
  }

  /** The plain (unfiltered) inverted-index join — the pre-round-2 reference
    * formulation, kept here as the differential baseline. */
  private def ngramJaccardFull(docs: org.apache.spark.sql.DataFrame,
      n: Int = 3, threshold: Double = 0.5) = {
    val sh = graft.functions.TextOps.withShingles(docs, n)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("sz"))
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    inv.as("a").join(inv.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .withColumn("jaccard_raw",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard_raw") >= threshold)
      .withColumn("jaccard", round(col("jaccard_raw"), 4))
      .select("doc_a", "doc_b", "jaccard")
  }

  test("prefix-filtered ngramJaccard equals the full inverted-index join") {
    check(Prop.forAll(genDocs) { docs =>
      val df = docsDf(docs)
      val got = Dedup.ngramJaccard(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = ngramJaccardFull(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      got == want
    })
  }

  test("compiled word_ngrams kernel equals the declarative shingle formulation") {
    graft.functions.TextExpressions.register(spark, 3)
    check(Prop.forAll(genDocs) { docs =>
      val df = graft.functions.TextOps.withTokens(docsDf(docs))
      val rows = df.select(col("doc_id"),
          call_function("word_ngrams_distinct_3", col("toks")).as("fast"),
          graft.functions.TextOps.shinglesOf(col("toks"), 3).as("ref"),
          call_function("word_ngrams_pos_3", col("toks")).as("fast_pos"),
          when(size(col("toks")) >= 3, transform(
            sequence(lit(1), size(col("toks")) - lit(2)),
            i => concat_ws(" ", slice(col("toks"), i, lit(3)))))
            .otherwise(array().cast("array<string>")).as("ref_pos"))
        .collect()
      rows.forall(r => r.getSeq[String](1) == r.getSeq[String](2) &&
        r.getSeq[String](3) == r.getSeq[String](4))
    }, n = 10)
  }

  test("single-pass minhash signature equals the per-position formulation") {
    graft.functions.HashExpressions.register(spark)
    check(Prop.forAll(genDocs) { docs =>
      val hv = graft.functions.TextOps.withShingles(docsDf(docs), 3)
        .withColumn("hv", transform(col("sh"), x =>
          conv(substring(md5(x.cast("binary")), 1, 8), 16, 10).cast("long") % Dedup.MinhashPrime))
      val perPosition = (0 until 12).map { i =>
        val (a, b) = Dedup.MinhashSeeds(i)
        array_min(transform(col("hv"), h => (lit(a) * h + lit(b)) % Dedup.MinhashPrime))
      }
      val rows = hv.select(col("doc_id"),
          call_function("minhash_sig", col("hv")).as("sig"),
          array(perPosition: _*).as("ref")).collect()
      rows.forall(r => r.getSeq[Long](1) == r.getSeq[Long](2))
    }, n = 10)
  }

  test("compiled simhash16 kernel equals the 16-lambda aggregate formulation") {
    graft.functions.TextExpressions.registerSimhash(spark)
    check(Prop.forAll(genDocs) { docs =>
      val hvDf = graft.functions.TextOps.withTokens(docsDf(docs)).select(col("doc_id"),
        col("toks"),
        transform(array_distinct(col("toks")), t =>
          conv(substring(md5(t.cast("binary")), 1, 4), 16, 10).cast("int")).as("hv"))
      val bitCols = (0 until 16).map { b =>
        val contrib = aggregate(col("hv"), lit(0),
          (acc, v) => acc + (shiftright(v, b).bitwiseAND(1) * 2 - 1))
        when(contrib >= 0, lit(1 << b)).otherwise(lit(0))
      }
      val rows = hvDf.select(col("doc_id"),
          call_function("simhash16", col("toks")).as("fast"),
          bitCols.reduce(_ + _).cast("long").as("ref"))
        .collect()
      rows.forall(r => r.getLong(1) == r.getLong(2))
    }, n = 10)
  }

  test("compiled winnow kernel equals the declarative md5/slice formulation") {
    val n = 3
    val w = 4
    check(Prop.forAll(genDocs) { docs =>
      val df = docsDf(docs)
      graft.functions.TextExpressions.register(spark, n)
      graft.functions.TextExpressions.registerWinnow(spark, n, w)
      val hashes = transform(call_function(s"word_ngrams_pos_$n", col("toks")), x =>
        conv(substring(md5(x.cast("binary")), 1, 8), 16, 10).cast("long"))
      val windowMins = transform(
        sequence(lit(1), size(col("hv")) - lit(w - 1)),
        j => array_min(slice(col("hv"), j, lit(w))))
      val rows = graft.functions.TextOps.withTokens(df)
        .filter(size(col("toks")) >= n + w - 1)
        .withColumn("hv", hashes)
        .select(col("doc_id"),
          call_function(s"winnow_fp_${n}_$w", col("toks")).as("fast"),
          array_distinct(windowMins).as("ref"))
        .collect()
      rows.forall(r => r.getSeq[Long](1) == r.getSeq[Long](2))
    }, n = 10)
  }

  test("containment prefix filter is lossless vs brute-force all-pairs") {
    val threshold = 0.8
    check(Prop.forAll(genDocs) { docs =>
      val df = docsDf(docs)
      val sh = graft.functions.TextOps.withShingles(df, 3)
      // reference: every pair, C = |A∩B| / min(|A|,|B|)
      val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
            least(size(col("a.sh")), size(col("b.sh")))).as("c_raw"))
        .filter(col("c_raw") >= threshold)
        .select(col("doc_a"), col("doc_b"), round(col("c_raw"), 4).as("containment"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val fast = Dedup.containmentPairs(df, 3, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      fast == brute
    }, n = 15)
  }
}
