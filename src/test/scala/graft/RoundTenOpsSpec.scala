package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.{TrainPrep, Validators}

/** Round-10 additions: higher-moment distribution profiling, robust MAD
  * outlier screening, the learned Naive Bayes language classifier, and
  * DPO-style preference-pair construction. */
class RoundTenOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def eventsDf(rows: (String, Double)*) = {
    import spark.implicits._
    rows.toDF("event_type", "value")
  }

  test("momentsProfile: symmetric data has zero skew; a right tail makes it positive") {
    // symmetric around 3.00: mean 3, skew exactly 0
    val sym = eventsDf(Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("s", _)): _*)
    // same five points plus a far right whale: positive skew, fat tail
    val skw = eventsDf((Seq(1.0, 2.0, 3.0, 4.0, 5.0, 50.0).map(("r", _))): _*)
    val r = Validators.momentsProfile(sym.unionAll(skw))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("s").getAs[Double]("mean_value") === 3.0)
    assert(r("s").getAs[Double]("skewness") === 0.0)
    // variance of {1..5} is 2 -> stddev sqrt(2)
    assert(math.abs(r("s").getAs[Double]("stddev_value") - math.sqrt(2.0)) < 1e-6)
    assert(r("r").getAs[Double]("skewness") > 1.5)
    assert(r("r").getAs[Double]("kurtosis_excess") > r("s").getAs[Double]("kurtosis_excess"))
  }

  test("momentsProfile: constant group yields null shape stats, not a crash") {
    val const = eventsDf(Seq.fill(4)(("c", 7.25)): _*)
    val row = Validators.momentsProfile(const).collect().head
    assert(row.getAs[Long]("n") === 4L)
    assert(row.getAs[Double]("mean_value") === 7.25)
    assert(row.getAs[Double]("stddev_value") === 0.0)
    // m2 = 0 -> NULLIF guards: skew/kurt are null, the ANSI-safe contract
    assert(row.isNullAt(row.fieldIndex("skewness")))
    assert(row.isNullAt(row.fieldIndex("kurtosis_excess")))
  }

  test("madOutliers: exact median/MAD on a known set; planted whale is fenced") {
    // values 1..9 plus whale 1000: median 5.5, deviations {4.5,3.5,...,994.5}
    val v = (1 to 9).map(_.toDouble) :+ 1000.0
    val row = Validators.madOutliers(eventsDf(v.map(("t", _)): _*)).collect().head
    assert(row.getAs[Long]("n") === 10L)
    assert(row.getAs[Double]("median_value") === 5.5)
    // adevs sorted: 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5 -> median 2.5
    assert(row.getAs[Double]("mad_value") === 2.5)
    // fence = 4.4478 * 2.5 = 11.1195 -> only the whale exceeds it
    assert(row.getAs[Long]("n_outliers") === 1L)
    assert(row.getAs[Double]("outlier_share") === 0.1)
  }

  test("madOutliers: the fence is robust where the moments fence is masked") {
    // two whales drag mean/stddev enough that a 2-sigma moment fence sees
    // only them by construction — MAD still flags exactly the whales and
    // its median/MAD stay at the bulk's values (50% breakdown point)
    val bulk = (1 to 20).map(i => ("m", (i % 5 + 1).toDouble))
    val whales = Seq(("m", 500.0), ("m", 600.0))
    val row = Validators.madOutliers(eventsDf((bulk ++ whales): _*)).collect().head
    assert(row.getAs[Double]("median_value") === 3.0)
    assert(row.getAs[Long]("n_outliers") === 2L)
  }

  test("nbLangConfusion: separable vocabularies classify perfectly on the held-out split") {
    import spark.implicits._
    // disjoint per-lang vocabularies -> NB must get every held-out doc right
    val docs = (1 to 120).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      val word = Map("aa" -> "alpha", "bb" -> "beta", "cc" -> "gamma")(lang)
      (i.toLong, s"$word $word common$i $word", lang)
    }.toDF("doc_id", "text", "lang")
    val conf = TextOps.nbLangConfusion(docs).collect()
    assert(conf.nonEmpty)
    assert(conf.forall(r => r.getString(0) === r.getString(1)),
      s"off-diagonal predictions with disjoint vocab: ${conf.mkString(",")}")
    // every held-out doc is classified exactly once
    val nTest = docs.filter(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) >= "d").count()
    assert(conf.map(_.getAs[Long]("n_docs")).sum === nTest)
  }

  test("nbLangConfusion: priors dominate for content-free docs") {
    import spark.implicits._
    // identical text everywhere -> only the prior differs; the majority
    // lang of the TRAIN split must be predicted for every held-out doc
    val docs = (1 to 200).map { i =>
      (i.toLong, "same same same", if (i <= 150) "big" else "small")
    }.toDF("doc_id", "text", "lang")
    val conf = TextOps.nbLangConfusion(docs).collect()
    assert(conf.forall(_.getString(1) === "big"))
  }

  test("preferencePairs: chosen strictly beats rejected, pairs come from the sketch graph") {
    import spark.implicits._
    // three near-identical docs (equal simhash by construction: same token
    // multiset) with different punctuation density -> different quality
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again", "en"),
      (2L, "the quick brown fox jumps over the lazy dog again!!!!!!!!!!", "en"),
      (3L, "completely unrelated text about spark shuffles and joins", "en"))
      .toDF("doc_id", "text", "lang").withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val pairs = TrainPrep.preferencePairs(docs).collect()
    pairs.foreach { p =>
      assert(p.getAs[Double]("chosen_score") > p.getAs[Double]("rejected_score"))
      assert(p.getAs[Double]("margin") > 0.0)
    }
    // doc 3 shares no sketch bucket with 1/2 in this construction — every
    // emitted pair must be a simhash-equal pair
    val sketchPairs = graft.operators.Dedup.simhashPairs(docs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.foreach { p =>
      val a = math.min(p.getAs[Long]("chosen_doc"), p.getAs[Long]("rejected_doc"))
      val b = math.max(p.getAs[Long]("chosen_doc"), p.getAs[Long]("rejected_doc"))
      assert(sketchPairs.contains((a, b)))
    }
  }

  test("preferencePairs: equal-quality near-dups are dropped, not tie-broken") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en"),
      (2L, "alpha beta gamma delta", "en")) // identical -> identical quality
      .toDF("doc_id", "text", "lang").withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    assert(TrainPrep.preferencePairs(docs).count() === 0L)
  }
}
