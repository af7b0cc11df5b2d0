package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.{TrainPrep, Validators}
import graft.queries.EventQueries

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

  test("giniProfile: equality reads 0, a lone whale reads (n-1)/n") {
    val eq = eventsDf(Seq.fill(6)(("eq", 12.34)): _*)
    // 0,0,0,whale: G = (2*4x - 5x)/(4x) - wait, exact: n=4,T=x,S=4x -> 3/4
    val wh = eventsDf(Seq(("wh", 0.0), ("wh", 0.0), ("wh", 0.0), ("wh", 80.0)): _*)
    val r = Validators.giniProfile(eq.unionAll(wh))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("eq").getAs[Long]("gini_micro") === 0L)
    assert(r("wh").getAs[Long]("gini_micro") === 750000L)
    assert(r("wh").getAs[Double]("total_value") === 80.0)
  }

  test("giniProfile: tie runs contribute their exact rank series (census = sorted formula)") {
    // mixed ties: 1,1,2,3,3,3 cents values via 0.01/0.02/0.03
    val v = Seq(0.01, 0.01, 0.02, 0.03, 0.03, 0.03)
    val row = Validators.giniProfile(eventsDf(v.map(("t", _)): _*)).collect().head
    // sorted cents 1,1,2,3,3,3: S = 1*1+2*1+3*2+4*3+5*3+6*3 = 54, T=13, n=6
    // gini = (2*54 - 7*13) / (6*13) = 17/78 -> 217948 micro (floor)
    assert(row.getAs[Long]("gini_micro") === (17L * 1000000L) / 78L)
  }

  test("embeddingCovariance: hand-checked 2x2 moments on constructed vectors") {
    import spark.implicits._
    // dim0 = {1,2,3}, dim1 = {2,4,6} (perfectly correlated), dim2 = {1,1,1}
    val rows = Seq(
      (1L, Array(1.0f, 2.0f, 1.0f) ++ Array.fill(61)(0.0f)),
      (2L, Array(2.0f, 4.0f, 1.0f) ++ Array.fill(61)(0.0f)),
      (3L, Array(3.0f, 6.0f, 1.0f) ++ Array.fill(61)(0.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val r = graft.operators.Similarity.embeddingCovariance(rows, kDims = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    assert(r.size === 6) // upper triangle of 3 dims
    // population cov(dim0,dim0) = var{1,2,3} = 2/3
    assert(math.abs(r((0L, 0L)).getAs[Double]("cov") - 2.0 / 3.0) < 1e-9)
    // cov(dim0,dim1) = 2*var = 4/3; corr exactly 1
    assert(math.abs(r((0L, 1L)).getAs[Double]("cov") - 4.0 / 3.0) < 1e-9)
    assert(r((0L, 1L)).getAs[Double]("corr") === 1.0)
    // constant dim: zero variance, corr null-guarded
    assert(r((2L, 2L)).getAs[Double]("cov") === 0.0)
    assert(r((0L, 2L)).isNullAt(r((0L, 2L)).fieldIndex("corr")))
  }

  test("cohortLtv: cumulative per-user value tracks the hand computation") {
    import spark.implicits._
    val ts = (m: Int, d: Int) => java.sql.Timestamp.valueOf(f"2024-$m%02d-$d%02d 10:00:00")
    // users 1,2 first active Jan 5 (same day cohort); user 3 joins Jan 6
    val ev = Seq(
      (1L, ts(1, 5), "view", 0.0),
      (2L, ts(1, 5), "purchase", 10.0),   // cohort 01-05, age 0: 10.00
      (1L, ts(1, 7), "purchase", 30.0),   // cohort 01-05, age 2: +30.00
      (3L, ts(1, 6), "view", 0.0),
      (3L, ts(1, 8), "purchase", 8.0))    // cohort 01-06, age 2: 8.00
      .toDF("user_id", "ts", "event_type", "value")
    val r = EventQueries.cohortLtv(ev).collect()
      .map(x => (x.getDate(0).toString, x.getLong(1)) -> x).toMap
    assert(r.size === 3)
    assert(r(("2024-01-05", 0L)).getAs[Long]("n_users") === 2L)
    // age 0: 10.00 cumulative over 2 users -> 5.0/user -> 5e6 micro
    assert(r(("2024-01-05", 0L)).getAs[Long]("ltv_micro") === 5000000L)
    // age 2: cum 40.00 over 2 users -> 20/user
    assert(r(("2024-01-05", 2L)).getAs[Long]("ltv_micro") === 20000000L)
    assert(r(("2024-01-05", 2L)).getAs[Double]("revenue") === 30.0)
    // second cohort: 1 user, age 2 (no age-0/1 rows - gap carries)
    assert(r(("2024-01-06", 2L)).getAs[Long]("n_users") === 1L)
    assert(r(("2024-01-06", 2L)).getAs[Long]("ltv_micro") === 8000000L)
  }

  test("abSrmCheck: cells sum to the user count and the chi2 matches the hand formula") {
    import spark.implicits._
    val ev = (1 to 100).map(u => (u.toLong, "view")).toDF("user_id", "event_type")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("value", lit(1.0))
    val r = EventQueries.abSrmCheck(ev).collect().head
    val n = r.getAs[Long]("n_users")
    val na = r.getAs[Long]("n_a")
    assert(n === 100L)
    assert(na + r.getAs[Long]("n_b") === n)
    // recompute the assignment with the same md5 idiom
    val md = java.security.MessageDigest.getInstance("MD5")
    val expectA = (1 to 100).count { u =>
      val hex = md.digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    assert(na === expectA.toLong)
    val d = 2 * na - n
    assert(r.getAs[Long]("srm_chi2_micro") === d * d * 1000000L / n)
    assert(r.getAs[Boolean]("srm_flag") === (d * d * 1000000L / n > 3841459L))
  }

  test("knBigramLogProb: hand-checked Kneser-Ney probabilities on a two-bigram corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val r = TextOps.knBigramLogProb(docs).collect().head
    assert(r.getAs[Long]("n_bigrams") === 3L)
    // P(b|a) = (2-.75)/2 + (.75*1/2)*(1/2) = 0.8125; P(a|b) = .25/1 + .75*(1/2) = 0.625
    val micro1 = math.floor(math.log(0.8125) * 1e6).toLong
    val micro2 = math.floor(math.log(0.625) * 1e6).toLong
    val expAvg = BigDecimal((2 * micro1 + micro2).toDouble / 3.0 / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("avg_kn_logprob") === expAvg)
    assert(r.getAs[Double]("min_kn_logprob") === BigDecimal(micro2.toDouble / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("knBigramLogProb: degenerate collocations score below reused-context prose") {
    import spark.implicits._
    // 'san francisco' appears often but francisco only ever follows san;
    // in doc B the words appear in varied contexts - KN separates them
    val docs = Seq(
      (1L, "san francisco san francisco san francisco san francisco"),
      (2L, "the cat sat the dog sat the cat ran the dog ran"))
      .toDF("doc_id", "text")
    val r = TextOps.knBigramLogProb(docs).collect()
      .map(x => x.getLong(0) -> x.getAs[Double]("avg_kn_logprob")).toMap
    assert(r(2L) > r(1L) - 2.0, "sanity: both finite") // both defined
    assert(r.size === 2)
  }

  test("hardNegativePairs: near-dups become ranked negatives, exact dups are excluded") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps running fast"
    val docs = Seq(
      (1L, base), (2L, base), // exact dups: hamming 0, never a negative
      (3L, base.replace("dog", "dot")), // near: small hamming to 1/2
      (4L, (1 to 14).map(i => s"zz$i").mkString(" "))) // far content
      .toDF("doc_id", "text")
    val media = graft.operators.Multimodal.withMedia(
      docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text"))))
    val pairs = graft.operators.Multimodal.hardNegativePairs(media).collect()
    val asSet = pairs.map(p => (p.getAs[Long]("anchor_doc"), p.getAs[Long]("neg_doc"))).toSet
    assert(!asSet.contains((1L, 2L)) && !asSet.contains((2L, 1L)),
      "exact duplicates must never be emitted as negatives")
    pairs.foreach { p =>
      val h = p.getAs[Long]("hamming")
      assert(h >= 1L && h <= 8L)
    }
    // ranks are 1..k and bidirectional rows agree on the distance
    pairs.groupBy(_.getAs[Long]("anchor_doc")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.sameElements(1L to rows.length))
    }
  }

  test("embeddingStandardize: the audit reads mean 0 / var 1; constant dims read 0") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(1.0f, 5.0f, 7.0f)), (2L, Array(2.0f, 5.0f, 7.0f)),
      (3L, Array(3.0f, 5.0f, 7.0f)), (4L, Array(4.0f, 5.0f, 7.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val r = graft.operators.Similarity.embeddingStandardize(rows, kDims = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.size === 3)
    // varying dim: mean ~0 (floor-quantization bias, < 100 micro = 1e-4)
    // and var ~1 (±1e-4) — the audit now emits exact INTEGER micro units
    assert(math.abs(r(0L).getAs[Long]("mean_z_micro")) < 100L)
    assert(math.abs(r(0L).getAs[Long]("var_z_micro") - 1000000L) < 100L)
    // constant dims: z = 0 by convention, so mean and var audit to exactly 0
    assert(r(1L).getAs[Long]("mean_z_micro") === 0L)
    assert(r(1L).getAs[Long]("var_z_micro") === 0L)
  }

  test("contractCheck: a clean corpus passes every rule; violations are counted, not crashed") {
    import spark.implicits._
    val clean = Seq(
      (1L, "hello world", "en", "s1"), (2L, "hola mundo", "es", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val r1 = Validators.contractCheck(clean).collect()
    assert(r1.length === 8)
    assert(r1.forall(_.getAs[Boolean]("pass")), r1.mkString(","))

    // plant: duplicate id, bad lang, n_chars drift, null text
    val dirty = Seq(
      (1L, "a b", "en", "s1"), (1L, "c d", "xx", "s1"), (2L, null, "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        when(col("doc_id") === 1L && col("lang") === "xx", lit(999L))
          .otherwise(length(col("text")).cast("long")))
    val r2 = Validators.contractCheck(dirty).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r2("doc_id_unique").getAs[Long]("observed") === 1L)
    assert(!r2("doc_id_unique").getAs[Boolean]("pass"))
    assert(r2("lang_in_domain").getAs[Long]("observed") === 1L)
    // n_chars: one planted drift row + the null-text row both count
    assert(r2("n_chars_matches_text").getAs[Long]("observed") === 2L)
    assert(r2("text_not_null").getAs[Long]("observed") === 1L)
    assert(r2("max_text_len").getAs[Boolean]("pass"))
  }

  test("abPowerAnalysis: cells reconcile; zero delta yields null n_required, not infinity") {
    import spark.implicits._
    val quiet = (1 to 50).map(u => (u.toLong, "view", 1.0))
      .toDF("user_id", "event_type", "value")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val r0 = EventQueries.abPowerAnalysis(quiet).collect().head
    assert(r0.getAs[Long]("n_a") + r0.getAs[Long]("n_b") === 50L)
    assert(r0.getAs[Double]("p_pooled") === 0.0)
    assert(r0.getAs[Double]("delta_observed") === 0.0)
    assert(r0.isNullAt(r0.fieldIndex("n_required_per_arm")))

    // give every user in arm A a purchase: delta = -p_a, power math defined
    val md = java.security.MessageDigest.getInstance("MD5")
    def isA(u: Int) = {
      val hex = md.digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    val ev = (1 to 50).flatMap { u =>
      val base = Seq((u.toLong, "view", 1.0))
      if (isA(u)) base :+ ((u.toLong, "purchase", 5.0)) else base
    }.toDF("user_id", "event_type", "value")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val r = EventQueries.abPowerAnalysis(ev).collect().head
    val na = (1 to 50).count(isA).toLong
    assert(r.getAs[Long]("n_a") === na)
    assert(r.getAs[Long]("conv_a") === na)
    assert(r.getAs[Long]("conv_b") === 0L)
    // delta = 0 - 1.0 = -1; pooled p = na/50; n_required small but defined
    assert(r.getAs[Double]("delta_observed") === -1.0)
    assert(r.getAs[Long]("n_required_per_arm") >= 1L)
    assert(r.getAs[Double]("mde_at_current_n") > 0.0)
  }

  test("rakeKeywords: hand-checked degree/frequency scores and tie order") {
    import spark.implicits._
    val docs = Seq((1L, "red apple and green apple")).toDF("doc_id", "text")
    val r = TextOps.rakeKeywords(docs).collect()
    assert(r.length === 2)
    // runs: [red apple], [green apple]; deg/freq: red 2/1, apple 4/2, green 2/1
    // -> every word 2e6 micro, both phrases 4e6; tie breaks on phrase text
    assert(r(0).getAs[String]("phrase") === "green apple")
    assert(r(0).getAs[Long]("rank") === 1L)
    assert(r(0).getAs[Long]("score_micro") === 4000000L)
    assert(r(1).getAs[String]("phrase") === "red apple")
    assert(r(1).getAs[Long]("score_micro") === 4000000L)
    assert(r.forall(_.getAs[Long]("n_words") === 2L))
  }

  test("rakeKeywords: multi-word domain terms outrank frequent single words") {
    import spark.implicits._
    // 'data' alone is frequent; 'shuffle partition tuning' travels as a
    // 3-word phrase -> degree rewards it
    val docs = Seq(
      (1L, "data and data and shuffle partition tuning of data"),
      (2L, "shuffle partition tuning and data")).toDF("doc_id", "text")
    val r = TextOps.rakeKeywords(docs, k = 1).collect()
    r.foreach(row => assert(row.getAs[String]("phrase") === "shuffle partition tuning"))
  }

  test("packAudit: hand-checked fill, tail waste, and straddle counts") {
    import spark.implicits._
    // one shard, maxTokens=10: docs of 6, 6, 6 tokens -> total 18, 2 packs,
    // tail waste 2, fill 18/20; doc2 starts at offset 6 (6+6>10 straddles),
    // doc3 starts at offset 12-10=2 (2+6<=10 fits)
    val docs = Seq(
      (1L, (1 to 6).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 6).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 6).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TrainPrep.packAudit(docs, maxTokens = 10, docsPerShard = 1000)
      .collect().head
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("total_tokens") === 18L)
    assert(r.getAs[Long]("n_packs") === 2L)
    assert(r.getAs[Long]("tail_waste_tokens") === 2L)
    assert(r.getAs[Long]("fill_micro") === 18L * 1000000L / 20L)
    assert(r.getAs[Long]("straddle_docs") === 1L)
  }

  test("dataCard: volume, duplication share, and language entropy reconcile") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "web"),
      (2L, "alpha beta gamma", "en", "web"),  // exact dup of 1
      (3L, "delta epsilon", "fr", "web"),
      (4L, "zeta eta theta iota", "en", "wiki"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val r = graft.operators.Curation.dataCard(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("web").getAs[Long]("n_docs") === 3L)
    assert(r("web").getAs[Long]("n_tokens") === 8L)
    // 3 docs, 2 distinct -> dup share 1/3
    assert(r("web").getAs[Long]("dup_share_micro") === 1000000L / 3L)
    assert(r("wiki").getAs[Long]("dup_share_micro") === 0L)
    // web langs: en 2/3, fr 1/3 -> entropy = -(2/3)ln(2/3)-(1/3)ln(1/3)
    val expEnt = (math.floor(-(2.0 / 3) * math.log(2.0 / 3) * 1e6) +
      math.floor(-(1.0 / 3) * math.log(1.0 / 3) * 1e6)).toLong
    assert(r("web").getAs[Long]("lang_entropy_micro") === expEnt)
    assert(r("web").getAs[Long]("n_langs") === 2L)
    // single-lang source: entropy exactly 0 (p=1 -> -1*ln(1) = 0)
    assert(r("wiki").getAs[Long]("lang_entropy_micro") === 0L)
  }

  test("filteredTopK: every neighbor shares the query's label; results differ from unfiltered") {
    import spark.implicits._
    // labels 0/1 alternate; vectors in label 1 are deliberately closer to
    // query 1 than same-label ones are -> unfiltered search would cross
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(base, i.toFloat / 20, 1.0f) ++ Array.fill(61)(0.0f), i % 2)
    }.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))
    val r = graft.operators.Similarity.filteredTopK(rows, nQueries = 2, k = 3).collect()
    r.foreach { row =>
      val q = row.getAs[Long]("query_id")
      assert(row.getAs[Long]("label") === q % 2,
        "neighbor label must equal the query's label")
      assert(row.getAs[Long]("neighbor_id") % 2 === q % 2,
        "a cross-label neighbor leaked through the filter")
    }
    assert(r.map(_.getAs[Long]("query_id")).distinct.sorted.sameElements(Seq(0L, 1L)))
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
