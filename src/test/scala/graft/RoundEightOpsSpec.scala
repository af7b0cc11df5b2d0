package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps
import graft.operators.{Similarity, Sketches, Validators}
import graft.queries.{EventQueries, RelationalQueries}

/** Round-8 additions: weighted reservoir sampling (see SamplingSpec),
  * Benford profiling, KMV set operations, autocorrelation, bigram LM,
  * Pareto frontier. */
class RoundEightOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("benfordProfile reads leading cents digits and renders shared constants") {
    import spark.implicits._
    val txns = Seq(
      ("earned", 123.45), // cents 12345 -> digit 1
      ("earned", 0.05), // cents 5 -> digit 5
      ("earned", 19.99), // cents 1999 -> digit 1
      ("spent", -20.00), // cents 2000 -> digit 2
      ("spent", 0.0) // cents 0 -> dropped
    ).toDF("transaction_type", "amount")
    val r = Validators.benfordProfile(txns).collect()
    val byKey = r.map(x => (x.getString(0), x.getInt(1)) -> x).toMap
    assert(byKey(("earned", 1)).getAs[Long]("n") === 2L)
    assert(byKey(("earned", 5)).getAs[Long]("n") === 1L)
    assert(byKey(("earned", 1)).getAs[Long]("share_bp") === 6666L)
    // the Benford expectation is the shared constant table: log10(2) = 30.10%
    assert(byKey(("earned", 1)).getAs[Long]("benford_bp") === 3010L)
    assert(byKey(("spent", 2)).getAs[Long]("share_bp") === 10000L)
    assert(byKey(("spent", 2)).getAs[Long]("dev_bp") === 10000L - 1761L)
    // zero amounts never contribute a digit row
    assert(r.map(_.getAs[Long]("n")).sum === 4L)
    // per-type shares sum to <= 10000 (integer div truncation)
    val earnedShare = r.filter(_.getString(0) == "earned").map(_.getAs[Long]("share_bp")).sum
    assert(earnedShare <= 10000L && earnedShare >= 9998L)
  }

  test("dailyAcf: alternating series gives acf(1) = -1, acf(2) = +1") {
    import spark.implicits._
    // one event per day, value alternating 10/20 over 12 days
    val events = (0 until 12).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"),
        1L, "view", if (i % 2 == 0) 10.0 else 20.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventQueries.dailyAcf(events, maxLag = 3).collect()
      .map(x => x.getAs[Long]("lag_days") ->
        (x.getAs[Long]("n_pairs"), x.getAs[java.lang.Double]("acf"))).toMap
    assert(r(1L)._1 === 11L)
    assert(r(1L)._2 === -1.0)
    assert(r(2L)._1 === 10L)
    assert(r(2L)._2 === 1.0)
    assert(r(3L)._2 === -1.0)
  }

  test("dailyAcf: constant series yields NULL acf, not a crash") {
    import spark.implicits._
    val events = (0 until 5).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"),
        1L, "view", 7.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventQueries.dailyAcf(events, maxLag = 2).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.isNullAt(r.head.fieldIndex("acf"))))
  }

  test("kmvJaccardPairs is exact below sketch capacity") {
    import spark.implicits._
    // A = {1..100}, B = {51..150}: |A∩B| = 50, |A∪B| = 150, J = 1/3
    val df = ((1 to 100).map(("A", _)) ++ (51 to 150).map(("B", _)))
      .toDF("event_type", "user_id")
    val r = Sketches.kmvJaccardPairs(df, "event_type", "user_id", k = 256).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("type_a") === "A")
    assert(row.getAs[Long]("m") === 150L) // whole union fits the sketch
    assert(row.getAs[Double]("jaccard_est") === math.rint(50.0 / 150.0 * 10000) / 10000)
    assert(row.getAs[Double]("union_est") === 150.0)
    assert(row.getAs[Double]("intersection_est") === 50.0)
    assert(row.getAs[Double]("exact_jaccard") === row.getAs[Double]("jaccard_est"))
  }

  test("kmvJaccardPairs estimates within the 1/sqrt(k) regime above capacity") {
    import spark.implicits._
    // A = {1..3000}, B = {1501..4500}: J = 1500/4500 = 1/3
    val df = ((1 to 3000).map(("A", _)) ++ (1501 to 4500).map(("B", _)))
      .toDF("event_type", "user_id")
    val row = Sketches.kmvJaccardPairs(df, "event_type", "user_id", k = 256).collect().head
    assert(row.getAs[Long]("m") === 256L)
    val j = row.getAs[Double]("jaccard_est")
    // SE of rho at k=256 ~ sqrt(J(1-J)/k) = 0.029; allow 4 SE
    assert(math.abs(j - 1.0 / 3.0) < 0.12, s"jaccard_est $j too far from 1/3")
    val u = row.getAs[Double]("union_est")
    assert(math.abs(u - 4500.0) / 4500.0 < 0.25, s"union_est $u too far from 4500")
  }

  test("bigramLogProb scores against the corpus's own JM-smoothed model") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val r = TextOps.bigramLogProb(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // doc 3 has no bigram -> no row
    assert(!r.contains(3L))
    assert(r(1L).getAs[Long]("n_bigrams") === 3L)
    assert(r(2L).getAs[Long]("n_bigrams") === 1L)
    // hand model: N=7, c1(a)=3, c1(b)=3; c2(a,b)=3, ctx(a)=3; c2(b,a)=1, ctx(b)=1
    def micro(p: Double): Long = math.floor(math.log(p) * 1e6).toLong
    val mAb = micro(0.9 * (3.0 / 3.0) + 0.1 * (3.0 / 7.0))
    val mBa = micro(0.9 * (1.0 / 1.0) + 0.1 * (3.0 / 7.0))
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1L).getAs[Double]("avg_logprob") ===
      round4((2 * mAb + mBa).toDouble / 3 / 1e6))
    assert(r(1L).getAs[Double]("min_logprob") === round4(math.min(mAb, mBa) / 1e6))
    assert(r(2L).getAs[Double]("avg_logprob") === round4(mAb.toDouble / 1 / 1e6))
  }

  test("paretoFrontier keeps non-dominated points, dups survive together") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, 10L, 100.0, ts("2024-01-01")), // dominated by 3/5 (same price, later date)
      (2L, 11L, 90.0, ts("2024-01-05")), // frontier (nothing above beats its date)
      (3L, 12L, 100.0, ts("2024-01-03")), // frontier
      (4L, 13L, 80.0, ts("2024-01-02")), // dominated by 2
      (5L, 14L, 100.0, ts("2024-01-03")) // exact dup of 3: both survive
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val keys = RelationalQueries.paretoFrontier(orders, buckets = 2)
      .select("o_orderkey").as[Long].collect().sorted
    assert(keys === Array(2L, 3L, 5L))
  }

  test("paretoFrontier bucket prune is lossless vs brute-force dominance") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = (1 to 300).map { i =>
      (i.toLong, i.toLong, rnd.nextInt(10000) / 100.0,
        java.sql.Timestamp.valueOf(f"2024-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d 00:00:00"))
    }
    val df = pts.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val got = RelationalQueries.paretoFrontier(df, buckets = 7)
      .select("o_orderkey").as[Long].collect().toSet
    val arr = pts.map { case (k, _, p, d) =>
      (k, math.floor(p * 100 + 0.5).toLong, d.toLocalDateTime.toLocalDate.toEpochDay)
    }
    val brute = arr.filter { case (_, p0, d0) =>
      !arr.exists { case (_, p1, d1) =>
        p1 >= p0 && d1 >= d0 && (p1 > p0 || d1 > d0)
      }
    }.map(_._1).toSet
    assert(got === brute)
  }

  test("rrfFusion is internally consistent and agrees with its rankers") {
    val emb = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = Similarity.rrfFusion(emb, nQueries = 3, k = 5).collect()
    assert(r.nonEmpty)
    // per query: at most k rows, fused_rank dense from 1, rrf_micro descending
    r.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("fused_rank"))
      assert(sorted.length <= 5)
      assert(sorted.map(_.getAs[Long]("fused_rank")).toSeq === (1L to sorted.length).toSeq)
      val micros = sorted.map(_.getAs[Long]("rrf_micro")).toSeq
      assert(micros === micros.sorted.reverse)
    }
    // rrf_micro recomputes from the emitted ranks
    r.foreach { row =>
      def c(f: String): Long = if (row.isNullAt(row.fieldIndex(f))) 0L
        else 1000000L / (60L + row.getAs[Long](f))
      assert(row.getAs[Long]("rrf_micro") === c("rank_cos") + c("rank_lsh"))
    }
    // a candidate ranked 1st by BOTH rankers must top its query's fusion
    val both1 = r.filter(x => !x.isNullAt(x.fieldIndex("rank_cos")) &&
      !x.isNullAt(x.fieldIndex("rank_lsh")) &&
      x.getAs[Long]("rank_cos") == 1L && x.getAs[Long]("rank_lsh") == 1L)
    both1.foreach(x => assert(x.getAs[Long]("fused_rank") === 1L))
  }

  test("qualityCalibrated assigns per-source integer-bp percentiles") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "web"), (2L, "a b", "web"), (3L, "a b c", "web"),
      (4L, "x y", "code"),
      (5L, "", "web") // null-score doc: excluded
    ).toDF("doc_id", "text", "source")
    val r = TextOps.qualityCalibrated(docs, keepBp = 3000).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(!r.contains(5L))
    assert(r(1L).getAs[Long]("pct_rank_bp") === 0L)
    assert(r(2L).getAs[Long]("pct_rank_bp") === 5000L)
    assert(r(3L).getAs[Long]("pct_rank_bp") === 10000L)
    // single-doc source sits at 0 by convention
    assert(r(4L).getAs[Long]("pct_rank_bp") === 0L)
    // keep = top 30% of the source: only the web top doc clears 7000
    assert(r(3L).getAs[Boolean]("keep"))
    assert(!r(1L).getAs[Boolean]("keep") && !r(2L).getAs[Boolean]("keep"))
  }

  test("invertedIndex builds capped, numerically-sorted postings") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val r = TextOps.invertedIndex(docs).collect()
      .map(x => x.getAs[String]("term") -> x).toMap
    assert(r("a").getAs[Long]("df") === 1L)
    assert(r("a").getAs[Long]("tf") === 2L)
    assert(r("a").getAs[String]("postings") === "1")
    assert(r("b").getAs[Long]("df") === 2L)
    assert(r("b").getAs[String]("postings") === "1,2")
    assert(r.values.forall(!_.getAs[Boolean]("truncated")))
    // whale term: 25 docs, cap 20 -> numeric order 1..20, flagged truncated
    val whale = (1L to 25L).map((_, "x")).toDF("doc_id", "text")
    val wr = TextOps.invertedIndex(whale, cap = 20).collect().head
    assert(wr.getAs[String]("postings") === (1L to 20L).mkString(","))
    assert(wr.getAs[Boolean]("truncated"))
    assert(wr.getAs[Long]("df") === 25L)
  }

  test("chiSquareIndependence: exact independence scores zero") {
    import spark.implicits._
    // counts proportional to marginal products -> every cell o == e
    val rows =
      Seq.fill(10)(("s1", "en")) ++ Seq.fill(20)(("s1", "fr")) ++
        Seq.fill(30)(("s2", "en")) ++ Seq.fill(60)(("s2", "fr"))
    val r = Validators.chiSquareIndependence(rows.toDF("source", "lang")).collect().head
    assert(r.getAs[Long]("n_cells") === 4L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Double]("chi2") === 0.0)
    // a skewed table scores strictly positive
    val skew = Seq.fill(30)(("s1", "en")) ++ Seq.fill(5)(("s1", "fr")) ++
      Seq.fill(5)(("s2", "en")) ++ Seq.fill(30)(("s2", "fr"))
    val r2 = Validators.chiSquareIndependence(skew.toDF("source", "lang")).collect().head
    assert(r2.getAs[Double]("chi2") > 10.0)
  }

  test("balanceTrend fits the day-end OLS slope; single-day customers are NULL") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // customer 1: balance 10, 20, ..., 50 over five days -> slope 1000 cents/day;
    // day 3 has TWO rows - the later (day-end) one must win
    val rows = (1 to 5).map(i =>
      ("1", ts(f"2024-01-0$i%d 12:00:00"), s"t$i", i * 10.0)) ++
      Seq(("1", ts("2024-01-03 08:00:00"), "t3early", 999.0),
        ("2", ts("2024-01-01 12:00:00"), "s1", 42.0))
    val h = rows.toDF("customer_id", "transaction_date", "transaction_id", "current_balance")
    val r = graft.operators.BalanceAnalytics.balanceTrend(h).collect()
      .map(x => x.getAs[String]("customer_id") -> x).toMap
    assert(r("1").getAs[Long]("n_days") === 5L)
    assert(r("1").getAs[Double]("slope_cents_per_day") === 1000.0)
    assert(r("2").getAs[Long]("n_days") === 1L)
    assert(r("2").isNullAt(r("2").fieldIndex("slope_cents_per_day")))
  }

  test("qualityHistogramPct lower-bounds the exact percentile within bin resolution") {
    import spark.implicits._
    // 11 docs in one source with strictly increasing token counts ->
    // strictly increasing quality scores across different bins
    val docs = (1L to 11L).map(i =>
      (i, (1L to i * 15).map(j => s"w$j").mkString(" "), "web"))
      .toDF("doc_id", "text", "source")
    val exact = TextOps.qualityCalibrated(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("pct_rank_bp")).toMap
    val approx = TextOps.qualityHistogramPct(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("approx_pct_bp")).toMap
    assert(approx.keySet === exact.keySet)
    // the strictly-below-bin count can never exceed the exact rank, and
    // with one doc per bin here the two must agree exactly
    approx.foreach { case (id, bp) => assert(bp <= exact(id)) }
    assert(approx === exact)
  }

  test("asOfNearest picks the closer side within tolerance, backward on ties") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val timeline = Seq(
      ("c1", ts("2024-01-01 00:00:00"), "t1", 10.0),
      ("c1", ts("2024-01-10 00:00:00"), "t2", 20.0),
      ("c2", ts("2024-06-01 00:00:00"), "u1", 99.0)
    ).toDF("k", "ts", "tie", "v")
    val probes = Seq(
      ("c1", ts("2024-01-02 00:00:00")), // back 1d vs fwd 8d -> back t1
      ("c1", ts("2024-01-09 00:00:00")), // back 8d vs fwd 1d -> fwd t2
      ("c1", ts("2024-01-05 12:00:00")), // 4.5d both -> equal -> back t1
      ("c2", ts("2024-01-01 00:00:00")) // nothing within 10d -> null
    ).toDF("k", "ts")
    val tol = 10L * 86400
    val r = graft.operators.AsOfJoin
      .asOfNearest(timeline, probes, "k", "ts", "tie", Seq("v"), tol)
      .collect().map(x => (x.getString(0), x.getTimestamp(1).toString) -> x).toMap
    assert(r(("c1", "2024-01-02 00:00:00.0")).getAs[String]("matched_side") === "back")
    assert(r(("c1", "2024-01-02 00:00:00.0")).getAs[Double]("v") === 10.0)
    assert(r(("c1", "2024-01-02 00:00:00.0")).getAs[Long]("dist_seconds") === 86400L)
    assert(r(("c1", "2024-01-09 00:00:00.0")).getAs[String]("matched_side") === "fwd")
    assert(r(("c1", "2024-01-09 00:00:00.0")).getAs[Double]("v") === 20.0)
    val tie = r(("c1", "2024-01-05 12:00:00.0"))
    assert(tie.getAs[String]("matched_side") === "back")
    assert(tie.getAs[Double]("v") === 10.0)
    val none = r(("c2", "2024-01-01 00:00:00.0"))
    assert(none.isNullAt(none.fieldIndex("matched_side")))
    assert(none.isNullAt(none.fieldIndex("v")))
  }

  test("labelScatter separates tight clusters and flags the nearest neighbor class") {
    import spark.implicits._
    // two tight orthogonal-ish clusters and one loose one
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val emb = Seq(
      (1L, v(1, 0, 0, 0), 0), (2L, v(0.9, 0.1, 0, 0), 0),
      (3L, v(0, 1, 0, 0), 1), (4L, v(0.1, 0.9, 0, 0), 1),
      (5L, v(0.5, 0.5, 0.7, 0), 2), (6L, v(0, 0, 1, 0.5), 2)
    ).toDF("vec_id", "embedding", "label")
    val r = graft.operators.Similarity.labelScatter(emb).collect()
      .map(x => x.getAs[Int]("label") -> x).toMap
    assert(r.keySet === Set(0, 1, 2))
    assert(r(0).getAs[Long]("n_vecs") === 2L)
    // tight clusters: members hug their centroid
    assert(r(0).getAs[Double]("avg_within_cos") > 0.98)
    assert(r(1).getAs[Double]("avg_within_cos") > 0.98)
    // cluster 2 is looser than the tight ones
    assert(r(2).getAs[Double]("avg_within_cos") < r(0).getAs[Double]("avg_within_cos"))
    // separability: every class's nearest-other centroid sits well below
    // its own cohesion
    r.values.foreach { x =>
      assert(x.getAs[Double]("between_cos") < x.getAs[Double]("avg_within_cos"))
      assert(Set(0, 1, 2).contains(x.getAs[Int]("nearest_label")))
    }
  }

  test("activityStreaks finds the longest island, earliest on ties") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 10:00:00")
    // user 1: days 1,2,3 (streak 3), 7,8 (2); two events on day 2 dedupe.
    // user 2: days 1,2 and 5,6 — tied streaks of 2, earliest wins
    val events = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-02"),
      (4L, "2024-01-03"), (5L, "2024-01-07"), (6L, "2024-01-08")
    ).map { case (id, d) => (id, ts(d), 1L, "view", 1.0, "{}") } ++ Seq(
      (7L, "2024-01-01"), (8L, "2024-01-02"), (9L, "2024-01-05"), (10L, "2024-01-06")
    ).map { case (id, d) => (id, ts(d), 2L, "view", 1.0, "{}") }
    val df = events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventQueries.activityStreaks(df).collect()
      .map(x => x.getAs[Long]("user_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_active_days") === 5L)
    assert(r(1L).getAs[Long]("longest_streak") === 3L)
    assert(r(1L).getAs[java.sql.Date]("streak_start").toString === "2024-01-01")
    assert(r(1L).getAs[java.sql.Date]("streak_end").toString === "2024-01-03")
    assert(r(2L).getAs[Long]("longest_streak") === 2L)
    assert(r(2L).getAs[java.sql.Date]("streak_start").toString === "2024-01-01")
  }

  test("dailyCusum grows through a level shift and peaks at the change point") {
    import spark.implicits._
    // 6 days at 100.00 then 6 days at 200.00: mean 150, |cusum| peaks at day 6
    val events = (0 until 12).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 09:00:00"),
        1L, "view", if (i < 6) 100.0 else 200.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventQueries.dailyCusum(events).collect()
    assert(r.length === 12)
    val byDay = r.map(x => x.getAs[java.sql.Date]("day").toString -> x).toMap
    assert(byDay("2024-01-06").getAs[Long]("cusum_cents") === -30000L)
    // the change point is the |cusum| extremum
    val extremum = r.maxBy(x => math.abs(x.getAs[Long]("cusum_cents")))
    assert(extremum.getAs[java.sql.Date]("day").toString === "2024-01-06")
    // the final cusum returns to zero (mean is the global mean)
    assert(r.last.getAs[Long]("cusum_cents") === 0L)
  }

  test("perplexity filter keeps the top LM-score share per source") {
    import spark.implicits._
    // 10 fluent docs (repeated common bigrams) + 2 salad docs whose
    // bigrams are RARE continuations of the common context "the" — the
    // construction a self-trained JM model actually penalizes (novel
    // tokens in singleton contexts would instead score ~0.9·1/1);
    // keepBp=7000 keeps the top 70%
    val fluent = (1 to 10).map(i => (i.toLong, "the cat sat on the mat", "s1"))
    val salad = Seq((11L, "the zz the qq", "s1"), (12L, "the vv the kk", "s1"))
    val docs = (fluent ++ salad).toDF("doc_id", "text", "source")
    val out = TextOps.perplexityFilter(docs, keepBp = 7000).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    assert(out.length === 12) // every doc has >=2 tokens -> all scored
    val dropped = out.filterNot(_._3).map(_._1).toSet
    // the two salad docs are always among the dropped 30%
    assert(Set(11L, 12L).subsetOf(dropped), s"dropped=$dropped")
    // bp >= 3000 <=> keep, by construction
    assert(out.forall { case (_, bp, k) => (bp >= 3000L) === k })
  }
}
