package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{FifoMatcher, Sketches}

/** Misra–Gries two-pass heavy hitters + the whale-census FIFO dispatch. */
class HeavyHitterSpec extends AnyFunSuite {
  import TestSpark._

  /** occurrence stream: key repeated `cnt` times, ids globally unique. */
  private def stream(counts: (Long, Int)*) = {
    import spark.implicits._
    var id = 0L
    counts.flatMap { case (key, cnt) =>
      Seq.fill(cnt) { id += 1; (id, key) }
    }.toDF("event_id", "user_id")
  }

  test("every key above n/(k+1) is reported with its exact count") {
    // n = 1000: one 20% whale, one 5% mid, rest spread thin (0.5% each)
    val df = stream(
      (Seq((1L, 200), (2L, 50)) ++ (3L to 152L).map(k => (k, 5))): _*)
    val k = 8
    val out = Sketches.heavyHitters(df, "user_id", "event_id", k = k, nShards = 4)
      .collect()
    val n = 1000L
    // guarantee: reported set == {key : occ*(k+1) > n}, counts exact
    val expected = Map(1L -> 200L) // 200*9 > 1000; 50*9 = 450 < 1000
    assert(out.map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("occurrences"))
      .toMap === expected)
    out.foreach { r =>
      val occ = r.getAs[Long]("occurrences")
      val mg = r.getAs[Long]("mg_estimate")
      assert(mg <= occ, "MG estimate must be a lower bound")
      assert(occ - mg <= n / (k + 1),
        s"underestimate ${occ - mg} breaks the n/(k+1) bound")
      assert(r.getAs[Long]("share_ppm") === occ * 1000000L / n)
    }
  }

  test("the reported set and exact columns are shard-count invariant") {
    val df = stream(
      (Seq((1L, 120), (2L, 90), (3L, 70)) ++ (4L to 75L).map(k => (k, 10))): _*)
    val reports = Seq(1, 4, 16).map { s =>
      Sketches.heavyHitters(df, "user_id", "event_id", k = 16, nShards = s)
        .select("user_id", "occurrences", "underestimate", "share_ppm")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    }
    // (key, exact count, share) never depends on how the stream was sharded;
    // only mg_estimate may move within its error bound
    assert(reports.distinct.size === 1,
      s"report varied with shard count: $reports")
    assert(reports.head.nonEmpty)
  }

  test("more counters than keys: the sketch is exact (zero underestimate)") {
    val df = stream((1L, 60), (2L, 30), (3L, 10))
    val out = Sketches.heavyHitters(df, "user_id", "event_id", k = 64, nShards = 4)
      .collect()
    // all three keys clear 100/65; no truncation fires anywhere
    assert(out.map(_.getAs[Long]("user_id")).toSeq === Seq(1L, 2L, 3L))
    out.foreach(r => assert(r.getAs[Long]("underestimate") === 0L))
  }

  test("skewDecision prices the whale census in exact ppm") {
    // whale fixture: c1 holds 6 of 10 rows → 600000 ppm > 50000 → salted
    val whale = tx(
      ((1 to 6).map(i => (s"e$i", "c1", 1.0, f"2024-01-${i}%02d", "earned")) ++
        (7 to 10).map(i => (s"e$i", s"c$i", 1.0, f"2024-01-${i}%02d", "earned"))): _*)
    val d = FifoMatcher.skewDecision(whale).collect().head
    assert(d.getAs[Long]("total_rows") === 10L)
    assert(d.getAs[Long]("max_customer_rows") === 6L)
    assert(d.getAs[Long]("share_ppm") === 600000L)
    assert(d.getAs[Boolean]("whale"))
    assert(d.getAs[String]("variant") === "salted")

    // uniform fixture: 25 customers × 1 row → 40000 ppm < 50000 → primary
    val flat = tx((1 to 25).map(i =>
      (s"e$i", s"c$i", 1.0, "2024-01-01", "earned")): _*)
    val f = FifoMatcher.skewDecision(flat).collect().head
    assert(f.getAs[Long]("share_ppm") === 40000L)
    assert(!f.getAs[Boolean]("whale"))
    assert(f.getAs[String]("variant") === "primary")
  }

  test("adaptive dispatch is row-identical to the primary on both branches") {
    val mixed = tx(
      ("e1", "c1", 10.0, "2024-01-01", "earned"),
      ("e2", "c1", 10.0, "2024-01-02", "earned"),
      ("e3", "c1", -10.0, "2024-01-03", "spent"),
      ("e4", "c1", -10.0, "2024-01-04", "expired"),
      ("e5", "c2", 5.0, "2024-01-01", "earned"),
      ("e6", "c2", -5.0, "2024-01-05", "spent"))
    val order = Seq(col("CUSTOMERID"), col("CREATEDAT"), col("TRANS_ID"))
    val primary = FifoMatcher.matchTransactions(mixed).orderBy(order: _*).collect().toSeq
    // c1 holds 4/6 = 666666 ppm: default threshold dispatches salted
    assert(FifoMatcher.matchTransactionsAdaptive(mixed)
      .orderBy(order: _*).collect().toSeq === primary)
    // a 700000-ppm threshold forces the primary branch on the same data
    assert(FifoMatcher.matchTransactionsAdaptive(mixed, whaleShareMicro = 700000L)
      .orderBy(order: _*).collect().toSeq === primary)
  }

  test("adaptive dispatch on empty input returns the empty spec schema") {
    val empty = tx()
    assert(FifoMatcher.matchTransactionsAdaptive(empty).collect().isEmpty)
  }

  test("property: report == brute-force heavy hitters on arbitrary skews") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val genStream: Gen[List[Long]] = for {
      nKeys <- Gen.choose(1, 40)
      n <- Gen.choose(1, 300)
      // Zipf-ish pull toward low keys so some runs have hitters, some none
      keys <- Gen.listOfN(n, Gen.frequency(
        (6, Gen.choose(1L, 3L)), (3, Gen.choose(1L, 10L)),
        (1, Gen.choose(1L, nKeys.toLong))))
    } yield keys
    val prop = Prop.forAll(genStream) { keys =>
      val k = 8
      val df = keys.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("event_id", "user_id")
      val got = Sketches.heavyHitters(df, "user_id", "event_id", k = k, nShards = 4)
        .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("occurrences"))
        .toMap
      val n = keys.size.toLong
      val brute = keys.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 * (k + 1) > n).toMap
      got == brute
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
