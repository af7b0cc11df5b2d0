package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FifoMatcher

/** Ports the reference's 10 matcher scenarios
  * (reference: test/test_fifo_matching.py:33-428) against all three
  * formulations; plus the hand-verified golden case from
  * doc/FIFO_MATCHING_FLOW.md:84-148.
  */
class FifoMatcherSpec extends AnyFunSuite {
  import TestSpark._

  private val impls: Seq[(String, DataFrame => DataFrame)] = Seq(
    "windowed" -> FifoMatcher.matchTransactions,
    "rankJoin" -> FifoMatcher.matchRankJoin,
    "queue" -> FifoMatcher.matchQueue,
    // whale-tolerant two-stage rank; buckets=3 so the tiny fixtures
    // actually straddle bucket boundaries
    "salted" -> ((df: DataFrame) => FifoMatcher.matchTransactionsSalted(df, buckets = 3)))

  private def forAllImpls(input: DataFrame)(check: (String, Map[String, Option[String]]) => Unit): Unit =
    impls.foreach { case (name, impl) => check(name, redeemMap(impl(input))) }

  // Test 1 (reference :33-66): simple one-to-one
  test("simple one-to-one matching") {
    val in = tx(
      ("E001", "C001", 100.0, "2024-01-01", "earned"),
      ("S001", "C001", -100.0, "2024-01-05", "spent"))
    forAllImpls(in) { (name, m) =>
      assert(m("E001") === Some("S001"), name)
      assert(m("S001") === None, name)
    }
  }

  // Test 2 (reference :71-105): amounts ignored, no partial redemption
  test("1:1 matching ignores amounts") {
    val in = tx(
      ("E001", "C001", 100.0, "2024-01-01", "earned"),
      ("S001", "C001", -60.0, "2024-01-05", "spent"))
    forAllImpls(in) { (name, m) =>
      assert(m("E001") === Some("S001"), name)
      assert(m("S001") === None, name)
    }
  }

  // Test 3 (reference :110-151): oldest earned matched first
  test("FIFO order with multiple earned") {
    val in = tx(
      ("E001", "C001", 50.0, "2024-01-01", "earned"),
      ("E002", "C001", 30.0, "2024-01-02", "earned"),
      ("E003", "C001", 20.0, "2024-01-03", "earned"),
      ("S001", "C001", -70.0, "2024-01-10", "spent"))
    forAllImpls(in) { (name, m) =>
      assert(m("E001") === Some("S001"), name)
      assert(m("E002") === None, name)
      assert(m("E003") === None, name)
    }
  }

  // Test 4 (reference :156-196): one earned, multiple spent — first spent wins
  test("one earned, multiple spent") {
    val in = tx(
      ("E001", "C001", 100.0, "2024-01-01", "earned"),
      ("S001", "C001", -30.0, "2024-01-05", "spent"),
      ("S002", "C001", -40.0, "2024-01-06", "spent"),
      ("S003", "C001", -20.0, "2024-01-07", "spent"))
    forAllImpls(in) { (name, m) =>
      assert(m("E001") === Some("S001"), name)
      assert(m("S001") === None, name)
      assert(m("S002") === None, name)
      assert(m("S003") === None, name)
    }
  }

  // Test 5 (reference :201-242): customers independent
  test("multiple customers matched independently") {
    val in = tx(
      ("E001", "C001", 100.0, "2024-01-01", "earned"),
      ("E002", "C002", 50.0, "2024-01-01", "earned"),
      ("S001", "C001", -50.0, "2024-01-05", "spent"),
      ("S002", "C002", -30.0, "2024-01-05", "spent"))
    forAllImpls(in) { (name, m) =>
      assert(m("E001") === Some("S001"), name)
      assert(m("E002") === Some("S002"), name)
    }
  }

  // Test 6 (reference :247-278): expired behaves exactly like spent
  test("expired transactions redeem like spent") {
    val in = tx(
      ("E001", "C001", 100.0, "2024-01-01", "earned"),
      ("E002", "C001", 50.0, "2024-01-02", "earned"),
      ("S001", "C001", -60.0, "2024-01-05", "spent"),
      ("X001", "C001", -40.0, "2024-01-06", "expired"))
    forAllImpls(in) { (name, m) =>
      assert(m("E001") === Some("S001"), name)
      assert(m("E002") === Some("X001"), name)
      assert(m("X001") === None, name)
    }
  }

  // Test 7 (reference :283-303): no earned → nothing matched
  test("no earned transactions") {
    val in = tx(
      ("S001", "C001", -50.0, "2024-01-05", "spent"),
      ("X001", "C001", -20.0, "2024-01-06", "expired"))
    forAllImpls(in) { (name, m) =>
      assert(m("S001") === None, name)
      assert(m("X001") === None, name)
    }
  }

  // Test 8 (reference :307-333): dates are NOT compared — a spent that
  // precedes all earned still consumes the queue head. The reference test's
  // chronology assertion is vacuous (asserts on the spent row, which is NULL
  // by construction); this pins the ACTUAL semantics.
  test("spent before any earned still matches (no chronology constraint)") {
    val in = tx(
      ("S001", "C001", -50.0, "2024-01-01", "spent"),
      ("E001", "C001", 100.0, "2024-01-05", "earned"))
    forAllImpls(in) { (name, m) =>
      assert(m("E001") === Some("S001"), name)
      assert(m("S001") === None, name)
    }
  }

  // Test 9 (reference :337-381): each TRANS_ID used at most once per side
  test("each trans id used once") {
    val in = tx(
      ("E001", "C001", 30.0, "2024-01-01", "earned"),
      ("E002", "C001", 40.0, "2024-01-02", "earned"),
      ("S001", "C001", -30.0, "2024-01-05", "spent"),
      ("S002", "C001", -40.0, "2024-01-06", "spent"),
      ("S003", "C001", -10.0, "2024-01-07", "spent"))
    forAllImpls(in) { (name, m) =>
      assert(m("E001") === Some("S001"), name)
      assert(m("E002") === Some("S002"), name)
      val redeemers = m.values.flatten.toSeq
      assert(redeemers.distinct.size === redeemers.size, s"$name: redeemer reused")
    }
  }

  // Test 10 (reference :386-428): FIFO by CREATEDAT, not input order
  test("FIFO by CREATEDAT not input order") {
    val in = tx(
      ("E002", "C001", 30.0, "2024-01-03", "earned"), // newer, listed first
      ("E001", "C001", 50.0, "2024-01-01", "earned"), // older, listed second
      ("S001", "C001", -40.0, "2024-01-10", "spent"))
    forAllImpls(in) { (name, m) =>
      assert(m("E001") === Some("S001"), s"$name: oldest by CREATEDAT wins")
      assert(m("E002") === None, name)
    }
  }

  // Golden case (reference: doc/FIFO_MATCHING_FLOW.md:84-148)
  test("documented walkthrough case") {
    val in = tx(
      ("E001", "C001", 100.0, "2024-01-01", "earned"),
      ("E002", "C001", 50.0, "2024-01-02", "earned"),
      ("E003", "C001", 75.0, "2024-01-03", "earned"),
      ("S001", "C001", -80.0, "2024-01-05", "spent"),
      ("S002", "C001", -40.0, "2024-01-06", "spent"),
      ("X001", "C001", -30.0, "2024-06-01", "expired"))
    forAllImpls(in) { (name, m) =>
      assert(m("E001") === Some("S001"), name)
      assert(m("E002") === Some("S002"), name)
      assert(m("E003") === Some("X001"), name)
      assert(m("S001") === None, name)
      assert(m("S002") === None, name)
      assert(m("X001") === None, name)
    }
  }

  // Determinism on duplicate timestamps (SURVEY §7.5 tie-break contract)
  test("deterministic tie-break on equal CREATEDAT") {
    val in = tx(
      ("E002", "C001", 10.0, "2024-01-01", "earned"),
      ("E001", "C001", 20.0, "2024-01-01", "earned"), // same ts: E001 < E002 wins
      ("S001", "C001", -5.0, "2024-01-02", "spent"))
    forAllImpls(in) { (name, m) =>
      assert(m("E001") === Some("S001"), s"$name: TRANS_ID tie-break")
      assert(m("E002") === None, name)
    }
  }

  // Round-12 #6: an equal-timestamp whale — a customer whose entire
  // history shares ONE CREATEDAT — exceeds the heavy-run threshold, so
  // the salted matcher sub-splits it by sampled TRANS_ID ranges. The
  // sub-split must be output-invariant: row-identical to the windowed
  // matcher, with the (CREATEDAT, TRANS_ID) tie-break intact.
  test("salted matcher sub-splits an equal-timestamp whale, output invariant") {
    // 120 earned + 60 spent all at one timestamp, plus a normal customer;
    // ids shuffled so the id tie-break does real work across sub-buckets
    val order = scala.util.Random.shuffle((0 until 180).toList)
    val whaleRows = order.map { i =>
      if (i < 120) (f"WE$i%03d", "WHALE", 1.0, "2024-06-15T12:00:00", "earned")
      else (f"WS$i%03d", "WHALE", -1.0, "2024-06-15T12:00:00", "spent")
    }
    val in = tx(whaleRows ++ Seq(
      ("E001", "C001", 10.0, "2024-01-01", "earned"),
      ("S001", "C001", -5.0, "2024-01-02", "spent")): _*)
    val expected = FifoMatcher.matchTransactions(in)
      .orderBy("TRANS_ID").collect().map(_.toSeq).toSeq
    // buckets=4 → heavy-run threshold 182/4=45 < 120: the sub-split engages
    val salted = FifoMatcher.matchTransactionsSalted(in, buckets = 4)
      .orderBy("TRANS_ID").collect().map(_.toSeq).toSeq
    assert(salted === expected)
    // the FIFO pairing under the tie-break: k-th earned ↔ k-th spent by id
    val m = redeemMap(FifoMatcher.matchTransactionsSalted(in, buckets = 4))
    assert(m("WE000") === Some("WS120"))
    assert(m("WE059") === Some("WS179"))
    assert(m("WE060") === None) // 60 spent cover the first 60 earned only
  }

  // Round-13 ADVICE (high): the composite (time bucket, id sub-bucket) must
  // stay monotone in (CREATEDAT, TRANS_ID) for the REALISTIC whale shape —
  // a burst at one timestamp PLUS surrounding activity whose later
  // timestamps fall in the SAME time bucket. Pre-fix, those later rows got
  // sub=0 and sorted BEFORE the run's sub>=1 rows, corrupting the global
  // rank and the FIFO pairing.
  test("sub-split stays monotone with later same-bucket activity around the run") {
    // One year of background activity pins the bucket span; the whale has
    // a 140-earned burst at noon plus 30 earned one second later and 20
    // earned one second earlier — all three timestamps share a time bucket
    // at buckets=4. 90 spent arrive after the burst (same bucket).
    val order = scala.util.Random.shuffle((0 until 280).toList)
    val whaleRows = order.map { i =>
      if (i < 140) (f"WB$i%03d", "WHALE", 1.0, "2024-06-15T12:00:00", "earned")
      else if (i < 170) (f"WL$i%03d", "WHALE", 1.0, "2024-06-15T12:00:01", "earned")
      else if (i < 190) (f"WA$i%03d", "WHALE", 1.0, "2024-06-15T11:59:59", "earned")
      else (f"WS$i%03d", "WHALE", -1.0, "2024-06-15T12:00:02", "spent")
    }
    val in = tx(whaleRows ++ Seq(
      ("E001", "C001", 10.0, "2024-01-01", "earned"),
      ("S001", "C001", -5.0, "2024-12-31", "spent")): _*)
    val expected = FifoMatcher.matchTransactions(in)
      .orderBy("TRANS_ID").collect().map(_.toSeq).toSeq
    val salted = FifoMatcher.matchTransactionsSalted(in, buckets = 4)
      .orderBy("TRANS_ID").collect().map(_.toSeq).toSeq
    assert(salted === expected)
    // FIFO under the tie-break: the 20 early earned match first, then the
    // burst's first 70 by id — the 30 late earned and burst tail unmatched
    val m = redeemMap(FifoMatcher.matchTransactionsSalted(in, buckets = 4))
    assert(m(f"WA170") === Some("WS190"))
    assert(m("WB000") === Some("WS210"))
    assert(m("WB069") === Some("WS279"))
    assert(m("WB070") === None)
    assert(m("WL140") === None)
  }

  // Two heavy runs of the SAME (customer, side) in the SAME time bucket:
  // the per-bucket boundary sets must merge monotonically (and thin to at
  // most buckets-1 boundaries) rather than shadow each other.
  test("sub-split merges two heavy runs sharing a time bucket") {
    val order = scala.util.Random.shuffle((0 until 260).toList)
    val rows = order.map { i =>
      if (i < 100) (f"R1$i%03d", "WHALE", 1.0, "2024-06-15T12:00:00", "earned")
      else if (i < 200) (f"R2$i%03d", "WHALE", 1.0, "2024-06-15T12:00:05", "earned")
      else (f"SP$i%03d", "WHALE", -1.0, "2024-06-15T12:00:09", "spent")
    }
    val in = tx(rows ++ Seq(
      ("E001", "C001", 10.0, "2024-01-01", "earned"),
      ("S001", "C001", -5.0, "2024-12-31", "spent")): _*)
    val expected = FifoMatcher.matchTransactions(in)
      .orderBy("TRANS_ID").collect().map(_.toSeq).toSeq
    val salted = FifoMatcher.matchTransactionsSalted(in, buckets = 4)
      .orderBy("TRANS_ID").collect().map(_.toSeq).toSeq
    assert(salted === expected)
  }

  // Round-14 ADVICE (low): the boundary-to-bucket mapping used to be
  // recomputed driver-side from naive LocalDateTime micros while the
  // matcher's bucket expr goes through the session-timezone-dependent
  // unix_micros(cast(... as timestamp)) — under a non-UTC session the two
  // disagreed and the sub-split silently no-oped (load-only). The bucket id
  // is now collected from the SAME SQL expression; this pins engagement +
  // output invariance under an awkward (half-hour-offset) session timezone.
  test("sub-split engages and stays invariant under a non-UTC session timezone") {
    val spark = TestSpark.spark
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      val order = scala.util.Random.shuffle((0 until 180).toList)
      val whaleRows = order.map { i =>
        if (i < 120) (f"WE$i%03d", "WHALE", 1.0, "2024-06-15T12:00:00", "earned")
        else (f"WS$i%03d", "WHALE", -1.0, "2024-06-15T12:00:00", "spent")
      }
      val in = tx(whaleRows ++ Seq(
        ("E001", "C001", 10.0, "2024-01-01", "earned"),
        ("S001", "C001", -5.0, "2024-01-02", "spent")): _*)
      val expected = FifoMatcher.matchTransactions(in)
        .orderBy("TRANS_ID").collect().map(_.toSeq).toSeq
      val salted = FifoMatcher.matchTransactionsSalted(in, buckets = 4)
        .orderBy("TRANS_ID").collect().map(_.toSeq).toSeq
      assert(salted === expected)
      // engagement: boundaries derived with the matcher's own bucket expr
      // must key to the bucket that expr actually computes for the run
      import org.apache.spark.sql.functions._
      val t = in
      val mm = t.agg(min(col("timestamp")), max(col("timestamp")), count(lit(1))).head()
      val epoch = java.time.LocalDateTime.of(1970, 1, 1, 0, 0)
      def mic(x: java.time.LocalDateTime): Long =
        java.time.temporal.ChronoUnit.MICROS.between(epoch, x)
      val lo = mic(mm.getAs[java.time.LocalDateTime](0))
      val span = mic(mm.getAs[java.time.LocalDateTime](1)) - lo + 1
      val bucket = expr(
        s"cast(((unix_micros(cast(CREATEDAT as timestamp)) - ${lo}L) * 4L) div ${span}L as int)")
      val sided = t
        .withColumnRenamed("transaction_id", "TRANS_ID")
        .withColumnRenamed("transaction_type", "TCTYPE")
        .withColumnRenamed("timestamp", "CREATEDAT")
        .withColumnRenamed("customer_id", "CUSTOMERID")
        .withColumnRenamed("amount", "AMOUNT")
        .withColumn("is_earned", col("TCTYPE") === "earned")
      val bs = FifoMatcher.subSplitBoundaries(sided, 4, bucket, mm.getLong(2))
      assert(bs.nonEmpty, "sub-split must engage on the whale")
      val sqlBuckets = sided.select(col("CUSTOMERID"), col("is_earned"),
          bucket.cast("long").as("tb")).distinct().collect()
        .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2))).toSet
      bs.foreach { case (key, cuts) =>
        assert(sqlBuckets.contains(key),
          s"boundary key $key not a bucket the SQL expr computes: $sqlBuckets")
        assert(cuts.nonEmpty)
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("empty input produces empty output with correct schema") {
    val in = tx()
    impls.foreach { case (name, impl) =>
      val out = impl(in)
      assert(out.count() === 0, name)
      assert(out.columns.toSet ===
        Set("TRANS_ID", "TCTYPE", "CREATEDAT", "CUSTOMERID", "AMOUNT", "REDEEMID"), name)
    }
  }
}
