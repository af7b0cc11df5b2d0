package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps
import graft.operators.{BalanceAnalytics, Similarity, Sketches}
import graft.queries.RelationalQueries

/** Round-7 additions: scrub/C4 cleaning, SemDeDup, gap-fill, cube,
  * profiling, hash-sample quantiles. */
class RoundSevenOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("scrubStats redacts URLs, emails, and blocklist terms with counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "visit https://ex.com/a then mail bob@ex.com for spark info"),
      (2L, "plain text only")).toDF("doc_id", "text")
    val r = TextOps.scrubStats(docs).collect()
    val d1 = r.find(_.getLong(0) == 1L).get
    assert(d1.getAs[Long]("n_urls") === 1L)
    assert(d1.getAs[Long]("n_emails") === 1L)
    assert(d1.getAs[Long]("n_blocklist") === 1L)
    // the scrubbed text is fully redacted: hash must equal the expected string's
    val expected = "visit <URL> then mail <EMAIL> for <TERM> info"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(d1.getAs[String]("scrubbed_md5") === md)
    assert(d1.getAs[Long]("n_chars_scrubbed") === expected.length.toLong)
    val d2 = r.find(_.getLong(0) == 2L).get
    assert(d2.getAs[Long]("n_urls") === 0L)
    assert(d2.getAs[Long]("n_blocklist") === 0L)
  }

  test("c4Filters trips each rule in its fixed order") {
    import spark.implicits._
    val ok = (1 to 30).map(i => s"w$i").mkString(" ") // 30 varied tokens
    val docs = Seq(
      (1L, ok),
      (2L, "too short"),
      (3L, (1 to 100).map(i => s"w$i").mkString(" ")),            // too_long
      (4L, (1 to 30).map(_ => "a").mkString(" ")),                // mean len 1 -> but repetition? token_len first
      (5L, ((1 to 25).map(i => s"word$i") ++ Seq.fill(15)("word1")).mkString(" "))) // repetition
      .toDF("doc_id", "text")
    val r = TextOps.c4Filters(docs).collect()
      .map(x => x.getLong(0) -> Option(x.getAs[String]("fail_rule"))).toMap
    assert(r(1L) === None)
    assert(r(2L) === Some("too_short"))
    assert(r(3L) === Some("too_long"))
    assert(r(4L) === Some("token_len")) // rule order: token_len fires before repetition
    assert(r(5L) === Some("repetition"))
  }

  test("semDedup drops the higher id of a within-cell duplicate pair") {
    import spark.implicits._
    def vec(seed: Int): Seq[Float] =
      (0 until 64).map(d => Similarity.planeComponent(seed, d).toFloat)
    // two well-separated base vectors; 10/11 duplicate 0's vector, 12 duplicates 2's
    val rows = Seq(
      0L -> vec(1), 1L -> vec(2), 2L -> vec(3),
      10L -> vec(1), 11L -> vec(1), 12L -> vec(3))
    val emb = rows.toDF("vec_id", "embedding")
    val r = Similarity.semDedup(emb, tau = 0.99, nCentroids = 2, iters = 2).collect()
      .map(x => x.getLong(0) -> x.getAs[Boolean]("dropped")).toMap
    assert(!r(0L) && !r(1L) && !r(2L)) // lowest ids of their groups survive
    assert(r(10L) && r(11L) && r(12L))
    val nn = Similarity.semDedup(emb, tau = 0.99, nCentroids = 2, iters = 2).collect()
      .find(_.getLong(0) == 10L).get
    assert(nn.getAs[Long]("nn_lower_id") === 0L)
    assert(nn.getAs[Double]("nn_lower_sim") === 1.0)
  }

  test("gapFillDaily fills gap days with the carried day-end balance") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val history = Seq(
      ("1", ts(1, 9), "t1", 10.0),
      ("1", ts(1, 18), "t2", 25.0), // day-end of day 1 = 25.0
      ("1", ts(4, 9), "t3", 5.0),
      ("2", ts(3, 9), "t4", 7.0))
      .toDF("customer_id", "transaction_date", "transaction_id", "current_balance")
    val r = BalanceAnalytics.gapFillDaily(history).collect()
      .map(x => (x.getString(0), x.getDate(1).toString) ->
        (x.getAs[Double]("balance"), x.getAs[Boolean]("is_observed"))).toMap
    assert(r(("1", "2024-01-01")) === ((25.0, true)))  // day-end, not first row
    assert(r(("1", "2024-01-02")) === ((25.0, false))) // gap day carried
    assert(r(("1", "2024-01-03")) === ((25.0, false)))
    assert(r(("1", "2024-01-04")) === ((5.0, true)))
    // customer 2 spine starts at ITS first day, ends at the global last day
    assert(!r.contains(("2", "2024-01-02")))
    assert(r(("2", "2024-01-03")) === ((7.0, true)))
    assert(r(("2", "2024-01-04")) === ((7.0, false)))
  }

  test("profileColumns counts rows, nulls, and distincts per column") {
    import spark.implicits._
    val df = Seq((Some(1), "a"), (None, "a"), (Some(2), "b"), (Some(1), "c"))
      .toDF("x", "y")
    val r = RelationalQueries.profileColumns(df, Seq("x", "y")).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("x") === ((4L, 1L, 2L)))
    assert(r("y") === ((4L, 0L, 3L)))
  }

  test("hashSampleQuantiles is exact when k covers the data") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("event_id", "value")
    val r = Sketches.hashSampleQuantiles(df, "value", "event_id", k = 1000)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // nearest-rank-below on the full data: rank = q*(n-1) div 100 + 1
    assert(r(50L) === 50.0)
    assert(r(10L) === 10.0)
    assert(r(90L) === 90.0)
  }

  test("containmentPairs catches doc-in-doc duplication that Jaccard misses") {
    import spark.implicits._
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val long = short + " " + (11 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, "totally different words here now ok"))
      .toDF("doc_id", "text")
    val c = graft.operators.Dedup.containmentPairs(docs).collect()
    assert(c.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(c.head.getAs[Double]("containment") === 1.0) // short fully inside long
    // the same pair is invisible to Jaccard at its threshold
    val j = graft.operators.Dedup.ngramJaccard(docs).collect()
    assert(!j.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("trailingFeatures: strictly-before range frames and lag gaps") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val ev = Seq(
      (1L, 1L, t(10, 0), 5.0),
      (2L, 1L, t(10, 30), 7.0),   // 1 event in prior hour
      (3L, 1L, t(12, 0), 1.0),    // none in prior hour, two in prior 24h
      (4L, 2L, t(10, 0), 9.0))    // other user isolated
      .toDF("event_id", "user_id", "ts", "value")
    val r = graft.queries.EventQueries.trailingFeatures(ev).collect()
      .map(x => x.getLong(0) -> (x.getLong(3), x.getDouble(4),
        Option(x.get(5)).map(_.asInstanceOf[Long]))).toMap
    assert(r(1L) === ((0L, 0.0, None)))
    assert(r(2L) === ((1L, 5.0, Some(1800L))))
    assert(r(3L) === ((0L, 12.0, Some(5400L))))
    assert(r(4L) === ((0L, 0.0, None)))
  }

  test("pageRank concentrates rank on the hub and conserves total mass") {
    import spark.implicits._
    // star: 1 is the hub of 2,3,4
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val r = graft.operators.Graph.pageRank(pairs).collect()
      .map(x => x.getLong(0) -> x.getAs[Double]("pagerank")).toMap
    assert(r(1L) > r(2L) * 2, s"hub should dominate: $r")
    assert(r(2L) === r(3L) && r(3L) === r(4L))
    // no dangling nodes in an undirected pair graph -> mass conserved
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
    val deg = graft.operators.Graph.pageRank(pairs).collect()
      .map(x => x.getLong(0) -> x.getAs[Long]("degree")).toMap
    assert(deg === Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("capPerGroup keeps at most cap rows per group, dense-ranked") {
    import spark.implicits._
    val docs = ((1 to 30).map(i => (i.toLong, "big")) ++ Seq((100L, "small")))
      .toDF("doc_id", "source")
    val r = graft.operators.Sampling.capPerGroup(docs, cap = 5).collect()
    val byGrp = r.groupBy(_.getString(1))
    assert(byGrp("big").length === 5)
    assert(byGrp("small").length === 1)
    assert(byGrp("big").map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // determinism: a second run keeps the identical set
    val r2 = graft.operators.Sampling.capPerGroup(docs, cap = 5).collect()
    assert(r.map(_.getLong(0)).toSet === r2.map(_.getLong(0)).toSet)
  }

  test("tierLookupJoin lands every order in exactly one band") {
    import spark.implicits._
    val orders = Seq((1L, 100.0), (2L, 149999.99), (3L, 150000.0), (4L, 599999.0))
      .toDF("o_orderkey", "o_totalprice")
    val r = graft.queries.RelationalQueries.tierLookupJoin(orders).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("low" -> 2L, "mid" -> 1L, "high" -> 1L))
  }

  test("basketPairs counts within-order co-occurrence with lift") {
    import spark.implicits._
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L), (3L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val r = graft.queries.RelationalQueries.basketPairs(li).collect()
    assert(r.length === 1) // only (1,2) reaches support 3
    val p = r.head
    assert((p.getLong(0), p.getLong(1), p.getLong(2)) === ((1L, 2L, 3L)))
    assert(p.getAs[Double]("lift") === 1.0) // 3 * 3 orders / (3 * 3)
  }

  test("rfmSegments scores each axis with 1 = best") {
    import spark.implicits._
    import java.sql.Timestamp
    // 5 users: user i last active on day i with i events of value i
    val ev = (1 to 5).flatMap(u => (1 to u).map(k =>
      (u.toLong, Timestamp.valueOf(f"2024-01-0$u 10:0$k:00"), u.toDouble)))
      .toDF("user_id", "ts", "value")
    val r = graft.queries.EventQueries.rfmSegments(ev).collect()
      .map(x => x.getLong(0) -> x.getAs[String]("rfm_code")).toMap
    // user 5: most recent, most frequent, highest value -> best on all axes
    assert(r(5L) === "111")
    assert(r(1L) === "555")
  }

  test("lastTouchAttribution credits in-horizon touches, else direct") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: view then purchase 1h later -> 'view'
      (1L, t("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, t("2024-01-01 11:00:00"), 1L, "purchase", 10.0),
      // user 2: click 100h before purchase (beyond 72h) -> 'direct'
      (3L, t("2024-01-01 00:00:00"), 2L, "click", 0.0),
      (4L, t("2024-01-05 05:00:00"), 2L, "purchase", 20.0),
      // user 3: no touch at all -> 'direct'
      (5L, t("2024-01-02 09:00:00"), 3L, "purchase", 5.0),
      // user 4: click then view then purchase -> last touch wins ('view')
      (6L, t("2024-01-03 09:00:00"), 4L, "click", 0.0),
      (7L, t("2024-01-03 09:30:00"), 4L, "view", 0.0),
      (8L, t("2024-01-03 10:00:00"), 4L, "purchase", 7.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.queries.EventQueries.lastTouchAttribution(ev).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r("view") === ((2L, 17.5)))
    assert(r("direct") === ((2L, 25.0)))
    assert(!r.contains("click"))
  }

  test("sessionPaths truncates to maxSteps and counts identical paths") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def t2(m: Int) = Timestamp.valueOf(f"2024-01-01 14:$m%02d:00")
    val ev =
      // user 1 session A: a>b>c; session B (4h later): a>b
      Seq((1L, t(0), 1L, "a"), (2L, t(1), 1L, "b"), (3L, t(2), 1L, "c"),
        (4L, t2(0), 1L, "a"), (5L, t2(1), 1L, "b"),
        // user 2: one 7-event session, truncated at 5
        (6L, t(0), 2L, "a"), (7L, t(1), 2L, "b"), (8L, t(2), 2L, "c"),
        (9L, t(3), 2L, "d"), (10L, t(4), 2L, "e"), (11L, t(5), 2L, "f"),
        (12L, t(6), 2L, "g"))
        .toDF("event_id", "ts", "user_id", "event_type")
    val r = graft.queries.EventQueries.sessionPaths(ev).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("a>b>c" -> 1L, "a>b" -> 1L, "a>b>c>d>e" -> 1L))
  }

  test("avgDailyBalance is the uniform day-weighted mean of the filled series") {
    import spark.implicits._
    import java.sql.Date
    // customer 1: 10.00 for 2 days then 40.00 for 2 days -> avg 25.00
    // customer 2: constant -162.795-ish case: cents -16280, 1 day
    val filled = Seq(
      (1L, Date.valueOf("2024-01-01"), 10.0, true),
      (1L, Date.valueOf("2024-01-02"), 10.0, false),
      (1L, Date.valueOf("2024-01-03"), 40.0, true),
      (1L, Date.valueOf("2024-01-04"), 40.0, false),
      (2L, Date.valueOf("2024-01-01"), -162.8, true))
      .toDF("customer_id", "day", "balance", "is_observed")
    val r = BalanceAnalytics.avgDailyBalance(filled).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(1L) === ((4L, 25.0)))
    assert(r(2L) === ((1L, -162.8)))
  }

  test("vocabCoverage reads cumulative shares at checkpoint ranks") {
    import spark.implicits._
    // 'a' x6, 'b' x3, 'c' x1 -> at k=2: 9/10 = 9000bp
    val docs = Seq((1L, "a a a b b c"), (2L, "a a a b")).toDF("doc_id", "text")
    val r = TextOps.vocabCoverage(docs, ks = Seq(1, 2, 3)).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(4))).toMap
    assert(r(1L) === ((6L, 6000L)))
    assert(r(2L) === ((9L, 9000L)))
    assert(r(3L) === ((10L, 10000L)))
  }

  test("fkOrphanProfile counts orphans and null keys per relation") {
    import spark.implicits._
    val child = Seq((1L, Option(10L)), (2L, Option(10L)), (3L, Option(99L)),
      (4L, None)).toDF("id", "fk")
    val parent = Seq((10L, "a"), (20L, "b")).toDF("pk", "name")
    val r = graft.queries.RelationalQueries
      .fkOrphanProfile(Seq(("c.fk->p.pk", child, "fk", parent, "pk")))
      .collect().head
    assert(r.getString(0) === "c.fk->p.pk")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 1L, 1L)))
  }

  test("sourceDivergence: identical distributions diverge by 0, skewed ones don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b", "s1"), (2L, "a b", "s2"),   // s1, s2, corpus all uniform{a,b}
      (3L, "c c c c", "s3"))                   // s3 concentrates on c
      .toDF("doc_id", "text", "source")
    val r = TextOps.sourceDivergence(docs).collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r("s3") > 0.5) // ln(8/4)=0.69 expected
    // s1/s2: p(a)=p(b)=1/2 vs corpus q(a)=q(b)=1/4 each over {a,b,c}...
    // corpus: a:2 b:2 c:4 of 8 -> q(a)=q(b)=1/4; KL(s1)=ln(2)≈0.693
    assert(r("s1") === r("s2"))
    assert(math.abs(r("s1") - math.log(2)) < 1e-3)
  }

  test("dailyDecompose: revenue = trend + seasonal + residual, all integer-cent exact") {
    import spark.implicits._
    import java.sql.Timestamp
    // 14 days, 10.00/day except +7.00 every Monday (epoch-dow 0)
    val ev = (0 until 14).map { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i) // 2024-01-01 is a Monday
      val v = if (i % 7 == 0) 17.0 else 10.0
      (i.toLong, Timestamp.valueOf(day.atTime(12, 0)), 1L, v)
    }.toDF("event_id", "ts", "user_id", "value")
    val r = graft.queries.EventQueries.dailyDecompose(ev).collect()
    r.foreach { x =>
      val (rev, tr, se, res) = (x.getDouble(2), x.getDouble(3), x.getDouble(4), x.getDouble(5))
      assert(math.abs(rev - (tr + se + res)) < 1e-9, x.toString)
    }
    val monday = r.find(_.getInt(1) == 0).get
    assert(monday.getDouble(2) === 17.0)
    assert(monday.getDouble(4) > 0.0, "Monday seasonal index must be positive")
  }

  test("basketTriangles counts each triangle once with clustering readout") {
    import spark.implicits._
    // orders repeated 3x so every pair passes support>=3:
    // triangle {1,2,3} + pendant edge (3,4): wedges C(2,2)... deg: 1:2 2:2 3:3 4:1
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val li = (0 until 3).flatMap(k => base.zipWithIndex.flatMap { case ((x, y), j) =>
      val ok = (k * 10 + j).toLong
      Seq((ok, x), (ok, y))
    }).toDF("l_orderkey", "l_partkey")
    val r = graft.queries.RelationalQueries.basketTriangles(li).collect().head
    // wedges: v1 C(2,2)=1, v2 1, v3 C(3,2)=3, v4 0 -> 5; clustering = 3*1*10000 div 5
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 4L, 5L, 1L)))
    assert(r.getLong(4) === 6000L)
  }

  test("curateV3: canon, contained-side containment drop, PII ceiling, cap") {
    import spark.implicits._
    val a = (1 to 30).map(i => s"v$i").mkString(" ")           // clean keeper
    val big = (1 to 40).map(i => s"w$i").mkString(" ")         // superset doc
    val small = (1 to 25).map(i => s"w$i").mkString(" ")       // contained in big
    val pii = ((1 to 22).map(i => s"u$i") ++ Seq("spark", "hash", "spark")).mkString(" ")
    val docs = Seq(
      (1L, a, "s1"), (2L, big, "s1"), (3L, small, "s1"),
      (4L, pii, "s1"), (5L, a, "s1") /* exact dup of 1 */)
      .toDF("doc_id", "text", "source")
    val kept = graft.operators.Curation.curateV3(docs).collect().map(_.getLong(0)).toSet
    // 5 falls to canonicalization, 3 is the CONTAINED side (the superset 2
    // survives even though it has the higher id), 4 trips the PII ceiling
    assert(kept === Set(1L, 2L))
  }

  test("debounce collapses chained bursts to their head, per (user, type)") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val ev = Seq(
      (1L, 1L, t("10:00:00"), "view"),  // head — kept
      (2L, 1L, t("10:04:00"), "view"),  // chains (4 min)
      (3L, 1L, t("10:08:00"), "view"),  // chains via event 2 even though 8 min from head
      (4L, 1L, t("10:20:00"), "view"),  // new run after silence — kept
      (5L, 1L, t("10:00:30"), "purchase")) // other type independent — kept
      .toDF("event_id", "user_id", "ts", "event_type")
    val kept = graft.queries.EventQueries.debounce(ev).collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 5L))
  }

  test("typeTransitions counts lagged pairs with _start_ heads") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, 1L, t(0), "view"), (2L, 1L, t(1), "purchase"),
      (3L, 2L, t(0), "view"), (4L, 2L, t(1), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = graft.queries.EventQueries.typeTransitions(ev).collect()
      .map(x => (x.getString(0), x.getString(1)) -> (x.getLong(2), x.getDouble(3))).toMap
    assert(r(("_start_", "view")) === ((2L, 100.0)))
    assert(r(("view", "purchase")) === ((1L, 50.0)))
    assert(r(("view", "view")) === ((1L, 50.0)))
  }

  test("windowed HLL registers equal the batch sketch per window") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = (1 to 500).map(i =>
      (Timestamp.valueOf(f"2024-01-01 ${if (i % 2 == 0) 10 else 11}%02d:00:30"), i.toLong))
      .toDF("ts", "user_id")
    // batch application (watermark is a no-op in batch) must reproduce
    // Sketches.hllRegisters over each hour's users exactly
    val streamedRegs = graft.streaming.StreamingAnalytics.windowedHllRegisters(ev)
      .collect().groupBy(_.getTimestamp(0))
      .map { case (w, rows) => w.toString -> rows.map(r => (r.getLong(1), r.getLong(2))).toSet }
    val evens = graft.operators.Sketches.hllRegisters(
      ev.filter($"user_id" % 2 === 0).select("user_id"), "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamedRegs("2024-01-01 10:00:00.0") === evens)
    assert(streamedRegs.keySet.size === 2)
  }

  test("ordersCube emits all four grouping levels with grouping ids") {
    import spark.implicits._
    val orders = Seq((1L, "O", "HIGH", 10.0), (2L, "F", "LOW", 20.0))
      .toDF("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
    val r = RelationalQueries.ordersCube(orders).collect()
    // 2 detail + 2 per-status + 2 per-priority + 1 grand total
    assert(r.length === 7)
    val grand = r.find(x => x.isNullAt(0) && x.isNullAt(1)).get
    assert(grand.getAs[Long]("gid") === 3L)
    assert(grand.getAs[Long]("n_orders") === 2L)
    assert(grand.getAs[Double]("total_price") === 30.0)
  }
}
