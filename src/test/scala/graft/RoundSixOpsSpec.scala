package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps
import graft.operators.Sketches

/** Round-6 additions: per-group HLL, Count-Min sketch, n-gram novelty. */
class RoundSixOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("per-group HLL matches the global sketch when there is one group") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("only", s"u$i")).toDF("g", "id")
    val grouped = Sketches.hllDistinctByGroup(df, "g", "id").collect().head
    val global = Sketches.hllDistinct(df.select("id"), "id").collect().head
    assert(grouped.getAs[Double]("est_distinct") === global.getAs[Double]("est_distinct"))
    assert(grouped.getAs[Long]("exact_distinct") === 5000L)
  }

  test("per-group HLL keeps groups independent") {
    import spark.implicits._
    // group a: 1000 distinct; group b: the SAME 10 ids repeated
    val df = ((1 to 1000).map(i => ("a", s"u$i")) ++
      (1 to 500).map(i => ("b", s"u${i % 10}"))).toDF("g", "id")
    val r = Sketches.hllDistinctByGroup(df, "g", "id").collect()
      .map(x => x.getString(0) -> x.getAs[Long]("exact_distinct")).toMap
    assert(r === Map("a" -> 1000L, "b" -> 10L))
    val ests = Sketches.hllDistinctByGroup(df, "g", "id").collect()
      .map(x => x.getString(0) -> x.getAs[Double]("est_distinct")).toMap
    // small-cardinality group must not inherit the big group's registers
    assert(ests("b") < 100.0, s"group b estimate ${ests("b")} polluted")
  }

  test("CMS estimates are one-sided: estimate >= exact, equal when uncollided") {
    import spark.implicits._
    val docs = Seq((1L, Seq.fill(50)("hot").mkString(" ") + " cold warm cool"),
      (2L, Seq.fill(30)("hot").mkString(" ") + " cold tepid"))
      .toDF("doc_id", "text")
    // w large: no collisions -> every estimate exact
    val exact = Sketches.cmsTokenCounts(docs, d = 4, w = 4096, k = 10).collect()
    assert(exact.forall(_.getAs[Long]("overestimate") === 0L))
    assert(exact.head.getAs[String]("token") === "hot")
    assert(exact.head.getAs[Long]("occurrences") === 80L)
    // w tiny: collisions force over-counts but NEVER under-counts
    val tight = Sketches.cmsTokenCounts(docs, d = 2, w = 2, k = 10).collect()
    assert(tight.forall(_.getAs[Long]("overestimate") >= 0L))
  }

  test("retention: cohorts count from first-active day, offsets partition activity") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // u1 first active day 1, returns day 2; u2 first day 1 only; u3 first day 2
    val ev = Seq(
      (1L, t(1, 9)), (1L, t(1, 11)), (1L, t(2, 9)),
      (2L, t(1, 10)),
      (3L, t(2, 12))).toDF("user_id", "ts")
    val r = graft.queries.EventQueries.retention(ev).collect()
      .map(x => (x.getDate(0).toString, x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    assert(r(("2024-01-01", 0L)) === ((2L, 2L, 100.0))) // u1, u2
    assert(r(("2024-01-01", 1L)) === ((1L, 2L, 50.0)))  // u1 returns
    assert(r(("2024-01-02", 0L)) === ((1L, 1L, 100.0))) // u3's own cohort
    assert(r.size === 3) // same-day repeat activity never double-counts
  }

  test("unigram logprob: uniform corpus scores ln(1/V); rare token drags the min") {
    import spark.implicits._
    // 4 tokens total: "a" x3, "z" x1 -> P(a)=0.75, P(z)=0.25
    val docs = Seq((1L, "a a a"), (2L, "z")).toDF("doc_id", "text")
    val r = TextOps.unigramLogProb(docs).collect()
      .map(x => x.getLong(0) -> (x.getAs[Long]("n_tokens"),
        x.getAs[Double]("avg_logprob"), x.getAs[Double]("min_logprob"))).toMap
    val ln075 = BigDecimal(math.log(0.75)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln025 = BigDecimal(math.log(0.25)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1L) === ((3L, ln075, ln075)))
    assert(r(2L) === ((1L, ln025, ln025)))
  }

  test("z-value interleaves bits; buckets bound both axis spans") {
    import spark.implicits._
    import graft.sources.ZOrder
    // reference interleave computed bit-by-bit
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L), (12345L, 54321L))
    val got = pairs.toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y").as("z")).collect().map(_.getLong(0))
    assert(got.toSeq === pairs.map { case (x, y) => morton(x, y) })
    // locality: with 10 bucket bits, 22 low bits remain -> each axis is
    // confined to an 11-bit range inside any bucket
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val stats = ZOrder.zorderStats(orders).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(r.getAs[Long]("x_span") <= 2048 && r.getAs[Long]("y_span") <= 2048,
        s"bucket ${r.getAs[Long]("zbucket")} exceeds the curve's bounding box")
    }
  }

  test("anomaly days: flags spikes and dips only after a full trailing window") {
    import spark.implicits._
    import java.sql.Timestamp
    // one event type, 10 quiet days of 4 events, then a 12-event spike day
    val rows = (1 to 10).flatMap(day =>
      (1 to 4).map(i => (day.toLong * 100 + i, Timestamp.valueOf(f"2024-02-$day%02d 01:00:00")))) ++
      (1 to 12).map(i => (1100L + i, Timestamp.valueOf("2024-02-11 01:00:00")))
    val ev = rows.map { case (id, ts) => (id, ts, "load") }.toDF("event_id", "ts", "event_type")
    val r = graft.queries.EventQueries.anomalyDays(ev).collect()
    // days 1-7 lack a full window; days 8-10 are quiet; day 11 spikes 3x
    assert(r.map(_.getDate(1).toString).toSeq ===
      Seq("2024-02-08", "2024-02-09", "2024-02-10", "2024-02-11"))
    assert(r.take(3).forall(x => x.getAs[Int]("is_anomaly") === 0))
    val spike = r.last
    assert(spike.getAs[Long]("n_events") === 12L)
    assert(spike.getAs[Double]("ratio") === 3.0)
    assert(spike.getAs[Int]("is_anomaly") === 1)
  }

  test("anomaly days: a total outage day is densified in and flags as a dip") {
    import spark.implicits._
    import java.sql.Timestamp
    // steady 4/day on days 1-8, SILENT days 9-12, one event day 13
    val rows = (1 to 8).flatMap(day =>
      (1 to 4).map(i => (day.toLong * 100 + i,
        Timestamp.valueOf(f"2024-03-$day%02d 01:00:00")))) :+
      (1301L, Timestamp.valueOf("2024-03-13 01:00:00"))
    val ev = rows.map { case (id, ts) => (id, ts, "gap") }
      .toDF("event_id", "ts", "event_type")
    val r = graft.queries.EventQueries.anomalyDays(ev).collect()
      .map(x => x.getDate(1).toString ->
        (x.getAs[Long]("n_events"), x.getAs[Double]("ratio"),
          x.getAs[Int]("is_anomaly"))).toMap
    // day 9 exists as a row despite zero events, and flags as a dip
    assert(r("2024-03-09") === ((0L, 0.0, 1)))
    assert(r("2024-03-12") === ((0L, 0.0, 1))) // deep in the outage, baseline >0 still
    // day 13's single event vs the mostly-dead trailing week (12/7):
    // ratio 0.5833 — just inside the band, not a dip
    assert(r("2024-03-13") === ((1L, 0.5833, 0)))
  }

  test("length histogram: integer bin edges, clamped top bin, shares sum to 100") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(_ => "t").mkString(" ")),    // 10 tokens  -> bin 0
      (2L, (1 to 64).map(_ => "t").mkString(" ")),    // 64 tokens  -> bin 1 (edge)
      (3L, (1 to 63).map(_ => "t").mkString(" ")),    // 63 tokens  -> bin 0 (edge)
      (4L, (1 to 5000).map(_ => "t").mkString(" ")))  // clamps to bin 31
      .toDF("doc_id", "text")
    val r = TextOps.lengthHistogram(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getAs[Long]("n_docs"),
        x.getAs[Long]("min_tokens"), x.getAs[Long]("max_tokens"),
        x.getAs[Double]("pct_docs"))).toMap
    assert(r(0L) === ((0L, 2L, 10L, 63L, 50.0)))
    assert(r(1L) === ((64L, 1L, 64L, 64L, 25.0)))
    assert(r(31L) === ((1984L, 1L, 5000L, 5000L, 25.0)))
    assert(r.size === 3)
  }

  test("pivot: absent cells stay null; values land under their type column") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(
      (Timestamp.valueOf("2024-03-05 10:00:00"), "click", 2.5),
      (Timestamp.valueOf("2024-03-09 10:00:00"), "click", 1.5),
      (Timestamp.valueOf("2024-04-01 10:00:00"), "view", 7.0))
      .toDF("ts", "event_type", "value")
    val r = graft.queries.EventQueries.pivotMonthly(ev).collect()
    assert(r.length === 2)
    val march = r(0)
    assert(march.getAs[Double]("click") === 4.0)
    assert(march.isNullAt(march.fieldIndex("view")))
    assert(r(1).getAs[Double]("view") === 7.0)
    assert(r(1).isNullAt(r(1).fieldIndex("signup")))
  }

  test("rollup: detail, subtotal, and grand-total levels reconcile") {
    import spark.implicits._
    val orders = Seq(
      ("F", "2-HIGH", 10.0), ("F", "5-LOW", 20.0), ("O", "2-HIGH", 5.0))
      .toDF("o_orderstatus", "o_orderpriority", "o_totalprice")
    val r = graft.queries.RelationalQueries.ordersRollup(orders).collect()
    val grand = r.find(_.getAs[Long]("gid") === 3L).get
    assert(grand.getAs[Long]("n_orders") === 3L && grand.getAs[Double]("total_price") === 35.0)
    val fSub = r.find(x => x.getAs[Long]("gid") === 1L && x.getString(0) == "F").get
    assert(fSub.getAs[Long]("n_orders") === 2L && fSub.getAs[Double]("total_price") === 30.0)
    // 3 detail + 2 subtotals + 1 grand total
    assert(r.length === 6)
    assert(r.count(_.getAs[Long]("gid") === 0L) === 3)
  }

  test("upsert: new keys insert, quiet keys carry, overlaps update; totals reconcile") {
    import spark.implicits._
    val t = (d: Int) => java.time.LocalDateTime.of(2024, 1, d, 12, 0)
    val txns = Seq(
      ("1", "a", 10.0, t(1), "earned"),  // A: pre only
      ("2", "b", 20.0, t(1), "earned"),  // B: pre and post
      ("3", "b", -5.0, t(20), "spent"),
      ("4", "c", 7.0, t(20), "earned"))  // C: post only
      .toDF("transaction_id", "customer_id", "amount", "timestamp", "transaction_type")
    val r = graft.operators.SnapshotMerge.balanceUpsert(txns, "2024-01-15 00:00:00")
      .collect()
      .map(x => x.getString(0) -> (x.getAs[Double]("merged_balance"),
        x.getAs[String]("status"))).toMap
    assert(r === Map(
      "a" -> ((10.0, "carried")),
      "b" -> ((15.0, "updated")),
      "c" -> ((7.0, "new"))))
  }

  test("scd2: runs compress, bounds chain, current state stays open") {
    import spark.implicits._
    import java.sql.Timestamp
    val t = (m: Int) => Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, t(0), 1L, "view"), (2L, t(5), 1L, "view"),   // run of 2 views
      (3L, t(10), 1L, "click"),                          // state change
      (4L, t(20), 1L, "view"),                           // back to view
      (5L, t(0), 2L, "signup"))                          // user 2: one state
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = graft.queries.EventQueries.scd2Status(ev).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        x.getTimestamp(3), Option(x.getTimestamp(4))))
    assert(r.toSeq === Seq(
      (1L, 1L, "view", t(0), Some(t(10))),   // run start, expires at the change
      (1L, 2L, "click", t(10), Some(t(20))),
      (1L, 3L, "view", t(20), None),         // current state open-ended
      (2L, 1L, "signup", t(0), None)))
  }

  test("deciles: equal-count buckets, ranges chain monotonically") {
    import spark.implicits._
    val ev = (1 to 40).map(i => (i.toLong, "load", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val r = graft.queries.EventQueries.valueDeciles(ev).collect()
    assert(r.length === 10)
    assert(r.forall(_.getAs[Long]("n_events") === 4L))
    // bucket i's range sits strictly below bucket i+1's
    r.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi_value") < b.getAs[Double]("lo_value"))
    }
    assert(r.head.getAs[Double]("lo_value") === 1.0)
    assert(r.last.getAs[Double]("hi_value") === 40.0)
  }

  test("uniform sample: k smallest hashes, append-stable") {
    import spark.implicits._
    val base = (1L to 500L).map(i => (i, "src0")).toDF("doc_id", "source")
    val s1 = graft.operators.Sampling.uniformSample(base, k = 20).collect()
      .map(_.getLong(0)).toSet
    assert(s1.size === 20)
    // appending docs can only displace members whose hash exceeds the new
    // docs' — recompute on the grown corpus and check the survivors kept
    // their membership deterministically (same ids on a rerun)
    val s1again = graft.operators.Sampling.uniformSample(base, k = 20).collect()
      .map(_.getLong(0)).toSet
    assert(s1 === s1again)
    val grown = (1L to 600L).map(i => (i, "src0")).toDF("doc_id", "source")
    val s2 = graft.operators.Sampling.uniformSample(grown, k = 20).collect()
      .map(_.getLong(0)).toSet
    // append stability: an old doc can only ENTER the sample of the grown
    // corpus if it was already in the base sample (20 smallest hashes of a
    // subset ⊆ 20 smallest of the superset), so every newcomer in s2 must
    // be an appended id
    assert((s2 -- s1).forall(_ > 500L), s"old doc entered late: ${s2 -- s1}")
    assert((s1 & s2).size === 20 - s2.count(_ > 500L))
  }

  test("lang confusion: per-label shares sum to 100") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog", "en"),
      (2L, "le chien et la mer", "fr"),
      (3L, "xyzzy plugh", "en")) // no markers -> predicted und
      .toDF("doc_id", "text", "lang")
    val r = TextOps.langConfusion(docs).collect()
    val en = r.filter(_.getString(0) == "en")
    assert(en.map(_.getAs[Double]("pct_of_label")).sum === 100.0)
    assert(en.exists(x => x.getString(1) == "und" && x.getAs[Long]("n_docs") === 1L))
    assert(r.find(_.getString(0) == "fr").get.getString(1) === "fr")
  }

  test("sliding rollup: each event covers 4 windows; counts smooth across the slide") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(
      (Timestamp.valueOf("2024-01-01 10:20:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:40:00"), "click", 2.0))
      .toDF("ts", "event_type", "value")
    val r = graft.queries.EventQueries.slidingRollup(ev).collect()
      .map(x => x.getTimestamp(0).toString -> (x.getAs[Long]("n_events"),
        x.getAs[Double]("total_value"))).toMap
    // 10:20 lands in starts 09:30..10:15; 10:40 in 09:45..10:30 → overlap 09:45..10:15
    assert(r.size === 5)
    assert(r("2024-01-01 09:30:00.0") === ((1L, 1.0)))
    assert(r("2024-01-01 09:45:00.0") === ((2L, 3.0)))
    assert(r("2024-01-01 10:15:00.0") === ((2L, 3.0)))
    assert(r("2024-01-01 10:30:00.0") === ((1L, 2.0)))
  }

  test("curation v2: dups canonicalize BEFORE novelty; each gate drops its target") {
    import spark.implicits._
    val good = "the cat and the dog walked to the park with the ball again today"
    val tpl = "the bird and the fish swam to the sea with the wave again today"
    val docs = Seq(
      (1L, good),                        // survives every gate
      (2L, good),                        // exact dup — canonicalized away, must NOT
                                         // zero doc 1's novelty (the order-of-ops bug)
      (3L, "the ship and the crew sailed to the bay with zzqx9 vvbn7 kjhg5 qwer3 zxcv1"),
                                         // rare-token tail -> logprob floor
      (4L, tpl),                         // template pair: near-dup but not exact —
      (5L, tpl.replace("today", "tonight"))) // novelty floor kills BOTH (by design)
      .toDF("doc_id", "text")
    // 14-token docs have ten 5-gram shingles; the template pair's one
    // changed word makes exactly one novel shingle each (0.1), so the
    // floor is raised past it here
    val ids = graft.operators.Curation
      .curateV2(docs, minQuality = 0.0, minLogProb = -3.0, minNovelty = 0.15)
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L), s"expected only the canonical good doc, got $ids")
  }

  test("novelty: shared shingles score low, unique docs score 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"), // shares all shingles with doc 2
      (2L, "alpha beta gamma delta"),
      (3L, "one two three four five")) // entirely unique
      .toDF("doc_id", "text")
    val r = TextOps.noveltyStats(docs).collect()
      .map(x => x.getLong(0) -> (x.getAs[Long]("n_shingles"),
        x.getAs[Long]("n_novel"), x.getAs[Double]("novelty_ratio"))).toMap
    assert(r(1L) === ((2L, 0L, 0.0)))
    assert(r(2L) === ((2L, 0L, 0.0)))
    assert(r(3L) === ((3L, 3L, 1.0)))
  }

  test("rollupMaintain: merged rollup equals recompute; statuses name the delta shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // key A: rows both sides -> updated; min from base, max from delta
      (1L, ts("2024-01-10 01:00:00"), 1L, "A", 1.00),
      (2L, ts("2024-01-10 02:00:00"), 1L, "A", 5.00),
      (3L, ts("2024-01-20 03:00:00"), 1L, "A", 9.00),
      // key B: base only -> carried
      (4L, ts("2024-01-10 04:00:00"), 2L, "B", 2.50),
      // key C: delta only -> new
      (5L, ts("2024-01-20 05:00:00"), 3L, "C", 4.00),
      // key D: base only, all-NaN values -> carried, NULL sum/min/max but n counts
      (6L, ts("2024-01-10 06:00:00"), 4L, "D", Double.NaN))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val rows = graft.operators.SnapshotMerge.rollupMaintain(events, "2024-01-16 00:00:00")
      .collect().map(x => (x.getAs[String]("event_type"), x.getAs[String]("day")) -> x).toMap
    // day axis: base keys land on 01-10, delta keys on 01-20; A spans both
    assert(rows.size === 5) // (A,10) (A,20) (B,10) (C,20) (D,10)
    val aBase = rows(("A", "2024-01-10"))
    assert(aBase.getAs[Long]("n") === 2L && aBase.getAs[String]("status") === "carried")
    assert(aBase.getAs[Long]("cents_sum") === 600L)
    val aDelta = rows(("A", "2024-01-20"))
    assert(aDelta.getAs[String]("status") === "new" && aDelta.getAs[Long]("cents_sum") === 900L)
    assert(rows(("B", "2024-01-10")).getAs[String]("status") === "carried")
    assert(rows(("C", "2024-01-20")).getAs[String]("status") === "new")
    val d = rows(("D", "2024-01-10"))
    assert(d.getAs[Long]("n") === 1L)
    assert(d.isNullAt(d.fieldIndex("cents_sum")) && d.isNullAt(d.fieldIndex("cents_min")))
    // the identity itself: merged == one rollup over everything
    val direct = events
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        when(col("value").isNull || isnan(col("value")), lit(null).cast("long"))
          .otherwise(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents_sum"),
        min("cents").as("cents_min"), max("cents").as("cents_max"))
      .orderBy("event_type", "day")
      .collect().map(x => (x.getString(0), x.getString(1), x.getAs[Any]("n"),
        x.getAs[Any]("cents_sum"), x.getAs[Any]("cents_min"), x.getAs[Any]("cents_max")))
    val merged = graft.operators.SnapshotMerge.rollupMaintain(events, "2024-01-16 00:00:00")
      .collect().map(x => (x.getString(0), x.getString(1), x.getAs[Any]("n"),
        x.getAs[Any]("cents_sum"), x.getAs[Any]("cents_min"), x.getAs[Any]("cents_max")))
    assert(merged.toSeq === direct.toSeq)
  }
}
