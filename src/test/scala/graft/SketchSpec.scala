package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchSpec extends AnyFunSuite {
  import TestSpark._

  test("KMV sketch is exact below k and within the 1/sqrt(k) regime above") {
    import spark.implicits._
    // 50 distinct keys < k=256 → exact
    val small = (1 to 200).map(i => i % 50).toDF("id")
    val r = Sketches.kmvDistinct(small, "id", k = 256).collect().head
    assert(r.getAs[Double]("kmv_estimate") === 50.0)
    assert(r.getAs[Long]("exact_distinct") === 50L)
    assert(r.getAs[Double]("rel_error") === 0.0)

    // 10k distinct >> k=256 → estimate within a few standard errors (~6%)
    val big = (1 to 10000).toDF("id")
    val b = Sketches.kmvDistinct(big, "id", k = 256).collect().head
    assert(b.getAs[Long]("exact_distinct") === 10000L)
    assert(b.getAs[Double]("rel_error") < 0.2,
      s"estimate ${b.getAs[Double]("kmv_estimate")} too far from 10000")
  }

  test("sharded-build HLL merge equals the single pass bit-for-bit") {
    import spark.implicits._
    val big = (1 to 10000).map(i => s"u$i").toDF("id")
    val single = Sketches.hllDistinct(big, "id").collect().toSeq
    // associativity of register-wise MAX: any shard split must merge to the
    // exact same registers, hence the exact same estimate
    for (nShards <- Seq(1, 4, 16, 97))
      assert(Sketches.hllMergedDistinct(big, "id", nShards).collect().toSeq === single,
        s"merge over $nShards shards diverged from the single pass")
  }

  test("hllMerge over explicit per-shard register tables is register-wise MAX") {
    import spark.implicits._
    val docs = (1 to 4000).map(i => (s"u$i", i % 3)).toDF("id", "shard")
    val perShard = (0 until 3).map(sh =>
      Sketches.hllRegisters(docs.filter($"shard" === sh), "id").withColumn("s",
        org.apache.spark.sql.functions.lit(sh)))
      .reduce(_ unionByName _)
    val merged = Sketches.hllMerge(perShard)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Sketches.hllRegisters(docs, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === direct)
  }

  test("bloom FPR: complete accounting, bit-set bound, near theory, deterministic") {
    val s = TestSpark.spark
    val orders = graft.sources.Tables.orders(s, "/root/testdata/sf0.001")
    val customer = graft.sources.Tables.customer(s, "/root/testdata/sf0.001")
    val r = Sketches.bloomFpr(orders, customer).collect().head
    val nMem = r.getAs[Long]("n_members")
    val nNon = r.getAs[Long]("n_nonmembers")
    assert(nMem + nNon === customer.count())
    assert(r.getAs[Long]("n_bits_set") <= math.min(1L << 14, nMem * 3))
    // FPR within a loose multiple of (1 − e^{−kn/m})^k — a sanity band,
    // not a tight statistical test (the gate pins exactness instead)
    val theory = math.pow(1 - math.exp(-3.0 * nMem / (1 << 14)), 3)
    val fp = r.getAs[Long]("fp_bp").toDouble / 10000
    assert(fp <= theory * 5 + 0.01, s"fp=$fp theory=$theory")
    // determinism: the whole readout reproduces bit-for-bit
    assert(Sketches.bloomFpr(orders, customer).collect().head === r)
  }

  test("HDR quantiles: every estimate within the 2^-(s+1) relative bound, exact below unit") {
    import spark.implicits._
    // a log-spread value grid (cents 1 .. ~3.3M) across two groups
    val rows = (0 until 4000).map { i =>
      val cents = math.round(math.exp(i % 150 / 10.0)).max(1)
      (if (i % 2 == 0) "a" else "b", cents / 100.0)
    }
    val df = rows.toDF("t", "v")
    val out = Sketches.hdrQuantiles(df, "v", "t", qs = Seq(10, 50, 90, 99))
      .collect()
    assert(out.length === 8)
    for (r <- out) {
      assert(r.getAs[Boolean]("within_bound"),
        s"${r.getAs[String]("event_type")} p${r.getAs[Long]("q_pct")}: " +
          s"est2=${r.getAs[Long]("est2")} exact2=${r.getAs[Long]("exact2")} " +
          s"rel=${r.getAs[Long]("rel_err_ppm")} ppm")
      assert(r.getAs[Long]("rel_err_ppm") <= 15625L)
    }
    // values below 2^(s+1)=64 cents sit in exact unit buckets: a corpus
    // confined there must report zero error at every quantile
    val tiny = (1 to 500).map(i => ("a", (i % 60 + 1) / 100.0)).toDF("t", "v")
    for (r <- Sketches.hdrQuantiles(tiny, "v", "t").collect())
      assert(r.getAs[Long]("est2") === r.getAs[Long]("exact2"),
        s"unit-bucket range must be exact: $r")
  }

  test("HDR bucket index is monotone in cents and decodes to an enclosing bucket") {
    // drive the same expressions the operator uses over a dense cents range
    import spark.implicits._
    val df = (1L to 5000L).toDF("c").selectExpr(
      "c",
      "length(bin(c)) - 1 as e")
      .selectExpr("c",
        "case when e <= 5 then c else (e - 5) * 32 + shiftright(c, cast(e - 5 as int)) end as idx")
    val rows = df.orderBy("c").collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.sliding(2).foreach { case Array((c1, i1), (c2, i2)) =>
      assert(i1 <= i2, s"bucket index not monotone: cents $c1->$c2 idx $i1->$i2")
    }
    // decode: lo <= c < lo + width for every (c, idx) pair
    rows.foreach { case (c, idx) =>
      val (lo, w) =
        if (idx < 64) (idx, 1L)
        else {
          val m = idx % 32 + 32
          val w = 1L << (idx / 32 - 1).toInt
          (m * w, w)
        }
      assert(lo <= c && c < lo + w, s"cents $c outside bucket [$lo, ${lo + w}) idx=$idx")
    }
  }

  test("HDR sliding windows merge per-day registers by count addition") {
    import spark.implicits._
    // three days, disjoint value ranges: day-3's trailing-3 window covers
    // all rows, so its quantiles must equal the whole-corpus sketch's
    val rows =
      (1 to 100).map(i => (java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(i), i / 100.0)) ++
      (1 to 100).map(i => (java.time.LocalDateTime.of(2024, 1, 2, 0, 0).plusMinutes(i), (1000 + i) / 100.0)) ++
      (1 to 100).map(i => (java.time.LocalDateTime.of(2024, 1, 3, 0, 0).plusMinutes(i), (100000 + i) / 100.0))
    val ev = rows.toDF("ts", "value")
    val sliding = Sketches.hdrSlidingQuantiles(ev, qs = Seq(50, 99), windowDays = 3)
      .collect().map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("q_pct"), r.getAs[Long]("est2"), r.getAs[Long]("n_window"))).toSeq
    val global = Sketches.hdrQuantiles(
      ev.withColumn("t", org.apache.spark.sql.functions.lit("all")), "value", "t",
      qs = Seq(50, 99)).collect()
      .map(r => (r.getAs[Long]("q_pct"), r.getAs[Long]("est2"))).toMap
    val day3 = sliding.filter(_._1 == "2024-01-03")
    assert(day3.map(_._4).distinct === Seq(300L), "day-3 window must cover all 300 rows")
    for ((_, q, est2, _) <- day3)
      assert(est2 === global(q),
        s"merged trailing window diverged from the whole-corpus sketch at p$q")
    // day-1 window sees only day-1 rows — its p99 must sit in day-1's range
    val day1p99 = sliding.find(r => r._1 == "2024-01-01" && r._2 == 99L).get._3
    assert(day1p99 < 300L, s"day-1 p99 est2=$day1p99 leaked later days' values")
  }
}
