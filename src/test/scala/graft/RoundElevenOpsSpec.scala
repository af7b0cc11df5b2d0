package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.Multimodal
import graft.queries.EventQueries

/** Round-11 additions: decode-path perceptual hashing and real 2×2 pooling
  * over ImageIO-decoded pixels, the Zipf rank-frequency audit, and the
  * event-chain stationary distribution (integer-pico power iteration). */
class RoundElevenOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("imageAHash: decoded-pixel hash matches the fixture formula independently") {
    val media = Multimodal.withImagePayloads(docs((3L, "a"), (1283L, "b"), (7L, "c")))
    val r = Multimodal.imageAHash(media).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("ahash")).toMap
    def expected(id: Long): Long = {
      val w = 4 + java.lang.Math.floorMod(id, 5L).toInt
      val h = 3 + java.lang.Math.floorMod(id, 4L).toInt
      val px = (for { y <- 0 until h; x <- 0 until w }
        yield java.lang.Math.floorMod(id * 31 + 7L * x + 13L * y, 256L)).toArray
      val total = px.sum
      px.indices.foldLeft(0L)((acc, i) =>
        if (px(i) * px.length > total) acc | (1L << i) else acc)
    }
    for ((id, h) <- r) assert(h === expected(id), s"doc $id")
    // the fixture pattern repeats every lcm(5,4,256) = 1280 ids
    assert(r(3L) === r(1283L), "ids 1280 apart must collide")
    assert(r(3L) !== r(7L), "different patterns must differ")
  }

  test("imageAHashGroups keeps only collision groups with min-id canonical") {
    val media = Multimodal.withImagePayloads(
      docs((3L, "a"), (1283L, "b"), (2563L, "c"), (7L, "d")))
    val g = Multimodal.imageAHashGroups(media).collect()
    assert(g.map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(3L, 1283L, 2563L))
    assert(g.forall(_.getAs[Long]("canonical_doc_id") == 3L))
    assert(g.forall(_.getAs[Long]("group_size") == 3L))
  }

  test("poolImages: 2x2 floor-mean pooling over decoded pixels, edges partial") {
    val media = Multimodal.withImagePayloads(docs((5L, "a"))) // w=4, h=4 -> 2x2 out
    val r = Multimodal.poolImages(media).collect().head
    assert(r.getAs[Long]("out_w") === 2L)
    assert(r.getAs[Long]("out_h") === 2L)
    val w = 4; val h = 4
    def pix(x: Int, y: Int) = java.lang.Math.floorMod(5L * 31 + 7L * x + 13L * y, 256L)
    val pooled = for { oy <- 0 until 2; ox <- 0 until 2 } yield {
      val block = for { dy <- 0 until 2; dx <- 0 until 2
        if ox * 2 + dx < w && oy * 2 + dy < h } yield pix(ox * 2 + dx, oy * 2 + dy)
      block.sum / block.length
    }
    assert(r.getAs[Long]("pool_sum") === pooled.sum)
    assert(r.getAs[Long]("pool_min") === pooled.min)
    assert(r.getAs[Long]("pool_max") === pooled.max)
  }

  test("zipfFit: an exact power-law corpus fits slope -1 with r2 ~ 1") {
    // token k appears 840/k times: ln f = ln 840 - ln rank exactly
    val words = (1 to 8).flatMap(k => Seq.fill(840 / k)(s"w$k"))
    val r = TextOps.zipfFit(docs((1L, words.mkString(" ")))).collect().head
    assert(r.getAs[Long]("n_tokens") === 8L)
    assert(math.abs(r.getAs[Double]("slope") + 1.0) < 0.01, r.toString)
    assert(r.getAs[Double]("r2") > 0.999)
    // intercept_ln ~ ln 840
    assert(math.abs(r.getAs[Double]("intercept_ln") - math.log(840.0)) < 0.01)
  }

  test("zipfFit: a flat (uniform) corpus reads slope ~ 0") {
    val words = (1 to 10).flatMap(k => Seq.fill(50)(s"w$k"))
    val r = TextOps.zipfFit(docs((1L, words.mkString(" ")))).collect().head
    assert(math.abs(r.getAs[Double]("slope")) < 0.01)
  }

  test("markovStationary: an absorbing-leaning chain concentrates mass there") {
    import spark.implicits._
    // u1..u40 each: view -> click -> purchase -> purchase (purchase self-loops)
    val events = (1 to 40).flatMap { u =>
      Seq("view", "click", "purchase", "purchase", "purchase").zipWithIndex.map {
        case (t, i) => (u.toLong * 100 + i, u.toLong,
          java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"), t)
      }
    }.toDF("event_id", "user_id", "ts", "event_type")
    val r = EventQueries.markovStationary(events).collect()
      .map(x => x.getString(0) -> x).toMap
    val p = r.view.mapValues(_.getAs[Double]("stationary_p")).toMap
    assert(p("purchase") > p("view") && p("purchase") > p("click"),
      s"self-looping sink must dominate: $p")
    // mass conserved up to pico floor leakage
    assert(math.abs(p.values.sum - 1.0) < 1e-6)
    assert(r("purchase").getAs[Long]("n_out") === 80L) // 2 purchase->purchase per user
  }

  test("dedupClustersStar: chain, clique, and singleton-pair components match propagation") {
    import spark.implicits._
    // a 12-node chain (diameter 11 — the shape that punishes propagation),
    // a 4-clique, and an isolated pair
    val chain = (1L until 12L).map(i => (i, i + 1))
    val clique = Seq((20L, 21L), (20L, 22L), (20L, 23L), (21L, 22L), (21L, 23L), (22L, 23L))
    val pair = Seq((40L, 41L))
    val pairs = (chain ++ clique ++ pair).toDF("doc_a", "doc_b")
    val star = graft.operators.Dedup.dedupClustersStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = graft.operators.Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === prop, "both formulations must reach the same fixpoint")
    assert((1L to 12L).forall(star(_) == 1L))
    assert((20L to 23L).forall(star(_) == 20L))
    assert(star(40L) === 40L && star(41L) === 40L)
  }

  test("trailingSpend: RANGE frame includes same-day peers and expires old orders") {
    import spark.implicits._
    val ts = (s: String) => java.time.LocalDateTime.parse(s + "T00:00")
    val orders = Seq(
      // customer 1: two same-day orders (peers must BOTH count in each
      // other's frame), a third inside 90 days, a fourth beyond it
      (1L, 101L, "2020-01-01", 10.00),
      (1L, 102L, "2020-01-01", 5.00),
      (1L, 103L, "2020-03-01", 2.00),
      (1L, 104L, "2020-07-01", 1.00),
      (2L, 201L, "2020-01-01", 7.00)
    ).map { case (c, o, d, p) => (c, o, ts(d), p) }
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    val r = graft.queries.RelationalQueries.trailingSpend(orders).collect()
      .map(x => x.getAs[Long]("o_orderkey") -> x.getAs[Double]("trailing_spend")).toMap
    assert(r(101L) === 15.00 && r(102L) === 15.00) // peers see each other
    assert(r(103L) === 17.00)                      // Jan 1 still inside 90 days of Mar 1
    assert(r(104L) === 1.00)                       // everything else expired
    assert(r(201L) === 7.00)
  }

  test("idleRichCustomers: exactly-at-mean is excluded; order placers are excluded") {
    import spark.implicits._
    // positive balances 100 and 300 → mean 200; cust 3 sits exactly at it
    val customer = Seq(
      (1L, "a", 1, 100.0), (2L, "b", 1, 300.0), (3L, "c", 1, 200.0),
      (4L, "d", 2, 250.0), (5L, "e", 2, -50.0)
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val orders = Seq((10L, 2L)).toDF("o_orderkey", "o_custkey")
    val nation = Seq((1, "ALPHA"), (2, "BETA")).toDF("n_nationkey", "n_name")
    // mean of positives = (100+300+200+250)/4 = 212.5; rich = {2: 300, 4: 250};
    // cust 2 placed an order → only cust 4 survives
    val r = graft.queries.RelationalQueries.idleRichCustomers(customer, orders, nation)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq === Seq(("BETA", 1L, 250.00)))
  }

  test("largeVolumeOrders: strict threshold, exact integer ranking") {
    import spark.implicits._
    val ts = java.time.LocalDateTime.parse("2020-01-01T00:00")
    val lineitem = Seq(
      (1L, 150.0), (1L, 150.0),          // order 1: 300 — NOT > 300
      (2L, 200.0), (2L, 101.0),          // order 2: 301
      (3L, 400.0)                        // order 3: 400
    ).toDF("l_orderkey", "l_quantity")
    val orders = Seq((1L, 10L, ts), (2L, 11L, ts), (3L, 12L, ts))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    val customer = Seq((10L, "x"), (11L, "y"), (12L, "z")).toDF("c_custkey", "c_name")
    val r = graft.queries.RelationalQueries.largeVolumeOrders(lineitem, orders, customer)
      .collect().map(x => (x.getAs[Long]("o_orderkey"), x.getAs[Long]("total_qty")))
    assert(r.toSeq === Seq((3L, 400L), (2L, 301L)))
  }

  test("audioFeatures: decoded-sample stats match the fixture formula independently") {
    val media = Multimodal.withAudioPayloads(docs((1L, "a"), (7L, "b"), (1283L, "c")))
    val r = Multimodal.audioFeatures(media).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_samples"), x.getAs[Long]("duration_ms"),
         x.getAs[Long]("energy"), x.getAs[Long]("zero_cross"),
         x.getAs[Long]("peak"))).toMap
    // expectations computed independently (python wave round-trip probe)
    assert(r(1L) === ((880L, 110L, 294119191L, 13L, 1001L)))
    assert(r(7L) === ((960L, 120L, 322504517L, 16L, 1001L)))
    assert(r(1283L) === ((1040L, 130L, 348524857L, 18L, 1001L)))
  }

  test("audioTopFrames: at most k frames per clip, energies descending, ties by frame") {
    val media = Multimodal.withAudioPayloads(docs((1L, "a"), (9L, "b")))
    val rows = Multimodal.audioTopFrames(media).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { fs =>
      val sorted = fs.sortBy(_.getAs[Long]("loudness_rank"))
      val en = sorted.map(_.getAs[Long]("frame_energy"))
      assert(en.zip(en.tail).forall { case (a, b) => a >= b })
    }
    // frame energies must re-derive from the fixture formula
    val f0 = rows.filter(r => r.getAs[Long]("doc_id") == 1L)
      .map(r => r.getAs[Long]("frame") -> r.getAs[Long]("frame_energy")).toMap
    f0.foreach { case (f, e) =>
      val exp = (f * 160 until math.min((f + 1) * 160, 880L)).map { k =>
        val s = java.lang.Math.floorMod(1L * 31 + 17L * k, 2003L) - 1001L
        s * s
      }.sum
      assert(e === exp, s"frame $f")
    }
  }

  test("embeddingPcaPower: rank-1 covariance recovers the axis, sign-fixed") {
    import spark.implicits._
    // vectors k·0.25·u for u = (−1, 2, 0, …): dyadic scales quantize to
    // exact micro integers, so C = α·uuᵀ exactly and the fixpoint is the
    // axis normalized to max-abs 1e6; the first nonzero component starts
    // negative, so the sign fix must flip the whole vector
    val u = Array(-1f, 2f, 0f, 0f, 0f, 0f, 0f, 0f)
    val emb = (1 to 4).map { k =>
      (k.toLong, u.map(_ * 0.25f * k), 0)
    }.toDF("vec_id", "embedding", "label")
    val r = graft.operators.Similarity.embeddingPcaPower(emb).collect()
      .map(x => x.getAs[Long]("dim") -> x.getAs[Long]("v_micro")).toMap
    assert(r(0L) === 500000L && r(1L) === -1000000L)
    assert((2L to 7L).forall(r(_) == 0L))
  }

  test("embeddingPcaPower: constant corpus yields the zero vector; empty yields no rows") {
    import spark.implicits._
    val const = (1 to 3).map(k => (k.toLong, Array.fill(8)(0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val rc = graft.operators.Similarity.embeddingPcaPower(const).collect()
    assert(rc.length === 8 && rc.forall(_.getAs[Long]("v_micro") === 0L))
    val empty = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(graft.operators.Similarity.embeddingPcaPower(empty).collect().isEmpty)
  }

  test("markovStationary: a dangling state still receives teleport mass") {
    import spark.implicits._
    // single transition a -> b; b has no outgoing row (dangling)
    val events = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"),
      (2L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = EventQueries.markovStationary(events).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("stationary_p")).toMap
    assert(r("a") > 0.0 && r("b") > 0.0)
    assert(r("b") > r("a"), "everything a has flows to b; only teleport returns")
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }
}
