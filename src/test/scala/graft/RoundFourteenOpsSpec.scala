package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

/** Round-14 additions: the last three classic TPC-H shapes — local-supplier
  * volume (Q5), the late-line priority census (Q12, linestatus adaptation),
  * and waiting suppliers (Q21, exists/not-exists as one keyed rollup). */
class RoundFourteenOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String) = java.time.LocalDateTime.parse(s + "T00:00")

  test("localSupplierVolume: only same-nation customer/supplier pairs count") {
    import spark.implicits._
    val lineitem = Seq(
      (1L, 7L, 100.0, 0.0),  // counted: cust nation 1 == supp nation 1
      (2L, 8L, 900.0, 0.0),  // dropped: cust nation 1, supp nation 2
      (3L, 7L, 500.0, 0.0)   // dropped: order outside window
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val orders = Seq(
      (1L, 10L, ts("1996-06-01")), (2L, 10L, ts("1996-06-01")),
      (3L, 10L, ts("1999-01-01"))  // boundary: until is exclusive
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    val customer = Seq((10L, 1)).toDF("c_custkey", "c_nationkey")
    val supplier = Seq((7L, 1), (8L, 2)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((1, "N1", 0), (2, "N2", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((0, "EUROPE"), (1, "ASIA")).toDF("r_regionkey", "r_name")
    val r = RelationalQueries.localSupplierVolume(
      lineitem, orders, customer, supplier, nation, region).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("nation") === "N1")
    assert(r.head.getAs[Long]("volume_units") === 1000000L)
    assert(r.head.getAs[Double]("revenue") === 100.0)
  }

  test("lateLinePriorityCensus: lateness residual and the high/low split") {
    import spark.implicits._
    val lineitem = Seq(
      (1L, "F", ts("1996-06-01")),  // late (order 1996-01-01 + 60d), high
      (2L, "F", ts("1996-06-01")),  // late, low priority
      (3L, "O", ts("1996-02-15")),  // NOT late (46 days)
      (4L, "O", ts("1995-12-01"))   // outside the ship-date window
    ).toDF("l_orderkey", "l_linestatus", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp_ntz"))
    val orders = Seq(
      (1L, "1-URGENT", ts("1996-01-01")), (2L, "5-LOW", ts("1996-01-01")),
      (3L, "2-HIGH", ts("1996-01-01")), (4L, "2-HIGH", ts("1995-08-01"))
    ).toDF("o_orderkey", "o_orderpriority", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    val r = RelationalQueries.lateLinePriorityCensus(lineitem, orders).collect()
      .map(x => (x.getAs[String]("l_linestatus"),
        x.getAs[Long]("high_line_count"), x.getAs[Long]("low_line_count")))
    assert(r.toSeq === Seq(("F", 1L, 1L)))
  }

  test("waitingSuppliers: sole late supplier on a multi-supplier F order") {
    import spark.implicits._
    val lineitem = Seq(
      // order 1: supp 7 late, supp 8 on time -> 7 waits
      (1L, 7L, ts("1996-06-01")), (1L, 8L, ts("1996-01-15")),
      // order 2: both late -> nobody counted (not-exists branch)
      (2L, 7L, ts("1996-06-01")), (2L, 8L, ts("1996-06-01")),
      // order 3: single-supplier order -> excluded (exists branch)
      (3L, 7L, ts("1996-06-01")),
      // order 4: late but order not finished -> excluded
      (4L, 7L, ts("1996-06-01")), (4L, 8L, ts("1996-01-15"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp_ntz"))
    val orders = Seq(
      (1L, "F", ts("1996-01-01")), (2L, "F", ts("1996-01-01")),
      (3L, "F", ts("1996-01-01")), (4L, "O", ts("1996-01-01"))
    ).toDF("o_orderkey", "o_orderstatus", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    val supplier = Seq((7L, "s7"), (8L, "s8")).toDF("s_suppkey", "s_name")
    val r = RelationalQueries.waitingSuppliers(lineitem, orders, supplier).collect()
      .map(x => (x.getAs[String]("s_name"), x.getAs[Long]("numwait")))
    assert(r.toSeq === Seq(("s7", 1L)))
  }

  test("dsirWeights: target-heavy tokens score above raw-only tokens") {
    import graft.functions.TextOps
    import spark.implicits._
    // target (en) speaks 'alpha beta', raw-only (zz) speaks 'gamma delta';
    // a mixed doc sits between the pure ones
    val docs = Seq(
      (1L, "alpha beta alpha beta", "en"),
      (2L, "alpha beta alpha beta", "en"),
      (3L, "gamma delta gamma delta", "zz"),
      (4L, "gamma delta gamma delta", "zz"),
      (5L, "alpha beta gamma delta", "zz")
    ).toDF("doc_id", "text", "lang")
    val r = TextOps.dsirWeights(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("logratio_micro")).toMap
    assert(r.size === 5)
    assert(r(1L) === r(2L), "identical docs must score identically")
    assert(r(1L) > r(5L) && r(5L) > r(3L),
      s"target-like > mixed > raw-only, got $r")
    // doc 5 has 2 target-ish + 2 raw-only tokens: exactly the average of
    // the pure docs' sums (same bucket lambdas, integer arithmetic)
    assert(r(5L) === (r(1L) + r(3L)) / 2)
  }

  test("fertilityByLang: merged language compresses; unmergeable language stays at 1.0") {
    import graft.operators.BpeLearn
    import spark.implicits._
    // lang aa: 'x y' repeated -> the (x,y) merge wins, halving symbols;
    // lang bb: all-distinct tokens -> nothing merges, fertility 1.0
    val docs = Seq(
      (1L, "x y x y x y x y", "aa", 15L),
      (2L, "x y x y x y x y", "aa", 15L),
      (3L, "q0 q1 q2 q3", "bb", 11L),
      (4L, "r0 r1 r2 r3", "bb", 11L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val r = BpeLearn.fertilityByLang(docs).collect()
      .map(x => x.getAs[String]("lang") ->
        ((x.getAs[Long]("n_words"), x.getAs[Long]("n_symbols"),
          x.getAs[Double]("fertility")))).toMap
    assert(r("aa")._1 === 16L)
    assert(r("aa")._2 < 16L, s"the xy merge must compress lang aa: $r")
    assert(r("aa")._3 < 1.0)
    assert(r("bb") === ((8L, 8L, 1.0)), s"distinct tokens cannot merge: $r")
  }

  test("kCore: chain peels off round by round; the triangle core survives") {
    import graft.operators.Graph
    import spark.implicits._
    // triangle 1-2-3 with a tail 3-4-5: round 1 drops 5, round 2 drops 4
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val r = Graph.kCore(pairs, k = 2, rounds = 4).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("core_deg")))
    assert(r.toSeq === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore bounded-round honesty: a survivor whose neighbors all peeled reports degree 0") {
    import graft.operators.Graph
    import spark.implicits._
    // path 1-2-3 with k=2: round 1 peels the endpoints, leaving node 2
    // alive with no surviving neighbor — one more round WOULD drop it
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val r = Graph.kCore(pairs, k = 2, rounds = 1).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("core_deg")))
    assert(r.toSeq === Seq((2L, 0L)))
    assert(Graph.kCore(pairs, k = 2, rounds = 2).collect().isEmpty)
  }

  test("cupedLift: with y = x the covariate explains everything — both variants collapse to the global mean") {
    import graft.queries.EventQueries
    import spark.implicits._
    // each user spends v in the pre period and v again in the post period:
    // theta = 1, rho2 = 1, and the adjusted post mean loses ALL between-user
    // variance — whatever md5 variant split falls out, both rows must show
    // the identical global mean
    val rows = (1L to 40L).flatMap { u =>
      Seq((u, "2024-01-10 00:00:00", "purchase", u * 3.0),
          (u, "2024-01-20 00:00:00", "purchase", u * 3.0))
    }
    val events = rows.toDF("user_id", "ts", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val r = EventQueries.cupedLift(events).collect()
    assert(r.length === 2)
    assert(r.map(_.getAs[String]("variant")).toSeq === Seq("A", "B"))
    assert(r.forall(_.getAs[Double]("theta") === 1.0))
    assert(r.forall(_.getAs[Double]("rho2") === 1.0))
    val adj = r.map(_.getAs[Double]("mean_y_adj")).distinct
    assert(adj.length === 1, s"adjusted means must coincide: ${adj.toSeq}")
    // global mean of y: sum(300·u)/40 = 300·20.5 = 6150 cents
    assert(adj.head === 6150.0)
    // the RAW means differ across variants (the noise CUPED removes)
    val raw = r.map(_.getAs[Double]("mean_y")).distinct
    assert(raw.length === 2)
  }

  test("outlierScreen: the one far vector carries the flag; the cluster does not") {
    import graft.operators.Similarity
    import spark.implicits._
    // 19 vectors hugging the origin, one far away on axis 0
    val rows = (1L to 19L).map { i =>
      (i, Array.tabulate(64)(d => if (d == 0) 0.001f * i else 0f).toSeq)
    } :+ (20L, Array.tabulate(64)(d => if (d == 0) 0.9f else 0f).toSeq)
    val emb = rows.toDF("vec_id", "embedding")
    val r = Similarity.outlierScreen(emb, nCentroids = 1, iters = 1, tailBp = 500)
      .collect()
    assert(r.length === 20)
    val flagged = r.filter(_.getAs[Boolean]("is_outlier")).map(_.getAs[Long]("vec_id"))
    assert(flagged.toSeq === Seq(20L), s"only the far vector is the tail: ${flagged.toSeq}")
    val d = r.map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("dist2_micro2")).toMap
    assert(d(20L) > d.filterKeys(_ != 20L).values.max * 100,
      "the far vector's exact integer distance dominates")
  }

  test("ordersUnpivot: three metric rows per priority, values preserved") {
    import spark.implicits._
    val orders = Seq(
      (1L, 10L, "1-URGENT", 10.0), (2L, 10L, "1-URGENT", 20.0),
      (3L, 11L, "5-LOW", 5.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    val r = RelationalQueries.ordersUnpivot(orders).collect()
      .map(x => (x.getAs[String]("o_orderpriority"), x.getAs[String]("metric"),
        x.getAs[Long]("value")))
    assert(r.toSeq === Seq(
      ("1-URGENT", "cents_sum", 3000L), ("1-URGENT", "n_custs", 1L),
      ("1-URGENT", "n_orders", 2L),
      ("5-LOW", "cents_sum", 500L), ("5-LOW", "n_custs", 1L),
      ("5-LOW", "n_orders", 1L)))
  }

  test("orderPercentiles: tie-free order makes the rationals exact") {
    import spark.implicits._
    // keys chosen so % 97 == 0 keeps them all
    val orders = (1L to 4L).map(i => (i * 97L, "X", i * 10.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val r = RelationalQueries.orderPercentiles(orders).collect()
      .map(x => (x.getAs[Long]("o_orderkey"), x.getAs[Double]("pct_rank"),
        x.getAs[Double]("cume")))
    assert(r.toSeq === Seq(
      (97L, 0.0, 0.25), (194L, round6(1.0 / 3), 0.5),
      (291L, round6(2.0 / 3), 0.75), (388L, 1.0, 1.0)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("didLift: a uniform pre-period shift cancels; the true post effect survives") {
    import graft.queries.EventQueries
    import spark.implicits._
    // every user spends u*2 pre and u*2 + 100 post: whatever the md5 split,
    // each cohort's post-pre difference is exactly 100 cents -> DiD = 0.
    val base = (1L to 40L).flatMap { u =>
      Seq((u, "2024-01-10 00:00:00", "purchase", u * 2.0 / 100.0),
          (u, "2024-01-20 00:00:00", "purchase", (u * 2.0 + 100.0) / 100.0))
    }
    val events = base.toDF("user_id", "ts", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val r = EventQueries.didLift(events).collect().head
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === 40L)
    assert(r.getAs[Double]("did_cents") === 0.0,
      "equal within-user shifts must cancel in the double difference")
    // the rounded means are re-subtracted HERE in the test, so allow the
    // half-ulp the 4-dp rounding reintroduces (did_cents itself is exact)
    assert(math.abs(r.getAs[Double]("mean_post_a") - r.getAs[Double]("mean_pre_a") - 100.0) < 1e-9)
  }

  test("lshScurve: exact-duplicate shingle sets land in decile 9, fully detected") {
    import graft.operators.Dedup
    import spark.implicits._
    val text = "a b c d e f g h i j k l"
    val docs = Seq((1L, text), (2L, text), (3L, "z y x w v u t s r q p o"))
      .toDF("doc_id", "text")
    val r = Dedup.lshScurve(docs).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("decile") === 9L)
    assert(row.getAs[Long]("n_pairs") === 1L && row.getAs[Long]("n_detected") === 1L)
    assert(row.getAs[Long]("detect_bp") === 10000L)
    // the analytic curve at the decile midpoint s = 0.95, b = 4, r = 3
    val s = 0.95; val q = 1.0 - s * s * s
    assert(row.getAs[Long]("analytic_bp") === math.floor((1.0 - q * q * q * q) * 10000).toLong)
  }

  test("curateV5: the DSIR floor drops off-target docs; the embedding outlier drops too") {
    import graft.operators.Curation
    import spark.implicits._
    // 20 on-target en docs + 4 off-target zz docs with per-doc vocabularies
    val docs = ((1L to 20L).map(i => (i, s"alpha beta gamma u$i", "en", "s")) ++
      (21L to 24L).map(i => (i, s"q$i r$i t$i w$i", "zz", "s")))
      .toDF("doc_id", "text", "lang", "source")
    // embeddings aligned on id: ids 1-8 seed spread centroids; ids 9-24
    // pile onto centroid 8's position so the quantizer cannot give the
    // off-axis outlier (doc 18, dim-1 displacement) a private cell — it
    // shares cell 8 with 16 near points and sits far from their mean
    val emb = (1L to 24L).map { i =>
      (i, Array.tabulate(64) { d =>
        val dim0 = if (i <= 8L) 0.1f * i else 0.8f
        if (d == 0) dim0 else if (d == 1 && i == 18L) 0.9f else 0f
      }.toSeq)
    }.toDF("vec_id", "embedding")
    val kept = Curation.curateV5(docs, emb).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!(21L to 24L).exists(kept), s"off-target zz docs must fall below the floor: $kept")
    assert(!kept.contains(18L), s"the embedding outlier must be dropped: $kept")
    assert(kept.size >= 15 && kept.subsetOf((1L to 20L).toSet), s"kept: $kept")
  }

  test("hllSlidingDistinct: the trailing merge equals the single-pass sketch over the union") {
    import graft.operators.Sketches
    import spark.implicits._
    val ldt = (h: Int) => java.time.LocalDateTime.of(2024, 1, 1, h, 30)
    // 60 users spread over 3 hours, all inside one 24h window
    val events = (1L to 60L).map(u => (ldt((u % 3).toInt), u))
      .toDF("ts", "user_id")
    val sliding = Sketches.hllSlidingDistinct(events).collect()
    assert(sliding.length === 3, "one readout row per live hour")
    val last = sliding.maxBy(_.getAs[Long]("window_h"))
    assert(last.getAs[Long]("exact_distinct") === 60L)
    // merge associativity: the last hour's trailing estimate IS the
    // single-pass estimate over all 60 users
    val single = Sketches.hllDistinct(events, "user_id").collect().head
    assert(last.getAs[Double]("est_distinct") === single.getAs[Double]("est_distinct"))
    // the first hour's window sees only its own users (20 of them)
    val first = sliding.minBy(_.getAs[Long]("window_h"))
    assert(first.getAs[Long]("exact_distinct") === 20L)
  }
}
