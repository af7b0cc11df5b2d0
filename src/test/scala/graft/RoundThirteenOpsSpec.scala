package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

/** Round-13 additions: the four remaining classic TPC-H shapes —
  * returned-item top customers (Q10), top-revenue supplier via scalar-max
  * equality (Q15), correlated per-part quantity threshold (Q17), and the
  * three-branch disjunctive predicate (Q19). */
class RoundThirteenOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String) = java.time.LocalDateTime.parse(s + "T00:00")

  test("returnedItemCustomers: only R-flag lines inside the quarter count") {
    import spark.implicits._
    val lineitem = Seq(
      (1L, "R", 100.0, 0.0),   // counted: order in quarter, flag R
      (1L, "N", 900.0, 0.0),   // wrong flag
      (2L, "R", 50.0, 0.5),    // counted: 50 cents-units * 50 pct
      (3L, "R", 999.0, 0.0)    // order outside quarter
    ).toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val orders = Seq(
      (1L, 10L, ts("1997-02-01")), (2L, 11L, ts("1997-03-31")),
      (3L, 10L, ts("1997-04-01"))  // boundary: until is exclusive
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    val customer = Seq((10L, "alice", 1L), (11L, "bob", 1L))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val nation = Seq((1L, "N1")).toDF("n_nationkey", "n_name")
    val r = RelationalQueries
      .returnedItemCustomers(lineitem, orders, customer, nation)
      .collect().map(x => (x.getAs[Long]("c_custkey"), x.getAs[Double]("revenue")))
    assert(r.toSeq === Seq((10L, 100.0), (11L, 25.0)))
  }

  test("topSupplier: max decided on exact units; ties all surface by suppkey") {
    import spark.implicits._
    val lineitem = Seq(
      (1L, 100.0, 0.0, ts("1997-02-01")),  // s1: 100
      (2L, 50.0, 0.0, ts("1997-02-01")),   // s2: 50 + 50 = 100 (tie)
      (2L, 50.0, 0.0, ts("1997-03-01")),
      (3L, 99.0, 0.0, ts("1997-02-01")),   // s3: 99
      (1L, 999.0, 0.0, ts("1997-04-01"))   // outside window
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp_ntz"))
    val supplier = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val r = RelationalQueries.topSupplier(lineitem, supplier)
      .collect().map(x => (x.getAs[Long]("s_suppkey"), x.getAs[Double]("total_revenue")))
    assert(r.toSeq === Seq((1L, 100.0), (2L, 100.0)))
  }

  test("smallQuantityRevenue: strict integer threshold qty*5*n < sum") {
    import spark.implicits._
    // part 1 (brand): lines qty 1 and 39 -> sum 40, n 2; qualifies iff
    // qty*10 < 40, so qty 1 counts and qty 4 would not (strict boundary:
    // a (4, 36) pair gives qty 4 -> 40 < 40 false)
    val lineitem = Seq(
      (1L, 1.0, 700.0), (1L, 39.0, 9999.0),
      (2L, 1.0, 5555.0) // off-brand part: never in the census
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "Brand#23"), (2L, "Brand#9"))
      .toDF("p_partkey", "p_brand")
    val r = RelationalQueries.smallQuantityRevenue(lineitem, part).collect().head
    assert(r.getAs[Long]("qualifying_lines") === 1L)
    assert(r.getAs[Double]("avg_yearly") === 100.0) // $700 / 7
  }

  test("disjunctiveRevenue: each branch pinned separately; non-branch brand line excluded") {
    import spark.implicits._
    val lineitem = Seq(
      (1L, 5.0, 100.0, 0.0),    // b1: Brand#12 size 3, qty 5
      (2L, 15.0, 200.0, 0.0),   // b2: Brand#23 size 8, qty 15
      (3L, 25.0, 400.0, 0.0),   // b3: Brand#34 size 12, qty 25
      (1L, 50.0, 999.0, 0.0)    // Brand#12 but qty outside every branch
    ).toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Seq((1L, "Brand#12", 3), (2L, "Brand#23", 8), (3L, "Brand#34", 12))
      .toDF("p_partkey", "p_brand", "p_size")
    val r = RelationalQueries.disjunctiveRevenue(lineitem, part).collect().head
    assert(r.getAs[Long]("branch1_lines") === 1L)
    assert(r.getAs[Long]("branch2_lines") === 1L)
    assert(r.getAs[Long]("branch3_lines") === 1L)
    assert(r.getAs[Double]("revenue") === 700.0)
  }

  test("marketShare: nation share is the exact basis-point floor per year") {
    import spark.implicits._
    val lineitem = Seq(
      (1L, 1L, 1L, 300.0, 0.0),  // supplier 1 (NATION_3): 300
      (1L, 2L, 1L, 100.0, 0.0),  // supplier 2 (NATION_4): 100
      (1L, 1L, 2L, 999.0, 0.0)   // non-PROMO part: excluded
    ).toDF("l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount")
    val orders = Seq((1L, 10L, ts("1996-06-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    val customer = Seq((10L, 3L)).toDF("c_custkey", "c_nationkey")
    val supplier = Seq((1L, 3L), (2L, 4L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((3L, "NATION_3", 3L), (4L, "NATION_4", 3L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((3L, "EUROPE")).toDF("r_regionkey", "r_name")
    val part = Seq((1L, "PROMO"), (2L, "LARGE")).toDF("p_partkey", "p_type")
    val r = RelationalQueries.marketShare(lineitem, orders, customer, supplier,
      nation, region, part).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("yr") === 1996L)
    assert(r.head.getAs[Double]("nation_revenue") === 300.0)
    assert(r.head.getAs[Double]("total_revenue") === 400.0)
    assert(r.head.getAs[Long]("share_bp") === 7500L)
  }

  test("nationProfit: exact integer units, negative profit preserved") {
    import spark.implicits._
    val lineitem = Seq(
      (1L, 1L, 1L, 2.0, 100.0, 0.0),  // rev 100, cost 2*50=100 -> 0
      (2L, 1L, 1L, 10.0, 100.0, 0.0)  // rev 100, cost 10*50=500 -> -400
    ).toDF("l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
      "l_extendedprice", "l_discount")
    val orders = Seq((1L, ts("1996-06-01")), (2L, ts("1997-06-01")))
      .toDF("o_orderkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    val supplier = Seq((1L, 3L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((3L, "N3")).toDF("n_nationkey", "n_name")
    val part = Seq((1L, "large widget", 50.0))
      .toDF("p_partkey", "p_name", "p_retailprice")
    val r = RelationalQueries.nationProfit(lineitem, orders, supplier, nation, part)
      .collect().map(x => (x.getAs[Long]("yr"), x.getAs[Long]("profit_units")))
    // yr DESC within nation; units at 1e-4 scale: 0 and -400 dollars
    assert(r.toSeq === Seq((1997L, -4000000L), (1996L, 0L)))
  }

  test("supplierValueConcentration: strict 1.05x-mean cross-multiplied threshold") {
    import spark.implicits._
    val lineitem = Seq((1L, 500.0), (2L, 50.0), (3L, 50.0))
      .toDF("l_suppkey", "l_extendedprice")
    val supplier = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("s_suppkey", "s_name")
    val r = RelationalQueries.supplierValueConcentration(lineitem, supplier)
      .collect().map(x => (x.getAs[Long]("s_suppkey"), x.getAs[Long]("share_bp")))
    // total 60000 cents, n 3: keep iff v*60 > 60000*21, i.e. v > 21000;
    // only supplier 1 (50000 cents) clears it; share 8333 bp
    assert(r.toSeq === Seq((1L, 8333L)))
  }

  test("supplierVariety: below-mean-balance suppliers excluded from the census") {
    import spark.implicits._
    val lineitem = Seq((1L, 1L), (1L, 2L), (1L, 3L))
      .toDF("l_partkey", "l_suppkey")
    val part = Seq((1L, "Brand#1", "PROMO", 9)).toDF("p_partkey", "p_brand", "p_type", "p_size")
    // mean 400: suppliers 1 (100) and 2 (300) fall below, only 3 (800) counts
    val supplier = Seq((1L, 100.0), (2L, 300.0), (3L, 800.0))
      .toDF("s_suppkey", "s_acctbal")
    val r = RelationalQueries.supplierVariety(lineitem, part, supplier).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("supplier_cnt") === 1L)
  }

  test("surgeSuppliers: strict majority of lifetime quantity in the year") {
    import spark.implicits._
    val lineitem = Seq(
      (1L, 1L, 6.0, ts("1997-05-01")), (1L, 1L, 4.0, ts("1996-05-01")), // 60% in 1997
      (2L, 2L, 5.0, ts("1997-05-01")), (2L, 2L, 5.0, ts("1996-05-01"))  // exactly half: out
    ).toDF("l_suppkey", "l_partkey", "l_quantity", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp_ntz"))
    val supplier = Seq((1L, "s1"), (2L, "s2")).toDF("s_suppkey", "s_name")
    val r = RelationalQueries.surgeSuppliers(lineitem, supplier)
      .collect().map(_.getAs[Long]("s_suppkey"))
    assert(r.toSeq === Seq(1L))
  }

  test("minPriceSupplier: min decided on exact cents, tie broken by suppkey") {
    import spark.implicits._
    val lineitem = Seq(
      (1L, 7L, 19.99), (1L, 3L, 19.99), (1L, 9L, 25.0), // tie at 1999 cents -> suppkey 3
      (2L, 5L, 10.0)                                     // wrong size part: absent
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val part = Seq((1L, "cold bolt", 15), (2L, "hot bolt", 14))
      .toDF("p_partkey", "p_name", "p_size")
    val supplier = Seq((3L, "s3", 1L), (5L, "s5", 1L), (7L, "s7", 1L), (9L, "s9", 1L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((1L, "N1")).toDF("n_nationkey", "n_name")
    val r = RelationalQueries.minPriceSupplier(lineitem, part, supplier, nation).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("s_name") === "s3")
    assert(r.head.getAs[Long]("min_cents") === 1999L)
  }

  test("revenueScalar: discount band inclusive, quantity cap exclusive") {
    import spark.implicits._
    val lineitem = Seq(
      (100.0, 0.05, 1.0, ts("1997-06-01")),  // in: pct 5
      (100.0, 0.07, 23.0, ts("1997-06-01")), // in: pct 7, qty 23
      (100.0, 0.04, 1.0, ts("1997-06-01")),  // out: pct 4
      (100.0, 0.06, 24.0, ts("1997-06-01")), // out: qty 24
      (100.0, 0.06, 1.0, ts("1998-01-01"))   // out: date
    ).toDF("l_extendedprice", "l_discount", "l_quantity", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp_ntz"))
    val r = RelationalQueries.revenueScalar(lineitem).collect().head
    // units: 10000*5 + 10000*7 = 120000 -> $12.00
    assert(r.getAs[Long]("revenue_units") === 120000L)
    assert(r.getAs[Double]("revenue") === 12.0)
    assert(r.getAs[Long]("qualifying_lines") === 2L)
  }

  test("spendQuartiles: interpolated boundaries, ties into the lower bucket") {
    import spark.implicits._
    val orders = Seq(10.0, 20.0, 30.0, 40.0).toDF("o_totalprice")
    val r = RelationalQueries.spendQuartiles(orders).collect()
      .map(x => (x.getAs[Long]("quartile"), x.getAs[Long]("n_orders"),
        x.getAs[Long]("min_cents")))
    // boundaries at 1750/2500/3250 cents: one order per quartile
    assert(r.toSeq === Seq((1L, 1L, 1000L), (2L, 1L, 2000L),
      (3L, 1L, 3000L), (4L, 1L, 4000L)))
  }

  test("customerSpendQuartiles: NTILE ceil-then-floor sizing within a customer") {
    import spark.implicits._
    val orders = Seq(
      (1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0), (1L, 4L, 40.0), (1L, 5L, 50.0)
    ).toDF("o_custkey", "o_orderkey", "o_totalprice")
    val r = RelationalQueries.customerSpendQuartiles(orders).collect()
      .map(x => (x.getAs[Long]("quartile"), x.getAs[Long]("n_orders")))
    // 5 rows into 4 tiles: sizes 2,1,1,1 (first bucket takes the remainder)
    assert(r.toSeq === Seq((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("knHeldoutLogProb: shared text scores oov-free; unique text is all-OOV") {
    import graft.functions.TextOps
    import spark.implicits._
    // 16 docs of identical text: whatever side of the md5 split each doc
    // lands on, every held-out bigram was seen in training
    val shared = (1L to 16L).map(i => (i, "a b a b c")).toDF("doc_id", "text")
    val rs = TextOps.knHeldoutLogProb(shared).collect()
    assert(rs.nonEmpty, "the md5 split must leave some docs held out")
    assert(rs.forall(_.getAs[Long]("oov_bigrams") === 0L))
    val avgs = rs.map(_.getAs[Double]("avg_heldout_logprob")).distinct
    assert(avgs.length === 1, s"identical docs must score identically: ${avgs.toSeq}")
    // per-doc-unique vocabularies: every held-out bigram is unseen
    val unique = (1L to 16L).map(i => (i, s"u${i}x u${i}y u${i}z")).toDF("doc_id", "text")
    val ru = TextOps.knHeldoutLogProb(unique).collect()
    assert(ru.nonEmpty)
    assert(ru.forall(x => x.getAs[Long]("oov_bigrams") === x.getAs[Long]("n_bigrams")))
  }
}
