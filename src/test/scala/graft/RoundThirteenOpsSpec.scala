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
}
