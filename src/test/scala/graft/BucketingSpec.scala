package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

/** The exchange-free co-located join: two tables bucketed on the join key
  * must sort-merge join with NO shuffle on either side. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("equi-join of co-bucketed tables plans without an Exchange") {
    val tmp = Files.createTempDirectory("graft-buckets").toString
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice"),
      "b_lineitem", s"$tmp/l", "l_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.orders(spark, dir)
        .select(org.apache.spark.sql.functions.col("o_orderkey").as("l_orderkey"),
          org.apache.spark.sql.functions.col("o_orderpriority")),
      "b_orders", s"$tmp/o", "l_orderkey", 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the join shape bucketing targets (big-big SMJ, not broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "b_lineitem")
        .join(Bucketing.table(spark, "b_orders"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"co-bucketed join must not shuffle:\n$plan")
      // and it computes the right thing
      val l = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
      assert(joined.count() === l.join(o, l("l_orderkey") === o("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
