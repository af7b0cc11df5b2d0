package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Live demonstration that AQE does what the operator scaladocs delegate to
  * it (Skew.scala:9, Bucketing.scala:12): a whale key in a sort-merge join
  * is split at RUNTIME into multiple tasks, no salting needed. The repo's
  * own salting operators cover the cases AQE can't (shuffled joins where
  * one side must replicate); this spec pins that the baseline AQE path the
  * docs lean on actually engages on this Spark version, so the division of
  * labor claimed in PLANS.md is evidence, not folklore. */
class AqeSpec extends AnyFunSuite {
  import TestSpark._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a whale key's sort-merge join partition at runtime (skew=true)") {
    import spark.implicits._
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // the suite session runs 2 shuffle partitions; with 2, the median
      // partition size IS the whale and nothing looks skewed — skew
      // detection needs a real median, so spread the tail over 16
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // whale: key 0 carries 20k wide rows; tail keys carry 10 each. The
      // right side is key-complete so the join is a genuine SMJ (broadcast
      // disabled above). Payloads are per-row hashes — shuffle blocks are
      // lz4-compressed, and a constant pad would compress the whale below
      // the skew threshold.
      val hashPad = concat(
        md5(concat_ws("-", col("k"), col("i"))),
        md5(concat_ws("+", col("i"), col("k"))),
        md5(col("i").cast("string")))
      val left = ((0 until 20000).map(_ => 0L) ++
        (1L to 50L).flatMap(k => Seq.fill(10)(k)))
        .toDF("k").withColumn("i", monotonically_increasing_id())
        .withColumn("payload", hashPad).drop("i")
      val right = (0L to 50L).flatMap(k => Seq.fill(5)(k)).toDF("k")
        .withColumn("i", monotonically_increasing_id())
        .withColumn("r_payload", hashPad).drop("i")
      val joined = left.join(right, "k")
      // collect() executes THIS DataFrame's own queryExecution (count()
      // would plan a separate aggregate and leave this plan unfinalized)
      assert(joined.collect().length === 20000 * 5 + 50 * 10 * 5)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split sort-merge join in the final adaptive plan:\n$plan")
    }
  }

  test("AQE coalesces an over-partitioned shuffle to the advisory size") {
    import spark.implicits._
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "64",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m") {
      val agg = (0L until 1000L).toDF("v")
        .groupBy(col("v") % 7).agg(sum("v"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
        s"expected a coalesced AQE shuffle read:\n$plan")
    }
  }
}
