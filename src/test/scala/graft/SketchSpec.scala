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
}
