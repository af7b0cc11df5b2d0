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
}
