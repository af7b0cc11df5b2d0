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
}
