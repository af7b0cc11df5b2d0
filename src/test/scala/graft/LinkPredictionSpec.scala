package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Resource-Allocation link prediction: scoring, existing-edge exclusion,
  * hub-cap semantics. */
class LinkPredictionSpec extends AnyFunSuite {
  import TestSpark._

  private def pairsDf(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("pa", "pb")
  }

  test("linkPrediction: scores unlinked pairs by sum of 1/deg(z) micro-units; existing edges excluded") {
    // path graph 1-2-3 plus 1-4-3: nodes 1,3 share middles 2 (deg 2) and 4 (deg 2)
    val pairs = pairsDf((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L))
    val r = Graph.linkPrediction(pairs).collect()
      .map(x => (x.getAs[Long]("pa"), x.getAs[Long]("pb")) ->
        (x.getAs[Long]("ra_micro"), x.getAs[Long]("n_common"))).toMap
    // (1,3): common neighbors 2 and 4, both deg 2 → 500000 + 500000
    assert(r((1L, 3L)) === (1000000L, 2L))
    // (2,4): common neighbors 1 and 3, both deg 2 → same score
    assert(r((2L, 4L)) === (1000000L, 2L))
    // existing edges never predicted
    assert(!r.contains((1L, 2L)) && !r.contains((3L, 4L)))
  }

  test("linkPrediction: hub-capped middles generate no paths") {
    // star: hub 0 connects 1..5 (deg 5); plus a 1-2 edge through which 1,2
    // would see each other (but they're linked) — only hub-mediated pairs
    // like (1,3) exist, and a cap below 5 kills them all
    val pairs = pairsDf((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L), (1L, 2L))
    val uncapped = Graph.linkPrediction(pairs, hubCap = 256).collect()
    assert(uncapped.nonEmpty)
    val capped = Graph.linkPrediction(pairs, hubCap = 4).collect()
    // with the hub gone, the only remaining middles are 1 and 2 (deg 2 each),
    // bridging (0,2)? no — 0-1-2 and 0-2-1 are existing-edge pairs; nothing survives
    assert(capped.isEmpty,
      s"capping the only high-degree middle must empty the prediction set, got ${capped.mkString(",")}")
  }
}
