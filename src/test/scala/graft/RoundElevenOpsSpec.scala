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
