package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Validators}

/** Round-12 additions: binary-quantization ANN (sign words + Hamming
  * shortlist + exact rerank) and the lang×source mutual-information audit. */
class RoundTwelveOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("bqTopK: identical vectors collide at Hamming 0 and rerank to cosine 1") {
    // 64-dim vectors: a/b identical, c the negation — c lands at maximal
    // Hamming distance from a among the bits where the mean splits them
    val up = Seq.tabulate(64)(i => (if (i % 2 == 0) 1.0f else -1.0f))
    val down = up.map(-_)
    val e = emb((0L, up), (1L, up), (2L, down), (3L, up.map(_ * 0.5f)))
    val r = Similarity.bqTopK(e, nQueries = 1, k = 3).collect()
    assert(r.length === 3)
    val first = r.head
    assert(first.getAs[Long]("neighbor_id") === 1L)
    assert(first.getAs[Long]("hamming") === 0L)
    assert(first.getAs[Double]("cosine_sim") === 1.0)
    // the negated vector ranks last on cosine despite being present
    assert(r.last.getAs[Long]("neighbor_id") === 2L)
    assert(r.last.getAs[Double]("cosine_sim") === -1.0)
  }

  test("bqTopK: corrupt vectors (short / NaN) leave the index on both roles") {
    val up = Seq.tabulate(64)(i => (if (i % 3 == 0) 1.0f else -1.0f))
    val e = emb(
      (0L, up), (1L, up.map(_ * 0.9f)),
      (2L, up.take(10)),                          // short: filtered
      (3L, up.updated(5, Float.NaN)))             // NaN: filtered
    val r = Similarity.bqTopK(e, nQueries = 1, k = 5).collect()
    assert(r.map(_.getAs[Long]("neighbor_id")).toSet === Set(1L))
  }

  test("bqTopK: sign words pack low-dim bits into the low word") {
    // all-positive first half, all-negative second half, plus the mirror;
    // against a zero-ish third vector the per-dim mean sits between them
    val a = Seq.tabulate(64)(i => if (i < 32) 1.0f else -1.0f)
    val b = a.map(-_)
    val mid = Seq.fill(64)(0.0f)
    val e = emb((0L, a), (1L, b), (2L, mid))
    val r = Similarity.bqTopK(e, nQueries = 1, k = 2).collect()
    // b differs from a in every dimension's side of the mean: 64 bits flip;
    // mid sits ON the mean (xm·n == Σxm is not >), so its bits all read 0 —
    // 32 away from each of a and b
    val byId = r.map(x => x.getAs[Long]("neighbor_id") -> x.getAs[Long]("hamming")).toMap
    assert(byId(1L) === 64L)
    assert(byId(2L) === 32L)
  }

  test("mutualInfoProfile: independent axes give MI 0, confounded give MI = H") {
    import spark.implicits._
    // 2 langs × 2 sources, perfectly balanced -> independent
    val indep = (for { l <- Seq("en", "de"); s <- Seq("web", "book") }
      yield (l, s)).toDF("lang", "source")
    val ri = Validators.mutualInfoProfile(indep).collect().head
    assert(ri.getAs[Long]("n_docs") === 4L)
    assert(math.abs(ri.getAs[Long]("mi_micro")) <= 2L) // rounding only
    // lang determines source -> MI = H(lang) = H(source) = ln 2
    val conf = Seq(("en", "web"), ("de", "book")).toDF("lang", "source")
    val rc = Validators.mutualInfoProfile(conf).collect().head
    val ln2Micro = math.round(math.log(2) * 1e6)
    assert(math.abs(rc.getAs[Long]("mi_micro") - ln2Micro) <= 2L)
    assert(rc.getAs[Double]("nmi") === 1.0)
  }
}
