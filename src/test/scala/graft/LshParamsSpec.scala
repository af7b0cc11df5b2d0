package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The (bands, rows) solver (round-11 verdict #5): derives banding
  * parameters from a target threshold instead of hand-picking them. */
class LshParamsSpec extends AnyFunSuite {
  import TestSpark._

  test("menu enumerates every factorization of the signature length") {
    assert(Dedup.lshCandidateParams(12) ===
      Seq((1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1)))
    assert(Dedup.lshCandidateParams(12).forall { case (b, r) => b * r == 12 })
  }

  test("at the corpus default (0.5) the solver derives the measured (4,3)") {
    assert(Dedup.solveLshParams(0.5) === ((4, 3)))
  }

  test("a lower target re-picks toward more, shorter bands") {
    // at 0.3 the (4,3) midpoint (P≈0.10) is far below ½; (6,2) sits at
    // P(0.3)≈0.43 with FP(0.15)≈0.13 and FN(0.65)≈0.04 — both acceptable
    assert(Dedup.solveLshParams(0.3) === ((6, 2)))
  }

  test("candidate facts: S-curve monotone in s, chosen row unique and eligible") {
    val rows = Dedup.lshParamRows(0.5)
    assert(rows.count(_.chosen == 1L) === 1)
    val chosen = rows.find(_.chosen == 1L).get
    assert(chosen.eligible === 1L)
    assert((chosen.bands, chosen.rows_per_band) === ((4L, 3L)))
    // every candidate's detection probability rises with similarity
    for ((b, r) <- Dedup.lshCandidateParams(12); s <- Seq(0.2, 0.4, 0.6, 0.8))
      assert(Dedup.lshDetectProb(s, b, r) < Dedup.lshDetectProb(s + 0.1, b, r))
    // the chosen midpoint error is the minimum among eligible candidates
    val eligible = rows.filter(_.eligible == 1L)
    assert(chosen.midpoint_err_micro === eligible.map(_.midpoint_err_micro).min)
  }

  test("minhashLshAuto(0.5) is row-identical to the hand-picked (4,3) path") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "an entirely different document about spark plans"),
      (3L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val auto = Dedup.minhashLshAuto(docs).collect().toSeq
    val manual = Dedup.minhashLsh(docs, 3, 4, 3, 0.5).collect().toSeq
    assert(auto === manual)
    assert(auto.nonEmpty)
  }
}
