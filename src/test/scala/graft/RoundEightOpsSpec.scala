package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Validators

/** Round-8 additions: weighted reservoir sampling (see SamplingSpec),
  * Benford profiling, KMV set operations, autocorrelation, bigram LM,
  * Pareto frontier. */
class RoundEightOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("benfordProfile reads leading cents digits and renders shared constants") {
    import spark.implicits._
    val txns = Seq(
      ("earned", 123.45), // cents 12345 -> digit 1
      ("earned", 0.05), // cents 5 -> digit 5
      ("earned", 19.99), // cents 1999 -> digit 1
      ("spent", -20.00), // cents 2000 -> digit 2
      ("spent", 0.0) // cents 0 -> dropped
    ).toDF("transaction_type", "amount")
    val r = Validators.benfordProfile(txns).collect()
    val byKey = r.map(x => (x.getString(0), x.getInt(1)) -> x).toMap
    assert(byKey(("earned", 1)).getAs[Long]("n") === 2L)
    assert(byKey(("earned", 5)).getAs[Long]("n") === 1L)
    assert(byKey(("earned", 1)).getAs[Long]("share_bp") === 6666L)
    // the Benford expectation is the shared constant table: log10(2) = 30.10%
    assert(byKey(("earned", 1)).getAs[Long]("benford_bp") === 3010L)
    assert(byKey(("spent", 2)).getAs[Long]("share_bp") === 10000L)
    assert(byKey(("spent", 2)).getAs[Long]("dev_bp") === 10000L - 1761L)
    // zero amounts never contribute a digit row
    assert(r.map(_.getAs[Long]("n")).sum === 4L)
    // per-type shares sum to <= 10000 (integer div truncation)
    val earnedShare = r.filter(_.getString(0) == "earned").map(_.getAs[Long]("share_bp")).sum
    assert(earnedShare <= 10000L && earnedShare >= 9998L)
  }
}
