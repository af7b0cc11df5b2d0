package graft

import java.time.LocalDateTime

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{FifoMatcher, Tx}

/** Property-based differential testing: the two declarative formulations
  * must agree with the literal queue oracle on arbitrary inputs, and the
  * structural invariants from the reference's docstring
  * (src/fifo_matching.py:7-13) must hold.
  */
class FifoPropertySpec extends AnyFunSuite {
  import TestSpark._

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val genTxns: Gen[List[Tx]] = for {
    n <- Gen.choose(0, 40)
    txns <- Gen.listOfN(n, for {
      id <- Gen.choose(0, 999)
      cust <- Gen.oneOf("C1", "C2", "C3")
      amt <- Gen.choose(-100, 100).map(_.toDouble)
      // small day range forces CREATEDAT ties → exercises the tie-break
      day <- Gen.choose(1, 5)
      hour <- Gen.choose(0, 3)
      tpe <- Gen.oneOf("earned", "spent", "expired")
    } yield Tx(f"T$id%03d", cust, amt, LocalDateTime.of(2024, 1, day, hour, 0), tpe))
  } yield txns.distinctBy(_.transaction_id)

  private def run(impl: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      txns: List[Tx]): Map[String, Option[String]] =
    redeemMap(impl(spark.createDataset(txns)(Encoders.product[Tx]).toDF()))

  test("windowed and rank-join agree with the queue oracle") {
    check(Prop.forAll(genTxns) { txns =>
      val oracle = run(FifoMatcher.matchQueue _, txns)
      run(FifoMatcher.matchTransactions _, txns) == oracle &&
        run(FifoMatcher.matchRankJoin _, txns) == oracle
    })
  }

  test("structural invariants hold") {
    check(Prop.forAll(genTxns) { txns =>
      val m = run(FifoMatcher.matchTransactions _, txns)
      val byId = txns.map(t => t.transaction_id -> t).toMap
      val redeemers = m.values.flatten.toList
      val perCustomer = txns.groupBy(_.customer_id)

      // REDEEMID only on earned rows; every redeemer is a spent/expired id
      val onlyEarned = m.forall { case (id, r) =>
        r.isEmpty || byId(id).transaction_type == "earned" }
      val validRedeemers = redeemers.forall(r =>
        Set("spent", "expired")(byId(r).transaction_type))
      // each redeemer used at most once
      val singleUse = redeemers.distinct.size == redeemers.size
      // matched count per customer = min(#earned, #spent+expired)
      val counts = perCustomer.forall { case (_, rows) =>
        val e = rows.count(_.transaction_type == "earned")
        val se = rows.size - e
        rows.count(t => m(t.transaction_id).isDefined) == math.min(e, se)
      }
      // no cross-customer matches
      val sameCustomer = m.forall { case (id, r) =>
        r.forall(rid => byId(rid).customer_id == byId(id).customer_id) }

      onlyEarned && validRedeemers && singleUse && counts && sameCustomer
    })
  }
}
