package graft

import java.time.LocalDateTime

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{FifoMatcher, IncrementalMatcher, Tx}

/** The delta matcher folded over chronological batches must produce exactly
  * the matches of a full rebuild (the reference's incremental design
  * contract, README.md:184-219). */
class IncrementalMatcherSpec extends AnyFunSuite {
  import TestSpark._

  private def toDf(txns: Seq[Tx]) =
    spark.createDataset(txns)(Encoders.product[Tx]).toDF()

  private def foldDeltas(chunks: Seq[Seq[Tx]]): Set[(String, String)] = {
    var state = IncrementalMatcher.emptyState(spark)
    val all = scala.collection.mutable.Set.empty[(String, String)]
    chunks.filter(_.nonEmpty).foreach { chunk =>
      val (matches, newState) = IncrementalMatcher.matchDelta(state, toDf(chunk))
      all ++= matches.collect().map(r =>
        (r.getAs[String]("earned_id"), r.getAs[String]("redeem_id")))
      // materialize state across the run boundary (production would parquet
      // it; here a driver round-trip also truncates lineage so folds don't
      // accumulate plan depth)
      val rows = newState.collect()
      state = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), newState.schema)
    }
    all.toSet
  }

  private def fullRebuild(txns: Seq[Tx]): Set[(String, String)] =
    redeemMap(FifoMatcher.matchTransactions(toDf(txns)))
      .collect { case (id, Some(r)) => (id, r) }.toSet

  test("three chronological batches equal one full rebuild") {
    def t(day: Int) = LocalDateTime.of(2024, 1, day, 0, 0)
    val batches = Seq(
      Seq(Tx("E1", "C1", 10.0, t(1), "earned"), Tx("S1", "C1", -5.0, t(2), "spent")),
      Seq(Tx("E2", "C1", 20.0, t(3), "earned"), Tx("X1", "C1", -7.0, t(4), "expired"),
        Tx("E3", "C2", 9.0, t(4), "earned")),
      Seq(Tx("S2", "C1", -2.0, t(5), "spent"), Tx("S3", "C2", -3.0, t(6), "spent")))
    assert(foldDeltas(batches) === fullRebuild(batches.flatten))
  }

  test("property: chunked delta matching equals full rebuild (append-only)") {
    val genTxns: Gen[List[Tx]] = for {
      n <- Gen.choose(0, 30)
      txns <- Gen.listOfN(n, for {
        id <- Gen.choose(0, 999)
        cust <- Gen.oneOf("C1", "C2")
        tpe <- Gen.oneOf("earned", "spent", "expired")
      } yield (id, cust, tpe))
    } yield txns.distinctBy(_._1).zipWithIndex.map { case ((id, cust, tpe), i) =>
      // strictly increasing timestamps → any prefix split is append-only
      Tx(f"T$id%03d", cust, 1.0, LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(i.toLong), tpe)
    }
    val prop = Prop.forAll(genTxns, Gen.choose(1, 4)) { (txns, nChunks) =>
      val chunkSize = math.max(1, txns.size / nChunks)
      foldDeltas(txns.grouped(chunkSize).toSeq) == fullRebuild(txns)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
