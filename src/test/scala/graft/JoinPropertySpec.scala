package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{AsOfJoin, RangeJoin}

/** Property-based differential tests for the join operators against
  * brute-force references: the union-window as-of join must equal a
  * per-probe latest-row lookup; the binned overlap join must equal the
  * naive all-pairs overlap count. Small time ranges force ties, same-bin
  * crowding, and cross-bin spans. */
class JoinPropertySpec extends AnyFunSuite {
  import TestSpark._

  private def check(prop: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def t(day: Int, hour: Int) = LocalDateTime.of(2024, 1, day, hour, 0)

  test("as-of join equals per-probe latest-row lookup") {
    val genCase = for {
      nTl <- Gen.choose(0, 20)
      tl <- Gen.listOfN(nTl, for {
        key <- Gen.oneOf("K1", "K2")
        day <- Gen.choose(1, 4)
        hour <- Gen.choose(0, 3) // small range -> timestamp ties
        id <- Gen.choose(100, 999)
        v <- Gen.choose(0, 50).map(_.toDouble)
      } yield (key, t(day, hour), f"T$id", v))
      nPr <- Gen.choose(1, 8)
      pr <- Gen.listOfN(nPr, for {
        key <- Gen.oneOf("K1", "K2")
        day <- Gen.choose(1, 5)
        hour <- Gen.choose(0, 3)
      } yield (key, t(day, hour)))
    } yield (tl.distinctBy(x => (x._1, x._3)), pr.distinct)

    check(Prop.forAll(genCase) { case (tl, pr) =>
      import spark.implicits._
      val timeline = tl.toDF("k", "ts", "id", "v")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
      val probes = pr.toDF("k", "ts")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
      val got = AsOfJoin.asOf(timeline, probes, "k", "ts", "id", Seq("v"))
        .collect()
        .map(r => (r.getString(0), r.getAs[LocalDateTime](1),
          Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toSet
      // reference: latest row at-or-before, ties by id (max), per probe
      val want = pr.map { case (k, ts) =>
        val cands = tl.filter(x => x._1 == k && !x._2.isAfter(ts))
        val best = if (cands.isEmpty) None
        else Some(cands.maxBy(x => (x._2, x._3))._4)
        (k, ts, best)
      }.toSet
      got == want
    })
  }

  test("binned overlap counts equal the all-pairs reference") {
    val genIntervals = for {
      n <- Gen.choose(0, 15)
      ivs <- Gen.listOfN(n, for {
        id <- Gen.choose(0, 999)
        day <- Gen.choose(1, 3)
        hour <- Gen.choose(0, 5)
        spanH <- Gen.choose(0, 7) // spans cross multiple 1h bins
      } yield (id.toLong, t(day, hour), t(day, hour).plusHours(spanH)))
    } yield ivs.distinctBy(_._1)

    check(Prop.forAll(genIntervals) { ivs =>
      import spark.implicits._
      val df = ivs.toDF("id", "s", "e")
        .withColumn("s", col("s").cast("timestamp_ntz"))
        .withColumn("e", col("e").cast("timestamp_ntz"))
      val got = RangeJoin.overlapCounts(df, Seq("id"), "s", "e")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ivs.map { a =>
        a._1 -> ivs.count(b => b._1 != a._1 &&
          !a._2.isAfter(b._3) && !b._2.isAfter(a._3)).toLong
      }.toMap
      got == want
    })
  }
}
