package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def t(d: Int, h: Int = 0) = LocalDateTime.of(2024, 1, d, h, 0)

  test("as-of picks the latest row at-or-before, ties by id, null pre-history") {
    import spark.implicits._
    val timeline = Seq(
      ("C1", t(2), "a", 10.0),
      ("C1", t(5), "b", 20.0),
      ("C1", t(5), "c", 30.0), // same instant: higher id wins
      ("C2", t(9), "z", 99.0))
      .toDF("k", "ts", "id", "v")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz"))
    val probes = Seq(("C1", t(1)), ("C1", t(5)), ("C1", t(7)), ("C2", t(9)))
      .toDF("k", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz"))
    val out = AsOfJoin.asOf(timeline, probes, "k", "ts", "id", Seq("v"))
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getString(0), r.getAs[LocalDateTime](1).getDayOfMonth,
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      ("C1", 1, None),        // probe predates history
      ("C1", 5, Some(30.0)),  // sees both rows AT the instant; id tie -> "c"
      ("C1", 7, Some(30.0)),  // carries forward
      ("C2", 9, Some(99.0))))
  }
}
