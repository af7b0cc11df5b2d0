package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Cross-document exact substring-span dedup: window flagging, exact
  * verification, island merging, and the compiled span-hash kernel. */
class SubstringSpanSpec extends AnyFunSuite {
  import TestSpark._

  private val shared = (1 to 10).map(i => s"s$i").mkString(" ")

  test("a run shared by two docs yields one maximal span in each, exact boundaries") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"x1 x2 $shared x3 x4"), // shared run at token positions 3..12
      (2L, s"y1 $shared y2 y3 y4"), // shared run at token positions 2..11
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12")) // no overlap
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, minSpanTokens = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // L=8 over a 10-token shared run → 3 flagged windows merging to one
    // span of exactly the shared run
    assert(spans.toSeq === Seq(
      (1L, 3L, 12L, 10L, 3L),
      (2L, 2L, 11L, 10L, 3L)))
  }

  test("within-document-only repetition is not flagged") {
    import spark.implicits._
    val rep = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$rep z $rep"), // the 8-token run repeats only inside doc 1
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
      .toDF("doc_id", "text")
    assert(Dedup.substringSpans(docs, minSpanTokens = 8).count() === 0)
  }

  test("disjoint shared runs in one doc stay separate islands; adjacent merge") {
    import spark.implicits._
    val runA = (1 to 8).map(i => s"a$i").mkString(" ")
    val runB = (1 to 8).map(i => s"b$i").mkString(" ")
    // doc 1 carries both runs separated by a 9-token gap (> L keeps the
    // islands apart); docs 2 and 3 each share one run
    val gap = (1 to 9).map(i => s"g$i").mkString(" ")
    val docs = Seq(
      (1L, s"$runA $gap $runB"),
      (2L, s"p1 p2 $runA p3"),
      (3L, s"$runB q1 q2 q3"))
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, minSpanTokens = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq === Seq(
      (1L, 1L, 8L), (1L, 18L, 25L), // two separate islands in doc 1
      (2L, 3L, 10L),
      (3L, 1L, 8L)))
  }

  test("span-hash kernel matches conv(substring(md5(gram),1,15),16,10)") {
    import spark.implicits._
    graft.functions.TextExpressions.registerSpanHashes(spark, 3)
    val df = Seq("alpha beta gamma delta epsilon", "uno dos tres").toDF("text")
      .select(split(col("text"), " ").as("toks"))
    val got = df.select(call_function("span_hashes_3", col("toks")).as("hv"))
    val want = df.select(transform(
      sequence(lit(1), greatest(size(col("toks")) - 2, lit(0))),
      i => conv(substring(md5(concat_ws(" ", slice(col("toks"), i, lit(3)))), 1, 15), 16, 10)
        .cast("long")).as("hv"))
    assert(got.collect().map(_.getSeq[Long](0)).toSeq
      === want.collect().map(_.getSeq[Long](0)).toSeq)
  }
}
