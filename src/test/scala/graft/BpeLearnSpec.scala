package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeLearn

/** Word-level BPE merge learning: pair selection, greedy-left merge
  * application, tie-breaks, and the count-2 stopping rule. */
class BpeLearnSpec extends AnyFunSuite {
  import TestSpark._

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("learns the most frequent pair first, then compounds") {
    val d = docs(
      1L -> "new york is big",
      2L -> "new york city is in new york state",
      3L -> "a new yorker")
    val m = BpeLearn.merges(d).collect()
    // "new york" occurs 3 times — rank 1; after merging, "new york" + next
    // symbol pairs are all count 1, so only pairs that still repeat merge
    assert(m.head.getAs[String]("left_sym") === "new")
    assert(m.head.getAs[String]("right_sym") === "york")
    assert(m.head.getAs[Long]("pair_freq") === 3L)
    assert(m.head.getAs[Long]("merge_rank") === 1L)
  }

  test("greedy-left application: a a a merges to (a a) a, not a (a a)") {
    val d = docs(1L -> "a a a", 2L -> "a a a")
    val out = BpeLearn.applied(d, rounds = 1).collect()
    // pair (a, a) count 4 -> merged; greedy-left leaves [aa, a] per doc
    assert(out.forall(_.getAs[Int]("n_symbols") === 2))
  }

  test("stops when no pair reaches count 2") {
    val d = docs(1L -> "w x y z") // every pair unique
    val m = BpeLearn.merges(d).collect()
    assert(m.isEmpty)
    val out = BpeLearn.applied(d).collect()
    assert(out.head.getAs[Int]("n_tokens") === 4)
    assert(out.head.getAs[Int]("n_symbols") === 4)
  }

  test("ties break lexicographically on (left, right)") {
    val d = docs(1L -> "b c", 2L -> "b c", 3L -> "a d", 4L -> "a d")
    val m = BpeLearn.merges(d, rounds = 1).collect()
    // (a,d) and (b,c) both count 2 — lexicographic min wins
    assert(m.head.getAs[String]("left_sym") === "a")
    assert(m.head.getAs[String]("right_sym") === "d")
  }

  test("merged symbols participate in later rounds (compounding)") {
    val d = docs(
      1L -> "san francisco bay area",
      2L -> "san francisco bay bridge",
      3L -> "san francisco bay weather")
    val m = BpeLearn.merges(d).collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
    // round 1: (francisco, bay) and (san, francisco) both count 3 —
    // lexicographic tie-break picks (francisco, bay); round 2 must then
    // compound over the MERGED symbol
    assert(m.contains(("francisco", "bay")))
    assert(m.contains(("san", "francisco bay")),
      s"expected the round-1 merge to compound, got ${m.toList}")
  }

  test("empty and single-token docs pass through; empty tokens filtered") {
    val d = docs(1L -> "solo", 2L -> "", 3L -> "x  y x  y")
    val out = BpeLearn.applied(d, rounds = 2).collect()
    // doc 2 (no tokens) excluded; doc 1 passes through unmerged
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 3L))
    // doc 3: double space yields empty tokens, filtered -> [x,y,x,y];
    // pair (x,y) count 2 merges greedy-left -> [x y, x y]; the follow-up
    // pair (x y, x y) occurs once, below the count-2 rule -> stays at 2
    val d3 = out.find(_.getAs[Long]("doc_id") == 3L).get
    assert(d3.getAs[Int]("n_tokens") === 4)
    assert(d3.getAs[Int]("n_symbols") === 2)
  }
}
