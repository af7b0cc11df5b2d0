package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join equals plain join on skewed data (whale + tail paths)") {
    import spark.implicits._
    // whale key "w" has 500 rows; "a"/"b" are the long tail; dims small
    val big = ((1 to 500).map(i => ("w", i.toLong)) ++ Seq(("a", 1L), ("b", 2L)))
      .toDF("k", "v")
    val dim = Seq(("w", "whale"), ("a", "alpha"), ("c", "unused")).toDF("k", "name")

    val plain = big.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toList.sortBy(_.toString)
    // threshold 100 splits the keys: "w" takes the salted path, "a"/"b"
    // the plain-tail path — the result must be the plain join either way
    val salted = Skew.saltedJoin(big, dim, Seq("k"), buckets = 8, whaleMinRows = 100)
      .select("k", "v", "name")
      .collect().map(_.toSeq).toList.sortBy(_.toString)
    assert(salted === plain)
    assert(salted.count(_.head == "w") === 500)
  }

  test("whale threshold boundaries: all-whale, no-whale, and split agree") {
    import spark.implicits._
    val big = ((1 to 100).map(i => ("w", i.toLong)) ++ Seq(("a", 1L), ("b", 2L)))
      .toDF("k", "v")
    val dim = Seq(("w", "whale"), ("a", "alpha"), ("c", "unused")).toDF("k", "name")
    val plain = big.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toList.sortBy(_.toString)
    // every key a whale, no key a whale, and the genuine split must all
    // reproduce the plain join exactly
    for (threshold <- Seq(1L, 50L, Long.MaxValue)) {
      val got = Skew.saltedJoin(big, dim, Seq("k"), buckets = 4, whaleMinRows = threshold)
        .select("k", "v", "name")
        .collect().map(_.toSeq).toList.sortBy(_.toString)
      assert(got === plain, s"mismatch at whaleMinRows=$threshold")
    }
  }

  test("salted sum equals plain sum exactly for integral values") {
    import spark.implicits._
    val df = ((1 to 1000).map(i => ("w", i.toLong)) ++ Seq(("a", 5L))).toDF("k", "v")
    val plain = df.groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(df, Seq("k"), "v", buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }
}
