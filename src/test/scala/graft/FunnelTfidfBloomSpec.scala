package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps
import graft.queries.{EventQueries, RelationalQueries}

class FunnelTfidfBloomSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel counts users per ordered step; out-of-order steps don't count") {
    import spark.implicits._
    val events = Seq(
      // u1 completes the funnel in order
      (1L, 10L, ts("2024-01-01 10:00:00"), "view", 1.0),
      (2L, 10L, ts("2024-01-01 10:05:00"), "click", 1.0),
      (3L, 10L, ts("2024-01-01 10:10:00"), "purchase", 1.0),
      // u2 clicks BEFORE viewing: reaches step 1 only (click doesn't count,
      // and the purchase needs a valid click before it)
      (4L, 20L, ts("2024-01-01 09:00:00"), "click", 1.0),
      (5L, 20L, ts("2024-01-01 09:30:00"), "view", 1.0),
      (6L, 20L, ts("2024-01-01 09:45:00"), "purchase", 1.0),
      // u3 views only
      (7L, 30L, ts("2024-01-01 08:00:00"), "view", 1.0),
      // u4 never views: contributes to no step
      (8L, 40L, ts("2024-01-01 07:00:00"), "purchase", 1.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val f = EventQueries.funnel(events).collect()
    assert(f.map(r => (r.getAs[Long]("step"), r.getAs[String]("step_name"),
      r.getAs[Long]("n_users"))).toSeq ===
      Seq((1L, "view", 3L), (2L, "click", 1L), (3L, "purchase", 1L)))
    val pct = f.map(r => r.getAs[Double]("pct_of_first"))
    assert(pct(0) === 100.0)
    assert(math.abs(pct(1) - 33.33) < 0.01)
  }

  test("funnel counts a click at the exact view timestamp (at-or-after rule)") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "view", 1.0),
      (2L, 10L, ts("2024-01-01 10:00:00"), "click", 1.0) // same ts, later event_id
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val f = EventQueries.funnel(events).collect()
    assert(f.map(_.getAs[Long]("n_users")).toSeq === Seq(1L, 1L, 0L))
  }

  test("tfidf top terms rank rare terms above stopwords, scores exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat the dog"),
      (2L, "the cat the cat"),
      (3L, "the zebra runs far")
    ).toDF("doc_id", "text")
    val t = TextOps.tfidfTopTerms(docs, k = 2)
    val byDoc = t.collect().groupBy(_.getAs[Long]("doc_id"))
    // doc 3: zebra tf=1 df=1 → score 3.0; 'the' tf=1 df=3 → 1.0
    val d3 = byDoc(3L).map(r => (r.getAs[String]("term"), r.getAs[Double]("score"))).toSeq
    assert(d3.head === (("far", 3.0)) || d3.head._2 === 3.0) // rank-1 is a df=1 term
    assert(d3.forall(_._2 === 3.0) || d3.map(_._1).contains("zebra"))
    // doc 2: cat tf=2 df=2 → 2*1.5=3.0 beats the tf=2 df=3 → 2.0
    val d2 = byDoc(2L).map(r => (r.getAs[String]("term"), r.getAs[Double]("score"))).toSeq
    assert(d2.head === (("cat", 3.0)))
    assert(d2(1) === (("the", 2.0)))
    // ranks are 1..k
    assert(byDoc.values.forall(_.map(_.getAs[Long]("rank")).sorted.sameElements(Array(1L, 2L))))
  }

  test("bloom-prefiltered revenue equals the plain semi-join aggregate") {
    import spark.implicits._
    val orders = (1L to 200L).map(k => (k, k * 3000.0)).toDF("o_orderkey", "o_totalprice")
    val lineitem = (1L to 600L)
      .map(i => (i % 200 + 1, if (i % 2 == 0) "A" else "R", 100.0 + i, 0.05))
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val got = RelationalQueries.bloomFilteredRevenue(lineitem, orders, 450000.0)
    val want = lineitem
      .join(orders.filter($"o_totalprice" >= 450000.0), $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum($"l_extendedprice" * (org.apache.spark.sql.functions.lit(1) - $"l_discount")), 2).as("revenue"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("lineitem_count"))
      .orderBy("l_returnflag")
    assert(got.collect().toSeq === want.collect().toSeq)
    // and the probe actually prunes: rows surviving the bloom filter alone
    // stay close to the true selected fraction (fpp 1%)
    val keys = orders.filter($"o_totalprice" >= 450000.0).select("o_orderkey")
    val name = graft.functions.BloomExpressions.registerBloom(
      spark, keys.stat.bloomFilter("o_orderkey", 100, 0.01))
    val pre = lineitem.filter(org.apache.spark.sql.functions.call_function(name, $"l_orderkey")).count()
    val exact = lineitem.join(keys, $"l_orderkey" === $"o_orderkey", "left_semi").count()
    assert(pre >= exact && pre <= exact + 60)
  }
}
