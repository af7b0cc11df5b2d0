package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the shapes PLANS.md claims — a regression in any
  * of these silently costs orders of magnitude at scale long before it
  * costs correctness, so the shapes are asserted, not just documented. */
class PlanPinSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("fifo_match: two window passes, zero joins") {
    val p = plan("fifo_match_rankjoin") // rank-join form MAY join; primary must not
    val primary = plan("fifo_match")
    assert(!primary.contains("Join"), s"windowed matcher must not join:\n$primary")
    assert("(?s)Window".r.findAllIn(primary).size >= 1)
    assert(p.contains("Join")) // the alternate formulation really is the join shape
  }

  test("top-k plans as TakeOrderedAndProject, never a global sort") {
    assert(plan("topk_orders").contains("TakeOrderedAndProject"))
    assert(plan("top_balances").contains("TakeOrderedAndProject"))
  }

  test("as-of rank idiom gets WindowGroupLimit pushdown") {
    assert(plan("window_customer_order_rank").contains("WindowGroupLimit"))
  }

  test("dedup/similarity scale paths never nested-loop join") {
    Seq("dedup_ngram_jaccard", "dedup_minhash_lsh", "embed_neardup_pairs",
      "dedup_winnow_pairs", "sessions_concurrency").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q must stay keyed-join only")
    }
  }

  test("filter pushdown reaches the parquet scan") {
    val p = plan("agg_pricing_filtered")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("PushedFilters: [") && p.contains("l_shipdate"),
      s"expected l_shipdate in PushedFilters:\n$p")
  }

  test("dimension joins broadcast in the revenue rollup") {
    assert(plan("join_revenue_by_nation").contains("BroadcastHashJoin"))
  }
}
