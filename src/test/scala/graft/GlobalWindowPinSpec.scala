package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Round-11 pin (r10 verdict #5): every `WindowExec: No Partition Defined`
  * site in the registry is a CHECKED invariant, not a believed one. An
  * unpartitioned window serializes its whole input through one task, so it
  * is only admissible over a domain-sized frame — in practice, a frame
  * that already went through an aggregation (count-of-counts censuses,
  * value-grid quantiles, day rollups). This spec walks the physical plan
  * of EVERY registered query (through AQE wrappers and cached-relation
  * subtrees) and fails if an unpartitioned WindowExec/WindowGroupLimitExec
  * has no aggregate anywhere beneath it — i.e. a corpus-sized global
  * window. Queries where the bounded-input argument is structural rather
  * than an aggregate sit in a named allowlist with the reason spelled out;
  * adding a new corpus-sized global window anywhere fails CI.
  *
  * The SAME planning sweep (the expensive part — 281 query plans) also
  * checks the registry-wide CartesianProduct ban: by repo convention a
  * deliberate 1-row scalar cross plans as a BroadcastNestedLoopJoin with
  * an identity-broadcast build, never as CartesianProduct, so any
  * CartesianProduct in any gated plan is an n×m row join waiting for
  * scale — except the named sketch-sized allowlist.
  */
class GlobalWindowPinSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  // Queries whose unpartitioned window runs over an input bounded by
  // something OTHER than an upstream aggregate / top-k in the same plan
  // subtree. Every entry must name the bound.
  private val allowlist: Map[String, String] = Map(
    "join_pareto_frontier" ->
      ("pass 2's global skyline window reads pass 1's per-bucket skyline " +
        "survivors — #buckets x per-bucket frontier size, corpus-independent " +
        "in expectation; PlanPinSpec pins the bucketed prune below it")
  )

  private def descend(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
      case _ => Nil
    }
    p.children ++ p.subqueries ++ extra
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    p +: descend(p).flatMap(collectAll)

  // A global window is bounded when its input already collapsed through an
  // aggregation (domain-sized frame) or a top-k heap (k-row frame).
  private def hasBoundBeneath(p: SparkPlan): Boolean =
    descend(p).flatMap(collectAll).exists {
      case _: BaseAggregateExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _ => false
    }

  // Queries whose CartesianProduct is over sketch-sized (k-bounded) sides,
  // with the bound named — everything else must stay keyed or 1-row-BNLJ.
  private val cartesianAllowlist: Map[String, String] = Map(
    "sketch_kmv_jaccard" -> ("the |groups|^2 pair roster cross over the " +
      "k-bounded KMV sketch table (<= k rows per group by construction); " +
      "corpus-scale work stays keyed — pinned in PlanPinSpec")
  )

  test("registry sweep: global windows sit above a bound; no corpus-sided cartesians") {
    val windowOffenders = scala.collection.mutable.Buffer.empty[String]
    val cartesianOffenders = scala.collection.mutable.Buffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan =
        try fn(spark, dir).queryExecution.executedPlan
        catch { case e: Throwable =>
          fail(s"$name failed to plan: ${e.getClass.getSimpleName} ${e.getMessage}") }
      val nodes = collectAll(plan)
      if (!allowlist.contains(name)) {
        val bad = nodes.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !hasBoundBeneath(w) => w
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty && !hasBoundBeneath(w) => w
        }
        if (bad.nonEmpty)
          windowOffenders += s"$name: ${bad.head.nodeName} over non-aggregated input"
      }
      if (!cartesianAllowlist.contains(name) &&
          nodes.exists(_.isInstanceOf[
            org.apache.spark.sql.execution.joins.CartesianProductExec]))
        cartesianOffenders += name
      RunHygiene.drainStages(spark)
    }
    assert(windowOffenders.isEmpty,
      s"corpus-sized global windows found (partition them or allowlist with a bound):\n" +
        windowOffenders.mkString("\n"))
    assert(cartesianOffenders.isEmpty,
      s"CartesianProduct found (key the join, broadcast the 1-row side, or allowlist " +
        s"with the size bound): ${cartesianOffenders.mkString(", ")}")
  }
}
