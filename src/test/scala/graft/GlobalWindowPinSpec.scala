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

  test("every unpartitioned window in the registry sits above an aggregation") {
    val offenders = scala.collection.mutable.Buffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if !allowlist.contains(name)) {
      val plan =
        try fn(spark, dir).queryExecution.executedPlan
        catch { case e: Throwable =>
          fail(s"$name failed to plan: ${e.getClass.getSimpleName} ${e.getMessage}") }
      val bad = collectAll(plan).collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !hasBoundBeneath(w) => w
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty && !hasBoundBeneath(w) => w
      }
      if (bad.nonEmpty)
        offenders += s"$name: ${bad.head.nodeName} over non-aggregated input"
      RunHygiene.drainStages(spark)
    }
    assert(offenders.isEmpty,
      s"corpus-sized global windows found (partition them or allowlist with a bound):\n" +
        offenders.mkString("\n"))
  }
}
