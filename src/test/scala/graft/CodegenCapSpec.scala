package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.debug.codegenStringSeq

import graft.operators.FifoMatcher

/** Pins whole-stage codegen at the salted matcher's refinement cap
  * (round-14 verdict "What's wrong" #3): `subExpr` folds up to 64 heavy
  * runs × ≤(buckets−1) composite cut predicates into ONE when-chain. The
  * 64-run cap bounds expression SIZE, but nothing pinned that a
  * max-refinement plan still whole-stage-codegens rather than silently
  * falling back to interpreted evaluation — Janino's method bytecode limit
  * (`spark.sql.codegen.hugeMethodLimit`, default 65535) is the cliff, and
  * a fallback would cost a large constant factor exactly on the whale
  * inputs the sub-split exists for.
  *
  * The synthetic worst case: 64 heavy runs × ~15 cuts ≈ 960 branch terms
  * (the documented bound). With buckets=B at most B−1 runs can strictly
  * exceed the total/B heavy threshold, so B=65 is the smallest bucket
  * count where the 64-run cap itself binds: 64 customers × 1,024
  * equal-timestamp rows each (run > total/65 ≈ 1,008), and the 1-in-64
  * md5 boundary sample yields ~16 tiles → ~15 cuts per run. */
class CodegenCapSpec extends AnyFunSuite {
  import TestSpark._

  test("max-refinement salted plan stays whole-stage-codegen'd (no huge-method fallback)") {
    // heavy-run arithmetic: run heavy ⇔ cnt > total/65. With E earned (one
    // run per customer) and S spent, E > 64(E+S)/65 ⇔ E > 64S — so the
    // spent side must stay tiny (8 per customer) for all 64 earned runs to
    // clear the threshold: total = 64×1032+2 → threshold 1016 < 1024. The
    // spent rows sit at a later timestamp so the earned run is a pure
    // equal-timestamp whale.
    val rows = (0 until 64).flatMap { c =>
      (0 until 1024).map { i =>
        (f"TE$c%02d_$i%04d", f"C$c%02d", 1.0, "2024-06-15T12:00:00", "earned")
      } ++ (0 until 8).map { i =>
        (f"TS$c%02d_$i%04d", f"C$c%02d", -1.0, "2024-06-15T12:00:01", "spent")
      }
    } ++ Seq(
      ("BG1", "BG", 1.0, "2024-01-01", "earned"),
      ("BG2", "BG", -1.0, "2024-12-31", "spent"))
    val in = tx(rows: _*)
    val out = FifoMatcher.matchTransactionsSalted(in, buckets = 65)

    // engagement at the cap is asserted, not assumed: the boundary
    // derivation must return all 64 heavy runs with a near-full cut set
    // (~15 cuts from the 1-in-64 sample's ~16 tiles) — the when-chain the
    // codegen assertion below is actually about
    locally {
      import org.apache.spark.sql.functions._
      val t = in
        .withColumnRenamed("transaction_id", "TRANS_ID")
        .withColumnRenamed("transaction_type", "TCTYPE")
        .withColumnRenamed("timestamp", "CREATEDAT")
        .withColumnRenamed("customer_id", "CUSTOMERID")
        .withColumnRenamed("amount", "AMOUNT")
        .withColumn("is_earned", col("TCTYPE") === "earned")
      val mm = t.agg(min(col("CREATEDAT")), max(col("CREATEDAT")), count(lit(1))).head()
      val epoch = java.time.LocalDateTime.of(1970, 1, 1, 0, 0)
      def mic(x: java.time.LocalDateTime): Long =
        java.time.temporal.ChronoUnit.MICROS.between(epoch, x)
      val lo = mic(mm.getAs[java.time.LocalDateTime](0))
      val span = mic(mm.getAs[java.time.LocalDateTime](1)) - lo + 1
      val bucket = expr(
        s"cast(((unix_micros(cast(CREATEDAT as timestamp)) - ${lo}L) * 65L) div ${span}L as int)")
      val bs = FifoMatcher.subSplitBoundaries(t, 65, bucket, mm.getLong(2))
      assert(bs.size === 64, s"expected all 64 heavy runs, got ${bs.size}")
      val nCuts = bs.map(_._2.size).sum
      assert(nCuts >= 64 * 10,
        s"refinement under-engaged: $nCuts cuts (~15/run expected)")
      info(s"refinement engaged: ${bs.size} runs, $nCuts cut predicates")
    }

    // collect() (not count(), which plans its OWN QueryExecution) so THIS
    // dataset's adaptive plan finalizes and its codegen stages materialize
    val outRows = out.collect()

    val plan = out.queryExecution.executedPlan
    val subtrees = codegenStringSeq(plan)
    assert(subtrees.nonEmpty, "no whole-stage-codegen subtree in the salted plan")
    // the refinement projection (the `bkt` when-chain) must live INSIDE a
    // codegen subtree, not in an interpreted Project outside all of them
    assert(subtrees.exists(_._1.contains("bkt")),
      s"bkt refinement not in any codegen subtree:\n${subtrees.map(_._1).mkString("\n---\n")}")
    // and no generated method may cross the huge-method fallback cliff
    val limit = spark.sessionState.conf.hugeMethodLimit
    subtrees.foreach { case (tree, _, stats) =>
      assert(stats.maxMethodCodeSize > 0, s"codegen did not COMPILE for:\n$tree")
      assert(stats.maxMethodCodeSize <= limit,
        s"generated method ${stats.maxMethodCodeSize} bytes exceeds hugeMethodLimit " +
          s"$limit (interpreted fallback) in subtree:\n$tree")
    }
    info(s"codegen subtrees=${subtrees.size}, max method bytecode=" +
      s"${subtrees.map(_._3.maxMethodCodeSize).max} (hugeMethodLimit=$limit)")

    // output invariance at the cap (counts + matched volume vs the
    // windowed oracle; full row equality is covered by FifoMatcherSpec)
    val oracle = FifoMatcher.matchTransactions(in).collect()
    assert(outRows.length === oracle.length)
    assert(outRows.count(!_.isNullAt(5)) === oracle.count(!_.isNullAt(5)))
  }
}
