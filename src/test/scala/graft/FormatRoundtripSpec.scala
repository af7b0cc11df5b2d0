package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.sources.FormatRoundtrip

/** Engine-internal fidelity check for the format-roundtrip gates: for each
  * format, the digest of the written-then-reread data must equal the digest
  * computed straight from the source parquet. The DuckDB gate proves the
  * same thing cross-engine; this spec proves it inside Spark so a format
  * regression is caught by `sbt test` without the verify harness. */
class FormatRoundtripSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] = df.collect().toSeq

  test("orc roundtrip digest equals the direct parquet digest") {
    val direct = rows(FormatRoundtrip.directFullDigest(spark, sf))
    assert(rows(FormatRoundtrip.orcRoundtrip(spark, sf)) === direct)
  }

  test("csv and json roundtrip digests agree with the direct text-safe digest") {
    val directText = rows(FormatRoundtrip.directTextDigest(spark, sf))
    assert(rows(FormatRoundtrip.csvRoundtrip(spark, sf)) === directText)
    assert(rows(FormatRoundtrip.jsonRoundtrip(spark, sf)) === directText)
  }

  test("partitioned scan prunes at listing time: filter in PartitionFilters, not PushedFilters") {
    val scan = FormatRoundtrip.partitionedPruneScan(spark, sf)
    val p = scan.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("o_orderpriority"),
      s"expected o_orderpriority in PartitionFilters:\n$p")
    val pushed = raw"PushedFilters: \[([^\]]*)\]".r
      .findAllMatchIn(p).map(_.group(1)).mkString(";")
    assert(!pushed.contains("o_orderpriority"),
      s"partition column must not appear in row-group PushedFilters: [$pushed]")
    // only the two kept partitions survive the listing
    val kept = scan.select("o_orderpriority").distinct().collect().map(_.getString(0)).sorted
    assert(kept.toSeq === FormatRoundtrip.prunedPriorities.sorted)
  }
}
