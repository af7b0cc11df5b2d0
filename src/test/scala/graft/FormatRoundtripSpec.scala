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

  test("csv and json survive hostile strings: quotes, commas, newlines, unicode, empty, null") {
    import org.apache.spark.sql.types._
    val hostile = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "\"quoted\" and , both"),
      (4L, "line\nbreak\r\nand tab\there"),
      (5L, "unicode: é中文 😀"),
      (6L, ""),
      (7L, null))
    import spark.implicits._
    val df = hostile.toDF("id", "s")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))

    val csvPath = "/tmp/graft_spec_hostile_csv"
    df.write.mode("overwrite").option("header", "true").csv(csvPath)
    // multiLine: embedded newlines live inside quoted fields — without it
    // the reader would split record 4 in two (the option a production
    // export must set whenever free text is in play)
    val csvBack = spark.read.schema(schema)
      .option("header", "true").option("multiLine", "true").csv(csvPath)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // CSV cannot distinguish empty string from null (both serialize to an
    // empty field) — the documented lossy corner; everything else exact
    for ((id, s) <- hostile if id != 6L && id != 7L)
      assert(csvBack(id) === s, s"csv row $id")
    assert(csvBack(6L) == null || csvBack(6L) == "", "csv empty-string corner")
    assert(csvBack(7L) == null, "csv null")

    val jsonPath = "/tmp/graft_spec_hostile_json"
    df.write.mode("overwrite").json(jsonPath)
    val jsonBack = spark.read.schema(schema).json(jsonPath)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // JSON escapes everything and keeps the empty/null distinction —
    // the reason JSONL is the interchange format for free text
    for ((id, s) <- hostile if id != 7L) assert(jsonBack(id) === s, s"json row $id")
    assert(jsonBack(7L) == null, "json null")
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

  test("dpp join: runtime dynamicpruning expression lands in the fact's PartitionFilters") {
    val scan = FormatRoundtrip.dppJoinScan(spark, sf)
    val p = scan.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruningexpression on the partitioned fact scan:\n$p")
    // and the join result is exactly the expedite tier
    val kept = scan.select("o_orderpriority").distinct().collect().map(_.getString(0)).sorted
    assert(kept.toSeq === Seq("1-URGENT", "2-HIGH"))
  }

  test("schema evolution is re-entrant: two concurrent invocations both digest clean") {
    // The gate's overwrite-then-append pair is not atomic; before the
    // run-scoped subdir fix, two concurrent runs sharing one directory
    // could interleave (one run's overwrite racing the other's append
    // doubles batch 2). Deliberately race two invocations end-to-end and
    // require BOTH to produce the reference digest.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = Seq(
      Future(rows(FormatRoundtrip.schemaEvolution(spark, sf))),
      Future(rows(FormatRoundtrip.schemaEvolution(spark, sf))))
    val results = Await.result(Future.sequence(runs), 5.minutes)
    // the reference digest straight from the source parquet — a doubled
    // append batch (the interleave symptom) shows up in EVERY column here
    import org.apache.spark.sql.functions._
    val expected = rows(graft.sources.Tables.documents(spark, sf)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n"),
        sum(col("doc_id").cast("decimal(38,0)")).cast("long").as("id_sum"),
        sum(col("n_chars").cast("decimal(38,0)")).cast("long").as("char_sum"),
        count(when(pmod(col("doc_id"), lit(2)) === 1, col("lang"))).as("n_lang"),
        min(when(pmod(col("doc_id"), lit(2)) === 1, col("lang"))).as("lang_min"),
        max(when(pmod(col("doc_id"), lit(2)) === 1, col("lang"))).as("lang_max"))
      .orderBy("source"))
    assert(results(0) === expected)
    assert(results(1) === expected)
    // and a sequential re-run (fresh run dir) still matches
    assert(rows(FormatRoundtrip.schemaEvolution(spark, sf)) === expected)
  }
}
