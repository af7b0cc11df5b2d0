package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Content-defined chunking: the property that justifies it over fixed-size
  * chunking is SHIFT INVARIANCE — a prefix insertion must not change the
  * chunks of the shared tail. */
class CdcChunkSpec extends AnyFunSuite {
  import TestSpark._

  // non-repetitive: every word distinct, so chunk values don't collapse
  private val shared =
    (1 to 60).map(i => s"w${i}x${i * 7 % 97}").mkString(" ")

  test("cdcChunks: a prefix insertion leaves the shared tail's chunks intact") {
    import spark.implicits._
    val docs = Seq(
      (1L, shared),
      (2L, "XXXXX YYYYY ZZZZZ " + shared)) // shifted by 18 chars
      .toDF("doc_id", "text")
    val census = Dedup.cdcChunks(docs).collect()
    // the shared tail must produce chunks common to BOTH docs — fixed-size
    // chunking would share none (every boundary shifts by 18)
    val crossDoc = census.filter(_.getAs[Long]("n_docs") == 2L)
    assert(crossDoc.nonEmpty, "shift invariance: shared content must yield shared chunks")
    // shared bytes dominated by cross-doc chunks (tolerating the one
    // boundary-straddling chunk at the splice point)
    val sharedLen = crossDoc.map(_.getAs[Long]("chunk_len")).sum
    assert(sharedLen > shared.length / 2,
      s"expected most of the ${shared.length}-char shared tail in cross-doc chunks, got $sharedLen")
  }

  test("cdcChunks: chunks tile each document exactly (no gaps, no overlaps)") {
    import spark.implicits._
    val docs = Seq((1L, shared), (2L, "short doc"), (3L, "tiny")).toDF("doc_id", "text")
    // re-derive the per-doc chunk list (census aggregates away per-doc order,
    // so tile-checking uses the same operator internals via a length sum)
    val totalChunkLen = Dedup.cdcChunks(docs.unionAll(docs).withColumn("doc_id",
        col("doc_id") + when(col("doc_id") <= 3L, 0L).otherwise(0L)))
      .collect() // duplicated corpus → every chunk appears ≥ 2 → full census
      .map(r => r.getAs[Long]("chunk_len") * r.getAs[Long]("n_occurrences")).sum
    val totalTextLen = 2L * docs.collect().map(_.getString(1).length.toLong).sum
    assert(totalChunkLen === totalTextLen,
      "chunk lengths × occurrences must tile the corpus byte-for-byte")
  }

  test("cdcChunks: docs shorter than the window become one whole-doc chunk") {
    import spark.implicits._
    val docs = Seq((1L, "tiny"), (2L, "tiny")).toDF("doc_id", "text")
    val census = Dedup.cdcChunks(docs).collect()
    assert(census.length === 1)
    assert(census.head.getAs[String]("chunk") === "tiny")
    assert(census.head.getAs[Long]("n_docs") === 2L)
  }
}
