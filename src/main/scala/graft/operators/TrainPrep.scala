package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Training-set preparation: the last-mile operators between a curated
  * corpus and a training run.
  *
  * Both are engine-portable by construction (md5 + integer arithmetic +
  * one keyed window), so the DuckDB oracle reproduces them bit-for-bit —
  * and both are narrow/one-window operations that scale linearly.
  */
object TrainPrep {

  /** Deterministic hash-based train/validation/test split.
    *
    * Bucket = first 8 md5 hex digits of the doc_id rendered as text, mod
    * `buckets` — a content-independent, engine-portable coin flip that is
    * stable under corpus growth (a doc's split never changes when other
    * docs are added — the property random sampling lacks, and the reason
    * production pipelines split by hash, not rand()). No shuffle: one
    * narrow projection.
    */
  def assignSplits(docs: DataFrame, valPct: Int = 10, testPct: Int = 10,
      buckets: Int = 100): DataFrame = {
    val b = (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets).as("bucket")
    docs.select(col("doc_id"), b)
      .withColumn("split",
        when(col("bucket") < testPct, "test")
          .when(col("bucket") < testPct + valPct, "validation")
          .otherwise("train"))
      .orderBy("doc_id")
  }

  /** Token-stream sequence packing, sharded: within each shard of
    * `docsPerShard` consecutive doc_ids, documents concatenate into one
    * token stream and training sequence k holds tokens
    * [k·maxTokens, (k+1)·maxTokens) — the GPT-style packing convention
    * (docs span sequence boundaries; nothing is padded or re-ordered).
    * Emits where each doc's tokens land: (doc_id, n_tokens, shard,
    * pack_id, pack_offset) with pack_id = floor(prior/maxTokens) of the
    * shard-local running token count and pack_offset = prior mod maxTokens.
    *
    * Sharding is what makes this distributable: packing needs an ordered
    * running sum, and an unpartitioned window would serialize the corpus
    * through one task — sharding by doc_id range bounds each window
    * partition at `docsPerShard` docs, packs shards independently in
    * parallel, and keeps every assignment stable when new shards are
    * appended (the same restartability contract real token-stream
    * pipelines get from per-file packing).
    */
  def packSequences(docs: DataFrame, maxTokens: Int = 512,
      docsPerShard: Int = 1000): DataFrame = {
    val shard = floor(col("doc_id") / docsPerShard).as("shard")
    val toks = TextOps.withTokens(docs)
      .select(col("doc_id"), shard, size(col("toks")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("prior", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("prior") / maxTokens))
      .withColumn("pack_offset", col("prior") - col("pack_id") * maxTokens)
      .select("doc_id", "n_tokens", "shard", "pack_id", "pack_offset")
      // doc_id is already a unique total order; sorting on every output
      // column besides it is belt-and-braces against any physical-row-order
      // variable in the Verify dump (round-3 gate flaked on hash only).
      .orderBy("doc_id", "n_tokens", "shard", "pack_id", "pack_offset")
  }

  /** Curriculum binning: bucket documents by token length (fixed-width
    * bins, last bin open-ended) and spread each bin over `shardsPerBin`
    * shards by the engine's portable id hash. Length-ordered curricula and
    * length-balanced batching both start from exactly this assignment —
    * a batch reads (bin k, shard j) files and every sequence in it has a
    * near-uniform length, killing padding waste.
    *
    * Pure narrow projection: no shuffle, no window — the assignment is a
    * per-row function of (text, doc_id), so it scales with the scan and
    * appended docs never disturb existing assignments.
    *
    * Output: (doc_id, n_tokens, bin, shard).
    */
  def curriculumBins(docs: DataFrame, binWidth: Int = 64, maxBin: Int = 7,
      shardsPerBin: Int = 4): DataFrame = {
    val hv = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    TextOps.withTokens(docs)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"), hv.as("hv"))
      .withColumn("bin", least(floor(col("n_tokens") / binWidth), lit(maxBin.toLong)))
      .withColumn("shard", col("hv") % shardsPerBin)
      .select("doc_id", "n_tokens", "bin", "shard")
      .orderBy("doc_id")
  }
}
