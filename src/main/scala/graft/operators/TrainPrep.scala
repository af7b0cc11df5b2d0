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

  /** Leakage-safe split assignment: [[assignSplits]]' hash-bucket coin
    * flip, but keyed on the near-dup CLUSTER id instead of the document
    * id. Under per-doc splitting, two near-duplicates can land in train
    * and test and the eval set silently contains (a mutation of) training
    * data — the split-level counterpart of benchmark contamination.
    * Hashing the cluster representative moves whole clusters together, so
    * no near-dup pair ever straddles a split boundary.
    *
    * `pairs` is any near-dup pair list (doc_a < doc_b); docs absent from
    * it are their own singleton cluster (cluster_id = doc_id), so the
    * assignment degrades to exactly [[assignSplits]] on a dup-free
    * corpus. Scale shape: the cluster labels come from
    * [[Dedup.dedupClusters]] (edge-bound label propagation); the join
    * back to the corpus is one keyed shuffle on doc_id and the bucket/
    * split decision is narrow. Stable under append: new docs change no
    * existing doc's cluster minimum unless they genuinely bridge
    * clusters — precisely the docs a leakage guard must move.
    *
    * Output: (doc_id, cluster_id, bucket, split), ordered by doc_id. */
  def leakageSafeSplits(docs: DataFrame, pairs: DataFrame, valPct: Int = 10,
      testPct: Int = 10, buckets: Int = 100): DataFrame = {
    val clusters = Dedup.dedupClusters(pairs)
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket",
        conv(substring(md5(col("cluster_id").cast("string").cast("binary")), 1, 8), 16, 10)
          .cast("long") % buckets)
      .withColumn("split",
        when(col("bucket") < testPct, "test")
          .when(col("bucket") < testPct + valPct, "validation")
          .otherwise("train"))
      .orderBy("doc_id")
  }

  /** Epoch-salted deterministic shuffle — the data-ordering contract of a
    * multi-epoch training run: each epoch must present the corpus in a
    * DIFFERENT order (same order every epoch hurts convergence), yet the
    * order must be reproducible for restarts and debugging. Rank =
    * portable hash of "epoch:doc_id" — a new uniform permutation per
    * epoch, byte-identical across re-runs, and append-stable per epoch
    * (new docs interleave without moving existing relative order... of
    * surviving hash gaps, exactly like every hash sampler here).
    *
    * Ranking is per (epoch, shard) with shards of `docsPerShard`
    * consecutive ids — the packSequences discipline: no epoch-global
    * sort; a training worker reads its shard's ordering independently.
    * One keyed shuffle on (epoch, shard); partition size ≤ docsPerShard.
    *
    * Output: (doc_id, epoch, shard, shuffle_rank), one row per doc per
    * epoch, ordered by (epoch, shard, shuffle_rank). */
  def epochShuffle(docs: DataFrame, epochs: Int = 3,
      docsPerShard: Int = 1000): DataFrame = {
    val base = docs.select(col("doc_id"),
      floor(col("doc_id") / docsPerShard).cast("long").as("shard"),
      explode(array((0 until epochs).map(e => lit(e.toLong)): _*)).as("epoch"))
    val hv = conv(substring(md5(
      concat(col("epoch").cast("string"), lit(":"), col("doc_id").cast("string"))
        .cast("binary")), 1, 8), 16, 10).cast("long")
    base.withColumn("hv", hv)
      .withColumn("shuffle_rank", row_number().over(
          Window.partitionBy("epoch", "shard").orderBy(col("hv"), col("doc_id")))
        .cast("long"))
      .select("doc_id", "epoch", "shard", "shuffle_rank")
      .orderBy("epoch", "shard", "shuffle_rank")
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

  /** Context-window chunking: slice each document's token stream into
    * overlapping windows of `window` tokens advancing by `stride` — the
    * standard way a pretraining/embedding pipeline turns variable-length
    * documents into model-sized inputs while keeping `window - stride`
    * tokens of context across the seam.
    *
    * Chunk count is `1 + ceil(max(n - window, 0) / stride)` (every doc
    * emits at least one chunk; the last chunk may be short — clamped to
    * the doc end, never padded). All placement math is integer, and each
    * chunk carries the md5 of its space-rejoined token slice so the gate
    * verifies the *content* of every slice cross-engine, not just its
    * coordinates.
    *
    * Pure narrow projection — tokenize, `sequence` the start offsets,
    * `posexplode`, `slice`: no shuffle at any corpus size, output volume
    * ≈ n_tokens/stride rows per doc. The fan-out is bounded per-row, so
    * a 100 TB corpus chunks at scan speed with no skew beyond document
    * length itself.
    */
  def chunkWindows(docs: DataFrame, window: Int = 64,
      stride: Int = 48): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    TextOps.withTokens(docs)
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("n_tokens"))
      .withColumn("n_chunks",
        lit(1L) + expr(s"greatest(n_tokens - $window, 0L) div $stride") +
          when(expr(s"greatest(n_tokens - $window, 0L) % $stride") > 0, 1L).otherwise(0L))
      .select(col("doc_id"), col("toks"), col("n_tokens"),
        posexplode(expr("sequence(0L, n_chunks - 1)")).as(Seq("pos", "chunk_id")))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("n_toks",
        least(lit(window.toLong), col("n_tokens") - col("start_tok")))
      .withColumn("chunk_hash",
        md5(concat_ws(" ", expr("slice(toks, CAST(start_tok + 1 AS INT), CAST(n_toks AS INT))"))
          .cast("binary")))
      .select("doc_id", "chunk_id", "start_tok", "n_toks", "chunk_hash")
      .orderBy("doc_id", "chunk_id")
  }

  /** Chunk-level exact dedup: run [[chunkWindows]], group chunks by their
    * content hash, keep the first occurrence (by (doc_id, chunk_id)) as
    * survivor and emit every other instance with a pointer to it — the
    * RAG/embedding-corpus counterpart of document-level exact dedup
    * (boilerplate repeated across documents dies at chunk granularity
    * even when no two whole documents match).
    *
    * One shuffle keyed on chunk_hash; both windows (copy count, survivor
    * first_value, duplicate rank) share that partitioning, and a
    * partition's size is the copy count of one hash — bounded by content
    * duplication, not corpus size. Narrow before, narrow after.
    *
    * Output: one row per REMOVED chunk instance
    * (doc_id, chunk_id, start_tok, chunk_hash, survivor_doc,
    * survivor_chunk, n_copies). */
  def chunkDupes(docs: DataFrame, window: Int = 64,
      stride: Int = 48): DataFrame = {
    val byHash = Window.partitionBy("chunk_hash")
    val ordered = byHash.orderBy("doc_id", "chunk_id")
    chunkWindows(docs, window, stride)
      .withColumn("n_copies", count(lit(1)).over(byHash))
      .filter(col("n_copies") > 1)
      .withColumn("rk", row_number().over(ordered))
      .withColumn("survivor_doc", first(col("doc_id")).over(ordered))
      .withColumn("survivor_chunk", first(col("chunk_id")).over(ordered))
      .filter(col("rk") >= 2)
      .select("doc_id", "chunk_id", "start_tok", "chunk_hash",
        "survivor_doc", "survivor_chunk", "n_copies")
      .orderBy("doc_id", "chunk_id")
  }

  /** Reproducible-release shard manifest: per (split, shard), the counts
    * and a content checksum a consumer re-derives to prove the dataset it
    * downloaded is the dataset the manifest describes — the WebDataset/
    * HuggingFace-datasets release discipline.
    *
    * The checksum is BIT_XOR of a 60-bit md5-derived integer per document
    * (15 hex chars — 16 would overflow signed long): XOR is
    * order-independent and exact, so the manifest is invariant to
    * partitioning and task scheduling BY CONSTRUCTION — a SUM of hashes
    * would overflow ANSI longs and a concat would be order-fragile. One
    * keyed rollup over the split/shard assignment (both md5-derived,
    * append-stable like [[assignSplits]]); at 100 TB this is the same
    * one-pass shape as any census, and verifying a delivered shard is
    * re-running one aggregate over it. */
  /** Leakage audit: for each split-assignment method, how many near-dup
    * pairs straddle a split boundary — the measurement that makes
    * [[leakageSafeSplits]]' guarantee a NUMBER instead of a claim
    * (per_cluster must audit to 0 straddling pairs on any input; per_doc
    * shows the contamination a naive split ships). Two keyed ride-back
    * joins per method over the pair list — pair-bounded, corpus-invariant
    * given the pairs. */
  def leakageAudit(docs: DataFrame, pairs: DataFrame,
      valPct: Int = 10, testPct: Int = 10): DataFrame = {
    val p = graft.RunHygiene.stage(pairs.select("doc_a", "doc_b"))
    p.count() // both method audits read it
    def straddle(assign: DataFrame, name: String) = p
      .join(assign.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(assign.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("n_straddling"))
      .select(lit(name).as("method"), col("n_pairs"),
        col("n_straddling").cast("long").as("n_straddling"),
        expr("n_straddling * 1000000L div nullif(n_pairs, 0L)").as("straddle_micro"))
    straddle(assignSplits(docs, valPct, testPct).select("doc_id", "split"), "per_doc")
      .unionAll(straddle(
        leakageSafeSplits(docs, pairs, valPct, testPct).select("doc_id", "split"),
        "per_cluster"))
      .orderBy("method")
  }

  def shardManifest(docs: DataFrame, nShards: Int = 8,
      valPct: Int = 10, testPct: Int = 10): DataFrame = {
    val split = assignSplits(docs, valPct, testPct).select("doc_id", "split")
    val shard = (conv(substring(md5(
        concat(lit("sh|"), col("doc_id").cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long") % nShards).as("shard")
    val ck = conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    docs.join(split, Seq("doc_id"))
      .select(col("split"), shard, col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_toks"), ck.as("ck"))
      .groupBy("split", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"),
        bit_xor(col("ck")).as("checksum60"))
      .withColumn("n_tokens", col("n_tokens").cast("long"))
      .orderBy("split", "shard")
  }

  /** Packing-efficiency audit of [[packSequences]] — the metric a training
    * team actually reads off a packed release: per shard, how much of the
    * token budget is real data (tail waste = the unfilled remainder of the
    * last pack) and how many documents STRADDLE a pack boundary (straddled
    * docs are the attention-contamination candidates a boundary-respecting
    * packer would have to pad away — this audit prices that trade).
    *
    * Pure integer arithmetic over the packing layout (token counts,
    * ceiling division, boundary comparisons) — nothing to quantize.
    *
    * Scale shape: re-derives the layout with the same one-window pass as
    * the packer, then ONE shard-keyed combinable aggregate. */
  def packAudit(docs: DataFrame, maxTokens: Int = 512,
      docsPerShard: Int = 1000): DataFrame = {
    val packed = packSequences(docs, maxTokens, docsPerShard)
    packed.groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum((col("pack_offset") + col("n_tokens") > maxTokens).cast("long"))
          .as("straddle_docs"))
      .withColumn("total_tokens", col("total_tokens").cast("long"))
      .withColumn("n_packs",
        expr(s"CAST((total_tokens + ${maxTokens - 1}) DIV $maxTokens AS BIGINT)"))
      .withColumn("tail_waste_tokens",
        expr(s"n_packs * $maxTokens - total_tokens"))
      .withColumn("fill_micro",
        expr(s"total_tokens * 1000000L div nullif(n_packs * $maxTokens, 0L)"))
      .withColumn("straddle_micro",
        expr("straddle_docs * 1000000L div nullif(n_docs, 0L)"))
      .select("shard", "n_docs", "n_packs", "total_tokens",
        "tail_waste_tokens", "fill_micro", "straddle_docs", "straddle_micro")
      .orderBy("shard")
  }

  /** Preference-pair construction for DPO/RLHF-style tuning: near-duplicate
    * document pairs where the two sides differ in quality score become
    * (chosen, rejected) training pairs — the same content expressed better
    * vs worse, which is exactly the contrast a preference objective wants
    * (pairing two UNRELATED documents teaches topic preference, not quality
    * preference; the near-dup constraint holds content fixed).
    *
    * chosen = the strictly-higher-quality side ([[TextOps.qualityScore]],
    * ROUND(4)-pinned, so "strictly higher" is engine-exact); equal-quality
    * and null-quality (empty-doc) pairs are dropped — no tie-break
    * masquerading as signal. `margin` is the rounded score gap, usable
    * downstream as a confidence weight or curriculum key.
    *
    * Scale shape: pairs come from the SimHash sketch equality join
    * ([[Dedup.simhashPairs]] — sketch-keyed, never all-pairs); quality is
    * a per-row kernel joined back by doc_id twice (both keyed joins, and
    * the quality side prunes to (doc_id, score) before the join). Output
    * is pair-bounded. */
  def preferencePairs(docs: DataFrame): DataFrame = {
    val q = TextOps.qualityScore(docs).select(col("doc_id"), col("quality_score"))
    Dedup.simhashPairs(docs)
      .join(q.select(col("doc_id").as("doc_a"), col("quality_score").as("qa")), "doc_a")
      .join(q.select(col("doc_id").as("doc_b"), col("quality_score").as("qb")), "doc_b")
      .filter(col("qa").isNotNull && col("qb").isNotNull && col("qa") =!= col("qb"))
      .select(
        when(col("qa") > col("qb"), col("doc_a")).otherwise(col("doc_b")).as("chosen_doc"),
        when(col("qa") > col("qb"), col("doc_b")).otherwise(col("doc_a")).as("rejected_doc"),
        when(col("qa") > col("qb"), col("qa")).otherwise(col("qb")).as("chosen_score"),
        when(col("qa") > col("qb"), col("qb")).otherwise(col("qa")).as("rejected_score"))
      .withColumn("margin", round(col("chosen_score") - col("rejected_score"), 4))
      .orderBy("chosen_doc", "rejected_doc")
  }
}
