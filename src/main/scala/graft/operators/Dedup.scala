package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Document deduplication for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: nothing here ever builds the O(n²) pair matrix. Candidate
  * pairs come from inverted-index joins (shared shingle / shared LSH band /
  * equal sketch), so the shuffles are keyed on content-derived values whose
  * fan-out is bounded by true duplication, not corpus size.
  *
  * Hashing is md5-based so the DuckDB oracle computes bit-identical
  * signatures — no engine-native hash functions.
  */
object Dedup {

  /** Exact dedup by content hash: one hash-aggregate, returns one row per
    * duplicate group with its canonical (minimum) doc_id. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("group_size"))
      .orderBy("content_hash")

  /** N-gram (shingle) Jaccard dedup as a prefix-filtered set-similarity
    * join (the All-Pairs/PPJoin family): candidates come from an inverted
    * index over each document's *prefix* — its first |A| − ⌈t·|A|⌉ + 1
    * shingles under a global (doc-frequency, shingle) order — and survivors
    * are verified exactly.
    *
    * The prefix filter is LOSSLESS at threshold t: J(A,B) ≥ t implies
    * |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, and two sets overlapping that much must
    * share an element inside both prefixes under any common total order
    * (Bayardo et al., WWW'07) — so the output is identical to the full
    * inverted-index join, and the DuckDB oracle keeps the simple
    * formulation.
    *
    * This shape is what survives 100 TB: a stopword-like shingle appearing
    * in k documents contributes k² candidate pairs to a plain
    * inverted-index self-join (quadratic in the hottest posting list), but
    * frequency-ascending prefixes systematically exclude hot shingles, so
    * candidate volume tracks true near-duplication instead of token
    * popularity.
    *
    * Envelope (measured, PLANS.md two-decade table): candidate volume is
    * lower-bounded by the TRUE near-dup pairs any exact algorithm must
    * verify, so on a corpus where every document has ~50
    * shared-shingle siblings the verify shuffle is ~100× a decade denser
    * and single-box disk becomes the limit (a cluster spreads the spill;
    * the shape is unchanged). For such duplication-saturated corpora the
    * banded [[minhashLsh]] is the scale tool — band buckets cap candidates
    * regardless of sibling count, at the cost of threshold-boundary
    * exactness. */
  def ngramJaccard(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
      maxCandidateEstimate: Long = 2_000_000_000L): DataFrame =
    ngramJaccardFrom(TextOps.withShingles(docs, n), threshold, maxCandidateEstimate)

  /** [[ngramJaccard]] over an ALREADY-SHINGLED frame (doc_id, sh) — the
    * session shares ONE tokenize+shingle pass across the three n=3
    * consumers (exact prefix-join, banded LSH, containment) instead of
    * each re-deriving it (round-16, guide §1.2). Expression-identical to
    * [[ngramJaccard]] on the same shingles. */
  def ngramJaccardFrom(shingled: DataFrame, threshold: Double = 0.5,
      maxCandidateEstimate: Long = 2_000_000_000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the shingle table feeds candidate generation and verification —
    // staged so tokenize+shingle runs once (reused as-is when the caller
    // hands in the session-shared checkpoint)
    val sh = graft.RunHygiene.stageOrReuse(shingled)
    // Prefix build in TWO window passes over the exploded shingle table —
    // df(shingle) as COUNT() OVER (PARTITION BY shingle) replaces the old
    // groupBy+equijoin (same values, one shuffle and one join fewer): shuffle by
    // shingle for the frequency, shuffle by doc for the rank, done.
    val wShingle = Window.partitionBy("shingle")
    val wDoc = Window.partitionBy("doc_id").orderBy("dfreq", "shingle")
    // persisted: the prefix feeds BOTH sides of the candidate self-join —
    // without it the frequency + rank windows run twice. rn (the shingle's
    // position in the doc's frequency-ascending order) and sz ride along to
    // power the PPJoin-style filters below.
    val prefix = graft.RunHygiene.stage(
      sh.select(col("doc_id"), size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))
        .withColumn("dfreq", count(lit(1)).over(wShingle))
        .withColumn("rn", row_number().over(wDoc))
        .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
        .select("doc_id", "shingle", "sz", "rn"))
    // materialized BEFORE the self-join: its two input stages run
    // concurrently, and each would compute the unfilled cache independently
    prefix.count()
    // Density escape hatch (automated — the round-7 verdict asked for more
    // than a prose note): estimate the candidate volume from the prefix
    // posting lists BEFORE launching the self-join. Per shingle the join
    // emits at most (posting length) × (entries satisfying the index-prefix
    // bound) pairs — one cheap aggregate over the already-staged prefix. A
    // duplication-saturated corpus (every doc with dozens of true
    // near-dup siblings) blows past any box's shuffle envelope in the
    // CANDIDATE join itself, so the guard fails fast with the hand-off
    // directive instead of spilling for an hour and dying on disk.
    val idxOk = (col("rn") <=
      col("sz") - ceil(lit(2 * threshold / (1 + threshold)) * col("sz")) + 1).cast("long")
    val estRow = prefix.withColumn("idx_ok", idxOk)
      .groupBy("shingle").agg(count(lit(1)).as("c"), sum(col("idx_ok")).as("ci"))
      .agg(sum(col("c") * col("ci")).as("est")).head()
    val candEstimate = if (estRow.isNullAt(0)) 0L else estRow.getLong(0)
    // one greppable line per run: the envelope number a capacity planner
    // (and the PLANS.md scaling table) wants without re-deriving it
    System.err.println(s"[graft] ngramJaccard candidate estimate: $candEstimate" +
      s" (guard at $maxCandidateEstimate)")
    if (candEstimate > maxCandidateEstimate)
      throw new IllegalStateException(
        s"ngramJaccard candidate estimate $candEstimate exceeds maxCandidateEstimate " +
          s"$maxCandidateEstimate: the corpus is duplication-dense enough that the " +
          "exact prefix-join's candidate set would exhaust the shuffle envelope. " +
          "Use Dedup.minhashLsh (band buckets cap candidates regardless of sibling " +
          "count) or raise maxCandidateEstimate on a cluster with the disk for it.")
    // Candidate pruning, all three filters lossless w.r.t. exact
    // verification (the smallest common shingle s₁ of a qualifying pair
    // satisfies every condition, so each pair survives at least once):
    //  - length filter: J ≥ t forces min(|A|,|B|) ≥ t·max(|A|,|B|);
    //  - positional (PPJoin) filter: a shared shingle at positions (i, j) of
    //    the common frequency-ascending order bounds the overlap by
    //    (common before) + (common at/after) ≤ (min(i,j)−1) +
    //    (min(szA−i, szB−j)+1), which must reach the J ≥ t requirement
    //    ⌈t/(1+t)·(szA+szB)⌉;
    //  - index-prefix (AllPairs/PPJoin role asymmetry): for the SMALLER doc
    //    y of the pair, α ≥ 2t/(1+t)·|y|, so s₁ must sit within y's first
    //    |y| − ⌈2t/(1+t)·|y|⌉ + 1 shingles — at t = 0.5 that shrinks the
    //    effective prefix of one side from sz/2 to sz/3, and candidate
    //    volume is Σ (probe-posting × index-posting) per shingle.
    // A popularity-only collision dies here instead of riding two
    // array-joins into the verify kernel.
    val overlapReq = ceil(lit(threshold / (1 + threshold)) * (col("a.sz") + col("b.sz")))
    val overlapUb = least(col("a.rn"), col("b.rn")) - 1 +
      least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) + 1
    val aIsSmall = col("a.sz") < col("b.sz") ||
      (col("a.sz") === col("b.sz") && col("a.doc_id") < col("b.doc_id"))
    val smallRn = when(aIsSmall, col("a.rn")).otherwise(col("b.rn"))
    val smallSz = when(aIsSmall, col("a.sz")).otherwise(col("b.sz"))
    val indexBound =
      smallRn <= smallSz - ceil(lit(2 * threshold / (1 + threshold)) * smallSz) + 1
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")) >=
            ceil(lit(threshold) * greatest(col("a.sz"), col("b.sz"))) &&
          overlapUb >= overlapReq && indexBound)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .distinct()
    // sizes already ride the candidates (and the length filter already ran),
    // so verification skips its two size-lookup joins
    verifyPairsSized(candidates, sh.select("doc_id", "sh"), threshold)
  }

  /** Incremental (cross-corpus) near-dedup: which NEW documents are
    * Jaccard-≥-t near-duplicates of an EXISTING corpus — the daily-crawl
    * shape: dedup the day's batch against yesterday's survivors without
    * re-pairing the existing corpus against itself. Complements
    * [[contaminationPairs]] (containment against a small benchmark list):
    * here both sides are corpora and the measure is symmetric Jaccard.
    *
    * Same lossless machinery as [[ngramJaccard]] — one SHARED
    * frequency-ascending order over the union (a prefix filter is only
    * lossless when both sides rank shingles identically), probe prefixes on
    * BOTH sides (the smallest common shingle of a qualifying pair lies in
    * each side's prefix independently), then the length / positional /
    * smaller-side index-prefix prunes, then exact merge-count verification.
    *
    * Scale: candidate volume is Σ(new-prefix posting × existing-prefix
    * posting) per shingle — proportional to the NEW batch's duplication
    * against the corpus, never corpus². In production the existing side's
    * ranked prefix index is write-once per snapshot (append-stable: document
    * frequencies drift slowly and the order only needs consistency, so a
    * snapshot's index serves until the next compaction); here the snapshot
    * is rebuilt per call — as a RUN-SCOPED [[buildIncrementalIndex]] the
    * probe then reads, so the rebuild path and the persisted-index path are
    * ONE machine and the rebuild prices exactly build + probe. (The retired
    * union-order implementation ranked dfreq with an un-combinable
    * count-over-window across the full exploded union — measured ~2× the
    * build+probe cost at sf0.1 for the identical verified output; the
    * shared order was the union's rather than the snapshot's, but the
    * prefix filter is lossless under ANY shared total order and exact
    * verification erases the candidate-set difference.) */
  def incrementalNearDups(newDocs: DataFrame, existing: DataFrame, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    // run-scoped UUID tree, registered for end-of-query cleanup: fresh UUID
    // paths are never overwritten, so un-registered they leak the full
    // staged index into tmpdir on every call (round-10 advice)
    val runIdx = graft.RunHygiene.scratch(existing.sparkSession,
      java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_incr_rebuild_" + java.util.UUID.randomUUID.toString.take(8)).toString)
    buildIncrementalIndex(existing, runIdx, n, threshold)
    incrementalNearDupsIndexed(newDocs, runIdx, n, threshold)
  }

  /** Write-once ranked prefix index of an EXISTING corpus snapshot — the
    * production shape [[incrementalNearDups]]'s scaladoc promises: the
    * daily-crawl user builds this ONCE per corpus snapshot and every
    * incremental batch reads it, instead of re-shingling and re-ranking
    * the whole corpus per batch. Layout under `path`:
    *  - `dfreq/`  (shingle, dfreq): the snapshot's shingle → doc-frequency
    *    map — the total order BOTH sides rank under from now on;
    *  - `prefix/` (doc_id, shingle, sz, rn): the corpus's prefix postings
    *    under that order;
    *  - `arrays/` (doc_id, sz, shs): sorted shingle arrays for the exact
    *    verify join.
    * Build cost is the one-time analogue of the rebuild path's existing
    * side: one tokenize+shingle pass, one shingle-keyed aggregate, one
    * doc-keyed rank window — all shuffle-bounded, nothing quadratic. */
  // ---- index manifest -------------------------------------------------
  // The live (dfreq, prefix) trees are resolved through ONE generation
  // pointer in `manifest.json`; compaction writes the next generation's
  // trees beside the live ones and swaps by ATOMIC manifest rewrite
  // (round-10 verdict #3 — the previous delete+rename pair could expose a
  // mixed order to a concurrent probe). A reader resolves the generation
  // ONCE per probe, so it sees one consistent order; the PREVIOUS
  // generation is retained through each compaction, so a probe that
  // resolved just before the swap keeps reading intact trees. On an
  // object store the same pointer is a conditional PUT; here the paths
  // are filesystem-local and java.nio's ATOMIC_MOVE is the rename(2)
  // guarantee. `arrays/` is generation-free: append-only, never ranked.

  /** Live generation of an index tree set — [[IndexManifest]] delegates
    * kept as local names so call sites and specs read naturally. */
  private[graft] def indexGeneration(path: String): Int =
    IndexManifest.generation(path)

  private[graft] def treePath(path: String, tree: String, gen: Int): String =
    IndexManifest.treePath(path, tree, gen)

  /** The live tree path a probe should read right now — spec/debug hook. */
  def resolvedTreePath(path: String, tree: String): String =
    if (tree == "arrays") s"$path/arrays"
    else treePath(path, tree, indexGeneration(path))

  private def writeManifest(path: String, gen: Int): Unit =
    IndexManifest.write(path, gen)

  def buildIncrementalIndex(existing: DataFrame, path: String, n: Int = 3,
      threshold: Double = 0.5): Unit = IndexManifest.withWriterLock(path) {
    import org.apache.spark.sql.expressions.Window
    graft.functions.TextExpressions.register(existing.sparkSession, n)
    val sh = graft.RunHygiene.stage(
      existing.select(col("doc_id"),
          call_function(s"word_ngrams_distinct_$n", TextOps.tokens(col("text"))).as("sh"))
        .filter(size(col("sh")) > 0))
    sh.count()
    val exploded = sh.select(col("doc_id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("shingle"))
    exploded.groupBy("shingle").agg(count(lit(1)).as("dfreq"))
      .write.mode("overwrite").parquet(treePath(path, "dfreq", 0))
    val dfreqBack = existing.sparkSession.read.parquet(treePath(path, "dfreq", 0))
    val wDoc = Window.partitionBy("doc_id").orderBy("dfreq", "shingle")
    exploded.join(dfreqBack, Seq("shingle"))
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("doc_id", "shingle", "sz", "rn")
      .write.mode("overwrite").parquet(treePath(path, "prefix", 0))
    sh.select(col("doc_id"), size(col("sh")).as("sz"), array_sort(col("sh")).as("shs"))
      .write.mode("overwrite").parquet(s"$path/arrays")
    // manifest last: the index is live only once its trees are complete
    writeManifest(path, 0)
  }

  /** Index MAINTENANCE, part 1: append a survivor batch to a snapshot
    * index under the snapshot's FROZEN (dfreq, shingle) order — the
    * daily-crawl write path (the [[graft.operators.Similarity]] IVF
    * append discipline: quantizer frozen, postings extended). The batch's
    * shingles rank with the snapshot frequency, unseen shingles at
    * frequency ZERO rank first — the same rarest-first extension the
    * probe path uses, so every index doc (base or appended) and every
    * probe rank under ONE total order and the prefix filter stays
    * lossless (Bayardo et al.: any shared total order works). dfreq/ is
    * deliberately NOT touched: refreshing it here would re-rank nothing
    * but future writes and silently break the ALREADY-WRITTEN base
    * prefixes' order consistency — frequency refresh is exactly what
    * [[compactIncrementalIndex]] is for. Batches must be doc_id-disjoint
    * from the snapshot (the caller's dedup contract).
    *
    * Cost: shingle the batch, one broadcast-shaped dfreq lookup join, one
    * batch-keyed rank window, two parquet appends — all ∝ batch size,
    * never corpus. */
  def appendToIncrementalIndex(newDocs: DataFrame, path: String, n: Int = 3,
      threshold: Double = 0.5): Unit = IndexManifest.withWriterLock(path) {
    import org.apache.spark.sql.expressions.Window
    val spark = newDocs.sparkSession
    graft.functions.TextExpressions.register(spark, n)
    // resolve the live generation ONCE: the batch ranks under, and its
    // prefixes append to, one consistent tree pair
    val gen = indexGeneration(path)
    val dfreq = spark.read.parquet(treePath(path, "dfreq", gen))
    val sh = graft.RunHygiene.stage(
      newDocs.select(col("doc_id"),
          call_function(s"word_ngrams_distinct_$n", TextOps.tokens(col("text"))).as("sh"))
        .filter(size(col("sh")) > 0))
    sh.count() // prefix write and arrays write share one shingle pass
    val wDoc = Window.partitionBy("doc_id").orderBy("dfreq", "shingle")
    sh.select(col("doc_id"), size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))
      .join(dfreq, Seq("shingle"), "left")
      .withColumn("dfreq", coalesce(col("dfreq"), lit(0L)))
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("doc_id", "shingle", "sz", "rn")
      .write.mode("append").parquet(treePath(path, "prefix", gen))
    sh.select(col("doc_id"), size(col("sh")).as("sz"), array_sort(col("sh")).as("shs"))
      .write.mode("append").parquet(s"$path/arrays")
  }

  /** Index MAINTENANCE, part 2: the COMPACTION the snapshot scaladocs
    * promise ("a snapshot's index serves until the next compaction").
    * After enough appends the frozen order drifts from the true corpus
    * frequencies — appended-only shingles all sit at rank-first zero, so
    * prefixes over-select and candidate volume creeps up. Compaction
    * re-derives dfreq from the index's OWN arrays/ tree (no re-tokenize —
    * the sorted shingle sets are already materialized), re-ranks every
    * prefix under the refreshed order, and swaps the dfreq/ and prefix/
    * trees in place; arrays/ needs no rewrite. The refreshed order is
    * again ONE total order shared by all docs and future probes, so
    * losslessness is preserved by construction.
    *
    * The swap is ONE atomic manifest rewrite (round-10 verdict #3): the
    * next generation's trees are written beside the live ones, the
    * pointer flips, and the PREVIOUS generation is retained so a probe
    * that resolved the old generation just before the flip still reads
    * intact, order-consistent trees — no reader can ever observe a mixed
    * dfreq/prefix pairing. Generations older than the previous one are
    * pruned (bounded at two on disk). Cost: one scan of arrays/, one
    * shingle-keyed aggregate, one doc-keyed rank window — the build's
    * cost without the tokenize pass. */
  def compactIncrementalIndex(spark: SparkSession, path: String,
      threshold: Double = 0.5): Unit = IndexManifest.withWriterLock(path) {
    import org.apache.spark.sql.expressions.Window
    val gen = indexGeneration(path)
    val next = gen + 1 // legacy (-1) compacts into generation 0
    val arrays = graft.RunHygiene.stage(spark.read.parquet(s"$path/arrays"))
    arrays.count() // dfreq census + re-rank both explode it
    val exploded = arrays.select(col("doc_id"), col("sz"), explode(col("shs")).as("shingle"))
    exploded.groupBy("shingle").agg(count(lit(1)).as("dfreq"))
      .write.mode("overwrite").parquet(treePath(path, "dfreq", next))
    val dfreqBack = spark.read.parquet(treePath(path, "dfreq", next))
    val wDoc = Window.partitionBy("doc_id").orderBy("dfreq", "shingle")
    exploded.join(dfreqBack, Seq("shingle"))
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("doc_id", "shingle", "sz", "rn")
      .write.mode("overwrite").parquet(treePath(path, "prefix", next))
    writeManifest(path, next) // the atomic swap — readers flip here
    // prune everything older than the retained previous generation (the
    // shared helper sweeps from legacy upward, so a crash between a prior
    // swap and its prune cannot strand a generation forever)
    IndexManifest.prune(spark, path, Seq("dfreq", "prefix"), next - 2)
  }

  /** Compaction CADENCE evidence (round-10 verdict #8): the measurable a
    * "compact when candidate volume exceeds k× baseline" rule keys on,
    * computed end-to-end on the real index lifecycle. Splits the corpus
    * md5-style (base ≥'8', appended ['4','8'), probe <'4'), builds the
    * snapshot, appends the batch under the FROZEN order, and counts the
    * probe's prefix-filter candidates per phase:
    *  - `appended`: appended-only shingles all rank first at frequency
    *    zero, so prefixes over-select — candidate volume creeps above the
    *    refreshed baseline (the drift [[appendToIncrementalIndex]]
    *    documents);
    *  - `compacted`: after the dfreq refresh + re-rank, the same probe's
    *    candidate volume is the build-time ratio again.
    * Emits one row per phase with exact integer counts and a floor-div
    * micro-ratio, so the DuckDB twin (which replays BOTH rank orders from
    * scratch) must match bit-for-bit. The pre-compaction probe resolves
    * generation 0 and stays valid across the in-function swap because the
    * manifest retains the previous generation. Verified PAIRS are
    * phase-invariant (both orders are lossless) — that is the existing
    * `dedup_incremental_compacted` gate; THIS gate prices the waste. */
  def compactionCadence(docs: DataFrame, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    val h = substring(md5(col("doc_id").cast("string")), 1, 1)
    val idx = graft.RunHygiene.scratch(spark,
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_cadence_" + java.util.UUID.randomUUID.toString.take(8)).toString)
    buildIncrementalIndex(docs.filter(h >= "8"), idx, n, threshold)
    appendToIncrementalIndex(docs.filter(h >= "4" && h < "8"), idx, n, threshold)
    // one staged shingle pass serves BOTH phase probes — only the resolved
    // index generation differs between them
    val probeSh = stagedShingles(docs.filter(h < "4"), n)
    val before = indexProbeWith(probeSh, idx, threshold) // generation 0 (retained)
    compactIncrementalIndex(spark, idx, threshold)
    val after = indexProbeWith(probeSh, idx, threshold) // generation 1
    def phaseRow(tag: String, p: IndexProbe): DataFrame =
      p.candidates.agg(count(lit(1)).cast("long").as("n_candidates"))
        .crossJoin(p.sh.agg(count(lit(1)).cast("long").as("n_probe_docs")))
        .select(lit(tag).as("phase"), col("n_candidates"), col("n_probe_docs"),
          expr("n_candidates * 1000000 div nullif(n_probe_docs, 0)")
            .cast("long").as("cand_per_doc_micro"))
    phaseRow("appended", before).unionByName(phaseRow("compacted", after))
      .orderBy("phase")
  }

  /** [[incrementalNearDups]] against a PERSISTED snapshot index
    * ([[buildIncrementalIndex]]) instead of a rebuilt one — the daily-crawl
    * production path: per batch, only the NEW side is shingled and ranked;
    * the existing side is three parquet scans.
    *
    * Order note: the new batch ranks under the SNAPSHOT's (dfreq, shingle)
    * order — seen shingles take the snapshot frequency, unseen ones are
    * frequency ZERO and rank FIRST. Rarest-first is load-bearing at scale,
    * not a convention: ranking unseen shingles last (tried first) evicts
    * each new doc's most discriminative shingles from its prefix and fills
    * it with corpus-common fat-posting shingles instead — candidate volume
    * balloons quadratically on a duplication-dense corpus (the 100×
    * measurement OOM'd the verify join before this fix; PLANS.md round-8
    * rows). The prefix filter is lossless under ANY total order shared by
    * both sides (Bayardo et al., WWW'07) — existing-side ranks are
    * unchanged by the extension since snapshot docs contain no unseen
    * shingles — so the candidate SET differs from the rebuild path's
    * union-order set, but both are lossless supersets of the true pairs
    * and exact verification makes the final output IDENTICAL — the
    * `dedup_incremental_indexed` gate hash-matches `dedup_incremental`
    * through the same oracle SQL. */
  /** A probe's staged shingles and its prefix-filtered candidate pairs
    * against the index generation that was live at construction time —
    * the shared substrate of [[incrementalNearDupsIndexed]] (which
    * verifies the candidates exactly) and the compaction-cadence gate
    * (which counts them per phase: candidate volume is the measurable the
    * compaction decision keys on). */
  private[graft] final case class IndexProbe(sh: DataFrame, candidates: DataFrame)

  /** The probe side's staged distinct-shingle frame — factored out so a
    * caller probing the SAME docs against several index generations (the
    * cadence gate) tokenizes and stages once, not once per probe. */
  private[graft] def stagedShingles(docs: DataFrame, n: Int): DataFrame = {
    graft.functions.TextExpressions.register(docs.sparkSession, n)
    val sh = graft.RunHygiene.stage(
      docs.select(col("doc_id"),
          call_function(s"word_ngrams_distinct_$n", TextOps.tokens(col("text"))).as("sh"))
        .filter(size(col("sh")) > 0))
    sh.count()
    sh
  }

  private[graft] def indexProbe(newDocs: DataFrame, indexPath: String, n: Int = 3,
      threshold: Double = 0.5): IndexProbe =
    indexProbeWith(stagedShingles(newDocs, n), indexPath, threshold)

  private[graft] def indexProbeWith(sh: DataFrame, indexPath: String,
      threshold: Double): IndexProbe = {
    import org.apache.spark.sql.expressions.Window
    val spark = sh.sparkSession
    // ONE manifest read fixes the generation for the whole probe: dfreq
    // and prefix always come from the same tree pair, and a compaction
    // that swaps mid-probe cannot mix orders (the resolved generation's
    // trees are retained through the next swap)
    val gen = indexGeneration(indexPath)
    val dfreq = spark.read.parquet(treePath(indexPath, "dfreq", gen))
    val exPrefix = spark.read.parquet(treePath(indexPath, "prefix", gen))
    val wDoc = Window.partitionBy("doc_id").orderBy("dfreq", "shingle")
    val newPrefix = sh.select(col("doc_id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("shingle"))
      .join(dfreq, Seq("shingle"), "left")
      .withColumn("dfreq", coalesce(col("dfreq"), lit(0L)))
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("doc_id", "shingle", "sz", "rn")
    val overlapReq = ceil(lit(threshold / (1 + threshold)) * (col("a.sz") + col("b.sz")))
    val overlapUb = least(col("a.rn"), col("b.rn")) - 1 +
      least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) + 1
    val aIsSmall = col("a.sz") <= col("b.sz") // ties: either side qualifies
    val smallRn = when(aIsSmall, col("a.rn")).otherwise(col("b.rn"))
    val smallSz = when(aIsSmall, col("a.sz")).otherwise(col("b.sz"))
    val indexBound =
      smallRn <= smallSz - ceil(lit(2 * threshold / (1 + threshold)) * smallSz) + 1
    val candidates = newPrefix.as("a").join(exPrefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          least(col("a.sz"), col("b.sz")) >=
            ceil(lit(threshold) * greatest(col("a.sz"), col("b.sz"))) &&
          overlapUb >= overlapReq && indexBound)
      .select(col("a.doc_id").as("new_doc_id"), col("b.doc_id").as("existing_doc_id"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .distinct()
    IndexProbe(sh, candidates)
  }

  def incrementalNearDupsIndexed(newDocs: DataFrame, indexPath: String, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val spark = newDocs.sparkSession
    graft.functions.HashExpressions.registerIntersect(spark)
    val probe = indexProbe(newDocs, indexPath, n, threshold)
    val exArrays = spark.read.parquet(s"$indexPath/arrays")
    val sortedN = probe.sh.select(col("doc_id").as("new_doc_id"),
      array_sort(col("sh")).as("sh_a"))
    val sortedE = exArrays.select(col("doc_id").as("existing_doc_id"),
      col("shs").as("sh_b"))
    probe.candidates
      .join(sortedN, Seq("new_doc_id"))
      .join(sortedE, Seq("existing_doc_id"))
      .withColumn("inter", call_function("sorted_intersect_count", col("sh_a"), col("sh_b")))
      .withColumn("jaccard_raw",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard_raw") >= threshold)
      .select(col("new_doc_id"), col("existing_doc_id"),
        round(col("jaccard_raw"), 4).as("jaccard"))
      .orderBy("new_doc_id", "existing_doc_id")
  }

  /** Containment-similarity pairs: C(A,B) = |A∩B| / min(|A|,|B|) ≥ t — the
    * asymmetric complement of [[ngramJaccard]]: a short document quoted
    * wholesale inside a long one scores C ≈ 1 while its Jaccard is tiny,
    * so this is the operator that catches doc-in-doc duplication
    * (quote-expansion, boilerplate wrappers, prompt-in-completion leaks).
    *
    * Candidate generation is the asymmetric prefix filter: if C ≥ t with
    * |A| ≤ |B|, then |A∩B| ≥ ⌈t·|A|⌉, and a shared set avoiding A's
    * frequency-ascending prefix of length |A| − ⌈t·|A|⌉ + 1 would fit in
    * the remaining ⌈t·|A|⌉ − 1 shingles — contradiction. So prefix(probe)
    * ⨝ FULL(index) is lossless with each doc probing by its own size;
    * running every doc in both roles through one join covers every pair.
    * Hot shingles still stay out of prefixes (rare-first ordering), so
    * candidate volume is bounded by prefix×posting products, not posting².
    * Verification reuses the merge-count kernel with the min-size
    * denominator; the raw value gates the threshold, rounding only the
    * output (the [[ngramJaccard]] boundary-exactness rule). */
  def containmentPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame =
    containmentPairsFrom(TextOps.withShingles(docs, n), threshold)

  /** [[containmentPairs]] over an already-shingled frame — see
    * [[ngramJaccardFrom]]. */
  def containmentPairsFrom(shingled: DataFrame, threshold: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.HashExpressions.registerIntersect(shingled.sparkSession)
    val sh = graft.RunHygiene.stageOrReuse(shingled)
    // Ranked inverted index in two window passes (the [[ngramJaccard]]
    // build): df(shingle) as COUNT() OVER, rank rn per doc under the global
    // (dfreq, shingle) order. Staged once — it serves BOTH join roles.
    val wShingle = Window.partitionBy("shingle")
    val wDoc = Window.partitionBy("doc_id").orderBy("dfreq", "shingle")
    val ranked = graft.RunHygiene.stage(
      sh.select(col("doc_id"), size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))
        .withColumn("dfreq", count(lit(1)).over(wShingle))
        .withColumn("rn", row_number().over(wDoc))
        .select("doc_id", "shingle", "sz", "rn"))
    ranked.count() // materialized before the self-join fans it out twice
    // Role asymmetry (round 7 — halves the old every-doc-probes-everything
    // join): the smallest common shingle s₁ of a qualifying pair always sits
    // inside the SMALLER doc's probe prefix (else common ≤ ⌈t·min⌉ − 1 < α),
    // so only the smaller side probes, and it probes the full index of
    // strictly-(sz, id)-larger docs. The per-row positional bound
    // min(i,j)−1 + min(szP−i, szF−j)+1 ≥ ⌈t·szP⌉ (szP = the min size) prunes
    // collisions that cannot reach the containment threshold — both filters
    // lossless, verification is exact.
    val prefix = ranked
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col("doc_id").as("p_doc"), col("shingle"),
        col("sz").as("p_sz"), col("rn").as("p_rn"))
    val overlapReq = ceil(lit(threshold) * col("p_sz"))
    val overlapUb = least(col("p_rn"), col("f_rn")) - 1 +
      least(col("p_sz") - col("p_rn"), col("f_sz") - col("f_rn")) + 1
    val candidates = prefix.join(
        ranked.select(col("doc_id").as("f_doc"), col("shingle").as("f_shingle"),
          col("sz").as("f_sz"), col("rn").as("f_rn")),
        col("shingle") === col("f_shingle") && col("p_doc") =!= col("f_doc") &&
          (col("p_sz") < col("f_sz") ||
            (col("p_sz") === col("f_sz") && col("p_doc") < col("f_doc"))))
      .filter(overlapUb >= overlapReq)
      .select(least(col("p_doc"), col("f_doc")).as("doc_a"),
        greatest(col("p_doc"), col("f_doc")).as("doc_b"),
        when(col("p_doc") < col("f_doc"), col("p_sz")).otherwise(col("f_sz")).as("sz_a"),
        when(col("p_doc") < col("f_doc"), col("f_sz")).otherwise(col("p_sz")).as("sz_b"))
      .distinct()
    val sorted = sh.select(col("doc_id"), array_sort(col("sh")).as("shs"))
    candidates
      .join(sorted.select(col("doc_id").as("doc_a"), col("shs").as("sh_a")), Seq("doc_a"))
      .join(sorted.select(col("doc_id").as("doc_b"), col("shs").as("sh_b")), Seq("doc_b"))
      .withColumn("c_raw",
        call_function("sorted_intersect_count", col("sh_a"), col("sh_b")).cast("double") /
          least(col("sz_a"), col("sz_b")))
      .filter(col("c_raw") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("c_raw"), 4).as("containment"))
      .orderBy("doc_a", "doc_b")
  }

  /** Universal-hash family for MinHash: one md5 per shingle (its first 8 hex
    * digits as a base integer), then cheap arithmetic permutations
    * hᵢ(x) = (aᵢ·x + bᵢ) mod p — the classic a·x+b construction. One digest
    * per shingle instead of one per (shingle × signature), ~numHashes×
    * cheaper, still engine-portable (the DuckDB oracle embeds the same
    * seeds). */
  val MinhashPrime: Long = 2147483647L // 2^31 − 1
  val MinhashSeeds: Seq[(Long, Long)] = (0 until 12).map { i =>
    ((1103515245L * (i + 1) + 12345L) % MinhashPrime,
      (69069L * (i + 7) + 1234567L) % MinhashPrime)
  }

  /** MinHash + LSH banding. Signatures are grouped into `bands` keys of
    * `rowsPerBand` hashes each; docs sharing any band key become candidates;
    * candidates are verified with exact Jaccard.
    *
    * With 4 bands × 3 rows, a pair at Jaccard 0.8 is caught with
    * probability 1-(1-0.8³)⁴ ≈ 0.96; at 0.3 almost never — the classic
    * LSH S-curve. The banding join shuffles on band keys only.
    *
    * The (4, 3) DEFAULT is the point the MEASURED curve picked, not just
    * the textbook one: the standing [[lshScurve]] calibration gate breaks
    * detection out by true-Jaccard decile, and on this corpus family every
    * true pair sits in the top decile (sf0.01: 25/25 detected, decile 9,
    * measured 10000 bp vs 9995 analytic — PLANS.md round-10 row). Where
    * the near-dup mass lives, the (4,3) curve is ≥ 0.9995; trading toward
    * (6,2) would buy recall in deciles 4-6 that hold zero true pairs here,
    * while its 2-row band keys inflate low-similarity candidate volume
    * (P(collide | s=0.2) rises 0.6% → 21.7%) — pure verify-stage cost. If
    * a future corpus shows sub-0.9 duplicate mass, [[lshScurve]]'s decile
    * table is the evidence that re-picks (b, r); with the 12-hash
    * signature the menu is (2,6) (3,4) (4,3) (6,2) (12,1). */
  def minhashLsh(docs: DataFrame, n: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.5): DataFrame =
    minhashLshFrom(TextOps.withShingles(docs, n), bands, rowsPerBand, threshold)

  /** [[minhashLsh]] over an already-shingled frame — see
    * [[ngramJaccardFrom]]. The hv hash column is derived here (it is
    * minhash-specific), but the tokenize+shingle pass is the shared one. */
  def minhashLshFrom(shingled: DataFrame, bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    graft.functions.HashExpressions.register(shingled.sparkSession)
    // persisted: read by the banding pass and by both verify join sides
    val sh = graft.RunHygiene.stage(shingled
      .withColumn("hv", transform(col("sh"), x =>
        conv(substring(md5(x.cast("binary")), 1, 8), 16, 10).cast("long") % MinhashPrime)))

    // the full 12-value signature in ONE codegen'd traversal of hv (the
    // per-position array_min(transform(...)) form re-traverses hv once per
    // position, interpreted — measured 64 s vs ~6 s at sf0.1). Projected to
    // its own column so the band keys below reference an attribute.
    val sig = sh.select(col("doc_id"),
      call_function("minhash_sig", col("hv")).as("sig"))
    def bandKey(b: Int): Column =
      concat_ws("_", (0 until rowsPerBand).map(j =>
        element_at(col("sig"), b * rowsPerBand + j + 1)): _*)

    val banded = sig.select(col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandKey(b).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))

    // bucket-local pair expansion instead of a banded self-join: one pass
    // over the banding table; each bucket's candidate pairs are generated
    // in-place (buckets are near-dup groups, so the per-bucket quadratic is
    // the true output size, not an artifact)
    val ids = col("ids")
    val candidates = banded.groupBy("band", "key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(ids) > 1)
      .select(explode(flatten(transform(
        sequence(lit(0), size(ids) - 2),
        i => transform(slice(ids, i + 2, size(ids)),
          b => struct(element_at(ids, i + 1).as("doc_a"), b.as("doc_b")))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
    verifyPairs(candidates, sh.select("doc_id", "sh"), threshold)
  }

  /** Join candidate pairs back to their shingle sets and keep those at or
    * above the Jaccard threshold.
    *
    * Verify kernel: arrays are sorted once per DOC, then each pair costs
    * one codegen'd O(|A|+|B|) merge count (`sorted_intersect_count`) — the
    * per-pair hash-set `array_intersect` built allocations on the path
    * executed once per candidate (~400k candidates at sf0.1, measured
    * ~4.5 s → sub-second). A size-ratio prune runs first: J ≥ t implies
    * min(|A|,|B|) ≥ t·max(|A|,|B|), so incompatible sizes never reach the
    * merge. Output identical to the array_intersect form. */
  private def verifyPairs(candidates: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    // size-ratio prune BEFORE the array fetch: J ≥ t implies
    // min(|A|,|B|) ≥ t·max(|A|,|B|), and the sizes join moves two ints per
    // candidate where the array join moves whole shingle sets — prune on
    // the cheap join, fetch arrays only for survivors
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("sz"))
    val pruned = candidates
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")))
    verifyPairsSized(pruned, sh, threshold)
  }

  /** [[verifyPairs]] for candidates that already carry `sz_a`/`sz_b` (and
    * have passed the size-ratio prune at candidate-join time): only the two
    * shingle-array joins and the merge-count kernel remain. */
  private def verifyPairsSized(candidates: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    graft.functions.HashExpressions.registerIntersect(sh.sparkSession)
    val sorted = sh.select(col("doc_id"), array_sort(col("sh")).as("shs"))
    candidates
      .join(sorted.select(col("doc_id").as("doc_a"), col("shs").as("sh_a")), Seq("doc_a"))
      .join(sorted.select(col("doc_id").as("doc_b"), col("shs").as("sh_b")), Seq("doc_b"))
      .withColumn("inter", call_function("sorted_intersect_count", col("sh_a"), col("sh_b")))
      // filter on the RAW jaccard, round only the output column: the prefix
      // filter and size prune guarantee recall exactly for J ≥ t, so a
      // rounded filter (J ≥ t − 5e-5 after ROUND) would admit boundary
      // pairs the candidate generation is allowed to miss — the oracle
      // filters raw identically (one division of identical ints is
      // IEEE-exact on both engines)
      .withColumn("jaccard_raw",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard_raw") >= threshold)
      .withColumn("jaccard", round(col("jaccard_raw"), 4))
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** 16-bit SimHash over distinct tokens. Token hash = first 4 hex chars of
    * md5 as an int; bit b of the sketch is the sign of Σ(2·bit_b(hash)−1).
    * Equal sketches (Hamming distance 0 buckets) are the near-dup
    * candidates; one narrow map + no shuffle for the sketch itself.
    * Computed by the compiled [[graft.functions.Simhash16]] kernel — the
    * 16-lambda `aggregate()` formulation it replaces is pinned equal in
    * DedupPropertySpec. */
  def simhash(docs: DataFrame): DataFrame = {
    graft.functions.TextExpressions.registerSimhash(docs.sparkSession)
    TextOps.withTokens(docs)
      .select(col("doc_id"), call_function("simhash16", col("toks")).as("simhash16"))
      .orderBy("doc_id")
  }

  /** Dedup clusters from a near-dup pair list (doc_a < doc_b): iterative
    * min-label propagation — every node adopts the smallest doc_id reachable
    * from it; converges in O(cluster diameter) rounds (near-dup clusters are
    * shallow, so a handful). Returns (doc_id, cluster_id); the cluster_id is
    * the canonical (minimum) member, i.e. the doc a dedup pass keeps.
    *
    * Each round is two shuffles (join + min-aggregate) over the pair graph —
    * no driver-side graph state, so it scales with edges, not with cluster
    * count. */
  def dedupClusters(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // persist AND materialize the pair input before the bidirectional union:
    // the two union branches scan p concurrently inside one job, and an
    // unmaterialized cache makes both branches compute the upstream
    // candidate plan (often an expensive dedup pass) — count() first means
    // one compute, then two cache reads
    // p/edges/every round's frame are ALSO registered with RunHygiene: on
    // the non-convergence throw below nothing after it runs, and the
    // runner's drain must still release whatever the loop materialized
    // (double-unpersist of the frames cleaned up here is a no-op).
    // An input the CALLER already persisted (the session-shared simhash
    // pair graph) is used as-is: re-persisting it here and unpersisting
    // below would silently evict the caller's cache for every later
    // consumer.
    val pre = graft.RunHygiene.preMaterialized(pairs)
    val p = if (pre) pairs else graft.RunHygiene.track(pairs.persist(lvl))
    if (!pre) p.count()
    val edges = graft.RunHygiene.track(
      p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .distinct()
        .persist(lvl))
    edges.count()
    if (!pre) p.unpersist()
    // each round carries prev alongside the new label, so convergence is a
    // filter-count on the just-persisted frame — no second join per round.
    // Init fuses the first propagation hop: label₀ = min(self, neighbors) in
    // ONE aggregation over the edge list, so clique-shaped graphs (equal-
    // sketch buckets, the common dedup case) converge at init and the loop
    // runs a single no-change round instead of propagate + confirm.
    var cached = graft.RunHygiene.track(edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("cluster_id"))
      .select(col("src").as("doc_id"), col("cluster_id").as("prev"), col("cluster_id"))
      .persist(lvl))
    var labels = cached.select("doc_id", "cluster_id")
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("cluster_id").as("nb_label")), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nb_label")).as("nb_min"))
      // localCheckpoint, not persist: `next` references `labels` twice
      // (through neighborMin and directly), so lineage DOUBLES per round —
      // a high-diameter component (a near-dup chain from a drifting
      // template) makes the logical plan exponential in rounds and the
      // driver OOMs on plan handling alone long before data is a problem
      // (caught round 9 by the 12-node-chain spec; clique-shaped graphs
      // converge at init and never exposed it). Checkpointing truncates
      // lineage to the materialized blocks each round.
      val next = graft.RunHygiene.track(labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("cluster_id").as("prev"),
          least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id"))).as("cluster_id"))
        .localCheckpoint(true))
      val changed = next.filter(col("cluster_id") =!= col("prev")).count()
      cached.unpersist()
      cached = next
      labels = next.select("doc_id", "cluster_id")
      converged = changed == 0
      iter += 1
    }
    // a silently-unconverged result is WRONG (labels above the true
    // component minimum); fail loudly — component diameter > maxIter means
    // the caller should raise maxIter (or the graph is pathological)
    if (!converged)
      throw new IllegalStateException(
        s"dedupClusters did not converge within $maxIter rounds — component diameter exceeds maxIter")
    edges.unpersist()
    labels.orderBy("doc_id")
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the second formulation of [[dedupClusters]]' fixpoint,
    * gated through the SAME oracle because min-label components are the
    * unique answer regardless of the algorithm that reaches it (the
    * FIFO-matcher three-formulation discipline applied to graphs).
    *
    * Why carry both: min-label propagation converges in O(diameter)
    * rounds and every round moves the FULL label frame; the alternating
    * algorithm converges in O(log² n) rounds and each round REWIRES the
    * edge set toward a star forest — high-diameter chain/mesh components
    * (near-dup chains from drifting templates) cost it logarithmic rounds
    * where propagation pays the diameter. This is the 100-TB CC standard.
    *
    * Round shape: large-star connects each node's strictly-larger
    * neighbors to its neighborhood minimum (after it, every edge points
    * larger → smaller); small-star re-points each larger-endpoint
    * neighborhood at its minimum. Both are one keyed aggregate + one
    * keyed join over the edge frame — no label frame exists at all until
    * the final star-forest readout. Convergence = empty symmetric
    * difference of consecutive edge sets (two keyed anti-joins), checked
    * on materialized frames. */
  def dedupClustersStar(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // same pre-persisted-input guard as dedupClusters: never evict a
    // session-shared pair graph
    val pre = graft.RunHygiene.preMaterialized(pairs)
    val p = if (pre) pairs else graft.RunHygiene.track(pairs.persist(lvl))
    if (!pre) p.count()
    val nodes = graft.RunHygiene.track(
      p.select(col("doc_a").as("id")).unionByName(p.select(col("doc_b").as("id")))
        .distinct().persist(lvl))
    nodes.count()
    // edges oriented larger → smaller from the start (hi, lo)
    var e = graft.RunHygiene.track(
      p.select(greatest(col("doc_a"), col("doc_b")).as("hi"),
          least(col("doc_a"), col("doc_b")).as("lo"))
        .filter(col("hi") =!= col("lo")).distinct().persist(lvl))
    e.count()
    if (!pre) p.unpersist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star over the FULL neighborhood: m = min(N⁺(u)); every
      // neighbor v > u re-points at m
      val bidir = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = bidir.groupBy("u").agg(least(col("u"), min(col("v"))).as("m"))
      val afterLarge = bidir.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
      // small-star over the (now all-smaller) neighborhoods of each hi:
      // every member of N ∪ {hi} re-points at the minimum.
      // localCheckpoint (not persist): each round's plan references the
      // previous frame FOUR times (bidir twice, the pair explode twice),
      // so lineage grows ~4× per round — a dozen rounds of a high-diameter
      // chain make the logical tree exponential and plan stringification
      // alone OOMs. Checkpointing truncates lineage to the materialized
      // blocks; determinism is unaffected (same rows, same ops).
      val smins = afterLarge.groupBy("hi").agg(min(col("lo")).as("m"))
      val next = graft.RunHygiene.track(afterLarge.join(smins, "hi")
        .select(explode(array(
          struct(col("lo").as("a"), col("m").as("b")),
          struct(col("hi").as("a"), col("m").as("b")))).as("x"))
        .select(col("x.a").as("hi"), col("x.b").as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
        .localCheckpoint(true))
      val changed =
        next.join(e, Seq("hi", "lo"), "left_anti").count() +
          e.join(next, Seq("hi", "lo"), "left_anti").count()
      e.unpersist()
      e = next
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"dedupClustersStar did not converge within $maxIter rounds")
    // converged: e is a star forest (each hi points at its component min);
    // roots carry their own id
    val parent = e.groupBy(col("hi").as("doc_id")).agg(min(col("lo")).as("cluster_id"))
    nodes.join(parent, nodes("id") === parent("doc_id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Quality-aware survivor selection over near-dup clusters: instead of
    * the min-id survivor convention ([[dedupClusters]]' cluster_id), each
    * cluster keeps its highest-quality member — what production curation
    * actually does (near-dups differ by boilerplate/truncation, and
    * keeping the cleanest copy beats keeping the first-crawled one).
    * Survivor = max (quality_score, ties to the lowest doc_id); emitted
    * rows are the REMOVED members, each pointing at its survivor — the
    * same removed-rows contract as chunk-level dedup.
    *
    * Shape: cluster labels are edge-bound; the quality join is one
    * doc_id-keyed exchange; rank and survivor share one cluster-keyed
    * window whose partition size is a cluster's member count — bounded by
    * content duplication, not corpus size. Null quality (empty docs)
    * sorts last identically on both engines (explicit NULLS LAST).
    *
    * Output: (doc_id, cluster_id, quality_score, survivor_doc,
    * survivor_quality), ordered by doc_id. */
  def keepBest(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val clusters = dedupClusters(pairs)
    val q = TextOps.qualityScore(docs).select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality_score").desc_nulls_last, col("doc_id"))
    clusters.join(q, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .withColumn("survivor_doc", first(col("doc_id")).over(w))
      .withColumn("survivor_quality", first(col("quality_score")).over(w))
      .filter(col("rk") >= 2)
      .select("doc_id", "cluster_id", "quality_score",
        "survivor_doc", "survivor_quality")
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: training documents sharing ≥ `minShared`
    * word n-grams with any probe (benchmark/eval) document — the
    * train-test contamination check every training-data pipeline runs
    * before shipping a corpus (the n-gram overlap criterion of the
    * GPT-3/PaLM decontamination appendices, exact rather than hashed).
    *
    * Shape: the probe corpus's distinct shingles form the inverted index
    * (probes are benchmark-sized — orders of magnitude smaller than the
    * training corpus), the training side streams through one equi-join on
    * shingle, and one count-aggregate per (train, probe) pair scores the
    * overlap. Shuffles are keyed on shingles; nothing is quadratic in the
    * training corpus — fan-out per training shingle is its frequency in
    * the PROBE set, bounded by benchmark size. */
  def contaminationPairs(docs: DataFrame, probes: DataFrame, n: Int = 3,
      minShared: Int = 3): DataFrame = {
    val trainSh = TextOps.withShingles(docs, n)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    val probeSh = TextOps.withShingles(probes, n)
      .select(col("doc_id").as("probe_id"), explode(col("sh")).as("shingle"))
    trainSh.join(probeSh, Seq("shingle"))
      .groupBy("doc_id", "probe_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared && col("doc_id") =!= col("probe_id"))
      .orderBy("doc_id", "probe_id")
  }

  /** Local-overlap near-dup pairs from shared winnowing fingerprints
    * (MOSS-style): two docs sharing ≥ `minShared` fingerprints contain
    * matching token runs (any shared run of ≥ n+w−1 tokens is guaranteed
    * to surface — the winnowing property), which global-signature schemes
    * like MinHash can miss for partial plagiarism/quoting. Inverted-index
    * equi-join on fingerprint, count per pair — fingerprints are window
    * minima of content hashes, so no posting list concentrates the way a
    * stopword shingle does. */
  def winnowPairs(docs: DataFrame, n: Int = 3, w: Int = 4, minShared: Int = 2): DataFrame = {
    val fp = graft.RunHygiene.stage(TextOps.winnowFingerprints(docs, n, w))
    fp.count() // fill the cache once before the self-join's concurrent sides
    fp.as("a").join(fp.as("b"),
        col("a.fingerprint") === col("b.fingerprint") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  /** Cross-document exact substring-span dedup (the suffix-array family of
    * Lee et al. 2021 "Deduplicating Training Data Makes Language Models
    * Better", re-expressed hash-blocked for Spark): find every token span
    * of ≥ `minSpanTokens` that occurs verbatim in at least two DISTINCT
    * documents, and emit per document the MAXIMAL removal spans
    * (doc_id, span_start, span_end, span_len, n_windows; positions
    * 1-based, token units) after merging overlapping/adjacent flagged
    * windows. Within-document-only repetition is deliberately not flagged
    * (this is the cross-doc operator; policy for which copy to keep is
    * downstream's).
    *
    * Shape — no suffix array, same guarantee: a repeated span of length
    * s ≥ L contains s−L+1 repeated L-windows, so flagging every L-window
    * whose content recurs in another doc and merging adjacent flags
    * reconstructs exactly the maximal repeated spans.
    *  1. corpus pass: compiled [[graft.functions.SpanHashes]] kernel →
    *     (doc_id, pos, hv) per L-window, hv a 60-bit md5-derived hash;
    *  2. census: hashes seen in ≥2 distinct docs — min(doc_id) ≠
    *     max(doc_id) per hv, a plain map-side-combinable MIN/MAX aggregate
    *     (no count-distinct expand), then an hv-keyed semi-join back;
    *  3. verify: candidate positions re-derive their gram strings (one
    *     doc_id-keyed join against the token table — strings shuffle only
    *     for the candidate slice, never the whole corpus) and must agree
    *     on (hv, gram) across ≥2 docs, so hash collisions cannot produce
    *     a false span: the result is EXACT;
    *  4. merge: per-doc gaps-and-islands window (break when
    *     pos > prev + L), one keyed shuffle on doc_id.
    * Candidate volume is inverted-index bounded: posting lists are per
    * 60-bit content hash, so nothing concentrates except true duplication,
    * and stage 3+ touch only flagged positions. */
  def substringSpans(docs: DataFrame, minSpanTokens: Int = 8): DataFrame = {
    val L = minSpanTokens
    graft.functions.TextExpressions.registerSpanHashes(docs.sparkSession, L)
    val toks = TextOps.withTokens(docs).select(col("doc_id"), col("toks"))
    val pos = graft.RunHygiene.stage(
      toks.filter(size(col("toks")) >= L)
        .select(col("doc_id"),
          posexplode(call_function(s"span_hashes_$L", col("toks"))))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
          col("col").as("hv")))
    pos.count() // fill the cache once: the census and the join-back both read it
    val repeated = pos.groupBy("hv")
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1")).select("hv")
    val cand = pos.join(repeated, Seq("hv"))
    val grams = graft.RunHygiene.stage(cand.join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("pos"), col("hv"),
        concat_ws(" ", slice(col("toks"), col("pos").cast("int"), lit(L))).as("gram")))
    grams.count() // fill once: feeds both the verify census and the join-back
    val verified = grams.groupBy("hv", "gram")
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1")).select("hv", "gram")
    val vpos = grams.join(verified, Seq("hv", "gram")).select("doc_id", "pos")
    val wOrd = Window.partitionBy("doc_id").orderBy("pos")
    vpos
      .withColumn("brk",
        when(col("pos") > lag(col("pos"), 1).over(wOrd) + L, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (L - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"),
        col("n_windows"))
      .orderBy("doc_id", "span_start")
  }

  /** Content-defined chunking (the rsync/LBFS/FastCDC family): chunk
    * boundaries fall where a `w`-char windowed Karp-Rabin hash hits
    * `H % divisor == 0`, so boundaries are a function of local CONTENT,
    * not offset — the same passage shared by two documents chunks
    * identically even when an insertion shifts it (fixed-size chunking
    * loses every boundary after the edit; [[substringSpans]] needs token
    * alignment). This is how crawl re-snapshots dedup at the storage
    * layer: shared chunks across near-identical page versions collapse in
    * the chunk census.
    *
    * Plan shape: chunking is pure per-row HOF map work (O(len·w) integer
    * ops per doc, no UDF — everything stays inside codegen); the census
    * is ONE keyed shuffle on the chunk value with map-side combine. At
    * 100 TB: chunk rows ≈ corpus_bytes / divisor, each a (chunk, ids)
    * key — the same shuffle-bounded shape as [[exactDups]] one level
    * below document granularity. Emitted: chunks seen ≥ 2 times (the
    * dedup signal) with occurrence and document counts.
    *
    * Determinism: the window hash is exact integer arithmetic (powers of
    * 31 mod 2³¹−1, precomputed power array — identical literals in the
    * DuckDB twin); docs shorter than `w` become one whole-doc chunk; the
    * final position is always a boundary. */
  def cdcChunkRows(docs: DataFrame, window: Int = 8, divisor: Int = 32): DataFrame = {
    graft.functions.TextExpressions.registerCdc(docs.sparkSession, window, divisor)
    // boundary positions from the compiled O(len) rolling kernel
    // (CdcBoundaries — semantics pinned to the DuckDB twin's HOF spec;
    // the interpreted HOF formulation cost O(len·w) lambda dispatches and
    // ran 15 s at sf0.1, the kernel runs it in under a second); staged as
    // a column so chunk extraction zips ends with starts
    val withBounds = docs.select(col("doc_id"), col("text"),
      call_function(s"cdc_bounds_${window}_$divisor", col("text")).as("bnds"))
    val chunks =
      """zip_with(
        |  concat(array(0L), slice(bnds, 1, size(bnds) - 1)),
        |  bnds,
        |  (s, e) -> substring(text, cast(s + 1 as int), cast(e - s as int)))""".stripMargin
    withBounds.select(col("doc_id"), explode(expr(chunks)).as("chunk"))
  }

  /** Standing recall/precision audit of the banded-LSH dedup path against
    * the exact prefix-filtered join — the dedup twin of
    * [[Similarity.recallEval]]: the two operators already run at the same
    * (n, threshold) with verified pairs, so their pair sets are directly
    * comparable. Precision is 1.0 by construction (LSH candidates are
    * exact-verified); recall measures what banding loses at the threshold
    * boundary — THE number a pipeline owner needs before swapping the
    * exact join for LSH on a duplication-dense corpus (the documented
    * ngramJaccard density escape hatch hands off to exactly this path).
    * Cost: the sum of the two audited operators; the comparison itself is
    * output-sized. */
  def lshRecallEval(docs: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame =
    lshRecallEvalFrom(ngramJaccard(docs, n, threshold),
      minhashLsh(docs, n, threshold = threshold))

  /** [[lshRecallEval]] over ALREADY-COMPUTED pair frames — the production
    * audit shape: a pipeline audits the outputs it just materialized, it
    * never recomputes both operators to compare them. The gate wiring
    * passes the session-shared frames, so the audit's marginal cost is the
    * comparison (output-sized), not the two operators. */
  def lshRecallEvalFrom(exactPairs: DataFrame, lshPairs: DataFrame): DataFrame = {
    val exact = graft.RunHygiene.stage(exactPairs.select("doc_a", "doc_b"))
    exact.count() // read by the semi-join and its own count
    val lsh = graft.RunHygiene.stage(lshPairs.select("doc_a", "doc_b"))
    lsh.count()
    val common = lsh.join(exact, Seq("doc_a", "doc_b"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
      .crossJoin(common.agg(count(lit(1)).as("n_common")))
      .select(col("n_exact"), col("n_lsh"), col("n_common"),
        expr("n_common * 1000000L div nullif(n_exact, 0L)").as("recall_micro"),
        expr("n_common * 1000000L div nullif(n_lsh, 0L)").as("precision_micro"))
  }

  /** LSH S-curve calibration audit — [[lshRecallEval]]'s aggregate recall
    * broken out by Jaccard decile and set against the ANALYTIC banding
    * curve P(detect | s) = 1 − (1 − s^r)^b (Leskovec–Rajaraman–Ullman's
    * textbook S-curve for b bands of r rows): per decile of true
    * similarity, the measured detection rate in integer bp next to the
    * curve's prediction at the decile midpoint. This is the calibration
    * table that justifies a (b, r) choice — a decile whose measured rate
    * sits far below the curve means the signature family or the banding
    * is broken, long before aggregate recall notices.
    *
    * Determinism: constituents are the two gated operators; the decile
    * comes from the ROUND(4)-pinned jaccard; the analytic curve is a pure
    * multiplication chain (s³ via s·s·s, (1−s³)⁴ via two squarings — no
    * pow/libm), floored to integer bp. The b = 4, r = 3 powers are
    * hard-wired into that chain, so the parameters are asserted to match.
    *
    * Output: one row per populated decile — (decile, n_pairs, n_detected,
    * detect_bp, analytic_bp). */
  def lshScurve(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
      bands: Int = 4, rowsPerBand: Int = 3): DataFrame = {
    require(bands == 4 && rowsPerBand == 3,
      "the analytic multiplication chain is specialized to b=4, r=3")
    lshScurveFrom(ngramJaccard(docs, n, threshold),
      minhashLsh(docs, n, bands, rowsPerBand, threshold))
  }

  /** [[lshScurve]] over already-computed pair frames (the
    * [[lshRecallEvalFrom]] contract: `lshPairs` must come from the (4, 3)
    * banding the analytic chain is specialized to — the gate passes the
    * solver-derived frame, which picks exactly (4, 3) at threshold 0.5). */
  def lshScurveFrom(exactPairs: DataFrame, lshPairs: DataFrame): DataFrame = {
    val exact = graft.RunHygiene.stage(
      exactPairs.select("doc_a", "doc_b", "jaccard"))
    exact.count() // read by the join and the rollup
    val lsh = lshPairs
      .select(col("doc_a"), col("doc_b"), lit(1L).as("hit"))
    val g = exact.join(lsh, Seq("doc_a", "doc_b"), "left")
      .withColumn("decile",
        least(floor(col("jaccard") * 10), lit(9L)).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_detected"))
    val s = (col("decile").cast("double") + lit(0.5)) / lit(10.0)
    val q = lit(1.0) - s * s * s
    val q2 = q * q
    g.select(col("decile"), col("n_pairs"), col("n_detected"),
        expr("n_detected * 10000 div n_pairs").as("detect_bp"),
        floor((lit(1.0) - q2 * q2) * 10000).cast("long").as("analytic_bp"))
      .orderBy("decile")
  }

  // ---- LSH parameter solver (round-11 verdict #5) ----

  /** Every (bands, rowsPerBand) factorization a signature length admits —
    * the menu [[minhashLsh]]'s scaladoc enumerates for the 12-hash
    * signature: (1,12) (2,6) (3,4) (4,3) (6,2) (12,1). */
  def lshCandidateParams(signatureLen: Int = MinhashSeeds.length): Seq[(Int, Int)] =
    (1 to signatureLen).filter(signatureLen % _ == 0)
      .map(b => (b, signatureLen / b))

  /** x^n by left-associated iterated multiplication: each step is ONE
    * correctly-rounded IEEE multiply, so the generated DuckDB twin (the
    * same expansion in SQL text) reproduces every double bit-for-bit —
    * library pow() carries no cross-engine rounding guarantee. */
  private def powIter(x: Double, n: Int): Double =
    (1 to n).foldLeft(1.0)((a, _) => a * x)

  /** The textbook banding S-curve: P(candidate | true similarity s) under
    * (b, r) banding = 1 − (1 − s^r)^b. */
  def lshDetectProb(s: Double, bands: Int, rowsPerBand: Int): Double =
    1.0 - powIter(1.0 - powIter(s, rowsPerBand), bands)

  /** One solver candidate, all facts floored to integer micro so the gate
    * and its DuckDB twin compare exactly: detection probability at the
    * target similarity, FP mass at target/2 (a clearly-non-dup pair
    * admitted to the verify stage), FN (miss) mass at (1+target)/2 (a
    * clearly-dup pair the banding never surfaces), and |P(target) − ½| as
    * the midpoint error (the S-curve midpoint is where P = ½; parameters
    * whose midpoint sits at the target split dup from non-dup there). */
  case class LshParamRow(bands: Long, rows_per_band: Long,
      detect_at_target_micro: Long, fp_at_low_micro: Long,
      fn_at_high_micro: Long, midpoint_err_micro: Long,
      eligible: Long, chosen: Long)

  private[graft] def lshParamRows(threshold: Double,
      signatureLen: Int = MinhashSeeds.length,
      maxFpLowMicro: Long = 200000L, maxFnHighMicro: Long = 200000L): Seq[LshParamRow] = {
    val low = threshold / 2
    val high = (1.0 + threshold) / 2
    val base = lshCandidateParams(signatureLen).map { case (b, r) =>
      val det = math.floor(lshDetectProb(threshold, b, r) * 1000000.0).toLong
      val fp = math.floor(lshDetectProb(low, b, r) * 1000000.0).toLong
      // miss mass directly as (1 − s^r)^b — one expression both engines share
      val fn = math.floor(powIter(1.0 - powIter(high, r), b) * 1000000.0).toLong
      (b, r, det, fp, fn, math.abs(det - 500000L))
    }
    val eligibleKeys = base.filter(c => c._4 <= maxFpLowMicro && c._5 <= maxFnHighMicro)
    val chosen = if (eligibleKeys.isEmpty) None
      else Some(eligibleKeys.minBy(c => (c._6, c._1)))
    base.map { c =>
      LshParamRow(c._1.toLong, c._2.toLong, c._3, c._4, c._5, c._6,
        if (c._4 <= maxFpLowMicro && c._5 <= maxFnHighMicro) 1L else 0L,
        if (chosen.contains(c)) 1L else 0L)
    }
  }

  /** Solve (bands, rowsPerBand) for a target Jaccard threshold: among the
    * signature's factorizations whose FP/FN masses are acceptable, the one
    * whose S-curve midpoint sits closest to the target (ties → fewer
    * bands: a smaller banding table). Falls back to the unconstrained
    * argmin if no candidate meets the masses (a too-short signature). At
    * the corpus default (0.5, 12 hashes) this picks exactly the measured
    * (4, 3) the [[lshScurve]] calibration standing gate validated —
    * the solver derives what round 10 hand-picked. */
  def solveLshParams(threshold: Double, signatureLen: Int = MinhashSeeds.length,
      maxFpLowMicro: Long = 200000L, maxFnHighMicro: Long = 200000L): (Int, Int) = {
    val rows = lshParamRows(threshold, signatureLen, maxFpLowMicro, maxFnHighMicro)
    val pick = rows.find(_.chosen == 1L)
      .getOrElse(rows.minBy(r => (r.midpoint_err_micro, r.bands)))
    (pick.bands.toInt, pick.rows_per_band.toInt)
  }

  /** [[minhashLsh]] with (bands, rows) DERIVED from the threshold by
    * [[solveLshParams]] instead of hand-picked — the overload the
    * standing `dedup_minhash_lsh` gate runs (at threshold 0.5 the solver
    * returns the same (4, 3), so the gate's output is unchanged and keeps
    * hash-matching its oracle). */
  def minhashLshAuto(docs: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val (b, r) = solveLshParams(threshold)
    minhashLsh(docs, n, b, r, threshold)
  }

  /** [[minhashLshAuto]] over an already-shingled frame — see
    * [[ngramJaccardFrom]]. */
  def minhashLshAutoFrom(shingled: DataFrame, threshold: Double = 0.5): DataFrame = {
    val (b, r) = solveLshParams(threshold)
    minhashLshFrom(shingled, b, r, threshold)
  }

  /** The solver's full candidate table as a one-row-per-factorization
    * gate (`dedup_lsh_params`): the DuckDB twin recomputes every
    * probability from the same expanded multiplication chains and
    * re-derives eligibility and the chosen row with the same integer
    * logic — a drifted formula, menu, or selection rule fails the hash. */
  def lshParamsGate(spark: SparkSession, threshold: Double = 0.5,
      signatureLen: Int = MinhashSeeds.length): DataFrame = {
    import spark.implicits._
    lshParamRows(threshold, signatureLen).toDF().orderBy("bands")
  }

  /** The chunk census over [[cdcChunkRows]]: chunks seen ≥ 2 times (the
    * dedup signal) with occurrence and document counts. */
  def cdcChunks(docs: DataFrame, window: Int, divisor: Int): DataFrame =
    cdcChunkRows(docs, window, divisor)
      .groupBy("chunk")
      .agg(count(lit(1)).as("n_occurrences"), countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_occurrences") >= 2)
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
      .select("chunk", "chunk_len", "n_occurrences", "n_docs")
      .orderBy("chunk")

  def cdcChunks(docs: DataFrame): DataFrame = cdcChunks(docs, 8, 32)

  /** Near-dup candidate groups from equal SimHash sketches. The sketch
    * frame feeds both self-join sides — persisted so the 16-bit aggregate
    * pass over the corpus runs once, not once per side. */
  def simhashPairs(docs: DataFrame): DataFrame = {
    val s = graft.RunHygiene.stage(simhash(docs))
    s.count() // fill the cache once before the self-join's concurrent sides
    s.as("a").join(s.as("b"),
        col("a.simhash16") === col("b.simhash16") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash16").as("simhash16"))
      .orderBy("doc_a", "doc_b")
  }
}
