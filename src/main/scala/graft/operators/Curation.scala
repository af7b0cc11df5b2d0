package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** The composed curation pass a training-data pipeline runs end-to-end:
  * quality filter → language filter → exact-dedup canonicalization, in that
  * order (filter first so canonical selection happens among survivors — a
  * high-quality duplicate of a filtered-out low-quality doc must survive).
  *
  * Plan shape: three narrow per-row derivations joined on doc_id (language
  * ID is the one shuffled vote), one hash-aggregate for canonical ids, one
  * semi join. Everything is keyed; nothing is quadratic; the whole pass is
  * a handful of shuffles regardless of corpus size.
  */
object Curation {

  /** Surviving documents with their curation metrics:
    * (doc_id, n_tokens, quality_score, predicted_lang). */
  def curate(docs: DataFrame, minQuality: Double = 0.3, minTokens: Int = 5,
      lang: String = "en"): DataFrame = {
    val quality = TextOps.qualityScore(docs)
      .select("doc_id", "n_tokens", "quality_score")
    val language = TextOps.languageId(docs)
      .select("doc_id", "predicted_lang")
    val filtered = docs.select("doc_id", "text")
      .join(quality, Seq("doc_id"))
      .join(language, Seq("doc_id"))
      .filter(col("quality_score") >= minQuality &&
        col("n_tokens") >= minTokens &&
        col("predicted_lang") === lang)
    // canonical = min doc_id per content hash AMONG SURVIVORS, as a window
    // over the filtered frame — one pass, no agg + self-semi-join (which
    // would evaluate the quality/language subplan twice)
    val byContent = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary")))
    filtered
      .withColumn("_canon", min(col("doc_id")).over(byContent))
      .filter(col("doc_id") === col("_canon"))
      .select("doc_id", "n_tokens", "quality_score", "predicted_lang")
      .orderBy("doc_id")
  }

  /** The v2 pass: the round-6 signal set composed onto the v1 gates —
    * a length BAND (packing-unfriendly giants out, not just shorts), an
    * n-gram novelty floor (templated/boilerplate docs down-weighted even
    * when no dedup pair fires), and a corpus-unigram log-prob floor
    * (rare-token noise out).
    *
    * Order matters and is the REVERSE of v1's: exact-dedup
    * canonicalization runs FIRST, signals second. Novelty is
    * corpus-relative — an exact-duplicate pair zeroes BOTH copies'
    * novelty, so filtering before canonicalizing would kill every copy
    * and keep none; computing signals over the deduplicated corpus keeps
    * exactly the canonical one. (v1's filter-first rationale doesn't
    * bite here: content-identical duplicates have identical
    * content-derived signals, so canonical choice can't strand a
    * would-have-survived copy.) Every signal is a doc_id-keyed
    * aggregate: the composition is one content-hash window + a chain of
    * co-keyed joins — nothing quadratic at any corpus size. All
    * threshold cuts compare ROUNDED signal values (the gate's
    * cross-engine convention).
    *
    * Output: survivors with their full signal vector. */
  def curateV2(docs: DataFrame, minQuality: Double = 0.3, minTokens: Int = 5,
      maxTokens: Int = 5000, lang: String = "en", minNovelty: Double = 0.1,
      minLogProb: Double = -3.45): DataFrame = {
    // the novelty signal's 5-gram shingles exist only for docs with ≥5
    // tokens, and the signal joins are inner — a lower floor would be
    // silently overridden by the join, so refuse it loudly
    require(minTokens >= 5,
      s"minTokens must be >= 5 (the novelty gate's shingle width), got $minTokens")
    val byContent = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary")))
    // staged: four signal operators each scan + re-derive the canonical
    // corpus otherwise (the dedup window would run four times)
    val canon = graft.RunHygiene.stage(docs.select("doc_id", "text")
      .withColumn("_canon", min(col("doc_id")).over(byContent))
      .filter(col("doc_id") === col("_canon"))
      .select("doc_id", "text"))
    canon.count()
    val quality = TextOps.qualityScore(canon)
      .select("doc_id", "n_tokens", "quality_score")
    val language = TextOps.languageId(canon)
      .select("doc_id", "predicted_lang")
    // 5-gram novelty, not the default 3: once a corpus outgrows its
    // template vocabulary every common trigram repeats somewhere and
    // 3-gram novelty saturates at 0 (measured: sf0.1 median 0.0 vs 5-gram
    // median 1.0), so an absolute floor only stays meaningful on shingles
    // long enough to be composition-specific
    val novelty = TextOps.noveltyStats(canon, n = 5)
      .select("doc_id", "novelty_ratio")
    val logprob = TextOps.unigramLogProb(canon)
      .select("doc_id", "avg_logprob")
    canon.select("doc_id")
      .join(quality, Seq("doc_id"))
      .join(language, Seq("doc_id"))
      .join(novelty, Seq("doc_id"))
      .join(logprob, Seq("doc_id"))
      .filter(col("quality_score") >= minQuality &&
        col("n_tokens").between(minTokens, maxTokens) &&
        col("predicted_lang") === lang &&
        col("novelty_ratio") >= minNovelty &&
        col("avg_logprob") >= minLogProb)
      .select("doc_id", "n_tokens", "quality_score", "predicted_lang",
        "novelty_ratio", "avg_logprob")
      .orderBy("doc_id")
  }

  /** The v3 pass: the round-7 cleaning/dedup/capping signals composed —
    * exact-dedup canonicalization FIRST (the v2 ordering lesson), then
    * doc-in-doc removal (each containment pair ≥ tau drops its CONTAINED
    * (smaller) side — its content survives inside the keeper; equal sizes
    * fall back to keep-lowest-id), then the per-row
    * gates (C4 rule verdicts + a PII/blocklist density ceiling), then an
    * absolute per-source cap ranked among survivors — so a whale domain
    * cannot refill the mix after the quality gates thin everyone else.
    *
    * Plan shape: one content-hash window, the containment operator's
    * inverted-index candidates (never pairwise), two narrow per-row
    * signal projections, one anti join, and the cap's WindowGroupLimit
    * rank — every shuffle keyed, nothing quadratic.
    *
    * Output: kept docs as (doc_id, source, n_tokens, sample_rank ≤ cap). */
  /** The stage prefix curateV3/V4/V5 SHARE: the exact-dedup canonical
    * corpus plus the three doc-keyed censuses v3 and v4 both consume (C4
    * verdict+sizes, the containment loser set at `tau`, the PII count).
    * Extracted so a session can build the prefix ONCE and run every
    * downstream pipeline against it — the `stages()` memo pattern
    * (round-9 verdict #7: each vN gate rebuilding the identical prefix
    * per call is recomputed work, and it grows with every composed
    * pipeline added).
    *
    * `sessionLived = false` (the default — standalone operator calls)
    * registers the frames with [[graft.RunHygiene]] so the caller's
    * post-action drain releases them; `true` (the bench/verify session
    * caches in SparkEntry) plain-persists them so they survive the
    * per-query drains for the session's lifetime. */
  final case class CurationShared(canon: DataFrame, c4: DataFrame,
      contained: DataFrame, pii: DataFrame)

  def sharedStages(docs: DataFrame, tau: Double = 0.8,
      sessionLived: Boolean = false): CurationShared = {
    def hold(df: DataFrame): DataFrame =
      if (sessionLived)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else graft.RunHygiene.stage(df)
    val byContent = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary")))
    // staged: containment, C4, and scrub each scan the canonical corpus.
    // lang rides along for v5 (harmless to v3/v4 — every consumer selects
    // its columns explicitly); a lang-less corpus gets a NULL column, the
    // honest value, rather than a required-column error
    val docsL =
      if (docs.columns.contains("lang")) docs
      else docs.withColumn("lang", lit(null).cast("string"))
    val canon = hold(docsL.select("doc_id", "text", "lang", "source")
      .withColumn("_canon", min(col("doc_id")).over(byContent))
      .filter(col("doc_id") === col("_canon"))
      .select("doc_id", "text", "lang", "source"))
    canon.count()
    val c4 = hold(TextOps.c4Filters(canon).select("doc_id", "n_tokens", "keep"))
    c4.count() // read by the containment sizes AND two downstream joins
    // doc-in-doc drop rule: the CONTAINED (smaller) side loses — its
    // content is inside the keeper; equal sizes are near-identical docs
    // and fall back to the keep-lowest-id convention
    val sizes = c4.select("doc_id", "n_tokens")
    val contained = hold(Dedup.containmentPairs(canon, threshold = tau)
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_tokens").as("ta")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_tokens").as("tb")), Seq("doc_b"))
      .select(when(col("ta") < col("tb"), col("doc_a"))
        .when(col("tb") < col("ta"), col("doc_b"))
        .otherwise(greatest(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct())
    val pii = hold(TextOps.scrubStats(canon).select(col("doc_id"),
      (col("n_urls") + col("n_emails") + col("n_blocklist")).as("n_pii")))
    CurationShared(canon, c4, contained, pii)
  }

  def curateV3(docs: DataFrame, tau: Double = 0.8, maxPii: Int = 2,
      cap: Int = 10): DataFrame =
    curateV3Shared(sharedStages(docs, tau), maxPii, cap)

  /** [[curateV3]] against an already-built shared prefix. */
  def curateV3Shared(sh: CurationShared, maxPii: Int = 2,
      cap: Int = 10): DataFrame = {
    val survivors = sh.canon.select("doc_id", "source")
      .join(sh.c4, Seq("doc_id"))
      .join(sh.pii, Seq("doc_id"))
      .join(sh.contained, Seq("doc_id"), "left_anti")
      .filter(col("keep") && col("n_pii") <= maxPii)
    Sampling.capPerGroup(survivors, "source", cap)
      .join(sh.c4.select("doc_id", "n_tokens"), Seq("doc_id"))
      .select(col("doc_id"), col("grp").as("source"), col("n_tokens"), col("sample_rank"))
      .orderBy("source", "sample_rank")
  }

  /** v4: the round-8 signals composed onto the [[curateV3]] skeleton —
    * Gopher rule verdicts (exact micro-integer metrics) as a second rule
    * family beside C4, and a CDC duplicated-chunk share ceiling: the
    * fraction of a document's characters sitting inside chunks that other
    * (canonical) documents also contain. This is the boilerplate screen
    * exact-dedup and containment both miss — a page that is 70% shared
    * navigation/template text with unique filler passes canonicalization
    * (hash differs) and containment (no single superset), but its
    * cross-document chunk share exposes it.
    *
    * Plan adds to v3: one compiled-kernel chunking pass over the
    * canonical corpus, one chunk-keyed census, one join back — all keyed,
    * nothing quadratic; the share is exact BIGINT micro-units. Output
    * schema unchanged from v3 (doc_id, source, n_tokens, sample_rank). */
  def curateV4(docs: DataFrame, tau: Double = 0.8, maxPii: Int = 2,
      cap: Int = 10, maxDupShareMicro: Long = 600000L): DataFrame =
    curateV4Shared(sharedStages(docs, tau), maxPii, cap, maxDupShareMicro)

  /** [[curateV4]] against an already-built shared prefix: only the two
    * v4-specific censuses (Gopher verdicts, CDC dup-chunk share) are
    * computed here. */
  def curateV4Shared(sh: CurationShared, maxPii: Int = 2,
      cap: Int = 10, maxDupShareMicro: Long = 600000L): DataFrame = {
    val gopher = TextOps.gopherRules(sh.canon)
      .select(col("doc_id"), col("keep").as("g_keep"))
    // CDC boilerplate share: chars inside chunks shared across canon docs
    val chunkRows = graft.RunHygiene.stage(Dedup.cdcChunkRows(sh.canon))
    chunkRows.count() // census + ride-back both read it
    val crossDoc = chunkRows.groupBy("chunk")
      .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") >= 2)
    val dupChars = chunkRows.join(crossDoc.select("chunk"), Seq("chunk"))
      .groupBy("doc_id").agg(sum(length(col("chunk"))).as("dup_chars"))
    val dupShare = sh.canon.select(col("doc_id"), length(col("text")).as("len"))
      .join(dupChars, Seq("doc_id"), "left")
      .select(col("doc_id"), expr(
        // empty doc: no chars, no duplicated chars — share 0, not a crash
        "coalesce(coalesce(dup_chars, 0L) * 1000000L div nullif(len, 0), 0L)")
        .as("dup_share_micro"))
    val survivors = sh.canon.select("doc_id", "source")
      .join(sh.c4, Seq("doc_id"))
      .join(gopher, Seq("doc_id"))
      .join(sh.pii, Seq("doc_id"))
      .join(dupShare, Seq("doc_id"))
      .join(sh.contained, Seq("doc_id"), "left_anti")
      .filter(col("keep") && col("g_keep") && col("n_pii") <= maxPii &&
        col("dup_share_micro") <= maxDupShareMicro)
    Sampling.capPerGroup(survivors, "source", cap)
      .join(sh.c4.select("doc_id", "n_tokens"), Seq("doc_id"))
      .select(col("doc_id"), col("grp").as("source"), col("n_tokens"), col("sample_rank"))
      .orderBy("source", "sample_rank")
  }

  /** Per-source data card — the datasheet a corpus release ships with
    * (Gebru et al., "Datasheets for Datasets"): volume (docs, tokens),
    * exact-duplication share, mean quality, and language-mix entropy, one
    * row per source. The numbers a consumer reads BEFORE deciding to mix a
    * source in — and the same censuses the curation passes already run,
    * rolled into one uniform report.
    *
    * Determinism: counts are integers; duplication share is integer micro
    * (1 − distinct md5 / docs); mean quality averages the ROUND(4)-pinned
    * kernel and re-rounds; entropy terms −(c/n)·ln(c/n) floor to integer
    * micro-nats PER LANGUAGE before the keyed sum (the token-entropy
    * discipline — order-free).
    *
    * Scale shape: three source-keyed combinable censuses (volume+quality,
    * distinct hashes, lang mix) joined on the source key — domain-sized
    * everywhere after the map-side combines. */
  def dataCard(docs: DataFrame): DataFrame = {
    val q = TextOps.qualityScore(docs).select(col("doc_id"), col("quality_score"))
    val base = docs.join(q, Seq("doc_id"))
    // mean quality in integer micro: each ROUND(4)-pinned score becomes an
    // exact 1e-4-unit integer first, so the mean is order-free integer
    // arithmetic (a float AVG's partial-sum order varies run to run)
    val vol = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextOps.tokens(col("text")))).cast("long").as("n_tokens"),
      countDistinct(md5(col("text").cast("binary"))).as("n_distinct"),
      sum(round(col("quality_score") * 10000).cast("long")).as("q4_sum"),
      count(col("quality_score")).as("q_n"))
      .withColumn("mean_quality_micro",
        expr("q4_sum * 100 div nullif(q_n, 0L)"))
    val langTerms = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")))
      .withColumn("term_micro",
        floor(-(col("c").cast("double") / col("n")) *
          log(col("c").cast("double") / col("n")) * 1e6).cast("long"))
    val ent = langTerms.groupBy("source")
      .agg(sum(col("term_micro")).as("lang_entropy_micro"),
        count(lit(1)).as("n_langs"))
    vol.join(ent, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("(n_docs - n_distinct) * 1000000L div nullif(n_docs, 0L)")
          .as("dup_share_micro"),
        col("mean_quality_micro"), col("n_langs"), col("lang_entropy_micro"))
      .orderBy("source")
  }

  /** Curation v5 — the round-9 signals composed: exact-dedup
    * canonicalization → DSIR target-likeness floor (drop the bottom
    * `dropBp` basis points by hashed-ngram importance weight — the
    * data-selection cut the published method exists for) → embedding-
    * space outlier removal (left join on the vector id; a doc without a
    * vector passes — the honest join semantics of a corpus where only
    * part of the data is embedded). Where v1–v4 gate on HEURISTIC
    * signals (quality rules, PII, containment), v5 gates on the two
    * MODEL-derived signals: distribution match and embedding geometry.
    *
    * Determinism: the canon window, the integer DSIR weights, and the
    * outlier screen are each individually gated operators; the floor is
    * one `percentile` over exact integer log-weights (≥ keeps the
    * boundary), and every join is keyed on the id.
    *
    * Scale shape: the constituents' shapes (each documented where it
    * lives) plus one 1-row threshold broadcast and two keyed joins —
    * composition adds nothing quadratic.
    *
    * Output: the kept manifest (doc_id, source, logratio_micro), ordered
    * by doc_id. */
  def curateV5(docs: DataFrame, embeddings: DataFrame,
      dropBp: Int = 2500): DataFrame = {
    val byContent = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary")))
    val canon = graft.RunHygiene.stage(docs
      .select("doc_id", "text", "lang", "source")
      .withColumn("_canon", min(col("doc_id")).over(byContent))
      .filter(col("doc_id") === col("_canon"))
      .select("doc_id", "text", "lang", "source"))
    canon.count() // read by the weights pass and the final manifest join
    curateV5Canon(canon, embeddings, dropBp)
  }

  /** [[curateV5]] against an already-canonicalized corpus (the shared
    * prefix's `canon` — v5 consumes only that member). */
  def curateV5Shared(sh: CurationShared, embeddings: DataFrame,
      dropBp: Int = 2500): DataFrame =
    curateV5Canon(sh.canon, embeddings, dropBp)

  private def curateV5Canon(canon: DataFrame, embeddings: DataFrame,
      dropBp: Int): DataFrame = {
    val w = graft.RunHygiene.stage(
      TextOps.dsirWeights(canon).select("doc_id", "logratio_micro"))
    w.count() // read by the threshold census and the manifest join
    val thr = broadcast(w.agg(
      expr(s"percentile(logratio_micro, ${dropBp / 10000.0})").as("q_floor")))
    val outl = Similarity.outlierScreen(embeddings)
      .select(col("vec_id").as("doc_id"), col("is_outlier"))
    canon.select("doc_id", "source")
      .join(w, Seq("doc_id"))
      .crossJoin(thr)
      .join(outl, Seq("doc_id"), "left")
      .filter(col("logratio_micro") >= col("q_floor") &&
        !coalesce(col("is_outlier"), lit(false)))
      .select(col("doc_id"), col("source"), col("logratio_micro"))
      .orderBy("doc_id")
  }
}
