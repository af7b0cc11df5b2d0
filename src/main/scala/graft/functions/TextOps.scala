package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Cross-engine portability rules (every op has a DuckDB oracle twin):
  * only integer arithmetic, string ops, md5, and single divisions of
  * identical integers — no transcendentals, no engine-specific hashes.
  * All are narrow per-row transformations: no shuffle except where a
  * groupBy/window is the semantic (language-ID vote).
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** (doc_id, text, toks): tokens projected into their own column FIRST.
    * Load-bearing for performance — expressions that reference `toks` many
    * times (shingling references it per n-gram index) must see an attribute,
    * not an inlined `split(text)`: CollapseProject keeps expensive
    * multi-referenced aliases in their own projection, so the split runs
    * once per row instead of once per downstream reference. */
  def withTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))

  /** Distinct word n-gram shingles over a pre-projected token column.
    * Guarded so short docs yield an empty set — Spark's `sequence(1, k)`
    * would count *down* for k<1. */
  def shinglesOf(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** (doc_id, sh): distinct n-gram shingle sets, docs with ≥n tokens.
    * Uses the compiled [[WordNgrams]] kernel (same strings, same
    * first-occurrence distinct order as [[shinglesOf]] — property-tested);
    * the declarative form dispatches an interpreted lambda per position on
    * the hottest corpus-pass path. */
  def withShingles(docs: DataFrame, n: Int = 3): DataFrame = {
    TextExpressions.register(docs.sparkSession, n)
    withTokens(docs)
      .select(col("doc_id"), call_function(s"word_ngrams_distinct_$n", col("toks")).as("sh"))
      .filter(size(col("sh")) > 0)
  }

  /** Compatibility single-Column form (tests, ad-hoc use) — prefer
    * [[withShingles]] in operators. */
  def shingles(text: Column, n: Int = 3): Column = shinglesOf(tokens(text), n)

  /** Per-doc token stats: count, unique count, type-token ratio. */
  def tokenStats(docs: DataFrame): DataFrame =
    withTokens(docs).select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_unique_tokens"))
      .withColumn("type_token_ratio",
        round(col("n_unique_tokens").cast("double") / col("n_tokens"), 4))
      .orderBy("doc_id")

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for")

  /** Quality scoring: length, punctuation ratio, stopword ratio, and a
    * simple bounded composite — the filter-stage signal of a data pipeline. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val stopCount = size(filter(col("toks"), t => t.isin(Stopwords.map(lit): _*)))
    val punctCount = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
    withTokens(docs).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        stopCount.cast("long").as("n_stopwords"),
        punctCount.cast("long").as("n_punct"))
      // ANSI-safe: an empty document (n_chars = 0) must yield null ratios,
      // not a DIVIDE_BY_ZERO crash — the oracle NULLIFs identically
      .withColumn("stopword_ratio", round(col("n_stopwords").cast("double") / col("n_tokens"), 4))
      .withColumn("punct_ratio",
        when(col("n_chars") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_punct").cast("double") / col("n_chars"), 4)))
      .withColumn("quality_score",
        round(least(col("n_tokens"), lit(200)).cast("double") / 200.0 *
          (lit(1.0) - col("punct_ratio")), 4))
      .orderBy("doc_id")
  }

  /** Capped inverted-index materialization — the search-index build step:
    * per term, document frequency, total term frequency, and the first
    * `cap` postings (doc_ids ascending) plus a truncation flag. The cap is
    * what makes the operator survive a whale term (a stopword's full
    * posting list IS the corpus): the per-term ranking carries a constant
    * limit, so WindowGroupLimit keeps top-`cap` selection inside each
    * map/reduce side and no term's docs ever sort whole — the
    * capPerGroup discipline. df/tf come from a full (map-side combinable)
    * aggregate over the same staged (term, doc) table, so the corpus
    * tokenizes once. Postings emit as a comma-joined string of
    * NUMERICALLY-sorted ids (both engines sort the integer list, then
    * render — integer→text is engine-identical).
    *
    * Output: (term, df, tf, postings, truncated), one row per vocab term. */
  def invertedIndex(docs: DataFrame, cap: Int = 20): DataFrame = {
    val td = graft.RunHygiene.stage(withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf_doc")))
    td.count() // fill once: stats and postings both read it
    val stats = td.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf_doc")).as("tf"))
    val w = Window.partitionBy("term").orderBy("doc_id")
    val postings = td
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= cap)
      .groupBy("term")
      .agg(sort_array(collect_list(col("doc_id"))).as("plist"))
      .select(col("term"),
        array_join(transform(col("plist"), x => x.cast("string")), ",").as("postings"))
    stats.join(postings, Seq("term"))
      .select(col("term"), col("df"), col("tf"), col("postings"),
        (col("df") > cap).as("truncated"))
      .orderBy("term")
  }

  /** Per-source percentile calibration of the quality score — the curation
    * step between scoring and thresholding: raw quality scores are not
    * comparable across domains (a mid-tier web page outscores a top-tier
    * code file on stopword ratio), so each document is re-expressed as its
    * percentile WITHIN its source and the keep rule cuts on that (CCNet
    * does exactly this with per-bucket perplexity thirds). Integer basis
    * points via (rank−1)·10000 div (n−1) — no float percent_rank
    * semantics to disagree on; single-doc sources sit at 0 by convention;
    * ties order by (score, doc_id) so both engines rank identically.
    * Unscored docs (null score: the empty-doc case) are excluded — a
    * percentile among nothing is undefined; the oracle filters the same.
    *
    * Shape: one keyed shuffle on source; the rank and count windows share
    * the partitioning. The per-source sort is the stratifiedSample whale
    * envelope: curation sources are low-cardinality but LARGE, so at
    * 100 TB the exact rank swaps for a fixed-grid histogram percentile
    * (same output contract, map-side combinable) — the exact form is the
    * gate-checkable twin.
    *
    * Output: (doc_id, source, quality_score, pct_rank_bp,
    * keep = top `keepBp` share of its source). */
  def qualityCalibrated(docs: DataFrame, keepBp: Int = 3000): DataFrame = {
    val q = qualityScore(docs).select(col("doc_id"), col("quality_score"))
    val joined = docs.select(col("doc_id"), col("source")).join(q, Seq("doc_id"))
      .filter(col("quality_score").isNotNull)
    val part = Window.partitionBy("source")
    val wRank = part.orderBy(col("quality_score"), col("doc_id"))
    joined
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("n_src", count(lit(1)).over(part))
      .withColumn("pct_rank_bp",
        when(col("n_src") === 1, lit(0L))
          .otherwise(expr("((rk - 1) * 10000) div (n_src - 1)")))
      .withColumn("keep", col("pct_rank_bp") >= lit((10000 - keepBp).toLong))
      .select("doc_id", "source", "quality_score", "pct_rank_bp", "keep")
      .orderBy("doc_id")
  }

  /** Histogram-percentile calibration — the 100 TB twin of
    * [[qualityCalibrated]] the scaladoc there promises: instead of an
    * exact per-source rank (one sort per source), each doc lands in a
    * fixed score bin (narrow map-side work), the per-(source, bin)
    * histogram aggregates map-side-combinably to ≤ nBins rows per source,
    * cumulative below-bin counts compute on that TINY table, and the
    * estimate broadcasts back — no per-source sort anywhere, whale
    * sources welcome. The percentile is the strictly-below-bin lower
    * bound in the same (rank·10000 div (n−1)) basis-point basis, so
    * the two operators' outputs are directly comparable; resolution is
    * the bin width (docs within a bin share an estimate).
    *
    * Output: (doc_id, source, quality_score, bin, approx_pct_bp,
    * keep_approx). */
  def qualityHistogramPct(docs: DataFrame, nBins: Int = 100,
      keepBp: Int = 3000): DataFrame = {
    val q = qualityScore(docs).select(col("doc_id"), col("quality_score"))
    val scored = docs.select(col("doc_id"), col("source")).join(q, Seq("doc_id"))
      .filter(col("quality_score").isNotNull)
      .withColumn("bin",
        least(floor(col("quality_score") * nBins).cast("long"),
          lit((nBins - 1).toLong)))
    val hist = scored.groupBy("source", "bin").agg(count(lit(1)).as("n_bin"))
    val wCum = Window.partitionBy("source").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist
      .withColumn("cum_below", coalesce(sum(col("n_bin")).over(wCum), lit(0L)))
      .withColumn("n_src", sum(col("n_bin")).over(Window.partitionBy("source")))
      .select("source", "bin", "cum_below", "n_src")
    scored.join(broadcast(cum), Seq("source", "bin"))
      .withColumn("approx_pct_bp",
        when(col("n_src") === 1, lit(0L))
          .otherwise(expr("(cum_below * 10000) div (n_src - 1)")))
      .withColumn("keep_approx",
        col("approx_pct_bp") >= lit((10000 - keepBp).toLong))
      .select("doc_id", "source", "quality_score", "bin", "approx_pct_bp", "keep_approx")
      .orderBy("doc_id")
  }

  /** Language markers: tiny high-frequency stopword lists per language.
    * (The heuristic n-gram approach of fastText-style ID, reduced to its
    * portable core: marker-token voting.) */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "and", "en" -> "of", "en" -> "to", "en" -> "with",
    "fr" -> "le", "fr" -> "la", "fr" -> "et", "fr" -> "les", "fr" -> "des",
    "es" -> "el", "es" -> "los", "es" -> "las", "es" -> "una", "es" -> "que",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das", "de" -> "ein",
    "zh" -> "的", "zh" -> "是", "zh" -> "了")

  /** Language ID by marker-token vote: explode tokens, join the (broadcast)
    * marker table, majority vote per doc with deterministic tie-break,
    * `und` when no marker hits. One shuffle on doc_id. */
  def languageId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val markers = broadcast(LangMarkers.toDF("cand_lang", "word"))
    val exploded = docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
    val votes = exploded.join(markers, Seq("word"))
      .groupBy("doc_id", "cand_lang").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("doc_id").orderBy(col("votes").desc, col("cand_lang"))
    val best = votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("cand_lang"), col("votes"))
    docs.select("doc_id").join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cand_lang"), lit("und")).as("predicted_lang"),
        coalesce(col("votes"), lit(0L)).as("marker_votes"))
      .orderBy("doc_id")
  }

  /** LangID self-evaluation: confusion matrix of the marker-vote
    * prediction against the labeled `lang` column, with each cell's share
    * of its label row — the precision/recall surface a curation pipeline
    * watches when it gates on predicted language. One extra doc_id join
    * over [[languageId]] and a (label, predicted) rollup; the pct window
    * moves |langs|² rows. */
  def langConfusion(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang").as("label_lang"))
      .join(languageId(docs).select("doc_id", "predicted_lang"), Seq("doc_id"))
      .groupBy("label_lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("pct_of_label",
        round(col("n_docs") * 100.0 /
          sum(col("n_docs")).over(Window.partitionBy("label_lang")), 2))
      .orderBy("label_lang", "predicted_lang")

  /** Content fingerprint: md5 over the normalized text (lowercase,
    * alphanumerics only) — byte-identical content maps to one id, the
    * canonical exact-dedup key modulo formatting. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "").cast("binary"))
          .as("fingerprint"))
      .orderBy("doc_id")

  /** BPE-ish subword token pattern (GPT-2 style, reduced to what RE2 — the
    * DuckDB oracle's regex engine — supports: no lookahead): an optional
    * leading space glued to a letter run, digit run, or punctuation run. */
  val BpePattern: String = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"

  /** Subword token counting with the BPE-ish regex (the LLM-pipeline token
    * budget estimator), alongside the whitespace count for comparison. */
  def bpeTokenStats(docs: DataFrame): DataFrame =
    withTokens(docs).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).cast("long")
          .as("n_bpe_tokens"),
        size(col("toks")).cast("long").as("n_ws_tokens"))
      .withColumn("tokens_per_word",
        round(col("n_bpe_tokens").cast("double") / col("n_ws_tokens"), 4))
      .orderBy("doc_id")

  /** Winnowing fingerprints (the MOSS scheme): positional word-3-gram
    * hashes, a sliding window of `w` takes each window's minimum, the
    * distinct minima are the document's fingerprint set. Guarantees any
    * shared run of ≥ n+w−1 tokens yields a shared fingerprint — the
    * local-dedup complement to MinHash's global signatures. One row per
    * (doc, fingerprint); join on fingerprint = candidate pairs. */
  def winnowFingerprints(docs: DataFrame, n: Int = 3, w: Int = 4): DataFrame = {
    TextExpressions.registerWinnow(docs.sparkSession, n, w)
    withTokens(docs)
      .filter(size(col("toks")) >= n + w - 1) // need at least one full window
      .select(col("doc_id"),
        explode(call_function(s"winnow_fp_${n}_$w", col("toks"))).as("fingerprint"))
      .orderBy("doc_id", "fingerprint")
  }

  /** Repetition quality signals (the Gopher/C4 filter family, reduced to
    * its token-bigram core since the corpus is single-line): per doc, the
    * fraction of bigram occurrences that are repeats and the share of the
    * single most frequent bigram. High values flag boilerplate/spam for the
    * curation filter. Positional (non-distinct) bigrams; docs need ≥2
    * tokens. Two keyed shuffles (bigram count, per-doc rollup). */
  def repetitionStats(docs: DataFrame): DataFrame =
    withTokens(docs)
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", slice(col("toks"), i, lit(2))))).as("bigram"))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n"),
        max(col("c")).as("mx"),
        count(lit(1)).as("dn"))
      .select(col("doc_id"),
        col("n").cast("long").as("n_bigrams"),
        round(lit(1.0) - col("dn").cast("double") / col("n"), 4).as("dup_bigram_frac"),
        round(col("mx").cast("double") / col("n"), 4).as("top_bigram_frac"))
      .orderBy("doc_id")

  /** Corpus vocabulary head: global top-k tokens by occurrence count with
    * doc frequency — the stopword/vocab diagnostic every corpus report
    * carries. One explode + two-level aggregate (map-side partial combine
    * absorbs hot tokens); top-k plans as TakeOrderedAndProject. */
  def topTokens(docs: DataFrame, k: Int = 20): DataFrame =
    withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("doc_frequency"))
      .orderBy(col("occurrences").desc, col("token"))
      .limit(k)

  /** Zipf rank-frequency fit over the corpus vocabulary head: OLS of
    * ln(freq) on ln(rank) for the top `k` tokens, emitted as one AUDIT
    * row (n_tokens, slope, intercept_ln, r2). Natural language sits near
    * slope −1 (Zipf 1949); a flat slope flags templated/synthetic text, a
    * cliff flags boilerplate domination — the corpus-level twin of the
    * per-doc repetition gates, and a one-glance drift check between crawl
    * snapshots.
    *
    * Determinism: ranks come from the (freq desc, token) total order (the
    * [[topTokens]] tie-break); each ln evaluates on an EXACT INTEGER and
    * floors to micro-nats before the census sums (the sourceDivergence
    * discipline — both engines see identical integers), the five OLS sums
    * combine as DECIMAL(38,0) ↔ HUGEINT, and the readout is one fixed
    * double tree of engine-identical values with NULLIF guards for the
    * degenerate (< 2 ranks / zero-variance) corpus.
    *
    * Scale shape: one map-side-combinable token census, a vocab-sized
    * top-k head (TakeOrderedAndProject — the corpus is never sorted), a
    * k-row single-partition rank window, a 1-row aggregate. */
  def zipfFit(docs: DataFrame, k: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val head = withTokens(docs)
      .select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(k)
    // k-row window: single-partition by design, bounded by the head size
    val ranked = head.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("token"))))
    val pts = ranked.select(
      floor(log(col("rank").cast("double")) * 1e6).cast("long").as("x"),
      floor(log(col("freq").cast("double")) * 1e6).cast("long").as("y"))
    val sums = pts.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
      sum(col("x").cast(dec) * col("y")).as("sxy"),
      sum(col("x").cast(dec) * col("x")).as("sxx"),
      sum(col("y").cast(dec) * col("y")).as("syy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val cov = nD * d("sxy") - d("sx") * d("sy")
    val varx = nD * d("sxx") - d("sx") * d("sx")
    val vary = nD * d("syy") - d("sy") * d("sy")
    val slope = cov / nullif(varx, lit(0.0))
    sums.select(
      col("n").as("n_tokens"),
      round(slope, 6).as("slope"),
      round((d("sy") - slope * d("sx")) / nD / 1e6, 6).as("intercept_ln"),
      round(cov * cov / nullif(varx * vary, lit(0.0)), 6).as("r2"))
  }

  /** Per-document top-k characteristic terms by rarity-weighted term
    * frequency — TF-IDF with the LINEAR idf variant score = tf · N/df.
    * The usual ln(N/df) weight needs a transcendental whose libm rounding
    * differs across engines; N/df is order-equivalent per term (ln is
    * monotone) and comes out of two IEEE-exact operations, so the oracle
    * pins the scores bit-for-bit. Ties (same score within a doc) break on
    * the term string for a total order.
    *
    * Plan shape: explode → (doc, term) count → term-keyed df aggregate →
    * term-keyed join back → per-doc top-k window. Every shuffle is keyed
    * on (doc,term), term, or doc; the corpus-size scalar joins in as a
    * broadcast single row. Hot stopword terms make big df-join partitions,
    * not big window partitions (the window is per-doc) — at whale-term
    * scale the df side is a tiny dimension (vocabulary), so AQE broadcasts
    * it. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    val tf = withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(idf, "term").crossJoin(nDocs)
      .withColumn("score",
        round(col("tf") * (col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rank").cast("long").as("rank"))
      .orderBy("doc_id", "rank")
  }

  /** N-gram novelty scoring — the curation-side complement of the dedup
    * family: per document, how much of its distinct n-gram content appears
    * in NO other document. Low novelty flags boilerplate/templated docs
    * for down-weighting even when no single pair crosses a dedup
    * threshold. Shape: distinct shingles (compiled kernel) → one
    * shingle-keyed df census (map-side combinable count) → join back →
    * per-doc rollup; the same inverted-index discipline as the dedup
    * operators, nothing pairwise. Docs with < n tokens have no shingles
    * and are excluded (the winnow convention). */
  def noveltyStats(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = graft.RunHygiene.stage(withShingles(docs, n)
      .select(col("doc_id"), explode(col("sh")).as("shingle")))
    sh.count() // fill once: the df census and the join-back both read it
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    sh.join(df, Seq("shingle"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_shingles"),
        sum((col("df") === 1).cast("long")).as("n_novel"))
      .withColumn("novelty_ratio",
        round(col("n_novel").cast("double") / col("n_shingles"), 4))
      .orderBy("doc_id")
  }

  /** Corpus-unigram log-probability quality score (the CCNet-style
    * signal): per document, the mean and worst ln P(token) under the
    * corpus's own unigram distribution. Low average flags rare-token
    * noise (mojibake, code dumps, lists); a very low minimum flags a
    * single out-of-distribution token. Shape: staged (doc_id, token)
    * occurrence stream (one tokenize pass, read by census and join-back),
    * token-frequency census, 1-row total broadcast, then a doc_id rollup —
    * the novelty/dedup inverted-index discipline, nothing pairwise. The
    * census join-back is left to AQE (broadcast at small SF; a 100 TB
    * corpus's distinct-token census shuffles instead). */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val occ = graft.RunHygiene.stage(withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("token")))
    occ.count() // fill once: the census and the join-back both read it
    val tf = occ.groupBy("token").agg(count(lit(1)).as("tf"))
    val total = occ.agg(count(lit(1)).as("n_total"))
    val lp = tf.crossJoin(broadcast(total))
      .select(col("token"),
        log(col("tf").cast("double") / col("n_total")).as("logprob"))
    occ.join(lp, Seq("token"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(col("logprob")), 4).as("avg_logprob"),
        round(min(col("logprob")), 4).as("min_logprob"))
      .orderBy("doc_id")
  }

  /** Interpolated-bigram language-model quality score — the next model up
    * from [[unigramLogProb]] (the CCNet/Wikipedia-LM perplexity-filter
    * idea, public knowledge): per document, the mean and worst
    * ln P(tᵢ | tᵢ₋₁) under the corpus's own Jelinek–Mercer–smoothed bigram
    * model P = λ·c(p,c)/c(p,·) + (1−λ)·c(c)/N. A doc can have a fine
    * unigram score yet read as word salad — the bigram term is what
    * catches shuffled/templated text.
    *
    * Determinism: each bigram's ln P is a fixed double expression of exact
    * integer counts, QUANTIZED to integer micro-nats (floor — exact) before
    * the per-doc sum, so aggregation order cannot drift (the KL-divergence
    * convention); the readout is one division chain of engine-identical
    * values. Docs with <2 tokens have no bigram and emit no row.
    *
    * Shape: one tokenize pass staged and read by all three censuses
    * (bigram, context, unigram) and the join-back; every join is keyed on
    * token text (inverted-index discipline, nothing pairwise); the 1-row
    * total broadcasts. Model size is |distinct bigrams| — the 100 TB path
    * shuffles the censuses instead of broadcasting, which AQE decides. */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val toksDf = withTokens(docs)
    val bi = graft.RunHygiene.stage(toksDf
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("prev"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("cur"))).as("pc"))
      .select(col("doc_id"), col("pc.prev").as("prev"), col("pc.cur").as("cur")))
    bi.count() // fill once: two censuses and the join-back read it
    val occ = toksDf.select(explode(col("toks")).as("token"))
    val c2 = bi.groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
    val ctx = bi.groupBy("prev").agg(count(lit(1)).as("cctx"))
    val c1 = occ.groupBy(col("token").as("cur")).agg(count(lit(1)).as("c1"))
    val total = occ.agg(count(lit(1)).as("n_total"))
    val lp = c2.join(ctx, Seq("prev")).join(c1, Seq("cur"))
      .crossJoin(broadcast(total))
      .select(col("prev"), col("cur"),
        floor(log(
          lit(0.9) * (col("c2").cast("double") / col("cctx")) +
            lit(0.1) * (col("c1").cast("double") / col("n_total"))) * lit(1e6))
          .cast("long").as("micro"))
    bi.join(lp, Seq("prev", "cur"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("micro")).as("sum_micro"),
        min(col("micro")).as("min_micro"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("sum_micro").cast("double") / col("n_bigrams") / lit(1e6), 4)
          .as("avg_logprob"),
        round(col("min_micro").cast("double") / lit(1e6), 4).as("min_logprob"))
      .orderBy("doc_id")
  }

  /** Model-based perplexity filter — the CCNet move completed: where
    * [[qualityCalibrated]] calibrates the HEURISTIC quality score,
    * this calibrates the [[bigramLogProb]] LANGUAGE-MODEL score (mean
    * ln P under the corpus bigram LM ≈ −perplexity) per source and keeps
    * the top `keepBp` share — "drop the worst-perplexity 30 % of every
    * source", robust to sources whose baseline fluency differs (the
    * reason CCNet buckets per snapshot/language rather than globally).
    * Docs with <2 tokens have no LM score and emit no row — a real
    * pipeline routes them to the heuristic filter instead.
    *
    * Shape: the LM stage is [[bigramLogProb]] (keyed censuses over a
    * staged bigram stream); calibration adds ONE source-keyed exchange
    * shared by the rank and count windows, integer-bp percentile —
    * identical scale story to `text_quality_calibrated`, including its
    * documented whale envelope (histogram percentile at extreme sources).
    *
    * Output: (doc_id, source, avg_logprob, pct_rank_bp,
    * keep = top `keepBp` share of its source), ordered by doc_id. */
  def perplexityFilter(docs: DataFrame, keepBp: Int = 7000): DataFrame = {
    val lm = bigramLogProb(docs).select(col("doc_id"), col("avg_logprob"))
    val joined = docs.select(col("doc_id"), col("source")).join(lm, Seq("doc_id"))
    val part = Window.partitionBy("source")
    val wRank = part.orderBy(col("avg_logprob"), col("doc_id"))
    joined
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("n_src", count(lit(1)).over(part))
      .withColumn("pct_rank_bp",
        when(col("n_src") === 1, lit(0L))
          .otherwise(expr("((rk - 1) * 10000) div (n_src - 1)")))
      .withColumn("keep", col("pct_rank_bp") >= lit((10000 - keepBp).toLong))
      .select("doc_id", "source", "avg_logprob", "pct_rank_bp", "keep")
      .orderBy("doc_id")
  }

  /** Vocabulary coverage curve — what share of all token occurrences the
    * top-k most frequent types cover, read out at the `ks` checkpoints:
    * the corpus statistic behind tokenizer vocab sizing and stopword
    * budgeting (Heaps/Zipf in one table). Census → rank by (tf desc,
    * token) → running occurrence sum → keep the checkpoint ranks. Shares
    * are integer basis points (`div`, the gate-proven exact form), never
    * float division. The ranking window is global over the VOCABULARY —
    * vocab grows sub-linearly in the corpus (Heaps' law), and the census
    * behind it is a map-side-combinable aggregate, so the single-partition
    * stage sees |vocab| rows, not corpus rows; at extreme vocab the same
    * readout rides a `TakeOrderedAndProject(max ks)` prefix instead. */
  def vocabCoverage(docs: DataFrame,
      ks: Seq[Int] = Seq(10, 100, 1000, 10000)): DataFrame = {
    val tf = withTokens(docs)
      .select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("tf"))
    val total = broadcast(tf.agg(
      sum(col("tf")).as("n_total"), count(lit(1)).as("n_vocab")))
    val order = Seq(col("tf").desc, col("token").asc)
    tf.withColumn("rank",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .withColumn("cum_tf", sum(col("tf")).over(Window.orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("rank").isin(ks.map(_.toLong): _*))
      .crossJoin(total)
      .select(col("rank").as("top_k"), col("cum_tf").as("covered_tokens"),
        col("n_total").as("total_tokens"), col("n_vocab").as("vocab_size"),
        expr("cum_tf * 10000 div n_total").as("coverage_bp"))
      .orderBy("top_k")
  }

  /** Per-source KL divergence from the corpus unigram distribution —
    * "how unlike the rest of the corpus does this domain talk": KL(p_s‖q)
    * = Σ_t p_s(t)·ln(p_s(t)/q(t)) where p_s is the source's unigram
    * distribution and q the whole corpus's. The domain-mixing signal a
    * curation pipeline reads next to `sample_weighted_mix`.
    *
    * Determinism: each term's contribution is an IEEE-deterministic
    * function of exact integer counts (one double division per factor,
    * `ln` is the gate-proven cross-engine transcendental), then QUANTIZED
    * to integer micro-nats before the per-source sum — so the aggregate is
    * an integer sum, associativity-proof by construction where a rounded
    * double sum would gamble on representation boundaries (the
    * avg_daily_balance lesson). Shape: one staged occurrence stream read
    * by three censuses (source×token, source, token) + a 1-row total —
    * the unigram-logprob inverted-census discipline, nothing pairwise;
    * every shuffle is keyed on source or token. */
  def sourceDivergence(docs: DataFrame): DataFrame = {
    val occ = graft.RunHygiene.stage(docs
      .select(col("source"), explode(tokens(col("text"))).as("token")))
    occ.count() // fill once: three censuses read it
    val st = occ.groupBy("source", "token").agg(count(lit(1)).as("stf"))
    val ss = occ.groupBy("source").agg(count(lit(1)).as("s_total"))
    val ct = occ.groupBy("token").agg(count(lit(1)).as("ctf"))
    val total = broadcast(occ.agg(count(lit(1)).as("n_total")))
    val contrib = (col("stf").cast("double") / col("s_total")) *
      log((col("stf").cast("double") * col("n_total")) /
        (col("s_total").cast("double") * col("ctf")))
    st.join(ss, Seq("source")).join(ct, Seq("token")).crossJoin(total)
      .withColumn("micro", round(contrib * 1000000).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_terms"), sum(col("micro")).as("micro_sum"))
      .select(col("source"), col("n_terms"),
        (col("micro_sum") / 1000000.0).as("kl_divergence"))
      .orderBy("source")
  }

  /** Per-source Shannon entropy of the token distribution — the
    * repetitiveness/diversity signal curation pipelines read next to the
    * KL mixing report: a source whose entropy (or entropy normalized by
    * ln(vocab), i.e. evenness) collapses is boilerplate-heavy and gets
    * down-weighted before training.
    *
    * Determinism: the [[sourceDivergence]] discipline — each term
    * −p·ln p is computed with the gate-proven `ln`, quantized to integer
    * micro-nats, and summed as BIGINT (associativity-proof); the two
    * double readouts (nats, evenness) divide exact integers at the end.
    * Single-token vocabularies yield NULL evenness (ln 1 = 0).
    *
    * Shape: one token census keyed (source, token), a per-source rollup
    * of that census, then a broadcast join back — every shuffle is keyed
    * on source or (source, token), partial-aggregated map-side; nothing
    * pairwise, nothing driver-resident. Output is n_sources rows.
    */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val st = docs.select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("stf"))
    val ss = st.groupBy("source")
      .agg(sum(col("stf")).as("n_tokens"), count(lit(1)).as("n_types"))
    val p = col("stf").cast("double") / col("n_tokens")
    st.join(broadcast(ss), Seq("source"))
      .withColumn("micro", round(-(p * log(p)) * 1000000).cast("long"))
      .groupBy("source")
      .agg(max(col("n_tokens")).as("n_tokens"), max(col("n_types")).as("n_types"),
        sum(col("micro")).as("micro_sum"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        (col("micro_sum") / 1000000.0).as("entropy_nats"),
        when(col("n_types") <= 1, lit(null).cast("double"))
          .otherwise(round((col("micro_sum") / 1000000.0) /
            log(col("n_types").cast("double")), 4)).as("evenness"),
        expr("n_types * 10000 div n_tokens").as("ttr_bp"))
      .orderBy("source")
  }

  /** Pairwise vocabulary overlap between sources: exact Jaccard of the
    * distinct-token sets, the redundant-source screen a mixing plan reads
    * next to [[sourceDivergence]] (KL says "how differently does a source
    * use the shared vocabulary"; this says "is the vocabulary itself the
    * same" — a near-10000 bp pair is a candidate for source-level dedup).
    *
    * Shape: the (source, token) distinct census, then a per-token source
    * roster (`collect_set`, bounded by the source count — low-cardinality
    * by construction) exploded into its sorted in-row pair combinations —
    * the co-occurring pair census comes from a narrow fan-out, never a
    * token-keyed self-join, so candidate volume is Σ_token |roster|², not
    * corpus². Type counts ride back as two tiny broadcasts; the Jaccard
    * is pure integer basis points. Pairs sharing zero tokens do not
    * appear (same contract as the oracle's join form).
    *
    * Output: (src_a < src_b, n_common, types_a, types_b, jaccard_bp). */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    val st = docs.select(col("source"), explode(tokens(col("text"))).as("token"))
      .distinct()
    val n = st.groupBy("source").agg(count(lit(1)).as("n_types"))
    val pairs = st.groupBy("token")
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .select(explode(expr(
        "flatten(transform(srcs, (a, i) -> " +
          "transform(slice(srcs, i + 2, size(srcs)), b -> struct(a AS src_a, b AS src_b))))"))
        .as("p"))
      .select(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(n.select(col("source").as("src_a"), col("n_types").as("types_a"))),
        Seq("src_a"))
      .join(broadcast(n.select(col("source").as("src_b"), col("n_types").as("types_b"))),
        Seq("src_b"))
      .withColumn("jaccard_bp",
        expr("n_common * 10000 div (types_a + types_b - n_common)"))
      .select("src_a", "src_b", "n_common", "types_a", "types_b", "jaccard_bp")
      .orderBy("src_a", "src_b")
  }

  /** Windowed token co-occurrence PMI: count ordered (left, right) token
    * pairs at offsets 1..`maxOffset`, then score each pair by pointwise
    * mutual information ln(c·N / (c_left · c_right)) — the collocation
    * statistic (word2vec's implicit matrix) a corpus-analysis pass uses
    * to find multi-word expressions before tokenizer training.
    *
    * Pair generation is a NARROW per-row `transform` over the token
    * array (one output row per in-document offset pair, never a
    * positions self-join); the pair census and the two marginal censuses
    * are all keyed, map-side-combinable aggregates over it. The staged
    * pair census is read three ways (pairs, left marginal, right
    * marginal) — persisted once, the sourceDivergence convention. Only
    * the 1-row grand total crosses. The readout is top-`topK` by
    * (count desc, pair) — TakeOrderedAndProject, never a global sort —
    * and the PMI is a single micro-quantized ln per emitted row.
    *
    * Output: (tok_a, tok_b, c, pmi_micro), the `topK` most frequent
    * pairs. */
  def pmiPairs(docs: DataFrame, maxOffset: Int = 2, topK: Int = 50): DataFrame = {
    require(maxOffset >= 1, s"maxOffset must be >= 1, got $maxOffset")
    val toks = withTokens(docs)
    val pairs = (1 to maxOffset).map { d =>
      toks.filter(size(col("toks")) > d)
        .select(explode(expr(
          s"transform(sequence(1, size(toks) - $d), " +
            s"i -> struct(toks[i-1] AS tok_a, toks[i-1+$d] AS tok_b))")).as("p"))
        .select(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
    }.reduce(_ unionByName _)
    val cnt = graft.RunHygiene.stage(
      pairs.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("c")))
    cnt.count() // fill once: pair census is read three ways below
    val ua = cnt.groupBy("tok_a").agg(sum(col("c")).as("ca"))
    val ub = cnt.groupBy("tok_b").agg(sum(col("c")).as("cb"))
    val tot = broadcast(cnt.agg(sum(col("c")).as("n")))
    cnt.join(ua, Seq("tok_a")).join(ub, Seq("tok_b")).crossJoin(tot)
      .orderBy(col("c").desc, col("tok_a"), col("tok_b"))
      .limit(topK)
      .withColumn("pmi_micro",
        round(log(col("c").cast("double") * col("n") /
          (col("ca").cast("double") * col("cb"))) * 1000000).cast("long"))
      .select("tok_a", "tok_b", "c", "pmi_micro")
      .orderBy(col("c").desc, col("tok_a"), col("tok_b"))
  }

  /** Word2vec-style negative-sampling table: every token weighted
    * tf^0.75 (the unigram-distribution flattening Mikolov et al. 2013
    * use for NCE/negative sampling), emitted with its cumulative share —
    * exactly the lookup table a sampled-softmax trainer bsearches.
    *
    * Determinism: tf^0.75 = sqrt(sqrt(tf³)) — two applications of the
    * ONE power IEEE requires correctly rounded, over a double product
    * chain evaluated in a fixed order, so both engines produce the
    * identical weight; weights quantize to integer micros before the
    * cumulative sum (exact BIGINT) and the share is integer ppm.
    *
    * Shape: one map-side-combinable token census, then rank + running
    * sum over the global (tf desc, token) order — vocabulary-sized, the
    * [[vocabCoverage]] single-partition envelope (vocab, not corpus,
    * bounds the window).
    *
    * Output: (token, tf, w_micro, rank, cum_ppm). */
  def negativeSampling(docs: DataFrame): DataFrame = {
    val tf = docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("tf"))
    val w = Window.orderBy(col("tf").desc, col("token"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tf.withColumn("w_micro",
        round(sqrt(sqrt(col("tf").cast("double") * col("tf") * col("tf"))) * 1000000)
          .cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_micro", sum(col("w_micro")).over(cum))
      .withColumn("total_micro", sum(col("w_micro")).over(Window.partitionBy()))
      .withColumn("cum_ppm", expr("cum_micro * 1000000 div total_micro"))
      .select("token", "tf", "w_micro", "rank", "cum_ppm")
      .orderBy("rank")
  }

  /** Token-length histogram: fixed-width bins (top bin open-ended), the
    * mergeable corpus-shape summary a curation pipeline reads before
    * choosing packing lengths and curriculum cuts. Integer binning only —
    * `div`, never float division, so engines cannot disagree at bin
    * edges. One map-side-combinable aggregate; the share column's
    * SUM-over-() window moves nBins rows through a single partition,
    * nothing more, at any corpus size. */
  def lengthHistogram(docs: DataFrame, binWidth: Int = 64,
      nBins: Int = 32): DataFrame = {
    withTokens(docs)
      .select(size(col("toks")).cast("long").as("n_tokens"))
      .withColumn("bin", least(lit((nBins - 1).toLong), expr(s"n_tokens div $binWidth")))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .withColumn("bin_lo", col("bin") * binWidth)
      .withColumn("pct_docs",
        round(col("n_docs") * 100.0 / sum(col("n_docs")).over(Window.partitionBy()), 2))
      .select("bin", "bin_lo", "n_docs", "min_tokens", "max_tokens", "pct_docs")
      .orderBy("bin")
  }

  // --- C4-style corpus cleaning (scrub + rule-based document filters) ---

  /** RE2-safe structural PII patterns (no lookaround/backrefs — the DuckDB
    * oracle's regex engine is RE2): URLs first, then emails (an address
    * inside a URL must scrub as part of the URL). */
  val UrlPattern: String = "https?://[^ ]+"
  val EmailPattern: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Stand-in blocklist terms (real pipelines load theirs from config);
    * token-exact matches redact to `<TERM>`. */
  val BlocklistTerms: Seq[String] = Seq("spark", "hash")

  /** PII/blocklist scrubbing — the C4/CCNet cleaning pass as a pure narrow
    * projection: regex-redact URLs and emails, token-redact blocklist
    * terms, report match counts and the scrubbed content hash. Zero
    * shuffle; at 100 TB this is a map-only pass that fuses into whatever
    * scan feeds it (whole-stage codegen keeps the regexes inside the scan
    * stage). Counts let the curation layer gate on PII density without a
    * second pass. */
  def scrubStats(docs: DataFrame): DataFrame = {
    val t1 = regexp_replace(
      regexp_replace(col("text"), UrlPattern, "<URL>"),
      EmailPattern, "<EMAIL>")
    val isBlocked = (t: Column) => BlocklistTerms.map(t === _).reduce(_ || _)
    docs.select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(UrlPattern), lit(0))).cast("long").as("n_urls"),
        size(regexp_extract_all(col("text"), lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
        length(col("text")).cast("long").as("n_chars"),
        split(t1, " ").as("toks"))
      .select(
        col("doc_id"), col("n_urls"), col("n_emails"),
        size(filter(col("toks"), isBlocked)).cast("long").as("n_blocklist"),
        col("n_chars"),
        concat_ws(" ",
          transform(col("toks"), t => when(isBlocked(t), lit("<TERM>")).otherwise(t)))
          .as("scrubbed"))
      .select(
        col("doc_id"), col("n_urls"), col("n_emails"), col("n_blocklist"), col("n_chars"),
        length(col("scrubbed")).cast("long").as("n_chars_scrubbed"),
        md5(col("scrubbed").cast("binary")).as("scrubbed_md5"))
      .orderBy("doc_id")
  }

  /** C4-filter rule thresholds (shared with the generated oracle SQL). */
  object C4 {
    val MinTokens = 20
    val MaxTokens = 80
    val MinMeanTokenLen = 2.5
    val MaxMeanTokenLen = 8.0
    val MaxTopTokenShare = 0.2
    val MinDistinctRatio = 0.3
  }

  /** Rule-based document filter verdicts (the C4/Gopher heuristic family,
    * restricted to rules this single-line lowercase corpus can trip):
    * token-count band, mean token length band, most-frequent-token share,
    * distinct-token ratio. Emits the metric surface, a keep flag, and the
    * FIRST failing rule (fixed evaluation order) so curation reports can
    * attribute drops. Pure narrow projection — all metrics are array
    * expressions over the row's own tokens (per-row cost O(n·d) with
    * document length bounded, so no groupBy detour); zero shuffle at any
    * corpus size. Verdicts compare the ROUNDED metrics so both engines
    * judge identical doubles. */
  def c4Filters(docs: DataFrame): DataFrame = {
    val base = withTokens(docs).select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"),
      round(
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(col("toks")), 4).as("mean_token_len"),
      round(
        array_max(transform(array_distinct(col("toks")),
          t => size(filter(col("toks"), x => x === t)))).cast("double") /
          size(col("toks")), 4).as("top_token_share"),
      round(size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 4)
        .as("distinct_ratio"))
    val failRule =
      when(col("n_tokens") < C4.MinTokens, "too_short")
        .when(col("n_tokens") > C4.MaxTokens, "too_long")
        .when(col("mean_token_len") < C4.MinMeanTokenLen ||
          col("mean_token_len") > C4.MaxMeanTokenLen, "token_len")
        .when(col("top_token_share") > C4.MaxTopTokenShare, "repetition")
        .when(col("distinct_ratio") < C4.MinDistinctRatio, "low_diversity")
    base
      .withColumn("fail_rule", failRule)
      .withColumn("keep", col("fail_rule").isNull)
      .select("doc_id", "n_tokens", "mean_token_len", "top_token_share",
        "distinct_ratio", "keep", "fail_rule")
      .orderBy("doc_id")
  }

  object Gopher {
    val MinWords = 50
    val MaxWords = 100000
    // micro-units: mean word length ∈ [3.0, 5.0] (the paper's [3, 10]
    // upper bound never trips on this corpus; 5.0 does — see PLANS.md)
    val MinMeanLenMicro = 3000000L
    val MaxMeanLenMicro = 5000000L
    val MinStopwords = 2
    val MinAlphaMicro = 800000L // ≥80% of words contain a letter
    val Stopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
  }

  /** Gopher quality rules (Rae et al. 2021 §A1.1) — the second canonical
    * rule family next to [[c4Filters]], on exact INTEGER micro-unit
    * arithmetic rather than rounded doubles: word-count band, mean word
    * length band, ≥80% alphabetic words, ≥2 stopwords from the paper's
    * 8-word list. Every metric is one pass over the token array (per-row
    * map work, no shuffle but the output sort); sums and ratios are
    * BIGINT micro-units so the DuckDB twin is exact by construction.
    * fail_rule reports the FIRST failed rule in the paper's order. */
  def gopherRules(docs: DataFrame): DataFrame = {
    import Gopher.{MaxMeanLenMicro, MaxWords, MinAlphaMicro, MinMeanLenMicro, MinStopwords, MinWords}
    val stopArr = array(Gopher.Stopwords.map(s => lit(s)): _*)
    val base = withTokens(docs).select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_words"),
      (aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)) * 1000000L)
        .as("_sum_len_m"),
      size(filter(col("toks"), t => t.rlike("[a-z]"))).cast("long").as("_n_alpha"),
      size(filter(col("toks"), t => array_contains(stopArr, t))).cast("long")
        .as("stopword_count"))
      .withColumn("mean_word_len_micro", expr("_sum_len_m div n_words"))
      .withColumn("frac_alpha_micro", expr("_n_alpha * 1000000L div n_words"))
    val failRule =
      when(col("n_words") < MinWords, "too_few_words")
        .when(col("n_words") > MaxWords, "too_many_words")
        .when(col("mean_word_len_micro") < MinMeanLenMicro ||
          col("mean_word_len_micro") > MaxMeanLenMicro, "word_length")
        .when(col("frac_alpha_micro") < MinAlphaMicro, "non_alpha")
        .when(col("stopword_count") < MinStopwords, "no_stopwords")
    base
      .withColumn("fail_rule", failRule)
      .withColumn("keep", col("fail_rule").isNull)
      .select("doc_id", "n_words", "mean_word_len_micro", "frac_alpha_micro",
        "stopword_count", "keep", "fail_rule")
      .orderBy("doc_id")
  }

  val RollingHashBase: Long = 31L
  val RollingHashMod: Long = 2147483647L // 2^31 − 1

  /** Polynomial (Karp-Rabin) document fingerprint: Horner fold of character
    * codes, acc = (acc·31 + ascii(c)) mod p — the building block of
    * content-defined chunking / winnowing. Pure integer arithmetic, so the
    * DuckDB oracle reproduces it exactly via list_reduce. */
  def rollingHash(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        // empty-text guard: sequence(1, 0) counts DOWN in Spark
        when(length(col("text")) === 0, lit(0L)).otherwise(
          aggregate(
            transform(sequence(lit(1), length(col("text"))),
              i => ascii(col("text").substr(i, lit(1)))),
            lit(0L),
            (acc, c) => (acc * RollingHashBase + c) % RollingHashMod)).as("rolling_hash"))
      .orderBy("doc_id")

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are the
    * maximal stopword-free token runs; each word scores deg(w)/freq(w)
    * over the candidate corpus (deg = Σ of the lengths of phrases it
    * appears in — co-occurrence degree; freq = occurrence count), a phrase
    * scores the sum of its words. Multi-word domain terms beat frequent
    * single words because degree rewards words that travel in long
    * phrases — the standard cheap keyword/labeling pass over a curated
    * corpus.
    *
    * All-integer determinism: word scores are deg·10⁶ div freq (both
    * integers), phrase scores are integer sums of word micros; top-k per
    * doc ties break on the phrase text.
    *
    * Shape: one positional explode; run-ids from a per-doc cumulative
    * window; word stats are token-keyed combinable censuses joined back by
    * token (inverted-index discipline); phrase assembly is one
    * (doc, run)-keyed aggregate with position-sorted reassembly; top-k
    * rides WindowGroupLimit. Nothing pairwise. */
  def rakeKeywords(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = withTokens(docs)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("is_stop", col("tok").isin(Stopwords: _*).cast("long"))
    val wRun = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val words = graft.RunHygiene.stage(pos
      .withColumn("run_id", sum(col("is_stop")).over(wRun))
      .filter(col("is_stop") === 0)
      .select(col("doc_id"), col("run_id"), col("pos"), col("tok")))
    words.count() // feeds the word censuses AND the phrase assembly
    val phraseLen = words.groupBy("doc_id", "run_id").agg(count(lit(1)).as("plen"))
    val occ = words.join(phraseLen, Seq("doc_id", "run_id"))
    val wordScore = occ.groupBy("tok")
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("w_micro", expr("deg * 1000000L div freq"))
    val phrases = occ.join(wordScore.select("tok", "w_micro"), Seq("tok"))
      .groupBy("doc_id", "run_id")
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("w_micro")).as("score_micro"))
      // the same phrase text can occur twice in a doc — same words, same
      // corpus-level scores, so dedupe to one row per (doc, phrase)
      .groupBy("doc_id", "phrase")
      .agg(max(col("n_words")).as("n_words"), max(col("score_micro")).as("score_micro"))
    val wTop = Window.partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("phrase"))
    phrases.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .withColumn("rank", col("rank").cast("long"))
      .select("doc_id", "rank", "phrase", "n_words", "score_micro")
      .orderBy("doc_id", "rank")
  }

  /** Kneser-Ney-smoothed bigram language model score per document — the
    * smoothing the REAL perplexity filters use (CCNet ships KenLM, which is
    * modified KN): where [[bigramLogProb]] interpolates with the raw
    * unigram, KN discounts every seen bigram by D = 0.75 and backs off to
    * the CONTINUATION probability — how many distinct contexts a word
    * completes, not how often it occurs. The difference is exactly the
    * "San Francisco" effect: "francisco" is frequent but only ever follows
    * "san", so KN scores it near-zero in novel contexts where the raw
    * unigram backoff overrates it; corpora full of such degenerate
    * collocations (boilerplate, templated spam) separate from prose.
    *
    * P(cur|prev) = (c(prev,cur) − D)/c(prev,·)
    *             + (D·N₁₊(prev,·)/c(prev,·)) · N₁₊(·,cur)/|bigram types|.
    * Scoring the training corpus itself, c ≥ 1 > D so the discounted term
    * stays positive. Every ln quantizes to integer micro-nats before the
    * per-doc sum ([[bigramLogProb]] discipline — order-free).
    *
    * Shape: ONE bigram-type census (staged) feeds all three KN statistics
    * (context totals + distinct-continuation counts are aggregates OVER
    * the census, cheaper than over the corpus) and the scoring join-back;
    * the 1-row type total broadcasts. */
  def knBigramLogProb(docs: DataFrame): DataFrame = {
    val toksDf = withTokens(docs)
    val bi = graft.RunHygiene.stage(toksDf
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("prev"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("cur"))).as("pc"))
      .select(col("doc_id"), col("pc.prev").as("prev"), col("pc.cur").as("cur")))
    bi.count() // one bigram stream feeds the census and the join-back
    val c2 = graft.RunHygiene.stage(
      bi.groupBy("prev", "cur").agg(count(lit(1)).as("c2")))
    c2.count() // census read by ctx, cont, and the type total
    val ctx = c2.groupBy("prev")
      .agg(sum(col("c2")).as("cctx"), count(lit(1)).as("n1w1"))
    val cont = c2.groupBy("cur").agg(count(lit(1)).as("ncont"))
    val nbig = c2.agg(count(lit(1)).as("nbig"))
    val lp = c2.join(ctx, Seq("prev")).join(cont, Seq("cur"))
      .crossJoin(broadcast(nbig))
      .select(col("prev"), col("cur"),
        floor(log(
          (col("c2").cast("double") - lit(0.75)) / col("cctx") +
            ((lit(0.75) * col("n1w1")) / col("cctx")) *
              (col("ncont").cast("double") / col("nbig"))) * lit(1e6))
          .cast("long").as("micro"))
    bi.join(lp, Seq("prev", "cur"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("micro")).as("sum_micro"),
        min(col("micro")).as("min_micro"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("sum_micro").cast("double") / col("n_bigrams") / lit(1e6), 4)
          .as("avg_kn_logprob"),
        round(col("min_micro").cast("double") / lit(1e6), 4).as("min_kn_logprob"))
      .orderBy("doc_id")
  }

  /** Held-out Kneser-Ney perplexity scoring — the production filtering
    * shape ([[knBigramLogProb]] scores the training corpus; real
    * pipelines train KenLM on a reference corpus and score CRAWLED text,
    * where unseen events dominate the signal). The md5-stable 81% split
    * (the [[nbLangConfusion]] discipline) trains the bigram model; the
    * held-out 19% is scored with full backoff: seen bigrams take the
    * discounted KN estimate interpolated with the add-one-smoothed
    * continuation probability, unseen bigrams under a seen context back
    * off to the scaled continuation term, and unseen contexts fall all
    * the way to the continuation probability alone. The add-one floor
    * ((ncont+1)/(nbig+vtypes)) keeps every branch strictly positive, so
    * no held-out event produces −∞. `oov_bigrams` counts the events that
    * took either backoff branch — the observable that separates
    * in-distribution text from novelty.
    *
    * Determinism: every branch is a fixed double tree over exact integer
    * census values, quantized to micro-nats per event BEFORE the per-doc
    * sum (order-free). Shape: the train-split bigram census is staged
    * once and feeds all three statistics; the three model frames join the
    * held-out stream keyed (left joins, coalesce-guarded); the 1-row
    * (nbig, vtypes) frame broadcasts. At 100 TB train and score are one
    * shuffle each on the bigram key. */
  def knHeldoutLogProb(docs: DataFrame): DataFrame = {
    val tagged = withTokens(docs).withColumn("is_train",
      substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "d")
    val bi = graft.RunHygiene.stage(tagged
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("is_train"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("prev"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("cur"))).as("pc"))
      .select(col("doc_id"), col("is_train"),
        col("pc.prev").as("prev"), col("pc.cur").as("cur")))
    bi.count() // one bigram stream feeds the train census and the scoring
    val c2 = graft.RunHygiene.stage(bi.filter(col("is_train"))
      .groupBy("prev", "cur").agg(count(lit(1)).as("c2")))
    c2.count() // census read by ctx, cont, and the totals
    val ctx = c2.groupBy("prev").agg(sum(col("c2")).as("cctx"), count(lit(1)).as("n1w1"))
    val cont = c2.groupBy("cur").agg(count(lit(1)).as("ncont"))
    val tot = broadcast(c2.agg(count(lit(1)).as("nbig"))
      .crossJoin(cont.agg(count(lit(1)).as("vtypes"))))
    val pc = (coalesce(col("ncont"), lit(0L)) + lit(1L)).cast("double") /
      (col("nbig") + col("vtypes"))
    val p = when(col("c2").isNotNull,
        (col("c2").cast("double") - lit(0.75)) / col("cctx") +
          ((lit(0.75) * col("n1w1")) / col("cctx")) * pc)
      .when(col("cctx").isNotNull, ((lit(0.75) * col("n1w1")) / col("cctx")) * pc)
      .otherwise(pc)
    bi.filter(!col("is_train"))
      .join(c2, Seq("prev", "cur"), "left")
      .join(ctx, Seq("prev"), "left")
      .join(cont, Seq("cur"), "left")
      .crossJoin(tot)
      .select(col("doc_id"),
        floor(log(p) * lit(1e6)).cast("long").as("micro"),
        when(col("c2").isNull, 1L).otherwise(0L).as("oov"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("oov")).as("oov_bigrams"),
        sum(col("micro")).as("sum_micro"),
        min(col("micro")).as("min_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("oov_bigrams"),
        round(col("sum_micro").cast("double") / col("n_bigrams") / lit(1e6), 4)
          .as("avg_heldout_logprob"),
        round(col("min_micro").cast("double") / lit(1e6), 4).as("min_heldout_logprob"))
      .orderBy("doc_id")
  }

  /** Trained multinomial Naive Bayes language classifier, evaluated as a
    * confusion matrix over a held-out split — the closed-form analogue of
    * the fastText-style classifiers production pipelines train for
    * language/quality filtering (CCNet, RedPajama). Unlike the marker-vote
    * heuristic ([[languageId]]), the model here is LEARNED from the
    * corpus: train on the md5-stable 81% split (first hex digit of
    * md5(doc_id) < 'd' — the [[graft.operators.TrainPrep]] discipline, so
    * membership is append-stable), score the held-out 19%.
    *
    * Model: P(lang | doc) ∝ P(lang) · Π_t P(t | lang)^tf with add-one
    * smoothing over the train vocabulary V: P(t|lang) = (c(t,lang)+1) /
    * (n_lang+V). Every log-likelihood quantizes to integer micro-nats
    * (floor(ln·10⁶), the [[bigramLogProb]] discipline) BEFORE summation,
    * so per-doc scores are order-independent integer sums and the argmax
    * (score desc, lang asc) is engine-exact.
    *
    * Scale shape: the MODEL is a (train-vocab × langs) weight grid —
    * domain-sized, built from one token-keyed census with map-side
    * combine, and broadcastable at serve time exactly like a shipped
    * fastText model. Scoring is one explode + token-keyed join + doc-keyed
    * sum; the only window orders L rows per doc (argmax). Nothing is
    * corpus × corpus.
    *
    * Output: (lang_actual, lang_pred, n_docs) over the held-out split. */
  def nbLangConfusion(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = docs.select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"),
      (substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "d").as("is_train"))
    val tok = graft.RunHygiene.stage(
      tagged.select(col("doc_id"), col("lang"), col("is_train"), explode(col("toks")).as("t"))
        .groupBy("doc_id", "lang", "is_train", "t").agg(count(lit(1)).as("tf")))
    tok.count() // one tokenize pass feeds counts, vocab, and scoring

    // model: per-(lang, token) counts, per-lang totals, vocab size, priors
    val counts = tok.filter(col("is_train"))
      .groupBy(col("lang").as("m_lang"), col("t")).agg(sum("tf").as("c"))
    val langTotals = counts.groupBy("m_lang").agg(sum("c").as("n_lang"))
    val vocab = counts.agg(countDistinct("t").as("v"))
    val priors = tok.filter(col("is_train"))
      .select("doc_id", "lang").distinct()
      .groupBy(col("lang").as("m_lang")).agg(count(lit(1)).as("n_docs_lang"))
    val nTrainDocs = priors.agg(sum("n_docs_lang").as("n_train"))
    val priorMicro = priors.crossJoin(broadcast(nTrainDocs))
      .select(col("m_lang"), floor(log(col("n_docs_lang").cast("double") /
        col("n_train")) * 1e6).cast("long").as("prior_micro"))

    // weight grid: every held-out token × every train lang, add-one smoothed
    val testTok = tok.filter(!col("is_train"))
    val grid = testTok.select("t").distinct()
      .crossJoin(broadcast(langTotals))
      .join(counts, Seq("t", "m_lang"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("t"), col("m_lang"),
        floor(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("n_lang") + col("v"))) * 1e6).cast("long").as("w_micro"))

    // score: integer micro-nat sums per (doc, lang), argmax with lang tie-break
    val scores = testTok.join(grid, "t")
      .groupBy("doc_id", "lang", "m_lang")
      .agg(sum(col("tf") * col("w_micro")).as("ll_micro"))
      .join(broadcast(priorMicro), "m_lang")
      .withColumn("score_micro", col("ll_micro") + col("prior_micro"))
    val w = Window.partitionBy("doc_id").orderBy(col("score_micro").desc, col("m_lang"))
    scores.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .groupBy(col("lang").as("lang_actual"), col("m_lang").as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang_actual", "lang_pred")
  }

  /** DSIR importance weights (Data Selection via Importance Resampling,
    * Xie et al. 2023, arXiv:2302.03169 — public method): score every raw
    * document by how much more likely its hashed-unigram profile is under
    * the TARGET distribution (here: the `targetLang` slice, the "looks
    * like the domain I want" proxy) than under the RAW corpus
    * distribution. log w(doc) = Σ_tokens λ[h(token)], with λ[b] the
    * add-one-smoothed log-ratio ln(p_target[b]) − ln(p_raw[b]) over
    * `buckets` hash buckets. Hashing into a FIXED feature space is the
    * published method's trick that makes the model size O(buckets) —
    * independent of vocabulary — so the λ table always broadcasts, even
    * at 100 TB.
    *
    * Determinism: bucket = md5-hash32(token) % buckets (the engine's one
    * portable hash); both bucket censuses are exact integer counts folded
    * in ONE pass (conditional sum — never two scans); each λ[b] is a
    * fixed double expression of exact integers floored to integer
    * micro-nats BEFORE the per-doc sum (the KL/micro-nat discipline), so
    * per-doc totals are order-free integers on both engines; the readable
    * per-token average is one division chain of engine-identical values.
    *
    * Scale shape: one tokenize pass staged (census + join-back both read
    * it), a buckets-sized rollup, a 2-value total, and a broadcast join
    * back — no shuffle wider than the occurrence stream's doc_id rollup.
    * Output: (doc_id, n_tokens, logratio_micro, avg_logratio), one row
    * per non-empty doc; downstream resampling is [[graft.operators.Sampling.weightedTopK]]
    * over `logratio_micro`. */
  def dsirWeights(docs: DataFrame, targetLang: String = "en",
      buckets: Int = 256): DataFrame = {
    val hash32 = conv(substring(md5(col("token").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val occ = graft.RunHygiene.stage(
      docs.select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("lang"), explode(col("toks")).as("token"))
        .select(col("doc_id"), col("lang"), (hash32 % buckets).as("bucket")))
    occ.count() // fill once: the census and the join-back both read it
    val census = occ.groupBy("bucket").agg(
      count(lit(1)).as("r_cnt"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("t_cnt"))
    val totals = census.agg(sum(col("r_cnt")).as("r_tot"), sum(col("t_cnt")).as("t_tot"))
    val lam = census.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor((log((col("t_cnt") + 1).cast("double") /
                 (col("t_tot") + buckets).cast("double")) -
               log((col("r_cnt") + 1).cast("double") /
                 (col("r_tot") + buckets).cast("double"))) * 1e6)
          .cast("long").as("lam_micro"))
    occ.join(broadcast(lam), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lam_micro")).as("logratio_micro"))
      .select(col("doc_id"), col("n_tokens"), col("logratio_micro"),
        round(col("logratio_micro").cast("double") / col("n_tokens") / lit(1e6), 4)
          .as("avg_logratio"))
      .orderBy("doc_id")
  }

  /** DSIR importance RESAMPLING — the second half of the published method
    * ([[dsirWeights]] scores; this draws): a without-replacement sample of
    * `k` docs with probability ∝ exp(log w) via the Gumbel-top-k trick
    * (Kool, van Hoof & Welling 2019 — public; equivalent to
    * Efraimidis–Spirakis but stated in log space, which matters here
    * because doc log-weights span hundreds of nats and exp(log w) would
    * overflow doubles): key = log w + Gumbel(0,1), take the k largest.
    *
    * Determinism: u = (md5-hash32(doc_id) + 0.5)/2³² — strictly inside
    * (0,1) so the double Gumbel −ln(−ln u) is always finite; the key is
    * one fixed double expression of the exact integer log-weight and u,
    * written identically in the oracle, with doc_id the total tie-break.
    * The emitted key is floored to integer nanos so the gate compares
    * integers.
    *
    * Scale shape: [[dsirWeights]]' rollup, then orderBy(key).limit(k) —
    * TakeOrderedAndProject (per-partition heaps + a k·partitions driver
    * merge), never a global sort. The rank window after the limit orders
    * k rows, not the corpus. */
  def dsirResample(docs: DataFrame, targetLang: String = "en",
      buckets: Int = 256, k: Int = 100): DataFrame = {
    val hashId = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val keyed = dsirWeights(docs, targetLang, buckets)
      .select(col("doc_id"), col("logratio_micro"),
        ((hashId + lit(0.5)) / lit(4294967296.0)).as("u"))
      .withColumn("gkey",
        col("logratio_micro").cast("double") / lit(1e6) - log(-log(col("u"))))
    keyed
      .orderBy(col("gkey").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("logratio_micro"),
        floor(col("gkey") * 1e9).cast("long").as("gkey_nano"),
        row_number().over(Window.orderBy(col("gkey").desc, col("doc_id")))
          .cast("long").as("sample_rank"))
      .orderBy("sample_rank")
  }
}
