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
}
