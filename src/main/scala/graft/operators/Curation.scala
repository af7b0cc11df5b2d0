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
    val canonical = filtered
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    filtered
      .join(canonical, Seq("doc_id"), "left_semi")
      .select("doc_id", "n_tokens", "quality_score", "predicted_lang")
      .orderBy("doc_id")
  }
}
