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
}
