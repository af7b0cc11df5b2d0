package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** N-gram (shingle) Jaccard dedup via an inverted-index join: explode
    * distinct shingles, self-join on shingle to generate candidates (only
    * docs that share content ever meet), then verify |A∩B|/|A∪B| ≥ threshold
    * on the shingle sets. */
  def ngramJaccard(docs: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col("doc_id"), TextOps.shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val candidates = inv.as("a").join(inv.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyPairs(candidates, sh, threshold)
  }

  /** MinHash + LSH banding. Signature i of a doc is
    * `min over shingles of substr(md5(shingle ∥ '#' ∥ i), 1, 8)`; signatures
    * are grouped into `bands` keys of `rowsPerBand` each; docs sharing any
    * band key become candidates; candidates are verified with exact Jaccard.
    *
    * With 4 bands × 3 rows, a pair at Jaccard 0.8 is caught with
    * probability 1-(1-0.8³)⁴ ≈ 0.96; at 0.3 almost never — the classic
    * LSH S-curve. The banding join shuffles on band keys only.
    */
  def minhashLsh(docs: DataFrame, n: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col("doc_id"), TextOps.shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)

    def minhash(seed: Int): Column =
      array_min(transform(col("sh"), x => substring(md5(concat(x, lit("#" + seed)).cast("binary")), 1, 8)))
    def bandKey(b: Int): Column =
      concat((0 until rowsPerBand).map(j => minhash(b * rowsPerBand + j)): _*)

    val banded = sh.select(col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandKey(b).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))

    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyPairs(candidates, sh, threshold)
  }

  /** Join candidate pairs back to their shingle sets and keep those at or
    * above the Jaccard threshold. */
  private def verifyPairs(candidates: DataFrame, sh: DataFrame, threshold: Double): DataFrame =
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")

  /** 16-bit SimHash over distinct tokens. Token hash = first 4 hex chars of
    * md5 as an int; bit b of the sketch is the sign of Σ(2·bit_b(hash)−1).
    * Equal sketches (Hamming distance 0 buckets) are the near-dup
    * candidates; one narrow map + no shuffle for the sketch itself. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = array_distinct(TextOps.tokens(col("text")))
    val hv = transform(toks, t => conv(substring(md5(t.cast("binary")), 1, 4), 16, 10).cast("int"))
    val bitCols = (0 until 16).map { b =>
      // Σ over tokens of ±1 for bit b, via aggregate(); >= 0 counts as set
      val contrib = aggregate(hv, lit(0),
        (acc, v) => acc + (shiftright(v, b).bitwiseAND(1) * 2 - 1))
      when(contrib >= 0, lit(1 << b)).otherwise(lit(0))
    }
    docs.select(col("doc_id"), bitCols.reduce(_ + _).cast("long").as("simhash16"))
      .orderBy("doc_id")
  }

  /** Near-dup candidate groups from equal SimHash sketches. */
  def simhashPairs(docs: DataFrame): DataFrame = {
    val s = simhash(docs)
    s.as("a").join(s.as("b"),
        col("a.simhash16") === col("b.simhash16") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash16").as("simhash16"))
      .orderBy("doc_a", "doc_b")
  }
}
