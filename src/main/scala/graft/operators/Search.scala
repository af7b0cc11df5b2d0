package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Lexical retrieval over the document corpus: BM25 top-k and the
  * lexical+dense hybrid fusion — the retrieval-side complement of the ANN
  * family. A training-data pipeline uses exactly this pair for targeted
  * corpus probes ("find documents about X") and for RAG-style eval-set
  * construction where neither pure keyword nor pure embedding recall is
  * trusted alone.
  *
  * The reference pipeline has no search surface (its queries are
  * balance/ledger analytics, `src/balance_queries.sql` area); this family is
  * part of the beyond-parity LLM-pipeline scope alongside `Similarity`.
  */
object Search {

  /** BM25 top-k retrieval: the first `nQueries` documents act as probe
    * queries (the same probe convention as [[Similarity.bruteForceTopK]]
    * uses over `embeddings`, so the two rankings are fusable by id), every
    * other document is a candidate, ranked by a BM25 variant that both
    * engines reproduce bit-for-bit.
    *
    * Determinism: the classic BM25 idf is ln((N−df+0.5)/(df+0.5)+1) — a
    * transcendental whose libm rounding the oracle can't be trusted to
    * share (the same reasoning that made [[TextOps.tfidfTopTerms]] use the
    * linear idf). We keep the RATIONAL core, idf = (N−df+0.5)/(df+0.5),
    * which preserves the rare-term-dominates ordering and is built from
    * IEEE-exact +/−/× /÷ only. Every per-term contribution is floored into
    * integer micro-units; the per-document score is then an exact BIGINT
    * sum — immune to float summation-order differences between engines.
    * idf is strictly positive (N ≥ df), so no negative-contribution edge.
    *
    * Plan shape at 100 TB: the (doc,term) tf census and the term df census
    * are the inverted-index build ([[TextOps.invertedIndex]]) — one keyed
    * shuffle each, map-side combinable. The probe side is tiny by
    * construction (a handful of query rows), so query terms × df ride in
    * as ONE broadcast; the tf census is then filtered map-side to docs
    * containing ≥1 query term — the posting-list intersection discipline —
    * before the only data-sized shuffles: a doc-keyed join to pick up
    * document length and the (query,doc) partial-aggregated score sum.
    * Candidate volume is Σ_t df(t) over query terms, never N×Q. Docs
    * sharing no query term score 0 under BM25 and cannot enter a positive
    * top-k, so the inner-join prune is lossless.
    */
  def bm25TopK(docs: DataFrame, nQueries: Int = 5, k: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = TextOps.withTokens(docs)
    val tf = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    // integer total length → avgdl from two exact integers: deterministic
    val corpus = broadcast(dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
    val dfCensus = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // probe terms (distinct per query) joined with their df: vocabulary-
    // keyed join where one side is a handful of rows → broadcast; the
    // result is again tiny and broadcasts into the corpus-sized tf census
    val qterms = toks.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(col("toks"))).as("term"))
    val qstats = broadcast(qterms.join(dfCensus, "term").crossJoin(corpus))
    scoreBm25(tf.join(qstats, "term").join(dl, "doc_id"), k, k1, b)
  }

  /** The shared BM25 scoring tail: candidates carrying (query_id, doc_id,
    * tf, dl, df, n_docs, sum_dl) → integer-micro scores → per-query top-k.
    * ONE expression tree serves the census path ([[bm25TopK]]) and the
    * persisted-index probe ([[bm25IndexedTopK]]), so the two stay
    * bit-identical (they share an oracle). */
  private def scoreBm25(cands: DataFrame, k: Int, k1: Double, b: Double): DataFrame = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val sat = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))
    val scored = cands
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("avgdl", avgdl)
      .withColumn("idf", idf)
      .withColumn("sat", sat)
      .withColumn("contrib_micro",
        floor(col("idf") * col("sat") * lit(1000000.0)).cast("long"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib_micro")).as("score_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "score_micro", "rank")
      .orderBy("query_id", "rank")
  }

  // ---- persisted inverted index (the third index family, round-11 #3) ----

  /** Build the PERSISTED inverted index [[bm25IndexedTopK]] probes — the
    * production search shape at 100 TB, where per-query tf/df censuses
    * ([[bm25TopK]] recomputes both per call) are paid ONCE at build:
    *  - `postings_g<N>/` — (term, doc_id, tf, dl): the inverted lists,
    *    doc length DENORMALIZED into each posting (the classic layout) so
    *    a probe never joins a corpus-sized doc-length table; range-
    *    partitioned and sorted by term, so a probe's `term IN (…)` filter
    *    prunes at row-group granularity and reads only the probed lists.
    *  - `dfreq_g<N>/` — (term, df) ADDITIVE partials: integer df is
    *    mergeable, so appends add batch partials and probes SUM per term
    *    (bounded by query terms × writes); compaction re-merges to one
    *    row per term.
    *  - `stats/` — one (n_docs, sum_dl) row per write, append-only like
    *    the dedup index's `arrays/`: the probe's corpus stats are the sum
    *    of a writes-count-sized tree, never a corpus scan.
    * Same [[IndexManifest]] generation-pointer lifecycle as the dedup
    * prefix index and the IVF postings: build writes generation 0, the
    * manifest lands last, maintenance swaps atomically.
    *
    * Exactness: tf/df/dl/n_docs/sum_dl are exact integers and ADDITIVE
    * across doc_id-disjoint writes, so build+append over any split of the
    * corpus reproduces the full-corpus censuses bit-for-bit — the indexed
    * probe hash-matches [[bm25TopK]]'s own oracle with no new SQL. */
  def buildBm25Index(docs: DataFrame, indexDir: String): Unit =
    IndexManifest.withWriterLock(indexDir) {
      writeBm25Generation(docs, indexDir, 0, firstWrite = true)
      IndexManifest.write(indexDir, 0) // manifest last: live once complete
    }

  /** Index MAINTENANCE: append a doc_id-disjoint batch — postings and df
    * partials extend the live generation's trees, one stats row lands.
    * Cost ∝ batch (tokenize + one batch-keyed aggregate), never corpus. */
  def appendToBm25Index(newDocs: DataFrame, indexDir: String): Unit =
    IndexManifest.withWriterLock(indexDir) {
      writeBm25Generation(newDocs, indexDir,
        IndexManifest.generation(indexDir), firstWrite = false)
    }

  private def writeBm25Generation(docs: DataFrame, indexDir: String,
      gen: Int, firstWrite: Boolean): Unit = {
    val mode = if (firstWrite) "overwrite" else "append"
    val toks = graft.RunHygiene.stage(TextOps.withTokens(docs)
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl")))
    toks.count() // postings, df partials and stats share one tokenize pass
    val tf = toks.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))
      .select("term", "doc_id", "tf", "dl")
    tf.repartitionByRange(col("term")).sortWithinPartitions("term")
      .write.mode(mode).parquet(IndexManifest.treePath(indexDir, "postings", gen))
    tf.groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode(mode).parquet(IndexManifest.treePath(indexDir, "dfreq", gen))
    // empty docs carry no postings but DO count toward n_docs/sum_dl —
    // the same census [[bm25TopK]] takes over every doc
    toks.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.mode(mode).parquet(s"$indexDir/stats")
  }

  /** Index MAINTENANCE, part 2: compaction. Appends accrete df partials
    * (probe-side sums grow with write count) and small posting files in
    * arrival order (term-range pruning degrades toward full scans).
    * Compaction re-merges df to one row per term, rewrites postings
    * term-clustered, and swaps the [[IndexManifest]] generation pointer
    * atomically — previous generation retained, in-flight probes keep
    * reading intact trees. Semantically IDENTITY (integer merges), so
    * probe results are bit-identical across the swap. */
  def compactBm25Index(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Unit = IndexManifest.withWriterLock(indexDir) {
    val gen = IndexManifest.generation(indexDir)
    val next = gen + 1
    spark.read.parquet(IndexManifest.treePath(indexDir, "postings", gen))
      .repartitionByRange(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite")
      .parquet(IndexManifest.treePath(indexDir, "postings", next))
    spark.read.parquet(IndexManifest.treePath(indexDir, "dfreq", gen))
      .groupBy("term").agg(sum(col("df")).as("df"))
      .write.mode("overwrite")
      .parquet(IndexManifest.treePath(indexDir, "dfreq", next))
    IndexManifest.write(indexDir, next) // the atomic swap
    IndexManifest.prune(spark, indexDir, Seq("postings", "dfreq"), next - 2)
  }

  /** Probe-only BM25 top-k against a [[buildBm25Index]] tree. The queries
    * are tokenized fresh (in production they arrive from outside the
    * index); their distinct terms — a driver-bounded handful by
    * construction, the same boundary class as the IVF probe's cell list —
    * become a pushed `term IN (…)` filter on BOTH index trees, so the
    * recurring cost is the probed posting lists' bytes, never the corpus.
    * Resolves ONE manifest generation for the whole probe (retained
    * through the next compaction swap). */
  def bm25IndexedTopK(docs: DataFrame, indexDir: String, nQueries: Int = 5,
      k: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    val gen = IndexManifest.generation(indexDir)
    val qterms = TextOps.withTokens(docs.filter(col("doc_id") < nQueries))
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(col("toks"))).as("term"))
    val termList = qterms.select("term").distinct()
      .collect().map(_.getString(0)).toSeq
    val dfAgg = spark.read.parquet(IndexManifest.treePath(indexDir, "dfreq", gen))
      .where(col("term").isin(termList: _*))
      .groupBy("term").agg(sum(col("df")).as("df"))
    val stats = spark.read.parquet(s"$indexDir/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    val qstats = broadcast(qterms.join(dfAgg, "term").crossJoin(broadcast(stats)))
    val postings = spark.read
      .parquet(IndexManifest.treePath(indexDir, "postings", gen))
      .where(col("term").isin(termList: _*))
    scoreBm25(postings.join(qstats, "term"), k, k1, b)
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical ranking
    * over `documents` with the exact-cosine dense ranking over
    * `embeddings` (doc_id ↔ vec_id are aligned ids in this corpus). This
    * is the production hybrid-search shape — two independent retrievers,
    * each top-`poolK`, fused by integer RRF micro-units so the final order
    * is engine-exact — as opposed to [[Similarity.rrfFusion]] which fuses
    * two DENSE rankings (exact vs LSH) as an ANN-quality probe.
    *
    * Scale: both inputs are already top-`poolK` per query (bounded:
    * queries × poolK rows), so the fusion join, window, and final top-k
    * are driver-negligible no matter the corpus size; the heavy lifting
    * stays inside the two retrievers, each with its own scale path.
    */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame, nQueries: Int = 5,
      k: Int = 5, poolK: Int = 10, kRrf: Int = 60): DataFrame = {
    val lex = bm25TopK(docs, nQueries, poolK)
      .select(col("query_id"), col("doc_id"), col("rank").as("rank_lex"))
    val dense = Similarity.bruteForceTopK(embeddings, nQueries, poolK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("rank_dense"))
    val fused = lex.join(dense, Seq("query_id", "doc_id"), "full")
      .withColumn("rrf_micro",
        (coalesce(expr(s"1000000 div ($kRrf + rank_lex)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($kRrf + rank_dense)"), lit(0L))).cast("long"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    fused.withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= k)
      .select("query_id", "doc_id", "rank_lex", "rank_dense", "rrf_micro", "fused_rank")
      .orderBy("query_id", "fused_rank")
  }

  /** Exact phrase search: each probe query's leading two tokens form a
    * phrase; candidates rank by CONSECUTIVE occurrence count (positional
    * match, not bag-of-words — "fast table" must appear as adjacent
    * tokens). The BM25 complement: term queries tolerate reordering,
    * phrase queries don't.
    *
    * Plan: the per-position bigram stream (corpus-linear, the
    * repetitionStats idiom) is semi-joined against the broadcast phrase
    * list BEFORE any aggregation — only positions matching some probe
    * phrase reach the (query,doc) count shuffle, so the shuffle volume is
    * the match count, not the corpus bigram count. At 100 TB this is the
    * positional-postings probe: linear scan, broadcast filter, tiny
    * aggregate. */
  def phraseTopK(docs: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame = {
    val toks = TextOps.withTokens(docs).filter(size(col("toks")) >= 2)
    val bg = toks.selectExpr("doc_id",
      "explode(transform(sequence(1, size(toks) - 1), " +
        "i -> concat_ws(' ', slice(toks, i, 2)))) AS bigram")
    val phrases = broadcast(toks.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(col("toks"), 1, 2)).as("phrase")))
    val counted = bg.join(phrases,
        bg("bigram") === phrases("phrase") && col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id", "phrase")
      .agg(count(lit(1)).as("n_occurrences"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("n_occurrences").desc, col("doc_id"))
    counted.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "phrase", "n_occurrences", "rank")
      .orderBy("query_id", "rank")
  }
}
