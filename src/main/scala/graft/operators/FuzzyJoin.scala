package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** String-similarity join under an edit-distance threshold — the
  * record-linkage / entity-resolution primitive (near-identical product
  * names, misspelled vendor names, OCR'd identifiers). The reference has no
  * fuzzy matching (its joins are exact-key, `src/fifo matching` area); this
  * is beyond-parity pipeline scope.
  *
  * Never all-pairs: candidates come from an EDJoin-style q-gram prefix
  * filter (Xiao, Wang, Lin — "Ed-Join", VLDB 2008, public) — the same
  * rarest-first prefix discipline as [[Dedup.ngramJaccard]], applied to
  * character q-grams under an edit metric.
  */
object FuzzyJoin {

  /** All distinct part-name pairs within Levenshtein distance `d`.
    *
    * Filter chain (each step lossless for ed ≤ d):
    *  1. Length filter: |len(a) − len(b)| ≤ d (an edit changes length by
    *     ≤ 1).
    *  2. Prefix filter: one edit destroys at most q of a string's distinct
    *     q-grams, so strings within d edits disagree on at most q·d grams
    *     — any pair must share a gram among the first q·d+1 of EITHER
    *     string under one global gram order. Order = (global gram
    *     frequency asc, gram): rarest grams first, so posting lists for
    *     prefix grams are short by construction — candidate volume is
    *     Σ_prefix-gram df², never n². (Same Bayardo common-order argument
    *     the dedup family pins.)
    *  3. Verify: `levenshtein` ≤ d — built into both engines with unit
    *     costs, so the oracle needs no reimplementation.
    *
    * Short-string guard: a string with ≤ q·d distinct grams has its WHOLE
    * gram set as prefix, and below ~q(d+1) chars two strings can sit
    * within d edits sharing zero q-grams ("ab"/"ba"). Those route through
    * a short-bucket all-pairs — lossless because the bucket is a bounded
    * set (strings shorter than q·(d+1) chars over a finite alphabet), a
    * broadcast dimension at any corpus scale.
    *
    * Scale shape: distinct-names census (one shuffle, dedupes the data-
    * sized input down to the name domain), gram explode + df census
    * (keyed, map-side combinable), prefix rank (window per name — name-
    * sized, short arrays), gram-keyed candidate join (posting lists of
    * RARE grams), then the cheap verify on the surviving pairs.
    */
  def editDistancePairs(part: DataFrame, d: Int = 2, q: Int = 2): DataFrame = {
    val prefixLen = q * d + 1
    val shortCut = q * (d + 1) // below this char count the gram filter is unsafe

    val names = part.select(col("p_name").as("name")).distinct()
      .withColumn("len", length(col("name")))

    val longNames = names.filter(col("len") >= shortCut)
    // distinct character q-grams per name (substring needs a lambda-index
    // argument, which the SQL transform form expresses directly)
    val gramsE = longNames.selectExpr("name",
      s"explode(array_distinct(transform(sequence(1, len - ${q - 1}), " +
        s"i -> substring(name, i, $q)))) AS gram")
    val dfCensus = gramsE.groupBy("gram").agg(count(lit(1)).as("gdf"))
    val w = Window.partitionBy("name").orderBy(col("gdf"), col("gram"))
    val prefixes = gramsE.join(dfCensus, "gram")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= prefixLen)
      .select("name", "gram")

    val candLong = prefixes.as("a").join(prefixes.as("b"),
        col("a.gram") === col("b.gram") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()

    // short bucket: bounded domain → broadcast; a short string can only
    // pair (within d) with strings at most d longer
    val short = broadcast(names.filter(col("len") < shortCut)
      .select(col("name").as("name_a"), col("len").as("len_a")))
    val candShort = short.join(names.select(col("name").as("name_b"), col("len").as("len_b")),
        col("name_a") < col("name_b") &&
          abs(col("len_a") - col("len_b")) <= d)
      .select("name_a", "name_b")

    candLong.union(candShort).distinct()
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= d)
      .withColumn("edit_distance",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("edit_distance") <= d)
      .orderBy("name_a", "name_b")
  }

  /** End-to-end entity resolution: fuzzy pairs → connected components →
    * canonical-name mapping. Every distinct name maps to the
    * lexicographically smallest name reachable through the
    * within-distance-`d` pair graph (transitive closure: "blue bolt" ~
    * "blue belt" ~ "glue belt" all canonicalize together even when the
    * endpoints are 3 edits apart — the standard ER semantics, and why a
    * pair list alone is not a resolution). Singletons map to themselves.
    *
    * Reuses [[Dedup.dedupClusters]]' distributed min-label propagation
    * verbatim — `least`/`min` are binary-collation string comparisons on
    * both engines, so the numeric-id fixpoint argument carries over
    * unchanged. Scale: the propagation is per-round keyed join + aggregate
    * over the PAIR graph (bounded by the fuzzy join's candidate volume,
    * never the name domain); the final size census is one window over the
    * distinct-name domain. */
  def canonicalNames(part: DataFrame, d: Int = 2,
      unionFindMaxEdges: Long = 1000000L): DataFrame = {
    val spark = part.sparkSession
    val pairs = editDistancePairs(part, d)
      .select(col("name_a").as("doc_a"), col("name_b").as("doc_b"))
    // The pair graph lives over the DISTINCT-NAME domain — catalog-sized
    // (dimension), not corpus-sized — and the fuzzy join's prefix filter
    // bounds its edges near-linearly in that domain. Below the threshold
    // the components come from a driver union-find over the collected
    // edge list (the Lloyd-centroids pattern: small derived state on the
    // driver, never raw data) — one job instead of the iterative
    // propagation loop's per-round join+aggregate+convergence actions.
    // Past the threshold (a name domain too big to collect) the same
    // min-label semantics fall back to the distributed loop.
    val p = graft.RunHygiene.track(
      pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nEdges = p.count()
    val clusters: DataFrame =
      if (nEdges <= unionFindMaxEdges) {
        val parent = scala.collection.mutable.HashMap.empty[String, String]
        def find(x: String): String = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        p.collect().foreach { row =>
          val (a, b) = (row.getString(0), row.getString(1))
          val (ra, rb) = (find(a), find(b))
          // union by MIN root so the final label is the component minimum
          // (the same fixpoint the distributed loop and the oracle reach)
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        val labels = parent.keys.map(n => (n, find(n))).toSeq
        import spark.implicits._
        broadcast(labels.toDF("name", "canon"))
      } else {
        Dedup.dedupClusters(p)
          .select(col("doc_id").as("name"), col("cluster_id").as("canon"))
      }
    val names = part.select(col("p_name").as("name")).distinct()
    val mapped = names.join(clusters, Seq("name"), "left")
      .withColumn("canonical", coalesce(col("canon"), col("name")))
    val w = Window.partitionBy("canonical")
    mapped
      .withColumn("cluster_size", count(lit(1)).over(w).cast("long"))
      .select("name", "canonical", "cluster_size")
      .orderBy("name")
  }
}
