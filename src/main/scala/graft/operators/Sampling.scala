package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Both operators sample by an md5 hash of the stable document id — never
  * by `rand()` — so a document's fate is a pure function of its id: samples
  * are reproducible across runs, stable under corpus growth/appends, and
  * the DuckDB oracle replays them bit-for-bit (the same properties
  * production pipelines rely on for resumable/debuggable data curation).
  *
  * Scale shapes:
  *  - [[weightedMix]] is a pure narrow filter — no shuffle at all; at
  *    100 TB it runs entirely map-side with the predicate pushed onto the
  *    scan's output.
  *  - [[stratifiedSample]] needs exact per-stratum counts, which is
  *    inherently one window per stratum — a single keyed shuffle whose
  *    partition size is the stratum size. Strata (languages, sources) are
  *    low-cardinality and roughly balanced in curation workloads; for
  *    whale strata the rank-free [[weightedMix]] form is the escape hatch
  *    (rate-based, no ordering needed).
  */
object Sampling {

  /** The gate's domain-weight mix — a single shared constant rendered into
    * both the Spark call and the DuckDB oracle so the two sides cannot
    * drift (the OracleSqlText convention for every tuned parameter). */
  val GateWeights: Map[String, Int] = Map("src0" -> 90, "src1" -> 75, "src2" -> 10)

  /** First-8-hex-of-md5 of the id rendered as text — a uniform value in
    * [0, 2³²), the engine's standard portable hash (same construction as
    * [[TrainPrep.assignSplits]] and [[Sketches]], shared with the oracle). */
  private def hash32(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10).cast("long")

  /** Exact-count stratified sample: within each stratum, rank documents by
    * (hash, id) and keep the first ceil(n_stratum · pct / 100) — every
    * stratum is represented at exactly the target rate (rounding up), which
    * rate-based sampling only achieves in expectation. The hash order makes
    * the per-stratum choice uniform; the id tie-break makes it total.
    *
    * Whale guard: exact-count ranking is inherently one sort per stratum,
    * so a stratum above `whaleBound` rows would concentrate in one task.
    * Such strata are instead hash-split into `shares` sub-partitions, the
    * stratum quota K = ceil(n·pct/100) is apportioned across the observed
    * share sizes by largest-remainder (base floor(n_j·pct/100), the
    * R = K − Σbase leftovers to the largest remainders, remainder ties to
    * the lowest share id) — provably Σq_j = K and q_j ≤ n_j for any
    * 1 ≤ pct ≤ 100 — and ranking happens within shares, bounding every
    * sort at ~n/shares rows. The kept SET above the bound differs from the
    * global-rank order (it is a uniform hash sample either way), and
    * `sample_rank` there is the share-interleaved id
    * (rank_in_share−1)·shares + share + 1 — unique per stratum but not
    * dense; dense ranking is exactly the bottleneck being avoided. Gate
    * strata sit far below the default bound, so the oracle (global-rank
    * SQL) is unchanged.
    *
    * Output: (doc_id, stratum, sample_rank) of kept docs.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String, pct: Int = 20,
      idCol: String = "doc_id", whaleBound: Long = 1L << 20,
      shares: Int = 32): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1,100], got $pct")
    require(shares >= 1, s"shares must be >= 1, got $shares")
    val base = docs.select(col(idCol), col(stratumCol).as("stratum"),
      hash32(col(idCol)).as("hv"))
    // strata are low-cardinality by construction: the census is tiny and
    // rides back in as a broadcast, replacing the count-over-stratum window
    // (same one shuffle for the small path's rank; none added)
    val counts = base.groupBy("stratum").agg(count(lit(1)).as("n_stratum"))
    val tagged = base.join(broadcast(counts), Seq("stratum"))

    val small = tagged.filter(col("n_stratum") <= whaleBound)
      .withColumn("sample_rank", row_number().over(
          Window.partitionBy("stratum").orderBy(col("hv"), col(idCol)))
        .cast("long"))
      // rank ≤ ceil(n·pct/100) ⟺ (rank−1)·100 < n·pct — pure integer
      // comparison, no division to disagree on across engines
      .filter((col("sample_rank") - 1) * 100 < col("n_stratum") * pct)
      .select(col(idCol), col("stratum"), col("sample_rank"))

    val whales = tagged.filter(col("n_stratum") > whaleBound)
      .withColumn("share", pmod(col("hv"), lit(shares.toLong)))
    // largest-remainder apportionment over the observed share sizes —
    // (whale strata × shares) rows, computed once, broadcast back
    val quotas = whales.groupBy("stratum", "share")
      .agg(count(lit(1)).as("n_share"), max(col("n_stratum")).as("n_stratum"))
      .withColumn("base", expr(s"(n_share * $pct) div 100"))
      .withColumn("rem", expr(s"(n_share * $pct) % 100"))
      .withColumn("k_total", expr(s"(n_stratum * $pct + 99) div 100"))
      .withColumn("sum_base", sum(col("base")).over(Window.partitionBy("stratum")))
      .withColumn("rem_rank", row_number().over(
        Window.partitionBy("stratum").orderBy(col("rem").desc, col("share"))))
      .withColumn("q", col("base") +
        when(col("rem_rank") <= col("k_total") - col("sum_base"), 1L).otherwise(0L))
      .select("stratum", "share", "q")
    val whaleKept = whales.join(broadcast(quotas), Seq("stratum", "share"))
      .withColumn("rk", row_number().over(
          Window.partitionBy("stratum", "share").orderBy(col("hv"), col(idCol)))
        .cast("long"))
      .filter(col("rk") <= col("q"))
      .select(col(idCol), col("stratum"),
        ((col("rk") - 1) * shares + col("share") + 1).cast("long").as("sample_rank"))

    small.unionByName(whaleKept).orderBy("stratum", "sample_rank")
  }

  /** The whale-path share an id hashes to — the JVM-side twin of
    * `pmod(hash32(id), shares)`, exposed for tests and skew diagnostics. */
  def shareOf(id: String, shares: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(id.getBytes("UTF-8"))
    val hex = md.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % shares
  }

  /** Fixed-size global uniform sample: the k documents with the smallest
    * id-hash — the distributed replacement for reservoir sampling.
    * Deterministic (same k docs every run, stable under append for
    * surviving hashes), and it plans as `TakeOrderedAndProject`:
    * per-partition top-k heaps + a driver merge of k·partitions rows,
    * never a global sort — the same fixed-size-sample-from-100-TB shape
    * `reservoir` solves single-threaded. */
  def uniformSample(docs: DataFrame, k: Int = 100,
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), col("source"), hash32(col(idCol)).as("hv"))
      .orderBy(col("hv"), col(idCol))
      .limit(k)

  /** Per-group cap ("domain capping"): keep at most `cap` documents per
    * group, chosen by hash rank — the curation step that stops a whale
    * domain from dominating the mix; [[weightedMix]] expresses rates, this
    * expresses the absolute ceiling. One keyed shuffle; the rank-≤-cap
    * filter is a constant limit, so WindowGroupLimit pushes top-`cap`
    * selection into each map/reduce side and no full per-group sort ever
    * runs (pinned) — the whale domain this operator exists for is exactly
    * the partition that must not be sorted whole.
    *
    * Output: (doc_id, grp, sample_rank ≤ cap) of kept docs. */
  def capPerGroup(docs: DataFrame, groupCol: String = "source", cap: Int = 10,
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), col(groupCol).as("grp"), hash32(col(idCol)).as("hv"))
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy("grp").orderBy(col("hv"), col(idCol))).cast("long"))
      .filter(col("sample_rank") <= cap)
      .select(col(idCol), col("grp"), col("sample_rank"))
      .orderBy("grp", "sample_rank")

  /** Class-balanced downsampling: cap EVERY class at the minority class's
    * size — the standard rebalancing cut before training a classifier on
    * skewed labels (eval suites and contrastive heads both want uniform
    * class priors). The cap is data-derived, not a parameter: one class
    * census folds to a 1-row broadcast min, and the per-class hash-rank
    * (same (md5, id) shuffle order as every sampler here — uniform,
    * append-stable, engine-portable) keeps rank ≤ that min. Output is
    * exactly n_classes × min_class_size rows by construction. One keyed
    * census + one keyed rank window; the minority count rides as a 1-row
    * broadcast — nothing corpus-sized on the driver. */
  def classBalanced(df: DataFrame, classCol: String = "label",
      idCol: String = "vec_id"): DataFrame = {
    val minCount = df.groupBy(col(classCol)).agg(count(lit(1)).as("n"))
      .agg(min("n").as("min_class_n"))
    df.select(col(idCol), col(classCol).cast("long").as("class"), hash32(col(idCol)).as("hv"))
      .crossJoin(broadcast(minCount))
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy("class").orderBy(col("hv"), col(idCol))).cast("long"))
      .filter(col("sample_rank") <= col("min_class_n"))
      .select(col(idCol), col("class"), col("sample_rank"))
      .orderBy("class", "sample_rank")
  }

  /** Per-source token-budget sampling: training mixtures are specified in
    * TOKENS, not documents ("30 B tokens of web, 5 B of code"), so the
    * sampler must cut each source at a token budget. Documents order
    * within their source by (hash, id) — the same uniform, append-stable
    * shuffle order every sampler here uses — and the greedy prefix whose
    * PRIOR cumulative token count is still under `budgetTokens` survives:
    * the budget-crossing document is kept (budgets fill to "at least", so
    * a single over-long doc cannot zero out its source), everything after
    * it is dropped. Deterministic; re-runs and appends keep every
    * surviving doc's assignment (a new doc reshuffles only hashes after
    * it, exactly like [[uniformSample]]).
    *
    * Scale shape: one keyed shuffle on source; the running sum is one
    * growing-frame window per source (evaluated incrementally, never
    * quadratic). The per-source sort is the documented whale envelope
    * (cf. text_quality_calibrated): at 100 TB a whale source pre-prunes
    * by hash range — P(survive) ≈ budget/Σtokens bounds the surviving
    * hash prefix, so the sort shrinks to ~budget-sized input with the
    * same kept set; the exact form here is the gate-checkable twin.
    *
    * Output: (doc_id, source, n_tokens, cum_tokens ≤ budget + last doc),
    * ordered by doc_id. */
  def tokenBudgetSample(docs: DataFrame, budgetTokens: Long = 800L,
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol), col("source"),
      size(graft.functions.TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
      hash32(col(idCol)).as("hv"))
    val w = Window.partitionBy("source").orderBy(col("hv"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("prior", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("prior") < budgetTokens)
      .withColumn("cum_tokens", col("prior") + col("n_tokens"))
      .select(col(idCol), col("source"), col("n_tokens"), col("cum_tokens"))
      .orderBy(idCol)
  }

  /** Rate-based weighted domain mix: each source keeps `weights(source)`
    * percent of its documents (default `defaultPct`), decided per document
    * by hash bucket — the standard up/down-weighting step when rebalancing
    * a training mix across domains of very different sizes. Zero shuffles:
    * the whole operator is one narrow projection + filter.
    *
    * Output: (doc_id, source, bucket) of kept docs.
    */
  def weightedMix(docs: DataFrame, weights: Map[String, Int],
      defaultPct: Int = 50, idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    val pct = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (src, p)) => when(col(sourceCol) === src, p).otherwise(acc)
    }
    docs.select(col(idCol), col(sourceCol),
        (hash32(col(idCol)) % 100).as("bucket"))
      .filter(col("bucket") < pct)
      .orderBy(idCol)
  }

  /** Fixed-size weighted sample without replacement (Efraimidis–Spirakis
    * A-ES, IPL 2006): each document draws u = (hash32(id)+1)/2³² ∈ (0,1]
    * and scores key = ln(u)/w with w its weight; the k LARGEST keys are a
    * weighted sample without replacement — P(doc first) = w/Σw, exactly
    * the one-pass weighted-reservoir semantics, but as a deterministic
    * distributed top-k instead of a sequential reservoir. ln(u)/w is the
    * monotone log of the usual u^(1/w) key (same order, no pow()).
    *
    * The curation use: sample a fixed-budget training subset where
    * higher-quality/longer documents are proportionally more likely, while
    * every document keeps a nonzero chance — the middle ground between
    * [[uniformSample]] (ignores quality) and a hard top-k by score (drops
    * the tail entirely, collapsing diversity).
    *
    * Determinism: u is the engine's standard md5 hash32 — no rand(); the
    * same doc set is drawn every run and in the DuckDB oracle bit-for-bit
    * (ln and IEEE division are correctly-rounded on both engines). The
    * emitted key is quantized to integer nano-units (floor, exact) so the
    * gate compares integers.
    *
    * Scale shape: one narrow projection, then orderBy(key).limit(k) plans
    * as TakeOrderedAndProject — per-partition top-k heaps + a driver merge
    * of k·partitions rows, never a global sort. The rank window after the
    * limit orders k rows, not the corpus.
    *
    * Output: (doc_id, source, weight, es_key_nano, sample_rank ≤ k). */
  def weightedTopK(docs: DataFrame, k: Int = 200, idCol: String = "doc_id",
      weightCol: String = "n_chars"): DataFrame = {
    val keyed = docs.select(col(idCol), col("source"),
        greatest(col(weightCol).cast("long"), lit(1L)).as("weight"),
        ((hash32(col(idCol)) + 1).cast("double") / lit(4294967296.0)).as("u"))
      .withColumn("es_key", log(col("u")) / col("weight").cast("double"))
    keyed
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("source"), col("weight"),
        floor(col("es_key") * 1e9).cast("long").as("es_key_nano"),
        row_number().over(Window.orderBy(col("es_key").desc, col(idCol)))
          .cast("long").as("sample_rank"))
      .orderBy("sample_rank")
  }

  /** Temperature-scaled source mixing: apportion a fixed `target` document
    * budget across sources proportionally to n_src^α with α = 0.5 — the
    * up-weight-the-tail mixing rule multilingual/multi-domain training
    * runs use so head sources stop drowning small ones (public knowledge:
    * Conneau & Lample 2019's temperature sampling, the mC4 α-mix).
    *
    * α is fixed at 0.5 because sqrt is the ONE power IEEE 754 requires to
    * be correctly rounded — any other exponent rides libm's pow and may
    * differ in the last ulp across engines. The sqrt weights are then
    * quantized to integer micros and the whole apportionment (floor
    * quotas + largest-remainder top-up, ties broken by source name) is
    * exact BIGINT arithmetic, so both engines compute the identical
    * quota vector; a source whose quota exceeds its census is clamped to
    * it (α < 1 can oversubscribe a tiny source; a without-replacement
    * sample cannot mint documents).
    *
    * Within each source the kept set is the first `quota` documents by
    * (id-hash, id) — the [[stratifiedSample]] uniform-choice idiom.
    *
    * Scale shape: one tiny census aggregate (n_sources rows, window'd in
    * a single partition and broadcast back) + one rank window keyed on
    * source — the same single keyed shuffle as the stratified sampler,
    * with the same whale-stratum caveat and escape hatch.
    *
    * Output: (doc_id, source, sample_rank ≤ quota(source)). */
  def temperatureSample(docs: DataFrame, target: Int = 200,
      sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(target >= 1, s"target must be >= 1, got $target")
    val base = docs.select(col(idCol), col(sourceCol).as("source"),
      hash32(col(idCol)).as("hv"))
    val quotas = base.groupBy("source").agg(count(lit(1)).as("n_src"))
      .withColumn("wq", round(sqrt(col("n_src").cast("double")) * 1000000).cast("long"))
      .withColumn("w_total", sum(col("wq")).over(Window.partitionBy()))
      .withColumn("base_q", expr(s"(${target}L * wq) div w_total"))
      .withColumn("rem", expr(s"(${target}L * wq) % w_total"))
      .withColumn("sum_base", sum(col("base_q")).over(Window.partitionBy()))
      .withColumn("rem_rank", row_number().over(
        Window.partitionBy().orderBy(col("rem").desc, col("source"))).cast("long"))
      .withColumn("quota", least(col("n_src"), col("base_q") +
        when(col("rem_rank") <= lit(target.toLong) - col("sum_base"), 1L).otherwise(0L)))
      .select("source", "quota")
    base.join(broadcast(quotas), Seq("source"))
      .withColumn("sample_rank", row_number().over(
          Window.partitionBy("source").orderBy(col("hv"), col(idCol)))
        .cast("long"))
      .filter(col("sample_rank") <= col("quota"))
      .select(col(idCol), col("source"), col("sample_rank"))
      .orderBy("source", "sample_rank")
  }
}
