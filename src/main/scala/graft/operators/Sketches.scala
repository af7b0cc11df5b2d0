package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sketches for approximate analytics at scale.
  *
  * Spark's own `approx_count_distinct` (HyperLogLog++) is the usual tool,
  * but its sketch bytes are engine-specific — no cross-engine oracle can
  * check it. KMV (k-minimum-values) is the classic alternative whose
  * estimate is a pure function of an md5 hash order, so DuckDB reproduces
  * it bit-for-bit: keep the k smallest distinct hash values; if fewer than
  * k exist the count is exact, otherwise estimate (k−1)·2³² / h_k with h_k
  * the k-th smallest of a uniform [0, 2³²) hash (Bar-Yossef et al. 2002).
  *
  * Scale shape: map-side partial distinct → TakeOrdered(k) per-partition
  * heaps + driver merge of k values — no global sort, no full distinct set
  * on any single node beyond k entries. Error ≈ 1/√k (k=256 → ~6%).
  */
object Sketches {

  /** First-8-hex-of-md5 as a uniform value in [0, 2³²) — the same
    * construction every hash in this engine uses, shared with the oracle
    * (and with the streaming register builder in StreamingAnalytics). */
  private[graft] def hash32(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10).cast("long")

  /** Per-group distinct-count sketch: the k smallest distinct hashes PER
    * GROUP via a ranking window — where KMV actually earns its keep at
    * scale: exact `countDistinct` shuffles every distinct (group, value)
    * pair to one reducer per group, while the sketch caps per-group state
    * at k values regardless of cardinality. Output one row per group:
    * (groupCol, k, kth_hash, kmv_estimate, exact_distinct, rel_error) —
    * exact rides along for gate/error visibility. */
  def kmvDistinctByGroup(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 256): DataFrame = {
    val hashes = df.select(col(groupCol), hash32(col(keyCol)).as("hv")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("hv")
    val topK = hashes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("m"), max(col("hv")).as("kth_hash"))
    val exact = hashes.groupBy(groupCol).agg(count(lit(1)).as("exact_distinct"))
    topK.join(exact, Seq(groupCol))
      .select(
        col(groupCol),
        lit(k.toLong).as("k"),
        col("kth_hash"),
        round(when(col("m") < k, col("m").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
            when(col("kth_hash") === 0, lit(null).cast("double")).otherwise(col("kth_hash"))), 4)
          .as("kmv_estimate"),
        col("exact_distinct"))
      .withColumn("rel_error",
        round(abs(col("kmv_estimate") - col("exact_distinct")) / col("exact_distinct"), 4))
      .orderBy(groupCol)
  }

  /** HyperLogLog distinct-count sketch of `keyCol` (Flajolet et al. 2007),
    * built portably: the 32-bit md5 hash splits into a `b`-bit bucket index
    * and a (32−b)-bit tail whose leading-zero rank feeds a per-bucket MAX
    * register; the raw HLL estimator αm·m²/Σ2^(−M_j) comes out as ONE
    * double division of engine-identical integers (the Σ is computed as an
    * exact BIGINT of 2^(RMAX−M_j) terms), so the DuckDB oracle reproduces
    * the estimate bit-for-bit. The standard small/large-range bias
    * corrections use ln(), whose libm rounding differs across engines —
    * deliberately omitted and documented: this is the raw estimator, which
    * is exactly what the cross-engine gate can pin.
    *
    * Scale shape vs KMV: registers are a map-side-combinable MAX per
    * bucket — fixed m-row state per partition, one m-row shuffle, no
    * per-group top-k heap; this is the sketch you merge across 100k
    * shards for free (register-wise MAX is associative/commutative).
    * Leading-zero rank is `RMAX − bitlength(tail)` via the engines'
    * shared minimal-binary `bin()` rendering — integer-exact on both.
    *
    * Output one row: (m, n_buckets_set, est_distinct, exact_distinct,
    * rel_error); exact rides along for gate/error visibility. */
  def hllDistinct(df: DataFrame, keyCol: String, b: Int = 6): DataFrame =
    hllEstimate(hllRegisters(df, keyCol, b), df, keyCol, b)

  /** The HLL register table (bucket, r) for a frame — the sketch's whole
    * state, m rows max. Map-side-combinable (partial MAX per bucket before
    * the shuffle); register tables from disjoint shards merge by
    * register-wise MAX, which [[hllMerge]] provides. */
  def hllRegisters(df: DataFrame, keyCol: String, b: Int = 6): DataFrame = {
    val remBits = 32 - b
    val rmax = remBits + 1
    df.select(hash32(col(keyCol)).as("hv"))
      .select(shiftright(col("hv"), remBits).as("bucket"),
        col("hv").bitwiseAND(lit((1L << remBits) - 1)).as("rem"))
      .select(col("bucket"),
        when(col("rem") === 0, lit(rmax))
          .otherwise(lit(rmax) - length(bin(col("rem")))).cast("long").as("rank"))
      .groupBy("bucket").agg(max(col("rank")).as("r"))
  }

  /** Merge per-shard register tables into one: register-wise MAX. This is
    * the 100k-shard path the sketch exists for — each shard publishes its
    * ≤m-row register table with its data, and a global distinct estimate is
    * one GROUP BY over (shards × m) tiny rows instead of a re-scan of the
    * corpus. Associativity/commutativity of MAX makes the merged registers
    * IDENTICAL to a single pass over the union — the `sketch_hll_merged`
    * gate pins that equality against the single-pass oracle. */
  def hllMerge(perShardRegs: DataFrame): DataFrame =
    perShardRegs.groupBy("bucket").agg(max(col("r")).as("r"))

  /** Sharded-build HLL: split the frame into `nShards` disjoint hash shards,
    * build each shard's register table independently, merge with
    * [[hllMerge]], estimate. Must equal [[hllDistinct]] bit-for-bit. */
  def hllMergedDistinct(df: DataFrame, keyCol: String, nShards: Int = 16,
      b: Int = 6): DataFrame = {
    val remBits = 32 - b
    val rmax = remBits + 1
    // shard assignment uses a DIFFERENT hash family (xxhash64) than the
    // sketch's md5-derived value: correlation between shard and bucket
    // would not break correctness (MAX merge is total), but independent
    // sharding is the honest model of arbitrary data placement
    val sharded = df.select(col(keyCol),
      pmod(xxhash64(col(keyCol).cast("string")), lit(nShards)).as("shard"))
    val perShard = sharded
      .select(col("shard"), hash32(col(keyCol)).as("hv"))
      .select(col("shard"),
        shiftright(col("hv"), remBits).as("bucket"),
        col("hv").bitwiseAND(lit((1L << remBits) - 1)).as("rem"))
      .select(col("shard"), col("bucket"),
        when(col("rem") === 0, lit(rmax))
          .otherwise(lit(rmax) - length(bin(col("rem")))).cast("long").as("rank"))
      .groupBy("shard", "bucket").agg(max(col("rank")).as("r"))
    hllEstimate(hllMerge(perShard), df, keyCol, b)
  }

  /** Trailing-window distinct users per hour by HLL register merge — the
    * "distinct users, last 24 h, every hour" dashboard query, answered by
    * MERGING the hourly ≤m-row register tables instead of re-scanning 24
    * hours of events per readout (the [[hllMerge]] associativity applied
    * across TIME; [[graft.streaming.StreamingAnalytics.windowedHllRegisters]]
    * maintains the same hourly tables at ingest). Each hourly register row
    * fans out to the `windowHours` readout hours it participates in — a
    * ×W fan-out of SKETCH rows (hours × m × W, kilobytes at any corpus
    * size), then one (hour, bucket) MAX and the raw estimator. The exact
    * side rides along for the gate by fanning out the distinct
    * (hour, user) pairs the same way — the audit a production pipeline
    * drops, and the cost the sketch path exists to avoid.
    *
    * Pure integer register arithmetic; the estimator is the engine's
    * power-of-two-exact raw form; rel_error is the integer-bp floor (the
    * round-of-division boundary lesson from the streaming HLL gate).
    * Output: one row per hour with ≥1 event — (window_h = hours since
    * epoch of the READOUT hour, m, n_buckets_set, est_distinct,
    * exact_distinct, rel_error). */
  def hllSlidingDistinct(events: DataFrame, windowHours: Int = 24,
      b: Int = 6): DataFrame = {
    val remBits = 32 - b
    val rmax = remBits + 1
    val m = 1 << b
    val scale = hllScale(b)
    val hourly = events
      .select((unix_timestamp(date_trunc("hour", col("ts")).cast("timestamp")) / 3600L)
          .cast("long").as("h"),
        hash32(col("user_id")).as("hv"),
        col("user_id"))
    val regs = hourly
      .select(col("h"), shiftright(col("hv"), remBits).as("bucket"),
        col("hv").bitwiseAND(lit((1L << remBits) - 1)).as("rem"))
      .select(col("h"), col("bucket"),
        when(col("rem") === 0, lit(rmax))
          .otherwise(lit(rmax) - length(bin(col("rem")))).cast("long").as("rank"))
      .groupBy("h", "bucket").agg(max(col("rank")).as("r"))
    val liveHours = broadcast(hourly.select("h").distinct())
    val merged = regs
      .select(explode(sequence(col("h"), col("h") + lit(windowHours - 1))).as("window_h"),
        col("bucket"), col("r"))
      .join(liveHours.withColumnRenamed("h", "window_h"), Seq("window_h"), "leftsemi")
      .groupBy("window_h", "bucket").agg(max(col("r")).as("r"))
      .groupBy("window_h").agg(
        count(lit(1)).as("n_buckets_set"),
        sum(expr(s"shiftleft(cast(1 as bigint), cast($rmax - r as int))")).as("s_present"))
    val exact = hourly.select("h", "user_id").distinct()
      .select(explode(sequence(col("h"), col("h") + lit(windowHours - 1))).as("window_h"),
        col("user_id"))
      .join(liveHours.withColumnRenamed("h", "window_h"), Seq("window_h"), "leftsemi")
      .groupBy("window_h").agg(countDistinct(col("user_id")).as("exact_distinct"))
    merged.join(exact, Seq("window_h"))
      .select(col("window_h"), lit(m.toLong).as("m"), col("n_buckets_set"),
        round(lit(scale) /
          (col("s_present") + (lit(m.toLong) - col("n_buckets_set")) * (1L << rmax)), 2)
          .as("est_distinct"),
        col("exact_distinct"))
      .withColumn("rel_error",
        expr("(abs(cast(round(est_distinct * 100) as bigint) - exact_distinct * 100) * 10000) " +
          "div (exact_distinct * 100)").cast("double") / 10000.0)
      .orderBy("window_h")
  }

  /** Raw-estimator readout over a merged register table (see
    * [[hllDistinct]] for why the estimator is the raw, un-bias-corrected
    * form: it pins bit-for-bit across engines). */
  private def hllEstimate(regs: DataFrame, df: DataFrame, keyCol: String,
      b: Int): DataFrame = {
    val m = 1 << b
    val rmax = 32 - b + 1
    val scale = hllScale(b)
    val s = regs.agg(
      count(lit(1)).as("n_buckets_set"),
      sum(expr(s"shiftleft(cast(1 as bigint), cast($rmax - r as int))")).as("s_present"))
    val exact = df.agg(countDistinct(col(keyCol)).as("exact_distinct"))
    s.crossJoin(exact)
      .select(
        lit(m.toLong).as("m"),
        col("n_buckets_set"),
        round(lit(scale) /
          (col("s_present") + (lit(m.toLong) - col("n_buckets_set")) * (1L << rmax)), 2)
          .as("est_distinct"),
        col("exact_distinct"))
      .withColumn("rel_error",
        round(abs(col("est_distinct") - col("exact_distinct")) / col("exact_distinct"), 4))
  }

  /** The estimator's scale constant α_m·m²·2^RMAX — public so the DuckDB
    * oracle renders the IDENTICAL double (every factor is a power of two
    * except α, so the product is one exact exponent shift of α). */
  def hllScale(b: Int = 6): Double = {
    val m = 1 << b
    Alpha(m) * m * m * (1L << (32 - b + 1)).toDouble
  }

  /** α_m for the raw HLL estimator (the m≥128 closed form, with the
    * published small-m constants below it). */
  private def Alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1 + 1.079 / m)
  }

  /** Per-group HLL distinct sketch — the production-common shape (distinct
    * users per event type / per domain): registers build per (group,
    * bucket) in ONE map-side-combinable aggregate whose state is ≤ m rows
    * per group regardless of cardinality, unlike exact countDistinct's
    * per-(group, value) shuffle. Estimator identical to [[hllDistinct]];
    * exact rides along for gate/error visibility. */
  def hllDistinctByGroup(df: DataFrame, groupCol: String, keyCol: String,
      b: Int = 6): DataFrame = {
    val m = 1 << b
    val remBits = 32 - b
    val rmax = remBits + 1
    val scale = hllScale(b)
    val regs = df
      .select(col(groupCol), hash32(col(keyCol)).as("hv"))
      .select(col(groupCol),
        shiftright(col("hv"), remBits).as("bucket"),
        col("hv").bitwiseAND(lit((1L << remBits) - 1)).as("rem"))
      .select(col(groupCol), col("bucket"),
        when(col("rem") === 0, lit(rmax))
          .otherwise(lit(rmax) - length(bin(col("rem")))).cast("long").as("rank"))
      .groupBy(groupCol, "bucket").agg(max(col("rank")).as("r"))
    val s = regs.groupBy(groupCol).agg(
      count(lit(1)).as("n_buckets_set"),
      sum(expr(s"shiftleft(cast(1 as bigint), cast($rmax - r as int))")).as("s_present"))
    val exact = df.groupBy(groupCol)
      .agg(countDistinct(col(keyCol)).as("exact_distinct"))
    s.join(exact, Seq(groupCol))
      .select(
        col(groupCol),
        lit(m.toLong).as("m"),
        col("n_buckets_set"),
        round(lit(scale) /
          (col("s_present") + (lit(m.toLong) - col("n_buckets_set")) * (1L << rmax)), 2)
          .as("est_distinct"),
        col("exact_distinct"))
      .withColumn("rel_error",
        round(abs(col("est_distinct") - col("exact_distinct")) / col("exact_distinct"), 4))
      .orderBy(groupCol)
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) over a token stream,
    * read out at the exact global top-k tokens so the gate can see both
    * the estimate and its one-sided error. The sketch is a d×w counter
    * matrix: each occurrence increments counter (j, h_j(token) mod w) for
    * j < d; a token's estimate is the MIN of its d counters, which can
    * only over-count (collisions add, never subtract). Counters build in
    * one map-side-combinable GROUP BY whose state is ≤ d·w rows per
    * partition — the fixed-size frequency sketch you merge across shards
    * by plain +, the heavy-hitter complement to HLL's distinct counting.
    * The build is census-sided: counter (j, b) sums tf(token) over the
    * token-frequency census rather than counting occurrences directly —
    * bit-identical counters, but the d salted hashes run once per
    * DISTINCT token (Zipf: orders of magnitude under the occurrence
    * count, the 10×-scale fix measured in PLANS.md).
    * Hash family: the engine's standard md5 construction, salted by j, so
    * the DuckDB oracle replays the exact counters. Output one row per
    * top-k token: (token, occurrences, cms_estimate, overestimate). */
  def cmsTokenCounts(docs: DataFrame, d: Int = 4, w: Int = 64,
      k: Int = 20): DataFrame = {
    // One token census feeds everything: counter (j, h_j(t)) accumulates
    // tf(t) — identical to counting occurrences directly, but the d salted
    // hashes run per DISTINCT token, not per occurrence (Zipf: orders of
    // magnitude fewer), and the exact top-k rides the same aggregate.
    val tf = graft.RunHygiene.stage(
      graft.functions.TextOps.withTokens(docs)
        .select(explode(col("toks")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("occurrences")))
    tf.count() // fill once: counters, top-k, and probes all read it
    val counters = tf.select(col("occurrences"),
        explode(array((0 until d).map(lit): _*)).as("j"),
        col("token"))
      .select(col("j"),
        pmod(hash32(concat_ws("_", col("j"), col("token"))), lit(w.toLong)).as("bucket"),
        col("occurrences"))
      .groupBy("j", "bucket").agg(sum(col("occurrences")).as("c"))
    val top = tf.orderBy(col("occurrences").desc, col("token")).limit(k)
    val probes = top.select(col("token"), col("occurrences"),
        explode(array((0 until d).map(lit): _*)).as("j"))
      .select(col("token"), col("occurrences"), col("j"),
        pmod(hash32(concat_ws("_", col("j"), col("token"))), lit(w.toLong)).as("bucket"))
    probes.join(broadcast(counters), Seq("j", "bucket"))
      .groupBy("token", "occurrences").agg(min(col("c")).as("cms_estimate"))
      .select(col("token"), col("occurrences"), col("cms_estimate"),
        (col("cms_estimate") - col("occurrences")).as("overestimate"))
      .orderBy(col("occurrences").desc, col("token"))
  }

  /** Global distinct-count sketch of `keyCol`: one row
    * (k, kth_hash, kmv_estimate, exact_distinct, rel_error). The exact
    * count rides along here for gate/error visibility; a production
    * pipeline would drop it (that is the entire point of the sketch). */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int = 256): DataFrame = {
    val hashes = df.select(hash32(col(keyCol)).as("hv")).distinct()
    val topK = hashes.orderBy("hv").limit(k)
      .agg(count(lit(1)).as("m"), max(col("hv")).as("kth_hash"))
    val exact = hashes.agg(count(lit(1)).as("exact_distinct"))
    topK.crossJoin(exact)
      .select(
        lit(k.toLong).as("k"),
        col("kth_hash"),
        round(when(col("m") < k, col("m").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
            when(col("kth_hash") === 0, lit(null).cast("double")).otherwise(col("kth_hash"))), 4)
          .as("kmv_estimate"),
        col("exact_distinct"))
      .withColumn("rel_error",
        round(abs(col("kmv_estimate") - col("exact_distinct")) / col("exact_distinct"), 4))
  }

  /** HDR-histogram quantile sketch: MERGEABLE bounded-relative-error
    * quantiles with ZERO float nondeterminism — the telemetry-percentile
    * workhorse (HdrHistogram / DDSketch family) next to the sampling
    * sketch below, which bounds RANK error instead of value error and
    * cannot merge. Values quantize to integer cents, then to a log2
    * octave × 2^subBits linear sub-bucket grid computed ENTIRELY from
    * integer bit arithmetic (octave = binary bit-length − 1; sub-bucket =
    * the top subBits+1 bits) — no log(), so both engines derive the
    * identical bucket for every value, unlike a log-gamma DDSketch whose
    * ceil(log x / log γ) can straddle a bucket boundary across libms.
    * Values below 2^(subBits+1) get exact unit buckets (the HDR trick).
    *
    * The register table (group, bucket, count) is the WHOLE sketch state:
    * one map-side-combinable aggregation over the corpus, O(#buckets) =
    * octaves × 2^subBits rows per group regardless of corpus size, and
    * merging sketches is count addition — per-hour registers sum into
    * daily percentiles without touching raw data (the 100 TB shape; see
    * [[hdrSlidingQuantiles]]). Quantile read-out: the lower quantile
    * (smallest value whose running count reaches ceil(q·n/100), computed
    * with integer arithmetic `(q*n + 99) div 100`) via a cumulative walk
    * over the register table — a window over a domain-sized frame, never
    * the corpus. Estimates are bucket midpoints in integer HALF-cents
    * (2·lo + width − 1), so the whole gate is integer-exact end to end;
    * relative error ≤ (width−1)/(2·lo) < 2^−(subBits+1) — 15625 ppm at
    * subBits=5. The exact quantile rides along for the error audit via
    * the same walk at unit resolution over the exact cents census (also
    * domain-sized: the value grid, not the corpus — the two-pass
    * heavy-hitters precedent). Non-positive cents take the reserved
    * bucket −1 with estimate 0 (clamp documented; the gate corpora are
    * non-negative and zeros audit at error 0). Null values are excluded
    * on both engines. */
  /** The HDR grid: log2-octave × 2^subBits linear sub-bucket index from a
    * LONG cents column named `c` — integer bit arithmetic only (see
    * [[hdrQuantiles]]). ONE definition shared by the batch sketches and
    * the streaming register fold ([[graft.streaming.StreamingAnalytics
    * .windowedHdrRegisters]]) so the grids can never drift. */
  private[graft] def hdrBucketed(cents: DataFrame, subBits: Int): DataFrame = {
    val s = subBits
    cents.withColumn("e",
        when(col("c") >= 1L, length(expr("bin(c)")) - 1))
      .withColumn("idx",
        when(col("c") < 1L, lit(-1L))
          .when(col("e") <= s, col("c"))
          .otherwise((col("e") - s) * lit(1L << s) +
            expr(s"shiftright(c, cast(e - $s as int))")))
  }

  /** Bucket-midpoint decode in integer half-cents from a column named
    * `idx` — the read-out twin of [[hdrBucketed]], equally shared. */
  private[graft] def hdrEst2(subBits: Int): org.apache.spark.sql.Column = {
    val s = subBits
    val unit = 1L << (s + 1)
    when(col("idx") < 0L, lit(0L))
      .when(col("idx") < unit, col("idx") * 2) // exact unit bucket
      .otherwise {
        // decode: blk = idx div 2^s = e−s+1; m = idx mod 2^s + 2^s;
        // width = 2^(blk−1); lo = m · width
        val m = col("idx") % lit(1L << s) + lit(1L << s)
        val w = expr(s"shiftleft(1L, cast(idx div ${1L << s} as int) - 1)")
        m * w * 2 + w - 1
      }
  }

  def hdrQuantiles(df: DataFrame, valueCol: String, typeCol: String,
      qs: Seq[Int] = Seq(50, 90, 99), subBits: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val s = subBits
    val cents = df.filter(col(valueCol).isNotNull)
      .select(col(typeCol).as("g"),
        round(col(valueCol) * 100).cast("long").as("c"))
    val bucketed = hdrBucketed(cents, s)
    val regs = bucketed.groupBy("g", "idx").agg(count(lit(1)).as("cnt"))
    val totals = regs.groupBy("g").agg(sum(col("cnt")).as("n"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("idx")
    val cum = regs.withColumn("cum", sum(col("cnt")).over(wCum))
    val qdf = broadcast(qs.toDF("q_pct"))
    // per (g, q): the FIRST bucket whose running count reaches the target
    val est = cum.join(totals, Seq("g")).crossJoin(qdf)
      .filter(col("cum") >= expr("(q_pct * n + 99) div 100"))
      .groupBy("g", "q_pct", "n")
      .agg(min(col("idx")).as("idx"))
      .withColumn("est2", hdrEst2(s))
    // exact walk at unit resolution over the value grid (domain-sized)
    val exactRegs = cents.groupBy("g", "c").agg(count(lit(1)).as("cnt"))
    val exCum = exactRegs.withColumn("cum", sum(col("cnt")).over(
      org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("c")))
    val exact = exCum.join(totals, Seq("g")).crossJoin(qdf)
      .filter(col("cum") >= expr("(q_pct * n + 99) div 100"))
      .groupBy("g", "q_pct")
      .agg(min(col("c")).as("c"))
      .withColumn("exact2", when(col("c") < 0L, lit(0L)).otherwise(col("c") * 2))
      .drop("c")
    est.join(exact, Seq("g", "q_pct"))
      .select(col("g").as("event_type"), col("q_pct").cast("long").as("q_pct"),
        col("n"), col("est2"), col("exact2"))
      .withColumn("rel_err_ppm",
        when(col("exact2") === 0L, lit(0L))
          .otherwise(expr("abs(est2 - exact2) * 1000000 div exact2")))
      .withColumn("within_bound", col("rel_err_ppm") <= lit(1000000L >> (s + 1)))
      .orderBy("event_type", "q_pct")
  }

  /** Rolling-window quantiles from MERGED per-day HDR registers — the
    * production read-out [[hdrQuantiles]]'s scaladoc promises: per day d,
    * the p50/p99 of the trailing `windowDays` days computed ONLY from the
    * per-day register tables (counts summed per bucket across the window,
    * then the same integer cumulative walk), never from raw rows. At
    * 100 TB this is the percentile-dashboard shape: per-shard/hour
    * sketches land as tiny register tables, and any window over them is
    * arithmetic on O(#buckets × days) rows. The exact trailing-window
    * quantile rides along for the audit, from a per-day EXACT value-grid
    * census merged the same way (domain-sized, corpus-independent).
    * Output per (day, q_pct): (n_window, est2, exact2, rel_err_ppm,
    * within_bound) — integer-exact end to end. */
  def hdrSlidingQuantiles(events: DataFrame, qs: Seq[Int] = Seq(50, 99),
      windowDays: Int = 3, subBits: Int = 5): DataFrame = {
    val cents = events.filter(col("value").isNotNull)
      .select(to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("c"))
    // per-day registers — the only corpus-sized pass
    val dayRegs = hdrBucketed(cents, subBits)
      .groupBy("day", "idx").agg(count(lit(1)).as("cnt"))
    hdrSlidingReadout(dayRegs, cents, qs, windowDays, subBits)
  }

  /** The trailing-window read-out over PER-DAY register tables — shared
    * verbatim by the batch sketch above and the streaming register fold
    * ([[graft.streaming.StreamingAnalytics.replayHdrSliding]]), which
    * differ only in WHERE `dayRegs` comes from (one batch pass vs
    * watermark-emitted micro-batch partials; equal by count additivity).
    * `cents` (day, c LONG) feeds only the exact-quantile audit columns —
    * it is batch-side in both callers. */
  private[graft] def hdrSlidingReadout(dayRegs: DataFrame, cents: DataFrame,
      qs: Seq[Int], windowDays: Int, subBits: Int): DataFrame = {
    val spark = dayRegs.sparkSession
    import spark.implicits._
    val s = subBits
    val days = dayRegs.select("day").distinct()
    // roster of (window end day, member day) pairs — days × windowDays rows
    val members = days.as("d")
      .join(days.select(col("day").as("mday")).as("m"),
        col("mday") <= col("day") &&
          col("mday") >= date_sub(col("day"), windowDays - 1))
    // merge = count addition per bucket across the window's member days
    val merged = members.join(dayRegs.withColumnRenamed("day", "mday"), Seq("mday"))
      .groupBy("day", "idx").agg(sum(col("cnt")).as("cnt"))
    val totals = merged.groupBy("day").agg(sum(col("cnt")).as("n_window"))
    val cum = merged.withColumn("cum", sum(col("cnt")).over(
      org.apache.spark.sql.expressions.Window.partitionBy("day").orderBy("idx")))
    val qdf = broadcast(qs.toDF("q_pct"))
    val est = cum.join(totals, Seq("day")).crossJoin(qdf)
      .filter(col("cum") >= expr("(q_pct * n_window + 99) div 100"))
      .groupBy("day", "q_pct", "n_window")
      .agg(min(col("idx")).as("idx"))
      .withColumn("est2", hdrEst2(s))
    // exact audit: per-day exact value-grid census merged across the window
    val dayExact = cents.groupBy("day", "c").agg(count(lit(1)).as("cnt"))
    val mergedExact = members.join(dayExact.withColumnRenamed("day", "mday"), Seq("mday"))
      .groupBy("day", "c").agg(sum(col("cnt")).as("cnt"))
    val exCum = mergedExact.withColumn("cum", sum(col("cnt")).over(
      org.apache.spark.sql.expressions.Window.partitionBy("day").orderBy("c")))
    val exact = exCum.join(totals, Seq("day")).crossJoin(qdf)
      .filter(col("cum") >= expr("(q_pct * n_window + 99) div 100"))
      .groupBy("day", "q_pct")
      .agg(min(col("c")).as("c"))
      .withColumn("exact2", when(col("c") < 0L, lit(0L)).otherwise(col("c") * 2))
      .drop("c")
    est.join(exact, Seq("day", "q_pct"))
      .select(col("day"), col("q_pct").cast("long").as("q_pct"),
        col("n_window"), col("est2"), col("exact2"))
      .withColumn("rel_err_ppm",
        when(col("exact2") === 0L, lit(0L))
          .otherwise(expr("abs(est2 - exact2) * 1000000 div exact2")))
      .withColumn("within_bound", col("rel_err_ppm") <= lit(1000000L >> (s + 1)))
      .orderBy("day", "q_pct")
  }

  /** Deterministic quantile sketch: estimate quantiles from the bottom-k-
    * by-hash row sample (the same md5 order as KMV, so a uniform random
    * sample with a portable, engine-independent identity — where Spark's
    * `percentile_approx` sketch bytes can't cross engines). Estimates use
    * the nearest-rank-below rule on the sorted sample — an ELEMENT of the
    * data, never an interpolated average, so both engines emit the
    * identical double.
    *
    * Plan: the sample is `TakeOrderedAndProject(k)` over (hash, value) —
    * per-partition heaps + driver merge, no global sort, k rows of driver
    * state; ranking the k-row sample is a single-partition window over k
    * rows by construction. Error is the sampling error of a k-sample
    * (~1/√k per quantile). Null values are excluded (quantiles of known
    * values; the oracle filters identically). */
  def hashSampleQuantiles(df: DataFrame, valueCol: String, keyCol: String,
      k: Int = 256, qs: Seq[Int] = Seq(10, 25, 50, 75, 90)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("v"), hash32(col(keyCol)).as("hv"))
      .orderBy("hv").limit(k)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val wRank = org.apache.spark.sql.expressions.Window.orderBy("v", "hv")
    val ranked = sample
      .withColumn("rn", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wAll))
    ranked.join(broadcast(qs.toDF("q")),
        col("rn") === expr("(q * (m - 1)) div 100") + 1)
      .select(col("q").cast("long").as("q"), col("v").as("est_value"),
        col("m").cast("long").as("sample_k"))
      .orderBy("q")
  }

  /** KMV set-operation estimates for every pair of groups: Jaccard,
    * union, and intersection sizes from the groups' k-minimum-value
    * sketches alone (Beyer et al., SIGMOD 2007) — the audience-overlap /
    * cross-domain-contamination readout that never rejoins the raw data.
    * For a pair (a, b): L = the k smallest distinct hashes of
    * S_a ∪ S_b; ρ = |{h ∈ L : h ∈ S_a ∧ h ∈ S_b}| / |L| estimates
    * J(a, b); the union size is L's own KMV estimate; intersection ≈
    * ρ·union. When |L| < k the sketches hold the whole union and all
    * three are exact.
    *
    * Scale shape: the corpus is touched exactly once (distinct (group,
    * hash) projection); sketches are k rows per group — FIXED regardless
    * of cardinality — so the pairwise stage is arithmetic over
    * broadcast-size tables: |groups|²·k rows at worst, never a row-level
    * join of the raw sets. The exact Jaccard rides along for gate/error
    * visibility (one extra keyed aggregate over the distinct projection —
    * a production pipeline drops it).
    *
    * Output per pair (a < b): (type_a, type_b, k, m, jaccard_est,
    * union_est, intersection_est, exact_jaccard). */
  def kmvJaccardPairs(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 256): DataFrame = {
    val hashes = df.select(col(groupCol).as("grp"), hash32(col(keyCol)).as("hv")).distinct()
    hashes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    val wg = org.apache.spark.sql.expressions.Window.partitionBy("grp").orderBy("hv")
    val sk = hashes.withColumn("rn", row_number().over(wg)).filter(col("rn") <= k)
      .select("grp", "hv")
    val pairs = sk.select(col("grp").as("type_a")).distinct()
      .crossJoin(sk.select(col("grp").as("type_b")).distinct())
      .filter(col("type_a") < col("type_b"))
    val member = pairs.join(broadcast(sk),
        col("grp") === col("type_a") || col("grp") === col("type_b"))
      .groupBy("type_a", "type_b", "hv")
      .agg(max((col("grp") === col("type_a")).cast("long")).as("in_a"),
        max((col("grp") === col("type_b")).cast("long")).as("in_b"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("type_a", "type_b").orderBy("hv")
    val ell = member.withColumn("rn", row_number().over(wp)).filter(col("rn") <= k)
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("m"), max(col("hv")).as("kth_hash"),
        sum(col("in_a") * col("in_b")).as("n_both"))
    // exact Jaccard stays keyed at corpus scale: per-hash self-join (fan-out
    // bounded by |groups| per hash) for intersections, tiny size census for
    // the union via inclusion-exclusion
    val sizes = hashes.groupBy("grp").agg(count(lit(1)).as("n"))
    val inter = hashes.as("x")
      .join(hashes.as("y"), col("x.hv") === col("y.hv") && col("x.grp") < col("y.grp"))
      .groupBy(col("x.grp").as("type_a"), col("y.grp").as("type_b"))
      .agg(count(lit(1)).as("n_inter"))
    val exact = pairs
      .join(broadcast(sizes.select(col("grp").as("type_a"), col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(sizes.select(col("grp").as("type_b"), col("n").as("n_b"))), Seq("type_b"))
      .join(inter, Seq("type_a", "type_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .select(col("type_a"), col("type_b"),
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 4).as("exact_jaccard"))
    val unionEst = when(col("m") < k, col("m").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
        when(col("kth_hash") === 0, lit(null).cast("double")).otherwise(col("kth_hash")))
    ell.join(exact, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), lit(k.toLong).as("k"), col("m"),
        round(col("n_both").cast("double") / col("m"), 4).as("jaccard_est"),
        round(unionEst, 4).as("union_est"),
        round((col("n_both").cast("double") / col("m")) * unionEst, 4)
          .as("intersection_est"),
        col("exact_jaccard"))
      .orderBy("type_a", "type_b")
  }

  /** Portable Bloom filter with MEASURED false-positive rate — the
    * membership sketch behind semi-join pushdown (`join_bloom_revenue`
    * uses Spark's native builder; this is its engine-portable,
    * oracle-replayable twin, plus the FPR readout that sizing decisions
    * come from). Members are the high-value order customers; probes are
    * ALL customers; bit j of a key = md5(key ":" j) mod `mBits` — the
    * engine's standard hash family, salted per hash function.
    *
    * The filter is expressed RELATIONALLY (set of set-bit positions +
    * an all-k-positions-present semi-join) so DuckDB replays it exactly;
    * a production build packs the same positions into a bitmap and
    * broadcasts it — the positions, and therefore every verdict and the
    * FPR itself, are identical by construction. All joins are keyed on
    * the bit position or the key; candidate volume is k rows per probe.
    *
    * Output: one row — (n_members, n_nonmembers, n_bits_set, n_fp,
    * fp_bp) with fp_bp = false positives per 10k non-members; the
    * theoretical optimum at these parameters is (1 − e^{−kn/m})^k. */
  def bloomFpr(orders: DataFrame, customer: DataFrame,
      minPrice: Double = 400000.0, mBits: Int = 1 << 14,
      kHashes: Int = 3): DataFrame = {
    def pos(key: Column, j: Int): Column =
      pmod(conv(substring(md5(concat(key.cast("string"), lit(":" + j)).cast("binary")),
        1, 8), 16, 10).cast("long"), lit(mBits.toLong))
    val members = graft.RunHygiene.stage(
      orders.filter(col("o_totalprice") > minPrice)
        .select(col("o_custkey").as("key")).distinct())
    members.count() // read by the bit build and the probe tag
    val bits = members
      .select(explode(array((0 until kHashes).map(j => pos(col("key"), j)): _*)).as("bit"))
      .distinct()
    val probes = customer.select(col("c_custkey").as("key"))
      .join(members.select(col("key"), lit(true).as("is_member")), Seq("key"), "left")
      .withColumn("is_member", coalesce(col("is_member"), lit(false)))
    val tested = probes
      .select(col("key"), col("is_member"),
        explode(array((0 until kHashes).map(j => pos(col("key"), j)): _*)).as("bit"))
      .join(bits.select(col("bit"), lit(1L).as("hit")), Seq("bit"), "left")
      .groupBy("key", "is_member")
      .agg((count(lit(1)) === sum(coalesce(col("hit"), lit(0L)))).as("positive"))
    tested.agg(
        sum(when(col("is_member"), 1L).otherwise(0L)).as("n_members"),
        sum(when(!col("is_member"), 1L).otherwise(0L)).as("n_nonmembers"),
        sum(when(!col("is_member") && col("positive"), 1L).otherwise(0L)).as("n_fp"))
      .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_bits_set"))))
      .select(col("n_members"), col("n_nonmembers"), col("n_bits_set"),
        col("n_fp"), expr("n_fp * 10000 div nullif(n_nonmembers, 0)").as("fp_bp"))
  }

  /** Exact heavy hitters by two passes over one staged census, with a
    * Misra–Gries candidate sketch between them — the mergeable-summaries
    * construction (Agarwal et al., PODS'12): a per-shard frequency table
    * truncated at its (k+1)-th largest count is a valid MG summary, and
    * summing summaries then truncating again keeps the total
    * underestimate ≤ n/(k+1). So every key with true frequency
    * > n/(k+1) survives into the candidate set (no false negatives),
    * and the second pass reads EXACT counts for only those ≤ shards×k
    * candidates — the 100 TB shape: pass 1 is one map-side-combinable
    * census whose reduced state is ≤ k rows per shard, pass 2 is a
    * broadcast semi-join of a bounded candidate list, and nothing
    * key-cardinality-sized ever sits in memory.
    *
    * Shards are deterministic md5 buckets of `idCol` (the occurrence
    * identity, NOT the counted key — keys spread across shards like rows
    * spread across executors), so the DuckDB oracle replays the sketch
    * bit-for-bit: same per-shard ranks, same truncations, same merged
    * estimates. Reported rows are keys with occurrences·(k+1) > n — a
    * guaranteed subset of the candidates — with the exact count, the
    * sketch's lower-bound estimate, its (provably ≤ n/(k+1))
    * underestimate, and the integer-exact share in ppm.
    *
    * Output: (keyCol, occurrences, mg_estimate, underestimate,
    * share_ppm) ordered by occurrences desc, key. */
  def heavyHitters(df: DataFrame, keyCol: String, idCol: String,
      k: Int = 128, nShards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // One shard×key census feeds the sketch, the exact pass, and n.
    val per = graft.RunHygiene.stage(
      df.select(pmod(hash32(col(idCol)), lit(nShards.toLong)).as("shard"),
          col(keyCol).as("key"))
        .groupBy("shard", "key").agg(count(lit(1)).as("c")))
    per.count() // fill once: sketch, exact counts, and total all read it
    val byShard = Window.partitionBy("shard").orderBy(col("c").desc, col("key"))
    // rank ≤ k+1 up front: rows ranked deeper have c ≤ t_s, so their
    // summary contribution is ≤ 0 and they can never survive the filter —
    // and the early rank limit plans as WindowGroupLimit (per-shard
    // top-(k+1) heaps), so the window never materializes a
    // key-cardinality-sized shard census.
    val ranked = per.withColumn("rk", row_number().over(byShard))
      .filter(col("rk") <= k + 1)
    val thr = ranked.filter(col("rk") === k + 1)
      .select(col("shard"), col("c").as("t_s"))
    val merged = ranked.join(broadcast(thr), Seq("shard"), "left")
      .withColumn("mgc", col("c") - coalesce(col("t_s"), lit(0L)))
      .filter(col("mgc") > 0)
      .groupBy("key").agg(sum(col("mgc")).as("m"))
    // Global truncation threshold: the (k+1)-th largest merged count —
    // TakeOrderedAndProject over ≤ shards×k summary rows, never a global
    // window; 0 when fewer than k+1 keys survive the shard summaries.
    val tg = merged.orderBy(col("m").desc, col("key")).limit(k + 1)
      .agg(when(count(lit(1)) < k + 1, lit(0L)).otherwise(min(col("m"))).as("t_g"))
    val cands = merged.crossJoin(broadcast(tg))
      .withColumn("mg_estimate", col("m") - col("t_g"))
      .filter(col("mg_estimate") > 0)
      .select("key", "mg_estimate")
    // Exact pass: the candidate list prunes BEFORE the key aggregate, so
    // the verification reduce state is ≤ |candidates|, not |keys|.
    val exact = per.join(broadcast(cands.select("key")), Seq("key"), "leftsemi")
      .groupBy("key").agg(sum(col("c")).as("occurrences"))
    val total = per.agg(sum(col("c")).as("n"))
    exact.join(broadcast(cands), Seq("key"))
      .crossJoin(broadcast(total))
      .filter(col("occurrences") * (k + 1) > col("n"))
      .select(col("key").as(keyCol), col("occurrences"), col("mg_estimate"),
        (col("occurrences") - col("mg_estimate")).as("underestimate"),
        expr("occurrences * 1000000 div n").as("share_ppm"))
      .orderBy(col("occurrences").desc, col(keyCol))
  }
}
