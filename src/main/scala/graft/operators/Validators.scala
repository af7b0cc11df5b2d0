package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation surface
  * (reference: src/thrive_cash_processing_dag.py:289-423 and :639-679).
  *
  * Each check is a declarative DataFrame the caller can count / collect /
  * union into a validation report — all checks scan the same cached matched
  * result, none loops over customers.
  */
object Validators {

  /** V1 required-fields check (reference: src/thrive_cash_processing_dag.py:642-647):
    * structural comparison against the enforced contract — returns the list
    * of missing column names (empty = pass). Purely driver-side schema
    * metadata, no job runs. */
  def missingRequiredFields(df: DataFrame): Seq[String] = {
    val present = df.schema.fieldNames.map(_.toLowerCase).toSet
    graft.sources.Tables.transactionSchema.fieldNames.toSeq
      .filterNot(f => present(f.toLowerCase))
  }

  /** Layer-1 source validation V1-V4
    * (reference: src/thrive_cash_processing_dag.py:639-679): per-required-
    * field null counts, non-numeric amount count, invalid enum count —
    * one aggregate row. */
  def sourceQuality(txns: DataFrame): DataFrame = {
    def nulls(c: String) = sum(col(c).isNull.cast("long")).as(s"null_$c")
    // non-numeric amount (reference :658-669): the try_cast scan only runs
    // when the feed is actually untyped (string amounts — raw CSV/xlsx);
    // a schema-typed numeric column CANNOT hold a non-numeric value, so the
    // per-row double→string→double round-trip would be pure dead weight at
    // scale (constant 0, same value the oracle computes on typed parquet)
    val nonNumeric = txns.schema("amount").dataType match {
      case org.apache.spark.sql.types.StringType =>
        sum((expr("try_cast(amount AS double)").isNull
          && col("amount").isNotNull).cast("long"))
      case _ => lit(0L)
    }
    txns.agg(
      count(lit(1)).as("row_count"),
      nulls("transaction_id"), nulls("customer_id"), nulls("amount"),
      nulls("timestamp"), nulls("transaction_type"),
      nonNumeric.as("non_numeric_amount"),
      sum((!col("transaction_type").isin("earned", "spent", "expired")).cast("long"))
        .as("invalid_type_count"))
  }

  /** Offending-row samples for the source checks that failed (reference
    * :651-655 logs the first 10 offending ids per check): one small
    * `limit(n)` collect per FAILED check only — the caller passes the names
    * reported by [[sourceQuality]], so clean runs cost zero extra jobs.
    * Rows whose transaction_id is itself null surface as `<null>`. */
  def sourceQualitySamples(txns: DataFrame, failedChecks: Seq[String], n: Int = 10): Map[String, Seq[String]] = {
    import org.apache.spark.sql.Column
    def cond(check: String): Column = check match {
      case "null_transaction_id"   => col("transaction_id").isNull
      case "null_customer_id"      => col("customer_id").isNull
      case "null_amount"           => col("amount").isNull
      case "null_timestamp"        => col("timestamp").isNull
      case "null_transaction_type" => col("transaction_type").isNull
      case "non_numeric_amount" =>
        expr("try_cast(cast(amount AS string) AS double)").isNull && col("amount").isNotNull
      case "invalid_type_count" => !col("transaction_type").isin("earned", "spent", "expired")
      case other => throw new IllegalArgumentException(s"unknown source-quality check: $other")
    }
    failedChecks.map { check =>
      val sample = txns.filter(cond(check))
        .select(coalesce(col("transaction_id"), lit("<null>")).as("id"))
        .orderBy("id").limit(n)
        .collect().map(_.getString(0)).toSeq
      check -> sample
    }.toMap
  }

  /** V7 referential integrity
    * (reference: src/thrive_cash_processing_dag.py:325-333).
    *
    * NOTE a reference bug: the original compares REDEEMIDs against *earned*
    * TRANS_IDs, but REDEEMID always holds a spent/expired id
    * (src/fifo_matching.py:95), so on any matched data the original check
    * would flag every REDEEMID and abort the DAG. We implement the *intended*
    * invariant — every REDEEMID references a valid spent/expired TRANS_ID —
    * as a left-anti join; empty result = pass. */
  def invalidRedeemIds(matched: DataFrame): DataFrame = {
    val redeems = matched.filter(col("REDEEMID").isNotNull)
      .select(col("REDEEMID"), col("TRANS_ID").as("earned_id"))
    val seIds = matched.filter(col("TCTYPE").isin("spent", "expired"))
      .select(col("TRANS_ID").as("se_id"))
    redeems.join(seIds, redeems("REDEEMID") === seIds("se_id"), "left_anti")
  }

  /** V8 per-customer balance equation
    * (reference: src/thrive_cash_processing_dag.py:335-355):
    * |earned_total − (|spent| + |expired| + remaining_unmatched_earned)| ≤ 0.01.
    *
    * Faithful semantics: with 1:1 amount-ignoring matching this only balances
    * when each matched earned's amount equals its redeemer's — mismatches are
    * *expected* on real data and surface per customer here rather than
    * aborting silently. One grouped aggregate replaces the O(customers) loop. */
  def balanceEquation(matched: DataFrame, tolerance: Double = 0.01): DataFrame =
    matched.groupBy(col("CUSTOMERID").as("customer_id"))
      .agg(
        sum(when(col("TCTYPE") === "earned", col("AMOUNT")).otherwise(0.0)).as("earned_total"),
        abs(sum(when(col("TCTYPE") === "spent", col("AMOUNT")).otherwise(0.0))).as("spent_total"),
        abs(sum(when(col("TCTYPE") === "expired", col("AMOUNT")).otherwise(0.0))).as("expired_total"),
        sum(when(col("TCTYPE") === "earned" && col("REDEEMID").isNull, col("AMOUNT")).otherwise(0.0))
          .as("remaining_unmatched"))
      .withColumn("discrepancy",
        abs(col("earned_total") - (col("spent_total") + col("expired_total") + col("remaining_unmatched"))))
      .withColumn("balanced", col("discrepancy") <= tolerance)

  /** V9 chronology check, strict mode
    * (reference: src/thrive_cash_processing_dag.py:357-374).
    *
    * The reference loop is dead code — it iterates REDEEMID.notna() rows then
    * requires TCTYPE in (spent, expired), which never co-occur — so the
    * faithful default is a no-op. This is the *intended* check: earned rows
    * matched to a redeemer that precedes them chronologically. */
  def chronologyViolations(matched: DataFrame): DataFrame = {
    val earned = matched.filter(col("REDEEMID").isNotNull)
      .select(col("TRANS_ID").as("earned_id"), col("CUSTOMERID").as("customer_id"),
        col("CREATEDAT").as("earned_at"), col("REDEEMID"))
    val se = matched.filter(col("TCTYPE").isin("spent", "expired"))
      .select(col("TRANS_ID").as("se_id"), col("CREATEDAT").as("redeemed_at"))
    earned.join(se, earned("REDEEMID") === se("se_id"))
      .filter(col("earned_at") > col("redeemed_at"))
      .select("customer_id", "earned_id", "earned_at", "REDEEMID", "redeemed_at")
  }

  /** V10 duplicate (TRANS_ID, REDEEMID) pairs
    * (reference: src/thrive_cash_processing_dag.py:376-383, log-only). */
  def duplicatePairs(matched: DataFrame): DataFrame =
    matched.groupBy("TRANS_ID", "REDEEMID").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** V6/V11 result summary metrics
    * (reference: src/thrive_cash_processing_dag.py:385-417), one row. */
  def resultSummary(matched: DataFrame): DataFrame =
    matched.agg(
      count(lit(1)).as("total_rows"),
      sum(col("REDEEMID").isNotNull.cast("long")).as("rows_with_redeemid"),
      sum(col("REDEEMID").isNull.cast("long")).as("rows_without_redeemid"),
      sum(when(col("TCTYPE") === "earned", col("AMOUNT")).otherwise(0.0)).as("total_earned"),
      abs(sum(when(col("TCTYPE") === "spent", col("AMOUNT")).otherwise(0.0))).as("total_spent"),
      abs(sum(when(col("TCTYPE") === "expired", col("AMOUNT")).otherwise(0.0))).as("total_expired"),
      sum((col("TCTYPE").isin("spent", "expired") && col("REDEEMID").isNull).cast("long"))
        .as("unmatched_spent_expired"))

  /** Pearson chi-square independence test between two categorical columns
    * (documents' source × lang by default) — the drift/balance screen a
    * curation pipeline runs to ask "is language mix independent of
    * source?": χ² = Σ_cells (o − e)²/e with e = rowTotal·colTotal/N. A
    * large statistic against the (r−1)(c−1) dof says the mix is skewed
    * per source (sampling weights need per-(source, lang) cells, not a
    * product of marginals).
    *
    * Determinism: each cell's contribution is a fixed double expression of
    * exact integer counts, QUANTIZED to integer micro-units (floor) before
    * the sum (the KL convention), so the cell aggregation order cannot
    * drift. Expected counts compute as (CAST(n_row AS DOUBLE)·n_col)/N —
    * double from the first factor, so the product never overflows BIGINT
    * at any corpus size.
    *
    * Shape: one (r×c)-cell aggregate (map-side combinable), marginals from
    * the cells themselves (tiny), broadcast joins, 1-row readout. */
  def chiSquareIndependence(df: DataFrame, rowCol: String = "source",
      colCol: String = "lang"): DataFrame = {
    val cells = graft.RunHygiene.stage(
      df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
        .agg(count(lit(1)).as("o")))
    cells.count() // fill once: marginals, total, and contributions all read it
    val rowTot = cells.groupBy("r").agg(sum("o").as("n_r"))
    val colTot = cells.groupBy("c").agg(sum("o").as("n_c"))
    val total = cells.agg(sum("o").as("n_total"))
    val contrib = cells
      .join(broadcast(rowTot), Seq("r")).join(broadcast(colTot), Seq("c"))
      .crossJoin(broadcast(total))
      .withColumn("e", col("n_r").cast("double") * col("n_c") / col("n_total"))
      .withColumn("d", col("o").cast("double") - col("e"))
      .withColumn("micro",
        floor(col("d") * col("d") / col("e") * lit(1e6)).cast("long"))
    val dims = contrib.agg(
      countDistinct(col("r")).as("n_rows"),
      countDistinct(col("c")).as("n_cols"),
      count(lit(1)).as("n_cells"),
      sum(col("micro")).as("sum_micro"))
    dims.select(col("n_rows"), col("n_cols"), col("n_cells"),
      ((col("n_rows") - 1) * (col("n_cols") - 1)).as("dof"),
      round(col("sum_micro").cast("double") / lit(1e6), 4).as("chi2"))
  }

  /** Benford first-digit expectation log10(1+1/d), in integer basis points —
    * ONE table rendered into both the Spark plan and the DuckDB oracle (the
    * shared-constant convention), so no engine evaluates a transcendental. */
  val BenfordBp: Map[Int, Long] =
    (1 to 9).map(d => d -> math.round(math.log10(1 + 1.0 / d) * 10000)).toMap

  /** Benford's-law first-digit profile per transaction type — the classic
    * fabricated-amounts screen a finance pipeline runs over its ledger
    * (Nigrini 1996; synthetic/uniform amounts light it up too, which is the
    * point: ANY systematic deviation from log10(1+1/d) says the amounts are
    * not organic). Amounts are fixed to integer cents first (floor(|a|·100
    * + 0.5) — exact on both engines, no round() half-mode to disagree on),
    * the leading digit read from the cents' decimal rendering (integer→text
    * is engine-identical where double→text is not), and shares emitted as
    * integer basis points via div.
    *
    * Scale shape: one narrow projection + a 9·|types|-row aggregate — pure
    * map-side combine; the per-type total rides in on a broadcast of the
    * same tiny aggregate, never a second ledger scan.
    *
    * Output: (transaction_type, digit, n, share_bp, benford_bp, dev_bp). */
  def benfordProfile(txns: DataFrame): DataFrame = {
    val digits = txns
      .select(col("transaction_type"),
        floor(abs(col("amount")) * 100 + 0.5).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(col("transaction_type"),
        substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("transaction_type", "digit").agg(count(lit(1)).as("n"))
    val totals = digits.groupBy("transaction_type").agg(sum("n").as("n_type"))
    val benford = BenfordBp.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (d, bp)) => when(col("digit") === d, bp).otherwise(acc)
    }
    digits.join(broadcast(totals), Seq("transaction_type"))
      .select(col("transaction_type"), col("digit"), col("n"),
        expr("n * 10000 div n_type").as("share_bp"),
        benford.as("benford_bp"))
      .withColumn("dev_bp", col("share_bp") - col("benford_bp"))
      .orderBy("transaction_type", "digit")
  }

  /** Per-source least-squares fit of n_chars on token count — the
    * profiling question "is doc length linear in tokens, and with what
    * slope, per source?" (a drifting slope flags a tokenization or
    * encoding change in one ingestion source).
    *
    * Shape: the 100-TB-friendly one — a SINGLE map-side-combinable
    * aggregation collecting the five moment sums (Σx, Σy, Σx², Σxy, Σy²)
    * as EXACT integer totals (x and y are integers), then closed-form
    * normal equations per group. No iteration, no second pass, no driver
    * state; the only shuffle is the group-by. Determinism: slope/intercept
    * /r² are fixed expression trees over exact BIGINTs — the doubles are
    * derived identically on both engines, then display-rounded. A
    * constant-x group (B = n·Σx²−(Σx)² = 0) yields NULLs via NULLIF
    * rather than a division error. At 100 TB the BIGINT moments promote
    * to DECIMAL(38,0) — Σxy bounds at rows·max(x)·max(y); the shape is
    * unchanged. */
  def linregProfile(docs: DataFrame): DataFrame = {
    val base = docs.select(col("source"),
      size(split(col("text"), " ")).cast("long").as("x"),
      col("n_chars").as("y"))
    val m = base.groupBy("source").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val a = col("n") * col("sxy") - col("sx") * col("sy")
    val b = col("n") * col("sxx") - col("sx") * col("sx")
    val c = col("n") * col("syy") - col("sy") * col("sy")
    val slopeRaw = a.cast("double") / nullif(b, lit(0L)).cast("double")
    m.withColumn("a_", a).withColumn("b_", b).withColumn("c_", c)
      .withColumn("slope", round(slopeRaw, 8))
      .withColumn("intercept", round(
        (col("sy").cast("double") - slopeRaw * col("sx").cast("double")) /
          col("n").cast("double"), 8))
      .withColumn("r2", round(
        (col("a_").cast("double") * col("a_").cast("double")) /
          nullif(col("b_").cast("double") * col("c_").cast("double"), lit(0.0)), 8))
      .select(col("source"), col("n"), col("slope"), col("intercept"), col("r2"))
      .orderBy("source")
  }

  /** Per-returnflag Pearson correlations over lineitem — quantity vs
    * price and discount vs price: the profiling question "which business
    * segment breaks the expected price~quantity linearity?".
    *
    * Same one-pass moment shape as [[linregProfile]], but the money axis
    * makes BIGINT moments overflow (Σ cents² passes 2⁶³ around 10⁵ rows
    * per group), so the sums run in DECIMAL(38,0) — exact integer
    * arithmetic both engines share (DuckDB's SUM(BIGINT) is HUGEINT,
    * also 128-bit exact). Doubles appear only at the final fixed-tree
    * conversion; `sqrt` is IEEE-correctly-rounded on both engines, so
    * the denominator is bit-stable. The factor product B·C would pass
    * 38 digits, so it is computed in doubles — deterministically, from
    * identical exact integers. One map-side-combinable aggregation; at
    * any scale the cost is the group-by shuffle of nine partial sums. */
  def corrProfile(lineitem: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val base = lineitem.select(
      col("l_returnflag"),
      col("l_quantity").cast("long").cast(dec).as("x"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").cast(dec).as("y"),
      floor(col("l_discount") * 10000 + 0.5).cast("long").cast(dec).as("z"))
    val m = base.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("z") * col("z")).as("szz"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("z") * col("y")).as("szy"))
    val nD = col("n").cast(dec)
    def corr(sa: Column, sb: Column, sab: Column, saa: Column, sbb: Column): Column = {
      val a = nD * sab - sa * sb
      val b = nD * saa - sa * sa
      val c = nD * sbb - sb * sb
      round(a.cast("double") /
        nullif(sqrt(b.cast("double") * c.cast("double")), lit(0.0)), 8)
    }
    m.withColumn("corr_qty_price",
        corr(col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy")))
      .withColumn("corr_disc_price",
        corr(col("sz"), col("sy"), col("szy"), col("szz"), col("syy")))
      .select(col("l_returnflag"), col("n"),
        col("corr_qty_price"), col("corr_disc_price"))
      .orderBy("l_returnflag")
  }

  /** One-vs-rest two-sample Kolmogorov-Smirnov distance per source over
    * the document-length distribution — the distribution-drift screen
    * that [[corrProfile]]/chi2 (categorical) can't give for an ordered
    * variable: D = max_v |F_source(v) − F_rest(v)|, exactly.
    *
    * Exactness: with integer counts both ECDFs are rationals, so
    * D·10⁶ = max over v of |cum_s·(N−n_s) − (cumAll−cum_s)·n_s| · 10⁶
    * div (n_s·(N−n_s)) is pure BIGINT arithmetic — no float sums to pin.
    *
    * Scale shape: ONE corpus-sized keyed census (source, value) with
    * map-side combine; everything after runs on the (sources × distinct
    * values) grid — DOMAIN-sized, corpus-invariant (doc-length domains
    * don't grow with row count), built as a crossJoin of two tiny
    * censuses so every source's ECDF also steps at values it never
    * takes (required for a correct max — the sup can sit at the other
    * sample's step). Windows order the tiny value grid only. */
  def ksProfile(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = docs.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
    val vals = census.groupBy("n_chars").agg(sum("c").as("call"))
      .withColumn("cum_all", sum("call").over(
        Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perSource = census.groupBy("source").agg(sum("c").as("n1"))
    val total = broadcast(census.agg(sum("c").as("n")))
    val grid = perSource.crossJoin(total)
      .crossJoin(broadcast(vals.select("n_chars", "cum_all")))
      .join(census, Seq("source", "n_chars"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum_s", sum("c").over(
        Window.partitionBy("source").orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grid
      .withColumn("d_micro", expr(
        "abs(cum_s * (n - n1) - (cum_all - cum_s) * n1) * 1000000L div (n1 * (n - n1))"))
      .groupBy("source")
      .agg(max("n1").as("n_rows"), max(col("n") - col("n1")).as("n_rest"),
        max("d_micro").as("ks_micro"))
      .withColumn("n_rows", col("n_rows").cast("long"))
      .withColumn("n_rest", col("n_rest").cast("long"))
      .orderBy("source")
  }

  /** Distribution-shape profile per event type: mean, stddev, skewness and
    * excess kurtosis of `value`, from exact integer power sums — the
    * mergeable-moments pattern ([[corrProfile]] extended to 3rd/4th order).
    * Where [[ksProfile]] answers "did the distribution move?", this answers
    * "what shape is it?" — the screen that catches a heavy right tail
    * (payment whales) or a truncated distribution (a capped logger) that
    * mean/stddev dashboards miss.
    *
    * Exactness: values are fixed to cents (floor(v·100+0.5), the
    * [[corrProfile]] discipline), then Σx..Σx⁴ accumulate as
    * DECIMAL(38,0) ↔ DuckDB HUGEINT — per-row x⁴ ≤ 9.9·10¹⁸ and the sum
    * stays under 10²⁶ even at 100×, so both engines hold identical
    * integers. Central moments then evaluate in IEEE doubles on an
    * identical fixed expression tree (mₖ via the raw-moment expansion);
    * ROUND(6) pins the last bits.
    *
    * Scale shape: ONE map-side-combinable aggregate over the corpus onto a
    * domain-sized key (event types) — the cheapest possible plan; the
    * power sums are associative/commutative so executors combine partials
    * without a second pass. No window, no join, no driver state. */
  def momentsProfile(events: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val x = floor(col("value") * 100 + 0.5).cast("long").cast(dec)
    val m = events
      .select(col("event_type"), x.as("x"))
      .groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
    // fixed double tree from here — identical in the DuckDB twin
    val nD = col("n").cast("double")
    val mean = col("s1").cast("double") / nD
    val r2 = col("s2").cast("double") / nD
    val r3 = col("s3").cast("double") / nD
    val r4 = col("s4").cast("double") / nD
    val m2 = r2 - mean * mean
    val m3 = r3 - lit(3.0) * mean * r2 + lit(2.0) * mean * mean * mean
    val m4 = r4 - lit(4.0) * mean * r3 + lit(6.0) * mean * mean * r2 -
      lit(3.0) * mean * mean * mean * mean
    m.select(
        col("event_type"),
        col("n"),
        round(mean / 100.0, 6).as("mean_value"),
        round(sqrt(m2) / 100.0, 6).as("stddev_value"),
        round(m3 / nullif(pow(m2, 1.5), lit(0.0)), 6).as("skewness"),
        round(m4 / nullif(m2 * m2, lit(0.0)) - 3.0, 6).as("kurtosis_excess"))
      .orderBy("event_type")
  }

  /** Robust outlier screen per event type: exact median, median absolute
    * deviation, and the count of values beyond the 3σ-equivalent MAD fence
    * (|x − med| > 3·1.4826·MAD). Mean/stddev fences ([[momentsProfile]])
    * move with the outliers they are supposed to catch; the MAD fence has
    * a 50% breakdown point, so one payment whale cannot hide another.
    *
    * Exactness: cents-fixed integers; both medians are linear
    * interpolation over sorted integers (Spark `percentile` ↔ DuckDB
    * `quantile_cont`), so they land on .0/.5 exactly; deviations are
    * half-integer-exact doubles; the fence multiplier is the SAME literal
    * (4.4478 = 3·1.4826) on both sides so the comparison sees identical
    * doubles. ROUND pins the reported values.
    *
    * Scale shape: two keyed aggregates on a domain-sized key with a keyed
    * self-join between them (broadcast: one row per event type). The exact
    * per-group median is the correctness baseline — it sorts each group —
    * and is the right gate semantics; the corpus-scale path for quantiles
    * is the mergeable sketch family (`sketch_quantile`), already gated. */
  def madOutliers(events: DataFrame): DataFrame = {
    val cents = events.select(col("event_type"),
      floor(col("value") * 100 + 0.5).cast("long").as("c"))
    val med = cents.groupBy("event_type")
      .agg(expr("percentile(c, 0.5)").as("med_c"), count(lit(1)).as("n"))
    val dev = graft.RunHygiene.stage(cents.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("c").cast("double") - col("med_c"))))
    val mad = dev.groupBy("event_type")
      .agg(max(col("n")).as("n"), max(col("med_c")).as("med_c"),
        expr("percentile(adev, 0.5)").as("mad_c"))
    val out = dev.select("event_type", "adev")
      .join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(
        max(col("n")).as("n"),
        max(col("med_c")).as("med_c"),
        max(col("mad_c")).as("mad_c"),
        sum((col("adev") > lit(4.4478) * col("mad_c")).cast("long")).as("n_outliers"))
    out.select(
        col("event_type"),
        col("n"),
        round(col("med_c") / 100.0, 4).as("median_value"),
        round(col("mad_c") / 100.0, 4).as("mad_value"),
        col("n_outliers"),
        round(col("n_outliers").cast("double") / col("n"), 6).as("outlier_share"))
      .orderBy("event_type")
  }

  /** Rules-as-data contract check over the documents table — the ingest
    * firewall pattern: every rule is a (rule_id, observed, bound) row with
    * pass = observed ≤ bound, so downstream alerting reads ONE uniform
    * shape instead of bespoke check outputs, and adding a rule is adding a
    * row, not a code path. V1–V11 are the reference's hand-coded checks;
    * this is the generic engine a corpus pipeline runs on every new drop.
    *
    * All metrics come from ONE corpus aggregate (a single combinable
    * pass — eight rules do not cost eight scans); null inputs count as
    * violations explicitly (CASE, not null-propagation, so both engines
    * agree). The lang domain renders from the same constant set the langid
    * operators use — contract and classifier cannot drift apart. */
  def contractCheck(docs: DataFrame): DataFrame = {
    val langs = graft.functions.TextOps.LangMarkers.map(_._1).distinct.sorted
    val m = docs.agg(
      sum(col("doc_id").isNull.cast("long")).as("null_doc_id"),
      (count(col("doc_id")) - countDistinct(col("doc_id"))).as("dup_doc_id"),
      sum(col("text").isNull.cast("long")).as("null_text"),
      sum(when(col("n_chars").isNull || col("text").isNull, 1L)
        .otherwise((col("n_chars") =!= length(col("text"))).cast("long")))
        .as("n_chars_mismatch"),
      sum(when(col("lang").isNull, 1L)
        .otherwise((!col("lang").isin(langs: _*)).cast("long")))
        .as("lang_out_of_domain"),
      countDistinct(col("source")).as("source_cardinality"),
      sum(when(col("n_chars").isNull, 1L)
        .otherwise((col("n_chars") < 0 || col("n_chars") > 1000000L).cast("long")))
        .as("n_chars_out_of_range"),
      max(length(col("text"))).cast("long").as("max_text_len"))
    val rules: Seq[(String, String, Long)] = Seq(
      ("doc_id_not_null", "null_doc_id", 0L),
      ("doc_id_unique", "dup_doc_id", 0L),
      ("lang_in_domain", "lang_out_of_domain", 0L),
      ("max_text_len", "max_text_len", 1000000L),
      ("n_chars_matches_text", "n_chars_mismatch", 0L),
      ("n_chars_in_range", "n_chars_out_of_range", 0L),
      ("source_cardinality", "source_cardinality", 64L),
      ("text_not_null", "null_text", 0L))
    m.select(explode(array(rules.map { case (id, c, b) =>
        struct(lit(id).as("rule_id"),
          coalesce(col(c), lit(0L)).as("observed"),
          lit(b).as("bound"))
      }: _*)).as("r"))
      .select(col("r.rule_id"), col("r.observed"), col("r.bound"))
      .withColumn("pass", col("observed") <= col("bound"))
      .orderBy("rule_id")
  }

  /** Exact Gini concentration coefficient of `value` per event type — the
    * whale-ness readout that drives sampling design (a revenue stream with
    * G ≈ 0.9 needs whale-guarded stratification; G ≈ 0.3 doesn't), reported
    * in exact integer micro-units.
    *
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over the ascending sort — but
    * computed WITHOUT sorting the corpus: group to a (type, value) census
    * first, then each equal-value run contributes its rank-arithmetic
    * series c·(cumBefore·cnt + cnt·(cnt+1)/2) — rank order within a run is
    * a permutation of fixed ranks, so the sum is tie-invariant and the
    * whole statistic is pure integer arithmetic (cents in, DECIMAL(38,0) ↔
    * HUGEINT combination, integer division at the end — numerator is
    * provably ≥ 0 so floor = truncate on both engines).
    *
    * Scale shape: ONE map-side-combinable corpus census onto the (type,
    * distinct-value) domain; the rank window runs over that census, not
    * the corpus — the [[ksProfile]] discipline. Zero corpus sorts. */
  def giniProfile(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val census = events
      .select(col("event_type"), floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .groupBy("event_type", "c").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, -1)
    val runs = census
      .withColumn("cum_before", coalesce(sum("cnt").over(w), lit(0L)))
      // Σ of ranks inside an equal-value run: cumBefore·cnt + cnt(cnt+1)/2,
      // kept integral (div 2 on the always-even product, never decimal /)
      .withColumn("tri", expr("cnt * (cnt + 1) div 2"))
      .withColumn("run_s",
        col("c").cast(dec) * (col("cum_before").cast(dec) * col("cnt").cast(dec) +
          col("tri").cast(dec)))
    runs.groupBy("event_type")
      .agg(sum(col("cnt")).as("n"), sum(col("c") * col("cnt")).as("t"),
        sum(col("run_s")).as("s"))
      .select(
        col("event_type"),
        col("n"),
        round(col("t").cast("double") / 100.0, 2).as("total_value"),
        expr("CAST((2 * s - (CAST(n AS DECIMAL(38,0)) + 1) * CAST(t AS DECIMAL(38,0))) " +
          "* 1000000 DIV nullif(CAST(n AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)), 0) " +
          "AS BIGINT)").as("gini_micro"))
      .orderBy("event_type")
  }

  /** Mutual information between the two categorical audit axes of the
    * corpus (language × source) — the redundancy readout a mixing plan
    * consumes: MI ≈ 0 means sources are language-balanced (lang tells you
    * nothing about source), high NMI means the axes are confounded and a
    * per-source cap silently becomes a per-language cap. Reported with the
    * three Shannon entropies it derives from (MI = H(lang) + H(source) −
    * H(lang, source) — the identity keeps every term a plain categorical
    * entropy) and the sqrt-normalized NMI.
    *
    * Determinism: the [[graft.functions.TextOps.tokenEntropy]] discipline —
    * each −p·ln p term is an IEEE-fixed tree of two exact integers (count,
    * total), quantized to integer micro-nats BEFORE the sum, so all three
    * entropies are exact integer sums and MI is exact integer arithmetic on
    * them; the single 4-dp NMI readout is the only trailing double, with a
    * degenerate (single-category) axis nulling via the NULLIF guard both
    * engines share.
    *
    * Shape: one narrow (lang, source) projection staged once, three
    * map-side-combinable censuses onto tiny key domains (|langs|,
    * |sources|, |langs×sources|), each crossed with a broadcast 1-row
    * total. Nothing pairwise, nothing driver-resident: at 100 TB this is
    * three cheap keyed aggregates over a two-column scan. */
  def mutualInfoProfile(docs: DataFrame): DataFrame = {
    val base = graft.RunHygiene.stage(docs.select("lang", "source"))
    base.count() // three censuses + the total read it
    val n = broadcast(base.agg(count(lit(1)).as("n_docs")))
    def entropy(keys: String*): DataFrame = {
      val census = base.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      val p = col("c").cast("double") / col("n_docs")
      census.crossJoin(n)
        .withColumn("micro", round(-(p * log(p)) * 1000000).cast("long"))
        .agg(count(lit(1)).as("n_cats"), sum(col("micro")).as("h_micro"))
    }
    val hl = entropy("lang")
      .select(col("n_cats").as("n_lang"), col("h_micro").as("h_lang_micro"))
    val hs = entropy("source")
      .select(col("n_cats").as("n_source"), col("h_micro").as("h_source_micro"))
    val hj = entropy("lang", "source")
      .select(col("n_cats").as("n_pairs"), col("h_micro").as("h_joint_micro"))
    n.crossJoin(hl).crossJoin(hs).crossJoin(hj)
      .withColumn("mi_micro",
        col("h_lang_micro") + col("h_source_micro") - col("h_joint_micro"))
      .withColumn("nmi",
        round(col("mi_micro").cast("double") /
          Similarity.safeDenom(sqrt(col("h_lang_micro").cast("double") *
            col("h_source_micro").cast("double"))), 4))
      .select("n_docs", "n_lang", "n_source", "n_pairs", "h_lang_micro",
        "h_source_micro", "h_joint_micro", "mi_micro", "nmi")
  }
}
