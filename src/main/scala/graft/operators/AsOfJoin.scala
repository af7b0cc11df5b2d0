package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General as-of (point-in-time) join — the operator Spark lacks natively
  * (reference workload: "balance as of date X" queries, SURVEY §3.3 Q1/Q5,
  * which the query corpus answers one probe-set at a time via the rank
  * idiom).
  *
  * Formulation: UNION the probe rows into the timeline, one window pass per
  * key carrying the last known value forward, keep the probe rows. This is
  * the scale-correct shape — one shuffle on the key, state per row O(1),
  * probes amortized into the same sort as the timeline — versus the
  * per-probe rank-join (re-scans the timeline per probe set) or a
  * non-equi range join (quadratic per key). No custom SparkStrategy is
  * needed: the composition plans as Exchange → Sort → Window → Filter,
  * which is exactly the physical plan a bespoke as-of operator would emit.
  *
  * Ordering contract at equal timestamps: timeline rows order before the
  * probe (a probe at time T sees events AT T), multiple timeline rows at T
  * resolve by `tieCol` — both pinned so the DuckDB oracle reproduces row
  * choice exactly.
  */
object AsOfJoin {

  /** For each probe (keyCol, tsCol) return the latest timeline row at or
    * before it: (keyCol, tsCol, valueCols*) — null values when the probe
    * predates the key's first event (left semantics).
    *
    * The carried state is the whole row as ONE struct (null only on probe
    * rows), so the result is always a row that actually existed — a
    * legitimately-null value column stays null rather than resurrecting an
    * older value, and multiple value columns never mix across rows. The
    * tie column keeps its native type (a string cast would order numeric
    * ids lexicographically). */
  def asOf(timeline: DataFrame, probes: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCols: Seq[String]): DataFrame = {
    val tl = timeline.select(
      col(keyCol), col(tsCol), lit(0).as("_probe"), col(tieCol).as("_tie"),
      struct(valueCols.map(col): _*).as("_row"))
    val pr = probes.select(
      col(keyCol), col(tsCol), lit(1).as("_probe"),
      lit(null).cast(timeline.schema(tieCol).dataType).as("_tie"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        valueCols.map(c => timeline.schema(c).copy(nullable = true)))).as("_row"))
    // probe sorts AFTER timeline rows at the same instant (sees events AT
    // T); _tie only orders within the timeline side (_probe separates the
    // sides first), so the probes' null tie never participates
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("_probe"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tl.unionByName(pr)
      .withColumn("_last", last(col("_row"), ignoreNulls = true).over(w))
      .filter(col("_probe") === 1)
      .select((Seq(col(keyCol), col(tsCol)) ++
        valueCols.map(c => col("_last").getField(c).as(c))): _*)
  }

  /** Nearest-within-tolerance as-of join (pandas `merge_asof
    * direction='nearest'` semantics): for each probe, the timeline row
    * whose timestamp is CLOSEST on either side, if it lies within
    * `toleranceSeconds`; equal distances prefer the backward row. The
    * sensor-alignment / late-data variant of [[asOf]] — a reading a few
    * seconds in the future beats one an hour stale.
    *
    * Formulation: the same union-the-probes trick run in BOTH directions —
    * a backward carry (last row at or before, ties to the LARGEST tie) and
    * a forward carry over the reversed ordering (first row at or after,
    * ties to the SMALLEST tie) — then one row-local choice of the nearer
    * side. Still one keyed shuffle; the two window passes share the
    * partitioning (one Exchange, two Sorts). Distances are integer epoch
    * seconds (floored on both engines).
    *
    * Output: (keyCol, tsCol, matched_ts, matched_side back|fwd|null,
    * dist_seconds, valueCols*) — all match columns null when nothing lies
    * within tolerance. */
  def asOfNearest(timeline: DataFrame, probes: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, valueCols: Seq[String],
      toleranceSeconds: Long): DataFrame = {
    val rowStruct = struct(
      (Seq(col(tsCol).as("_mts")) ++ valueCols.map(col)): _*)
    val tl = timeline.select(
      col(keyCol), col(tsCol), lit(0).as("_probe"), col(tieCol).as("_tie"),
      rowStruct.as("_row"))
    val pr = probes.select(
      col(keyCol), col(tsCol), lit(1).as("_probe"),
      lit(null).cast(timeline.schema(tieCol).dataType).as("_tie"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        timeline.schema(tsCol).copy(name = "_mts", nullable = true) +:
          valueCols.map(c => timeline.schema(c).copy(nullable = true)))).as("_row"))
    // backward: probe after timeline rows at the same instant, carried last
    // = max tie; forward: reversed timestamps, probe still after timeline
    // rows of its instant, _tie DESC makes the carried last the MIN tie
    val wB = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_probe"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col("_probe"), col("_tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pSec = unix_timestamp(col(tsCol))
    val backD = pSec - unix_timestamp(col("_back").getField("_mts"))
    val fwdD = unix_timestamp(col("_fwd").getField("_mts")) - pSec
    val backOk = col("_back").isNotNull && backD <= toleranceSeconds
    val fwdOk = col("_fwd").isNotNull && fwdD <= toleranceSeconds
    val useBack = backOk && (!fwdOk || backD <= fwdD)
    val useFwd = fwdOk && !(backOk && backD <= fwdD)
    val chosen = when(useBack, col("_back")).when(useFwd, col("_fwd"))
    tl.unionByName(pr)
      .withColumn("_back", last(col("_row"), ignoreNulls = true).over(wB))
      .withColumn("_fwd", last(col("_row"), ignoreNulls = true).over(wF))
      .filter(col("_probe") === 1)
      .select((Seq(col(keyCol), col(tsCol),
        chosen.getField("_mts").as("matched_ts"),
        when(useBack, "back").when(useFwd, "fwd").as("matched_side"),
        when(useBack, backD).when(useFwd, fwdD).cast("long").as("dist_seconds")) ++
        valueCols.map(c => chosen.getField(c).as(c))): _*)
  }

  /** Bucketed interval join: all (probe, stream) pairs with the same key
    * where streamTs ∈ (probeTs − window, probeTs] — the trailing-window
    * non-equi join (e.g. "clicks in the 30 min before each purchase").
    *
    * Naive Spark plans this as a per-key BroadcastNestedLoopJoin or a
    * key-equi join that materializes every same-key pair before filtering —
    * per-key quadratic, fatal on a 100 TB behavioral stream where hot keys
    * have millions of rows. The bucketed form is the standard fix: time is
    * coarsened to `window`-sized epochs, each stream row is emitted into
    * its own bucket b and b+1, each probe joins only its OWN bucket — so
    * every qualifying pair is produced EXACTLY once (a stream row at
    * bucket c qualifies only if c ∈ {p−1, p}, and of its two copies
    * {c, c+1} exactly one equals p) and candidate volume is bounded by
    * per-(key, epoch) co-occupancy, never per-key row counts squared.
    * The join itself is a plain shuffled hash/sort-merge equi-join on
    * (key, bucket) that AQE can re-plan like any other.
    *
    * Micros arithmetic (`unix_micros` div) keeps the bucket map and the
    * boundary comparisons exact — identical to the oracle's INTERVAL
    * algebra at microsecond precision. Inner semantics; callers wanting
    * zero-match probes left-join the aggregate back (see the gate). */
  def intervalJoin(probes: DataFrame, stream: DataFrame, keyCol: String,
      probeTsCol: String, streamTsCol: String, windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    // NTZ-safe epoch micros: the gate session pins UTC, so the NTZ→LTZ
    // cast is the identity and the bucket map stays calendar-free
    def us(c: String) = s"unix_micros(cast($c as timestamp))"
    val p = probes
      .withColumn("_p_us", expr(us(probeTsCol)))
      .withColumn("_bucket", expr(s"${us(probeTsCol)} div ${windowMicros}L"))
    val s = stream
      .withColumn("_s_us", expr(us(streamTsCol)))
      .withColumn("_b0", expr(s"${us(streamTsCol)} div ${windowMicros}L"))
      .withColumn("_bucket", explode(array(col("_b0"), col("_b0") + 1)))
      .drop("_b0")
    p.join(s, Seq(keyCol, "_bucket"))
      .filter(col("_s_us") > col("_p_us") - windowMicros && col("_s_us") <= col("_p_us"))
      .drop("_bucket", "_p_us", "_s_us")
  }
}
