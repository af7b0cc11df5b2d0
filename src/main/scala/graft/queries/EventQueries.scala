package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the raw `events` table: sessionization,
  * time-bucket rollups, and semi-structured (JSON) field extraction — the
  * generic clickstream shapes a finance/product pipeline runs next to the
  * ledger workload.
  */
object EventQueries {

  /** Gap-based sessionization (30-minute inactivity): lag → new-session
    * flag → running sum = session id → per-session rollup. Two window
    * passes and a grouped aggregate, all shuffled once on user_id. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select("event_id", "user_id", "ts", "value")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("ts") > col("prev_ts") + expr(s"INTERVAL $gapMinutes MINUTES"), 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(cum).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("user_id", "session_id")
  }

  /** Sliding-window rollup: hour-long windows every 15 minutes — the
    * smoothed load curve a tumbling rollup can't give. `window(ts, len,
    * slide)` expands each event into its len/slide covering windows
    * map-side (Expand, 4 replicas here) and everything combines under ONE
    * keyed aggregate — replica factor is the explicit cost knob, the same
    * trade rollup/cube make. Epoch-aligned origin on both engines. */
  def slidingRollup(events: DataFrame, windowLength: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** Tumbling-hour rollup per event type. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy("hour", "event_type")

  /** Exact value-distribution quantiles per event type (p25/p50/p75/p95,
    * linear interpolation — the same definition DuckDB's `quantile_cont`
    * computes, so the oracle hash-matches after rounding). At 100 TB the
    * same call sites take `approx_percentile` (t-digest) — exact
    * percentile is a sort-based aggregate; both are one shuffled
    * aggregation on the group key. */
  def valueQuantiles(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        expr("percentile(value, array(0.25D, 0.5D, 0.75D, 0.95D))").as("q"))
      .select(col("event_type"), col("n_events"),
        round(element_at(col("q"), 1), 4).as("p25"),
        round(element_at(col("q"), 2), 4).as("p50"),
        round(element_at(col("q"), 3), 4).as("p75"),
        round(element_at(col("q"), 4), 4).as("p95"))
      .orderBy("event_type")

  /** Ordered conversion funnel: a user reaches step i when an event of
    * type `steps(i)` occurs at-or-after their step-(i−1) arrival (ties on
    * ts broken by event_id — the same total order sessionize uses). The
    * per-step arrival is a cumulative conditional MIN whose condition
    * references the previous step's column, so the steps chain as window
    * passes over ONE (user_id) partitioning: a single keyed shuffle, sorts
    * reused across passes, then a per-user rollup and a global count — the
    * same plan shape at any corpus size, no self-joins (the naive funnel
    * formulation joins events to events once per step).
    *
    * Output: one row per step — (step, step_name, n_users, pct_of_first).
    */
  def funnel(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events.select("user_id", "ts", "event_id", "event_type")
    val withSteps = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val hit =
        if (i == 0) col("event_type") === step
        else col("event_type") === step && col(s"s${i - 1}").isNotNull
      df.withColumn(s"s$i", min(when(hit, col("ts"))).over(w))
    }
    // the cumulative MIN is non-increasing within a user, so the per-user
    // final value is just MIN over the partition
    val perUserAggs = steps.indices.map(i => min(col(s"s$i")).as(s"t$i"))
    val perUser = withSteps.groupBy("user_id")
      .agg(perUserAggs.head, perUserAggs.tail: _*)
    val countAggs = steps.indices.map(i =>
      sum(col(s"t$i").isNotNull.cast("long")).as(s"n$i"))
    val counts = perUser.agg(countAggs.head, countAggs.tail: _*)
    val stepRows = array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step"), lit(s).as("step_name"),
        col(s"n$i").as("n_users"))
    }: _*)
    counts.select(col("n0"), explode(stepRows).as("x"))
      .select(col("x.step").cast("long").as("step"), col("x.step_name").as("step_name"),
        col("x.n_users").as("n_users"),
        // zero guard matches the oracle's NULLIF: an empty step-0 cohort
        // yields NULL on both sides (unguarded Spark would emit NaN while
        // DuckDB's division by zero returns NULL)
        when(col("n0") === 0, lit(null).cast("double"))
          .otherwise(round(col("x.n_users") * 100.0 / col("n0"), 2)).as("pct_of_first"))
      .orderBy("step")
  }

  /** Cohort retention: users cohort by first-active day; each
    * (cohort_day, day_offset) row counts cohort members active that day
    * and their share of the original cohort. Shape: distinct
    * (user, day) activity → per-user first-day window → (cohort, offset)
    * rollup → cohort-size ride-along via a window over the AGGREGATED
    * frame (cohorts × offsets rows, not events). Scale: the distinct
    * activity table is bounded by users × active days — orders of
    * magnitude under the event count — so the user_id window shuffles a
    * small fraction of the input; every user's first day is offset 0 by
    * construction, so cohort_size is never null. */
  def retention(events: DataFrame): DataFrame = {
    val userDays = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val wUser = Window.partitionBy("user_id")
    val wCohort = Window.partitionBy("cohort_day")
    userDays
      .withColumn("cohort_day", min(col("d")).over(wUser))
      .withColumn("day_offset", datediff(col("d"), col("cohort_day")).cast("long"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("n_active"))).over(wCohort))
      .withColumn("pct_retained",
        round(col("n_active") * 100.0 / col("cohort_size"), 2))
      .orderBy("cohort_day", "day_offset")
  }

  /** Daily-volume anomaly flags: per (event_type, day), today's count
    * against the trailing `win`-day mean; flagged when the ratio leaves
    * [lo, hi]. The day axis is densified per type (zero-event calendar
    * days become real rows), so a total outage flags as a dip and the
    * trailing mean always spans calendar days, never stale active-day
    * history. Days without a full trailing window are suppressed (no
    * cold-start false positives), as are days whose whole trailing
    * baseline is zero (no meaningful ratio against a dead series — and
    * 0/0 would diverge as NaN-vs-NULL across engines). Shape: (type, day)
    * rollup — map-side combined, the frame shrinks to types × days —
    * then a per-type day densification and one window pass over that
    * aggregated frame; the window shuffle moves thousands of rows no
    * matter how many billions of events fed the rollup. The flag compares
    * the ROUNDED ratio so the cut is reproducible across engines. */
  def anomalyDays(events: DataFrame, win: Int = 7,
      hi: Double = 1.5, lo: Double = 0.5): DataFrame = {
    // staged: the span aggregate and the zero-fill join both read the
    // daily rollup — unstaged, the events scan + rollup would run twice
    val daily = graft.RunHygiene.stage(events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n_events")))
    daily.count()
    // densify to CALENDAR days per type before the window: a zero-event
    // day produces no daily row, so a rows-frame over active days alone
    // would (a) never flag a total outage — the strongest dip the lo
    // bound exists for — and (b) let the "trailing 7 days" silently span
    // stale weeks. The span frame is types × days, built from a tiny
    // per-type min/max aggregate.
    val dense = daily
      .groupBy("event_type").agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      .join(daily, Seq("event_type", "d"), "left")
      .na.fill(0L, Seq("n_events"))
    val w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-win, -1)
    dense
      .withColumn("trailing_avg_raw", avg(col("n_events")).over(w))
      .withColumn("n_trailing", count(col("n_events")).over(w))
      .filter(col("n_trailing") === win && col("trailing_avg_raw") > 0)
      .withColumn("ratio", round(col("n_events") / col("trailing_avg_raw"), 4))
      .select(
        col("event_type"), col("d"), col("n_events"),
        round(col("trailing_avg_raw"), 4).as("trailing_avg"),
        col("ratio"),
        (col("ratio") >= hi || col("ratio") <= lo).cast("int").as("is_anomaly"))
      .orderBy("event_type", "d")
  }

  /** The closed event-type domain, rendered into both the pivot column
    * list and the oracle's FILTER columns (the shared-constant convention:
    * the two sides cannot drift). A FIXED list is also the scale rule —
    * `pivot(col)` without values runs a distinct-collect job on the
    * driver before planning. */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Month × event-type value matrix via pivot — wide conditional
    * aggregation in ONE pass: a single map-side-combinable aggregate
    * whose row state is months × |types| cells, no per-type scans or
    * joins. Cells with no events stay NULL (both engines). */
  def pivotMonthly(events: DataFrame,
      types: Seq[String] = EventTypes): DataFrame =
    events
      .groupBy(date_trunc("month", col("ts")).as("month"))
      .pivot("event_type", types)
      .agg(round(sum(col("value")), 2))
      .orderBy("month")

  /** SCD2-style status history: compress each user's event stream into
    * versioned state rows — one row per run of equal event_type, with
    * [valid_from, valid_to) bounds (valid_to NULL on the current state,
    * the slowly-changing-dimension type-2 convention). Shape: lag flags
    * run starts, a filter keeps them, lead supplies the successor's start
    * as the expiry — three window passes over ONE (user_id) ordering, so
    * events shuffle once and the rest reuses the sort (the same
    * single-partitioning discipline as sessionize/funnel). The run
    * version number rides along for free from the same ordering. */
  def scd2Status(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select("user_id", "ts", "event_id", "event_type")
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col("user_id"), col("version"), col("event_type").as("status"),
        col("valid_from"), col("valid_to"))
      .orderBy("user_id", "version")
  }

  /** Per-type value deciles via ntile: equal-count buckets with their
    * value ranges — the distribution summary that needs GLOBAL ranks per
    * group (unlike the fixed-bin histogram). One shuffle on event_type;
    * ntile is inherently a per-group sort, so a whale type bounds one
    * task — the same envelope as exact-count stratified sampling, with
    * the fixed-bin histogram as the rank-free escape hatch. Ties break by
    * event_id, making bucket assignment a total order both engines
    * replay. */
  def valueDeciles(events: DataFrame, buckets: Int = 10): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
    events
      .select("event_type", "event_id", "value")
      .withColumn("decile", ntile(buckets).over(w).cast("long"))
      .groupBy("event_type", "decile")
      .agg(
        count(lit(1)).as("n_events"),
        round(min(col("value")), 2).as("lo_value"),
        round(max(col("value")), 2).as("hi_value"))
      .orderBy("event_type", "decile")
  }

  /** Per-user event-type transition matrix (the first-order Markov view of
    * the event stream): one lag window over the (user, ts, id) order, then
    * a (from_type, to_type) rollup with each cell's share of its from-row —
    * the sequence-model diagnostic (what follows what) behind
    * next-event prediction features and funnel design. One keyed shuffle
    * for the lag, one small (types²) aggregate; the pct window moves
    * |types|² rows. Stream starts (no previous event) roll up under
    * from_type '_start_'. */
  def typeTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("from_type", coalesce(lag(col("event_type"), 1).over(w), lit("_start_")))
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("pct_of_from",
        round(col("n_transitions") * 100.0 /
          sum(col("n_transitions")).over(Window.partitionBy("from_type")), 2))
      .orderBy("from_type", "to_type")
  }

  /** Stationary distribution of the event-type Markov chain — the
    * long-run occupancy the one-step [[typeTransitions]] matrix implies,
    * with PageRank-style damping + dangling redistribution so periodic or
    * absorbing chains still converge (Page et al. 1999 applied to the
    * behavioral chain): where users SETTLE, vs. where they merely go next.
    *
    * Exactness (the Graph.pageRank discipline, round 9): occupancy state
    * is integer pico-units end to end — per-edge contributions are
    * floor_div(π_pico · n_ij, n_i) (the transition probability applied as
    * exact rational arithmetic, never a double P matrix), dangling mass
    * redistributes by floor_div, damping is the rational dm/10⁶, and the
    * only float op is the final /1e12 display division. Fixed `iters`
    * power iterations keep it a pure function of the input for the
    * unrolled oracle.
    *
    * Scale shape: ONE corpus-sized lag window (shared shape with
    * [[typeTransitions]]) collapses to a |types|² census; every iteration
    * moves |types|-sized frames — keyed joins, a 1-row dangling aggregate
    * broadcast — so the chain solve is corpus-size-independent. */
  def markovStationary(events: DataFrame, damping: Double = 0.85,
      iters: Int = 5): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dec = "decimal(38,0)"
    def fd(x: Column, y: Column): Column = {
      val xd = x.cast(dec); val yd = y.cast(dec)
      ((xd - (xd % yd + yd) % yd) / yd).cast("long")
    }
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val base = events.select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val trans = graft.RunHygiene.track(base
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_ij"))
      .persist(lvl))
    trans.count() // every iteration reads the census — fill once
    val outTotals = trans.groupBy("from_type").agg(sum(col("n_ij")).as("n_i"))
    val states = graft.RunHygiene.track(
      base.select(col("event_type").as("state")).distinct().persist(lvl))
    states.count()
    val nn = broadcast(states.agg(count(lit(1)).as("n_states")))
    val Pico = 1000000000000L
    val dm = math.round(damping * 1e6)
    var pi = states.crossJoin(nn)
      .select(col("state"), fd(lit(Pico), col("n_states")).as("pi_pico"))
    for (_ <- 1 to iters) {
      val dangling = broadcast(
        pi.join(outTotals, pi("state") === outTotals("from_type"), "left")
          .filter(col("n_i").isNull)
          .agg(coalesce(sum(col("pi_pico")), lit(0L)).as("dang")))
      val contribs = pi.join(trans, pi("state") === trans("from_type"))
        .join(outTotals, "from_type")
        .select(col("to_type").as("state"),
          fd(col("pi_pico").cast(dec) * col("n_ij"), col("n_i")).as("c"))
        .groupBy("state").agg(sum(col("c")).as("s"))
      pi = states.join(contribs, Seq("state"), "left")
        .crossJoin(nn).crossJoin(dangling)
        .select(col("state"),
          (fd(lit((1000000L - dm) * Pico), lit(1000000L) * col("n_states")) +
            fd(lit(dm) * (coalesce(col("s"), lit(0L)) +
                fd(col("dang"), col("n_states"))),
              lit(1000000L))).as("pi_pico"))
    }
    pi.join(outTotals, pi("state") === outTotals("from_type"), "left")
      .select(col("state"), coalesce(col("n_i"), lit(0L)).as("n_out"),
        round(col("pi_pico").cast("double") / lit(1e12), 8).as("stationary_p"))
      .orderBy("state")
  }

  /** Debounce (burst suppression): per (user, type), events chain into a
    * run while each arrives within `withinSeconds` of the PREVIOUS event;
    * only the run's head survives. This is the chain-style debounce
    * (sessionize's boundary rule applied as a filter): a burst
    * a, a+1s, a+2s … collapses to `a` no matter how long it drags on,
    * and the first event after a ≥ `withinSeconds` silence is always
    * kept — the dedup a retry-storm feed needs before rollups count
    * storms as engagement. Declarative recurrence: the same
    * lag → boundary-flag → running-sum run id used by [[sessionize]],
    * then rn = 1 per run; one keyed shuffle, three windows over ONE
    * (user, type, ts, id) sort. */
  def debounce(events: DataFrame, withinSeconds: Int = 300): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_run",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr(s"INTERVAL $withinSeconds SECONDS"), 1)
          .otherwise(0))
      .withColumn("run_id", sum(col("new_run")).over(cum).cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "event_type", "run_id").orderBy("ts", "event_id")))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "ts", "event_type")
      .orderBy("user_id", "event_id")
  }

  /** RFM (recency / frequency / monetary) user segmentation — the
    * marketing-analytics classic: per user, days since last activity
    * (against the corpus horizon), event count, value sum; each dimension
    * quintiled with `ntile(5)` under a deterministic (metric, user_id)
    * order, composed into the three-digit segment code. One user rollup +
    * three ntile windows over the tiny per-user frame (the raw stream
    * collapses first — the deciles-operator discipline). Recency scores
    * ascending (most recent = 1); frequency/monetary descending via
    * negated order so 1 = best on every axis. */
  def rfmSegments(events: DataFrame): DataFrame = {
    val horizon = broadcast(events.agg(max(to_date(col("ts"))).as("horizon")))
    val peruser = events
      .groupBy("user_id")
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("frequency"),
        round(sum(col("value")), 2).as("monetary"))
      .crossJoin(horizon)
      .select(col("user_id"),
        datediff(col("horizon"), col("last_day")).cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
    def quint(order: Seq[org.apache.spark.sql.Column]) =
      ntile(5).over(Window.orderBy(order: _*)).cast("long")
    peruser
      .withColumn("r_score", quint(Seq(col("recency_days"), col("user_id"))))
      .withColumn("f_score", quint(Seq(col("frequency").desc, col("user_id"))))
      .withColumn("m_score", quint(Seq(col("monetary").desc, col("user_id"))))
      .withColumn("rfm_code",
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")))
      .orderBy("user_id")
  }

  /** Last-touch marketing attribution — every purchase is credited to the
    * user's most recent preceding touch event (view/click) within the
    * lookback horizon; purchases with no in-horizon touch fall to the
    * 'direct' channel. One `last(ignoreNulls)` carry-forward pass over the
    * strictly-before frame (no label leakage from the purchase row
    * itself) on ONE (user_id) sort — the as-of-join shape without a join —
    * then a tiny channel rollup. The horizon cutoff is microsecond-exact
    * interval arithmetic on both engines (never float epoch seconds), so
    * the boundary cannot drift. */
  def lastTouchAttribution(events: DataFrame,
      lookbackHours: Int = 72): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("view", "click")
    events.select("event_id", "user_id", "ts", "event_type", "value")
      .withColumn("last_touch",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("last_touch_ts",
        last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("last_touch_ts").isNotNull &&
          col("ts") <= col("last_touch_ts") + expr(s"INTERVAL $lookbackHours HOURS"),
          col("last_touch")).otherwise(lit("direct")))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("revenue"))
      .orderBy("channel")
  }

  /** Top session paths — the first `maxSteps` event types of each
    * 30-minute session joined into a path string, counted across
    * sessions: the "how do users actually move" query behind every
    * product-analytics sankey. Reuses the sessionize boundary recurrence
    * (lag → flag → running sum) and ranks within session on the SAME
    * (user_id) sort; the within-session step index derives from the same
    * sort (per-user row number minus the carried session-head row number —
    * NOT a second (user, session) window, which would re-exchange the full
    * stream), and the rn ≤ maxSteps filter bounds every session's
    * contribution before the path aggregate, so a million-event bot
    * session ships `maxSteps` rows, not a million. Paths build from
    * sorted (rn, type) structs — deterministic order on both engines —
    * and the final top-k is a global (n_sessions desc, path) total order
    * planned as TakeOrderedAndProject. */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
      maxSteps: Int = 5, topK: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val steps = events.select("event_id", "user_id", "ts", "event_type")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("ts") > col("prev_ts") + expr(s"INTERVAL $gapMinutes MINUTES"), 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(cum).cast("long"))
      .withColumn("rn_user", row_number().over(w))
      .withColumn("sess_head_rn",
        last(when(col("new_sess") === 1, col("rn_user")), ignoreNulls = true).over(cum))
      .withColumn("rn", col("rn_user") - coalesce(col("sess_head_rn"), lit(1)) + 1)
      .filter(col("rn") <= maxSteps)
    steps
      .groupBy("user_id", "session_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topK)
  }

  /** Additive seasonal decomposition of the daily revenue series —
    * revenue = trend + seasonal + residual, the classic moving-average
    * method: centered (2·half+1)-day MA trend, day-of-week mean deviation
    * as the seasonal index, remainder as residual. The anomaly baseline a
    * finance/ops pipeline plots first.
    *
    * Every component is computed in INTEGER CENTS (per-event cent
    * quantization, truncating `div` for both means, the sign-split form
    * where deviations can be negative) — the whole decomposition is exact
    * integer arithmetic until one final /100.0 readout per column, so
    * engines cannot drift at any step. Day-of-week is epoch-day mod 7
    * (Monday = 0) — no locale-dependent DOW function on either engine.
    *
    * Shape: the raw stream collapses to one row per DAY first (map-side
    * combinable), so the global-ordered trend window sees |days| rows —
    * calendar-bounded, volume-invariant (the deciles discipline); the
    * 7-row seasonal index broadcasts back. */
  def dailyDecompose(events: DataFrame, halfWindow: Int = 3): DataFrame = {
    val frame = Window.orderBy("day").rowsBetween(-halfWindow, halfWindow)
    val withTrend = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("dow",
        pmod(datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-05"))), lit(7))
          .cast("int"))
      .withColumn("w_sum", sum(col("cents")).over(frame))
      .withColumn("w_cnt", count(lit(1)).over(frame))
      .withColumn("trend_cents", expr("w_sum div w_cnt"))
      .withColumn("dev_cents", col("cents") - col("trend_cents"))
    val seasonal = withTrend.groupBy("dow")
      .agg(sum(col("dev_cents")).as("dev_sum"), count(lit(1)).as("n"))
      .select(col("dow"),
        (signum(col("dev_sum")) * expr("abs(dev_sum) div n")).cast("long")
          .as("seasonal_cents"))
    withTrend.join(broadcast(seasonal), Seq("dow"))
      .select(col("day"), col("dow"),
        (col("cents") / 100.0).as("revenue"),
        (col("trend_cents") / 100.0).as("trend"),
        (col("seasonal_cents") / 100.0).as("seasonal"),
        ((col("cents") - col("trend_cents") - col("seasonal_cents")) / 100.0)
          .as("residual"))
      .orderBy("day")
  }

  /** Autocorrelation function of the per-type daily revenue series at lags
    * 1..maxLag — the "is there weekly structure / how fast does memory
    * decay" readout next to [[dailyDecompose]]: a spike at lag 7 confirms
    * the day-of-week seasonal, a slow decay flags trend left in the series.
    * Pearson r over the overlapping (x_t, x_{t−k}) pairs, the standard
    * sample-ACF form.
    *
    * Determinism: the series is INTEGER CENTS (the decompose convention),
    * so all six sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) are exact
    * integer sums — association-order-proof — and the readout is one fixed
    * double expression: num / (sqrt(denx)·sqrt(deny)) (sqrt is
    * correctly-rounded IEEE on both engines; the two sqrt's avoid the
    * denx·deny product overflowing BIGINT). Constant series (den = 0)
    * yield NULL on both sides. Integer envelope: daily cents below ~3·10⁹
    * keep every statistic under 2⁶³ — beyond that, rescale the unit.
    *
    * Shape: the stream collapses to one row per (type, day) first
    * (map-side combinable); the lag window runs per type over
    * calendar-bounded day counts; the k lags come out of ONE window pass
    * (stacked lag columns over the same spec), then unpivot + one tiny
    * aggregate. */
  def dailyAcf(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lagged = (1 to maxLag).foldLeft(daily) { (df, k) =>
      df.withColumn(s"lag_$k", lag(col("cents"), k).over(w))
    }
    val stacked = lagged.select(col("event_type"), col("cents").as("x"),
        expr(s"stack($maxLag, ${(1 to maxLag).map(k => s"$k, lag_$k").mkString(", ")})")
          .as(Seq("lag_days", "y")))
      .filter(col("y").isNotNull)
    val denx = col("n_pairs") * col("sxx") - col("sx") * col("sx")
    val deny = col("n_pairs") * col("syy") - col("sy") * col("sy")
    stacked.groupBy("event_type", "lag_days")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("event_type"), col("lag_days").cast("long").as("lag_days"),
        col("n_pairs"),
        round(when(denx === 0 || deny === 0, lit(null).cast("double"))
          .otherwise(
            (col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt(denx.cast("double")) * sqrt(deny.cast("double")))), 4)
          .as("acf"))
      .orderBy("event_type", "lag_days")
  }

  /** Trailing-window feature extraction — the per-event feature matrix an
    * online-ML / fraud pipeline computes ("how active was this user just
    * before this event"): trailing 1-hour event count, trailing 24-hour
    * value sum, and seconds since the user's previous event. All three are
    * value-RANGE / lag windows over ONE (user_id, second, event_id) sort —
    * a single keyed shuffle; the range frames are per-user scans with
    * bounded lookback state, exactly how Spark executes them. Frames are
    * `[-w, -1]` on integer epoch seconds: strictly-before semantics, and
    * second-resolution bounds that both engines frame identically (RANGE
    * peers are by value, so sub-second ordering cannot shift a frame).
    * The trailing sum is rounded; count/lag are exact integers. */
  def trailingFeatures(events: DataFrame): DataFrame = {
    val sec = col("sec")
    val byUser = Window.partitionBy("user_id")
    val w1h = byUser.orderBy(sec).rangeBetween(-3600, -1)
    val w24h = byUser.orderBy(sec).rangeBetween(-86400, -1)
    val wLag = byUser.orderBy(sec, col("event_id"))
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("n_prev_1h", count(lit(1)).over(w1h))
      .withColumn("sum_value_24h",
        round(coalesce(sum(col("value")).over(w24h), lit(0.0)), 2))
      .withColumn("secs_since_prev", sec - lag(sec, 1).over(wLag))
      .select(col("event_id"), col("user_id"), col("ts"), col("n_prev_1h"),
        col("sum_value_24h"), col("secs_since_prev"))
      .orderBy("user_id", "event_id")
  }

  /** JSON field extraction from the semi-structured props column +
    * per-type aggregate over the extracted value. */
  def propsJson(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k").isNull.cast("long")).as("n_missing_k"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy("event_type")

  /** Longest consecutive-day activity streak per user — the engagement
    * signature behind retention/habit metrics, as the classic
    * gaps-and-islands idiom: distinct active days, island id = epoch day −
    * dense day rank (constant within a consecutive run), one aggregate per
    * island, best island per user by (length desc, start asc).
    *
    * All integers end to end. Shape: the stream collapses to distinct
    * (user, day) first (map-side combinable); the rank window and island
    * aggregate are keyed on user; per-user day counts are calendar-bounded.
    *
    * Output: (user_id, n_active_days, longest_streak, streak_start,
    * streak_end). */
  def activityStreaks(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val islands = days
      .withColumn("island",
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))).cast("long") -
          row_number().over(w))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"), min(col("day")).as("streak_start"),
        max(col("day")).as("streak_end"))
    val totals = days.groupBy("user_id").agg(count(lit(1)).as("n_active_days"))
    val wBest = Window.partitionBy("user_id")
      .orderBy(col("len").desc, col("streak_start"))
    islands.withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .join(totals, Seq("user_id"))
      .select(col("user_id"), col("n_active_days"), col("len").as("longest_streak"),
        col("streak_start"), col("streak_end"))
      .orderBy("user_id")
  }

  /** CUSUM drift screen over the daily revenue series — "did the level
    * shift, and when": the running sum of deviations from the global mean
    * (Page 1954); a sustained level change makes |CUSUM| grow linearly
    * where noise random-walks near zero, so the extreme |cusum| day marks
    * the change point.
    *
    * Determinism: cents all the way — the reference mean is the truncating
    * integer division of total cents by day count (sign-split, the
    * avg-daily-balance idiom), deviations and the running sum stay exact
    * BIGINT, and the one double readout normalizes by the population sd:
    * round(cusum / sqrt((n·Σx²−(Σx)²)::double)/... — a fixed op sequence;
    * constant series yield NULL.
    *
    * Shape: stream → one row per DAY (map-side combinable), 1-row stats
    * cross, running sum over the calendar-bounded global day order (the
    * decompose envelope). */
  def dailyCusum(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val stats = daily.agg(
      count(lit(1)).as("n_days"), sum(col("cents")).as("total"),
      sum(col("cents") * col("cents")).as("sxx"))
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val varNum = col("n_days") * col("sxx") - col("total") * col("total")
    daily.crossJoin(broadcast(stats))
      .withColumn("mean_cents",
        (signum(col("total")) * expr("abs(total) div n_days")).cast("long"))
      .withColumn("dev_cents", col("cents") - col("mean_cents"))
      .withColumn("cusum_cents", sum(col("dev_cents")).over(wCum))
      .withColumn("cusum_sigma",
        round(when(varNum <= 0, lit(null).cast("double"))
          .otherwise(col("cusum_cents").cast("double") /
            (sqrt(varNum.cast("double")) / col("n_days"))), 4))
      .select("day", "cents", "dev_cents", "cusum_cents", "cusum_sigma")
      .orderBy("day")
  }

  /** Exponentially-weighted moving average of the daily revenue series,
    * truncated to the trailing `k` days — the smoothing curve an
    * anomaly/trend dashboard draws over [[dailyCusum]]'s raw series.
    *
    * α is fixed at 1/2 so every weight is a dyadic 2^-(j+1): a BIGINT
    * cent value times a power of two is EXACT in an IEEE double (only the
    * exponent moves), so the left fold acc ← (acc + x)/2 over the
    * chronological trailing window performs the identical rounding
    * sequence on both engines — no libm pow, no order ambiguity (the
    * window list fixes the order, the fold fixes the association). The
    * truncation normalizer 1 − 2^-m is built from an integer shift, again
    * exact; the single ROUND at the readout is the only half-ulp site.
    *
    * Shape: stream → one row per day (map-side combinable), then one
    * running window over the global day order carrying a ≤ k-element
    * list — the [[dailyCusum]] single-series envelope (a 100 TB event
    * stream still collapses to one row per calendar day before the
    * window).
    */
  def dailyEwma(events: DataFrame, k: Int = 30): DataFrame = {
    require(k >= 1 && k <= 62, s"k must be in [1,62] (1L << k), got $k")
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val w = Window.orderBy("day").rowsBetween(-(k - 1), Window.currentRow)
    daily
      .withColumn("xs", collect_list(col("cents")).over(w))
      .withColumn("m", size(col("xs")).cast("long"))
      .withColumn("u",
        expr("aggregate(xs, CAST(0.0 AS DOUBLE), (acc, x) -> (acc + CAST(x AS DOUBLE)) / 2.0)"))
      .withColumn("ewma_cents",
        round(col("u") / (lit(1.0) - lit(1.0) /
            expr("CAST(shiftleft(1L, CAST(m AS INT)) AS DOUBLE)")))
          .cast("long"))
      .select("day", "cents", "m", "ewma_cents")
      .orderBy("day")
  }

  /** Population-stability-index drift monitor — the production-ML
    * distribution-shift alarm: the event stream splits at its calendar
    * midpoint into reference (first half) and current (second half),
    * per-type value bins come from the REFERENCE deciles (the PSI
    * construction: fixed reference bins, so drift moves counts, not
    * edges), and each bin contributes (p_cur − p_ref)·ln(p_cur/p_ref)
    * with +1/(n+buckets) Laplace smoothing (empty bins stay defined).
    * PSI ≳ 0.2 is the conventional retrain trigger.
    *
    * Determinism: the split is integer date arithmetic on (min, max)
    * day; edges are reference values at ranks (k·n div buckets) under
    * (value, event_id) order, and binning compares VALUES only (the
    * same parquet doubles on both engines); terms quantize to integer
    * micro-nats via the gate-proven KL discipline before the BIGINT sum.
    *
    * Shape: bounds and the per-type edge lists are tiny and broadcast;
    * binning is one broadcast join over the scan; the rollup is
    * |types|·buckets·2 rows. One keyed shuffle for the reference rank
    * (per-type partition — the valueDeciles envelope), one for the
    * count rollup.
    *
    * Output per (event_type, bin): reference/current counts and the
    * micro-nat PSI term; Σ psi_micro over a type's bins is its PSI. */
  def psiDrift(events: DataFrame, buckets: Int = 10): DataFrame = {
    val rows = events.select(to_date(col("ts")).as("day"),
      col("event_id"), col("event_type"), col("value"))
    val bounds = broadcast(rows.agg(min("day").as("d0"), max("day").as("d1")))
    val tagged = graft.RunHygiene.stage(rows.crossJoin(bounds)
      // first ceil(span/2) calendar days are the reference window —
      // integer `div`, not Column `/` (which is double division)
      .withColumn("is_ref",
        col("day") < expr("date_add(d0, cast((datediff(d1, d0) + 2) div 2 as int))"))
      .select("event_id", "event_type", "value", "is_ref"))
    tagged.count() // fill once: edges and binning both read it

    val ref = tagged.filter(col("is_ref"))
    val wRank = Window.partitionBy("event_type").orderBy("value", "event_id")
    val nRef = ref.groupBy("event_type").agg(count(lit(1)).as("n_ref"))
    val edges = ref
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .join(broadcast(nRef), Seq("event_type"))
      // edge k sits at reference rank (k·n div buckets), k = 1..buckets−1;
      // ranks that collide on tiny strata select once (fewer, valid bins)
      .filter((1 until buckets)
        .map(k => col("rk") === expr(s"(n_ref * $k) div $buckets"))
        .reduce(_ || _))
      .select(col("event_type"), col("value").as("edge"))

    // edge lists are tiny (≤ buckets−1 per type): broadcast as arrays so
    // binning is a narrow per-row filter-count, never an event-keyed fanout
    val edgeLists = edges.groupBy("event_type")
      .agg(sort_array(collect_list(col("edge"))).as("edges"))
    val counts = tagged.join(broadcast(edgeLists), Seq("event_type"), "left")
      .withColumn("bin",
        when(col("edges").isNull, lit(1L))
          .otherwise(lit(1L) +
            size(filter(col("edges"), e => e < col("value"))).cast("long")))
      .groupBy("event_type", "bin")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
    val totals = broadcast(counts.groupBy("event_type")
      .agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur")))
    val pRef = (col("c_ref") + 1).cast("double") / (col("n_ref") + buckets)
    val pCur = (col("c_cur") + 1).cast("double") / (col("n_cur") + buckets)
    counts.join(totals, Seq("event_type"))
      .withColumn("psi_micro",
        round((pCur - pRef) * log(pCur / pRef) * 1000000).cast("long"))
      .select("event_type", "bin", "c_ref", "c_cur", "psi_micro")
      .orderBy("event_type", "bin")
  }

  /** Seasonal-naive forecast backtest — the baseline every demand/volume
    * forecast must beat: predict day d's revenue as day d−7's (same
    * weekday last week, a CALENDAR join on day − 7, not a row lag — gap
    * days must not slide the season), then report per-weekday error over
    * the whole backtest window. Integer cents throughout (per-row cent
    * rounding before the BIGINT sum, `div` for the mean), so the readout
    * is engine-exact. dow: 0 = Sunday (Spark dayofweek−1 ==
    * DuckDB EXTRACT(DOW)).
    *
    * Shape: the stream collapses to days at the first rollup; the
    * seasonal join and weekday rollup move day-count rows. Output per
    * dow: (n_days, mae_cents, bias_cents). */
  def forecastBacktest(events: DataFrame, season: Int = 7): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val lagged = daily.select(date_add(col("day"), season).as("day"),
      col("cents").as("forecast_cents"))
    daily.join(lagged, Seq("day"))
      .withColumn("dow", (dayofweek(col("day")) - 1).cast("long"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("cents") - col("forecast_cents"))).as("abs_err_cents"),
        sum(col("cents") - col("forecast_cents")).as("bias_cents"))
      .withColumn("mae_cents", expr("abs_err_cents div n_days"))
      .select("dow", "n_days", "mae_cents", "bias_cents")
      .orderBy("dow")
  }

  /** A/B experiment readout with deterministic hash assignment — the
    * experimentation-platform staple: users split into variants by the
    * engine's portable id-hash (mod 2), never rand() — assignment is
    * reproducible, append-stable, and sticky across re-runs, exactly how
    * production bucketing works. Per variant: user count, converters
    * (any 'purchase'), conversion in integer basis points, and revenue
    * cents per user; relative lift of B over A in sign-split integer bp
    * (the yoyRevenue truncation form, so a negative lift cannot truncate
    * differently across engines). Null-hash users (null user_id) land in
    * B on both engines (CASE ELSE-branch parity).
    *
    * Shape: one keyed aggregate per user (map-side combinable), then a
    * variant rollup of per-user rows — corpus-row work collapses at the
    * first groupBy; the readout is a 1-row conditional pivot. No window,
    * no join.
    *
    * Output: one row — (n_users_a, n_users_b, conv_a_bp, conv_b_bp,
    * lift_bp, cents_per_user_a, cents_per_user_b). */
  def abLift(events: DataFrame): DataFrame = {
    val hv = conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val perUser = events
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"),
        sum(when(col("event_type") === "purchase",
          coalesce(round(col("value") * 100).cast("long"), lit(0L)))
          .otherwise(0L)).as("cents"))
      .withColumn("variant", when(pmod(hv, lit(2)) === 0, "A").otherwise("B"))
    perUser.agg(
        sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_users_a"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_users_b"),
        sum(when(col("variant") === "A", col("converted")).otherwise(0L)).as("n_conv_a"),
        sum(when(col("variant") === "B", col("converted")).otherwise(0L)).as("n_conv_b"),
        sum(when(col("variant") === "A", col("cents")).otherwise(0L)).as("cents_a"),
        sum(when(col("variant") === "B", col("cents")).otherwise(0L)).as("cents_b"))
      .withColumn("conv_a_bp", expr("n_conv_a * 10000 div nullif(n_users_a, 0)"))
      .withColumn("conv_b_bp", expr("n_conv_b * 10000 div nullif(n_users_b, 0)"))
      .withColumn("lift_bp",
        when(col("conv_a_bp").isNull || col("conv_a_bp") === 0, lit(null).cast("long"))
          .otherwise((signum(col("conv_b_bp") - col("conv_a_bp")) *
            expr("abs(conv_b_bp - conv_a_bp) * 10000 div conv_a_bp")).cast("long")))
      .select(col("n_users_a"), col("n_users_b"), col("conv_a_bp"), col("conv_b_bp"),
        col("lift_bp"),
        expr("cents_a div nullif(n_users_a, 0)").as("cents_per_user_a"),
        expr("cents_b div nullif(n_users_b, 0)").as("cents_per_user_b"))
  }

  /** Time-boxed funnel: the [[funnel]] chain with a completion window —
    * step i counts only when the earliest chain reaches it within
    * `windowHours` of the user's step-1 arrival (product analytics'
    * standard "converted within 24h" cut; the unbounded funnel can't
    * distinguish a same-session conversion from one weeks later). Same
    * cumulative-conditional-MIN plan — the bound is ONE derived predicate
    * per step on the per-user frame, no extra shuffle. */
  def funnelWindowed(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      windowHours: Int = 24): DataFrame = {
    val winUs = windowHours * 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events.select("user_id", "ts", "event_id", "event_type")
    val withSteps = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val hit =
        if (i == 0) col("event_type") === step
        else col("event_type") === step && col(s"s${i - 1}").isNotNull
      df.withColumn(s"s$i", min(when(hit, col("ts"))).over(w))
    }
    val perUserAggs = steps.indices.map(i => min(col(s"s$i")).as(s"t$i"))
    val perUser = withSteps.groupBy("user_id")
      .agg(perUserAggs.head, perUserAggs.tail: _*)
    val inWin = steps.indices.map(i =>
      col(s"t$i").isNotNull &&
        expr(s"unix_micros(cast(t$i as timestamp)) - unix_micros(cast(t0 as timestamp))") <= winUs)
    val countAggs = steps.indices.map(i =>
      sum(inWin(i).cast("long")).as(s"n$i"))
    val counts = perUser.agg(countAggs.head, countAggs.tail: _*)
    val stepRows = array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step"), lit(s).as("step_name"),
        col(s"n$i").as("n_users"))
    }: _*)
    counts.select(col("n0"), explode(stepRows).as("x"))
      .select(col("x.step").cast("long").as("step"), col("x.step_name").as("step_name"),
        col("x.n_users").as("n_users"),
        when(col("n0") === 0, lit(null).cast("double"))
          .otherwise(round(col("x.n_users") * 100.0 / col("n0"), 2)).as("pct_of_first"))
      .orderBy("step")
  }

  /** Behavioral bot screen — the crawl/spam filter a training-data
    * pipeline runs over behavioral streams before any engagement signal is
    * trusted: per user, exact inter-event gap moments and a regularity
    * verdict. Bots betray themselves with machine-regular timing — the
    * squared coefficient of variation of gaps (var/mean², scale-free)
    * collapses toward 0 for cron-like traffic while organic arrivals sit
    * near 1 (exponential). cv² = (k·Σg² − (Σg)²)/(Σg)² is computed in
    * DECIMAL(38,0) (g² overflows a long at day-scale gaps; DuckDB HUGEINT
    * is the exact twin — the corrProfile discipline), emitted in integer
    * micro-units with NULLIF guards for single-event and zero-span users.
    * One lag window + one keyed rollup, both on user_id — corpus-linear,
    * nothing quadratic. */
  def botScreen(events: DataFrame, minEvents: Int = 20,
      cv2MicroMax: Long = 100000L): DataFrame = {
    // us is monotone in ts, so (us, event_id) is the oracle's (ts, event_id)
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val gaps = events
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        ((max("us") - min("us")) / 1000000L).cast("long").as("span_seconds"),
        count(col("gap")).as("k"),
        sum(col("gap")).as("s"),
        sum(col("gap").cast("decimal(38,0)") * col("gap")).as("s2"))
      .withColumn("avg_gap_us", expr("s div nullif(k, 0L)"))
      .withColumn("cv2_micro", expr(
        """cast((cast(k as decimal(38,0)) * s2 - cast(s as decimal(38,0)) * s) * 1000000
          |     div nullif(cast(s as decimal(38,0)) * s, 0) as long)""".stripMargin))
      .withColumn("is_regular",
        col("n_events") >= minEvents && col("cv2_micro").isNotNull &&
          col("cv2_micro") < cv2MicroMax)
      .select("user_id", "n_events", "span_seconds", "avg_gap_us",
        "cv2_micro", "is_regular")
      .orderBy("user_id")
  }

  /** Per purchase: clicks by the same user in the trailing `windowMinutes`
    * window — the trailing-window non-equi join, planned through
    * [[graft.operators.AsOfJoin.intervalJoin]]'s bucketed equi-join so the
    * oracle's plain inequality join (per-key quadratic, the 100 TB
    * anti-pattern) is reproduced exactly by a shuffle-bounded plan. The
    * left join back onto the purchase roster keeps zero-click purchases
    * (COUNT = 0, null last_click_ts) with left-join-then-aggregate
    * semantics identical to the oracle's outer join + GROUP BY. */
  def clicksBeforePurchase(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id"), col("ts").as("c_ts"))
    val pairs = graft.operators.AsOfJoin.intervalJoin(
      purchases, clicks, "user_id", "p_ts", "c_ts", windowMinutes * 60L * 1000000L)
    val agg = pairs.groupBy("purchase_id")
      .agg(count(col("c_id")).as("n_clicks"), max(col("c_ts")).as("last_click_ts"))
    purchases.join(agg, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"), col("last_click_ts"))
      .orderBy("purchase_id")
  }

  /** Sample-ratio-mismatch guard for the A/B harness: the variant hash of
    * [[abLift]] is supposed to split users 50/50; a skewed split means the
    * assignment (or logging) is broken and every lift readout downstream
    * is garbage — the SRM check is the standard pre-test that catches it.
    *
    * χ² against the 50/50 null collapses to (2·n_a − n)²/n for two cells —
    * PURE integer arithmetic in micro units, no float sums; the flag
    * compares against 3841459 micro (the 3.841459 95th percentile of
    * χ²(1)) so both engines make the identical decision.
    *
    * Scale shape: one user-keyed distinct (the assignment is per user),
    * then a two-cell global aggregate. */
  def abSrmCheck(events: DataFrame): DataFrame = {
    val hv = conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    events.select(col("user_id")).distinct()
      .withColumn("is_a", (pmod(hv, lit(2)) === 0).cast("long"))
      .agg(count(lit(1)).as("n_users"), sum(col("is_a")).as("n_a"))
      .withColumn("n_a", col("n_a").cast("long"))
      .withColumn("n_b", col("n_users") - col("n_a"))
      .withColumn("srm_chi2_micro",
        // delta² · 10⁶ can pass 2⁶³ on a pathologically skewed big corpus —
        // combine in DECIMAL(38,0) (HUGEINT in the oracle), emit BIGINT
        expr("CAST(CAST(2 * n_a - n_users AS DECIMAL(38,0)) * (2 * n_a - n_users) " +
          "* 1000000 DIV nullif(CAST(n_users AS DECIMAL(38,0)), 0) AS BIGINT)"))
      .withColumn("srm_flag", col("srm_chi2_micro") > lit(3841459L))
      .select("n_users", "n_a", "n_b", "srm_chi2_micro", "srm_flag")
  }

  /** Experiment power analysis — the third leg of the A/B family
    * ([[abLift]] reads the effect, [[abSrmCheck]] validates the split,
    * this answers "was the test even big enough?"): per-arm sample size
    * required to detect the observed conversion delta at α = 0.05
    * two-sided / power 0.8, and the minimum detectable effect at the
    * current size. A "non-significant" lift with n_required ≫ n is an
    * underpowered test, not a null result — the readout that stops teams
    * shipping on noise.
    *
    * n/arm = 2·(z_{α/2}+z_β)²·p̄(1−p̄)/δ² with the z literals written
    * identically on both engines (1.959964, 0.841621); every input to the
    * double tree is an exact integer count, so the doubles agree and
    * CEIL/ROUND pin the outputs. Zero observed delta → null n_required
    * (NULLIF, no engine-divergent infinity).
    *
    * Scale shape: one user-keyed rollup (the abLift shuffle), then 1-row
    * arithmetic. */
  def abPowerAnalysis(events: DataFrame): DataFrame = {
    val hv = conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val perUser = events
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
      .withColumn("is_a", (pmod(hv, lit(2)) === 0).cast("long"))
    val cells = perUser.agg(
      sum(col("is_a")).cast("long").as("n_a"),
      sum(lit(1L) - col("is_a")).cast("long").as("n_b"),
      sum(col("converted") * col("is_a")).cast("long").as("conv_a"),
      sum(col("converted") * (lit(1L) - col("is_a"))).cast("long").as("conv_b"))
    val z2 = pow(lit(1.959964) + lit(0.841621), 2.0)
    val pPool = (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b"))
    val delta = col("conv_b").cast("double") / col("n_b") -
      col("conv_a").cast("double") / col("n_a")
    val varP = pPool * (lit(1.0) - pPool)
    val nMin = least(col("n_a"), col("n_b")).cast("double")
    cells.select(
        col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        round(pPool, 6).as("p_pooled"),
        round(delta, 6).as("delta_observed"),
        ceil(lit(2.0) * z2 * varP /
          nullif(delta * delta, lit(0.0))).cast("long").as("n_required_per_arm"),
        round(sqrt(lit(2.0) * z2 * varP / nullif(nMin, lit(0.0))), 6)
          .as("mde_at_current_n"))
  }

  /** Cohort lifetime-value matrix: users grouped by first-activity DAY
    * (the [[retention]] cohort convention — the corpus spans one month, so
    * a month axis would collapse to a single row; a production run flips
    * the truncation to month with the same plan), cumulative purchase
    * revenue per user tracked by cohort age — the value-weighted
    * counterpart of retention (which counts presence; this follows the
    * money, which is what LTV payback decisions read).
    *
    * Age is DATE subtraction in whole days (identical integer semantics
    * on both engines); revenue is cents at source, the per-user cumulative
    * is exact integer micro-units (cum_cents·10⁶ div (users·100) — value
    * units per cohort user). Ages with zero purchases emit no row; the
    * cumulative carries across the gap (downstream fills the calendar if
    * it needs density — the gap-fill operator exists separately).
    *
    * Scale shape: one user-keyed window finds each user's cohort (the
    * corpus's only big shuffle, on the natural user key), then everything
    * aggregates onto the (cohort × age) domain — map-side combinable —
    * with the cohort-size table broadcast back and one window pass over
    * the domain-sized matrix. */
  def cohortLtv(events: DataFrame): DataFrame = {
    val wUser = Window.partitionBy("user_id")
    val base = events.select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("cohort_day", min(col("d")).over(wUser))
    val cohortSizes = base.select("user_id", "cohort_day").distinct()
      .groupBy("cohort_day").agg(count(lit(1)).as("n_users"))
    val matrix = base.filter(col("event_type") === "purchase")
      .withColumn("age_days", datediff(col("d"), col("cohort_day")).cast("long"))
      .groupBy("cohort_day", "age_days")
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("rev_cents"))
    val wC = Window.partitionBy("cohort_day").orderBy("age_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    matrix.join(broadcast(cohortSizes), "cohort_day")
      .withColumn("cum_cents", sum(col("rev_cents")).over(wC))
      .select(
        col("cohort_day"),
        col("age_days"), col("n_users"), col("n_purchases"),
        round(col("rev_cents") / 100.0, 2).as("revenue"),
        expr("cum_cents * 1000000L div (n_users * 100)").as("ltv_micro"))
      .orderBy("cohort_day", "age_days")
  }

  /** Difference-in-differences readout (Card & Krueger 1994's design,
    * the standard quasi-experimental estimator): the treatment effect as
    * (B_post − B_pre) − (A_post − A_pre) over per-user pre/post spend —
    * the pre-period difference nets out any assignment imbalance the way
    * a raw post comparison cannot (the parallel-trends assumption made
    * operational). Completes the experimentation family: lift (raw), SRM
    * (assignment audit), power (sizing), CUPED (variance reduction), DiD
    * (baseline-imbalance correction).
    *
    * Determinism: per-user cents are exact integers, the four cohort
    * means are single divisions of exact integer sums, and the DiD is a
    * fixed double tree over them — identical on both engines, one ROUND
    * at the readout. One user-keyed rollup, a 1-row output. */
  def didLift(events: DataFrame, cut: String = "2024-01-16 00:00:00"): DataFrame = {
    val hv = conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val cents = coalesce(round(col("value") * 100).cast("long"), lit(0L))
    val cutTs = lit(cut).cast("timestamp_ntz")
    val perUser = events.groupBy("user_id").agg(
        sum(when(col("ts") < cutTs && col("event_type") === "purchase", cents)
          .otherwise(0L)).as("x"),
        sum(when(col("ts") >= cutTs && col("event_type") === "purchase", cents)
          .otherwise(0L)).as("y"))
      .withColumn("variant", when(pmod(hv, lit(2)) === 0, "A").otherwise("B"))
    def mean(sm: Column, n: Column): Column = sm.cast("double") / n
    perUser.agg(
        sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === "A", col("x")).otherwise(0L)).as("sx_a"),
        sum(when(col("variant") === "A", col("y")).otherwise(0L)).as("sy_a"),
        sum(when(col("variant") === "B", col("x")).otherwise(0L)).as("sx_b"),
        sum(when(col("variant") === "B", col("y")).otherwise(0L)).as("sy_b"))
      .select(col("n_a"), col("n_b"),
        round(mean(col("sx_a"), col("n_a")), 4).as("mean_pre_a"),
        round(mean(col("sy_a"), col("n_a")), 4).as("mean_post_a"),
        round(mean(col("sx_b"), col("n_b")), 4).as("mean_pre_b"),
        round(mean(col("sy_b"), col("n_b")), 4).as("mean_post_b"),
        round((mean(col("sy_b"), col("n_b")) - mean(col("sx_b"), col("n_b"))) -
          (mean(col("sy_a"), col("n_a")) - mean(col("sx_a"), col("n_a"))), 4)
          .as("did_cents"))
  }

  /** CUPED variance-reduced A/B readout (Deng, Xu, Kohavi & Walker,
    * WSDM 2013 — the industry-standard experimentation technique): use
    * each user's PRE-period spend X as a control covariate for their
    * post-period spend Y, reporting Y' = Y − θ(X − mean X) per variant
    * with θ = cov(X,Y)/var(X). Pre-period behavior is independent of the
    * treatment, so the adjustment shifts no true effect but removes the
    * between-user variance X explains — the experiment reaches
    * significance with (1 − ρ²)× the sample a raw readout needs.
    *
    * Determinism: X and Y are exact integer cents per user; θ's
    * numerator/denominator are the textbook n·Σxy − Σx·Σy forms computed
    * in DECIMAL(38,0) ↔ HUGEINT (exact at any corpus size — the
    * embeddingCovariance discipline); θ, the adjusted means, and ρ² are
    * fixed double expression trees over those exact integers, written
    * identically in the oracle, with one ROUND at the readout.
    *
    * Scale shape: one user-keyed rollup of the event stream (the only
    * corpus-wide shuffle), a 1-row global census broadcast back over the
    * 2-row variant rollup. Nothing driver-side, nothing quadratic.
    *
    * Output: one row per variant — n, raw mean_y, mean_y_adj, with the
    * shared theta/rho2 audit columns repeated. */
  def cupedLift(events: DataFrame, cut: String = "2024-01-16 00:00:00"): DataFrame = {
    val hv = conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val cents = coalesce(round(col("value") * 100).cast("long"), lit(0L))
    val cutTs = lit(cut).cast("timestamp_ntz")
    val dec = "decimal(38,0)"
    val perUser = events.groupBy("user_id").agg(
        sum(when(col("ts") < cutTs && col("event_type") === "purchase", cents)
          .otherwise(0L)).as("x"),
        sum(when(col("ts") >= cutTs && col("event_type") === "purchase", cents)
          .otherwise(0L)).as("y"))
      .withColumn("variant", when(pmod(hv, lit(2)) === 0, "A").otherwise("B"))
    val g = graft.RunHygiene.stage(perUser)
    g.count() // fill once: global census and variant rollup both read it
    val globals = broadcast(g.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
      sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
      sum(col("y").cast(dec) * col("y").cast(dec)).as("syy")))
    val num = col("n").cast(dec) * col("sxy") - col("sx") * col("sy")
    val denX = col("n").cast(dec) * col("sxx") - col("sx") * col("sx")
    val denY = col("n").cast(dec) * col("syy") - col("sy") * col("sy")
    g.groupBy("variant").agg(
        count(lit(1)).as("n_v"),
        sum(col("x").cast(dec)).as("sx_v"),
        sum(col("y").cast(dec)).as("sy_v"))
      .crossJoin(globals)
      .withColumn("theta",
        when(denX === lit(0).cast(dec), lit(0.0))
          .otherwise(num.cast("double") / denX.cast("double")))
      .withColumn("rho2",
        when(denX === lit(0).cast(dec) || denY === lit(0).cast(dec), lit(0.0))
          .otherwise((num.cast("double") / denX.cast("double")) *
            (num.cast("double") / denY.cast("double"))))
      .select(col("variant"), col("n_v"),
        round(col("sy_v").cast("double") / col("n_v"), 4).as("mean_y"),
        round(col("sy_v").cast("double") / col("n_v") -
          col("theta") * (col("sx_v").cast("double") / col("n_v") -
            col("sx").cast("double") / col("n")), 4).as("mean_y_adj"),
        round(col("theta"), 6).as("theta"),
        round(col("rho2"), 6).as("rho2"))
      .orderBy("variant")
  }
}
