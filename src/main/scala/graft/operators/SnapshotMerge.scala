package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-plus-delta MERGE — the batch upsert idiom: yesterday's
  * per-customer balance snapshot merged with today's delta by a
  * full-outer join + coalesce. This is exactly what a table-format
  * `MERGE INTO` (Delta/Iceberg) lowers to physically, expressed as the
  * engine's own composable operator: new keys insert, quiet keys carry,
  * overlapping keys update — one keyed join, no driver state.
  *
  * Scale: both sides are per-customer aggregates (map-side combined), so
  * the outer join moves customer-cardinality rows, not transactions; at
  * deployment the snapshot side is the stored table and the delta the
  * day's partition, co-partitioning them (see [[graft.sources.Bucketing]])
  * makes the merge exchange-free.
  */
object SnapshotMerge {

  /** Merge the pre-`cutoff` balance snapshot with the post-`cutoff`
    * delta. Output: (customer_id, snapshot_balance, delta_change,
    * merged_balance, status) — snapshot/delta stay NULL when that side
    * has no rows (that is what `status` names: new / carried / updated).
    */
  /** Incremental maintenance of an ADDITIVE rollup — the materialized-view
    * half of the merge family ([[balanceUpsert]] maintains rows; this
    * maintains AGGREGATES): yesterday's stored (event_type, day) rollup
    * merged with the rollup of today's append-only delta, using the
    * maintenance identities agg(A ⊎ B) = combine(agg(A), agg(B)) for
    * count/sum (addition) and min/max (least/greatest). The whole point of
    * the operator is what its gate asserts cross-engine: the merged table
    * EQUALS the from-scratch recompute over all rows — so a 100 TB
    * deployment can maintain the rollup by scanning only the day's delta
    * partition, never the corpus. (COUNT DISTINCT is deliberately absent:
    * it has no additive combine — that is what the mergeable HLL sketch
    * gates are for, `operators/Sketches`.)
    *
    * Determinism: cents are the exact floor(x·100 + 0.5) integer fix-up
    * with NULL/NaN nulled identically on both engines (NULLs vanish from
    * SUM/MIN/MAX and stay counted in n); sums accumulate DECIMAL(38,0)
    * and emit LONG (the gate-boundary law). Scale shape: two map-side-
    * combinable rollups (one delta-sized) + one keyed full-outer join on
    * the rollup DOMAIN (types × days — metadata-sized), never on rows. */
  def rollupMaintain(events: DataFrame, cutoff: String): DataFrame = {
    val cut = lit(cutoff).cast("timestamp_ntz")
    val cents = when(col("value").isNull || isnan(col("value")), lit(null).cast("long"))
      .otherwise(floor(col("value") * 100 + 0.5).cast("long"))
    val keyed = events.select(
      col("event_type"),
      date_format(col("ts"), "yyyy-MM-dd").as("day"),
      cents.as("cents"),
      col("ts"))
    def roll(df: DataFrame, side: String): DataFrame =
      df.groupBy("event_type", "day").agg(
        count(lit(1)).as(s"n_$side"),
        sum(col("cents").cast("decimal(38,0)")).cast("long").as(s"sum_$side"),
        min("cents").as(s"min_$side"),
        max("cents").as(s"max_$side"))
    val base = roll(keyed.filter(col("ts") < cut), "b")
    val delta = roll(keyed.filter(col("ts") >= cut), "d")
    base.join(delta, Seq("event_type", "day"), "full_outer")
      .select(
        col("event_type"), col("day"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
        // a side with rows but all-NULL cents leaves its sum NULL: treat
        // as additive zero UNLESS both sides are NULL (then no measured
        // rows exist at all and the honest sum is NULL)
        when(col("sum_b").isNull && col("sum_d").isNull, lit(null).cast("long"))
          .otherwise(coalesce(col("sum_b"), lit(0L)) + coalesce(col("sum_d"), lit(0L)))
          .as("cents_sum"),
        coalesce(least(col("min_b"), col("min_d")), col("min_b"), col("min_d"))
          .as("cents_min"),
        coalesce(greatest(col("max_b"), col("max_d")), col("max_b"), col("max_d"))
          .as("cents_max"),
        when(col("n_b").isNull, "new")
          .when(col("n_d").isNull, "carried")
          .otherwise("updated").as("status"))
      .orderBy("event_type", "day")
  }

  def balanceUpsert(txns: DataFrame, cutoff: String): DataFrame = {
    val cut = lit(cutoff).cast("timestamp_ntz")
    val snap = txns.filter(col("timestamp") < cut)
      .groupBy("customer_id")
      .agg(round(sum(col("amount")), 2).as("snapshot_balance"))
    val delta = txns.filter(col("timestamp") >= cut)
      .groupBy("customer_id")
      .agg(round(sum(col("amount")), 2).as("delta_change"))
    snap.join(delta, Seq("customer_id"), "full_outer")
      .select(
        col("customer_id"),
        col("snapshot_balance"),
        col("delta_change"),
        round(coalesce(col("snapshot_balance"), lit(0.0)) +
          coalesce(col("delta_change"), lit(0.0)), 2).as("merged_balance"),
        when(col("snapshot_balance").isNull, "new")
          .when(col("delta_change").isNull, "carried")
          .otherwise("updated").as("status"))
      .orderBy("customer_id")
  }
}
