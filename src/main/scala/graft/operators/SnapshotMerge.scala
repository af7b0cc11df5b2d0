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
