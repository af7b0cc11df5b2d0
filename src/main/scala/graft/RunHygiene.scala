package graft

import org.apache.spark.sql.SparkSession

/** Storage hygiene for many-query sessions (Bench / Verify run 60+ queries
  * in one SparkSession).
  *
  * Operators persist their stage tables (shingle sets, packed blocks,
  * fingerprints) for reuse WITHIN one query plan; nothing can unpersist
  * them at the right time from inside a lazy DataFrame. Left alone, 60+
  * queries accumulate every such cache in the storage pool — harmless on an
  * idle 128 GiB box, but under memory pressure it turns into eviction/GC
  * churn that inflates exactly the allocation-heavy queries. The runner
  * drops per-query leftovers once the query's action completes, keeping
  * only the shared pipeline stage cache (matched ledger / balance history),
  * which IS meant to live for the session.
  */
object RunHygiene {
  /** RDD ids persisted right now — snapshot after materializing the shared
    * stages; those are the session-lived caches to protect. */
  def persistedIds(spark: SparkSession): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Unpersist everything persisted since the `protect` snapshot. */
  def dropNewPersists(spark: SparkSession, protect: Set[Int]): Unit = {
    val now = spark.sparkContext.getPersistentRDDs
    now.keysIterator.filterNot(protect).foreach { id =>
      now.get(id).foreach(_.unpersist(blocking = false))
    }
  }
}
