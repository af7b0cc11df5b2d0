package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 1000-executor case.
  *
  * Context: Spark already covers most skew — map-side partial aggregation
  * absorbs whale keys in groupBy, and AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin`) handles sort-merge joins. The remaining
  * gap is a shuffled join against a side too big to broadcast where AQE
  * can't split (or isn't available): the classic replicated-salt join.
  */
object Skew {

  /** Salted equi-join, whale-only (round 4; the original form salted every
    * key): a first cheap pass finds keys with at least `whaleMinRows`
    * rows on the skewed side (map-side combine absorbs the count, and the
    * result — keys above a frequency floor — is small by definition, so it
    * broadcasts). Only those whale keys are salted: whale rows on the
    * skewed side get a deterministic salt in [0, buckets) and their
    * matching `other` rows replicate ×buckets; the long tail joins plainly
    * under a constant salt of 0. One shuffled join either way — the split
    * lives in the salt expression, not in a union — so the result multiset
    * is identical to the plain join while replicated-shuffle volume drops
    * from ×buckets on ALL of `other` to ×buckets on the whale slice only.
    *
    * Cost: one extra aggregation scan of the skewed side (the whale
    * census) + a broadcast of the whale key set to both sides. The salt is
    * a hash of the whole row, so retries recompute the same assignment
    * (no rand()).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      buckets: Int = 16, whaleMinRows: Long = 1L << 20): DataFrame = {
    val keyCols = keys.map(col)
    val whales = broadcast(
      skewed.groupBy(keyCols: _*).agg(count(lit(1)).as("_kn"))
        .filter(col("_kn") >= whaleMinRows)
        .select(keyCols: _*)
        .withColumn("_whale", lit(true)))
    val left = skewed.join(whales, keys, "left")
      .withColumn("_salt",
        when(col("_whale").isNotNull,
          pmod(hash(skewed.columns.map(col).toIndexedSeq: _*), lit(buckets)))
          .otherwise(lit(0)))
      .drop("_whale")
    val right = other.join(whales, keys, "left")
      .withColumn("_salt",
        explode(when(col("_whale").isNotNull, sequence(lit(0), lit(buckets - 1)))
          .otherwise(array(lit(0)))))
      .drop("_whale")
    left.join(right, keys :+ "_salt").drop("_salt")
  }

  /** Two-stage (salted) aggregation: partial sums per (key, salt) then the
    * tiny final rollup. Useful when a single group's *distinct* inputs are
    * too many for one reducer even after map-side combine (e.g.
    * collect-heavy or high-cardinality-input aggregates). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("_salt", pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(buckets)))
      .groupBy((keyCols :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }
}
