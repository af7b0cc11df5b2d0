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

  /** Salted equi-join: the skewed (big) side gets a deterministic per-row
    * salt in [0, buckets); the other side is replicated `buckets` times.
    * Each big-side row meets exactly the replica carrying its salt, so the
    * result multiset is identical to the plain join while the whale key's
    * rows spread over `buckets` reducers.
    *
    * Cost: small side shuffles ×buckets — choose `buckets` ≈ (whale-key
    * rows / target-partition rows). The salt is a hash of the whole row, so
    * retries recompute the same assignment (no rand()).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      buckets: Int = 16): DataFrame = {
    val saltCol = pmod(hash(skewed.columns.map(col).toIndexedSeq: _*), lit(buckets))
    val left = skewed.withColumn("_salt", saltCol)
    val right = other.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
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
