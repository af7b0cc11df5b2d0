package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional half of the
  * storage-layout story next to [[Bucketing]]'s join co-location. A
  * 100 TB table queried by EITHER of two range predicates can't be
  * range-partitioned to serve both; sorting by the interleaved-bit
  * Z-value keeps consecutive codes inside small axis-aligned rectangles,
  * so per-file min/max statistics prune on both dimensions at once
  * (parquet row-group skipping, the same mechanism Delta/Iceberg OPTIMIZE
  * ZORDER exploits — public technique, Morton 1966).
  *
  * Write path (the deployment shape): {{{
  *   df.withColumn("z", ZOrder.zValue(xCol, yCol))
  *     .repartitionByRange(nFiles, col("z"))
  *     .sortWithinPartitions("z")
  *     .write.parquet(...)
  * }}}
  * — one range exchange, file-local sorts, no global sort. The gated
  * query below emits the evidence instead of files: per Z-bucket, the
  * bounding rectangle each bucket's rows occupy. By the curve's
  * construction a bucket of 2^(32−bits) consecutive codes spans at most
  * 2^⌈(32−bits)/2⌉ values per axis — the pin the spec asserts.
  *
  * Everything is built from codegen'd native bitwise ops (shift/and/or):
  * a custom kernel would add nothing Catalyst doesn't already compile.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even positions (0, 2, …, 30) —
    * the standard mask-doubling sequence. */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions: x on even bits, y on
    * odd bits. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Clustering-quality stats for Z-ordering `orders` on
    * (o_custkey, days-since-epoch-of-o_orderdate): one row per Z-bucket
    * (top `bucketBits` bits of the code — a bucket ≈ one output file)
    * with its row count and per-axis bounding box. Narrow projection →
    * one map-side-combinable aggregate → output sort; no joins, no
    * windows, no driver state. */
  def zorderStats(orders: DataFrame, bucketBits: Int = 10): DataFrame = {
    val x = col("o_custkey").bitwiseAND(lit(0xFFFFL))
    val y = datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
      .cast("long").bitwiseAND(lit(0xFFFFL))
    orders
      .select(x.as("xd"), y.as("yd"))
      .withColumn("zbucket", shiftright(zValue(col("xd"), col("yd")), 32 - bucketBits))
      .groupBy("zbucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("xd")).as("x_min"), max(col("xd")).as("x_max"),
        min(col("yd")).as("y_min"), max(col("yd")).as("y_max"))
      .withColumn("x_span", col("x_max") - col("x_min") + 1)
      .withColumn("y_span", col("y_max") - col("y_min") + 1)
      .orderBy("zbucket")
  }
}
