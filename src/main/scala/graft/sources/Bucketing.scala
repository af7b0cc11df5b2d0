package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table staging: pre-shuffle a table ONCE on its join key so
  * every subsequent equi-join or aggregation on that key is exchange-free.
  *
  * This is the storage-layout half of the 100 TB join strategy: two fact
  * tables bucketed by the same key into the same bucket count sort-merge
  * join with NO Exchange on either side (bucket i joins bucket i), so the
  * recurring daily join pays zero shuffle instead of re-shuffling terabytes
  * per run. Broadcast covers small dimensions; AQE covers skew; bucketing
  * covers the repeated big⋈big join — the three-legged stool.
  *
  * The bucket function is Spark's Murmur3 hash — bucketed layouts written
  * here are readable by any Spark deployment (standard `bucketBy` files +
  * catalog metadata), no custom format involved.
  */
object Bucketing {

  /** Stage `df` as a bucketed, per-bucket-sorted external table at `path`.
    * Re-staging overwrites (the idempotent-restart contract). */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a staged bucketed table back (bucket metadata rides with the
    * catalog entry, so joins on `key` skip the exchange). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
