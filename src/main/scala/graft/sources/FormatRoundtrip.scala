package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sink→scan roundtrip gates for the non-parquet storage formats Spark
  * bundles (ORC is a built-in datasource backed by /opt/spark/jars/orc-core;
  * CSV and JSON-lines are core). The reference pipeline's source matrix is
  * xlsx→parquet→csv/json (reference: src/thrive_cash_processing_dag.py — the
  * staging writes at :257 and the csv/json report sinks); a 100 TB curation
  * stack additionally needs format-conversion jobs (e.g. parquet→ORC for a
  * downstream Hive/Trino consumer, parquet→JSONL for a labeling vendor), and
  * the property that matters is round-trip *fidelity*: every value written
  * must come back exactly.
  *
  * Each gate here writes `orders` (or a text-safe projection of it) through
  * the format under test, reads it back, and reduces the result to a small
  * per-priority digest of exact-integer sums and string min/max. The DuckDB
  * oracle computes the same digest straight from the source parquet — so a
  * hash match proves the format preserved every row, key, char, cent and day
  * through the sink and the scan, without the oracle ever needing to read the
  * format itself (DuckDB has no ORC reader).
  *
  * Scale: the write is per-partition parallel with no shuffle (a 100 TB
  * conversion is a map-only job); the digest is one map-side-combinable
  * aggregate over a handful of groups. Digest sums use DECIMAL(38,0) ↔
  * HUGEINT so they cannot overflow at any corpus size. Cents are derived as
  * `floor(price * 100)` — the identical IEEE double multiply+floor on both
  * engines — *before* any text serialization, so the CSV/JSON paths carry
  * only longs and strings (text round-trips of raw doubles are not
  * guaranteed digit-exact and are deliberately avoided).
  */
object FormatRoundtrip {

  /** Staging root: one subdirectory per (format, source-dir) pair so sf0.001
    * / sf0.01 / stress runs in one JVM never clobber each other. Inputs under
    * a testdata dir are immutable, but the write is mode(overwrite) anyway so
    * a re-run is self-healing. Keyed by a strong digest of the absolute
    * path ([[graft.RunHygiene.pathKey]]) — a 32-bit hashCode collision
    * would have silently crossed two datasets' staging trees. */
  private def stagingDir(fmt: String, sourceDir: String): String =
    s"/tmp/graft_roundtrip/${fmt}_${graft.RunHygiene.pathKey(sourceDir)}"

  /** orders with the timestamp normalized to µs TIMESTAMP_NTZ (the engine's
    * wall-clock convention — see [[Tables]] scaladoc), so the ORC writer
    * stores a zone-free value and the read-back cannot shift across JVM
    * timezones. */
  private def ordersNtz(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("o_orderdate", col("o_orderdate").cast(TimestampNTZType))

  /** Text-safe projection for the CSV/JSON paths: longs and strings only
    * (cents and day derived up front, see object scaladoc). */
  private def ordersTextSafe(spark: SparkSession, dir: String): DataFrame =
    ordersNtz(spark, dir).select(
      col("o_orderkey"),
      col("o_orderstatus"),
      col("o_orderpriority"),
      floor(col("o_totalprice") * lit(100)).cast(LongType).as("cents"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"))

  private val textSafeSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_orderpriority", StringType),
    StructField("cents", LongType),
    StructField("order_day", StringType)))

  private val big = DecimalType(38, 0)

  /** Per-priority digest of the full-fidelity (ORC) roundtrip. Sums
    * accumulate in DECIMAL(38,0) (overflow-proof at any corpus size) and
    * are EMITTED as LONG — the gate boundary type every green twin uses
    * (`CAST(SUM(...) AS BIGINT)`); per-priority digests of this corpus
    * shape fit int64 with 9 orders of magnitude to spare. */
  private[graft] def fullDigest(df: DataFrame): DataFrame =
    df.groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_orderkey").cast(big)).cast("long").as("key_sum"),
        sum(col("o_custkey").cast(big)).cast("long").as("cust_sum"),
        sum(floor(col("o_totalprice") * lit(100)).cast(big)).cast("long").as("cents_sum"),
        sum(length(col("o_orderstatus")).cast(big)).cast("long").as("status_chars"),
        min(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("d_min"),
        max(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("d_max"))
      .orderBy("o_orderpriority")

  /** Per-priority digest of the text-safe (CSV/JSON) roundtrip — same
    * DECIMAL accumulation / LONG boundary as [[fullDigest]]. */
  private def textDigest(df: DataFrame): DataFrame =
    df.groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_orderkey").cast(big)).cast("long").as("key_sum"),
        sum(col("cents").cast(big)).cast("long").as("cents_sum"),
        sum(length(col("o_orderstatus")).cast(big)).cast("long").as("status_chars"),
        min(col("order_day")).as("d_min"),
        max(col("order_day")).as("d_max"))
      .orderBy("o_orderpriority")

  /** Digest computed straight from the source parquet — the in-engine
    * reference the roundtrip digests must equal (FormatRoundtripSpec). */
  def directFullDigest(spark: SparkSession, dir: String): DataFrame =
    fullDigest(ordersNtz(spark, dir))

  /** Text-safe counterpart of [[directFullDigest]]. */
  def directTextDigest(spark: SparkSession, dir: String): DataFrame =
    textDigest(ordersTextSafe(spark, dir))

  /** parquet → ORC → digest. Full-schema write (longs, strings, double,
    * TIMESTAMP_NTZ), exercising ORC's typed columnar path end to end. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = stagingDir("orc", dir)
    ordersNtz(spark, dir).write.mode("overwrite").orc(path)
    fullDigest(spark.read.orc(path))
  }

  /** parquet → headered CSV → digest. Read back with an explicit schema
    * (schema-on-read, no inference pass — at 100 TB an inference scan would
    * double the read). */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = stagingDir("csv", dir)
    ordersTextSafe(spark, dir).write.mode("overwrite")
      .option("header", "true").csv(path)
    textDigest(
      spark.read.schema(textSafeSchema).option("header", "true").csv(path))
  }

  /** parquet → JSON lines → digest. Explicit schema on the read for the same
    * reason as CSV; JSONL is the interchange format labeling vendors and
    * open-data releases actually consume. */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = stagingDir("json", dir)
    ordersTextSafe(spark, dir).write.mode("overwrite").json(path)
    textDigest(spark.read.schema(textSafeSchema).json(path))
  }

  /** The partition values [[partitionedPruneScan]] keeps — chosen so the
    * scan must skip the other three priority directories entirely. */
  val prunedPriorities: Seq[String] = Seq("1-URGENT", "2-HIGH")

  /** Hive-partitioned write + partition-pruned read: `orders` laid out as
    * `o_orderpriority=<v>/` directories, then scanned with an IN filter on
    * the partition column. At 100 TB this is THE layout primitive — a query
    * touching 2 of N partitions must read 2/N of the bytes, enforced at
    * file-listing time (the filter lands in the scan's `PartitionFilters`,
    * not in row-group `PushedFilters` — FormatRoundtripSpec pins that plan
    * shape). Listing cost is ∝ partitions touched, not corpus size. */
  def partitionedPruneScan(spark: SparkSession, dir: String): DataFrame = {
    val path = stagingDir("part", dir)
    ordersNtz(spark, dir).write.mode("overwrite")
      .partitionBy("o_orderpriority").parquet(path)
    spark.read.parquet(path)
      .where(col("o_orderpriority").isin(prunedPriorities.map(lit): _*))
  }

  /** Gated digest of the pruned scan — equality with the DuckDB twin (the
    * same digest over `WHERE o_orderpriority IN (...)` on the source
    * parquet) proves the partitioned layout lost nothing and the pruned
    * read returned exactly the kept partitions. */
  def partitionedPrune(spark: SparkSession, dir: String): DataFrame =
    fullDigest(partitionedPruneScan(spark, dir))

  /** Priority → SLA-tier mapping for the dynamic-partition-pruning gate:
    * a dimension whose FILTER column (tier) is not the partition column,
    * so no static IN-list can prune the fact — exactly the situation DPP
    * exists for. */
  val priorityTiers: Seq[(String, String)] = Seq(
    "1-URGENT" -> "expedite", "2-HIGH" -> "expedite",
    "3-MEDIUM" -> "standard", "4-NOT SPECIFIED" -> "standard",
    "5-LOW" -> "deferred")

  /** Dynamic-partition-pruning join: the hive-partitioned fact joined to a
    * dimension filtered on a NON-partition attribute (`tier = 'expedite'`).
    * Statically the optimizer cannot know which priority directories
    * qualify — the qualifying keys exist only after the dim filter runs —
    * so Spark plants a `dynamicpruningexpression` in the fact scan's
    * PartitionFilters: at execution the dim side's broadcast result feeds
    * the file listing, and the fact reads ONLY the matching directories.
    * At 100 TB this is the difference between scanning 2/5 and 5/5 of the
    * corpus for every tier-scoped query, decided at runtime with zero
    * user annotation. FormatRoundtripSpec pins the dynamicpruning
    * expression in the plan; the gate digest proves the pruned join lost
    * nothing vs the DuckDB twin (same join over the source parquet). */
  def dppJoinScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = stagingDir("dpp", dir)
    ordersNtz(spark, dir).write.mode("overwrite")
      .partitionBy("o_orderpriority").parquet(path)
    val dimPath = stagingDir("dpp_dim", dir)
    // the dim must be a REAL table, not a LocalRelation: the optimizer
    // constant-folds a filter over in-memory rows away, and with no
    // surviving selective predicate the PartitionPruning rule never fires
    priorityTiers.toDF("priority", "tier")
      .write.mode("overwrite").parquet(dimPath)
    val fact = spark.read.parquet(path)
    val dim = spark.read.parquet(dimPath).where(col("tier") === "expedite")
    fact.join(dim, fact("o_orderpriority") === dim("priority"))
  }

  /** Gated digest of the DPP join (drops the dim's helper columns so the
    * digest schema matches the full-fidelity one). */
  def dppJoin(spark: SparkSession, dir: String): DataFrame =
    fullDigest(dppJoinScan(spark, dir)
      .drop("priority", "tier"))

  /** Schema-evolution merge read: two ingest batches land in the same
    * table directory with different schemas (the second batch adds a
    * `lang` column — the canonical "pipeline v2 started emitting a new
    * field" event in a long-lived 100 TB lake), and the scan reconciles
    * them with `mergeSchema`, null-filling the column for the old batch.
    * The digest counts non-null `lang` per source, so the gate proves the
    * merge read sees the new column exactly where it was written and
    * NULL exactly where it wasn't — no silent column drop, no misaligned
    * fill. Schema merge is a footer-metadata operation (cost ∝ files, not
    * bytes); the data read stays columnar and pruned. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    // Fresh RUN-SCOPED subdir per invocation: the overwrite-then-append
    // pair below is not atomic, so two concurrent invocations sharing one
    // directory could interleave (one run's overwrite racing the other's
    // append doubles batch 2). A per-run path makes the gate re-entrant;
    // registered with RunHygiene so the runner's drain (or JVM exit)
    // deletes it — fresh UUID paths are never overwritten, so without
    // registration every round leaked them (round-10 advice).
    val path = graft.RunHygiene.scratch(spark,
      s"${stagingDir("evo", dir)}/run_${java.util.UUID.randomUUID.toString.take(8)}")
    val docs = Tables.documents(spark, dir)
    docs.where(pmod(col("doc_id"), lit(2)) === 0)
      .select("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(path)
    docs.where(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
      .write.mode("append").parquet(path)
    spark.read.option("mergeSchema", "true").parquet(path)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n"),
        sum(col("doc_id").cast(big)).cast("long").as("id_sum"),
        sum(col("n_chars").cast(big)).cast("long").as("char_sum"),
        count(col("lang")).as("n_lang"),
        min(col("lang")).as("lang_min"),
        max(col("lang")).as("lang_max"))
      .orderBy("source")
  }
}
