package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical-layout / ops-planning operators: the decisions a 100 TB
  * deployment automates rather than eyeballs — join-key skew measurement
  * (drives salting factors and AQE expectations) and small-file compaction
  * planning (the #1 operational failure mode of long-lived parquet lakes).
  *
  * Both are exact-integer analyses so the DuckDB twins hash-match without
  * any floating-point pinning.
  */
object Physical {

  /** Join-key skew census over a set of key columns, with a concrete
    * salting recommendation per key.
    *
    * Shape: per key ONE keyed count (map-side combinable) → a
    * count-of-counts rollup whose domain is O(max multiplicity) — tiny and
    * corpus-invariant — so the exact p99-of-key-counts comes from a
    * cumulative window over that tiny frame, never a global sort of the
    * key census. Totals ride back on a 1-row broadcast crossJoin (the
    * scalar pattern used throughout this repo). At 100 TB the per-key
    * count is the only corpus-sized stage and it is a plain partial-agg
    * shuffle; everything downstream is bounded by distinct COUNT VALUES,
    * not distinct keys.
    *
    * `recommended_salt` = ceil(max_key_rows / avg_key_rows) — the factor
    * that splits the hottest key into average-sized slices; 1 means "no
    * salting needed". `skew_ratio_micro` = max/avg in integer micro-units.
    * All arithmetic is exact BIGINT (integer `div`), engine-identical. */
  def skewProfile(frames: Seq[(String, DataFrame, String)]): DataFrame = {
    val censuses = frames.map { case (name, df, key) =>
      val counts = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      val coc = counts.groupBy("c").agg(count(lit(1)).as("nk"))
      val totals = coc.agg(
        sum(col("c") * col("nk")).as("tot_rows"),
        sum(col("nk")).as("tot_keys"),
        max(col("c")).as("mx"))
      val wCum = Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // cum >= ceil(0.99·keys) ⟺ 100·cum >= 99·keys for integer cum
      val p99 = coc.withColumn("cum", sum("nk").over(wCum))
        .crossJoin(totals.select("tot_keys"))
        .filter(col("cum") * 100 >= col("tot_keys") * 99)
        .agg(min("c").as("p99"))
      totals.crossJoin(p99).select(
        lit(name).as("key_name"),
        col("tot_rows").cast("long").as("total_rows"),
        col("tot_keys").cast("long").as("distinct_keys"),
        col("mx").cast("long").as("max_key_rows"),
        col("p99").cast("long").as("p99_key_rows"),
        expr("tot_rows * 1000000L div tot_keys").as("avg_rows_micro"),
        expr("mx * tot_keys * 1000000L div tot_rows").as("skew_ratio_micro"),
        expr("(mx * tot_keys + tot_rows - 1L) div tot_rows").as("recommended_salt"))
    }
    censuses.reduce(_.unionAll(_)).orderBy("key_name")
  }

  /** The gate's fixed census: a dense fact key, a dimension fact key, a
    * customer key, a behavioral key, and a low-cardinality partition key. */
  def skewProfileGate(s: SparkSession, d: String): DataFrame = {
    import graft.sources.Tables
    skewProfile(Seq(
      ("events.user_id", Tables.events(s, d), "user_id"),
      ("lineitem.l_orderkey", Tables.lineitem(s, d), "l_orderkey"),
      ("lineitem.l_suppkey", Tables.lineitem(s, d), "l_suppkey"),
      ("orders.o_custkey", Tables.orders(s, d), "o_custkey"),
      ("documents.source", Tables.documents(s, d), "source")))
  }

  /** Small-file compaction plan: pack an ordered file inventory into
    * target-size output bins, per partition (source), preserving sort
    * order so any clustering the files already have survives the rewrite.
    *
    * Bin rule = Spark's own file-scan packing (`maxPartitionBytes` +
    * `openCostInBytes`): each file is padded by `openCost`, files are
    * walked in order, and a file's bin is its START offset `div` target —
    * so bins never split a file and bin size is bounded by
    * target + max file size. One window cumsum per partition (keyed
    * shuffle on the partition column, corpus-linear) and one keyed
    * rollup; no driver state, no iteration. At 100 TB the inventory is a
    * metadata table (one row per file), orders of magnitude smaller than
    * the data it describes.
    *
    * The gate treats each document as a file (size = n_chars) under its
    * source as the partition — the planner's input schema is
    * (partition, file_id, bytes), which is exactly what a real lake
    * listing provides. */
  def compactionPlan(files: DataFrame, partCol: String, idCol: String,
      sizeCol: String, targetBytes: Long = 4096L, openCost: Long = 128L): DataFrame = {
    val planned =
      binAssignments(files, partCol, idCol, sizeCol, targetBytes, openCost)
    planned.groupBy("part", "bin")
      .agg(count(lit(1)).as("n_files"), sum("sz").as("bin_bytes"),
        min("file_id").as("first_file_id"), max("file_id").as("last_file_id"))
      .select(col("part"), col("bin"), col("n_files"),
        col("bin_bytes").cast("long").as("bin_bytes"),
        col("first_file_id"), col("last_file_id"))
      .orderBy("part", "bin")
  }

  /** Per-file bin assignment — the pre-rollup form of [[compactionPlan]]
    * (same packing rule), used by the executed rewrite. Returns
    * (part, file_id, sz, cum, bin). */
  def binAssignments(files: DataFrame, partCol: String, idCol: String,
      sizeCol: String, targetBytes: Long, openCost: Long): DataFrame = {
    val w = Window.partitionBy("part").orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.select(
        col(partCol).as("part"), col(idCol).as("file_id"),
        (col(sizeCol).cast("long") + openCost).as("sz"))
      .withColumn("cum", sum("sz").over(w))
      .withColumn("bin", expr(s"(cum - sz) div ${targetBytes}L"))
  }

  /** EXECUTED small-file compaction — the OPTIMIZE primitive, not just its
    * plan. Stages `documents` as many small parquet files, inventories them
    * (a driver file listing: at 100 TB this row-per-file table comes from
    * the lake's metadata layer and is orders of magnitude smaller than the
    * data), runs the same packing rule as [[compactionPlan]], then rewrites
    * in ONE distributed job: rows join their file's bin via a broadcast of
    * the metadata-sized plan, one hash exchange on `bin` co-locates each
    * output file's rows, and `partitionBy("bin")` writes exactly one file
    * per bin (a bin's rows live in exactly one task). The gated digest of
    * the compacted table against the source-parquet twin proves the rewrite
    * byte-lossless; PhysicalOpsSpec asserts the file count actually dropped
    * to the planned bin count. No driver loop over bins, no per-bin job —
    * cost is one scan + one shuffle of the small-file bytes, which is how
    * OPTIMIZE must behave when "small files" still total terabytes. */
  def compactionExec(spark: SparkSession, docs: DataFrame,
      stagingRoot: String, smallFiles: Int = 48,
      targetBytes: Long = 1L << 18): (DataFrame, DataFrame) = {
    import spark.implicits._
    val smallPath = s"$stagingRoot/small"
    val compactPath = s"$stagingRoot/compact"
    docs.repartition(smallFiles, col("doc_id"))
      .write.mode("overwrite").parquet(smallPath)

    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(smallPath), spark.sparkContext.hadoopConfiguration)
    val inventory = fs.listStatus(new org.apache.hadoop.fs.Path(smallPath))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen))
      .sortBy(_._1).toSeq
      .toDF("file_id", "bytes")
      .withColumn("part", lit("all"))

    val assign = binAssignments(
        inventory, "part", "file_id", "bytes", targetBytes, openCost = 4096L)
      .select("file_id", "bin")

    spark.read.parquet(smallPath)
      .withColumn("file_id", regexp_extract(input_file_name(), "[^/]+$", 0))
      .join(broadcast(assign), "file_id")
      .drop("file_id")
      .repartition(col("bin"))
      .write.mode("overwrite").partitionBy("bin").parquet(compactPath)

    (spark.read.parquet(compactPath).drop("bin"), assign)
  }

  /** Gated digest of the compacted table (per-source exact sums incl. full
    * text length — a changed byte anywhere changes the hash). */
  def compactionExecDigest(spark: SparkSession, docs: DataFrame,
      stagingRoot: String): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val (compacted, _) = compactionExec(spark, docs, stagingRoot)
    compacted.groupBy("source")
      .agg(
        count(lit(1)).as("n"),
        sum(col("doc_id").cast(big)).cast("long").as("id_sum"),
        sum(col("n_chars").cast(big)).cast("long").as("char_sum"),
        sum(length(col("text")).cast(big)).cast("long").as("text_chars"),
        min(col("lang")).as("lang_min"),
        max(col("lang")).as("lang_max"))
      .orderBy("source")
  }

  /** All orders rows with their z-order clustering key over the
    * (o_totalprice, o_custkey) plane: each dimension min/max-quantized to
    * 256 integer buckets (exact integer arithmetic off the cents fix-up —
    * the 1-row bounds census rides a broadcast crossJoin), then Morton
    * bit-interleaved into one 16-bit key via the SHARED
    * [[graft.sources.ZOrder.zValue]] kernel (that module owns the curve
    * and the bucket-rectangle STATS gate; this one adds the quantization
    * of a continuous dimension and the EXECUTED rewrite). For 8-bit
    * bucket ids the mask-doubling spread is bit-identical to the explicit
    * Σ((b≫i)&1)·2^{2i(+1)} sum the DuckDB twin replays. Interleaving is
    * what makes ONE sort key cluster BOTH dimensions: consecutive zkey
    * values differ in low-order bits of either dimension, so a file
    * holding a zkey range covers a small rectangle of the plane instead
    * of a thin full-width stripe — the property multi-dimensional file
    * skipping needs. */
  private def zorderAll(orders: DataFrame): DataFrame = {
    val withDims = orders.withColumn("cents",
      floor(col("o_totalprice") * 100 + 0.5).cast("long"))
    val bounds = withDims.agg(
      min("cents").as("minc"), max("cents").as("maxc"),
      min("o_custkey").as("mink"), max("o_custkey").as("maxk"))
    withDims.crossJoin(broadcast(bounds))
      .withColumn("bx", expr("(cents - minc) * 256 div (maxc - minc + 1)"))
      .withColumn("by", expr("(o_custkey - mink) * 256 div (maxk - mink + 1)"))
      .withColumn("zkey", graft.sources.ZOrder.zValue(col("bx"), col("by")))
      .drop("cents", "minc", "maxc", "mink", "maxk")
  }

  /** Gated z-order KEY table (mod-sampled for output size): the exact
    * bucket pair and Morton key per order — the DuckDB twin replays the
    * identical quantization and interleave arithmetic, proving the
    * clustering key itself engine-portable before any layout uses it. */
  def zorderKeys(orders: DataFrame, mod: Long = 7): DataFrame =
    zorderAll(orders)
      .filter(pmod(col("o_orderkey"), lit(mod)) === 0)
      .select("o_orderkey", "bx", "by", "zkey")
      .orderBy("o_orderkey")

  /** EXECUTED z-order rewrite — the OPTIMIZE ZORDER primitive: orders
    * range-partitioned AND sorted by the Morton key, one file per range,
    * written and read back. At 100 TB this is THE layout for tables
    * queried on more than one dimension: a min/max-pruned scan for a
    * box predicate on (price, customer) skips every file whose zkey
    * rectangle misses the box, where a single-column sort clusters one
    * dimension and leaves the other spanning every file
    * (PhysicalOpsSpec measures exactly that span contrast on the written
    * files). The rewrite is one range exchange + per-partition sort —
    * the compactionExec cost shape, nothing quadratic. */
  def zorderExec(spark: SparkSession, orders: DataFrame,
      stagingRoot: String, nFiles: Int = 16): DataFrame = {
    // run-scoped subdir (round-10 advice): the overwrite-then-read-back
    // pair on a fixed path could interleave under concurrent invocation —
    // same non-atomicity class as schemaEvolution's fix. Registered for
    // end-of-query cleanup so fresh run dirs don't accumulate.
    val out = graft.RunHygiene.scratch(spark,
      s"$stagingRoot/zorder_run_${java.util.UUID.randomUUID.toString.take(8)}")
    zorderAll(orders)
      .withColumn("o_orderdate",
        col("o_orderdate").cast(org.apache.spark.sql.types.TimestampNTZType))
      .repartitionByRange(nFiles, col("zkey"), col("o_orderkey"))
      .sortWithinPartitions("zkey", "o_orderkey")
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
  }

  /** Gated digest of the z-ordered rewrite: the same per-priority
    * full-fidelity digest as the format roundtrips, computed over the
    * clustered files — equality with the straight-from-source twin proves
    * the layout rewrite lost and altered nothing. */
  def zorderExecDigest(spark: SparkSession, orders: DataFrame,
      stagingRoot: String): DataFrame =
    graft.sources.FormatRoundtrip.fullDigest(
      zorderExec(spark, orders, stagingRoot).drop("bx", "by", "zkey"))
}
