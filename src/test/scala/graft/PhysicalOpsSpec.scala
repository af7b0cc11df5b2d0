package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.{AsOfJoin, Physical, Similarity}
import graft.queries.EventQueries

/** Round-8 physical-planning + filter additions: skew census, compaction
  * planner, bucketed interval join, SQ8 ANN, Gopher rules. */
class PhysicalOpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- skewProfile ----

  test("skewProfile: uniform key has salt 1; a whale key drives the recommendation") {
    import spark.implicits._
    // uniform: 4 keys × 3 rows. skewed: key 0 has 12 rows, keys 1..6 have 1.
    val uniform = (0L until 12L).map(i => i % 4).toDF("k")
    val skewed = (Seq.fill(12)(0L) ++ (1L to 6L)).toDF("k")
    val r = Physical.skewProfile(Seq(
      ("uniform", uniform, "k"), ("skewed", skewed, "k")))
      .collect().map(x => x.getString(0) -> x).toMap

    val u = r("uniform")
    assert(u.getAs[Long]("total_rows") === 12L)
    assert(u.getAs[Long]("distinct_keys") === 4L)
    assert(u.getAs[Long]("max_key_rows") === 3L)
    assert(u.getAs[Long]("recommended_salt") === 1L)

    val s = r("skewed")
    assert(s.getAs[Long]("total_rows") === 18L)
    assert(s.getAs[Long]("distinct_keys") === 7L)
    assert(s.getAs[Long]("max_key_rows") === 12L)
    // avg = 18/7 ≈ 2.57 → ceil(12/avg) = ceil(12·7/18) = ceil(4.67) = 5
    assert(s.getAs[Long]("recommended_salt") === 5L)
    // p99 of key counts: 7 keys, threshold ceil(6.93)=7 → the max count
    assert(s.getAs[Long]("p99_key_rows") === 12L)
  }

  // ---- compactionPlan ----

  test("compactionPlan: bins never split a file, sizes bounded by target+max, order preserved") {
    import spark.implicits._
    val files = Seq(
      ("a", 1L, 1000L), ("a", 2L, 1000L), ("a", 3L, 1000L), ("a", 4L, 1000L),
      ("a", 5L, 3000L), ("b", 1L, 10L)).toDF("src", "fid", "bytes")
    val plan = Physical.compactionPlan(files, "src", "fid", "bytes",
      targetBytes = 2500L, openCost = 0L).collect()
    val a = plan.filter(_.getString(0) == "a").map(r =>
      (r.getAs[Long]("bin"), r.getAs[Long]("n_files"),
        r.getAs[Long]("first_file_id"), r.getAs[Long]("last_file_id")))
    // start offsets: 0,1000,2000,3000,4000 → bins 0,0,0,1,1
    assert(a.toSeq === Seq((0L, 3L, 1L, 3L), (1L, 2L, 4L, 5L)))
    // every bin ≤ target + max file size
    assert(plan.forall(r => r.getAs[Long]("bin_bytes") <= 2500L + 3000L))
    // file ranges are contiguous, non-overlapping per partition
    assert(a.map(_._3).min === 1L && a.map(_._4).max === 5L)
  }

  // ---- intervalJoin ----

  test("intervalJoin: matches the plain non-equi join exactly (lossless, duplicate-free)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = 1700000000000000L
    val probes = (1L to 40L).map(i =>
        (i, rnd.nextInt(3).toLong, new java.sql.Timestamp((base + rnd.nextInt(7200) * 1000000L) / 1000)))
      .toDF("p_id", "user_id", "p_ts")
    val stream = (1L to 120L).map(i =>
        (i, rnd.nextInt(3).toLong, new java.sql.Timestamp((base + rnd.nextInt(7200) * 1000000L) / 1000)))
      .toDF("s_id", "user_id", "s_ts")
    val win = 600L * 1000000L // 10 min
    val bucketed = AsOfJoin.intervalJoin(probes, stream, "user_id", "p_ts", "s_ts", win)
      .select("p_id", "s_id").as[(Long, Long)].collect().toSet
    val naive = probes.join(stream, Seq("user_id"))
      .filter(expr(s"unix_micros(cast(s_ts as timestamp)) > unix_micros(cast(p_ts as timestamp)) - ${win}L") &&
        expr("unix_micros(cast(s_ts as timestamp)) <= unix_micros(cast(p_ts as timestamp))"))
      .select("p_id", "s_id").as[(Long, Long)].collect()
    assert(naive.length === naive.toSet.size, "naive baseline must be duplicate-free")
    assert(bucketed === naive.toSet)
    assert(bucketed.nonEmpty)
  }

  test("clicksBeforePurchase keeps zero-click purchases with n_clicks = 0") {
    import spark.implicits._
    val ts = (s: Long) => new java.sql.Timestamp(1700000000000L + s * 1000L)
    val events = Seq(
      (1L, 1L, "purchase", ts(10000)), // clicks at 9000, 9900 in window
      (2L, 1L, "click", ts(9000)),
      (3L, 1L, "click", ts(9900)),
      (4L, 1L, "click", ts(10001)),    // after: excluded
      (5L, 2L, "purchase", ts(5000)),  // no clicks at all for user 2
      (6L, 3L, "click", ts(4999)))     // other user: excluded
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = EventQueries.clicksBeforePurchase(events, windowMinutes = 30)
      .collect().map(x => x.getAs[Long]("purchase_id") ->
        (x.getAs[Long]("n_clicks"), Option(x.getAs[java.sql.Timestamp]("last_click_ts")))).toMap
    assert(r(1L)._1 === 2L)
    assert(r(1L)._2.get.getTime === ts(9900).getTime)
    assert(r(5L) === (0L, None))
  }

  // ---- sqTopK ----

  test("sqTopK: identical vectors tie at max score; opposite vector ranks last") {
    import spark.implicits._
    val v = Array(1.0f, 0.0f, 0.5f, -1.0f)
    val emb = Seq(
      (0L, v), (1L, v),                              // duplicate of the query
      (2L, Array(-1.0f, 0.0f, -0.5f, 1.0f)),         // opposite corner
      (3L, Array(0.9f, 0.1f, 0.4f, -0.9f)))          // near neighbor
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val r = Similarity.sqTopK(emb, nQueries = 1, k = 3).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(r.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 3L, 2L))
    // the duplicate reconstructs within quantization error: cosine ≈ 1
    assert(r(0).getAs[Double]("sq_sim") > 0.999)
    assert(r(0).getAs[Double]("sq_sim") > r(1).getAs[Double]("sq_sim"))
    assert(r(1).getAs[Double]("sq_sim") > r(2).getAs[Double]("sq_sim"))
  }

  test("sqTopK: constant dimension (mx=mn) codes to 0 and does not crash ranking") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 5.0f)), (1L, Array(2.0f, 5.0f)), (2L, Array(3.0f, 5.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val r = Similarity.sqTopK(emb, nQueries = 1, k = 2).collect()
    assert(r.length === 2)
    // dim 2 is constant: scores driven purely by dim 1 codes (0, 128, 255)
    assert(r.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
      === Seq(1L, 2L))
  }

  // ---- ksProfile ----

  test("ksProfile: disjoint supports give D = 1.0; identical distributions give D = 0") {
    import spark.implicits._
    // srcA lengths all 10, srcB/srcC all 20 → A vs rest is fully separated;
    // B and C are identical to each other but each still differs from the
    // pooled rest (which includes A), so only exact pairs are asserted
    val docs = ((1 to 10).map(i => (i.toLong, "a", 10L)) ++
        (11 to 20).map(i => (i.toLong, "b", 20L)) ++
        (21 to 30).map(i => (i.toLong, "c", 20L)))
      .toDF("doc_id", "source", "n_chars")
    val r = graft.operators.Validators.ksProfile(docs).collect()
      .map(x => x.getString(0) -> x.getAs[Long]("ks_micro")).toMap
    assert(r("a") === 1000000L, "disjoint support must reach the sup at 1.0")
    // b vs rest: rest = 10×len10 + 10×len20; F_b(10)=0 vs F_rest(10)=0.5 → D=0.5
    assert(r("b") === 500000L)
    assert(r("c") === 500000L)
  }

  // ---- funnelWindowed ----

  test("funnelWindowed: boundary inclusive at exactly the window; beyond drops") {
    import spark.implicits._
    val ts = (s: Long) => new java.sql.Timestamp(1700000000000L + s * 1000L)
    val h24 = 24L * 3600L
    val events = Seq(
      // user 1: completes exactly AT the 24h boundary — counts (<=)
      (1L, 1L, "view", ts(0)), (2L, 1L, "click", ts(100)), (3L, 1L, "purchase", ts(h24)),
      // user 2: purchase one second past — step 3 drops, step 2 counts
      (4L, 2L, "view", ts(0)), (5L, 2L, "click", ts(200)), (6L, 2L, "purchase", ts(h24 + 1)),
      // user 3: never clicks
      (7L, 3L, "view", ts(0)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = EventQueries.funnelWindowed(events).collect()
      .map(x => x.getAs[Long]("step") -> x.getAs[Long]("n_users")).toMap
    assert(r(1L) === 3L)
    assert(r(2L) === 2L)
    assert(r(3L) === 1L, "24h-exact completion must count; 24h+1s must not")
  }

  // ---- botScreen ----

  test("botScreen: cron-regular user flags, organic jitter does not; singletons stay null") {
    import spark.implicits._
    val ts = (s: Long) => new java.sql.Timestamp(1700000000000L + s * 1000L)
    val rnd = new scala.util.Random(11)
    val bot = (1 to 30).map(i => (i.toLong, 1L, ts(i * 60L)))          // exact 60s ticks
    val organic = (1 to 30).map(i =>
      (100L + i, 2L, ts((1 to i).map(_ => 30L + rnd.nextInt(300)).sum)))
    val single = Seq((999L, 3L, ts(5)))
    val events = (bot ++ organic ++ single).toDF("event_id", "user_id", "ts")
    val r = EventQueries.botScreen(events).collect()
      .map(x => x.getAs[Long]("user_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("is_regular"), "zero-variance gaps must flag")
    assert(r(1L).getAs[Long]("cv2_micro") === 0L)
    assert(!r(2L).getAs[Boolean]("is_regular"), "jittered gaps must not flag")
    assert(r(2L).getAs[Long]("cv2_micro") > 100000L)
    assert(r(3L).isNullAt(r(3L).fieldIndex("cv2_micro")), "singleton cv2 is undefined")
    assert(!r(3L).getAs[Boolean]("is_regular"))
  }

  // ---- shardManifest ----

  test("shardManifest: checksum invariant under repartitioning; totals tile the corpus") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"doc $i content ${i * 37 % 101}"))
      .toDF("doc_id", "text")
    val a = graft.operators.TrainPrep.shardManifest(docs).collect()
    val b = graft.operators.TrainPrep.shardManifest(docs.repartition(13)).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq,
      "manifest must be partitioning-invariant (XOR checksum, keyed rollup)")
    assert(a.map(_.getAs[Long]("n_docs")).sum === 200L)
  }

  // ---- gopherRules ----

  test("gopherRules: rule order and micro-integer metrics") {
    import spark.implicits._
    val fifty = (1 to 50).map(_ => "and").mkString(" ")     // 50 words, stopwords
    val longw = (1 to 60).map(_ => "extraordinary").mkString(" ")
    val short = "the of end"
    val docs = Seq(
      (1L, fifty),   // mean len 3.0e6, 50 stopwords → keep
      (2L, longw),   // mean len 13e6 → word_length
      (3L, short))   // 3 words → too_few_words (first rule wins)
      .toDF("doc_id", "text")
    val r = TextOps.gopherRules(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("keep"))
    assert(r(1L).getAs[Long]("mean_word_len_micro") === 3000000L)
    assert(r(1L).getAs[Long]("stopword_count") === 50L)
    assert(r(2L).getAs[String]("fail_rule") === "word_length")
    assert(r(3L).getAs[String]("fail_rule") === "too_few_words")
    assert(r(3L).getAs[Long]("frac_alpha_micro") === 1000000L)
  }

  test("compactionExec: output file count equals the planned bin count and shrinks") {
    val root = "/tmp/graft_spec_compact"
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val (compacted, assign) = Physical.compactionExec(spark, docs, root)
    val plannedBins = assign.select("bin").distinct().count()
    def parquetFiles(p: String): Long = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        java.net.URI.create(p), spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    assert(parquetFiles(s"$root/compact") === plannedBins)
    assert(plannedBins < parquetFiles(s"$root/small"),
      "compaction must reduce the file count")
    assert(compacted.count() === docs.count())
  }

  test("zorder layout clusters BOTH dims per file; a 1-dim sort leaves the other spanning") {
    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_zspec_").toString
    val z = Physical.zorderExec(spark, orders, root, nFiles = 16)
      .withColumn("f", input_file_name())
    // per-file bucket spans in each dimension
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.groupBy("f").agg(
          (max("bx") - min("bx")).as("sx"), (max("by") - min("by")).as("sy"))
        .agg(avg("sx"), avg("sy")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (zx, zy) = spans(z)
    // contrast layout: same files, same bucket columns, but sorted on the
    // ONE price dimension — the second dimension must span ~everything
    val linPath = s"$root/linear"
    Physical.zorderKeys(orders, mod = 1)
      .repartitionByRange(16, col("bx"), col("o_orderkey"))
      .sortWithinPartitions("bx", "o_orderkey")
      .write.mode("overwrite").parquet(linPath)
    val (lx, ly) = spans(spark.read.parquet(linPath).withColumn("f", input_file_name()))
    // z-order: BOTH dims clustered (each file covers a rectangle, not a
    // stripe); the linear layout clusters bx but its by span stays ~full
    assert(zx < 128 && zy < 128, s"zorder spans not clustered: bx $zx, by $zy")
    assert(lx < 64, s"price-sorted layout must cluster bx tightly, got $lx")
    assert(ly > 200, s"price-sorted layout should leave by unclustered, got $ly")
    assert(zx + zy < lx + ly,
      s"zorder must beat the 1-dim layout on total span: $zx+$zy vs $lx+$ly")
  }

  test("zorder skipping PAYOFF: a box predicate prunes more files than the 1-dim sort") {
    // The round-10 pin measured the geometry (per-file spans); this one
    // measures the mechanism the geometry exists for (r10 verdict #4):
    // min/max file skipping. Per layout, compute each file's (bx, by)
    // bounding box — exactly the stats a parquet footer carries — and
    // count the files whose box intersects a quarter-plane box predicate
    // on (price, customer). The z-layout must read strictly fewer files
    // AND return the identical rows (skipping is lossless).
    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_zskip_").toString
    val z = Physical.zorderExec(spark, orders, root, nFiles = 16)
      .withColumn("f", input_file_name())
    val linPath = s"$root/linear"
    Physical.zorderKeys(orders, mod = 1)
      .repartitionByRange(16, col("bx"), col("o_orderkey"))
      .sortWithinPartitions("bx", "o_orderkey")
      .write.mode("overwrite").parquet(linPath)
    val lin = spark.read.parquet(linPath).withColumn("f", input_file_name())

    val boxLo = 64L; val boxHi = 127L // one quarter of each 256-bucket axis
    def filesHit(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val stats = df.groupBy("f").agg(
        min("bx").as("bxmin"), max("bx").as("bxmax"),
        min("by").as("bymin"), max("by").as("bymax"))
      val hit = stats.filter(col("bxmax") >= boxLo && col("bxmin") <= boxHi &&
        col("bymax") >= boxLo && col("bymin") <= boxHi).count()
      (hit, stats.count())
    }
    val (zHit, zTotal) = filesHit(z)
    val (lHit, lTotal) = filesHit(lin)
    assert(zTotal >= 8 && lTotal >= 8, s"layouts must actually split: $zTotal/$lTotal files")
    assert(zHit < lHit,
      s"z-order must prune more files for the box: z reads $zHit/$zTotal, linear $lHit/$lTotal")
    // a quarter-plane box over a space-filling layout should touch well
    // under half the files; the stripe layout reads every bx-matching
    // stripe end-to-end
    assert(zHit.toDouble / zTotal <= 0.5, s"z-layout read $zHit/$zTotal for a 1/16-area box")
    // losslessness: both layouts agree on the box rows themselves
    def boxRows(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("bx").between(boxLo, boxHi) && col("by").between(boxLo, boxHi))
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(boxRows(z) === boxRows(lin), "box contents must be layout-independent")
  }
}
