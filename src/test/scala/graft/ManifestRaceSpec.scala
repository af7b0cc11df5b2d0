package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IndexManifest}

/** Concurrent index WRITERS (round-11 stretch #8): the generation pointer
  * already protects readers across a swap; these tests pin that the
  * writer lock serializes appenders racing a compaction — the daily-ingest
  * multi-writer reality — so no appended batch is ever lost from the live
  * generation's derived trees. */
class ManifestRaceSpec extends AnyFunSuite {
  import TestSpark._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base = docs(
    (0L, "the quick brown fox jumps over the lazy dog tonight"),
    (1L, "spark plans are declarative and catalyst optimizes them well"),
    (2L, "completely unrelated filler text about nothing in particular"))
  private val batches = Seq(
    docs((10L, "the quick brown fox jumps over the lazy dog today")),
    docs((11L, "spark plans are declarative and catalyst optimizes them badly")),
    docs((12L, "the quick brown fox jumps over the lazy dog tonight ok")))
  private val probe = docs(
    (20L, "the quick brown fox jumps over the lazy dog tonight"),
    (21L, "spark plans are declarative and catalyst optimizes them well"))

  private def tempIdx(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_${tag}_").toString

  private def cleanup(paths: String*): Unit = paths.foreach { p =>
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
  }

  test("appenders racing a compaction serialize — no appended doc is lost") {
    val raced = tempIdx("race")
    val serial = tempIdx("serial")
    try {
      Dedup.buildIncrementalIndex(base, raced)
      val pool = Executors.newFixedThreadPool(4)
      val start = new CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val tasks: Seq[Runnable] = batches.map(b => new Runnable {
        def run(): Unit = {
          start.await()
          try Dedup.appendToIncrementalIndex(b, raced)
          catch { case t: Throwable => errs.add(t) }
        }
      }) :+ (new Runnable {
        def run(): Unit = {
          start.await()
          try Dedup.compactIncrementalIndex(spark, raced)
          catch { case t: Throwable => errs.add(t) }
        }
      })
      tasks.foreach(pool.submit)
      start.countDown() // release everyone at once — maximal interleaving
      pool.shutdown()
      assert(pool.awaitTermination(300, TimeUnit.SECONDS), "racing writers hung")
      assert(errs.isEmpty, s"racing writers failed: ${errs}")

      // the lock must leave no writer marker behind
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(raced, ".writer_lock")))

      // every doc (base + every appended batch) is in arrays AND in the
      // LIVE generation's prefix tree — the loss mode being pinned is an
      // append vanishing from the compacted generation's derived trees
      val allIds = Set(0L, 1L, 2L, 10L, 11L, 12L)
      val arraysIds = spark.read.parquet(s"$raced/arrays")
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(arraysIds === allIds)
      val gen = IndexManifest.generation(raced)
      val prefixIds = spark.read
        .parquet(IndexManifest.treePath(raced, "prefix", gen))
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(prefixIds === allIds,
        s"generation $gen prefix tree lost docs: ${allIds -- prefixIds}")

      // probe parity with a serially-built index: verified pairs are
      // rank-order-invariant, so any interleaving must yield the same set
      Dedup.buildIncrementalIndex(base, serial)
      batches.foreach(b => Dedup.appendToIncrementalIndex(b, serial))
      Dedup.compactIncrementalIndex(spark, serial)
      val racedPairs = Dedup.incrementalNearDupsIndexed(probe, raced)
        .collect().map(_.toSeq).toSet
      val serialPairs = Dedup.incrementalNearDupsIndexed(probe, serial)
        .collect().map(_.toSeq).toSet
      assert(racedPairs === serialPairs)
      assert(racedPairs.nonEmpty, "planted near-dups must surface")
    } finally cleanup(raced, serial)
  }

  test("two compactions racing advance the generation serially, both trees complete") {
    val idx = tempIdx("race2c")
    try {
      Dedup.buildIncrementalIndex(base, idx)
      batches.foreach(b => Dedup.appendToIncrementalIndex(b, idx))
      val pool = Executors.newFixedThreadPool(2)
      val start = new CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (1 to 2).foreach { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try Dedup.compactIncrementalIndex(spark, idx)
            catch { case t: Throwable => errs.add(t) }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(300, TimeUnit.SECONDS), "racing compactions hung")
      assert(errs.isEmpty, s"racing compactions failed: ${errs}")
      // serialized: 0 → 1 → 2, no lost or skipped generation
      assert(IndexManifest.generation(idx) === 2)
      // both retained generations' trees are complete and identical in
      // content (compaction is idempotent on an unchanged corpus)
      val g1 = spark.read.parquet(IndexManifest.treePath(idx, "prefix", 1))
        .collect().map(_.toSeq).toSet
      val g2 = spark.read.parquet(IndexManifest.treePath(idx, "prefix", 2))
        .collect().map(_.toSeq).toSet
      assert(g1 === g2)
      assert(g1.nonEmpty)
    } finally cleanup(idx)
  }

  test("a stale writer lock fails loudly instead of proceeding unserialized") {
    // legacy semantics retained: with the default staleAfterMs (10 s) far
    // past this waiter's 200 ms budget, the stale lock is never aged into
    // reclaim — the waiter must throw, not bulldoze
    val idx = tempIdx("stale")
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(idx))
      java.nio.file.Files.createFile(java.nio.file.Paths.get(idx, ".writer_lock"))
      val e = intercept[IllegalStateException] {
        IndexManifest.withWriterLock(idx, maxWaitMs = 200L) { fail("must not enter") }
      }
      assert(e.getMessage.contains(".writer_lock"))
    } finally cleanup(idx)
  }

  test("a crashed writer's heartbeat-dead lock is reclaimed, not wedged") {
    // round-12 verdict #7: a SIGKILLed appender must not wedge daily ingest
    // until a human removes the file. The lock's bytes stay frozen (no
    // heartbeat), so a waiter that watches them past staleAfterMs reclaims
    // and proceeds.
    val idx = tempIdx("reclaim")
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(idx))
      // a crashed pre-heartbeat writer: empty lock file, no beats ever
      java.nio.file.Files.createFile(java.nio.file.Paths.get(idx, ".writer_lock"))
      var entered = false
      IndexManifest.withWriterLock(idx, maxWaitMs = 30000L,
        heartbeatMs = 50L, staleAfterMs = 300L) { entered = true }
      assert(entered, "waiter must reclaim the heartbeat-dead lock and enter")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(idx, ".writer_lock")),
        "reclaimed-then-released lock must not linger")
    } finally cleanup(idx)
  }

  test("a reclaimed holder fences itself: beats stop, release spares the new lock") {
    // Round-13 ADVICE (medium): the old design's beat thread rewrote the
    // SHARED lock in place (WRITE+TRUNCATE), so a paused-then-reclaimed
    // holder resurrected its own owner string over a NEW holder's lock and
    // its release then deleted that lock — admitting a third writer. Beats
    // now live in an owner-unique sidecar and each beat re-reads the lock:
    // a foreign owner fences the holder. Simulate the reclaim directly:
    // while A holds the lock, swap in an intruder's lock file; A must
    // neither overwrite it (no beat resurrect) nor delete it at release.
    val idx = tempIdx("fence")
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(idx))
      val lock = java.nio.file.Paths.get(idx, ".writer_lock")
      val intruder = """{"owner":"intruder@elsewhere#cafe0000"}"""
      IndexManifest.withWriterLock(idx, heartbeatMs = 50L) {
        // a waiter "reclaimed" us and a new holder acquired
        java.nio.file.Files.write(lock, intruder.getBytes("UTF-8"))
        // several beat intervals: the fenced beat thread must not
        // resurrect our owner string over the intruder's
        Thread.sleep(400L)
        val txt = new String(java.nio.file.Files.readAllBytes(lock), "UTF-8")
        assert(txt === intruder,
          "beat thread overwrote the new holder's lock — fencing failed")
      }
      // release ran: the intruder's lock must survive our exit
      assert(java.nio.file.Files.exists(lock),
        "release deleted the new holder's lock — fencing failed")
      assert(new String(java.nio.file.Files.readAllBytes(lock), "UTF-8")
        === intruder)
      // and our own beat sidecar is swept
      val beats = java.nio.file.Files.list(java.nio.file.Paths.get(idx))
        .toArray.map(_.toString).filter(_.contains(".writer_lock.beat."))
      assert(beats.isEmpty, s"beat sidecar leaked: ${beats.mkString(",")}")
    } finally cleanup(idx)
  }

  test("a LIVE slow writer keeps beating and is never reclaimed") {
    // mutual exclusion against a holder whose body outlasts the waiter's
    // staleness horizon: the heartbeat keeps the lock observably live, so
    // the waiter blocks until release instead of reclaiming mid-write
    val idx = tempIdx("live")
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(idx))
      val inBody = new java.util.concurrent.atomic.AtomicBoolean(false)
      val overlap = new java.util.concurrent.atomic.AtomicBoolean(false)
      val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val holderUp = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(2)
      pool.submit(new Runnable {
        def run(): Unit =
          IndexManifest.withWriterLock(idx, heartbeatMs = 50L) {
            inBody.set(true); holderUp.countDown()
            Thread.sleep(1500L) // >> waiter's 400 ms staleness horizon
            order.add("holder-done"); inBody.set(false)
          }
      })
      pool.submit(new Runnable {
        def run(): Unit = {
          holderUp.await()
          IndexManifest.withWriterLock(idx, maxWaitMs = 30000L,
            heartbeatMs = 50L, staleAfterMs = 400L) {
            if (inBody.get()) overlap.set(true)
            order.add("waiter-entered")
          }
        }
      })
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS), "lock test hung")
      assert(!overlap.get(), "waiter entered while the live holder was mid-write")
      assert(order.toArray.toSeq === Seq("holder-done", "waiter-entered"))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(idx, ".writer_lock")))
    } finally cleanup(idx)
  }
}
