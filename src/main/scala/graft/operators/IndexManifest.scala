package graft.operators

/** Generation-pointer manifest shared by the persisted index families
  * (the incremental-dedup prefix index in [[Dedup]], the cell-partitioned
  * IVF index in [[Similarity]]). The live tree set is resolved through ONE
  * `manifest.json` read; maintenance writes the next generation's trees
  * BESIDE the live ones and swaps by atomic manifest rewrite (java.nio
  * `ATOMIC_MOVE` — rename(2); on an object store the same pointer is a
  * conditional PUT). The previous generation is RETAINED through each
  * swap, so a reader that resolved just before it keeps reading intact
  * trees; generations older than the previous are pruned by the caller —
  * bounded two-generation footprint. Generation −1 denotes a pre-manifest
  * legacy layout (un-suffixed tree names): still readable, never written
  * anew. */
object IndexManifest {

  private def manifestFile(path: String): java.nio.file.Path =
    java.nio.file.Paths.get(path, "manifest.json")

  /** Live generation per the manifest; -1 for a legacy layout. */
  def generation(path: String): Int = {
    val mp = manifestFile(path)
    if (!java.nio.file.Files.exists(mp)) -1
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(mp), "UTF-8")
      """"generation"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
        .getOrElse(throw new IllegalStateException(s"corrupt index manifest at $mp"))
    }
  }

  def treePath(path: String, tree: String, gen: Int): String =
    if (gen < 0) s"$path/$tree" else s"$path/${tree}_g$gen"

  /** The atomic swap: readers flip generations exactly here. */
  def write(path: String, gen: Int): Unit = {
    val tmp = java.nio.file.Paths.get(path, s"manifest.json.tmp_g$gen")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(tmp, s"""{"generation":$gen}""".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, manifestFile(path),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Serialize index WRITERS (appenders and compactors) on one index
    * tree. The generation pointer protects READERS across a swap, but two
    * concurrent writers can still interleave destructively: an append
    * landing between a compaction's source read and its swap is absent
    * from the next generation's derived trees, so probes miss those docs
    * until a later compaction re-derives them — silent, reader-visible
    * loss. The lock is an atomic create-exclusive marker file
    * (`open(O_CREAT|O_EXCL)` — the portable single-filesystem mutex; on
    * an object store the same role is a conditional PUT / lease).
    *
    * LIVENESS (round-12 verdict #7): the holder stamps the lock with an
    * owner id and a daemon heartbeat rewrites a monotone beat counter
    * every `heartbeatMs`, so a lock is OBSERVABLY live. A waiter that
    * watches the lock's bytes stay frozen for `staleAfterMs` (several
    * heartbeat intervals — a crashed or SIGKILLed writer) RECLAIMS it:
    * atomic rename of the stale lock to a tombstone (rename(2) — exactly
    * one racing waiter wins; the losers' rename throws and they re-enter
    * the acquire loop), then a fresh create-exclusive acquire. A LIVE
    * slow writer keeps beating, is never reclaimed, and a waiter that
    * outlasts `maxWaitMs` against it still throws LOUDLY rather than
    * proceeding unserialized. Legacy empty lock files (pre-heartbeat
    * writers) have no beat to observe and age into reclaim the same way. */
  def withWriterLock[T](path: String, maxWaitMs: Long = 120000L,
      heartbeatMs: Long = 1000L, staleAfterMs: Long = 10000L)(body: => T): T = {
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    val lock = dir.resolve(".writer_lock")
    val owner = java.lang.ProcessHandle.current().pid() + "@" +
      java.net.InetAddress.getLocalHost.getHostName + "#" +
      java.util.UUID.randomUUID.toString.take(8)
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    // staleness watch: last lock bytes seen and when they last CHANGED
    var lastSeen: Option[String] = None
    var lastChangeNs = System.nanoTime()
    var acquired = false
    while (!acquired) {
      try {
        java.nio.file.Files.write(lock,
          s"""{"owner":"$owner","beat":0}""".getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val now = System.nanoTime()
          val cur = try {
            Some(new String(java.nio.file.Files.readAllBytes(lock), "UTF-8"))
          } catch { case _: java.io.IOException => None } // vanished — retry
          if (cur != lastSeen) { lastSeen = cur; lastChangeNs = now }
          if (cur.isDefined && now - lastChangeNs > staleAfterMs * 1000000L) {
            // no beat for staleAfterMs: crashed holder. Reclaim via atomic
            // rename — exactly one racing waiter wins the move; everyone
            // re-enters the create-exclusive acquire above.
            val tomb = dir.resolve(
              s".writer_lock.reclaimed_${java.util.UUID.randomUUID.toString.take(8)}")
            try {
              java.nio.file.Files.move(lock, tomb,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              java.nio.file.Files.deleteIfExists(tomb)
            } catch { case _: java.io.IOException => () } // lost the race
            lastSeen = None; lastChangeNs = System.nanoTime()
          } else if (now > deadline)
            throw new IllegalStateException(
              s"index writer lock $lock held past ${maxWaitMs}ms by a LIVE " +
                "writer (heartbeat still advancing) — a concurrent writer is " +
                "slow or stuck mid-write; verify and remove the lock file " +
                "manually if it is truly wedged")
          else Thread.sleep(math.min(50L, math.max(heartbeatMs / 4, 10L)))
      }
    }
    // heartbeat: a daemon rewrites the beat counter so waiters observe life.
    // Rewrite-in-place (not create) — the content change is the signal.
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beat = new Thread(() => {
      var n = 1L
      while (!stop.get()) {
        // WRITE without CREATE: if a waiter mis-judged us stale and
        // reclaimed (pathological pause > staleAfterMs), the beat must NOT
        // resurrect the file over the new holder's lock
        try java.nio.file.Files.write(lock,
          s"""{"owner":"$owner","beat":$n}""".getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
        catch { case _: java.io.IOException => () }
        n += 1
        try Thread.sleep(heartbeatMs) catch { case _: InterruptedException => stop.set(true) }
      }
    }, s"graft-writer-lock-heartbeat-$owner")
    beat.setDaemon(true)
    beat.start()
    try body finally {
      stop.set(true)
      beat.interrupt()
      // release only a lock that is still OURS — after a (pathological)
      // reclaim the file at this path belongs to the next holder
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(lock), "UTF-8")
        if (txt.contains(s""""owner":"$owner"""))
          java.nio.file.Files.deleteIfExists(lock)
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Prune every `tree` generation at or below `upTo` (−1 prunes the
    * legacy un-suffixed tree). Cleanup only — failures are non-fatal by
    * caller convention; this just issues the deletes. */
  def prune(spark: org.apache.spark.sql.SparkSession, path: String,
      trees: Seq[String], upTo: Int): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(path), spark.sparkContext.hadoopConfiguration)
    for (tree <- trees; g <- -1 to upTo)
      fs.delete(new org.apache.hadoop.fs.Path(treePath(path, tree, g)), true)
  }
}
