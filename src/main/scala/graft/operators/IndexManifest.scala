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
    * Bounded deterministic backoff; a lock still held past the budget
    * throws LOUDLY naming the file rather than proceeding unserialized —
    * a crashed writer's stale lock is an operator decision, not something
    * to silently bulldoze (the crash may still be mid-write). */
  def withWriterLock[T](path: String, maxWaitMs: Long = 120000L)(body: => T): T = {
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    val lock = dir.resolve(".writer_lock")
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var acquired = false
    while (!acquired) {
      try {
        java.nio.file.Files.createFile(lock)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"index writer lock $lock held past ${maxWaitMs}ms — " +
                "a concurrent writer is stuck or crashed mid-write; " +
                "verify and remove the lock file manually")
          Thread.sleep(50L)
      }
    }
    try body finally java.nio.file.Files.deleteIfExists(lock)
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
