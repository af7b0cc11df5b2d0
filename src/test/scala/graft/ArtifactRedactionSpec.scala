package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 gate (r10 verdict #2): artifact redaction is a CHECKED invariant,
  * not a habit. Round 10 proved the habit fails — HEAD 270a900 committed a
  * working-tree LEAKCHECK.json with 612 raw quotes of the internal
  * artifact-mirror hostname because nothing failed when the redaction pass
  * was skipped. This spec scans every TRACKED round artifact in the repo
  * root with the same shape-based patterns as `scripts/redact_artifacts.py`
  * (never a sensitive literal: "artifactory" alone is the public product
  * name; the adjudicated leak is the hostname AROUND it) and fails `sbt
  * test` while any artifact still carries an un-redacted hit. Remedy on
  * red: `python3 scripts/redact_artifacts.py`, then re-run.
  */
class ArtifactRedactionSpec extends AnyFunSuite {

  // Mirrors redact_artifacts.py PATTERNS by shape. A match is a hostname
  // built around the product name, or the split-string concatenation form
  // ("artifactory" + ".<domain>") that GITLOG quotes re-import — with any
  // run of backslashes standing in for nested-JSON quote escaping.
  private val patterns = Seq(
    """[a-z0-9.-]*artifactory[a-z0-9.-]*\.[a-z]{2,6}""".r,
    """(?:\\)*"artifactory(?:\\)*"\s*\+\s*(?:\\)*"\.[a-z0-9.-]+""".r
  )

  private def artifactFiles(): Seq[java.io.File] = {
    val root = new java.io.File(".").getCanonicalFile
    val fixed = Seq("LEAKCHECK.json", "ADVICE.md", "VERDICT.md",
      "BENCH_FULL.json", "BENCH_PARTIAL.json", "BASELINE.md", "PLANS.md")
    val benchRounds = Option(root.listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("BENCH_r") && f.getName.endsWith(".json"))
    (fixed.map(new java.io.File(root, _)) ++ benchRounds).filter(_.isFile).distinct
  }

  test("no tracked round artifact carries an un-redacted mirror-hostname hit") {
    val offenders = for {
      f <- artifactFiles()
      text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      rx <- patterns
      m <- rx.findFirstIn(text)
    } yield s"${f.getName}: ...${m.take(40)}..."
    assert(offenders.isEmpty,
      s"un-redacted artifact hits (run scripts/redact_artifacts.py):\n${offenders.mkString("\n")}")
  }

  test("redaction patterns themselves stay literal-free in this spec and the script") {
    // The hostname pattern must never match its own defining sources — if it
    // does, a sensitive literal crept into a tracked file.
    val sources = Seq(
      new java.io.File("scripts/redact_artifacts.py"),
      new java.io.File("src/test/scala/graft/ArtifactRedactionSpec.scala"))
    for (f <- sources if f.isFile) {
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(patterns.head.findFirstIn(text).isEmpty,
        s"${f.getName} contains a hostname-shaped literal")
    }
  }
}
