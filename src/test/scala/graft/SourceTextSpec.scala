package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** No file under `src/` may be git-binary (round-14 verdict #2): a raw NUL
  * byte in `IndexManifest.scala`'s separator literal made git render the
  * concurrency-critical lock module as `Bin N -> M bytes` — no line diffs,
  * no grep, degraded review. Git's binary heuristic is "NUL byte in the
  * first 8000 bytes"; we pin the stronger property (no NUL anywhere), so
  * control characters must be written as escapes (backslash-u0000 in a string literal), which
  * compile to the identical runtime string. */
class SourceTextSpec extends AnyFunSuite {

  test("no file under src/ contains a raw NUL byte (git-binary)") {
    val root = Paths.get("src")
    assume(Files.isDirectory(root), "run from the repo root")
    val offenders = Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      .filter { p: Path =>
        val bytes = Files.readAllBytes(p)
        bytes.contains(0.toByte)
      }.map(_.toString).toList
    assert(offenders.isEmpty,
      s"git-binary source files (raw NUL byte): ${offenders.mkString(", ")}")
  }
}
