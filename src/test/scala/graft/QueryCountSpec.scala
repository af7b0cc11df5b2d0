package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the gated-query count so README.md can't drift from the registry
  * (round-6 verdict item #4: the docs said 167 while the gate ran 169).
  * Any query added to [[SparkEntry.queries]] without bumping
  * [[SparkEntry.GatedQueryCount]] — or without updating every README
  * mention — fails here. */
class QueryCountSpec extends AnyFunSuite {

  test("queries registry matches the declared count") {
    assert(SparkEntry.queries.size === SparkEntry.GatedQueryCount)
  }

  test("every query has an oracle (full DuckDB coverage, no rows-only checks)") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  test("README cites the declared count, not a stale one") {
    val readme = java.nio.file.Files.readString(java.nio.file.Paths.get("README.md"))
    val n = SparkEntry.GatedQueryCount
    // EVERY "<number> operator queries" mention must carry the live count —
    // this subsumes the old ever-growing stale-figure blacklist: any figure
    // other than the constant fails, including future ones
    val mentions = raw"(\d+) operator queries".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(mentions.nonEmpty, s"README.md must cite '$n operator queries'")
    assert(mentions.forall(_ == n),
      s"stale counts in README.md: ${mentions.filter(_ != n)} (expected $n)")
    assert(!readme.contains("all 167 queries"),
      "stale 'all 167 queries' phrase in README.md")
  }
}
