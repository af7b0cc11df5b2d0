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
    assert(readme.contains(s"$n operator queries"),
      s"README.md must cite '$n operator queries'")
    // stale figures from earlier rounds must be gone
    for (stale <- Seq("165 operator queries", "166 operator queries",
        "167 operator queries", "168 operator queries", "169 operator queries",
        "170 operator queries", "171 operator queries", "172 operator queries",
        "173 operator queries", "174 operator queries",
        "175 operator queries", "176 operator queries", "177 operator queries",
        "178 operator queries", "179 operator queries",
        "180 operator queries", "181 operator queries", "182 operator queries",
        "183 operator queries", "184 operator queries", "185 operator queries",
        "186 operator queries", "187 operator queries", "188 operator queries", "189 operator queries", "190 operator queries", "191 operator queries", "192 operator queries", "193 operator queries", "194 operator queries", "195 operator queries", "196 operator queries", "197 operator queries", "198 operator queries", "199 operator queries",
        "200 operator queries", "201 operator queries", "202 operator queries",
        "203 operator queries",
        "204 operator queries", "205 operator queries", "206 operator queries",
        "207 operator queries", "208 operator queries", "209 operator queries",
        "210 operator queries", "211 operator queries",
        "212 operator queries", "213 operator queries"))
      assert(!readme.contains(stale), s"stale count in README.md: '$stale'")
    assert(!readme.contains(s"all 167 queries"),
      "stale 'all 167 queries' phrase in README.md")
  }
}
