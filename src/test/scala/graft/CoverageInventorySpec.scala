package graft

import org.scalatest.funsuite.AnyFunSuite

/** Inventory-drift gate: every registered query name must appear in
  * COVERAGE.md, and every `q_*` token COVERAGE.md cites must be a
  * registered query. Round 9 shipped a green query (q_token_regex)
  * with no coverage row — doc drift a reviewer had to catch by diffing
  * inventories; this makes it a test failure instead. No Spark session
  * needed: the check is a file scrape vs the static registry.
  */
class CoverageInventorySpec extends AnyFunSuite {

  private def coverageText: String = {
    val p = java.nio.file.Paths.get("COVERAGE.md")
    assert(java.nio.file.Files.exists(p),
      s"COVERAGE.md not found under ${System.getProperty("user.dir")}")
    java.nio.file.Files.readString(p)
  }

  test("every registered query has a COVERAGE.md row") {
    val cited = "q_[a-z0-9_]+".r.findAllIn(coverageText).toSet
    val registered = SparkEntry.allDefs.map(_.name).toSet
    val missing = registered -- cited
    assert(missing.isEmpty,
      s"registered queries with no COVERAGE.md mention: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every q_* token COVERAGE.md cites is a registered query") {
    val cited = "q_[a-z0-9_]+".r.findAllIn(coverageText).toSet
    val registered = SparkEntry.allDefs.map(_.name).toSet
    // a cited prefix of a longer real name (regex cut at a hyphen etc.)
    // would be flagged here too — that is drift worth failing on
    val unknown = cited -- registered
    assert(unknown.isEmpty,
      s"COVERAGE.md cites unregistered queries: ${unknown.toSeq.sorted.mkString(", ")}")
  }
}
