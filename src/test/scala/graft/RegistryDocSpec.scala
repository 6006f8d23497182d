package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins COVERAGE.md's hand-written registry inventory to the actual
  * `SparkEntry` registry — the documented count drifted from reality two
  * rounds running (99 vs 103 in r6, 111 vs 115 in r7) because a human had
  * to remember to update it. Now drift fails CI instead of surviving to the
  * next audit.
  */
class RegistryDocSpec extends AnyFunSuite {

  private def coverage: String = {
    val f = new java.io.File("COVERAGE.md")
    assume(f.isFile, "COVERAGE.md not present (packaged-test run outside repo root)")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  test("documented registry count equals SparkEntry.queries.size") {
    val m = """(\d+) registered queries; (\d+) oracle-backed""".r
      .findFirstMatchIn(coverage)
      .getOrElse(fail("COVERAGE.md lost its 'N registered queries; M oracle-backed' line"))
    assert(m.group(1).toInt === SparkEntry.queries.size,
      s"COVERAGE.md says ${m.group(1)} registered queries but SparkEntry.queries has " +
        s"${SparkEntry.queries.size} — update the registry index section")
    assert(m.group(2).toInt === SparkEntry.oracleSql.size,
      s"COVERAGE.md says ${m.group(2)} oracle-backed but SparkEntry.oracleSql has " +
        s"${SparkEntry.oracleSql.size} — update the registry index section")
  }

  test("every registered query name appears in COVERAGE.md's prefix table") {
    val doc = coverage
    val missing = SparkEntry.queries.keys.filterNot(doc.contains).toSeq.sorted
    assert(missing.isEmpty,
      s"registered queries missing from COVERAGE.md: ${missing.mkString(", ")}")
  }

  test("every oracle key is a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries with no query: ${orphans.mkString(", ")}")
  }
}
