package graft

import org.scalatest.funsuite.AnyFunSuite

/** Inventory-integrity guards: SURVEY.md §8 and README.md quote
  * `SparkEntry.queries.size`, and the driver's correctness gate keys off
  * `oracleSql` — VERDICT-r6 flagged the docs drifting from the code, so
  * the relationships are pinned here where drift fails the build. */
class EntrySpec extends AnyFunSuite {

  test("every oracle entry names an implemented query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries with no query: $orphans")
  }

  test("every query carries an oracle (no rows-only rows since r8)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"queries without an oracle (r8 retired the rows-only class): $rowsOnly")
  }

  test("inventory size matches the documented counts (SURVEY §8 / README)") {
    // all-oracle inventory; bump ALL THREE places together:
    // this pin, SURVEY.md §8, README.md verification section.
    assert(SparkEntry.queries.size == 258,
      s"queries.size=${SparkEntry.queries.size} — update SURVEY.md §8 + README.md, then this pin")
  }
}
