package graft

class SparkEntrySpec extends SparkSuite {

  test("every oracle entry has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }

  test("rows-only queries are the deliberate exceptions") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly === Set("q_approx_dictionary"),
      "every query except the HLL sketch must carry a DuckDB oracle")
  }

  test("flagship entry returns rows on the smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
