package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("driver contract: entry() runs the flagship pipeline with rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract: every oracleSql key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("driver contract: no duplicate query names across modules") {
    // Map construction would silently drop duplicates; compare with the
    // summed module sizes via oracle coverage sanity instead
    assert(SparkEntry.queries.size >= 55,
      s"query inventory shrank: ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size >= 49)
  }
}
