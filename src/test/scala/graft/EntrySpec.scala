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

  test("prewarm builds fixtures once; timed queries then only scan") {
    import SparkTestSession.sfSmoke
    SparkEntry.prewarm(spark, sfSmoke)
    val csv = new java.io.File(queries.Sources.ensureCsvFixture(spark, sfSmoke))
    val m1 = new java.io.File(csv, "_SUCCESS").lastModified()
    // a second ensure must reuse the fixture, not rebuild it
    queries.Sources.ensureCsvFixture(spark, sfSmoke)
    assert(new java.io.File(csv, "_SUCCESS").lastModified() == m1)
    // the commit fixture must keep exactly one manifest line across calls
    val bars = queries.Sources.ensureCommitFixture(spark, sfSmoke)
    queries.Sources.ensureCommitFixture(spark, sfSmoke)
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(operators.Maintenance.manifestPath(bars)))
    assert(manifest.trim.linesIterator.size == 1)
    // and the queries built on them still return rows
    assert(SparkEntry.queries("s7_csv_scan")(spark, sfSmoke).count() > 0)
    assert(SparkEntry.queries("s8_commit_stats")(spark, sfSmoke).count() == 1)
  }

  test("driver contract: no duplicate query names across modules") {
    // Map construction would silently drop duplicates; compare with the
    // summed module sizes via oracle coverage sanity instead
    assert(SparkEntry.queries.size >= 55,
      s"query inventory shrank: ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size >= 49)
  }
}
