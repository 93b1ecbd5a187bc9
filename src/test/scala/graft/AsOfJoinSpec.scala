package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // (key, ts, trade payload) / (key, ts, quote payload)
  private def trades = Seq(
    (1L, 100L, "t-a"), (1L, 205L, "t-b"), (1L, 300L, "t-c"),
    (2L, 50L, "t-d"), (3L, 10L, "t-e")
  ).toDF("k", "ts", "trade")

  private def quotes = Seq(
    (1L, 90L, 1.0), (1L, 205L, 2.0), (1L, 250L, 3.0),
    (2L, 60L, 4.0)
  ).toDF("k", "ts", "q")

  test("backward: latest right at-or-before, inclusive ties, null when none") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts")
      .select("k", "ts", "trade", "q").as[(Long, Long, String, Option[Double])]
      .collect().toSet
    assert(out == Set(
      (1L, 100L, "t-a", Some(1.0)), // 90 <= 100
      (1L, 205L, "t-b", Some(2.0)), // tie at 205 is inclusive
      (1L, 300L, "t-c", Some(3.0)), // latest of {90,205,250}
      (2L, 50L, "t-d", None), // quote at 60 is later
      (3L, 10L, "t-e", None))) // key has no quotes
  }

  test("forward: earliest right at-or-after") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts",
        direction = "forward")
      .select("k", "ts", "trade", "q").as[(Long, Long, String, Option[Double])]
      .collect().toSet
    assert(out == Set(
      (1L, 100L, "t-a", Some(2.0)), // earliest of {205,250}
      (1L, 205L, "t-b", Some(2.0)), // inclusive tie
      (1L, 300L, "t-c", None), // nothing after 300
      (2L, 50L, "t-d", Some(4.0)),
      (3L, 10L, "t-e", None)))
  }

  test("matches the brute-force formulation on a random fixture") {
    val l = spark.range(0, 500).select(
      pmod(col("id"), lit(7L)).as("k"),
      pmod(col("id") * 2654435761L, lit(10000L)).as("ts"),
      col("id").as("lid"))
    // xxhash64 spreads ts so right-side (k, ts) ties cannot occur
    val r = spark.range(0, 300).select(
      pmod(col("id"), lit(9L)).as("k"),
      pmod(xxhash64(col("id")), lit(10000L)).as("ts"),
      col("id").as("rid"))
    val got = AsOfJoin.asOf(l, r, Seq("k"), "ts")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
    val brute = l.as("l").join(r.as("r"),
        col("l.k") === col("r.k") && col("l.ts") >= col("r.ts"), "left")
      .groupBy(col("lid"))
      .agg(max_by(col("rid"), struct(col("r.ts"), col("rid"))).as("rid"))
      .as[(Long, Option[Long])].collect().toSet
    assert(got == brute)
  }

  test("plan: one hash shuffle on the key, no join operator at all") {
    val plan = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("NestedLoop"),
      s"as-of must not plan a join:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly 1 key shuffle, got $shuffles:\n$plan")
  }

  test("ambiguous payload/left column names are rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, quotes.withColumnRenamed("q", "trade"),
        Seq("k"), "ts")
    }
  }
}
