package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Dimensions

class Scd2Spec extends AnyFunSuite {
  import SparkTestSession.{spark, sfSmoke}

  lazy val merged = Dimensions.queries("k4_scd2_merge")(spark, sfSmoke).cache()

  test("every business key has exactly one current version") {
    val bad = merged.filter(col("is_current") === "Y")
      .groupBy("coin_id").count().filter(col("count") =!= 1)
    assert(bad.count() == 0)
  }

  test("changed keys have an expired version ending on the effective date") {
    val expired = merged.filter(col("is_current") === "N")
    assert(expired.count() > 0)
    assert(expired.filter(col("end_date") =!= to_date(lit("2024-06-01"))).count() == 0)
    // expired keys are exactly the %3==0 originals
    assert(expired.filter(col("coin_id") % 3 =!= 0).count() == 0)
  }

  test("surrogate keys are unique and new rows extend beyond the old max") {
    val n = merged.count()
    assert(merged.select("surrogate_key").distinct().count() == n)
    val newRows = merged.filter(col("start_date") === to_date(lit("2024-06-01")))
    val oldMax = merged.filter(col("start_date") === to_date(lit("2024-01-01")))
      .agg(max("surrogate_key")).first().getLong(0)
    assert(newRows.agg(min("surrogate_key")).first().getLong(0) == oldMax + 1)
  }

  test("brand-new keys appear only as current") {
    val newKeys = merged.filter(col("coin_id") >= 1000)
    assert(newKeys.count() == 2)
    assert(newKeys.filter(col("is_current") =!= "Y").count() == 0)
  }

  test("dimtime has 86400 rows, dimdate 4018") {
    assert(Dimensions.queries("s6_dimtime")(spark, sfSmoke).count() == 86400)
    assert(Dimensions.queries("s6_dimdate")(spark, sfSmoke).count() == 4018)
  }

  test("orderedIds guard: oversized input avoids the global window, ids equal") {
    import spark.implicits._
    import graft.operators.IdAssign
    val df = (1 to 500).map(i => ((i * 7919) % 1000L, s"v$i")).toDF("k", "h")
    val small = IdAssign.orderedIds(df, Seq(col("k"), col("h")), 10L, "id",
      threshold = 1000L)
    val big = IdAssign.orderedIds(df, Seq(col("k"), col("h")), 10L, "id",
      threshold = 100L) // 500 rows > 100 → scale path
    assert(small.queryExecution.executedPlan.toString.contains("Window"))
    assert(!big.queryExecution.executedPlan.toString.contains("Window"),
      "above the threshold no single-partition window may appear")
    val a = small.orderBy("id").collect()
    val b = big.orderBy("id").collect()
    assert(a.sameElements(b), "both paths must assign identical ids")
    assert(a.map(_.getAs[Long]("id")).toSeq == (11L to 510L))
  }

  test("streaming SCD2 merge is trigger-slicing independent: one batch " +
      "holding all snapshots equals file-per-batch replay") {
    val perFile = graft.queries.Dimensions
      .queries("st_scd2_stream")(spark, sfSmoke).collect()
    val oneBatch = graft.queries.Dimensions
      .scd2StreamOneBatch(spark, sfSmoke).collect()
    assert(perFile.nonEmpty)
    assert(perFile.sameElements(oneBatch),
      "multi-date batch must merge sequentially by effective_date")
  }
}
