package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

import graft.operators.Bucketing
import graft.queries.Analytics

class BucketStreamSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfSmoke}

  test("bucketed co-located join runs with no shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Bucketing.ensureBucketed(spark, sfSmoke, "lineitem",
        "l_orderkey", 8)
      val o = Bucketing.ensureBucketed(spark, sfSmoke, "orders",
        "o_orderkey", 8)
      val j = spark.table(li)
        .join(spark.table(o), col("l_orderkey") === col("o_orderkey"))
      j.collect()
      val plan = j.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"),
        "bucketed join still shuffles:\n" + plan.take(3000))
      // and the result matches the unbucketed join
      val plain = Tables.t(spark, sfSmoke, "lineitem").join(
        Tables.t(spark, sfSmoke, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      assert(j.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("stream-stream interval join matches the batch interval join") {
    val streamed = Analytics.queries("ss_stream_stream_join")(spark, sfSmoke)
    val e = Tables.t(spark, sfSmoke, "events")
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("cts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("pu"), col("ts").as("pts"))
    val batch = c.join(p, col("user_id") === col("pu")
        && col("pts") >= col("cts")
        && col("pts") <= col("cts") + expr("INTERVAL 2 HOURS"))
      .select(col("click_id"), col("purchase_id"), col("user_id"))
    assert(streamed.count() > 0, "fixture should produce join matches")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }
}
