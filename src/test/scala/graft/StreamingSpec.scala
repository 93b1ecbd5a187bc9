package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.{Relational, StreamingQueries}
import graft.streaming.TickPipeline

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfSmoke}

  test("stream-batch parity: streamed bronze bars == batch tumbling agg") {
    val streamed = StreamingQueries.queries("k1_stream_bronze_bars")(spark, sfSmoke)
      .select(col("event_type"), col("window_start"),
        col("average_1minute"), col("price"), col("n_ticks"))
    val batch = Relational.queries("a1_minute_bars")(spark, sfSmoke)
      .select(col("event_type"), col("window_start"),
        col("average_1minute").as("b_avg"), col("close").as("b_price"),
        col("n_ticks").as("b_n"))
    val j = streamed.join(batch, Seq("event_type", "window_start"), "full")
    assert(j.filter(col("price").isNull || col("b_price").isNull).count() == 0,
      "window sets differ between stream and batch")
    assert(j.filter(col("price") =!= col("b_price") ||
      col("average_1minute") =!= col("b_avg") ||
      col("n_ticks") =!= col("b_n")).count() == 0,
      "bar values differ between stream and batch")
  }

  test("fact sink is partitioned by coin_id and complete") {
    val cfg = TickPipeline.Config(sfSmoke, TickPipeline.freshWorkDir())
    val fact = TickPipeline.runAll(spark, cfg)
    // one fact row per bronze bar (all 5 types have a prev-day close)
    val bronzeRows = spark.read.parquet(TickPipeline.bronzeDir(cfg)).count()
    assert(fact.count() == bronzeRows)
    // physical layout: coin_id=N partition dirs exist
    val dirs = new java.io.File(TickPipeline.factDir(cfg))
      .listFiles().filter(_.isDirectory).map(_.getName).filter(_.startsWith("coin_id="))
    assert(dirs.length == 5, s"expected 5 coin_id partitions, got ${dirs.toSeq}")
    // derived keys are consistent
    assert(fact.filter(col("date_id") < 20240101L || col("date_id") > 20240131L)
      .count() == 0)
  }

  test("pipeline is rerun-safe: fresh work dir gives identical results") {
    val a = StreamingQueries.queries("k2_stream_fact")(spark, sfSmoke).collect()
    val b = StreamingQueries.queries("k2_stream_fact")(spark, sfSmoke).collect()
    assert(a.sameElements(b))
  }
}
