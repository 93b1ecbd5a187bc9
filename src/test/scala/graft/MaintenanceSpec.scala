package graft

import java.util.UUID

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Maintenance
import graft.streaming.TickPipeline

class MaintenanceSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfSmoke}

  private def freshTable(): String = {
    val p = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-maint-${UUID.randomUUID()}/t").getAbsolutePath
    Tables.t(spark, sfSmoke, "events")
      .repartition(8)
      .write.parquet(p)
    p
  }

  test("compact reduces file count without changing data") {
    val p = freshTable()
    val before = spark.read.parquet(p)
    val sumBefore = before.agg(sum("event_id")).first().getLong(0)
    val n = before.count()
    assert(Maintenance.parquetFileCount(p) > 2)
    Maintenance.compact(spark, p, targetFiles = 2)
    assert(Maintenance.parquetFileCount(p) <= 2)
    val after = spark.read.parquet(p)
    assert(after.count() == n)
    assert(after.agg(sum("event_id")).first().getLong(0) == sumBefore)
  }

  test("cluster range-partitions by key, preserving data") {
    val p = freshTable()
    val n = spark.read.parquet(p).count()
    Maintenance.cluster(spark, p, Seq("event_type"), targetFiles = 4)
    val after = spark.read.parquet(p)
    assert(after.count() == n)
    // each output file should hold a narrow range of the cluster key:
    // count (file, event_type) combos — clustered layout has ~1 type/file
    val combos = after
      .withColumn("f", input_file_name())
      .select("f", "event_type").distinct().count()
    assert(combos <= 8, s"clustered files span too many keys: $combos")
  }

  test("commit manifest records deterministic latency stats") {
    val p = freshTable()
    val bars = Tables.t(spark, sfSmoke, "events")
      .select(date_trunc("minute", col("ts")).as("ws"))
    Maintenance.recordCommit(p, "2024-02-01 00:00:30", bars, "ws")
    Maintenance.recordCommit(p, "2024-02-01 00:01:30", bars, "ws")
    val stats = Maintenance.commitStats(spark, p).orderBy("commit_ts").collect()
    assert(stats.length == 2)
    assert(stats(1).getAs[Long]("latency_sec")
      == stats(0).getAs[Long]("latency_sec") + 60)
    assert(stats(0).getAs[Long]("latency_sec") > 0)
  }

  test("concurrent per-key bronze streams equal the single-stream result") {
    val types = Seq("click", "purchase")
    val cfgC = TickPipeline.Config(sfSmoke, TickPipeline.freshWorkDir())
    TickPipeline.runConcurrentBronze(spark, cfgC, types)
    val concurrent = spark.read.parquet(TickPipeline.bronzeDir(cfgC))
    val cfgS = TickPipeline.Config(sfSmoke, TickPipeline.freshWorkDir())
    TickPipeline.runBronzeHop(spark, cfgS)
    val single = spark.read.parquet(TickPipeline.bronzeDir(cfgS))
      .filter(col("event_type").isin(types: _*))
    assert(concurrent.count() == single.count())
    assert(concurrent.except(single).count() == 0)
    assert(single.except(concurrent).count() == 0)
  }
}
