package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.TickPipeline

/** Streaming slice of the inventory — SURVEY.md §2.2/2.9: S1/S2 file
  * streaming sources, A1 watermarked tumbling aggregation, K1 foreachBatch
  * bronze append, J1 stream-static broadcast join, K2 partitioned append
  * sink with checkpoint.
  *
  * Each query RUNS the real Structured Streaming pipeline (AvailableNow
  * trigger, fresh work dir + checkpoints per invocation) and returns the
  * sink contents read back, so the DuckDB oracle checks true streaming
  * output against the equivalent batch SQL — the stream-batch parity
  * contract of SURVEY §5.
  */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** K1/A1: hop-1 bronze bars via a real streaming query. */
  private def k1StreamBronze(s: SparkSession, dir: String): DataFrame = {
    val cfg = TickPipeline.Config(dir, TickPipeline.freshWorkDir())
    TickPipeline.runBronzeHop(s, cfg)
    // bronze is commitAppend-written: read through the tracked schema,
    // the same surface a user of the protocol would use
    graft.operators.Maintenance.readTable(s, TickPipeline.bronzeDir(cfg))
      .orderBy(col("event_type"), col("window_start"))
  }

  private val k1StreamBronzeSql =
    """SELECT event_type, date_trunc('minute', ts) AS window_start,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0/count(*) AS average_1minute,
      |  arg_max(value, ts) AS price, count(*) AS n_ticks
      |FROM events GROUP BY 1, 2 ORDER BY event_type, window_start""".stripMargin

  /** K2/J1/P5-P7: the full two-hop pipeline → fact table. */
  private def k2StreamFact(s: SparkSession, dir: String): DataFrame = {
    val cfg = TickPipeline.Config(dir, TickPipeline.freshWorkDir())
    TickPipeline.runAll(s, cfg)
      .orderBy(col("coin_id"), col("date_id"), col("time_id"))
  }

  private val k2StreamFactSql =
    """WITH bars AS (
      |  SELECT event_type, date_trunc('minute', ts) AS window_start,
      |         sum(CAST(round(value*100) AS BIGINT))/100.0/count(*) AS average_1minute,
      |         arg_max(value, ts) AS price
      |  FROM events GROUP BY 1, 2),
      |dim AS (
      |  SELECT event_type, row_number() OVER (ORDER BY event_type) AS type_id,
      |         row_number() OVER (ORDER BY event_type) * 1000.0 AS supply
      |  FROM (SELECT DISTINCT event_type FROM events)),
      |prev AS (
      |  SELECT event_type, arg_max(value, ts) AS last_price
      |  FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-29' GROUP BY 1)
      |SELECT d.type_id AS coin_id,
      |  year(b.window_start)*10000 + month(b.window_start)*100
      |    + day(b.window_start) AS date_id,
      |  hour(b.window_start)*10000 + minute(b.window_start)*100
      |    + second(b.window_start) AS time_id,
      |  b.price, b.price * d.supply AS market_cap,
      |  (b.price - p.last_price) / p.last_price * 100.0 AS change_percent_last_day,
      |  b.average_1minute, '2024-02-01 00:00:00' AS created_at
      |FROM bars b
      |JOIN dim d USING (event_type)
      |JOIN prev p USING (event_type)
      |ORDER BY coin_id, date_id, time_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "k1_stream_bronze_bars" -> k1StreamBronze _,
    "k2_stream_fact" -> k2StreamFact _
  )

  val oracle: Map[String, String] = Map(
    "k1_stream_bronze_bars" -> k1StreamBronzeSql,
    "k2_stream_fact" -> k2StreamFactSql
  )
}
