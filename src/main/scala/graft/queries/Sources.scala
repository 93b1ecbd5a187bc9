package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.t
import graft.operators.Maintenance

/** Remaining source/scan operators — SURVEY.md §2.1: S4 in-memory fixture
  * ingest (the REST/pandas path), S7 CSV scan, S8 commit-log scan.
  */
object Sources {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------
  // S4: deterministic fixture → createDataFrame, with the reference's
  // null-defaulting cast chain (reference: utils.py:8-32 REST coin list →
  // pandas → DataFrame; maxSupply sentinel utils.py:27-30).
  private def s4SeqIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val coins = Seq(
      (1L, "BTC", "Bitcoin", 19700000.0, Some(21000000.0)),
      (2L, "ETH", "Ethereum", 120200000.0, None),
      (3L, "XRP", "Ripple", 54300000000.0, Some(100000000000.0)),
      (4L, "ADA", "Cardano", 35000000000.0, Some(45000000000.0)),
      (5L, "DOGE", "Dogecoin", 143800000000.0, None))
    coins.toDF("coin_id", "symbol", "name", "supply", "max_supply")
      .select(col("coin_id"), col("symbol"), col("name"),
        col("supply"),
        coalesce(col("max_supply"), lit(-1.0)).as("max_supply"),
        round(col("supply") / coalesce(col("max_supply"), col("supply")) * 100.0, 6)
          .as("issued_pct"))
      .orderBy(col("coin_id"))
  }

  private val s4SeqIngestSql =
    """SELECT CAST(coin_id AS BIGINT) AS coin_id, symbol, name, supply,
      |  coalesce(max_supply, -1.0) AS max_supply,
      |  round(supply / coalesce(max_supply, supply) * 100.0, 6) AS issued_pct
      |FROM (VALUES
      |  (1, 'BTC', 'Bitcoin', 19700000.0, 21000000.0),
      |  (2, 'ETH', 'Ethereum', 120200000.0, NULL),
      |  (3, 'XRP', 'Ripple', 54300000000.0, 100000000000.0),
      |  (4, 'ADA', 'Cardano', 35000000000.0, 45000000000.0),
      |  (5, 'DOGE', 'Dogecoin', 143800000000.0, NULL))
      |  t(coin_id, symbol, name, supply, max_supply)
      |ORDER BY coin_id""".stripMargin

  // ---------------------------------------------------------------------
  // S7: CSV scan (reference: bitcoin_df.csv in Garch_v1.ipynb cell 1). The
  // engine round-trips events through CSV with an explicit schema, then
  // aggregates; the oracle computes the same aggregate from parquet —
  // proving the CSV reader is lossless for this schema.

  /** Build-once CSV fixture keyed by the source-table content fingerprint
    * (path + file sizes/mtimes — a regenerated dataset rebuilds the
    * fixture), so the timed query pays only the scan. `_SUCCESS` (written
    * last by the committer) guards against a half-written fixture from a
    * crashed run.
    */
  def ensureCsvFixture(s: SparkSession, dir: String): String = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-csv-${graft.Tables.fingerprint(dir, "events")}").getAbsolutePath
    if (!new java.io.File(tmp, "_SUCCESS").exists()) {
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .write.mode("overwrite").option("header", "true").csv(tmp)
    }
    tmp
  }

  private def s7CsvScan(s: SparkSession, dir: String): DataFrame = {
    val tmp = ensureCsvFixture(s, dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    s.read.option("header", "true").schema(schema).csv(tmp)
      .groupBy(col("event_type"))
      .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  private val s7CsvScanSql =
    """SELECT event_type,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value,
      |  count(DISTINCT user_id) AS n_users, count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // S8: commit-manifest scan + ingest-latency metric (reference: Delta
  // txn-log minValues scan, TimeDelay.ipynb cell 0). The engine writes its
  // own manifest (injected commit time — no wall clock) and reads it back
  // as JSON.
  /** Build-once committed-table fixture keyed by the source-table content
    * fingerprint (see [[ensureCsvFixture]]). The manifest line is written
    * last, so its existence implies a complete fixture; the guard also
    * keeps the manifest at exactly one commit record (recordCommit
    * appends).
    */
  def ensureCommitFixture(s: SparkSession, dir: String): String = {
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-commit-${graft.Tables.fingerprint(dir, "events")}").getAbsolutePath
    val bars = s"$work/bars"
    if (!new java.io.File(Maintenance.manifestPath(bars)).exists()) {
      val df = t(s, dir, "events")
        .select(date_trunc("minute", col("ts")).as("window_start"),
          col("value"))
      df.write.mode("overwrite").parquet(bars)
      Maintenance.recordCommit(bars, "2024-02-01 00:00:30", df,
        "window_start")
    }
    bars
  }

  private def s8CommitStats(s: SparkSession, dir: String): DataFrame =
    Maintenance.commitStats(s, ensureCommitFixture(s, dir))

  private val s8CommitStatsSql =
    """SELECT '2024-02-01 00:00:30' AS commit_ts, count(*) AS n_rows,
      |  CAST(min(ws) AS VARCHAR) AS min_event_time,
      |  CAST(max(ws) AS VARCHAR) AS max_event_time,
      |  CAST(epoch(TIMESTAMP '2024-02-01 00:00:30') - epoch(max(ws)) AS BIGINT)
      |    AS latency_sec
      |FROM (SELECT date_trunc('minute', ts) AS ws FROM events)""".stripMargin

  // ---------------------------------------------------------------------
  // S10: ORC scan — the second columnar format a lakehouse ingests
  // beside parquet (Spark's built-in ORC source; vectorized reader,
  // predicate pushdown, column pruning all apply as with parquet). The
  // engine round-trips events through ORC and aggregates; the oracle
  // computes the same aggregate from the parquet table — proving the
  // ORC writer+reader pair is lossless for this schema.
  /** Build-once ORC fixture keyed by the source-table content
    * fingerprint (same convention as [[ensureCsvFixture]]).
    */
  def ensureOrcFixture(s: SparkSession, dir: String): String = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-orc-${graft.Tables.fingerprint(dir, "events")}").getAbsolutePath
    if (!new java.io.File(tmp, "_SUCCESS").exists()) {
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts"))
        .write.mode("overwrite").orc(tmp)
    }
    tmp
  }

  private def s10OrcScan(s: SparkSession, dir: String): DataFrame = {
    val tmp = ensureOrcFixture(s, dir)
    s.read.orc(tmp)
      .filter(col("event_type") =!= "view") // pushdown reaches the ORC scan
      .groupBy(col("event_type"))
      .agg((sum(round(col("value") * 100).cast("long")) / 100.0)
        .as("sum_value"),
        countDistinct(col("user_id")).as("n_users"),
        max(col("ts")).as("last_ts"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  private val s10OrcScanSql =
    """SELECT event_type,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value,
      |  count(DISTINCT user_id) AS n_users, max(ts) AS last_ts,
      |  count(*) AS n
      |FROM events WHERE event_type <> 'view'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "s4_seq_ingest" -> s4SeqIngest _,
    "s7_csv_scan" -> s7CsvScan _,
    "s8_commit_stats" -> s8CommitStats _,
    "s10_orc_scan" -> s10OrcScan _
  )

  val oracle: Map[String, String] = Map(
    "s4_seq_ingest" -> s4SeqIngestSql,
    "s7_csv_scan" -> s7CsvScanSql,
    "s8_commit_stats" -> s8CommitStatsSql,
    "s10_orc_scan" -> s10OrcScanSql
  )
}
