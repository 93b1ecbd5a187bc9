package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance over plain parquet — the engine features standing in
  * for the reference's Delta OPTIMIZE / VACUUM / Z-ORDER jobs
  * (reference: images/spark/Code/spark/delta_manager.py:4-24, scheduled in
  * udf.py:74-83) and for the Delta commit-log stats the latency notebooks
  * consume (reference: TimeDelay.ipynb cell 0, code.ipynb cells 5-11).
  *
  * Commit manifest: every write appends one JSON line per commit with row
  * count and event-time min/max — the engine's analogue of
  * `add.stats.minValues` — so pipeline latency is measurable without wall
  * clocks (commit times are injected, SURVEY §5 determinism contract).
  */
object Maintenance {

  /** OPTIMIZE-style compaction: rewrite a table directory to
    * `targetFiles` files. Atomic via temp-dir + move (the same pattern the
    * SCD2 persistence uses): readers never see a half-written table.
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    val df = spark.read.parquet(path)
    val tmp = path + "__compact_tmp"
    df.coalesce(targetFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    val old = path + "__old"
    Files.move(Paths.get(path), Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(new java.io.File(old))
  }

  /** Z-order-lite: range-cluster the table on `clusterCols` so parquet
    * row-group min/max stats give data skipping on those columns
    * (reference: delta_manager.py:19-24 Z-ORDER BY coin_id — dead code
    * there via the batchIid typo; alive here).
    */
  def cluster(spark: SparkSession, path: String, clusterCols: Seq[String],
      targetFiles: Int): Unit = {
    val df = spark.read.parquet(path)
    val tmp = path + "__cluster_tmp"
    df.repartitionByRange(targetFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val old = path + "__old"
    Files.move(Paths.get(path), Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(new java.io.File(old))
  }

  /** Append a commit record (JSON line) to the table's manifest. */
  def recordCommit(tablePath: String, commitTs: String, df: DataFrame,
      eventTimeCol: String): Unit = {
    val stats = df.agg(
      count(lit(1)).as("n_rows"),
      min(col(eventTimeCol)).cast("string").as("min_event_time"),
      max(col(eventTimeCol)).cast("string").as("max_event_time")).first()
    val line =
      s"""{"commit_ts":"$commitTs","n_rows":${stats.getLong(0)},""" +
        s""""min_event_time":"${stats.getString(1)}",""" +
        s""""max_event_time":"${stats.getString(2)}"}""" + "\n"
    val manifest = Paths.get(manifestPath(tablePath))
    Files.createDirectories(manifest.getParent)
    Files.writeString(manifest, line,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  def manifestPath(tablePath: String): String =
    s"$tablePath/_graft_log/manifest.json"

  /** S8 analogue: scan the commit manifest as JSON and derive per-commit
    * ingest latency = commit_ts − max event time (reference:
    * TimeDelay.ipynb `delay` column).
    */
  def commitStats(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.json(manifestPath(tablePath))
      .select(col("commit_ts"), col("n_rows"),
        col("min_event_time"), col("max_event_time"),
        (unix_timestamp(col("commit_ts"))
          - unix_timestamp(col("max_event_time"))).as("latency_sec"))

  def parquetFileCount(path: String): Int =
    Option(new java.io.File(path).listFiles())
      .map(_.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
