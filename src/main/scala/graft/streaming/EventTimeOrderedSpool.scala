package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2 emulation — the reference re-streams its bronze table with Delta's
  * `withEventTimeOrder=true` so the initial snapshot replays in event-time
  * order (reference: streaming_pipeline.py:47-48, AutomateTable.py:58).
  * The file source has no such option, so the engine pre-sorts the backfill
  * (SURVEY §7 risk 3): range-partition the snapshot on the event-time
  * column into sequentially named files, then stream the spool directory
  * with `maxFilesPerTrigger=1` — each micro-batch replays one contiguous
  * time slice in order, so watermarks never drop backfill data.
  */
object EventTimeOrderedSpool {

  /** Write `df` as `numFiles` event-time-ordered spool files. File
    * modification times are rewritten in name order (1 s apart) because the
    * file source replays by mtime — same-second writes would otherwise make
    * the replay order ambiguous and let the watermark drop slices.
    */
  def spool(df: DataFrame, tsCol: String, dir: String, numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, col(tsCol))
      .sortWithinPartitions(col(tsCol))
      .write.mode("overwrite").parquet(dir)
    stampMtimes(dir, baseOffsetSec = 0)
  }

  /** Reassign mtimes of the dir's parquet files in name order, starting
    * `baseOffsetSec` seconds after the current max mtime in the dir.
    */
  def stampMtimes(dir: String, baseOffsetSec: Long): Unit = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array())
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val base = files.map(_.lastModified()).foldLeft(0L)(_ max _) +
      baseOffsetSec * 1000
    files.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(base + (i + 1) * 1000L)
    }
  }

  /** Write `df` as exactly ONE parquet file at `destPath` with the given
    * mtime — the single-slice spool primitive shared by the sentinel
    * injection (Extras) and the split-replay fixtures (Analytics). The
    * mtime matters: the file source replays in (mtime, path) order, so
    * the caller controls replay position through it.
    */
  def spoolSingleFile(df: DataFrame, destPath: String, mtimeMs: Long): Unit = {
    val tmp = destPath + "__stage"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dest = new java.io.File(destPath)
    dest.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dest.setLastModified(mtimeMs)
    graft.util.Fs.deleteRecursively(new java.io.File(tmp))
  }

  /** Open the spooled directory as an ordered stream. `filesPerTrigger`
    * contiguous time slices replay per micro-batch: the watermark only
    * needs slice boundaries ordered ACROSS batches, not within one, so
    * grouping slices lifts the 1-file-per-trigger throughput ceiling
    * while keeping replay watermark-safe.
    */
  def orderedStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      filesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .option("latestFirst", "false")
      .parquet(dir)
}
