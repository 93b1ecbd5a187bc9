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
    carryOverManifest(old, path)
    deleteRecursively(new java.io.File(old))
    recordLiveFiles(path)
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
    carryOverManifest(old, path)
    deleteRecursively(new java.io.File(old))
    recordLiveFiles(path)
  }

  /** The commit manifest is table history, not data — a rewrite must carry
    * it into the new directory, not delete it with the old tree.
    */
  private def carryOverManifest(oldPath: String, newPath: String): Unit = {
    val src = Paths.get(manifestPath(oldPath))
    if (Files.exists(src)) {
      val dst = Paths.get(manifestPath(newPath))
      Files.createDirectories(dst.getParent)
      Files.move(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** The reference's maintenance cadence — OPTIMIZE every N ingest batches
    * (reference: udf.py:77-78, every 60 batches; AutomateTable.py:57
    * disables the retention check the same job owns). Call after each
    * [[recordCommit]]: compacts when the commit count is a positive
    * multiple of `everyN`.
    *
    * @return true if a compaction ran
    */
  def maybeCompact(spark: SparkSession, path: String, everyN: Int,
      targetFiles: Int): Boolean = {
    val m = new java.io.File(manifestPath(path))
    if (!m.exists()) return false
    val n = Files.readString(m.toPath).linesIterator.count(_.nonEmpty)
    if (n > 0 && n % everyN == 0) {
      compact(spark, path, targetFiles)
      true
    } else false
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

  // ---------------------------------------------------------------------
  // Retention-window VACUUM (reference: delta_manager.py:11-17 — delete
  // data files past a 24 h retention). The table's live snapshot is the
  // file registry under _graft_log (the engine's analogue of the Delta
  // log's add-file set); vacuum deletes files under the table root that
  // are NOT registered and are older than the injected cutoff. The cutoff
  // is a parameter, never wall clock (SURVEY §5 determinism contract).

  def liveFilesPath(tablePath: String): String =
    s"$tablePath/_graft_log/live_files.txt"

  /** Register the table's current data files as live (one relative path
    * per line). Call after any committed rewrite — compact/cluster do.
    */
  def recordLiveFiles(tablePath: String): Unit = {
    val root = Paths.get(tablePath)
    val files = listDataFiles(new java.io.File(tablePath))
      .map(f => root.relativize(f.toPath).toString).sorted
    val p = Paths.get(liveFilesPath(tablePath))
    Files.createDirectories(p.getParent)
    Files.writeString(p, files.mkString("", "\n", "\n"))
  }

  /** Delete orphaned data files with mtime older than `cutoffEpochMs`
    * (leftovers from failed/superseded writes: `__old` / `*_tmp` sibling
    * trees from a crashed rewrite, uncommitted `_temporary` task files).
    * A file is deletable only when ALL of:
    *   - not in the live-file registry,
    *   - older than the retention cutoff (an in-flight writer's fresh
    *     files survive — the race the reference's 24 h default guards),
    *   - older than the registry snapshot itself: files appended AFTER the
    *     last recordLiveFiles are legitimate commits the registry simply
    *     hasn't seen, never orphans.
    * Also sweeps the rewrite staging siblings (`<path>__old`,
    * `<path>__compact_tmp`, `<path>__cluster_tmp`), which a crashed
    * compact/cluster leaves OUTSIDE the table root.
    * Refuses to run (returns -1) if no live-file registry exists: without
    * a snapshot every file would look like an orphan.
    *
    * @return number of files deleted, or -1 if the table has no registry
    */
  def vacuum(tablePath: String, cutoffEpochMs: Long): Int = {
    val reg = new java.io.File(liveFilesPath(tablePath))
    if (!reg.exists()) return -1
    val regMtime = reg.lastModified()
    val root = Paths.get(tablePath)
    val live = Files.readString(reg.toPath).linesIterator
      .filter(_.nonEmpty).toSet
    val inRoot = listDataFiles(new java.io.File(tablePath)).filter { f =>
      !live.contains(root.relativize(f.toPath).toString)
    }
    val siblings = Seq("__old", "__compact_tmp", "__cluster_tmp")
      .map(s => new java.io.File(tablePath + s)).filter(_.exists())
      .flatMap(listDataFiles)
    val victims = (inRoot ++ siblings).filter(f =>
      f.lastModified() < cutoffEpochMs && f.lastModified() < regMtime)
    victims.foreach(_.delete())
    pruneEmptyDirs(new java.io.File(tablePath))
    Seq("__old", "__compact_tmp", "__cluster_tmp")
      .map(s => new java.io.File(tablePath + s)).filter(_.exists())
      .foreach { d =>
        pruneEmptyDirs(d)
        if (Option(d.listFiles()).exists(_.isEmpty)) d.delete()
      }
    victims.size
  }

  /** All regular files under the table root except the _graft_log tree
    * (the log is table metadata, never vacuum-eligible — same contract as
    * Delta's _delta_log).
    */
  private def listDataFiles(root: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.getName == "_graft_log") Seq.empty
      else if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Seq.empty)
      else Seq(f)
    walk(root)
  }

  private def pruneEmptyDirs(root: java.io.File): Unit = {
    Option(root.listFiles()).foreach(_.filter(_.isDirectory)
      .filter(_.getName != "_graft_log").foreach { d =>
        pruneEmptyDirs(d)
        if (Option(d.listFiles()).exists(_.isEmpty)) d.delete()
      })
  }

  def parquetFileCount(path: String): Int =
    Option(new java.io.File(path).listFiles())
      .map(_.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
