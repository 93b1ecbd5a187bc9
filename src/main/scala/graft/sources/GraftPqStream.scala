package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition,
  PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.operators.{Maintenance, ParquetFooter}

/** A commit-log version as a streaming offset. */
private[sources] final case class GraftPqVersionOffset(version: Long)
  extends Offset {
  override def json(): String = version.toString
}

/** VERSION-TAILING streaming source over a [[Maintenance]]-committed
  * table — the Delta streaming-source mechanism rebuilt on the
  * engine's own commit log, surfaced through
  * `spark.readStream.format("graftpq").load(tableDir)`:
  *
  *  - '''offsets are COMMIT VERSIONS''' (`_graft_log/version`), so a
  *    trigger's planning cost is O(versions advanced) — each append
  *    version contributes exactly its `v{N}.add.txt` file listing.
  *    The directory is NEVER listed: at 100 TB a file-listing
  *    streaming source pays O(files-ever) per trigger, the version
  *    tail pays O(new files);
  *  - '''each added file plans through the batch machinery''' — the
  *    same footer-tail reads, per-row-group splits and column pruning
  *    ([[GraftParquet.reqPlansFor]]), decoded by the same
  *    [[GraftPqReaderFactory]]; partition-dir values surface as typed
  *    constant columns parsed from each file's `col=value` path;
  *  - '''non-append versions fail LOUDLY.''' A rewrite / delete /
  *    merge / update / restore / deletion-vector version is not
  *    expressible as an append stream; silently re-emitting or
  *    skipping rows would corrupt downstream state, so the stream
  *    dies naming the version and its kind — observably Delta's
  *    behavior on a changed source without `skipChangeCommits`.
  *
  * Exactly-once composition: offsets are stored in the sink's
  * checkpoint by the engine-independent Structured Streaming contract;
  * a restart resumes from the committed version and replans only the
  * later adds.
  */
private[sources] class GraftPqMicroBatch(path: String,
    required: StructType, maxVersionsPerTrigger: Int = 0)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming
    .SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming
    .SupportsTriggerAvailableNow {

  require(new java.io.File(path, "_graft_log/version").exists(),
    s"graftpq streaming: $path is not a committed table (version " +
      "tailing needs the commit log; batch-read plain directories)")

  /** Trigger.AvailableNow fences the run at the version current when
    * the query STARTED — later commits wait for the next run, and the
    * paced triggers below loop until this fence is reached.
    */
  @volatile private var availableNowEnd: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Maintenance.readVersion(path)

  private def fencedLatest(): Long = {
    val v = Maintenance.readVersion(path)
    if (availableNowEnd >= 0) math.min(v, availableNowEnd) else v
  }

  override def initialOffset(): Offset = GraftPqVersionOffset(0L)

  override def latestOffset(): Offset =
    GraftPqVersionOffset(fencedLatest())

  /** ADMISSION CONTROL (`option("maxVersionsPerTrigger", n)`): a
    * trigger admits at most n versions past its start — a multi-year
    * backlog re-streams as bounded micro-batches instead of one
    * giant first batch (Trigger.AvailableNow loops triggers until
    * the prepared fence is reached).
    */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val s = start.asInstanceOf[GraftPqVersionOffset].version
    val latest = fencedLatest()
    GraftPqVersionOffset(
      if (maxVersionsPerTrigger > 0)
        math.min(latest, s + maxVersionsPerTrigger)
      else latest)
  }

  override def reportLatestOffset(): Offset =
    GraftPqVersionOffset(fencedLatest())

  override def deserializeOffset(json: String): Offset =
    GraftPqVersionOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftPqVersionOffset].version
    val e = end.asInstanceOf[GraftPqVersionOffset].version
    val partCols = GraftParquet.partitionColsOf(path)
    val partColTypes: Map[String, DataType] = partCols.toMap
    val root = new java.io.File(path).getAbsoluteFile
    val files: Seq[java.io.File] = (s + 1 to e).flatMap { v =>
      addedFilesOf(v).map(n => resolveDataFile(root, v, n))
    }
    files.flatMap { f =>
      // partition values parse from the file's col=value path segments
      val rel = root.toPath.relativize(f.getAbsoluteFile.toPath)
      val segs = (0 until rel.getNameCount - 1)
        .map(rel.getName(_).toString)
      val partVals: Map[String, Option[String]] =
        partCols.map { case (c, _) =>
          c -> segs.collectFirst {
            case seg if seg.startsWith(s"$c=") =>
              val raw = seg.substring(c.length + 1)
              if (raw == "__HIVE_DEFAULT_PARTITION__") None
              else Some(GraftParquet.unescapePathName(raw))
          }.getOrElse(throw new IllegalStateException(
            s"graftpq streaming: file $rel lacks partition dir '$c='"))
        }.toMap
      val footer = ParquetFooter.readTail(f.toPath)
      val plans = GraftParquet.fieldPlans(footer.schema)
      val reqPlans = GraftParquet.reqPlansFor(plans, required,
        partColTypes, partVals, f.getName)
      footer.rowGroups.map { rg =>
        GraftPqPartition(f.getAbsolutePath, rg.numRows,
          reqPlans.flatMap(_.leafs).map(l =>
            rg.columns.find(_.path == l.path).getOrElse(
              throw new IllegalArgumentException(
                s"graftpq: chunk for '${l.path}' missing in " +
                  f.getName))),
          reqPlans): InputPartition
      }
    }.toArray
  }

  /** The files version `v` appended — or a LOUD error for any version
    * kind an append stream cannot express.
    */
  private def addedFilesOf(v: Long): Seq[String] = {
    def exists(p: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(p))
    val addPath = Maintenance.snapshotAddPath(path, v)
    if (exists(addPath))
      java.nio.file.Files.readString(java.nio.file.Paths.get(addPath))
        .linesIterator.filter(_.nonEmpty).toSeq
    else {
      val kind =
        if (exists(Maintenance.snapshotDeletePath(path, v))) "delete"
        else if (exists(Maintenance.snapshotMergePath(path, v))) "merge"
        else if (exists(Maintenance.snapshotUpdatePath(path, v)))
          "update"
        else if (exists(Maintenance.snapshotRestorePath(path, v)))
          "restore"
        else if (exists(Maintenance.dvMarkerPath(path, v)))
          "deletion-vector delete"
        else if (exists(Maintenance.snapshotFullPath(path, v)))
          "rewrite"
        else "unknown"
      throw new IllegalStateException(
        s"graftpq streaming: version $v of $path is a $kind — not an " +
          "append; an append stream cannot express it (stream changes " +
          "through Maintenance.streamChanges instead)")
    }
  }

  /** Snapshot listings record bare file names; a partitioned table's
    * live under their `col=value` dirs — resolve by walking (the add
    * listing is per-version tiny, and only new files are ever walked).
    */
  private def resolveDataFile(root: java.io.File, v: Long,
      name: String): java.io.File = {
    val flat = new java.io.File(root, name)
    if (flat.isFile) flat
    else {
      def find(dir: java.io.File): Option[java.io.File] = {
        val kids = dir.listFiles()
        if (kids == null) None
        else kids.sortBy(_.getName).iterator.flatMap { k =>
          if (k.isFile && k.getName == name) Some(k)
          else if (k.isDirectory && !k.getName.startsWith("_") &&
            !k.getName.startsWith(".")) find(k)
          else None
        }.nextOption()
      }
      find(root).getOrElse(throw new IllegalStateException(
        s"graftpq streaming: version $v added '$name' but no such " +
          s"data file exists under $root (vacuumed or torn table)"))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftPqReaderFactory(required)
}
