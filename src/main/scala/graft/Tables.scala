package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Table registry over the driver-generated parquet dirs (TESTDATA.md).
  *
  * Mirrors the reference's path-keyed table registry
  * (reference: images/spark/Code/tbl_paths.py:1-12) as a function of the
  * scale-factor directory instead of a fixed s3a bucket. Every query in
  * [[SparkEntry.queries]] resolves its inputs exclusively through here, so
  * the same code runs on sf0.001 smoke, sf0.01 correctness, sf0.1 bench —
  * and, unchanged, on a real cluster by pointing `dir` at an object-store
  * prefix.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Content fingerprint of a table's backing file(s): full absolute path
    * plus each file's (name, size, mtime). Build-once fixture caches key on
    * this, so a regenerated source dataset invalidates the fixture and two
    * different dirs can never share one (the old `dir.hashCode` key did
    * neither).
    */
  def fingerprint(dir: String, name: String): String = {
    val root = new java.io.File(path(dir, name))
    val files =
      if (root.isDirectory)
        Option(root.listFiles()).map(_.toSeq.sortBy(_.getName))
          .getOrElse(Seq.empty)
      else Seq(root)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(root.getAbsolutePath.getBytes("UTF-8"))
    files.foreach { f =>
      md.update(s"|${f.getName}:${f.length}:${f.lastModified}".getBytes("UTF-8"))
    }
    md.digest().take(8).map("%02x".format(_)).mkString
  }

  /** Batch scan (reference S3: streaming_pipeline.py:32,35-36). Plain
    * `spark.read.parquet` keeps the scan declarative so Catalyst pushes
    * filters/column pruning into the parquet reader. Any `ts` column is
    * normalized to a canonical instant type regardless of how the producer
    * encoded it on disk ([[normalizeTs]]).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    if (df.schema.fieldNames.contains("ts")) normalizeTs(df) else df
  }

  /** Schema exactly as the parquet footer(s) declare it, read driver-side
    * (footers only, no data). `nanosAsLong` makes legacy TIMESTAMP(NANOS)
    * columns surface as epoch-nanos `LongType` instead of failing the read
    * — a shape [[normalizeTs]] recognizes. This is how `readStream` paths
    * obtain their mandatory explicit schema WITHOUT hardcoding one
    * producer's physical encoding: a producer-side encoding change is
    * absorbed here on the next restart.
    *
    * One snapshot must still be self-consistent: a streaming reader takes
    * exactly ONE schema, so every matched footer is read and required to
    * agree — genuinely mixed encodings within one glob fail loudly (naming
    * the divergent file) instead of mis-shaping the tail files under the
    * head file's schema. The check is footer-only and bounded by the
    * matched-file count; at cluster scale, point the glob at one
    * producer-partition (or pre-compact), which is also what bounds
    * streaming file listing itself.
    */
  def footerSchema(spark: SparkSession, pathOrGlob: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // expand the glob here: handing a glob straight to the batch reader
    // resolves, but logs a spurious recovered FileNotFoundException from
    // the initial non-glob qualification attempt
    val hp = new org.apache.hadoop.fs.Path(pathOrGlob)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
    require(matched.nonEmpty, s"no parquet input matches $pathOrGlob")
    val head = spark.read.parquet(matched.head.getPath.toString).schema
    matched.tail.foreach { m =>
      val sch = spark.read.parquet(m.getPath.toString).schema
      require(sch == head,
        s"mixed parquet schemas under $pathOrGlob: ${m.getPath} declares " +
        s"$sch but ${matched.head.getPath} declares $head — one streaming " +
        "snapshot needs a single schema; normalize or split the input")
    }
    head
  }

  /** Normalize a raw event-time column to canonical `TimestampType`
    * (a UTC instant), whichever of the three physical encodings a producer
    * wrote:
    *
    *   - parquet TIMESTAMP(NANOS), surfaced as epoch-nanos `LongType`
    *     under `nanosAsLong` → `timestamp_micros(ts div 1000)`;
    *   - TIMESTAMP_NTZ (isAdjustedToUTC=false micros) → cast, with the
    *     session timezone pinned to UTC so the naive value is read as the
    *     UTC instant it denotes;
    *   - TIMESTAMP (isAdjustedToUTC=true) → already canonical.
    *
    * Anything else (string, int32 days, …) is rejected loudly — a silent
    * misparse here corrupts every watermark and window downstream.
    */
  def normalizeTs(df: DataFrame, column: String = "ts"): DataFrame = {
    // Pin event-time interpretation to UTC. Every graft entry point sets
    // this already; doing it here too keeps a caller-created session (the
    // driver's smoke session, a user's REPL) on the same clock.
    df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    df.schema(column).dataType match {
      case LongType =>
        df.withColumn(column, expr(s"timestamp_micros($column div 1000)"))
      case TimestampNTZType =>
        df.withColumn(column, col(column).cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"unsupported on-disk encoding for event-time column '$column': " +
        s"$other (expected INT64 epoch-nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }

  /** Streaming scan over event-shaped parquet: schema derived from the
    * ACTUAL file footer (never hardcoded) and `ts` normalized to an
    * instant. All `readStream` consumers of the events table go through
    * here so a producer-side encoding change is absorbed in ONE place.
    */
  def streamEvents(spark: SparkSession, basePath: String, glob: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val reader = options.foldLeft(
        spark.readStream
          .schema(footerSchema(spark, glob))
          // a single-file target must stay a glob with basePath = its dir:
          // a non-glob path forces basePath = the file itself, which
          // partition inference rejects
          .option("basePath", basePath)) {
      case (r, (k, v)) => r.option(k, v)
    }
    normalizeTs(reader.parquet(glob))
  }

  /** [[streamEvents]] over the registry's events table. */
  def eventsStream(spark: SparkSession, dir: String,
      options: Map[String, String] = Map.empty): DataFrame =
    streamEvents(spark, dir, s"$dir/events*.parquet", options)
}
