package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

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
    * filters/column pruning into the parquet reader.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    // (PARQUET_TYPE_ILLEGAL). Read nanos as epoch-long, then convert to a
    // micros TimestampType. Runtime-settable conf, so this also works under
    // a driver-created session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
