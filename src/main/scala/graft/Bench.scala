package graft

import org.apache.spark.sql.SparkSession

/** Benchmark surface: one JSON line with per-query wall time, row counts,
  * and errors. A query that throws is reported in `errors` (and exits 1) —
  * a crashed query must never masquerade as a fast one.
  *
  * Contention-robust: a single wall-clock pass on a loaded host can
  * overstate short multi-job (micro-batch) queries by 10–40×, so each query
  * runs up to `SPARK_GRAFT_BENCH_REPS` (default 3) times and reports the
  * per-query MINIMUM wall time — safe because every query is a
  * deterministic read-only pipeline over fixed fixtures. Reps stop early
  * once a measurement lands within 15 % of the running minimum (the
  * measurement is stable, no contention evident). Process CPU time is
  * recorded per query alongside wall time: on a contended host wall
  * inflates while this JVM's CPU does not, so cpu≪wall with many reps is
  * the contention signature readers can check.
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
    val maxReps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    // process CPU time is a HotSpot extension: fall back to 0 (rather
    // than crash or emit negative values) where the platform bean does
    // not support it (-1) or is not the com.sun.management variant
    val cpuNanos: () => Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean =>
          () => math.max(0L, b.getProcessCpuTime)
        case _ => () => 0L
      }
    def timedRep(fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame)
        : (Double, Double, Either[String, Long]) = {
      val c0 = cpuNanos()
      val t0 = System.nanoTime()
      val outcome =
        try Right(fn(spark, sfDir).count())
        catch {
          case e: Throwable =>
            Left(s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").linesIterator
                .take(1).mkString.take(160))
        }
      ((System.nanoTime() - t0) / 1e9,
        math.max(0L, cpuNanos() - c0) / 1e9, outcome)
    }
    // (name, min wall sec, cpu sec of the min-wall rep, reps run, outcome)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var (bestWall, bestCpu, outcome) = timedRep(fn)
      var reps = 1
      var stable = false
      // a failed first rep is final (retrying would mask flakiness); a
      // failure AFTER a success keeps the successful measurement.
      // Stable = the latest rep and the running minimum agree within 15 %
      // — a big drop (cold-JVM rep 1 → warm rep 2) therefore takes one
      // more rep to confirm the floor rather than stopping on it blindly
      while (outcome.isRight && !stable && reps < maxReps) {
        val (w, c, o) = timedRep(fn)
        reps += 1
        if (o.isRight) {
          stable = math.max(w, bestWall) <= math.min(w, bestWall) * 1.15
          if (w < bestWall) { bestWall = w; bestCpu = c }
        } else stable = true
      }
      (name, bestWall, bestCpu, reps, outcome)
    }
    val qs = results.map { case (k, w, _, _, _) => s"\"$k\":$w" }
      .mkString("{", ",", "}")
    val cpu = results.map { case (k, _, c, _, _) => s"\"$k\":$c" }
      .mkString("{", ",", "}")
    val reps = results.map { case (k, _, _, r, _) => s"\"$k\":$r" }
      .mkString("{", ",", "}")
    val rows = results.map { case (k, _, _, _, o) =>
      s"\"$k\":${o.getOrElse(-1L)}"
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, _, _, _, Left(m)) =>
      s"\"$k\":${jsonStr(m)}"
    }.mkString("{", ",", "}")
    // failed queries are excluded from the headline total — a crash's
    // partial wall time must never make the aggregate look faster
    val total = results.collect { case (_, t, _, _, Right(_)) => t }.sum
    val cpuTotal = results.collect { case (_, _, c, _, Right(_)) => c }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","cpu_total":$cpuTotal,"queries":$qs,"cpu":$cpu,"reps":$reps,"rows":$rows,"errors":$errors,"failed":${results.count(_._5.isLeft)},"sf":"$sfDir"}"""
    println(line)
    // stdout gets truncated by log tails — persist the full line too
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, line + "\n")
    spark.stop()
    if (results.exists(_._5.isLeft)) sys.exit(1)
  }
}
