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
  *
  * Two output surfaces with different size constraints:
  *   - stdout: one compact JSON line (≤ 600 chars — headline total,
  *     cpu_total, the slowest queries, failures, sf), printed THREE
  *     times after `spark.stop()` with flushes and sleeps. The harness
  *     that records this run keeps only a ~2000-char tail of the log and
  *     has been observed cutting the final line mid-write at process
  *     teardown, so redundant short copies guarantee the tail holds at
  *     least two complete ones.
  *   - target/bench.json: the full-fidelity record (full-precision walls,
  *     per-query wall/cpu seconds for EVERY query, rep counts, row
  *     counts, error messages).
  *
  * Reps also respect a wall-clock budget (`SPARK_GRAFT_BENCH_BUDGET_SEC`,
  * default 2700 — sized so the full query inventory always gets min-of-3
  * even on a 3×-inflated host; the r10 default of 900 exhausted mid-sweep
  * on a contended host and the 1-rep tail read as a fake regression):
  * once the run has spent the budget, remaining queries get a single rep.
  *
  * The record SELF-FLAGS contention (`"contended": true` in both the
  * compact line and target/bench.json) so a noisy run is distinguishable
  * from a real regression without re-running. Two independent signals:
  *   - a single-thread CPU-spin probe (fixed xorshift loop) run before
  *     and after the sweep — on an idle host its wall ≈ its thread-CPU
  *     time; on an oversubscribed host the OS timeslices the spin and
  *     wall/cpu > 1.5;
  *   - budget exhaustion (some queries dropped to 1 rep), which only
  *     happens when the sweep ran far over its honest duration.
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
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "2700").toDouble
    val benchStart = System.nanoTime()
    var budgetExhausted = false
    def overBudget(): Boolean = {
      val over = (System.nanoTime() - benchStart) / 1e9 > budgetSec
      if (over) budgetExhausted = true
      over
    }
    // Contention probe: a fixed single-thread spin whose wall time equals
    // its thread-CPU time on an idle core; timeslicing on an
    // oversubscribed host inflates wall only. Ratio > 1.5 = contended.
    def spinProbe(): Double = {
      val tm = java.lang.management.ManagementFactory.getThreadMXBean
      if (!tm.isCurrentThreadCpuTimeSupported) return 1.0
      var x = 0x9e3779b97f4a7c15L
      val w0 = System.nanoTime()
      val c0 = tm.getCurrentThreadCpuTime
      var i = 0
      while (i < 150000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
      }
      val wall = (System.nanoTime() - w0).toDouble
      val cpu = (tm.getCurrentThreadCpuTime - c0).toDouble
      if (x == 42L) System.err.println("") // keep the loop observable
      if (cpu <= 0) 1.0 else wall / cpu
    }
    val probeBefore = spinProbe()
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
    // dev loop: SPARK_GRAFT_BENCH_ONLY=q1,q2 times just those queries
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty) // empty/blank var = no filter, not "run nothing"
    // (name, min wall sec, cpu sec of the min-wall rep, reps run,
    //  budget-cut flag, outcome)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      var (bestWall, bestCpu, outcome) = timedRep(fn)
      var reps = 1
      var stable = false
      // a failed first rep is final (retrying would mask flakiness); a
      // failure AFTER a success keeps the successful measurement.
      // Stable = the latest rep and the running minimum agree within 15 %
      // — a big drop (cold-JVM rep 1 → warm rep 2) therefore takes one
      // more rep to confirm the floor rather than stopping on it blindly
      while (outcome.isRight && !stable && reps < maxReps && !overBudget()) {
        val (w, c, o) = timedRep(fn)
        reps += 1
        if (o.isRight) {
          stable = math.max(w, bestWall) <= math.min(w, bestWall) * 1.15
          if (w < bestWall) { bestWall = w; bestCpu = c }
        } else stable = true
      }
      // the ONLY way a healthy query exits below maxReps without the
      // stability handshake is the budget guard — record it so a rep
      // cut at 2-of-3 is as visible in the record as one cut at 1-of-3
      val cut = outcome.isRight && !stable && reps < maxReps
      // Unload every streaming state-store provider this query left
      // loaded in the JVM. Without this, RocksDB/HDFS providers from
      // ~45 prior streaming queries accumulate and their background
      // maintenance (snapshot uploads, file-manager churn) contaminates
      // later queries' wall times: r12 recorded st_transform_list at
      // 17.5 s inside the full sweep vs 1.57 s isolated. Providers
      // reload lazily on next use, so this is pure hygiene — each
      // query's record now measures that query.
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case e: Throwable =>
        System.err.println(s"[bench] StateStore.stop after $name: $e")
      }
      (name, bestWall, bestCpu, reps, cut, outcome)
    }
    val probeAfter = spinProbe()
    val probeRatio = math.max(probeBefore, probeAfter)
    val contended = probeRatio > 1.5 || budgetExhausted
    // queries whose rep loop the budget stopped before stability or
    // maxReps (any rep count — min-of-2 is degraded too, per ADVICE r11)
    val budgetCut = results.count(_._5)
    // queries that never got past their cold first rep (worst tail)
    val reps1 = results.count { case (_, _, _, r, c, o) =>
      o.isRight && c && r == 1
    }
    // locale-proof decimal formatting (some locales print "1,23")
    def fmt(v: Double, dp: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    // failed queries are excluded from the headline total — a crash's
    // partial wall time must never make the aggregate look faster
    val total = results.collect { case (_, t, _, _, _, Right(_)) => t }.sum
    val cpuTotal = results.collect { case (_, _, c, _, _, Right(_)) => c }.sum
    val failed = results.count(_._6.isLeft)
    // numeric scale factor when the dir follows the sfX.Y convention; the
    // raw path otherwise (both are valid JSON values for the "sf" key).
    // The pattern must admit only a well-formed JSON number — a loose
    // digit/dot run would let "sf1.2.3" or "sf01" emit invalid JSON.
    val sfJson = "sf(0|[1-9][0-9]*)(\\.[0-9]+)?$".r.findFirstMatchIn(sfDir)
      .map(m => m.group(1) + Option(m.group(2)).getOrElse(""))
      .getOrElse(jsonStr(sfDir))
    val errors = results.collect { case (k, _, _, _, _, Left(m)) =>
      s"\"$k\":${jsonStr(m)}"
    }.mkString("{", ",", "}")
    // full-fidelity record: full-precision walls + cpu/reps/rows maps
    val fullLine = {
      def m(f: ((String, Double, Double, Int, Boolean, Either[String, Long])) => String) =
        results.map(f).mkString("{", ",", "}")
      val qs = m { case (k, w, _, _, _, _) => s"\"$k\":$w" }
      val cpu = m { case (k, _, c, _, _, _) => s"\"$k\":$c" }
      val reps = m { case (k, _, _, r, _, _) => s"\"$k\":$r" }
      val rows = m { case (k, _, _, _, _, o) => s"\"$k\":${o.getOrElse(-1L)}" }
      s"""{"metric":"total","value":$total,"unit":"sec","cpu_total":$cpuTotal,"contended":$contended,"probe_ratio":${fmt(probeRatio, 3)},"budget_exhausted":$budgetExhausted,"budget_cut_queries":$budgetCut,"single_rep_queries":$reps1,"queries":$qs,"cpu":$cpu,"reps":$reps,"rows":$rows,"errors":$errors,"failed":$failed,"sf":$sfJson}"""
    }
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, fullLine + "\n")
    // compact stdout line: must fit, whole, inside a ~2000-char log tail
    // together with sbt's "[success] Total time: ..." epilogue. 2-dp walls
    // normally suffice; fall back to 1 dp if the query list has grown,
    // then to dropping the error map (failure details live in
    // target/bench.json and the exit code; the headline must survive the
    // tail precisely when something went wrong). Compact-surface error
    // messages are truncated — one multi-KB Spark exception would
    // otherwise blow the budget the cap exists to protect.
    val compactErrors = results.collect { case (k, _, _, _, _, Left(m)) =>
      s"\"$k\":${jsonStr(m.take(100))}"
    }.mkString("{", ",", "}")
    def compactLine(dp: Int, withErrors: Boolean): String = {
      val qs = results.map { case (k, w, _, _, _, _) => s"\"$k\":${fmt(w, dp)}" }
        .mkString("{", ",", "}")
      val err = if (failed == 0 || !withErrors) ""
        else s""","errors":$compactErrors"""
      s"""{"metric":"total","value":${fmt(total, dp)},"unit":"sec","contended":$contended,"queries":$qs$err,"failed":$failed,"sf":$sfJson}"""
    }
    // last-resort shapes, still valid JSON with the same headline keys:
    // top-N slowest queries only (the ones a reader acts on), then none —
    // the line must parse even if the query inventory doubles again
    def topLine(n: Int): String = {
      val qs = results.sortBy(-_._2).take(n)
        .map { case (k, w, _, _, _, _) => s"\"$k\":${fmt(w, 1)}" }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 1)},"unit":"sec","contended":$contended,"queries":$qs,"queries_truncated_to":$n,"failed":$failed,"sf":$sfJson}"""
    }
    val line = (Seq((2, true), (1, true), (1, false))
        .map((compactLine _).tupled) ++ Seq(topLine(20), topLine(10),
        topLine(5)))
      .find(_.length <= 600)
      .getOrElse(s"""{"metric":"total","value":${fmt(total, 1)},"unit":"sec","contended":$contended,"failed":$failed,"sf":$sfJson}""")
    spark.stop()
    // Printed AFTER spark.stop() so nothing lands between the line and
    // the end of the log — and printed THREE times with flushes and
    // sleeps: the round-6 record lost the single final line MID-WRITE
    // (the log relay was cut at process teardown), so one copy at the
    // very end is exactly the fragile shape. Three ≤600-char copies mean
    // any 2000-char log tail that reaches the end of the run contains at
    // least two complete copies, whichever one a parser picks; the final
    // sleep gives the forked-process relay time to drain before exit.
    for (i <- 0 until 3) {
      if (i > 0) Thread.sleep(1000)
      println(line)
      System.out.flush()
    }
    Thread.sleep(2000)
    if (failed > 0) sys.exit(1)
  }
}
