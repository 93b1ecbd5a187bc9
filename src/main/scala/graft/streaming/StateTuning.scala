package graft.streaming

import org.apache.spark.sql.SparkSession

/** Sizes shuffle/state partitions for a streaming run from its INPUT
  * volume instead of inheriting the session-wide default.
  *
  * Why: a stateful micro-batch pays per-partition overhead every trigger —
  * one task, one state-store instance, one checkpoint delta file per
  * shuffle partition. That cost is invisible on a big batch job but
  * dominates a replay whose micro-batches carry kilobytes: 32 partitions
  * × N triggers of fixed overhead for 5 groups of data. Conversely a
  * 100-TB stream wants thousands of state partitions, not 32. Both fall
  * out of the same rule: ~[[TargetBytesPerPartition]] of input per
  * partition, clamped to [[MinPartitions]]..[[MaxPartitions]].
  *
  * The partition count binds at the FIRST micro-batch of a fresh
  * checkpoint (it is recorded in the offset metadata and pinned for the
  * checkpoint's lifetime), which is why the engine's replay harnesses wrap
  * the whole run — fresh work dir, fresh checkpoint — in
  * [[withStatePartitions]]. Partition count never changes query RESULTS
  * (every engine query is order-normalized with deterministic aggregates);
  * it is purely a throughput knob, so the set/restore is benign even if a
  * concurrent query in the same session plans inside the window.
  */
object StateTuning {

  /** Input bytes a single shuffle/state partition should own. */
  val TargetBytesPerPartition: Long = 32L << 20

  /** Floor keeps a tiny replay honest about multi-partition semantics
    * (state distribution, per-partition watermarks) instead of collapsing
    * to a single-task stream nothing would ever deploy.
    */
  val MinPartitions = 4

  /** Ceiling for a pathological byte count; real deployments tune past
    * this deliberately, not by accident of one huge directory.
    */
  val MaxPartitions = 4096

  /** Recursive size of a file or directory; 0 if absent. */
  def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }

  /** Size of a literal path, or of a single-level `name*glob` pattern in
    * its parent directory — the shape the file streaming sources here use
    * (`.../events*.parquet`).
    */
  def globBytes(glob: String): Long = {
    val f = new java.io.File(glob)
    if (f.exists()) dirBytes(glob)
    else {
      val rx = ("\\Q" + f.getName + "\\E").replace("*", "\\E.*\\Q").r
      Option(f.getParentFile).flatMap(p => Option(p.listFiles()))
        .map(_.filter(c => rx.matches(c.getName))
          .map(c => dirBytes(c.getAbsolutePath)).sum)
        .getOrElse(0L)
    }
  }

  def partitionsForBytes(bytes: Long): Int =
    // ceiling-division add would overflow near Long.MaxValue — anything
    // at or past the ceiling's worth of bytes just takes the ceiling
    if (bytes >= TargetBytesPerPartition * MaxPartitions) MaxPartitions
    else math.min(MaxPartitions.toLong, math.max(MinPartitions.toLong,
      (bytes + TargetBytesPerPartition - 1) / TargetBytesPerPartition)).toInt

  /** Runs `body` with `spark.sql.shuffle.partitions` sized for
    * `inputBytes`, restoring the previous value after.
    */
  def withStatePartitions[T](s: SparkSession, inputBytes: Long)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, partitionsForBytes(inputBytes).toString)
    try body finally s.conf.set(key, prev)
  }
}
