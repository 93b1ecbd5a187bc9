package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * Spark plans an inequality-only join as BroadcastNestedLoopJoin — fine
  * for a broadcast-sized build side, quadratic disaster otherwise. The
  * scale path is BUCKET EXPANSION (the standard interval-join rewrite,
  * e.g. Flink's interval join and the "bin the ranges" technique): map
  * every interval to the fixed-width buckets it overlaps (explode), map
  * every point to the single bucket containing it, equi-join on the
  * bucket id, then re-check the exact predicate. The join becomes a plain
  * hash/sort-merge equi-join that shuffles on the bucket key:
  *
  *   - cost = O(points + intervals × (len/width + 1)) rows shuffled, no
  *     cross product anywhere;
  *   - each (point, interval) match is produced EXACTLY once — the
  *     point's bucket is unique, so no post-join dedup is needed;
  *   - Catalyst still broadcasts the exploded interval side when it is
  *     small, and AQE can re-plan the shuffle when it is not.
  *
  * Pick `bucketWidthSec` near the typical interval length: shorter widths
  * multiply the interval-side expansion, longer widths put more
  * non-matching pairs through the residual filter.
  */
object RangeJoin {

  /** Rows of `left` joined to the rows of `right` whose
    * `[startCol, endCol)` interval contains `left(pointCol)`. Point and
    * bound columns are timestamps; the caller owns column-name
    * disjointness (as with any natural join).
    */
  def pointInInterval(left: DataFrame, pointCol: String,
      right: DataFrame, startCol: String, endCol: String,
      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, s"bucketWidthSec must be > 0: $bucketWidthSec")
    // epoch seconds (truncating) for the BUCKET only — the exact timestamp
    // predicate below decides membership, so neither sub-second truncation
    // nor the NTZ→instant session-tz interpretation can change the result
    // (TIMESTAMP_NTZ has no direct numeric cast; route through timestamp)
    def secs(c: org.apache.spark.sql.Column) =
      c.cast("timestamp").cast("long")
    val lb = left.withColumn("__bucket",
      floor(secs(col(pointCol)) / bucketWidthSec))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        floor(secs(col(startCol)) / bucketWidthSec),
        floor(secs(col(endCol)) / bucketWidthSec))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join: rows of `a` paired with the rows
    * of `b` whose `[bStart, bEnd)` interval overlaps `[aStart, aEnd)`
    * (`aStart < bEnd && bStart < aEnd`). Same bucket-expansion rewrite as
    * [[pointInInterval]], with BOTH sides exploded; each overlapping pair
    * is emitted EXACTLY once without a dedup pass by keeping only the
    * bucket containing the overlap's start — max(floor(aStart/w),
    * floor(bStart/w)) — which provably lies in both sides' bucket lists
    * whenever the intervals overlap (floor is monotone, so the max
    * commutes through it). Cost = O(Σ len/width + 1) rows shuffled per
    * side, plain equi-join, no nested loop at any size.
    */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, s"bucketWidthSec must be > 0: $bucketWidthSec")
    def secs(c: org.apache.spark.sql.Column) =
      c.cast("timestamp").cast("long")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(secs(c) / bucketWidthSec)
    val ab = a.withColumn("__bucket",
      explode(sequence(bucketOf(col(aStart)), bucketOf(col(aEnd)))))
    val bb = b.withColumn("__bucket",
      explode(sequence(bucketOf(col(bStart)), bucketOf(col(bEnd)))))
    ab.join(bb, Seq("__bucket"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("__bucket") ===
        greatest(bucketOf(col(aStart)), bucketOf(col(bStart))))
      .drop("__bucket")
  }
}
