package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (point-in-time) join — the canonical market-data
  * alignment: each left row picks the single latest right row at or
  * before its timestamp, per key (reference behavior: the OHLCV/tick
  * pipeline aligns per-symbol series by event time throughout, e.g.
  * images/spark/Code/streaming_pipeline.py's per-symbol bar builds; the
  * batch analogue of that alignment is this join).
  *
  * Spark plans `t.ts >= q.ts` with an equi-key as a sort-merge join that
  * keeps EVERY matching quote per trade and needs a post-aggregation to
  * pick the latest — O(matches) intermediate rows, quadratic for dense
  * quotes. The scale shape used here is UNION + PER-KEY ORDERED FILL
  * (the classic "merge the tapes" rewrite):
  *
  *   - tag right rows 0 and left rows 1, union them by name;
  *   - one shuffle on the key, sort within each key group by
  *     `(ts, side)` — right-before-left at equal timestamps makes the
  *     match inclusive;
  *   - `last(payload, ignoreNulls) OVER rows unbounded preceding` fills
  *     each left row with the most recent right payload;
  *   - keep the left rows.
  *
  * Cost: one hash shuffle of |left| + |right| rows and a per-key sort —
  * the same movement a groupBy over the union would do, with no
  * intermediate match explosion and nothing driver-side. Keys partition
  * the work, so a 1000-executor cluster scales with the number of
  * symbols, not the quote density.
  *
  * Ties on the RIGHT side (two right rows with one (key, ts)) are the
  * caller's contract to resolve (dedupe first) — any engine's as-of join
  * is nondeterministic under right-side ties.
  */
object AsOfJoin {

  /** All columns of `left` plus `right`'s payload columns (everything but
    * the keys and `tsCol`) taken from the latest right row with
    * `right.tsCol <= left.tsCol` (direction "backward", the default) or
    * the earliest right row with `right.tsCol >= left.tsCol` (direction
    * "forward"); nulls when no such row exists. Column sets other than
    * the keys and `tsCol` must be disjoint.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward").contains(direction),
      s"direction must be backward|forward: $direction")
    val payload = right.columns.filterNot(keys.contains).filterNot(_ == tsCol)
    val leftOther = left.columns.filterNot(keys.contains).filterNot(_ == tsCol)
    val clash = payload.toSet.intersect(leftOther.toSet)
    require(clash.isEmpty, s"ambiguous non-key columns: $clash")
    val lu = left.withColumn("__side", lit(1))
    val ru = right.withColumn("__side", lit(0))
    val unioned = lu.unionByName(ru, allowMissingColumns = true)
    val ord =
      if (direction == "backward")
        Seq(col(tsCol).asc, col("__side").asc)
      else Seq(col(tsCol).desc, col("__side").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }
}
