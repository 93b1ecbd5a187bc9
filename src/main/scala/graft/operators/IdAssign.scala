package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, lit, row_number}
import org.apache.spark.sql.types.LongType

/** Scale-safe sequential id assignment — the 100-TB alternative to the
  * reference's `row_number() OVER (ORDER BY ...)` global window (reference:
  * populate_dim.py:91-94; SURVEY §2.6 W2 flags the single-partition
  * hazard). zipWithIndex computes per-partition offsets with one tiny job
  * (counts per partition), then assigns dense ids with no shuffle and no
  * single-partition window — order is partition order, not a sort, which
  * is the usual contract for surrogate ids at scale (sort first if a
  * specific order is required). One of the few justified RDD uses.
  */
object IdAssign {

  /** Append a dense unique long id column: offset+1, offset+2, … */
  def withSequentialIds(df: DataFrame, offset: Long,
      colName: String): DataFrame = {
    val schema = df.schema.add(colName, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (offset + i + 1))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Above this row count a global row_number window (single-partition
    * sort on one executor) is a scale hazard; dimension/changed-slice
    * inputs sit far below it.
    */
  val WindowThreshold = 1000000L

  /** Dense ids in `orderCols` total order, with the size guard every
    * surrogate-key call sites routes through: dim-sized inputs keep the
    * `row_number() OVER (ORDER BY …)` window (SQL/oracle parity, one tiny
    * sort), anything above `threshold` takes the scale path — global
    * range-partitioned sort + zipWithIndex, which yields the IDENTICAL
    * ids with no single-partition window. The input is localCheckpointed
    * first so the guard's count job and the chosen branch share one
    * materialization instead of re-running the upstream pipeline twice
    * (SCD2's changed-slice is a multi-join + sha2 tree).
    */
  def orderedIds(df: DataFrame, orderCols: Seq[Column], offset: Long,
      colName: String, threshold: Long = WindowThreshold): DataFrame = {
    val snap = df.localCheckpoint()
    if (snap.count() <= threshold)
      snap.withColumn(colName,
        lit(offset) + row_number().over(Window.orderBy(orderCols: _*))
          .cast("long"))
    else
      withSequentialIds(snap.orderBy(orderCols: _*), offset, colName)
  }
}
