package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
}
