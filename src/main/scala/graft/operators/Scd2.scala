package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD type-2 dimension merge as a pure DataFrame transform — the engine
  * feature that replaces the reference's Delta `MERGE` + append
  * (reference: images/spark/Code/spark/populate_dim.py:131-171: hash staged
  * rows, anti-join changed/new, offset surrogate keys by table max, MERGE to
  * expire old versions, append new versions).
  *
  * No Delta in this environment (SURVEY §7), so the merge is expressed as
  * joins + union over the current snapshot; a caller persists the result
  * with an atomic directory swap (see [[ParquetMerge]]). All steps are
  * shuffle-on-business-key equi-joins — at 100 TB the dimension is tiny
  * relative to facts, and the whole merge broadcasts.
  *
  * Determinism contract (SURVEY §5): surrogate keys are assigned in
  * (key, hash) total order via [[IdAssign.orderedIds]], so results are
  * reproducible and DuckDB-oracle-matchable. The size guard in there keeps
  * the `row_number()` global window for dim-sized changed slices and
  * switches to sorted `zipWithIndex` (identical ids, no single-partition
  * window) above the threshold — an oversized merge can no longer pile a
  * fact-sized sort onto one executor.
  */
object Scd2 {

  val FarFuture = "9999-12-31"

  /** Hash staged attributes for change detection (reference:
    * populate_dim.py:115-116 — sha2(concat_ws("~", ...), 256)). Double
    * columns must be pre-canonicalized by the caller (e.g. integer cents)
    * so the hash string is engine-independent.
    */
  def withHash(staged: DataFrame, hashCols: Seq[String]): DataFrame =
    staged.withColumn("hash", sha2(concat_ws("~", hashCols.map(col): _*), 256))

  /** Merge a hashed staged snapshot into the current SCD2 state.
    *
    * @param current  (surrogate_key, key, attrs..., hash, start_date,
    *                 end_date, is_current)
    * @param staged   (key, attrs..., hash) — one row per business key
    * @param key      business key column name
    * @param effectiveDate 'yyyy-MM-dd' — versioning date for this load
    * @return the complete new dimension state, same schema as `current`
    */
  def merge(current: DataFrame, staged: DataFrame, key: String,
      effectiveDate: String): DataFrame = {
    val cur = current.filter(col("is_current") === "Y")
    // Changed or brand-new business keys (reference: populate_dim.py:138-144
    // left-anti on ['coin_id','hash','is_current']).
    val changed = staged.join(
      cur.select(col(key), col("hash")),
      Seq(key, "hash"), "left_anti")
    val changedKeys = changed.select(col(key)).distinct()

    // Expire the old current version of every changed key (reference:
    // populate_dim.py:153-163 — MERGE ... WHEN MATCHED AND is_current='Y'
    // AND hash <> updates.hash THEN UPDATE is_current='N', end_date=now).
    val expired = current
      .join(broadcast(changedKeys), Seq(key), "left_semi")
      .filter(col("is_current") === "Y")
      .withColumn("is_current", lit("N"))
      .withColumn("end_date", to_date(lit(effectiveDate)))
    val untouched = current
      .join(broadcast(changedKeys), Seq(key), "left_anti")
      .unionByName(current
        .join(broadcast(changedKeys), Seq(key), "left_semi")
        .filter(col("is_current") =!= "Y"))

    // New versions get surrogate keys offset by the current max (reference:
    // populate_dim.py:147-150) in (key, hash) total order (:119-121).
    val maxSk = current.agg(coalesce(max(col("surrogate_key")), lit(0L)))
      .first().getLong(0)
    val newRows = IdAssign.orderedIds(
      changed, Seq(col(key), col("hash")), maxSk, "surrogate_key")
      .withColumn("start_date", to_date(lit(effectiveDate)))
      .withColumn("end_date", to_date(lit(FarFuture)))
      .withColumn("is_current", lit("Y"))

    untouched.unionByName(expired).unionByName(
      newRows.select(untouched.columns.map(col).toIndexedSeq: _*))
  }
}
