package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL entry for the commit protocol's DML verbs over PATH tables — the
  * engine analogue of Delta's ``DELETE FROM delta.`/path` `` surface
  * (reference behavior: its pipelines issue table-format DML as SQL
  * throughout, e.g. populate_dim.py's MERGE statement and metadata.py's
  * DDL executor). The statement frame (verb, path, clauses) is matched
  * here; every EXPRESSION — predicates, SET right-hand sides — is handed
  * to Catalyst's own parser via `expr(...)`, so the full SQL expression
  * grammar works without this layer reimplementing any of it.
  *
  * Supported statements (case-insensitive keywords, path in backticks):
  *
  *   DELETE FROM `/path` WHERE <predicate>
  *   DELETE FROM `/path` USING VECTORS WHERE <predicate>
  *   UPDATE `/path` SET col = <expr>[, col = <expr>…] WHERE <predicate>
  *   MERGE INTO `/path` USING <tempView> ON <keyColumn>
  *   OPTIMIZE `/path` [TO <n> FILES]
  *   OPTIMIZE `/path` ZORDER BY (col[, col…]) [TO <n> FILES]
  *   RESTORE `/path` TO VERSION <n>
  *   VACUUM `/path` RETAIN <n> HOURS AS OF <epochMs>
  *   APPLY VECTORS `/path`
  *   CREATE TABLE `/dst` SHALLOW CLONE `/src` [VERSION AS OF <n>]
  *   ALTER TABLE `/path` RENAME COLUMN a TO b
  *   ALTER TABLE `/path` DROP COLUMN c
  *   DESCRIBE HISTORY `/path`
  *
  * Each returns a ONE-ROW metrics DataFrame (operation, version,
  * rows_affected, files_rewritten) — the shape Delta's DML commands
  * report. Everything else (SELECT, DDL) belongs to `spark.sql` itself.
  */
object GraftSql {

  private val Delete =
    """(?is)\s*DELETE\s+FROM\s+`([^`]+)`\s+(USING\s+VECTORS\s+)?WHERE\s+(.+?)\s*;?\s*""".r
  private val Update =
    """(?is)\s*UPDATE\s+`([^`]+)`\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val Merge =
    """(?is)\s*MERGE\s+INTO\s+`([^`]+)`\s+USING\s+([\w.]+)\s+ON\s+(\w+)\s*;?\s*""".r
  private val OptimizeZorder =
    """(?is)\s*OPTIMIZE\s+`([^`]+)`\s+ZORDER\s+BY\s*\(([^)]+)\)(?:\s+TO\s+(\d+)\s+FILES)?\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+`([^`]+)`(?:\s+TO\s+(\d+)\s+FILES)?\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+`([^`]+)`\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+`([^`]+)`\s+TO\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+`([^`]+)`\s+RETAIN\s+(\d+)\s+HOURS\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val ApplyVectors =
    """(?is)\s*APPLY\s+VECTORS\s+`([^`]+)`\s*;?\s*""".r
  private val CloneAsOf =
    """(?is)\s*CREATE\s+TABLE\s+`([^`]+)`\s+SHALLOW\s+CLONE\s+`([^`]+)`\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val Clone =
    """(?is)\s*CREATE\s+TABLE\s+`([^`]+)`\s+SHALLOW\s+CLONE\s+`([^`]+)`\s*;?\s*""".r
  private val RenameCol =
    """(?is)\s*ALTER\s+TABLE\s+`([^`]+)`\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*""".r
  private val DropCol =
    """(?is)\s*ALTER\s+TABLE\s+`([^`]+)`\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*""".r

  /** Split `SET a = e1, b = e2` on TOP-LEVEL commas only — commas inside
    * parentheses (function calls) or quotes belong to the expression.
    */
  private[operators] def splitSet(set: String): Seq[(String, String)] = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var quote: Option[Char] = None
    set.foreach { c =>
      quote match {
        case Some(q) =>
          cur += c
          if (c == q) quote = None
        case None => c match {
          case '\'' | '"' => quote = Some(c); cur += c
          case '(' => depth += 1; cur += c
          case ')' => depth -= 1; cur += c
          case ',' if depth == 0 => parts += cur.result(); cur.clear()
          case _ => cur += c
        }
      }
    }
    parts += cur.result()
    parts.toSeq.map { a =>
      a.split("=", 2) match {
        case Array(c, e) if c.trim.nonEmpty && e.trim.nonEmpty =>
          (c.trim, e.trim)
        case _ => throw new IllegalArgumentException(
          s"malformed SET assignment: '$a' (expected col = expr)")
      }
    }
  }

  def run(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    def metrics(op: String, v: Long, rows: Long, files: Long) =
      Seq((op, v, rows, files))
        .toDF("operation", "version", "rows_affected", "files_rewritten")
    sql match {
      case Delete(path, vectors, pred) if vectors != null =>
        val r = Maintenance.deleteWithVectors(spark, path, expr(pred))
        metrics("DELETE (vectors)", r.version, r.rowsDeleted, 0L)
      case Delete(path, _, pred) =>
        val r = Maintenance.deleteWhere(spark, path, expr(pred))
        metrics("DELETE", r.version, r.rowsDeleted, r.filesRewritten)
      case Update(path, set, pred) =>
        val assignments = splitSet(set).map { case (c, e) => c -> expr(e) }
        val r = Maintenance.updateWhere(spark, path, expr(pred),
          assignments.toMap)
        metrics("UPDATE", r.version, r.rowsUpdated, r.filesRewritten)
      case Merge(path, view, key) =>
        val r = Maintenance.mergeInto(spark, path, spark.table(view), key)
        metrics("MERGE", r.version, r.rowsUpdated + r.rowsInserted,
          r.filesRewritten)
      case OptimizeZorder(path, colsRaw, target) =>
        val cols = colsRaw.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val t = Option(target).map(_.toInt).getOrElse(math.max(2, cols.size))
        Maintenance.zorderN(spark, path, cols, t)
        metrics("OPTIMIZE ZORDER", Maintenance.readVersion(path), 0L,
          t.toLong)
      case Optimize(path, target) =>
        val t = Option(target).map(_.toInt).getOrElse(1)
        Maintenance.compact(spark, path, t)
        metrics("OPTIMIZE", Maintenance.readVersion(path), 0L, t.toLong)
      case History(path) =>
        Maintenance.history(spark, path)
      case Restore(path, version) =>
        val v = Maintenance.restoreTo(spark, path, version.toLong)
        metrics("RESTORE", v, 0L, 0L)
      // retention cutoff = asOfEpochMs − N hours, both INJECTED (the
      // engine's no-wall-clock convention: reproducible, testable)
      case Vacuum(path, hours, asOfMs) =>
        val n = Maintenance.vacuumRemoved(path,
          asOfMs.toLong - hours.toLong * 3600000L)
        metrics("VACUUM", Maintenance.readVersion(path), 0L, n.toLong)
      case ApplyVectors(path) =>
        val n = Maintenance.applyDeleteVectors(spark, path)
        metrics("APPLY VECTORS", Maintenance.readVersion(path), 0L, n.toLong)
      case CloneAsOf(dst, src, version) =>
        val v = Maintenance.shallowCloneAsOf(spark, src, dst,
          version.toLong)
        metrics("SHALLOW CLONE", v, 0L, 0L)
      case Clone(dst, src) =>
        val v = Maintenance.shallowClone(src, dst)
        metrics("SHALLOW CLONE", v, 0L, 0L)
      case RenameCol(path, from, to) =>
        Maintenance.renameColumn(path, from, to)
        metrics("RENAME COLUMN", Maintenance.readVersion(path), 0L, 0L)
      case DropCol(path, name) =>
        Maintenance.dropColumn(path, name)
        metrics("DROP COLUMN", Maintenance.readVersion(path), 0L, 0L)
      case _ => throw new IllegalArgumentException(
        "unrecognized graft statement (supported: DELETE FROM `path` " +
          "[USING VECTORS] WHERE …; UPDATE `path` SET … WHERE …; MERGE " +
          "INTO `path` USING view ON key; OPTIMIZE `path` [TO n FILES]; " +
          "RESTORE `path` TO VERSION n; VACUUM `path` RETAIN n HOURS AS " +
          s"OF epochMs; APPLY VECTORS `path`): $sql")
    }
  }
}
