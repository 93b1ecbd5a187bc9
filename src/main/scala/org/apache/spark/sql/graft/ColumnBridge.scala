package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-API bridge: Spark 4 removed `Column.expr` from the public
  * surface (columns wrap `ColumnNode`s for Connect parity), so rewriting
  * the attribute names inside a caller-supplied predicate requires the
  * `private[sql]` converter pair in `org.apache.spark.sql.classic`.
  * This is the ONLY file that lives inside Spark's package namespace,
  * and it exposes exactly one operation.
  */
object ColumnBridge {

  /** `c` with every single-part unresolved attribute renamed through
    * `map` (absent names unchanged). Used by the commit protocol to
    * translate LOGICAL column names in user predicates / SET expressions
    * to the PHYSICAL names stored in data files when a metadata-only
    * RENAME COLUMN mapping is in force.
    */
  def renameAttrs(c: Column, map: Map[String, String]): Column = {
    if (map.isEmpty) c
    else {
      // ExpressionUtils.expression defers: it wraps the ColumnNode in a
      // lazy leaf, so a catalyst transform would never see the
      // attributes. Convert EAGERLY first (the same converter analysis
      // itself uses), then rewrite the real expression tree.
      val eager =
        org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
      ExpressionUtils.column(eager.transform {
        case a: UnresolvedAttribute
            if a.nameParts.size == 1 && map.contains(a.name) =>
          UnresolvedAttribute(Seq(map(a.name)))
      })
    }
  }
}
