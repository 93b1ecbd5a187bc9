package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations on ingest — the engine analogue of Delta Live
  * Tables' `expect` / `expect_or_drop` / `expect_or_fail` (the reference's
  * lakehouse stack gets the same gate from DLT; its own ingest trusts the
  * exchange feed and has no explicit quality tier, so this is the
  * beyond-reference hardening a 100-TB pipeline needs).
  *
  * Semantics:
  *   - [[Warn]]  — violating rows are KEPT, only counted;
  *   - [[Drop]]  — violating rows leave the kept set and land in the
  *                 quarantine, tagged with every drop-rule they failed;
  *   - [[Fail]]  — any violation aborts the batch with an error naming the
  *                 rule and its count (the job-level circuit breaker).
  *
  * A predicate evaluating to NULL counts as a VIOLATION: three-valued
  * logic must not let unknowns sneak past a quality gate (the same
  * coalesce-to-false convention as [[Maintenance.deleteRange]]'s keep
  * predicate, in the opposite direction).
  *
  * Scale shape: every predicate is evaluated as a codegen'd boolean
  * column; violation counts come from ONE map-side-partial aggregate over
  * a single scan, and the kept/quarantine splits are plain filters —
  * pushdown-friendly, no windows, no driver-side row handling. At 100 TB
  * the stats job is a cheap pre-pass and each split scans once where its
  * consumer writes.
  */
object Expectations {

  sealed trait Action { def name: String }
  case object Warn extends Action { val name = "warn" }
  case object Drop extends Action { val name = "drop" }
  case object Fail extends Action { val name = "fail" }

  case class Rule(name: String, predicate: Column, action: Action)

  /** Violation count of one rule over the checked batch. */
  case class RuleStat(rule: String, action: String, violations: Long)

  /** Outcome: the kept rows, the quarantined rows (with a
    * `_failed_rules` array naming every drop-rule each row failed — the
    * audit trail an operator replays), per-rule stats, and row totals.
    */
  case class Result(kept: DataFrame, quarantined: DataFrame,
      stats: Seq[RuleStat], rowsTotal: Long, rowsKept: Long)

  /** Check `df` against `rules`. Runs one aggregate job for the stats
    * (needed eagerly to enforce [[Fail]] rules); `kept`/`quarantined`
    * stay lazy.
    */
  def check(df: DataFrame, rules: Seq[Rule]): Result = {
    require(rules.nonEmpty, "no expectation rules given")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_.name)}")
    val ok: Map[String, Column] =
      rules.map(r => r.name -> coalesce(r.predicate, lit(false))).toMap
    val aggs = count(lit(1)).as("__n") +: rules.map(r =>
      sum(when(!ok(r.name), 1L).otherwise(0L)).as(s"__v_${r.name}"))
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val total = row.getLong(0)
    val stats = rules.zipWithIndex.map { case (r, i) =>
      RuleStat(r.name, r.action.name, row.getLong(i + 1))
    }
    stats.find(s => s.action == Fail.name && s.violations > 0).foreach { s =>
      throw new IllegalStateException(
        s"expectation '${s.rule}' failed for ${s.violations} of $total " +
          "rows — batch aborted (expect_or_fail)")
    }
    val dropRules = rules.filter(_.action == Drop)
    val keepPred = dropRules.map(r => ok(r.name)).reduceOption(_ && _)
      .getOrElse(lit(true))
    val kept = df.filter(keepPred)
    val failedList = array_compact(array(dropRules.map(r =>
      when(!ok(r.name), lit(r.name))): _*))
    val quarantined = df.filter(!keepPred)
      .withColumn("_failed_rules", failedList)
    val dropped = stats.collect {
      case s if s.action == Drop.name => s.violations
    }
    // rowsKept without a second job: total − |union of drop violations| is
    // not derivable from per-rule counts (rows can fail several rules), so
    // only compute it exactly when some drop rule fired
    val rowsKept =
      if (dropped.forall(_ == 0L)) total else kept.count()
    Result(kept, quarantined, stats, total, rowsKept)
  }
}
