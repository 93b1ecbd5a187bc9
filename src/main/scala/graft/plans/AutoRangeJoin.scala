package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  AttributeReference, Cast, EqualNullSafe, EqualTo, Explode, Expression,
  Floor, GreaterThanOrEqual, LessThan, Literal, PredicateHelper, Sequence}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, LongType,
  TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite a PURE range join — an inner join whose only
  * cross-side predicates are `point >= start AND point < end` over
  * timestamps — into the bucketed equi-join that
  * [[graft.operators.RangeJoin.pointInInterval]] builds by hand, so SQL
  * users who write the naive inequality join get the scalable plan for
  * free instead of a BroadcastNestedLoopJoin (quadratic once the interval
  * side outgrows broadcast).
  *
  * Shape produced (value-identical to the original join):
  *   - left gains `__graft_range_bucket = floor(secs(point)/W)`;
  *   - right explodes `sequence(floor(secs(start)/W), floor(secs(end)/W))`
  *     into one row per covered bucket;
  *   - the join becomes `bucketL = bucketR AND <original condition>` — a
  *     plain hash/merge equi-join; the exact predicate stays as the
  *     residual, so bucket-edge rows and NULL bounds behave exactly as
  *     before (a NULL bound produces no exploded rows, matching the
  *     original join where a NULL comparison never matches);
  *   - a final Project restores the original output, so parents are
  *     unaffected.
  *
  * Guards (the rule must never make a plan worse or loop):
  *   - fires only when NO cross-side equality conjunct exists — with an
  *     equi-key Spark already hash-joins and the range predicate is a
  *     fine residual there;
  *   - skips joins already carrying the marker bucket column (the rule
  *     runs inside the fixed-point operator-optimization batch);
  *   - timestamps only (epoch seconds fit a double exactly, so the
  *     bucket arithmetic matches the DataFrame operator bit-for-bit).
  *
  * Bucket width comes from `spark.graft.rangeJoin.bucketSec` (default 30
  * days) — any width is CORRECT (the residual decides membership); width
  * only tunes the interval-side expansion factor.
  */
object AutoRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val BucketName = "__graft_range_bucket"

  /** Validated bucket width. A malformed or non-positive user value must
    * not throw inside the optimizer (it would fail EVERY query touching a
    * matching join) and must not build a degenerate sequence — parse
    * defensively and return None so `apply` skips the rewrite (the naive
    * join is still correct, just slower) with a logged warning.
    */
  private def widthSec: Option[Long] = {
    val raw = conf.getConfString("spark.graft.rangeJoin.bucketSec", "2592000")
    raw.toLongOption.filter(_ > 0).orElse {
      logWarning(s"spark.graft.rangeJoin.bucketSec='$raw' is not a " +
        "positive integer; skipping the range-join rewrite for this plan")
      None
    }
  }

  /** Both wall-clock families qualify (testdata parquet surfaces
    * TIMESTAMP_NTZ; a tz-aware producer surfaces TIMESTAMP).
    */
  private def isTs(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  /** floor(epochSeconds / w) with the same double-division arithmetic as
    * the DataFrame operator (`floor(col.cast("timestamp").cast("long") /
    * lit(w))` — NTZ has no direct long cast, so route through
    * TimestampType exactly like RangeJoin.secs).
    */
  private def bucketOf(ts: Expression, w: Long): Expression = {
    // rule-built Casts never pass the analyzer, so the session zone must
    // be attached by hand (timestamp-family casts require it)
    val tz = Some(conf.sessionLocalTimeZone)
    Floor(Cast(Cast(Cast(ts, TimestampType, tz), LongType, tz),
      DoubleType, tz) / Literal(w.toDouble))
  }

  private def fromOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def crossSide(e: Expression, l: LogicalPlan,
      r: LogicalPlan): Boolean =
    e.references.intersect(l.outputSet).nonEmpty &&
      e.references.intersect(r.outputSet).nonEmpty

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.output.exists(_.name == BucketName) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => crossSide(a, left, right) ||
          (fromOnly(a, left) && fromOnly(b, right)) ||
          (fromOnly(a, right) && fromOnly(b, left))
        case EqualNullSafe(a, b) => crossSide(a, left, right) ||
          (fromOnly(a, left) && fromOnly(b, right)) ||
          (fromOnly(a, right) && fromOnly(b, left))
        case _ => false
      }
      // point >= start from one side pair, point < end with the SAME point
      val lower = conjuncts.collectFirst {
        case GreaterThanOrEqual(p, s)
            if isTs(p.dataType) && fromOnly(p, left) &&
              fromOnly(s, right) => (p, s)
      }
      val matched = lower.flatMap { case (p, s) =>
        conjuncts.collectFirst {
          case LessThan(p2, e)
              if p2.semanticEquals(p) && fromOnly(e, right) &&
                isTs(e.dataType) => (p, s, e)
        }
      }
      matched match {
        // bind the parsed width ONCE per matched join: re-evaluating the
        // conf getter in guard + body would parse twice and, on a
        // malformed value, fire the warning twice per match
        case Some((p, s, e)) if !hasEqui => widthSec match {
          case Some(w) =>
            val lb = Alias(bucketOf(p, w), BucketName)()
            val leftB = Project(left.output :+ lb, left)
            val rb = AttributeReference(BucketName, LongType,
              nullable = true)()
            // Sequence is TimeZoneAwareExpression: rule-built instances
            // must carry the session zone or the node stays unresolved
            val rightB = Generate(
              Explode(Sequence(bucketOf(s, w), bucketOf(e, w), None,
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(rb), child = right)
            val newJoin = Join(leftB, rightB, Inner,
              Some(And(EqualTo(lb.toAttribute, rb), cond)), hint)
            Project(j.output, newJoin)
          case None => j
        }
        case _ => j
      }
  }

  private implicit class DivOps(val l: Expression) {
    def /(r: Expression): Expression =
      org.apache.spark.sql.catalyst.expressions.Divide(l, r)
  }
}
