package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  Divide, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply,
  Sqrt, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.CosineSimilarity

/** The engine's `SparkSessionExtensions` installer — the documented seam
  * for shipping catalyst extensions to users without touching internal
  * session state (enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions`):
  *
  *   - registers `graft_cosine_sim` as a session function, so plain SQL
  *     resolves it with no imperative register call;
  *   - injects [[FuseCosineSimilarity]], an optimizer rule that rewrites
  *     the composed `aggregate(zip_with(..))/sqrt(..)/sqrt(..)` cosine
  *     pattern into the single-pass codegen'd [[CosineSimilarity]]
  *     expression — SQL/DataFrame users who write the three-aggregate form
  *     get the fused loop for free.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier(CosineSimilarity.FnName),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName,
        CosineSimilarity.FnName),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => FuseCosineSimilarity)
  }
}

/** Rewrite `dot(a,b)/sqrt(dot(a,a))/sqrt(dot(b,b))` — where dot is the
  * composed `aggregate(zip_with(x, y, *), 0.0, +)` — into the native
  * [[CosineSimilarity]] expression. Value-preserving: both forms sum
  * forward left-to-right (bit-identical, asserted in PropertySpec), so
  * oracles are unaffected; the fused form evaluates one loop instead of
  * three interpreted lambda aggregates per row.
  */
object FuseCosineSimilarity extends Rule[LogicalPlan] {

  /** Matches the composed dot product and yields its two array inputs. */
  private object Dot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(azw: ZipWith, Literal(0.0, DoubleType),
          merge: LambdaFunction, _: LambdaFunction) =>
        (azw.function, merge.function) match {
          case (mul: LambdaFunction, _: Add)
              if mul.function.isInstanceOf[Multiply] =>
            Some((azw.left, azw.right))
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(Divide(Dot(a1, b1), Sqrt(Dot(a2, a3)), _),
          Sqrt(Dot(b2, b3)), _)
          if a1.semanticEquals(a2) && a2.semanticEquals(a3) &&
            b1.semanticEquals(b2) && b2.semanticEquals(b3) =>
        CosineSimilarity(a1, b1)
    }
}
