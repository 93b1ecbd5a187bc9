package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  Divide, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, Sqrt, ZipWith}
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
      // arity-checked shared builder — a 1-arg call must fail analysis
      // naming the function, not with an IndexOutOfBoundsException; the
      // same builder backs the imperative register path, which SHADOWS
      // this one whenever both ran in a session
      (exprs: Seq[Expression]) => CosineSimilarity.builder(exprs)))
    ext.injectOptimizerRule(_ => FuseCosineSimilarity)
    ext.injectOptimizerRule(_ => AutoRangeJoin)
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

  /** Matches the composed dot product and yields its two array inputs.
    * Strict: the zip lambda must be exactly `(p, q) -> p * q` over its own
    * two variables, the merge exactly `(acc, v) -> acc + v`, and the finish
    * the identity of its variable — a lambda that merely CONTAINS a
    * Multiply/Add (e.g. `p * p` or `acc + abs(v)`) must not be rewritten.
    */
  private object Dot {
    /** `(x, y) -> x OP y` where the operands are exactly the lambda's own
      * two variables, nothing else.
      */
    private def isPureBinOp(lf: LambdaFunction, wantMul: Boolean): Boolean = {
      if (lf.arguments.length != 2) return false
      val ids = lf.arguments.map(_.exprId).toSet
      val operands = lf.function match {
        case Multiply(l, r, _) if wantMul => Some((l, r))
        case Add(l, r, _) if !wantMul => Some((l, r))
        case _ => None
      }
      operands.exists {
        case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
          Set(lv.exprId, rv.exprId) == ids
        case _ => false
      }
    }

    private def isIdentity(lf: LambdaFunction): Boolean =
      lf.arguments.length == 1 && (lf.function match {
        case v: NamedLambdaVariable => v.exprId == lf.arguments.head.exprId
        case _ => false
      })

    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(azw: ZipWith, Literal(0.0, DoubleType),
          merge: LambdaFunction, finish: LambdaFunction) =>
        azw.function match {
          case mul: LambdaFunction if isPureBinOp(mul, wantMul = true) &&
              isPureBinOp(merge, wantMul = false) && isIdentity(finish) =>
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
