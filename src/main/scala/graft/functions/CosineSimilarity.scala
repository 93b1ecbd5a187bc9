package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two double
  * arrays — the custom-Expression tier of the build contract (preference
  * order (b): a codegen'd Expression beats composing
  * aggregate(zip_with(...)) three times, which materializes three lambda
  * evaluations per row and stays outside the fused loop).
  *
  * `doGenCode` emits a single fused Java loop (dot product + both norms in
  * one pass over the arrays), so the whole computation stays inside
  * whole-stage codegen. Summation is forward left-to-right — the same
  * order as the composed form and the DuckDB oracle's list_inner_product,
  * so results are bit-identical and the existing oracles hold.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def prettyName: String = "graft_cosine_sim"

  override def dataType: DataType = DoubleType

  // NULL semantics mirror the composed aggregate(zip_with(...)) form so the
  // FuseCosineSimilarity rewrite is value-preserving in ALL cases, not just
  // well-formed ones: unequal lengths → null (zip_with pads with null and
  // null poisons the sum), any null element → null. Hence nullable even for
  // non-null inputs.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      // per-element null checks only when the array type can hold nulls
      val mayHaveNulls =
        left.dataType.asInstanceOf[ArrayType].containsNull ||
          right.dataType.asInstanceOf[ArrayType].containsNull
      val nullElemCheck =
        if (mayHaveNulls)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / java.lang.Math.sqrt($na)
         |      / java.lang.Math.sqrt($nb);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val FnName = "graft_cosine_sim"

  /** Arity-checked builder shared by BOTH registration paths (the
    * extension injectFunction and the imperative temp-function register —
    * a temp function SHADOWS the injected one, so an unguarded builder
    * here would resurface IndexOutOfBoundsException on malformed SQL).
    */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> s"`$FnName`",
          "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    CosineSimilarity(exprs(0), exprs(1))
  }

  /** Register in the session's function registry (idempotent) and return a
    * Column-level handle. Registry + call_function is the public-API way to
    * surface a catalyst Expression as a Column in Spark 4.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, builder, "built-in")

  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(FnName, a, b)
  }
}
