package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst cosine-similarity over two `array<double>` columns —
  * the hot-path scalar of the similarity-search suite (SURVEY §7.5 noted
  * zero custom Expressions are needed for *parity*; this one exists for
  * the beyond-parity ANN surface, where the composed
  * `aggregate(zip_with(...))` form allocates an intermediate array per
  * row and evaluates interpreted lambdas).
  *
  * Accumulates dot/norms left-to-right in doubles — bit-identical to the
  * composed form (and the DuckDB `list_reduce` oracle), so it can swap in
  * under oracle-checked queries. Codegen emits a single fused loop: no
  * intermediate arrays, stays inside whole-stage codegen.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val FUNC_NAME = "cosine_sim"

  /** Idempotent per-session registration (also done by [[GraftExtensions]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FUNC_NAME,
      { exprs =>
        require(exprs.length == 2, s"$FUNC_NAME takes 2 arguments")
        CosineSimilarity(exprs.head, exprs(1))
      },
      "scala_udf")

  /** Column API over the registered function. */
  def cosineNative(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(FUNC_NAME, a, b)
  }
}

/** SparkSessionExtensions hook — enables
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) to expose the engine's custom
  * functions to plain SQL sessions. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier(CosineSimilarity.FUNC_NAME),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimilarity].getName, CosineSimilarity.FUNC_NAME),
        (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier(TopKAggregate.FUNC_NAME),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[TopKAggregate].getName, TopKAggregate.FUNC_NAME),
        (exprs: Seq[Expression]) => TopKAggregate(exprs(0), exprs(1), exprs(2))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier(HeavyHittersAggregate.FUNC_NAME),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[HeavyHittersAggregate].getName, HeavyHittersAggregate.FUNC_NAME),
        (exprs: Seq[Expression]) => HeavyHittersAggregate(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => graft.plans.DimBroadcastRule)
  }
}
