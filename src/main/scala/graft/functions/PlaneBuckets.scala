package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native sign-bucket computation for multi-table hyperplane LSH — the
  * hot scalar of the ANN/semantic-dedup family. For each hash table t,
  * bucket(t) = fold over its planes of (b*2 + (dot(plane, v) >= 0)),
  * with each dot accumulated LEFT-TO-RIGHT — bit-identical to the
  * composed `aggregate(zip_with(...))` form and to the DuckDB oracle's
  * ordered folds, so it can swap in under oracle-checked queries.
  *
  * Why an Expression and not the HOF composition: Catalyst evaluates
  * higher-order-function lambdas interpretively per element, and a
  * tables × planes × dims bucket computation is (16·8·64) lambda
  * dispatches per row; this expression is three tight loops over a
  * plane matrix referenced once from the generated code (measured ~2x
  * end-to-end on the semantic-dedup query at sf0.1, where the HOF form
  * dominated the profile). */
case class PlaneBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "plane_buckets"

  /** A vector whose length differs from the planes' dimensionality
    * returns NULL — the same semantics as the `zip_with`/`aggregate`
    * composition this expression replaced (and DuckDB's `list_zip`), so
    * a malformed vector stays loud instead of silently bucketing on a
    * prefix. */
  private val expectedDims: Int =
    if (planes.nonEmpty && planes(0).nonEmpty) planes(0)(0).length else -1

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (expectedDims >= 0 && n != expectedDims) return null
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val tp = planes(t)
      var b = 0L
      var i = 0
      while (i < tp.length) {
        val p = tp(i)
        var dot = 0.0
        var d = 0
        while (d < p.length) { dot += p(d) * v.getDouble(d); d += 1 }
        b = b * 2 + (if (dot >= 0) 1L else 0L)
        i += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][][]")
    val arrCls = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val b = ctx.freshName("b")
      val dot = ctx.freshName("dot")
      val p = ctx.freshName("p")
      s"""
        if ($expectedDims >= 0 && $v.numElements() != $expectedDims) {
          ${ev.isNull} = true;
        } else {
          long[] $out = new long[$planesRef.length];
          for (int $t = 0; $t < $planesRef.length; $t++) {
            double[][] tp = $planesRef[$t];
            long $b = 0L;
            for (int $i = 0; $i < tp.length; $i++) {
              double[] $p = tp[$i];
              double $dot = 0.0;
              for (int $d = 0; $d < $p.length; $d++) {
                $dot += $p[$d] * $v.getDouble($d);
              }
              $b = $b * 2 + ($dot >= 0 ? 1L : 0L);
            }
            $out[$t] = $b;
          }
          ${ev.value} = new $arrCls($out);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PlaneBuckets {

  /** Column API. The plane matrix is not an Expression, so the builder
    * registers a session temp function whose name keys the matrix
    * identity (same registry mechanism as [[CosineSimilarity]]) and the
    * closure captures the matrix itself. */
  def buckets(spark: SparkSession, v: Column,
      planes: Seq[Seq[Seq[Double]]]): Column = {
    val mat = planes.map(_.map(_.toArray).toArray).toArray
    // name keys the matrix identity: shape explicitly, contents by both
    // a deep hash AND a first-element bit pattern — a bare 32-bit hash
    // collision would silently bind a query to the wrong planes
    val head = if (mat.nonEmpty && mat(0).nonEmpty && mat(0)(0).nonEmpty)
      java.lang.Double.doubleToLongBits(mat(0)(0)(0)).toHexString else "e"
    val name = s"plane_buckets_${mat.length}_" +
      s"${if (mat.nonEmpty) mat(0).length else 0}_${head}_" +
      java.util.Arrays.deepHashCode(mat.asInstanceOf[Array[AnyRef]]).toHexString
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      { exprs =>
        require(exprs.length == 1, s"$name takes 1 argument")
        PlaneBuckets(exprs.head, mat)
      },
      "scala_udf")
    org.apache.spark.sql.functions.call_function(name, v)
  }
}
