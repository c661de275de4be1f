package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd squared L2 distance between a float vector and a double
  * centroid, accumulated in double — the IVF assignment hot path
  * (|vectors| x |centroids| evaluations per pass).
  *
  * Same design as [[FloatVectorDot]]: the HOF
  * `aggregate(zip_with(...))` formulation is interpreted per element;
  * this compiles into whole-stage codegen as a primitive loop. The
  * accumulation order (left-to-right, (x - y)^2 in double) is
  * IDENTICAL to the HOF fold, so distances are bit-for-bit the same —
  * differential-tested in VectorExprSpec and pinned by q56's unchanged
  * oracle parity.
  *
  * Null semantics match the HOF twin on the fixed-width inputs the
  * engine uses: a null ARRAY or null ELEMENT yields null; on length
  * mismatch the shorter bound wins (zip_with would null-pad — callers
  * use fixed-width vectors).
  */
case class FloatDoubleSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  // nullable even for non-null arrays: null ELEMENTS produce null
  override def nullable: Boolean = true
  override def prettyName: String = "float_double_sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $d = (double) $a.getFloat($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatDoubleSqDist =
    copy(left = newLeft, right = newRight)
}
