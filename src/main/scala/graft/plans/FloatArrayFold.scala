package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Shared scaffold for the engine's binary array-fold kernels
  * ([[FloatVectorDot]], [[FloatDoubleSqDist]]): left-to-right double
  * accumulation over two arrays with null-element propagation, as one
  * primitive loop in both the interpreted eval and the generated code.
  * A concrete kernel supplies only the element types, the per-element
  * combine, and the length-mismatch policy — so the next kernel is a
  * few lines and a semantics fix lands in every kernel at once.
  *
  * Execution note: inside a higher-order-function lambda (e.g.
  * `transform`) Spark evaluates expressions interpreted
  * (CodegenFallback) — there the win over a nested HOF fold is one
  * flat `nullSafeEval` loop per call instead of per-element closure
  * dispatch; in a plain projection the `doGenCode` loop additionally
  * runs inside whole-stage codegen.
  */
abstract class FloatArrayFold extends BinaryExpression {

  /** Expected (left, right) element types, for the type check. */
  protected def leftElem: DataType
  protected def rightElem: DataType

  /** Combine one element pair into the accumulator (interpreted). */
  protected def combine(acc: Double, x: ArrayData, y: ArrayData, i: Int): Double

  /** Java source for the same combine: given array vars `a`,`b`, index
    * var `i` and accumulator var `s`, produce `s += ...;` statements. */
  protected def combineCode(a: String, b: String, i: String, s: String): String

  /** If true, arrays of different lengths yield NULL (the zip_with
    * null-pad convention); if false, the shorter bound wins. */
  protected def nullOnLengthMismatch: Boolean

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _)) if l == leftElem && r == rightElem =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<${leftElem.simpleString}>, array<${rightElem.simpleString}>), " +
          s"got ${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  // nullable even for non-null arrays: null ELEMENTS produce null
  override def nullable: Boolean = true

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    if (nullOnLengthMismatch && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s = combine(s, x, y, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val mismatch =
        if (nullOnLengthMismatch)
          s"if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; } else "
        else ""
      s"""
         |double $s = 0.0;
         |$mismatch{
         |  int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${combineCode(a, b, i, s)}
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}
