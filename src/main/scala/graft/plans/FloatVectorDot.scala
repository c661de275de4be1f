package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, FloatType}

/** Dot product of two float arrays, accumulated in double.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function
  * formulation on the vector hot path: one flat primitive loop per
  * call instead of per-element lambda dispatch, and a whole-stage
  * codegen loop in plain projections (see [[FloatArrayFold]]). The
  * accumulation order (left-to-right, double) is IDENTICAL to the HOF
  * fold, so results are bit-for-bit the same — verified by
  * VectorExprSpec against the HOF implementation and by the unchanged
  * DuckDB oracle parity of q38/q43/q44.
  *
  * Null semantics: a null ARRAY, any null ELEMENT, or length-mismatched
  * arrays yield null — the zip_with null-pad convention, and what
  * searchIvf's NULL-ranks-last contract relies on for malformed
  * embeddings.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends FloatArrayFold {

  override protected def leftElem: DataType = FloatType
  override protected def rightElem: DataType = FloatType
  override protected def nullOnLengthMismatch: Boolean = true
  override def prettyName: String = "float_vector_dot"

  override protected def combine(acc: Double, x: ArrayData, y: ArrayData, i: Int): Double =
    acc + x.getFloat(i).toDouble * y.getFloat(i).toDouble

  override protected def combineCode(a: String, b: String, i: String, s: String): String =
    s"$s += (double) $a.getFloat($i) * (double) $b.getFloat($i);"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}
