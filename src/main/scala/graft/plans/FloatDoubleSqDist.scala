package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Squared L2 distance between a float vector and a double centroid,
  * accumulated in double — the IVF assignment hot path
  * (|vectors| x |centroids| evaluations per pass). One flat primitive
  * loop replacing the nested interpreted `aggregate(zip_with(...))`
  * fold (see [[FloatArrayFold]] for where codegen applies); the
  * accumulation order is IDENTICAL to the HOF fold, so distances are
  * bit-for-bit the same — differential-tested in VectorExprSpec and
  * pinned by q56's unchanged oracle parity.
  *
  * Length-mismatched arrays yield NULL — the engine's convention for
  * malformed embeddings (zip_with null-pads, and searchIvf ranks NULL
  * last), so a truncated vector can never be assigned a
  * plausible-looking bucket from a partial sum.
  */
case class FloatDoubleSqDist(left: Expression, right: Expression)
    extends FloatArrayFold {

  override protected def leftElem: DataType = FloatType
  override protected def rightElem: DataType = DoubleType
  override protected def nullOnLengthMismatch: Boolean = true
  override def prettyName: String = "float_double_sq_dist"

  override protected def combine(acc: Double, x: ArrayData, y: ArrayData, i: Int): Double = {
    val d = x.getFloat(i).toDouble - y.getDouble(i)
    acc + d * d
  }

  override protected def combineCode(a: String, b: String, i: String, s: String): String =
    s"""double d$s = (double) $a.getFloat($i) - $b.getDouble($i);
       |    $s += d$s * d$s;""".stripMargin

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatDoubleSqDist =
    copy(left = newLeft, right = newRight)
}
