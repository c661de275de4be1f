package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Rank-space bucket id for Z-order layout builds: the count of
  * pre-computed sorted quantile boundaries `<=` the input value — an
  * upper-bound binary search over a driver-computed boundary array, so
  * the per-column rank normalization that previously needed a global
  * single-partition `percent_rank` window is a pure per-row projection
  * (see [[graft.sources.Tables.zorder]]). The boundary array rides
  * along as a codegen reference object, NOT a source literal — 2^bits
  * doubles inlined as Java source would blow past JIT-able method
  * sizes.
  *
  * Ordering matches the window it replaces (ascending sort): NULL
  * ranks first (bucket 0) and NaN ranks last (top bucket). Duplicate
  * boundaries (heavy skew) are fine — upper-bound search maps the
  * repeated value past all of them, deterministically.
  */
case class QuantileBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  // total: null input maps to bucket 0, never to null
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_bucket"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else QuantileBucket.bucket(boundaries, v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bounds = ctx.addReferenceObj("quantileBounds", boundaries, "double[]")
    val c = child.genCode(ctx)
    val v = ctx.freshName("qbv")
    val lo = ctx.freshName("qblo")
    val hi = ctx.freshName("qbhi")
    val m = ctx.freshName("qbm")
    ev.copy(code =
      code"""
        |${c.code}
        |long ${ev.value} = 0L;
        |if (!${c.isNull}) {
        |  double $v = ${c.value};
        |  if (java.lang.Double.isNaN($v)) {
        |    ${ev.value} = (long) $bounds.length;
        |  } else {
        |    int $lo = 0; int $hi = $bounds.length;
        |    while ($lo < $hi) {
        |      int $m = ($lo + $hi) >>> 1;
        |      if ($bounds[$m] <= $v) { $lo = $m + 1; } else { $hi = $m; }
        |    }
        |    ${ev.value} = (long) $lo;
        |  }
        |}
      """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileBucket =
    copy(child = newChild)
}

object QuantileBucket {
  /** Upper-bound rank: number of boundaries `<= v`. NaN maps past all
    * boundaries (Spark sorts NaN greatest). Shared by the interpreted
    * eval and unit tests; codegen inlines the identical loop. */
  def bucket(bounds: Array[Double], v: Double): Long = {
    if (java.lang.Double.isNaN(v)) return bounds.length.toLong
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (bounds(m) <= v) lo = m + 1 else hi = m
    }
    lo.toLong
  }
}
