package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.plans.{FloatDoubleSqDist, FloatVectorDot}

/** Column-level vector math over `ArrayType(FloatType)` embeddings.
  *
  * The hot path (dot product, and norms as self-dot) is a custom
  * codegen'd Catalyst expression ([[FloatVectorDot]]); the
  * higher-order-function formulations are kept as `*Hof` for
  * differential testing (they fold in the same left-to-right double
  * order, so both paths are bit-identical — asserted in
  * VectorExprSpec). Elements are multiplied in DOUBLE: float
  * accumulation drifts in the last digit vs the DuckDB oracle
  * (SURVEY.md §2 q38 note) and would accumulate real error at scale.
  */
object Vectors {

  /** Codegen'd dot product of two float-array columns (double accum). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm = sqrt(self dot). */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Squared L2 distance between a float-array column and a
    * double-array centroid column ([[FloatDoubleSqDist]]). */
  def sqDist(v: Column, cent: Column): Column =
    ColumnBridge.column(FloatDoubleSqDist(
      ColumnBridge.expression(v), ColumnBridge.expression(cent)))

  /** Cosine similarity of two float-array columns (double precision). */
  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  // --- higher-order-function twins (differential-test surface) ---

  /** Sum of an array<double> column. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** HOF dot product — same fold order as [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** HOF L2 norm — same fold order as [[l2Norm]]. */
  def l2NormHof(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** HOF cosine — differential twin of [[cosineSimilarity]]. */
  def cosineSimilarityHof(a: Column, b: Column): Column =
    dotHof(a, b) / (l2NormHof(a) * l2NormHof(b))
}
