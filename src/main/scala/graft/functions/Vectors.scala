package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ArrayType(FloatType)` embeddings.
  *
  * Built on Spark higher-order functions (`zip_with`, `aggregate`) so
  * everything stays inside Catalyst/codegen — no UDF serialization, no
  * Python round-trips, distributable over any partitioning. Elements
  * are cast to DOUBLE before multiplying: float accumulation drifts in
  * the last digit vs the DuckDB oracle (SURVEY.md §2 q38 note) and
  * would also accumulate real error at 100 TB scale.
  */
object Vectors {

  /** Sum of an array<double> column. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm, accumulated in double. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity of two float-array columns (double precision). */
  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
