package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise mean of float vectors as a typed [[Aggregator]] — the
  * custom-UDAF extension surface (preference order per SURVEY.md §2:
  * codegen Expression > Aggregator > row-at-a-time udf; this is the
  * middle tier, for aggregation semantics no built-in composition
  * covers in one pass).
  *
  * The (sum vector, count) buffer merges associatively across
  * partitions — Spark runs it partial+final like any builtin
  * aggregate. Double sums are order-dependent in the last ulp, so this
  * operator is tolerance-tested (AggregatorSpec), not oracle-hashed;
  * the oracle-checked q39 uses the exact-decimal posexplode form
  * instead.
  */
class CentroidAggregator(dims: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.ofDim[Double](dims), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    // a short/null vector would silently bias the mean toward zero on
    // its missing components — reject malformed input loudly
    require(v != null && v.length == dims,
      s"expected $dims-dim vector, got ${if (v == null) "null" else v.length.toString}")
    val (sums, n) = b
    var i = 0
    while (i < dims) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dims) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object CentroidAggregator {
  /** Untyped Column form for use in groupBy().agg(...). */
  def centroid(dims: Int): Column => Column = {
    val fn = udaf(new CentroidAggregator(dims), ExpressionEncoder[Seq[Float]]())
    (c: Column) => fn(c)
  }
}
