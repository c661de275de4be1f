package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CentroidAggregator
import graft.sources.Tables

/** Custom typed Aggregator (UDAF tier): element-wise vector centroid,
  * tolerance-checked against the oracle-hashed q39 values. */
class AggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CentroidAggregator matches q39's exact-decimal centroids within 1e-6") {
    val centroid = CentroidAggregator.centroid(64)
    val agg = Tables.load(spark, TestSpark.sf0001, "embeddings")
      .groupBy("label")
      .agg(centroid(col("embedding")).as("cent"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val oracle = SparkEntry.queries("q39_vector_centroid")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // q39 covers dims 1..8 for every label
    oracle.foreach { case ((label, pos), expected) =>
      val actual = agg(label)(pos - 1)
      assert(math.abs(actual - expected) < 1e-6, s"label=$label pos=$pos $actual vs $expected")
    }
  }

  test("CentroidAggregator on an empty relation yields no rows") {
    val centroid = CentroidAggregator.centroid(4)
    import spark.implicits._
    val empty = Seq.empty[(Int, Seq[Float])].toDF("label", "embedding")
    assert(empty.groupBy("label").agg(centroid(col("embedding"))).count() == 0)
  }
}
