package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.sources.Tables

/** The engine-specific sketch operators excluded from the DuckDB
  * hash-match contract (SURVEY.md §2 "known-excluded"): verified here
  * with tolerance against exact answers instead. Plus the multimodal
  * frame sampler's chunk arithmetic.
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).collect().head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("percentile_approx brackets the exact median of n_chars") {
    val d = Tables.load(spark, TestSpark.sf0001, "documents")
    val r = d.agg(
      percentile(col("n_chars"), lit(0.5)).as("exact"),
      percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("approx")).collect().head
    val (exact, approx) = (r.getDouble(0), r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("sampleFrames chunks deterministically: count and stride") {
    val docs = Seq((1L, "en", "x" * 1000, 1000L)).toDF("doc_id", "lang", "text", "n_chars")
    val frames = Multimodal.sampleFrames(Multimodal.ingest(docs), frameBytes = 100, everyN = 2)
      .collect().sortBy(_.frame_idx)
    // 1000 bytes -> 10 frames of 100 -> every 2nd -> indices 0,2,4,6,8
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.frame.length == 100))
  }
}
