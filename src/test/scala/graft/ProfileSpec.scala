package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profile
import graft.sources.Tables

/** Profile operator: one-pass column summaries. */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("profile reports exact counts, nulls, and min/max per column") {
    import spark.implicits._
    val df = Seq(
      (1, Some("a"), 1.5), (2, Some("b"), -0.5),
      (3, None, 2.0), (4, Some("a"), 0.0)
    ).toDF("id", "s", "v")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))     // null excluded from distinct
    assert(p("v") == ((4L, 0L, 4L, "-0.5", "2.0")))
  }

  test("profile of a catalog table matches direct aggregates") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val p = Profile.profile(docs, Seq("lang")).collect()(0)
    val expect = docs.agg(countDistinct(col("lang"))).collect()(0).getLong(0)
    assert(p.getLong(3) == expect)
    assert(p.getLong(1) == docs.count())
  }

  test("approximate mode stays within tolerance") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val exact = Profile.profile(docs, Seq("doc_id")).collect()(0).getLong(3)
    val approx = Profile.profile(docs, Seq("doc_id"), exact = false).collect()(0).getLong(3)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("empty input profiles as zero counts, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Int, String)].toDF("id", "s")
    val p = Profile.profile(empty).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p("id") == ((0L, 0L, 0L)) && p("s") == ((0L, 0L, 0L)))
  }

  test("map columns are skipped by default, rejected when explicit") {
    import spark.implicits._
    val df = Seq((1, Map("a" -> 1))).toDF("id", "m")
    assert(Profile.profile(df).collect().map(_.getString(0)).toSeq == Seq("id"))
    intercept[IllegalArgumentException] { Profile.profile(df, Seq("m")) }
  }

  test("unknown columns are rejected") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    intercept[IllegalArgumentException] { Profile.profile(docs, Seq("nope")) }
  }
}
