package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Vectors
import graft.sources.Tables

/** The codegen'd FloatVectorDot must be bit-identical to the
  * higher-order-function fold it replaces — on real embeddings, for
  * dot, norm, and full cosine (including the null-array case).
  */
class VectorExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codegen dot == HOF dot, bit-for-bit, on all embedding pairs vs query") {
    val e = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("v"))
    val diff = e.crossJoin(qv)
      .select(Vectors.dot(col("embedding"), col("v")).as("a"),
              Vectors.dotHof(col("embedding"), col("v")).as("b"))
      .filter(!(col("a") <=> col("b"))) // null-safe exact comparison
      .count()
    assert(diff == 0)
  }

  test("codegen cosine == HOF cosine, bit-for-bit") {
    val e = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("v"))
    val diff = e.crossJoin(qv)
      .select(Vectors.cosineSimilarity(col("embedding"), col("v")).as("a"),
              Vectors.cosineSimilarityHof(col("embedding"), col("v")).as("b"))
      .filter(!(col("a") <=> col("b")))
      .count()
    assert(diff == 0)
  }

  test("null array yields null, interpreted and codegen paths agree") {
    val df = Seq((Some(Seq(1.0f, 2.0f)), None: Option[Seq[Float]]))
      .toDF("a", "b")
    val r = df.select(Vectors.dot(col("a"), col("b")).as("d")).collect().head
    assert(r.isNullAt(0))
  }

  test("null ELEMENT yields null in both codegen and HOF paths") {
    val df = Seq((Seq(Some(1.0f), None), Seq(Some(2.0f), Some(3.0f))))
      .toDF("a", "b")
    val r = df.select(Vectors.dot(col("a"), col("b")).as("d"),
                      Vectors.dotHof(col("a"), col("b")).as("h")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("known value: dot([1,2,3],[4,5,6]) = 32") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    assert(df.select(Vectors.dot(col("a"), col("b"))).collect().head.getDouble(0) == 32.0)
  }

  test("codegen sqDist == HOF sqDist, bit-for-bit, over real embeddings x centroids") {
    import graft.operators.AnnSearch
    val emb = graft.sources.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val cents = AnnSearch.centroids(emb, dims = 64)
    // compare every (vector, centroid) distance through both paths
    val both = emb.crossJoin(cents)
      .select(AnnSearch.sqDistHof(col("embedding"), col("cent")).as("h"),
        Vectors.sqDist(col("embedding"), col("cent")).as("c"))
    assert(both.filter(!(col("h") <=> col("c"))).count() == 0)
    assert(both.count() > 0)
  }

  test("sqDist known value and null element") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0d, 4.0d))).toDF("a", "b")
    assert(df.select(Vectors.sqDist(col("a"), col("b"))).collect().head.getDouble(0) == 8.0)
    val dfn = Seq((Seq(Some(1.0f), None), Seq(Some(3.0d), Some(4.0d)))).toDF("a", "b")
    assert(dfn.select(Vectors.sqDist(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("length-mismatched arrays yield NULL in dot and sqDist (malformed-vector guard)") {
    val d1 = Seq((Seq(1.0f, 2.0f), Seq(3.0f))).toDF("a", "b")
    assert(d1.select(Vectors.dot(col("a"), col("b"))).collect().head.isNullAt(0))
    val d2 = Seq((Seq(1.0f, 2.0f), Seq(3.0d))).toDF("a", "b")
    assert(d2.select(Vectors.sqDist(col("a"), col("b"))).collect().head.isNullAt(0))
  }
}
