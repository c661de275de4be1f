package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Sampling}
import graft.sources.Tables

/** Invariants of the corpus-curation operators (q66-q69 wave). */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = Tables.load(spark, TestSpark.sf0001, "documents")

  test("deterministicSplit partitions every row exactly once, stably") {
    val s = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> "c", "val" -> "e"), "test")
    assert(s.count() == docs.count())
    val byName = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet.subsetOf(Set("train", "val", "test")))
    // expectation 75%; md5 is uniform enough that 500 docs stay well
    // inside [55%, 90%]
    val trainFrac = byName.getOrElse("train", 0L).toDouble / docs.count()
    assert(trainFrac > 0.55 && trainFrac < 0.90, s"train fraction $trainFrac")
    // determinism: recomputing yields the identical assignment
    val again = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> "c", "val" -> "e"), "test")
    assert(s.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).count() == 0)
  }

  test("deterministicSplit rejects out-of-order bounds") {
    intercept[IllegalArgumentException] {
      Sampling.deterministicSplit(docs, "doc_id", Seq("a" -> "e", "b" -> "c"), "z")
    }
  }

  test("hex-bound validation rejects non-ASCII Unicode digits") {
    // '٣' (U+0663) passes Char.isDigit but compares ABOVE every md5
    // hex char, so it would silently route 100% of rows into its
    // split — the loud-misassignment contract requires rejection
    intercept[IllegalArgumentException] {
      Sampling.deterministicSplit(docs, "doc_id", Seq("train" -> "٣"), "test")
    }
    intercept[IllegalArgumentException] {
      Sampling.rateSample(docs, "doc_id", "lang", Seq("en" -> "٣٣٣٣٣٣٣٣"), "7fffffff")
    }
  }

  test("minhash signature builders reject k = 0 loudly") {
    import org.apache.spark.sql.functions._
    val items = docs.select(col("doc_id"), lit("tok").as("sh"))
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.minhashSignature(items, 0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.minhashSignatureFromArrays(
        docs.select(col("doc_id"), array(lit("a")).as("shs")), 0)
    }
  }

  test("stratifiedTake returns at most k per stratum, ranked 1..k") {
    val t = Sampling.stratifiedTake(docs, "lang", 3, "doc_id")
    val perLang = t.groupBy("lang").agg(count(lit(1)).as("n"), max("rn").as("m")).collect()
    perLang.foreach { r =>
      assert(r.getLong(1) <= 3)
      assert(r.getInt(2) == r.getLong(1)) // ranks are 1..n, dense
    }
    // sample membership is stable across evaluations
    val again = Sampling.stratifiedTake(docs, "lang", 3, "doc_id")
    assert(t.select("doc_id").exceptAll(again.select("doc_id")).count() == 0)
  }

  test("contaminatedDocs finds planted leaks and only train ids") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated training text with other words here"),
      (3L, "short doc")).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "quick brown fox jumps over the moon tonight")).toDF("doc_id", "text")
    val hits = Dedup.contaminatedDocs(train, eval_, n = 5)
      .as[Long].collect().sorted
    // doc 1 shares the 5-gram "quick brown fox jumps over"; doc 2 none;
    // doc 3 is too short to shingle
    assert(hits.toSeq == Seq(1L))
  }

  test("q68 mixing weights are ppm shares that sum to ~1e6") {
    val w = SparkEntry.queries("q68_mixing_weights")(spark, TestSpark.sf0001)
      .agg(sum("weight_ppm")).collect()(0).getLong(0)
    // integer DIV floors each share, so the sum is within n_sources of 1e6
    assert(w <= 1000000L && w > 1000000L - 40L, s"ppm sum $w")
  }
}
