package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AnnSearch, Dedup}
import graft.sources.Tables

/** User-facing pipeline operators: corpus dedup end-to-end, and the
  * ANN correctness property (approximate results are dominated by the
  * exact brute-force ranking).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dedupCorpus removes every verified near-dup and nothing else") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val cleaned = Dedup.dedupCorpus(docs, threshold = 0.7).localCheckpoint()
    val sh = Dedup.shingles(docs)
    val verified = Dedup.jaccardVerify(
      Dedup.lshCandidates(Dedup.minhashSignature(sh, 8), Seq(Seq(1, 2, 3, 4), Seq(5, 6, 7, 8))), sh)
      .filter(col("jc") >= 0.7)
    val nLosers = verified.select("j").distinct().count()
    assert(cleaned.count() == docs.count() - nLosers)
    // no surviving pair is still a verified duplicate
    val surviving = cleaned.select(col("doc_id"))
    val leftover = verified
      .join(surviving.withColumnRenamed("doc_id", "i"), "i")
      .join(surviving.withColumnRenamed("doc_id", "j"), "j")
      .count()
    assert(leftover == 0L)
  }

  test("explicit dedup: two identical docs collapse to the smaller id") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (20L, "the quick brown fox jumps over the lazy dog today"), // exact dup
      (30L, "completely different words forming another document body here"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(docs, threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 30L))
  }

  test("ANN results are dominated by the exact brute-force ranking") {
    val e = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("v"))
    def top(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.getDouble(0)).toSeq
    val brute = top(e.crossJoin(qv).filter(col("vec_id") =!= 0)
      .select(round(graft.functions.Vectors.cosineSimilarity(col("embedding"), col("v")), 6).as("c"))
      .orderBy(col("c").desc).limit(5))
    val lsh = top(SparkEntry.queries("q44_ann_lsh")(spark, TestSpark.sf0001).select("cos_sim"))
    val ivf = top(SparkEntry.queries("q56_ann_ivf")(spark, TestSpark.sf0001).select("cos_sim"))
    // element-wise: approximate k-th best can never beat exact k-th best
    lsh.zip(brute).foreach { case (a, b) => assert(a <= b + 1e-9, s"lsh $a > brute $b") }
    ivf.zip(brute).foreach { case (a, b) => assert(a <= b + 1e-9, s"ivf $a > brute $b") }
    // and both searched a real bucket (non-empty results)
    assert(lsh.nonEmpty && ivf.nonEmpty)
  }
}
