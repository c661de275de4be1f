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

  test("dedupCorpus keeps exactly one representative per duplicate cluster") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val cleaned = Dedup.dedupCorpus(docs, threshold = 0.7).localCheckpoint()
    val sh = Dedup.shingles(docs)
    val pairs = Dedup.jaccardVerify(
      Dedup.lshCandidates(Dedup.minhashSignature(sh, 8), Seq(Seq(1, 2, 3, 4), Seq(5, 6, 7, 8))), sh)
      .filter(col("jc") >= 0.7).select("i", "j")
    val comps = Dedup.connectedComponents(pairs)
    val nLosers = comps.filter(col("doc") =!= col("root")).count()
    assert(cleaned.count() == docs.count() - nLosers)
    // every cluster's root survives, every non-root is gone
    val surviving = cleaned.select(col("doc_id")).as[Long].collect().toSet
    comps.collect().foreach { r =>
      val (doc, root) = (r.getLong(0), r.getLong(1))
      assert(surviving.contains(doc) == (doc == root), s"doc=$doc root=$root")
    }
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

  test("a duplicate cluster of three collapses to one representative") {
    // a 3-doc cluster (identical content -> all bands fire) keeps min only
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, base), (2L, base), (3L, base),
      (9L, "completely different words forming another document body here"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(docs, threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 9L))
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

  test("assignBuckets: empty centroid table yields empty output, not a crash") {
    val e = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val none = AnnSearch.centroids(e.filter(col("label") === -1), dims = 64)
    assert(AnnSearch.assignBuckets(e, none).isEmpty)
  }

  test("assignBuckets: NaN distances lose to every real distance (ordering, not IEEE <)") {
    import spark.implicits._
    // centroid c1 at the vector itself (d=0); c0 has a NaN coordinate,
    // so its squared distance is NaN — under IEEE `<` a NaN first
    // element would win every comparison, under ordering it sorts last
    val emb = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val cents = Seq(("c0", Array(Double.NaN, 0.0)),
      ("c1", Array(1.0, 2.0))).toDF("clabel", "cent")
    val got = AnnSearch.assignBuckets(emb, cents).select("bucket").as[String].collect()
    assert(got.toSeq == Seq("c1"), s"NaN distance must sort last, got ${got.toSeq}")
  }
}
