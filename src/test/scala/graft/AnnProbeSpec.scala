package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AnnSearch
import graft.functions.Vectors
import graft.sources.Tables

/** IVF nprobe semantics: probing more buckets monotonically recovers
  * the exact brute-force answer. */
class AnnProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
  private lazy val cents = AnnSearch.centroids(emb, dims = 64)
  private val K = 10

  /** Exact cosine top-K ids per query id, brute force. */
  private def bruteTopK(queryIds: Seq[Long]): Map[Long, Seq[Long]] = {
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (Vectors.dot(col("qemb"), col("embedding")) /
          (Vectors.l2Norm(col("qemb")) * Vectors.l2Norm(col("embedding")))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= K)
      .collect().groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
  }

  private def ivfTopK(queryIds: Seq[Long], nprobe: Int): Map[Long, Seq[Long]] = {
    val base = AnnSearch.assignBuckets(emb, cents)
    val q = AnnSearch.probeBuckets(
      emb.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        .withColumnRenamed("qemb", "embedding"), cents, nprobe)
      .withColumnRenamed("embedding", "qemb")
    AnnSearch.searchIvf(base, q, K + 1) // +1: the query matches itself at cos=1
      .filter(col("qid") =!= col("vec_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.sortBy(_.getInt(3)).map(_.getLong(1)).take(K).toSeq }
  }

  private val queryIds = Seq(1L, 7L, 42L, 99L, 123L)

  test("probeBuckets element 1 equals assignBuckets' bucket") {
    val a = AnnSearch.assignBuckets(emb, cents).select(col("vec_id"), col("bucket"))
    val p = AnnSearch.probeBuckets(emb, cents, nprobe = 3)
      .select(col("vec_id"), element_at(col("buckets"), 1).as("bucket"))
    assert(a.exceptAll(p).count() == 0)
  }

  test("nprobe = #centroids recovers the exact brute-force top-k") {
    val n = cents.count().toInt
    assert(ivfTopK(queryIds, n) == bruteTopK(queryIds))
  }

  test("recall is monotone in nprobe") {
    val exact = bruteTopK(queryIds)
    def recall(res: Map[Long, Seq[Long]]): Double =
      queryIds.map(q => res.getOrElse(q, Nil).toSet.intersect(exact(q).toSet).size).sum.toDouble /
        (K * queryIds.size)
    val r1 = recall(ivfTopK(queryIds, 1))
    val r3 = recall(ivfTopK(queryIds, 3))
    assert(r1 <= r3 + 1e-9, s"recall@1=$r1 > recall@3=$r3")
    // these synthetic embeddings are ~N(0, 0.1) noise, so cluster
    // structure is weak and absolute recall is inherently modest
    // (measured: recall@1≈0.35, recall@3≈0.48 on sf0.001) — the floor
    // guards against a broken probe path, not a quality target
    assert(r3 > 0.3, s"recall@3=$r3 unexpectedly low")
  }
}
