package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pq

/** Product quantization: codebook shape, deterministic encoding,
  * ADC search recall on a genuinely clustered corpus, and
  * reconstruction fidelity. Same synthetic 8-cluster fixture shape as
  * AnnProbeSpec (spiked dims + deterministic jitter — true neighbors
  * are the vector's own cluster). */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val DIMS = 16
  private val M = 4 // 4 subspaces of width 4
  private lazy val clustered = spark.range(2000L)
    .select(col("id").as("vec_id"),
      expr(s"""transform(sequence(1, $DIMS), d ->
        CAST(CASE WHEN d = id % 8 + 1 OR d = id % 8 + 9 THEN 5.0 ELSE 0.0 END
             + (pmod(id * 37 + d * 101, 97) / 97.0) * 0.2 - 0.1 AS FLOAT))""")
        .as("embedding"))
    .localCheckpoint()

  private lazy val codebook =
    Pq.train(clustered, DIMS, m = M, k = 8, iters = 3).localCheckpoint()
  private lazy val codes =
    Pq.encode(clustered, codebook, DIMS, M).localCheckpoint()

  test("codebook has m*k entries of subspace width; codes are m ids per vector") {
    assert(codebook.count() == M * 8L)
    assert(codebook.filter(size(col("cent")) =!= DIMS / M).count() == 0)
    assert(codes.count() == 2000L)
    assert(codes.filter(size(col("codes")) =!= M).count() == 0)
    // every code id is a trained label (1..k)
    val bad = codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 1 || col("c") > 8).count()
    assert(bad == 0)
  }

  test("grouped training is bit-identical to per-subspace training, both inits") {
    // the grouped single-Lloyd-loop train must reproduce m independent
    // kmeansCentroids runs EXACTLY — codebooks feed a hash-gated
    // contract query (q101), so "close" is not enough
    for (init <- Seq("md5", "farthest")) {
      val grouped = Pq.train(clustered, DIMS, m = M, k = 4, iters = 2,
        init = init)
      val seq = Pq.trainPerSubspace(clustered, DIMS, m = M, k = 4, iters = 2,
        init = init)
      val diff = grouped.withColumnRenamed("cent", "gc")
        .join(seq, Seq("sub", "clabel"), "full_outer")
        .filter(col("gc").isNull || col("cent").isNull || col("gc") =!= col("cent"))
      assert(diff.count() == 0, s"init=$init codebooks diverge")
    }
  }

  test("encoding is deterministic under repartitioning") {
    val again = Pq.encode(clustered.repartition(13), codebook, DIMS, M)
    assert(codes.join(again.withColumnRenamed("codes", "codes2"), "vec_id")
      .filter(col("codes") =!= col("codes2")).count() == 0)
  }

  test("ADC search retrieves the query's own cluster") {
    // query = base vector 0 (cluster 0): its true neighbors are the
    // 250 vectors with vec_id % 8 == 0
    val query = clustered.filter(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    val top = Pq.search(codes, codebook, query, DIMS, M, n = 10).collect()
    assert(top.length == 10)
    // the query vector itself must rank first (ties by id can't beat
    // adc_dist ordering on a tight cluster)
    assert(top.head.getLong(0) == 0L)
    val sameCluster = top.count(_.getLong(0) % 8 == 0)
    assert(sameCluster >= 9, s"recall@10 too low: $sameCluster/10 from cluster 0")
  }

  test("reconstruction lands nearer the original than any other cluster") {
    val approx = Pq.decode(codes, codebook, M).filter(col("vec_id") === 0)
      .select("approx").collect().head.getSeq[Double](0)
    val orig = clustered.filter(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0).map(_.toDouble)
    val other = clustered.filter(col("vec_id") === 1) // cluster 1
      .select("embedding").collect().head.getSeq[Float](0).map(_.toDouble)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(approx.length == DIMS)
    assert(d2(approx, orig) < d2(approx, other),
      "quantized vector must stay closer to its original than to another cluster")
    // tight quantization on this fixture: per-dim RMS error well under
    // the 5.0 spike magnitude
    assert(math.sqrt(d2(approx, orig) / DIMS) < 1.0)
  }

  test("IVF-PQ composition: ADC restricted to the probed coarse bucket") {
    // the standard IVF-PQ layout from the two operators directly:
    // coarse-quantize the corpus, then ADC-search only the query's
    // coarse bucket — candidate count drops ~8x, recall holds
    import graft.operators.AnnSearch
    val coarse = AnnSearch.kmeansCentroids(clustered, DIMS, k = 8, iters = 3)
      .localCheckpoint()
    val bucketed = AnnSearch.assignBuckets(clustered, coarse).localCheckpoint()
    val qRow = bucketed.filter(col("vec_id") === 0)
      .select("embedding", "bucket").collect().head
    val query = qRow.getSeq[Float](0).toArray
    val qBucket = qRow.getInt(1)
    val candidates = bucketed.filter(col("bucket") === qBucket).select("vec_id")
    // a correct coarse quantizer puts ~1/8 of the corpus in the bucket
    val nCand = candidates.count()
    assert(nCand < 2000 / 4, s"coarse bucket should prune hard, kept $nCand")
    val top = Pq.search(codes.join(candidates, Seq("vec_id"), "left_semi"),
      codebook, query, DIMS, M, n = 10).collect()
    assert(top.head.getLong(0) == 0L)
    assert(top.count(_.getLong(0) % 8 == 0) >= 9,
      "in-bucket ADC must keep same-cluster recall")
  }

  test("residual IVF-PQ: encode residuals, search with the query's residual") {
    import graft.operators.AnnSearch
    val coarse = AnnSearch.kmeansCentroids(clustered, DIMS, k = 8, iters = 3)
      .localCheckpoint()
    val res = Pq.residuals(clustered, coarse).localCheckpoint()
    // residuals of a good coarse quantizer are near zero: their mean
    // magnitude must be far below the raw spike magnitude (5.0)
    val meanAbs = res.select(explode(col("embedding")).as("v"))
      .agg(avg(abs(col("v")))).collect().head.getDouble(0)
    assert(meanAbs < 0.5, s"residual mean |v| should be jitter-scale, got $meanAbs")
    val rBook = Pq.train(res, DIMS, m = M, k = 8, iters = 3).localCheckpoint()
    val rCodes = Pq.encode(res, rBook, DIMS, M).localCheckpoint()
    // query = vector 0's residual within its own bucket
    val q0 = res.filter(col("vec_id") === 0)
      .select("embedding", "bucket").collect().head
    val candidates = res.filter(col("bucket") === q0.getInt(1)).select("vec_id")
    val top = Pq.search(rCodes.join(candidates, Seq("vec_id"), "left_semi"),
      rBook, q0.getSeq[Float](0).toArray, DIMS, M, n = 10).collect()
    assert(top.head.getLong(0) == 0L)
    assert(top.count(_.getLong(0) % 8 == 0) >= 9,
      "residual ADC must keep same-cluster recall")
  }

  test("encoding is total and in-range for arbitrary vectors, NaN included") {
    // degenerate payloads (NaN dims, extreme magnitudes) must still
    // produce a full, in-range, deterministic code — NaN distances
    // order greatest in the argmin struct, ties fall to the lowest
    // label, so no input can yield a null/missing code
    import spark.implicits._
    val weird = Seq(
      (9001L, Array(Float.NaN, Float.NaN, Float.NaN, Float.NaN,
        Float.NaN, Float.NaN, Float.NaN, Float.NaN,
        Float.NaN, Float.NaN, Float.NaN, Float.NaN,
        Float.NaN, Float.NaN, Float.NaN, Float.NaN)),
      (9002L, Array.fill(16)(Float.MaxValue)),
      (9003L, Array.fill(16)(-1e30f)),
      (9004L, Array.fill(16)(0f)))
      .toDF("vec_id", "embedding")
    val c = Pq.encode(weird, codebook, DIMS, M).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(c.size == 4)
    c.values.foreach { cs =>
      assert(cs.length == M && cs.forall(x => x >= 1 && x <= 8), cs)
    }
    // all-NaN distances tie everywhere -> every subspace falls to the
    // lowest label, deterministically
    assert(c(9001L).forall(_ == 1))
    val again = Pq.encode(weird.repartition(3), codebook, DIMS, M).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(c == again)
  }

  test("shape guards are loud") {
    intercept[IllegalArgumentException] { Pq.train(clustered, DIMS, m = 5, k = 4) }
    intercept[IllegalArgumentException] {
      Pq.search(codes, codebook, Array.fill(3)(0f), DIMS, M, n = 5)
    }
    intercept[IllegalArgumentException] {
      Pq.encode(clustered.withColumn("codes", lit(1)), codebook, DIMS, M)
    }
  }

  /** Root-cause message of a distributed failure (the raise_error text
    * arrives wrapped in SparkException layers). */
  private def rootMsg(t: Throwable): String = {
    var c: Throwable = t
    val sb = new StringBuilder
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }

  test("ragged or null embeddings fail loudly in encode and train, naming the vector") {
    import spark.implicits._
    val ragged = Seq((1L, Array(1f, 2f, 3f)), (2L, Array.fill(DIMS)(0f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[Throwable] { Pq.encode(ragged, codebook, DIMS, M).collect() }
    assert(rootMsg(e1).contains("width 3, expected 16"), rootMsg(e1))
    val e2 = intercept[Throwable] { Pq.train(ragged, DIMS, m = M, k = 2, iters = 1).collect() }
    assert(rootMsg(e2).contains("expected 16"), rootMsg(e2))
    val withNull = Seq((7L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val e3 = intercept[Throwable] { Pq.encode(withNull, codebook, DIMS, M).collect() }
    assert(rootMsg(e3).contains("width null"), rootMsg(e3))
  }

  test("codebook/codes mismatch fails loudly instead of corrupting ranks") {
    val query = Array.fill(DIMS)(0f)
    // drop one trained code id: an inner join would silently under-sum
    // adc_dist for every vector carrying it
    val truncated = codebook.filter(!(col("sub") === 0 && col("clabel") === 1))
    val e1 = intercept[Throwable] {
      Pq.search(codes, truncated, query, DIMS, M, n = 5).collect()
    }
    assert(rootMsg(e1).contains("no codebook entry for (sub=0, code=1)"), rootMsg(e1))
    val e2 = intercept[Throwable] { Pq.decode(codes, truncated, M).collect() }
    assert(rootMsg(e2).contains("no codebook entry"), rootMsg(e2))
    // codebook trained with a different m: encode must refuse, not
    // emit short code arrays
    val mBig = Pq.train(clustered, DIMS, m = 8, k = 2, iters = 1)
      .filter(col("sub") < 2) // pretend it was m=2
    val e3 = intercept[Throwable] {
      Pq.encode(clustered.limit(5), mBig, DIMS, M).collect()
    }
    assert(rootMsg(e3).contains("no entries for sub="), rootMsg(e3))
    // codes encoded with a SMALLER m: every (sub, code) lookup would
    // still hit the codebook, silently under-summing adc_dist /
    // truncating the decode — both must refuse up front
    val shortCodes = codes.withColumn("codes", slice(col("codes"), 1, 1))
    val e4 = intercept[Throwable] {
      Pq.search(shortCodes, codebook, query, DIMS, M, n = 5).collect()
    }
    assert(rootMsg(e4).contains(s"expected m=$M"), rootMsg(e4))
    val e5 = intercept[Throwable] {
      Pq.decode(shortCodes, codebook, M).collect()
    }
    assert(rootMsg(e5).contains(s"expected m=$M"), rootMsg(e5))
  }
}
