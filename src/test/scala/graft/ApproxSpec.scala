package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal, Sketches}
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

  test("winsorizedStats (approx fences) tracks the exact q94 within tolerance") {
    // the 100 TB twin of the gated q94: percentile_approx fences
    // instead of the rank window; fences and winsorized mass must
    // agree with the exact interpolated form within sketch tolerance
    val exact = graft.queries.Queries.all("q94_winsorize")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(6))).toMap
    val approx = Sketches.winsorizedStats(
      Tables.load(spark, TestSpark.sf0001, "lineitem"),
      "l_returnflag", "l_extendedprice").collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { r =>
      val (elo, ehi, en, ewsum) = exact(r.getString(0))
      assert(r.getLong(3) == en, s"group size drifted for ${r.getString(0)}")
      // approx fences are data values near the rank, not interpolations
      assert(math.abs(r.getDouble(1) - elo) / elo < 0.02, s"lo: ${r.getDouble(1)} vs $elo")
      assert(math.abs(r.getDouble(2) - ehi) / ehi < 0.02, s"hi: ${r.getDouble(2)} vs $ehi")
      // clamped mass is dominated by the interior -> tighter bound
      assert(math.abs(r.getDouble(6) - ewsum) / ewsum < 0.005,
        s"wsum: ${r.getDouble(6)} vs $ewsum")
    }
  }

  test("dupSpanCoverage sampled report mode is exact on the sampled docs") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val full = Dedup.dupSpanCoverage(docs, n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sampled = Dedup.dupSpanCoverage(docs, n = 8, reportBound = Some("8"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sampled.nonEmpty, "bound '8' (~1/2) sampled no report docs")
    // per-doc coverage is EXACT for every sampled doc (the census is
    // always full-corpus), so the sample introduces no estimator bias
    sampled.foreach { case (id, c) => assert(full(id) == c, s"doc $id: $c vs ${full(id)}") }
    // and the sample is exactly the md5-addressed subset of the full report
    val expectIds = full.keySet.filter(id => {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      f"${h(0) & 0xff}%02x" < "80"
    })
    assert(sampled.keySet == expectIds)
  }

  test("sampleFrames chunks deterministically: count and stride") {
    val docs = Seq((1L, "en", "x" * 1000, 1000L)).toDF("doc_id", "lang", "text", "n_chars")
    val frames = Multimodal.sampleFrames(Multimodal.ingest(docs), frameBytes = 100, everyN = 2)
      .collect().sortBy(_.frame_idx)
    // 1000 bytes -> 10 frames of 100 -> every 2nd -> indices 0,2,4,6,8
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.frame.length == 100))
  }

  test("HLL sketch per group estimates distinct parts within 5%") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"))
    val est = graft.operators.Sketches.distinctSketch(li, Seq("l_returnflag"), col("l_partkey"))
    val joined = est.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, x) = (r.getAs[Long]("estimate").toDouble, r.getAs[Long]("exact").toDouble)
      assert(math.abs(e - x) / x < 0.05, s"${r.get(0)}: exact=$x est=$e")
    }
  }

  test("HLL merge: union of per-flag sketches equals a global rebuild's estimate") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val daily = graft.operators.Sketches.distinctSketch(li, Seq("l_returnflag"), col("l_partkey"))
      .withColumn("all", lit(1))
    // merged rollup answers the global question WITHOUT rescanning lineitem
    val merged = graft.operators.Sketches.mergeEstimate(daily, Seq("all"))
      .collect().head.getAs[Long]("estimate")
    val direct = graft.operators.Sketches.distinctSketch(li.withColumn("all", lit(1)), Seq("all"), col("l_partkey"))
      .collect().head.getAs[Long]("estimate")
    // HLL union of HLL sketches is lossless: identical estimate
    assert(merged == direct, s"merged=$merged direct=$direct")
  }

  test("approx quantiles bracket exact percentiles of o_totalprice") {
    val o = Tables.load(spark, TestSpark.sf0001, "orders").withColumn("g", lit(1))
    val approx = graft.operators.Sketches.approxQuantiles(
      o, Seq("g"), col("o_totalprice"), Seq(0.25, 0.5, 0.75))
      .collect().head.getAs[scala.collection.Seq[Double]]("quantiles")
    val exact = o.agg(percentile(col("o_totalprice"), array(lit(0.25), lit(0.5), lit(0.75))))
      .collect().head.getAs[scala.collection.Seq[Double]](0)
    approx.zip(exact).foreach { case (a, x) =>
      assert(math.abs(a - x) / x < 0.02, s"approx=$a exact=$x") }
  }
}
