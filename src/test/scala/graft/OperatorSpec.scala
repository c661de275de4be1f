package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal, Windows}

/** Per-operator unit tests on tiny in-memory data with hand-computed
  * expected results — independent of the parquet fixtures and the
  * DuckDB oracle.
  */
class OperatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("Windows.sessionize splits on gaps > 30min and numbers sessions per user") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:10:00"), 2L), // same session (10m gap)
      (1L, ts("2024-01-01 01:00:00"), 3L), // new session (50m gap)
      (2L, ts("2024-01-01 00:00:00"), 4L)  // other user -> own session
    ).toDF("user_id", "ts", "event_id")
    val out = Windows.sessionize(df, col("user_id"), col("ts"), col("event_id"), 1800000L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("Windows.asOfPrior finds the latest prior matching ts, not later ones") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "signup"),
      (1L, ts("2024-01-01 00:05:00"), 2L, "purchase"), // sees signup@00:00
      (1L, ts("2024-01-01 00:10:00"), 3L, "signup"),
      (1L, ts("2024-01-01 00:15:00"), 4L, "purchase"), // sees signup@00:10
      (2L, ts("2024-01-01 00:20:00"), 5L, "purchase")  // no signup -> null
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = df.withColumn("asof",
        Windows.asOfPrior(col("user_id"), col("ts"), col("event_id"), col("event_type") === "signup"))
      .filter(col("event_type") === "purchase")
      .select("event_id", "asof").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(2L).contains(ts("2024-01-01 00:00:00")))
    assert(out(4L).contains(ts("2024-01-01 00:10:00")))
    assert(out(5L).isEmpty)
  }

  test("Windows.topKPerGroup keeps exactly k rows per group, ranked") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 10)).toDF("g", "v")
    val out = Windows.topKPerGroup(df, 2, col("g"), col("v").desc)
      .select("g", "v", "rn").as[(String, Int, Int)].collect().toSet
    assert(out == Set(("a", 3, 1), ("a", 2, 2), ("b", 10, 1)))
  }

  test("Windows.prefixSum matches the single-window cumulative sum") {
    // 1000 distinct keys, values keyed off the order col so any bucket
    // mis-order or off-by-one offset shows up as a wrong running total
    val df = spark.range(1000)
      .selectExpr("id * 7 % 1000 AS v", "id % 13 + 1 AS c", "id % 3 AS g")
    val expectGlobal = df.orderBy("v").selectExpr("v",
        "SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum")
      .as[(Long, Long)].collect().toMap
    val gotGlobal = Windows.prefixSum(df, Nil, "v", "c", "cum", buckets = 16)
      .select("v", "cum").as[(Long, Long)].collect().toMap
    assert(gotGlobal == expectGlobal)
    // grouped + exclusive: per-group running total of strictly-lower v
    val dg = df.selectExpr("g", "v", "c").distinct()
    val expectGrp = dg.selectExpr("g", "v",
        "SUM(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum")
      .na.fill(0L, Seq("cum")).as[(Long, Long, Long)].collect().toSet
    val gotGrp = Windows.prefixSum(dg, Seq("g"), "v", "c", "cum",
        exclusive = true, buckets = 8)
      .select("g", "v", "cum").as[(Long, Long, Long)].collect().toSet
    assert(gotGrp == expectGrp)
    // degenerate domains: single distinct order value, single row
    val one = Seq((5L, 2L), (5L, 3L)).toDF("v", "c").groupBy("v")
      .agg(sum("c").as("c"))
    assert(Windows.prefixSum(one, Nil, "v", "c", "cum")
      .select("cum").as[Long].collect().toSeq == Seq(5L))
    // non-numeric order domain via orderNum (dates bucket by epoch day)
    val dts = Seq("2024-01-01", "2024-03-05", "2024-02-02")
      .toDF("ds").selectExpr("CAST(ds AS DATE) AS d", "1L AS c")
    val cums = Windows.prefixSum(dts, Nil, "d", "c", "cum",
        orderNum = Some(unix_date(col("d"))))
      .orderBy("d").select("cum").as[Long].collect().toSeq
    assert(cums == Seq(1L, 2L, 3L))
  }

  test("Windows.prefixSum raises loudly on NULL keys instead of dropping rows") {
    // the range join and offsets join are null-rejecting; the window
    // this replaces would have KEPT such rows — silent drop is the
    // contract violation the guard exists for
    val nullOrder = Seq((Some(1L), 1L), (None, 2L))
      .toDF("v", "c")
    val e1 = intercept[Exception] {
      Windows.prefixSum(nullOrder, Nil, "v", "c", "cum").collect()
    }
    assert(e1.getMessage.contains("prefixSum"), e1.getMessage)
    val nullPart = Seq((Some("a"), 1L, 1L), (None, 2L, 1L))
      .toDF("g", "v", "c")
    val e2 = intercept[Exception] {
      Windows.prefixSum(nullPart, Seq("g"), "v", "c", "cum").collect()
    }
    assert(e2.getMessage.contains("prefixSum"), e2.getMessage)
    // all-non-null keys are untouched by the guard
    val clean = Windows.prefixSum(
      Seq((1L, 1L), (2L, 1L)).toDF("v", "c"), Nil, "v", "c", "cum")
      .orderBy("v").select("cum").as[Long].collect().toSeq
    assert(clean == Seq(1L, 2L))
  }

  test("Dedup.shingles produces ordered 3-gram set, short docs dropped") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val out = Dedup.shingles(df).as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("Dedup.jaccardAllPairs computes exact set jaccard") {
    // doc1 = {s1,s2,s3}, doc2 = {s2,s3,s4}: J = 2/4 = 0.5
    val items = Seq((1L, "s1"), (1L, "s2"), (1L, "s3"),
                    (2L, "s2"), (2L, "s3"), (2L, "s4")).toDF("doc_id", "sh")
    val out = Dedup.jaccardAllPairs(items).as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 0.5)))
  }

  test("Dedup.simhashSignature: identical docs share signatures, bits are binary") {
    val toks = Seq((1L, "alpha"), (1L, "beta"), (2L, "alpha"), (2L, "beta"),
                   (3L, "gamma"), (3L, "delta")).toDF("doc_id", "tok")
    val sigs = Dedup.simhashSignature(toks, 16).as[(Long, String)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs.values.forall(s => s.length == 16 && s.forall(c => c == '0' || c == '1')))
  }

  test("Dedup.minhashSignature + lshCandidates pair up identical docs") {
    val items = Seq((1L, "s1"), (1L, "s2"), (2L, "s1"), (2L, "s2"), (3L, "zz"))
      .toDF("doc_id", "sh")
    val sig = Dedup.minhashSignature(items, 4)
    val cand = Dedup.lshCandidates(sig, Seq(Seq(1, 2), Seq(3, 4)))
      .as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L)))
  }

  test("minhashSignatureFromArrays is value-identical to the exploded form") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sf0001, "documents")
    for (k <- Seq(8, 3)) { // hex-window scheme and prefix fallback
      val exploded = Dedup.minhashSignature(Dedup.shingles(docs), k)
      val inline = Dedup.minhashSignatureFromArrays(Dedup.shingleArrays(docs), k)
      assert(exploded.exceptAll(inline).count() == 0 &&
        inline.exceptAll(exploded).count() == 0, s"k=$k signatures diverge")
    }
    // empty item arrays are dropped like groupless docs in the exploded form
    val withEmpty = Seq((1L, Seq("a", "b")), (2L, Seq.empty[String]))
      .toDF("doc_id", "shs")
    assert(Dedup.minhashSignatureFromArrays(withEmpty, 8).count() == 1)
  }

  test("signatureKey matches the batch signature; short texts get content keys") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sf0001, "documents")
    for (k <- Seq(8, 3)) { // hex-window scheme and prefix fallback
      val batch = Dedup.minhashSignatureFromArrays(Dedup.shingleArrays(docs), k)
        .select(col("doc_id"),
          concat_ws(":", (1 to k).map(i => col(s"h$i")): _*).as("sig"))
      val inRow = docs.select(col("doc_id"),
        Dedup.signatureKey(col("text"), k).as("sig"))
      // every doc long enough to have a signature agrees exactly
      assert(batch.join(inRow, Seq("doc_id", "sig"), "left_anti").count() == 0,
        s"k=$k in-row signature diverges from the batch form")
    }
    // same shingle SET from different text => same key (the near-dup
    // case); short texts fall back to distinct exact-content keys
    val keys = Seq((1L, "a b c d a b c d"), (2L, "b c d a b c d a"),
        (3L, "tiny one"), (4L, "tiny one"), (5L, "tiny two"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.signatureKey(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keys(1L) == keys(2L), "equal shingle sets must share the key")
    assert(keys(3L).startsWith("short:") && keys(3L) == keys(4L))
    assert(keys(4L) != keys(5L))
    // null text: the key is the literal "null:" — NEVER a null key
    // (md5 would null-propagate and a null-keyed dedup state row
    // would silently absorb distinct docs)
    val nullKey = Seq((6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(Dedup.signatureKey(col("text")).as("sig"))
      .collect().head.getString(0)
    assert(nullKey == "null:")
  }

  test("Dedup.connectedComponents merges transitive chains to the min id") {
    // chain 1-2-3, chain 10-20, isolated pair 30-40
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 20L), (30L, 40L)).toDF("i", "j")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 20L -> 10L,
      30L -> 30L, 40L -> 30L))
  }

  test("connectedComponents handles a long path (diameter > 2 iterations)") {
    val pairs = (1L to 9L).map(i => (i, i + 1)).toDF("i", "j")
    val cc = Dedup.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(cc.forall(_._2 == 1L) && cc.length == 10)
  }

  test("Dedup.containmentAllPairs: directional subset detection, hand-computed") {
    // doc 1 = {a, b}, doc 2 = {a, b, c, d}, doc 3 = {x}:
    // containment(1 in 2) = 2/2 = 1.0 (full quote), (2 in 1) = 2/4 = 0.5,
    // doc 3 shares nothing and never appears
    val items = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"), (2L, "c"), (2L, "d"),
      (3L, "x")).toDF("doc_id", "sh")
    val out = Dedup.containmentAllPairs(items)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out == Map(
      (1L, 2L) -> ((2L, 2L, 1.0)),
      (2L, 1L) -> ((2L, 4L, 0.5))))
    // the maxDf cap drops the shared items here (df("a") = df("b") = 2),
    // leaving no overlapping pairs at all
    assert(Dedup.containmentAllPairs(items, maxDf = 1).count() == 0)
  }

  test("Multimodal decode stub: features are deterministic byte facts") {
    val docs = Seq((1L, "en", "hello world", 11L)).toDF("doc_id", "lang", "text", "n_chars")
    val f = Multimodal.decodeFeatures(Multimodal.ingest(docs)).collect().head
    assert(f.byte_len == 11L)
    assert(f.content_hash == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(f.frames == 0L)
  }

  test("Multimodal real decode: ImageIO recovers synthesized PNG dims and channels") {
    // real PNG bytes in, real decoded facts out: the decoder must
    // recover each image's pixel dimensions FROM THE BYTES (the
    // metadata is only used at encode time) and see 3 RGB bands
    val docs = Seq(
      (1L, "en", "x", 13L),   // 13%64+1 = 14 x 13%48+1 = 14
      (2L, "de", "y", 100L),  // 100%64+1 = 37 x 100%48+1 = 5
      (3L, "fr", "z", 63L))   // 64 x 16
      .toDF("doc_id", "lang", "text", "n_chars")
    val feats = Multimodal.decodeImages(Multimodal.ingestImages(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.forall(f => f.ok && f.channels == 3))
    assert(feats.map(f => (f.width, f.height)).toSeq ==
      Seq((14, 14), (37, 5), (64, 16)))
    // decoded PIXEL facts, not metadata echoes: the mean sample value
    // of the synthesized pattern is nontrivial and must be stable
    assert(feats.forall(f => f.mean_luma > 0 && f.mean_luma < 255))
    val again = Multimodal.decodeImages(Multimodal.ingestImages(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.toSeq == again.toSeq)
  }

  test("Multimodal real decode: corrupt bytes surface as ok=false rows, not throws") {
    import org.apache.spark.sql.{Dataset, Encoders}
    val bad: Dataset[Multimodal.MediaRecord] = spark.createDataset(Seq(
      Multimodal.MediaRecord(7L, "en", Array[Byte](1, 2, 3, 4), 2, 2)))(
      Encoders.product[Multimodal.MediaRecord])
    val f = Multimodal.decodeImages(bad).collect().head
    assert(!f.ok && f.width == 0 && f.height == 0 && f.channels == 0)
  }

  test("Multimodal real audio decode: WAV facts recovered from the bytes") {
    // real RIFF/WAVE bytes in, real decoded facts out: rate, channels,
    // bit depth, and frame count must come from parsing the container
    // (the metadata slots are only used at encode time), and mean_abs
    // from the PCM samples themselves
    val docs = Seq(
      (1L, "en", "x", 13L),   // ch = 1%2+1 = 2, frames = 13%200+50 = 63
      (2L, "de", "y", 250L),  // ch = 1,       frames = 250%200+50 = 100
      (3L, "fr", "z", 199L))  // ch = 2,       frames = 249
      .toDF("doc_id", "lang", "text", "n_chars")
    val feats = Multimodal.decodeAudio(Multimodal.ingestAudio(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.forall(f => f.ok && f.sample_rate == 8000 && f.bits == 16))
    assert(feats.map(f => (f.channels, f.n_frames)).toSeq ==
      Seq((2, 63L), (1, 100L), (2, 249L)))
    // decoded SAMPLE facts: the synthesized waveform spans the 16-bit
    // range, so its mean magnitude is nontrivial and must be stable
    assert(feats.forall(f => f.mean_abs > 0 && f.mean_abs < 32768))
    val again = Multimodal.decodeAudio(Multimodal.ingestAudio(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.toSeq == again.toSeq)
  }

  test("Multimodal real video decode: GIF frame count and dims from the bytes") {
    // real multi-frame GIF bytes in, real decoded facts out: the frame
    // COUNT must come from parsing the container (n_chars % 7 + 2
    // frames at encode time), dims from the decoded pixels
    val docs = Seq(
      (1L, "en", "x", 13L),   // side = 13%24+4 = 17, frames = 13%7+2 = 8
      (2L, "de", "y", 100L),  // side = 100%24+4 = 8, frames = 100%7+2 = 4
      (3L, "fr", "z", 27L))   // side = 7,             frames = 8
      .toDF("doc_id", "lang", "text", "n_chars")
    val feats = Multimodal.decodeVideos(Multimodal.ingestVideos(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.forall(_.ok))
    assert(feats.map(f => (f.n_frames, f.width, f.height)).toSeq ==
      Seq((8, 17, 17), (4, 8, 8), (8, 7, 7)))
    assert(feats.forall(f => f.mean_luma_f0 > 0 && f.mean_luma_f0 < 255))
    val again = Multimodal.decodeVideos(Multimodal.ingestVideos(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.toSeq == again.toSeq)
  }

  test("Multimodal extractFrames decodes every Nth frame as valid PNG") {
    val docs = Seq((7L, "en", "x", 27L)).toDF("doc_id", "lang", "text", "n_chars") // 8 frames
    val media = Multimodal.ingestVideos(docs)
    val frames = Multimodal.extractFrames(media, everyN = 3).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 3, 6))
    assert(frames.forall(f => f.width == 7 && f.height == 7))
    // the emitted PNGs are themselves decodable by the image tier
    import org.apache.spark.sql.{Dataset, Encoders}
    val asImages: Dataset[Multimodal.MediaRecord] = spark.createDataset(
      frames.toSeq.map(f => Multimodal.MediaRecord(f.doc_id, "en", f.png, f.width, f.height)))(
      Encoders.product[Multimodal.MediaRecord])
    val decoded = Multimodal.decodeImages(asImages).collect()
    // truecolor hand-off: 3 color bands, and the mean is LUMINANCE
    // (for the grayscale pattern, a raw palette-index mean would be
    // an unrelated quantizer artifact)
    assert(decoded.forall(d => d.ok && d.width == 7 && d.height == 7 && d.channels == 3))
    assert(decoded.forall(d => d.mean_luma > 0 && d.mean_luma < 255))
    // distinct frames: the pattern varies by frame index (a constant
    // shift mod 256 can leave the integer MEAN unchanged, so compare
    // content hashes, not means)
    val hashes = Multimodal.decodeFeatures(asImages).collect().map(_.content_hash).distinct
    assert(hashes.length == 3, "sampled frames must have distinct pixel content")
  }

  test("Multimodal real video decode: corrupt bytes are ok=false rows") {
    import org.apache.spark.sql.{Dataset, Encoders}
    val bad: Dataset[Multimodal.MediaRecord] = spark.createDataset(Seq(
      Multimodal.MediaRecord(9L, "en", Array[Byte](71, 73, 70, 56), 1, 1)))(
      Encoders.product[Multimodal.MediaRecord]) // truncated "GIF8" header
    val f = Multimodal.decodeVideos(bad).collect().head
    assert(!f.ok && f.n_frames == 0 && f.width == 0)
    assert(Multimodal.extractFrames(bad, 1).collect().isEmpty)
  }

  test("Multimodal real audio decode: corrupt bytes are ok=false rows") {
    import org.apache.spark.sql.{Dataset, Encoders}
    val bad: Dataset[Multimodal.MediaRecord] = spark.createDataset(Seq(
      Multimodal.MediaRecord(9L, "en", Array[Byte](82, 73, 70, 70, 0), 1, 1)))(
      Encoders.product[Multimodal.MediaRecord]) // truncated "RIFF" header
    val f = Multimodal.decodeAudio(bad).collect().head
    assert(!f.ok && f.sample_rate == 0 && f.channels == 0 && f.n_frames == 0L)
  }
}
