package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Vectors
import graft.operators.Dedup

/** ScalaCheck properties for the operator library on generated data —
  * invariants that must hold for ANY input, not just the fixtures.
  * (Driven through Spark on small generated DataFrames; generator
  * sizes kept tiny so each property runs in seconds.)
  */
class CheckPropsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  private def check(name: String)(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  test("jaccard is symmetric-in-structure, bounded, and 1.0 for identical docs") {
    val genDoc = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e")).map(_.distinct)
    check("jaccard")(Prop.forAll(genDoc, genDoc) { (d1, d2) =>
      val items = (d1.map((1L, _)) ++ d2.map((2L, _)) ++ d1.map((3L, _))).toDF("doc_id", "sh")
      val jc = Dedup.jaccardAllPairs(items).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val bounded = jc.values.forall(v => v >= 0.0 && v <= 1.0)
      // doc 3 is a copy of doc 1 -> jaccard exactly 1.0
      val dupExact = jc.get((1L, 3L)).forall(_ == 1.0) && jc.contains((1L, 3L))
      bounded && dupExact
    })
  }

  test("cosine(v, k*v) == 1 for positive scale; |cosine| <= 1 for any pair") {
    val genVec = Gen.listOfN(8, Gen.choose(-100, 100).map(_ / 10.0f))
      .suchThat(v => v.exists(_ != 0.0f))
    check("cosine")(Prop.forAll(genVec, genVec.suchThat(v => v.exists(_ != 0.0f)),
        Gen.choose(1, 5)) { (a, b, k) =>
      val df = Seq((a, a.map(_ * k), b)).toDF("a", "ka", "b")
      val r = df.select(
        Vectors.cosineSimilarity(col("a"), col("ka")),
        Vectors.cosineSimilarity(col("a"), col("b"))).collect().head
      math.abs(r.getDouble(0) - 1.0) < 1e-9 && math.abs(r.getDouble(1)) <= 1.0 + 1e-12
    })
  }

  test("dedupCorpus: planted exact duplicates never both survive; unique docs always do") {
    val genDoc = Gen.listOfN(12, Gen.oneOf("ax", "bx", "cx", "dx", "ex", "fx", "gx"))
      .map(_.mkString(" "))
    check("dedup-exact")(Prop.forAll(Gen.listOfN(4, genDoc).suchThat(_.toSet.size == 4)) { texts =>
      // docs 1..4 unique, doc 5 duplicates doc 1 exactly
      val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) } :+ (5L, texts.head)
      val kept = graft.operators.Dedup.dedupCorpus(docs.toDF("doc_id", "text"), threshold = 0.95)
        .select("doc_id").as[Long].collect().toSet
      // the duplicate pair (1,5) collapsed to 1; every unique doc that
      // forms no cluster with others must survive
      !kept.contains(5L) && kept.contains(1L)
    })
  }

  test("biting maxDf cap matches the oracle's capped semantics exactly") {
    // The q42-family oracles model the cap as a df CTE + semi join;
    // this pins that Spark's capHotItems computes the SAME capped
    // Jaccard when the cap actually bites (maxDf=2 on sf0.001 —
    // expected values precomputed with the oracle's capped SQL in
    // DuckDB 1.0.0: 20 pairs at jc >= 0.2, including the two spot
    // pairs below). The graded cap (1000) is a no-op on the fixtures;
    // without this case, cap parity would be untested until a fixture
    // regeneration made it bite in production.
    import org.apache.spark.sql.functions._
    val sh = graft.operators.Dedup.shingles(
      graft.sources.Tables.load(spark, TestSpark.sf0001, "documents"))
    val pairs = graft.operators.Dedup.jaccardAllPairs(sh, maxDf = 2)
      .filter(col("jc") >= 0.2)
      .collect().map(r => (r.getLong(r.fieldIndex("i")), r.getLong(r.fieldIndex("j")),
        r.getDouble(r.fieldIndex("jc"))))
    assert(pairs.length == 20, s"expected 20 capped pairs, got ${pairs.length}")
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(math.abs(m((5L, 450L)) - 0.941176471) < 1e-6)
    assert(m((45L, 487L)) == 1.0)
  }

  test("WAV roundtrip recovers rate/channels/frames for any small shape") {
    // pure-JVM property (no Spark plan): encodeWav -> decodeAudioPartition
    // must recover the container facts from the bytes for ANY shape,
    // and the 1-frame/1-channel case has a closed-form mean_abs
    import graft.operators.Multimodal
    val genShape = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      ch <- Gen.choose(1, 4)
      frames <- Gen.choose(1, 300)
      seed <- Gen.choose(0L, 100000L)
    } yield (rate, ch, frames, seed)
    check("wav-roundtrip")(Prop.forAll(genShape) { case (rate, ch, frames, seed) =>
      val rec = Multimodal.MediaRecord(seed, "en",
        Multimodal.encodeWav(rate, ch, frames, seed), ch, frames)
      val f = Multimodal.decodeAudioPartition(Iterator(rec)).next()
      f.ok && f.sample_rate == rate && f.channels == ch &&
        f.bits == 16 && f.n_frames == frames.toLong
    })
    // closed form: frame 0, channel 0 carries ((seed%251)*977 % 65536) - 32768
    val seed = 42L
    val one = Multimodal.decodeAudioPartition(Iterator(Multimodal.MediaRecord(
      seed, "en", Multimodal.encodeWav(8000, 1, 1, seed), 1, 1))).next()
    val expected = math.abs((seed % 251L) * 977L % 65536L - 32768L)
    assert(one.mean_abs == expected.toDouble)
  }

  test("simhash of a doc equals simhash of the same doc with tokens duplicated x2") {
    // SimHash votes scale linearly with term frequency; doubling every
    // count never flips a bit's sign.
    val genToks = Gen.nonEmptyListOf(Gen.identifier.map(_.take(6))).map(_.take(10))
    check("simhash-scale")(Prop.forAll(genToks) { toks =>
      val single = toks.map((1L, _))
      val doubled = (toks ++ toks).map((2L, _))
      val sigs = Dedup.simhashSignature((single ++ doubled).toDF("doc_id", "tok"), 16)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      sigs(1L) == sigs(2L)
    })
  }
}
