package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Windows

/** Order-of-magnitude smoke: the core operator shapes on 5-10M
  * generated rows (50-100x the sf0.1 bench tables) in local mode —
  * evidence the plans don't degenerate (driver collects, quadratic
  * blowups) when the data is two orders bigger than the fixtures.
  * Assertions are on exact results (closed-form ground truth), not
  * timing.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("10M-row partial+final aggregate with exact closed-form check") {
    val n = 10_000_000L
    val agg = spark.range(n)
      .select((col("id") % 1000).as("k"), col("id").as("v"))
      .groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .agg(sum("s").as("total"), sum("c").as("rows"), count(lit(1)).as("groups"))
      .collect().head
    assert(agg.getLong(0) == n * (n - 1) / 2)
    assert(agg.getLong(1) == n && agg.getLong(2) == 1000L)
  }

  test("5M-row window (sessionize shape) stays per-key linear") {
    // 50k users x 100 events; every 10th event starts a new session
    // (gap 10x the threshold) -> exactly 10 sessions per user.
    val df = spark.range(5_000_000L)
      .select((col("id") % 50000).as("user_id"),
        expr("timestamp_micros((id DIV 50000) * 60000000 + " +
          "((id DIV 50000) DIV 10) * 700000000)").as("ts"),
        col("id").as("event_id"))
    val sessions = Windows.sessionize(df, col("user_id"), col("ts"), col("event_id"), 600000L)
      .groupBy("user_id").agg(countDistinct(col("session_id")).as("n"))
      .groupBy("n").count().collect()
    assert(sessions.length == 1 && sessions.head.getLong(0) == 10L
      && sessions.head.getLong(1) == 50000L)
  }

  test("5M x broadcast join keeps exact row counts") {
    val big = spark.range(5_000_000L).select((col("id") % 100).as("k"), col("id").as("v"))
    val dim = spark.range(100L).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    val out = big.join(broadcast(dim), "k")
    assert(out.count() == 5_000_000L)
    assert(out.filter(col("name") === "d7").count() == 50_000L)
  }

  test("100k-doc dedupCorpus: candidates scale with dup density, clusters exact") {
    // 100k docs in 20k template groups of 5 ids each (id % 20000).
    // 20000 % 5 == 0, so all five ids of a template share id % 5:
    // 16k templates (k%5<4) are 5 exact copies -> one representative
    // each; 4k templates (k%5==4) are 5 UNrelated singles -> all kept.
    // EVERY token embeds the template (or doc) id, so no shingle is
    // shared across groups — the hot-shingle trap a shared prefix
    // would create (one shingle in 80k docs => a quadratic LSH bucket)
    // is deliberately absent, mirroring real post-normalization
    // shingling. Copies have identical signatures and must pair;
    // singles never.
    val tpl = col("id") % 20000
    def tok(c: org.apache.spark.sql.Column, s: String) = concat(lit(" "), c, lit(s))
    val docs = spark.range(100_000L)
      .select(col("id").as("doc_id"),
        when(col("id") % 5 < 4,
          concat(tpl, lit("a"), tok(tpl, "b"), tok(tpl, "c"), tok(tpl, "d"),
            tok(tpl, "e"), tok(tpl, "f")))
          .otherwise(
            concat(col("id"), lit("u"), tok(col("id"), "v"), tok(col("id"), "w"),
              tok(col("id"), "x"), tok(col("id"), "y"), tok(col("id"), "z")))
          .as("text"))
    val kept = graft.operators.Dedup.dedupCorpus(docs, threshold = 0.9)
    // 16k cliques -> 16k representatives; 4k x 5 singles all survive
    assert(kept.count() == 36_000L)
  }

  test("hot-shingle maxDf cap bounds jaccardAllPairs at 10k-doc df") {
    // One boilerplate shingle appears in ALL 10k docs — uncapped, the
    // self-join would push 10k^2/2 ≈ 50M rows through one reducer (the
    // q42 hazard). With maxDf = 100 the hot item is dropped before the
    // join and only the real per-pair overlap survives: docs (2k, 2k+1)
    // share exactly "u<k>", every doc keeps one private item, so the
    // capped sets are {u<k>, p<id>} and every paired jc is exactly
    // |{u}| / |{u, p_i, p_j}| = 1/3.
    val ids = spark.range(10_000L).select(col("id").as("doc_id"))
    val items = ids.select(col("doc_id"), lit("HOT").as("sh"))
      .union(ids.select(col("doc_id"), concat(lit("u"), expr("doc_id DIV 2")).as("sh")))
      .union(ids.select(col("doc_id"), concat(lit("p"), col("doc_id")).as("sh")))
    val out = graft.operators.Dedup.jaccardAllPairs(items, maxDf = 100)
      .localCheckpoint()
    assert(out.count() == 5000L)
    assert(out.filter(abs(col("jc") - 1.0 / 3) < 1e-12).count() == 5000L)
  }

  test("1M-vector kmeans trains on the md5 sample and partitions the corpus") {
    // 1M vectors in 8 planted clusters (dim c+1 spiked for cluster c),
    // 8 dims, deterministic jitter. Train on the "1"-bound sample
    // (1/16 ≈ 62k vectors) — the corpus itself is never paired or
    // collected; per round the sample crossJoins one broadcast
    // centroid row. farthest-first init: with md5 (pseudo-random)
    // seeding, one-centroid-per-cluster would only hold with
    // probability 8!/8^8 ≈ 0.2% — farthest-first traversal makes it a
    // THEOREM for well-separated clusters, so the assertion below is
    // exact, not statistical.
    val vecs = spark.range(1_000_000L)
      .select(col("id").as("vec_id"),
        expr("""transform(sequence(1, 8), d ->
          CAST(CASE WHEN d = id % 8 + 1 THEN 4.0 ELSE 0.0 END
               + (pmod(id * 13 + d * 7, 89) / 89.0) * 0.2 - 0.1 AS FLOAT))""")
          .as("embedding"))
    val cents = graft.operators.AnnSearch.kmeansCentroids(
      vecs, dims = 8, k = 8, iters = 3, sampleBound = Some("1"), init = "farthest")
    val centRows = cents.collect()
    assert(centRows.length == 8)
    // each centroid's dominant dim identifies its planted cluster;
    // all 8 clusters must be captured exactly once
    val spikes = centRows.map(_.getSeq[Double](1).zipWithIndex.maxBy(_._1)._2).sorted
    assert(spikes.toSeq == (0 until 8), s"captured spike dims: ${spikes.toSeq}")
    val buckets = graft.operators.AnnSearch.assignBuckets(vecs, cents)
      .groupBy("bucket").count().collect()
    assert(buckets.length == 8 && buckets.map(_.getLong(1)).sum == 1_000_000L)
  }

  test("1M-bucket gapFill emits the exact span-bounded grid") {
    // 1000 keys x sparse buckets at hours 0 and 999 => 1000 dense rows
    // per key, 999 of them zero-gap fills (grid is span-bounded).
    val series = spark.range(2000L)
      .select((col("id") % 1000).as("k"),
        expr("timestamp_micros((id DIV 1000) * 999 * 3600000000)").as("h"),
        lit(1L).as("n"))
      .groupBy("k", "h").agg(sum("n").as("n"))
    val filled = graft.operators.TimeSeries.gapFill(series, "k", "h", "n")
    assert(filled.count() == 1000L * 1000L)
    assert(filled.filter(col("n") === 0).count() == 1000L * 998L)
  }

  test("vocabulary cap bounds co-occurrence pairing on long documents") {
    // 200 docs x 1100 distinct tokens each: 100 "common" tokens shared
    // by every doc plus 1000 private rare tokens. Uncapped pairing
    // would emit C(1100,2) ≈ 605k rows per doc (121M total); the
    // cap=100 vocabulary keeps exactly the common tokens (df=200 vs
    // df=1, deterministic cut), so pairing is C(100,2) = 4950 distinct
    // pairs, each co-occurring in all 200 docs — a 25x fan-out bound
    // that holds at ANY document length (the q95 scale argument).
    val docs = spark.range(200L).select(col("id").as("doc_id"))
    val common = docs.crossJoin(
      spark.range(100L).select(concat(lit("c"), format_string("%03d", col("id"))).as("tok")))
    val rare = docs.join(spark.range(1000L).select(col("id").as("r")))
      .select(col("doc_id"), concat(lit("r"), col("doc_id"), lit("_"), col("r")).as("tok"))
    val dt = common.select("doc_id", "tok").union(rare)
    val vocab = graft.operators.TextAnalysis.topVocabulary(dt, 100)
    assert(vocab.count() == 100L)
    assert(vocab.filter(!col("tok").startsWith("c")).count() == 0L)
    val pairs = graft.operators.TextAnalysis.cooccurrencePairs(dt, vocab).localCheckpoint()
    assert(pairs.count() == 4950L)                       // C(100,2), no rare leakage
    assert(pairs.filter(col("cab") =!= 200L).count() == 0L)
  }

  test("rateSample membership at 1M rows is identical across partitionings") {
    // content-addressed sampling must give the SAME kept set however
    // the data is partitioned — the property that makes a sampled
    // corpus reproducible on any cluster size. Also sanity-check the
    // kept fraction tracks the bound (50% here) within 1%.
    val base = spark.range(1_000_000L)
      .select(col("id"), concat(lit("s"), col("id") % 5).as("src"))
    val rates = Seq("s0" -> "7fffffff")
    val a = graft.operators.Sampling.rateSample(
      base.repartition(7), "id", "src", rates, defaultBound = "7fffffff")
    val b = graft.operators.Sampling.rateSample(
      base.repartition(64, col("src")), "id", "src", rates, defaultBound = "7fffffff")
    assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L)
    val kept = a.count()
    assert(math.abs(kept - 500000L) < 10000L, s"kept $kept of 1M at a 50% bound")
  }

  test("1M-doc curation capstone: dedup -> mix -> split, one join, exact counts") {
    // the q100 pipeline shape at 200x the graded corpus: 1M docs in
    // 250k exact-dup groups of 4 (text = id % 250k). Dedup keeps each
    // group's min id, which lies in [0, 250k) -> exactly 50k survivors
    // per source (id % 5). src0's ffffffff bound then keeps ALL of
    // them (closed form); the other rates land within binomial noise
    // of their nominal keep fractions; the split lands within 1% of
    // 75/12.5/12.5. The whole pipeline must stay ONE join (the dedup
    // semi) — the property that makes it a shuffle-bounded plan at
    // any corpus size.
    val docs = spark.range(1_000_000L).select(
      col("id").as("doc_id"),
      concat(lit("t"), col("id") % 250000).as("text"),
      concat(lit("src"), col("id") % 5).as("source"))
    val rep = docs.groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
    val uniq = docs.join(rep.select("doc_id"), Seq("doc_id"), "left_semi")
    val mixed = graft.operators.Sampling.rateSample(uniq, "doc_id", "source",
      graft.queries.Corpus.demoMixingPlan, graft.queries.Corpus.demoMixingDefault)
    val split = graft.operators.Sampling.deterministicSplit(
      mixed.withColumn("sid", concat(lit("s:"), col("doc_id"))),
      "sid", Seq("train" -> "c", "val" -> "e"), default = "test")
    val rows = split.groupBy("split", "source").agg(count(lit(1)).as("n")).collect()
    val bySrc = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySrc("src0") == 50000L, s"src0 must keep every survivor, got ${bySrc("src0")}")
    assert(math.abs(bySrc("src1") - 37500.0) < 1500, s"src1 75%: ${bySrc("src1")}")
    assert(math.abs(bySrc("src2") - 25000.0) < 1500, s"src2 50%: ${bySrc("src2")}")
    assert(math.abs(bySrc("src3") - 12500.0) < 1200, s"src3 25%: ${bySrc("src3")}")
    assert(math.abs(bySrc("src4") - 5000.0) < 900, s"src4 10%: ${bySrc("src4")}")
    val total = rows.map(_.getLong(2)).sum
    val train = rows.filter(_.getString(0) == "train").map(_.getLong(2)).sum
    assert(math.abs(train.toDouble / total - 0.75) < 0.01)
    val plan = split.queryExecution.executedPlan.toString
    assert("Join".r.findAllIn(plan).size == 1, plan.take(400))
  }
}
