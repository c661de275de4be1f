package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Vectors
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Algebraic invariants over the sf0.001 fixtures (SURVEY.md §5.4) —
  * properties that must hold regardless of data values.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def dir = TestSpark.sf0001
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("prefixSum: seeded-random relations always match the reference window") {
    // 30 random (size, valueRange, bucketCount, grouped?) shapes — any
    // bucket-boundary monotonicity break, offset off-by-one, or tie
    // mishandling diverges from the single-window reference
    import graft.operators.Windows
    import spark.implicits._
    val rnd = new scala.util.Random(160814L)
    (1 to 30).foreach { i =>
      val n = 1 + rnd.nextInt(400)
      val span = 1 + rnd.nextInt(3000)
      val buckets = 2 + rnd.nextInt(40)
      val grouped = rnd.nextBoolean()
      val rows = (0 until n).map(_ =>
        (rnd.nextInt(span).toLong, rnd.nextInt(5).toLong,
          rnd.nextLong(1000) - 500))
      // distinct order keys WITHIN each partitioning scope (the
      // operator's documented contract — collapse first)
      val base =
        if (grouped) rows.toDF("v0", "g", "c")
          .groupBy("g", "v0").agg(sum("c").as("c"))
        else rows.toDF("v0", "g", "c")
          .groupBy("v0").agg(sum("c").as("c")).withColumn("g", lit(0L))
      val (part, partSql) = if (grouped) (Seq("g"), "PARTITION BY g") else (Nil, "")
      val expect = base.selectExpr("g", "v0",
          s"SUM(c) OVER ($partSql ORDER BY v0 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum")
        .as[(Long, Long, Long)].collect().toSet
      val got = Windows.prefixSum(base, part, "v0", "c", "cum", buckets = buckets)
        .select("g", "v0", "cum").as[(Long, Long, Long)].collect().toSet
      assert(got == expect, s"case $i: n=$n span=$span buckets=$buckets grouped=$grouped")
    }
  }

  test("q22: |UNION ALL| = |A| + |B| and |UNION| <= |UNION ALL|") {
    val rows = q("q22_union").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c = Tables.load(spark, dir, "customer")
    val a = c.filter(col("c_mktsegment") === "BUILDING").count()
    val b = c.filter(col("c_acctbal") > 5000).count()
    assert(rows("all") == a + b)
    assert(rows("dedup") <= rows("all"))
  }

  test("q35: n_unique + n_dupes_removed = n_total = row count") {
    val r = q("q35_dedup_exact").collect().head
    val (nu, nt, nd) = (r.getLong(r.fieldIndex("n_unique")),
      r.getLong(r.fieldIndex("n_total")), r.getLong(r.fieldIndex("n_dupes_removed")))
    assert(nu + nd == nt)
    assert(nt == Tables.load(spark, dir, "documents").count())
  }

  test("q17: rank and row_number within [1, partition size]") {
    val df = q("q17_win_rank")
    val bad = df.filter(col("rnk") < 1 || col("rn") < 1 || col("drnk") > col("rnk") ||
      col("rnk") > col("rn")).count() // rank <= row_number, dense <= rank
    assert(bad == 0)
  }

  test("cosine similarity is within [-1, 1] for all embedding pairs vs query") {
    val e = Tables.load(spark, dir, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("v"))
    val out = e.crossJoin(qv)
      .select(Vectors.cosineSimilarity(col("embedding"), col("v")).as("c"))
      .agg(min("c"), max("c")).collect().head
    assert(out.getDouble(0) >= -1.0000001 && out.getDouble(1) <= 1.0000001)
  }

  test("q34: sessions per user never exceed events per user") {
    val bad = q("q34_sessionize").filter(col("n_sessions") > col("n_events")).count()
    assert(bad == 0)
  }

  test("rollup grand total equals ungrouped total (q13)") {
    val total = q("q13_rollup").filter(col("g_yr") === 1 && col("g_st") === 1)
      .select("n").collect().head.getLong(0)
    assert(total == Tables.load(spark, dir, "orders").count())
  }

  test("quality scores are within [0, 1e6]") {
    val s = TextAnalysis.qualityScores(Tables.load(spark, dir, "documents"),
      Seq("the", "a"), "source")
    assert(s.filter(col("score") < 0 || col("score") > 1000000).count() == 0)
  }

  test("lang-id predicts only languages that exist in the corpus") {
    val langs = Tables.load(spark, dir, "documents")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    val preds = TextAnalysis.langIdPredictions(Tables.load(spark, dir, "documents"))
      .select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(langs))
  }

  test("q50: verified pairs never exceed candidates") {
    val r = q("q50_dedup_lsh_bands").collect().head
    assert(r.getLong(r.fieldIndex("n_verified")) <= r.getLong(r.fieldIndex("n_candidates")))
  }

  test("q70: the filled series is dense and carried is always >= observed gaps") {
    val rows = q("q70_gap_fill").collect()
    // within the LIMIT window, consecutive rows of one user are exactly
    // one hour apart (density) and zero rows carry a prior value
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { rs =>
      val hs = rs.map(_.getTimestamp(1).getTime).sorted
      hs.sliding(2).foreach {
        case Array(a, b) => assert(b - a == 3600000L, "series must be dense")
        case _ =>
      }
    }
    assert(rows.forall(r => r.getLong(2) > 0 || r.getLong(3) >= 0))
  }

  test("q71: funnel stage counts are monotone non-increasing") {
    val r = q("q71_funnel").collect().head
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2))
  }

  test("q72: transition matrix mass = events minus one per active user") {
    val total = q("q72_transitions").agg(sum("n")).collect().head.getLong(0)
    val ev = Tables.load(spark, dir, "events")
    val users = ev.select("user_id").distinct().count()
    assert(total == ev.count() - users)
  }

  test("q75: week-1 retention equals the total user count") {
    val rows = q("q75_retention").collect()
    val users = Tables.load(spark, dir, "events").select("user_id").distinct().count()
    // every user is active in their own cohort week
    val firstCells = rows.filter(r => r.getDate(0) == r.getDate(1))
      .map(_.getLong(2)).sum
    assert(firstCells == users)
  }

  test("q76: histogram mass = events minus one per active user") {
    // LIMIT 100 could truncate; re-derive without limit via the same shape
    val total = q("q76_gap_histogram").agg(sum("n")).collect().head.getLong(0)
    val ev = Tables.load(spark, dir, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(total <= expected && total > 0)
  }

  test("q77: ppm shares sum to just under 1e6 per segment") {
    val bySeg = q("q77_pct_of_total").collect().groupBy(_.getString(1))
    // the LIMIT window covers whole segments alphabetically only for the
    // first segment; check each fully-covered segment's share sum
    val c = Tables.load(spark, dir, "customer").filter(col("c_acctbal") > 0)
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySeg.foreach { case (seg, rs) =>
      if (rs.length.toLong == c(seg)) { // segment fully inside the LIMIT
        val s = rs.map(_.getLong(2)).sum
        assert(s <= 1000000L && s > 1000000L - rs.length, s"segment $seg sum $s")
      }
    }
  }

  // ---- sixth wave (q79-q84) invariants ----

  test("q79: quartiles are ordered and bracketed by the group min/max") {
    val stats = Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    q("q79_percentile_stats").collect().foreach { r =>
      val (p25, p50, p75) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val (lo, hi) = stats(r.getString(0))
      assert(lo <= p25 && p25 <= p50 && p50 <= p75 && p75 <= hi)
    }
  }

  test("q80: docs-won sums to at most the corpus size, every count positive") {
    val rows = q("q80_tfidf_topterm").collect()
    val won = rows.map(_.getLong(1))
    assert(won.forall(_ > 0) && won.sameElements(won.sortBy(-_)))
    assert(won.sum <= Tables.load(spark, dir, "documents").count())
  }

  test("q81: index stats are mutually consistent and the heaviest term is real") {
    val r = q("q81_inverted_index").collect().head
    val (terms, postings, maxPost, singles) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(terms <= postings && maxPost <= postings && singles <= terms)
    // the heaviest term's actual df must equal max_posting
    val df = graft.functions.Text.tokenize(Tables.load(spark, dir, "documents"))
      .distinct().groupBy("tok").count()
      .filter(col("tok") === r.getString(4)).collect().head.getLong(1)
    assert(df == maxPost)
  }

  test("containment and jaccard agree algebraically on the same item sets") {
    // jc(i,j) = ci / (na + nb - ci) must be recoverable from the two
    // directional containment rows of the SAME pair — a cross-operator
    // consistency check on real fixture shingles
    val sh = graft.operators.Dedup.shingles(Tables.load(spark, dir, "documents"))
    val ct = graft.operators.Dedup.containmentAllPairs(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val jc = graft.operators.Dedup.jaccardAllPairs(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jc.nonEmpty && ct.size == 2 * jc.size)
    jc.foreach { case ((i, j), v) =>
      val (ci, na) = ct((i, j))
      val (cj, nb) = ct((j, i))
      assert(ci == cj, s"asymmetric intersection for ($i,$j)")
      assert(math.abs(v - ci.toDouble / (na + nb - ci)) < 1e-12)
    }
  }

  test("q83: latest-version key counts match distinct (user, event_type) pairs") {
    val keys = q("q83_latest_version").collect().map(_.getLong(1)).sum
    val distinctKeys = Tables.load(spark, dir, "events")
      .select("user_id", "event_type").distinct().count()
    assert(keys == distinctKeys)
  }

  test("q84: salted join output equals the plain join, row for row") {
    val plain = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "part")
        .withColumnRenamed("p_partkey", "l_partkey"), "l_partkey")
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
    val salted = q("q84_skew_salted").select("p_brand", "n")
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  // ---- seventh wave (q86-q92) invariants ----

  private def tokCount(): Long =
    graft.functions.Text.tokenize(Tables.load(spark, dir, "documents")).count()

  test("q86: chunk counts recompute from doc lengths; overlap bounds token mass") {
    val rows = q("q86_chunking").collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1))       // n_chunks >= n_docs
      assert(r.getLong(3) <= r.getLong(2))       // distinct <= chunks
      assert(r.getLong(5) >= 1)                  // min_toks >= 1
    }
    // chunk starts are 1, 25, 49… so per doc chunks = floor((n-1)/24)+1;
    // recompute the corpus total independently of the query
    val expected = Tables.load(spark, dir, "documents")
      .select(size(filter(split(lower(col("text")), " "), t => t =!= "")).as("n"))
      .filter(col("n") > 0)
      .select(sum(expr("(n - 1) DIV 24 + 1"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == expected)
    // every token appears in >= 1 chunk; stride 24 of 32 duplicates < 2x
    val toks = tokCount()
    val chunkToks = rows.map(_.getLong(4)).sum
    assert(chunkToks >= toks && chunkToks < 2 * toks)
  }

  test("q87: toks + pad = n_docs * bucket exactly, per bucket") {
    val rows = q("q87_packing_waste").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bucket, n, toks, pad, ppm) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(toks + pad == n * bucket, s"bucket $bucket padding identity")
      assert(ppm == pad * 1000000L / (toks + pad) && ppm < 1000000L)
    }
  }

  test("q88: continuation mass sums to the corpus bigram count; modal share is sane") {
    val rows = q("q88_bigram_lm").collect()
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))       // top_c <= n_follow
      assert(r.getLong(4) <= 1000000L)           // p_ppm <= 1e6
    }
    // total bigrams = sum over docs of (n - 1); the 20 heaviest tokens
    // can't carry more continuation mass than the corpus holds
    val bigrams = Tables.load(spark, dir, "documents")
      .select(size(filter(split(lower(col("text")), " "), t => t =!= "")).as("n"))
      .filter(col("n") >= 2)
      .select(sum(col("n") - 1)).collect().head.getLong(0)
    assert(rows.map(_.getLong(1)).sum <= bigrams)
  }

  test("q89: hapax <= vocab <= toks and token mass matches the corpus") {
    val rows = q("q89_vocab_growth").collect()
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(2) && r.getLong(2) <= r.getLong(1))
    }
    assert(rows.map(_.getLong(1)).sum == tokCount())
  }

  test("q90: degree mass equals twice the q42 edge count (handshake lemma)") {
    val degreeMass = q("q90_dup_degree").collect()
      .map(r => r.getLong(0) * r.getLong(1)).sum
    // q42 counts the SAME >= 0.2 Jaccard pairs once per unordered pair
    val pairs = q("q42_dedup_ngram_jaccard").collect().head.getLong(0)
    assert(degreeMass == 2 * pairs)
  }

  test("q91: peak-hour count bounded by total; ppm recomputes exactly") {
    q("q91_burstiness").collect().foreach { r =>
      val (n, maxH, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(1 <= maxH && maxH <= n)
      assert(ppm == maxH * 1000000L / n)
    }
  }

  test("q92: the 100% stratum keeps every doc; no stratum exceeds its population") {
    val totals = Tables.load(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q("q92_apply_mixing").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("src0") == totals("src0"))       // ffffffff bound keeps all
    kept.foreach { case (src, k) => assert(k <= totals(src)) }
  }

  // ---- eighth wave (q93-q95) invariants ----

  test("q93: cluster mass equals q90's connected-doc count; no singleton clusters") {
    val clusters = q("q93_dup_clusters").collect()
    // every node in the edge list has >= 1 neighbor, so min size is 2
    clusters.foreach(r => assert(r.getLong(0) >= 2))
    // the docs partitioned into clusters are EXACTLY the docs q90
    // counts degrees for — two operators over the same edge relation
    val clusterMass = clusters.map(r => r.getLong(0) * r.getLong(1)).sum
    val connectedDocs = q("q90_dup_degree").collect().map(_.getLong(1)).sum
    assert(clusterMass == connectedDocs)
  }

  test("q94: tails bounded, fences ordered, winsorized sum inside [n*lo, n*hi]") {
    q("q94_winsorize").collect().foreach { r =>
      val (lo, hi) = (r.getDouble(1), r.getDouble(2))
      val (n, nLo, nHi, wsum) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(lo <= hi && nLo + nHi <= n)
      // p05/p95 fences: each tail is at most ~5% (+1 for interpolation)
      assert(nLo <= n / 20 + 1 && nHi <= n / 20 + 1)
      assert(n * lo <= wsum && wsum <= n * hi)
    }
  }

  // ---- ninth wave (q96-q98) invariants ----

  test("q96: weekly actives dominate daily; trailing-week union bounds hold") {
    val rows = q("q96_rolling_actives").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val users = Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    rows.foreach { case (day, (dau1, dau7)) =>
      assert(dau1 <= dau7 && dau7 <= users)
      // union bound: the week's distinct users can't exceed the sum of
      // the 7 daily counts feeding the window
      val weekSum = (day - 6 to day).map(d => rows.get(d).map(_._1).getOrElse(0L)).sum
      assert(dau7 <= weekSum)
    }
  }

  test("q97 agrees with q93: same clusters, removals = mass - clusters") {
    val r97 = q("q97_keep_best").collect().head
    val clusters93 = q("q93_dup_clusters").collect()
    val nClusters = clusters93.map(_.getLong(1)).sum
    val mass = clusters93.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(r97.getLong(0) == nClusters)
    assert(r97.getLong(1) == mass - nClusters)
    assert(r97.getLong(2) >= 0 && r97.getLong(3) >= 0)
  }

  test("q98: attribution bounded by purchases; latency under 24h per conversion") {
    q("q98_attribution").collect().foreach { r =>
      val (n, attr, lat) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(attr <= n)
      assert(lat <= attr * 1440, "every attributed latency < 24h = 1440 min")
    }
  }

  test("q87's bucket expression is the open-ended next power of two, floored at 16") {
    // a capped ladder assigns docs past the cap a bucket SMALLER than
    // their length (negative pad); the bit-length form must equal the
    // closed-form next-power-of-two for every n, unboundedly
    val rows = spark.range(1, 5001)
      .selectExpr("CAST(id AS INT) AS n",
        "greatest(16L, shiftleft(1L, length(bin(CAST(id - 1 AS BIGINT))))) AS bucket")
      .collect()
    rows.foreach { r =>
      val n = r.getInt(0)
      var p = 1L
      while (p < n) p <<= 1
      assert(r.getLong(1) == math.max(16L, p), s"n=$n")
    }
  }

  // ---- tenth wave (q99-q100) invariants ----

  test("q99: cells partition the events table; users bounded by events") {
    val rows = q("q99_seasonality").collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 6, "dow in [0,6]")
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 23, "hour in [0,23]")
      assert(r.getLong(3) <= r.getLong(2), "distinct users <= events per cell")
    }
    assert(rows.map(_.getLong(2)).sum ==
      Tables.load(spark, dir, "events").count())
  }

  test("q100: src0's ffffffff bound keeps every deduped doc; totals bounded") {
    val rows = q("q100_curation_pipeline").collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    val docs = Tables.load(spark, dir, "documents")
    val uniq = docs.groupBy(md5(col("text"))).agg(min(col("doc_id")).as("doc_id"))
    // the rate filter only removes rows
    assert(rows.map(_.getLong(2)).sum <= uniq.count())
    // "ffffffff" is the max 8-hex key, so src0's rate stage is a no-op:
    // its per-split counts must reassemble src0's full deduped count
    val src0 = docs.join(uniq.select("doc_id"), Seq("doc_id"), "left_semi")
      .filter(col("source") === "src0").count()
    assert(rows.filter(_.getString(1) == "src0").map(_.getLong(2)).sum == src0)
  }

  test("q95: lift pairs are ordered, supported, and df-consistent") {
    val dfreq = graft.functions.Text.tokenize(Tables.load(spark, dir, "documents"))
      .distinct().groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q("q95_cooccur_lift").collect().foreach { r =>
      val (ta, tb, cab) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(ta < tb)                             // canonical pair order
      assert(cab >= 5)                            // support floor
      // co-occurrence can't exceed either marginal document frequency
      assert(cab <= dfreq(ta) && cab <= dfreq(tb))
      assert(r.getLong(3) > 0)
    }
  }
}
