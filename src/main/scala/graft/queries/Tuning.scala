package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Windows
import graft.sources.Tables

/** Corpus-tuning curves wave (q157–q160, round 6): the parameter-
  * choice reports — which language pairs leak shingles into each
  * other (decontamination scope), how concentrated the token
  * distribution is (the Zipf head a tokenizer/vocab decision reads),
  * which parts' prices drifted hardest first-to-last (the CDC-style
  * argmin/argmax kernel on a fact table), and the packing-waste curve
  * across context lengths (pick ctx before training, not after).
  *
  * Same t2 gate as every wave (strict_check at sf0.01 AND sf0.1
  * before commit); all-integer ppm arithmetic; cumulative totals are
  * the bucketed prefix sum; the only limit is a TakeOrdered top-20.
  */
object Tuning {

  private def cnt = count(lit(1))

  private val toks = "filter(split(lower(text), ' '), x -> x != '')"

  def queries: Map[String, Queries.QueryFn] = Map(

    // Cross-language shingle leakage: 3-grams shared between language
    // pairs — the decontamination scope question ("does zh share
    // boilerplate with en?"). Scale shape: shingles dedup to
    // (lang, shingle) FIRST, so the self-join on the shingle emits at
    // most C(#langs, 2) rows per shingle — lang cardinality bounds
    // the blowup, no doc-pair join, no maxDf cap needed at this
    // granularity.
    "q157_cross_lang_leakage" -> ((s, dir) => {
      val sl = Tables.load(s, dir, "documents")
        .select(col("lang"), expr(toks).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("lang"), explode(expr(
          "transform(sequence(0, size(t) - 3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))"))
          .as("sh"))
        .distinct()
        .localCheckpoint() // read three ways: both join sides + vocab
      val vocab = sl.groupBy("lang").agg(cnt.as("v"))
      val pairs = sl.toDF("lang_a", "sh")
        .join(sl.toDF("lang_b", "sh2"),
          col("sh") === col("sh2") && col("lang_a") < col("lang_b"))
        .groupBy("lang_a", "lang_b").agg(cnt.as("n_shared"))
      pairs
        .join(broadcast(vocab.toDF("lang_a", "va")), "lang_a")
        .join(broadcast(vocab.toDF("lang_b", "vb")), "lang_b")
        .selectExpr("lang_a", "lang_b", "n_shared",
          "n_shared * 1000000 DIV LEAST(va, vb) AS leak_ppm")
        .orderBy("lang_a", "lang_b")
    }),

    // Zipf head concentration: the share of all token occurrences the
    // top-k tokens capture, for k in (1, 10, 100, 1000) — exact even
    // with count ties, because tokens group by their count first:
    // (count c, m tokens, c·m occurrences), the cumulative walk runs
    // over count values descending, and a partial group contributes
    // exactly (k − cum_before)·c. Scale shape: token counts hash-agg;
    // the count-value relation is tiny; prefix sums bucketed; k
    // clamps to the vocabulary size so every k row always exists.
    "q158_topk_token_share" -> ((s, dir) => {
      val tc = Tables.load(s, dir, "documents")
        .select(explode(expr(toks)).as("tok"))
        .groupBy("tok").agg(cnt.as("c"))
      val byC = tc.groupBy("c").agg(cnt.as("m"))
        .withColumn("occ", col("c") * col("m"))
        .withColumn("neg", -col("c"))
        .localCheckpoint() // two prefix sums + the totals
      // round-11: both running totals in ONE prefix-sum pass
      val p = Windows.prefixSumN(byC, Nil, "neg",
        Seq("m" -> "cum_m", "occ" -> "cum_occ"))
      val tot = byC.agg(sum("m").as("ndv"), sum("occ").as("total_occ"))
      val ks = s.createDataset(Seq(1L, 10L, 100L, 1000L))(
        org.apache.spark.sql.Encoders.scalaLong).toDF("k")
      p.crossJoin(broadcast(tot))
        .join(broadcast(ks), col("cum_m") >= least(col("k"), col("ndv")))
        .groupBy("k")
        .agg(min(struct(col("cum_m"), col("c"), col("cum_occ"), col("ndv"),
          col("total_occ"))).as("w"))
        .selectExpr("k",
          "LEAST(k, w.ndv) AS k_used",
          "(w.cum_occ - (w.cum_m - LEAST(k, w.ndv)) * w.c) * 1000000 DIV w.total_occ AS share_ppm")
        .orderBy("k")
    }),

    // Price drift movers: each part's FIRST and LAST extended price in
    // ship order (cents — exact integers), direction and magnitude,
    // top-20 movers. The CDC argmin/argmax kernel (q83's latest-
    // version discipline) on a fact table: one min-struct + max-struct
    // hash agg per part under the total (date, order, line) order —
    // no window over the fact table, top-k is TakeOrdered.
    "q159_price_drift" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .select(col("l_partkey").as("part"),
          col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
        .groupBy("part")
        .agg(cnt.as("n_sales"),
          min(struct(col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber"), col("cents"))).as("f"),
          max(struct(col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber"), col("cents"))).as("l"))
        .selectExpr("part", "n_sales",
          "f.cents AS first_cents", "l.cents AS last_cents",
          "CAST(CASE WHEN l.cents > f.cents THEN 1 WHEN l.cents < f.cents THEN -1 ELSE 0 END AS BIGINT) AS direction",
          "ABS(l.cents - f.cents) * 1000000 DIV f.cents AS abs_drift_ppm")
        .orderBy(desc("abs_drift_ppm"), col("part")).limit(20)
    }),

    // Packing-waste curve: for context lengths 512/1024/2048/4096,
    // the three costs a packing decision trades — solo-window padding
    // (one doc per window), solo truncation loss, and concat-packing
    // tail waste — each as ppm of its budget. Pure aggregates
    // cross-joined with a 4-row broadcast; the whole curve is one
    // pass over the token counts.
    "q160_packing_curve" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(size(expr(toks)).cast("long").as("n"))
        .filter(col("n") > 0)
      val ctxs = s.createDataset(Seq(512L, 1024L, 2048L, 4096L))(
        org.apache.spark.sql.Encoders.scalaLong).toDF("ctx")
      d.crossJoin(broadcast(ctxs))
        .groupBy("ctx")
        .agg(cnt.as("n_docs"), sum("n").as("total_tokens"),
          sum(expr("GREATEST(0L, ctx - n)")).as("solo_pad"),
          sum(expr("GREATEST(0L, n - ctx)")).as("solo_trunc"))
        .selectExpr("ctx", "n_docs", "total_tokens",
          "solo_pad * 1000000 DIV (n_docs * ctx) AS solo_pad_ppm",
          "solo_trunc * 1000000 DIV total_tokens AS solo_trunc_ppm",
          "(total_tokens + ctx - 1) DIV ctx AS concat_bins",
          "((total_tokens + ctx - 1) DIV ctx * ctx - total_tokens) * 1000000 DIV ((total_tokens + ctx - 1) DIV ctx * ctx) AS concat_waste_ppm")
        .orderBy("ctx")
    })
  )

  /** DuckDB oracles — SUM/product-derived outputs CAST to BIGINT
    * (HUGEINT widening vs the strict hasher). */
  val oracle: Map[String, String] = Map(
    "q157_cross_lang_leakage" -> """
WITH d AS (SELECT lang, list_filter(string_split(lower(text), ' '), x -> x <> '') t FROM documents),
s AS (SELECT lang, unnest(generate_series(1, len(t) - 2)) i, t FROM d WHERE len(t) >= 3),
sl AS (SELECT DISTINCT lang, t[i] || ' ' || t[i+1] || ' ' || t[i+2] sh FROM s),
vocab AS (SELECT lang, COUNT(*) v FROM sl GROUP BY lang),
pairs AS (SELECT a.lang lang_a, b.lang lang_b, COUNT(*) n_shared
          FROM sl a JOIN sl b ON a.sh = b.sh AND a.lang < b.lang
          GROUP BY a.lang, b.lang)
SELECT p.lang_a, p.lang_b, p.n_shared,
  CAST(p.n_shared * 1000000 // LEAST(va.v, vb.v) AS BIGINT) leak_ppm
FROM pairs p JOIN vocab va ON va.lang = p.lang_a
JOIN vocab vb ON vb.lang = p.lang_b
ORDER BY p.lang_a, p.lang_b""",

    "q158_topk_token_share" -> """
WITH w AS (SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) tok FROM documents),
tc AS (SELECT tok, COUNT(*) c FROM w GROUP BY tok),
byc AS (SELECT c, COUNT(*) m, c * COUNT(*) occ FROM tc GROUP BY c),
p AS (SELECT c,
        SUM(m) OVER (ORDER BY c DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_m,
        SUM(occ) OVER (ORDER BY c DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_occ
      FROM byc),
tot AS (SELECT SUM(m) ndv, SUM(occ) total_occ FROM byc),
ks AS (SELECT CAST(unnest([1, 10, 100, 1000]) AS BIGINT) k)
SELECT ks.k,
  CAST(LEAST(ks.k, MAX(tot.ndv)) AS BIGINT) k_used,
  CAST((MIN_BY(p.cum_occ, p.cum_m) - (MIN(p.cum_m) - LEAST(ks.k, MAX(tot.ndv))) * MIN_BY(p.c, p.cum_m))
       * 1000000 // MAX(tot.total_occ) AS BIGINT) share_ppm
FROM p CROSS JOIN tot JOIN ks ON p.cum_m >= LEAST(ks.k, tot.ndv)
GROUP BY ks.k ORDER BY ks.k""",

    "q159_price_drift" -> """
WITH li AS (SELECT l_partkey part, CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) cents,
              l_shipdate, l_orderkey, l_linenumber FROM lineitem),
o AS (SELECT part, cents,
        ROW_NUMBER() OVER (PARTITION BY part ORDER BY l_shipdate, l_orderkey, l_linenumber) rna,
        ROW_NUMBER() OVER (PARTITION BY part ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) rnd
      FROM li),
f AS (SELECT part, COUNT(*) n_sales,
        MIN(CASE WHEN rna = 1 THEN cents END) first_cents,
        MIN(CASE WHEN rnd = 1 THEN cents END) last_cents
      FROM o GROUP BY part)
SELECT part, n_sales, first_cents, last_cents,
  CAST(CASE WHEN last_cents > first_cents THEN 1
            WHEN last_cents < first_cents THEN -1 ELSE 0 END AS BIGINT) direction,
  CAST(ABS(last_cents - first_cents) * 1000000 // first_cents AS BIGINT) abs_drift_ppm
FROM f ORDER BY abs_drift_ppm DESC, part LIMIT 20""",

    "q160_packing_curve" -> """
WITH d AS (SELECT len(list_filter(string_split(lower(text), ' '), x -> x <> '')) n FROM documents),
t AS (SELECT CAST(n AS BIGINT) n FROM d WHERE n > 0),
ctx AS (SELECT CAST(unnest([512, 1024, 2048, 4096]) AS BIGINT) ctx),
a AS (SELECT ctx, COUNT(*) n_docs, SUM(n) total_tokens,
        SUM(GREATEST(0, ctx - n)) solo_pad, SUM(GREATEST(0, n - ctx)) solo_trunc
      FROM t CROSS JOIN ctx GROUP BY ctx)
SELECT ctx, n_docs, CAST(total_tokens AS BIGINT) total_tokens,
  CAST(solo_pad * 1000000 // (n_docs * ctx) AS BIGINT) solo_pad_ppm,
  CAST(solo_trunc * 1000000 // total_tokens AS BIGINT) solo_trunc_ppm,
  CAST((total_tokens + ctx - 1) // ctx AS BIGINT) concat_bins,
  CAST(((total_tokens + ctx - 1) // ctx * ctx - total_tokens) * 1000000
       // ((total_tokens + ctx - 1) // ctx * ctx) AS BIGINT) concat_waste_ppm
FROM a ORDER BY ctx"""
  ).map { case (k, v) => k -> v.trim }
}
