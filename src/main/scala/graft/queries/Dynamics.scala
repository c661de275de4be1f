package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Text
import graft.sources.Tables

/** Dynamics & pipeline-audit wave (q237–q244, round 7): run-length
  * dynamics, drift-over-time, and audits OF the pipeline's own
  * mechanisms — longest monotone value runs (q237), the word-length
  * spectrum (q238), supplier-concentration HHI drift across years
  * (q239), the hash-split fairness audit — does q66's deterministic
  * splitter bias the value distribution? (q240), the vocabulary cost
  * of near-dup removal (q241), repeat-purchase rates (q242),
  * consecutive-order shipping overlap (q243), and the basket-breadth
  * census (q244).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * Run detection is the gaps-and-islands cumulative-flag trick over
  * keyed windows (fan-in per user); HHI and TV are integer
  * ppm arithmetic over non-negative operands; the split audit reuses
  * q66's exact md5 split key so it audits the REAL mechanism, not a
  * reimplementation.
  */
object Dynamics {

  private def cnt = count(lit(1))

  /** net price × (1−discount) in lossless scale-4 (q165-trap-safe). */
  private val cents4Expr =
    "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)"

  def queries: Map[String, Queries.QueryFn] = Map(

    // Longest strictly-increasing value run per user (momentum
    // length), as a population census. Islands: a new run starts
    // wherever the value does NOT rise, so the island id is the
    // running count of non-rises; the longest streak of rises is the
    // max island size counted over rise rows + 1. Keyed windows only.
    "q237_monotone_runs" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val flagged = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("rise",
          when(col("value") > lag("value", 1).over(w), 1L).otherwise(0L))
        .withColumn("isl", sum(lit(1L) - col("rise")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val runs = flagged.groupBy("user_id", "isl")
        .agg(sum("rise").as("rises"))
      runs.groupBy("user_id").agg((max("rises") + 1).as("longest"))
        .groupBy("longest").agg(cnt.as("n_users"))
        .orderBy("longest")
    }),

    // Word-length spectrum per language: the length histogram of
    // whitespace tokens (capped at 20 — the long tail folds into one
    // bucket), ppm within the language. One tokenize pass + two
    // stacked aggs.
    "q238_wordlen_spectrum" -> ((s, dir) => {
      val wl = Tables.load(s, dir, "documents")
        .select(col("lang"), explode(Text.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .selectExpr("lang", "least(CAST(length(tok) AS BIGINT), 20L) AS wlen")
        .groupBy("lang", "wlen").agg(cnt.as("n"))
        .localCheckpoint() // spectrum + per-lang totals
      val tot = wl.groupBy("lang").agg(sum("n").as("nt"))
      wl.join(broadcast(tot), "lang")
        .selectExpr("lang", "wlen", "n", "n * 1000000 DIV nt AS ppm")
        .orderBy("lang", "wlen")
    }),

    // Supplier-concentration drift: the revenue HHI across suppliers,
    // per shipping year, with the year-over-year delta — is the
    // supply base consolidating? Integer ppm shares; HHI = Σshare²
    // DIV 10⁶ (ppm units); the delta lag runs over the bounded year
    // axis (≤ a few rows). Deltas can be negative, so they are
    // reported as a SUBTRACTION of two non-negative HHI values — no
    // negative division anywhere.
    "q239_hhi_drift" -> ((s, dir) => {
      val ys = Tables.load(s, dir, "lineitem")
        .selectExpr("CAST(year(l_shipdate) AS BIGINT) AS y", "l_suppkey",
          s"$cents4Expr AS c4")
        .groupBy("y", "l_suppkey").agg(sum("c4").as("sc"))
        .localCheckpoint() // shares + totals
      val yt = ys.groupBy("y").agg(sum("sc").as("yc"), cnt.as("n_suppliers"))
      val hhi = ys.join(broadcast(yt), "y")
        .selectExpr("y", "n_suppliers", "sc * 1000000 DIV yc AS share")
        .groupBy("y", "n_suppliers")
        .agg(sum(expr("share * share")).as("ss"))
        .selectExpr("y", "n_suppliers", "ss DIV 1000000 AS hhi_ppm")
      hhi.withColumn("prev", lag("hhi_ppm", 1).over(Window.orderBy("y")))
        .selectExpr("y", "n_suppliers", "hhi_ppm",
          "hhi_ppm - coalesce(prev, hhi_ppm) AS delta_ppm")
        .orderBy("y")
    }),

    // Split-fairness audit: q66's deterministic md5 split (the REAL
    // split key, not a reimplementation) halves the event stream —
    // do the two halves agree on each type's value distribution? TV
    // distance in ppm over width-10 value buckets, per type. A biased
    // splitter shows up here as a nonzero drift.
    "q240_split_fairness" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .selectExpr("event_type",
          "CAST(FLOOR(value / 10) AS BIGINT) AS b",
          "CASE WHEN md5(CAST(event_id AS STRING)) < '8' THEN 'a' ELSE 'b' END AS half")
        .groupBy("event_type", "b", "half").agg(cnt.as("n_tbh"))
        .localCheckpoint() // both halves + the bucket domain
      val ht = e.groupBy("event_type", "half").agg(sum("n_tbh").as("n_h"))
      val dom = e.select("event_type", "b").distinct()
      val grid = dom.join(broadcast(ht), "event_type")
        .join(e, Seq("event_type", "b", "half"), "left")
        .selectExpr("event_type", "b", "half",
          "coalesce(n_tbh, 0L) * 1000000 DIV n_h AS ppm")
      val a = grid.filter(col("half") === "a")
        .select(col("event_type"), col("b"), col("ppm").as("pa"))
      val bb = grid.filter(col("half") === "b")
        .select(col("event_type"), col("b"), col("ppm").as("pb"))
      a.join(bb, Seq("event_type", "b"))
        .groupBy("event_type")
        .agg(cnt.as("n_buckets"), sum(abs(col("pa") - col("pb"))).as("sd"))
        .selectExpr("event_type", "n_buckets", "sd DIV 2 AS tv_ppm")
        .orderBy("event_type")
    }),

    // The vocabulary cost of near-dup removal: if only each signature
    // group's representative (min doc_id) survives, how much of each
    // language's vocabulary disappears? Distinct tokens before vs
    // after, lost share in ppm. The survivor flag is a group-scoped
    // join on the signature — never a pair join.
    "q241_dedup_vocab_cost" -> ((s, dir) => {
      val sig = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(Text.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("doc_id", "lang")
        .agg(Text.minhashComponent(col("tok"), "").as("h1"),
          Text.minhashComponent(col("tok"), "a").as("h2"),
          Text.minhashComponent(col("tok"), "b").as("h3"))
      val keep = sig.groupBy("h1", "h2", "h3").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(Text.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .join(keep.withColumn("kept", lit(1L)), Seq("doc_id"), "left")
        .localCheckpoint() // before + after distinct counts
      val before = toks.groupBy("lang")
        .agg(countDistinct(col("tok")).as("vocab_before"))
      val after = toks.filter(col("kept") === 1L).groupBy("lang")
        .agg(countDistinct(col("tok")).as("vocab_after"))
      before.join(after, "lang")
        .selectExpr("lang", "vocab_before", "vocab_after",
          "(vocab_before - vocab_after) * 1000000 DIV vocab_before AS lost_ppm")
        .orderBy("lang")
    }),

    // Repeat purchases: how often does the same customer buy the same
    // part in more than one order, per brand? Reduce to the distinct
    // (customer, part, order) relation first; the repeat flag is a
    // count over the already-reduced pairs.
    "q242_repurchase_rate" -> ((s, dir) => {
      val cpo = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_partkey"), col("l_orderkey"))
        .distinct()
      val pairs = cpo.groupBy("o_custkey", "l_partkey")
        .agg(cnt.as("n_orders"))
      pairs.join(broadcast(Tables.load(s, dir, "part")
          .select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(cnt.as("n_pairs"),
          sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("n_repeat"))
        .selectExpr("p_brand", "n_pairs", "n_repeat",
          "n_repeat * 1000000 DIV n_pairs AS repeat_ppm")
        .orderBy("p_brand")
    }),

    // Shipping-pipeline overlap: for consecutive orders of one
    // customer, was the previous order still shipping (its last line
    // not yet shipped) when the next was placed? Per-order reduction
    // first, then a keyed lag per customer — interval adjacency with
    // no interval join. Census per market segment.
    "q243_order_overlap" -> ((s, dir) => {
      val perOrder = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .join(Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(max("l_shipdate").as("last_ship"))
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val pairs = perOrder
        .withColumn("prev_ship", lag("last_ship", 1).over(w))
        .filter(col("prev_ship").isNotNull)
        .selectExpr("o_custkey",
          "CASE WHEN prev_ship > o_orderdate THEN 1L ELSE 0L END AS ov")
      pairs.join(broadcast(Tables.load(s, dir, "customer")
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(cnt.as("n_pairs"), sum("ov").as("n_overlap"))
        .selectExpr("c_mktsegment", "n_pairs", "n_overlap",
          "n_overlap * 1000000 DIV n_pairs AS overlap_ppm")
        .orderBy("c_mktsegment")
    }),

    // Basket breadth: the (lines, distinct brands) census over orders
    // — single-brand baskets vs assortments. Per-order reduction with
    // a broadcast dim, then one grid agg.
    "q244_basket_breadth" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(broadcast(Tables.load(s, dir, "part")
          .select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_orderkey")
        .agg(cnt.as("n_lines"), countDistinct(col("p_brand")).as("n_brands"))
        .groupBy("n_lines", "n_brands").agg(cnt.as("n_orders"))
        .orderBy("n_lines", "n_brands")
    })
  )

  /** DuckDB oracles — SUM-derived BIGINT outputs CAST; identical
    * island, split-key, band, and ppm rules. */
  val oracle: Map[String, String] = Map(
    "q237_monotone_runs" -> """
WITH f AS (SELECT user_id, ts, event_id,
    CASE WHEN value > LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         THEN 1 ELSE 0 END rise
  FROM events),
i AS (SELECT user_id, rise,
    SUM(1 - rise) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) isl
  FROM f),
runs AS (SELECT user_id, isl, CAST(SUM(rise) AS BIGINT) rises FROM i GROUP BY user_id, isl),
u AS (SELECT user_id, MAX(rises) + 1 longest FROM runs GROUP BY user_id)
SELECT CAST(longest AS BIGINT) longest, COUNT(*) n_users
FROM u GROUP BY longest ORDER BY longest""",

    "q238_wordlen_spectrum" -> """
WITH t AS (SELECT lang, UNNEST(string_split(LOWER(text), ' ')) tok FROM documents),
wl AS (SELECT lang, least(CAST(length(tok) AS BIGINT), 20) wlen, COUNT(*) n
  FROM t WHERE tok <> '' GROUP BY lang, wlen),
tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) nt FROM wl GROUP BY lang)
SELECT wl.lang, CAST(wlen AS BIGINT) wlen, n,
  CAST(n * 1000000 // nt AS BIGINT) ppm
FROM wl JOIN tot ON tot.lang = wl.lang ORDER BY wl.lang, wlen""",

    "q239_hhi_drift" -> """
WITH ys AS (SELECT CAST(year(l_shipdate) AS BIGINT) y, l_suppkey,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) sc
  FROM lineitem GROUP BY y, l_suppkey),
yt AS (SELECT y, CAST(SUM(sc) AS BIGINT) yc, COUNT(*) n_suppliers FROM ys GROUP BY y),
hhi AS (SELECT ys.y, yt.n_suppliers,
    CAST(SUM((ys.sc * 1000000 // yt.yc) * (ys.sc * 1000000 // yt.yc)) // 1000000 AS BIGINT) hhi_ppm
  FROM ys JOIN yt ON yt.y = ys.y GROUP BY ys.y, yt.n_suppliers),
d AS (SELECT y, n_suppliers, hhi_ppm,
    LAG(hhi_ppm) OVER (ORDER BY y) prev FROM hhi)
SELECT y, n_suppliers, hhi_ppm,
  CAST(hhi_ppm - COALESCE(prev, hhi_ppm) AS BIGINT) delta_ppm
FROM d ORDER BY y""",

    "q240_split_fairness" -> """
WITH e AS (SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) b,
    CASE WHEN MD5(CAST(event_id AS VARCHAR)) < '8' THEN 'a' ELSE 'b' END half,
    COUNT(*) n_tbh
  FROM events GROUP BY event_type, b, half),
ht AS (SELECT event_type, half, CAST(SUM(n_tbh) AS BIGINT) n_h FROM e GROUP BY event_type, half),
dom AS (SELECT DISTINCT event_type, b FROM e),
grid AS (SELECT dom.event_type, dom.b, ht.half,
    CAST(COALESCE(e.n_tbh, 0) * 1000000 // ht.n_h AS BIGINT) ppm
  FROM dom JOIN ht ON ht.event_type = dom.event_type
  LEFT JOIN e ON e.event_type = dom.event_type AND e.b = dom.b AND e.half = ht.half)
SELECT a.event_type, COUNT(*) n_buckets,
  CAST(SUM(abs(a.ppm - b.ppm)) // 2 AS BIGINT) tv_ppm
FROM grid a JOIN grid b ON b.event_type = a.event_type AND b.b = a.b
  AND a.half = 'a' AND b.half = 'b'
GROUP BY a.event_type ORDER BY a.event_type""",

    "q241_dedup_vocab_cost" -> """
WITH toks0 AS (SELECT doc_id, lang, UNNEST(string_split(LOWER(text), ' ')) tok FROM documents),
sig AS (SELECT doc_id, lang,
    MIN(MD5(tok)) h1, MIN(MD5('a' || tok)) h2, MIN(MD5('b' || tok)) h3
  FROM toks0 WHERE tok <> '' GROUP BY doc_id, lang),
keep AS (SELECT MIN(doc_id) doc_id FROM sig GROUP BY h1, h2, h3),
before AS (SELECT lang, COUNT(DISTINCT tok) vocab_before
  FROM toks0 WHERE tok <> '' GROUP BY lang),
after AS (SELECT lang, COUNT(DISTINCT tok) vocab_after
  FROM toks0 JOIN keep USING (doc_id) WHERE tok <> '' GROUP BY lang)
SELECT b.lang, b.vocab_before, a.vocab_after,
  CAST((b.vocab_before - a.vocab_after) * 1000000 // b.vocab_before AS BIGINT) lost_ppm
FROM before b JOIN after a ON a.lang = b.lang ORDER BY b.lang""",

    "q242_repurchase_rate" -> """
WITH cpo AS (SELECT DISTINCT o_custkey, l_partkey, l_orderkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
pairs AS (SELECT o_custkey, l_partkey, COUNT(*) n_orders
  FROM cpo GROUP BY o_custkey, l_partkey)
SELECT p_brand, COUNT(*) n_pairs,
  CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) n_repeat,
  CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) repeat_ppm
FROM pairs JOIN part ON p_partkey = l_partkey
GROUP BY p_brand ORDER BY p_brand""",

    "q243_order_overlap" -> """
WITH per AS (SELECT o_custkey, o_orderkey, o_orderdate, MAX(l_shipdate) last_ship
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY o_custkey, o_orderkey, o_orderdate),
p AS (SELECT o_custkey,
    CASE WHEN LAG(last_ship) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
              > o_orderdate THEN 1 ELSE 0 END ov,
    LAG(last_ship) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) prev_ship
  FROM per QUALIFY prev_ship IS NOT NULL)
SELECT c_mktsegment, COUNT(*) n_pairs, CAST(SUM(ov) AS BIGINT) n_overlap,
  CAST(SUM(ov) * 1000000 // COUNT(*) AS BIGINT) overlap_ppm
FROM p JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q244_basket_breadth" -> """
WITH per AS (SELECT l_orderkey, COUNT(*) n_lines,
    COUNT(DISTINCT p_brand) n_brands
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY l_orderkey)
SELECT n_lines, n_brands, COUNT(*) n_orders
FROM per GROUP BY n_lines, n_brands ORDER BY n_lines, n_brands"""
  ).map { case (k, v) => k -> v.trim }
}
