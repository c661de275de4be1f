package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Commerce & corpus lifecycle wave (q166–q172, round 7): the
  * longitudinal reports a data platform runs once the per-snapshot
  * dials (q157–q165) are set — customer cohort value over time
  * (q166), prefix-fingerprint duplicate families (q167), per-language
  * token-shape profiles (q168), the supplier-nation × customer-nation
  * trade matrix (q169), per-document shingle novelty (q170),
  * year-over-year brand share and rank shift (q171), and within-day
  * repeat-action rates per event type (q172).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * Money stays in the q162 DECIMAL discipline (exact, order-
  * independent); every ratio is integer ppm; shares reuse q165's
  * scale-4 integer detour (DuckDB's `//` on DECIMALs rounds rather
  * than floors); no float ever crosses an aggregation boundary.
  */
object Lifecycle {

  private def cnt = count(lit(1))

  /** Exact net revenue per lineitem row — DECIMAL(14,2) × (1 −
    * DECIMAL(4,2)), scale 4 (the q162/q165 discipline). */
  private val netD =
    "CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  def queries: Map[String, Queries.QueryFn] = Map(

    // Customer cohort LTV: cohort = each customer's first order month;
    // per cohort, customers, first-month vs later orders and exact
    // DECIMAL revenue, and the later/first revenue ratio — the "do
    // acquired customers keep buying" curve. Scale shape: one hash agg
    // to find cohorts, one keyed join back on the customer key (both
    // sides shuffle once on o_custkey), one hash agg per cohort; no
    // window, no collect. Month strings compare lexicographically =
    // chronologically, so MIN picks the true first month.
    "q166_cohort_ltv" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders").selectExpr(
        "o_custkey",
        "date_format(date_trunc('month', o_orderdate), 'yyyy-MM') AS m",
        "CAST(o_totalprice AS DECIMAL(14,2)) AS price_d")
      val first = o.groupBy("o_custkey").agg(min("m").as("cohort"))
      val cohorts = first.groupBy("cohort").agg(cnt.as("n_customers"))
      val phases = o.join(first, "o_custkey")
        .groupBy("cohort").agg(
          sum(when(col("m") === col("cohort"), 1L).otherwise(0L)).as("orders_first"),
          sum(when(col("m") =!= col("cohort"), 1L).otherwise(0L)).as("orders_later"),
          sum(when(col("m") === col("cohort"), col("price_d"))).as("rev_first_d"),
          sum(when(col("m") =!= col("cohort"), col("price_d"))).as("rev_later_d"))
      cohorts.join(phases, "cohort")
        .selectExpr("cohort", "n_customers", "orders_first", "orders_later",
          "CAST(coalesce(rev_first_d, 0) AS DOUBLE) AS rev_first",
          "CAST(coalesce(rev_later_d, 0) AS DOUBLE) AS rev_later",
          "CAST(coalesce(rev_later_d, 0) * 100 AS BIGINT) * 1000000 " +
            "DIV GREATEST(CAST(coalesce(rev_first_d, 0) * 100 AS BIGINT), 1L) AS ltv_ratio_ppm")
        .orderBy("cohort")
    }),

    // Prefix-fingerprint duplicate families: documents sharing their
    // first 8 tokens (the boilerplate-header signature) grouped into
    // families, reported as a family-size histogram with how many
    // families are byte-exact duplicates vs prefix-only. Size-1
    // families stay in the report (the sf0.001 floor, and the
    // denominator a dedup decision needs). Scale shape: two hash aggs
    // — one per prefix, one per family size; no pair join anywhere.
    "q167_prefix_dup" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("text"),
          expr("filter(split(lower(text), ' '), x -> x != '')").as("l"))
        .filter(size(col("l")) >= 8)
        .selectExpr("md5(text) AS full_h", "array_join(slice(l, 1, 8), ' ') AS pfx")
      val fam = d.groupBy("pfx").agg(cnt.as("family_size"),
        countDistinct(col("full_h")).as("n_texts"))
      fam.groupBy("family_size").agg(
          cnt.as("n_families"),
          sum(when(col("n_texts") < col("family_size"), 1L).otherwise(0L))
            .as("n_exact_dup_families"),
          sum(col("family_size") - col("n_texts")).as("n_redundant_docs"))
        .orderBy("family_size")
    }),

    // Token-shape profile per language: token counts, mean token
    // length in centichars (integer — SUM×100 DIV SUM), and the short
    // (≤3 chars) / long (≥8 chars) tails as ppm — the tokenizer-
    // budgeting view of each language. Scale shape: one explode-free
    // pass (aggregate over the token array per row, then one hash agg
    // per lang — size/filter are codegen'd higher-order functions).
    "q168_token_shape_mix" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("lang"),
          expr("filter(split(lower(text), ' '), x -> x != '')").as("toks"))
        .filter(size(col("toks")) > 0)
        .selectExpr("lang",
          "CAST(size(toks) AS BIGINT) AS n_toks",
          "CAST(aggregate(toks, 0L, (a, x) -> a + length(x)) AS BIGINT) AS sum_len",
          "CAST(size(filter(toks, x -> length(x) <= 3)) AS BIGINT) AS n_short",
          "CAST(size(filter(toks, x -> length(x) >= 8)) AS BIGINT) AS n_long")
        .groupBy("lang").agg(
          cnt.as("n_docs"), sum("n_toks").as("n_tokens"),
          sum("sum_len").as("sl"), sum("n_short").as("ns"), sum("n_long").as("nl"))
        .selectExpr("lang", "n_docs", "n_tokens",
          "sl * 100 DIV n_tokens AS mean_len_centichar",
          "ns * 1000000 DIV n_tokens AS short_ppm",
          "nl * 1000000 DIV n_tokens AS long_ppm")
        .orderBy("lang")
    }),

    // The trade matrix: exact net revenue per (supplier nation,
    // customer nation) pair, top 15 pairs with their share of ALL
    // trade — the "who sells to whom" report. Scale shape: the fact
    // shuffles once onto o_orderkey and once onto o_custkey; nation is
    // broadcast twice; supplier/customer join on their keys (the
    // stats-driven planner's natural prey); shares against a broadcast
    // 1-row total in exact scale-4 integer units.
    "q169_nation_trade_matrix" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .selectExpr("l_orderkey", "l_suppkey", s"$netD AS net_d")
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
      val pairs = li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n.toDF("ck", "cust_nation")), col("c_nationkey") === col("ck"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n.toDF("sk", "supp_nation")), col("s_nationkey") === col("sk"))
        .groupBy("supp_nation", "cust_nation")
        .agg(sum("net_d").as("rev_d"), cnt.as("n_items"))
        .localCheckpoint() // read twice: total + top-15
      val tot = pairs.agg(sum("rev_d").as("total_d"))
      pairs.orderBy(desc("rev_d"), col("supp_nation"), col("cust_nation")).limit(15)
        .crossJoin(broadcast(tot))
        .selectExpr("supp_nation", "cust_nation", "n_items",
          "CAST(rev_d AS DOUBLE) AS net_revenue",
          "CAST(CAST(rev_d * 10000 AS DECIMAL(19,0)) * 1000000 " +
            "DIV CAST(total_d * 10000 AS DECIMAL(19,0)) AS BIGINT) AS trade_share_ppm")
        .orderBy(desc("net_revenue"), col("supp_nation"), col("cust_nation"))
    }),

    // Shingle novelty: per document, the fraction of its 3-gram
    // shingles appearing in NO other document, bucketed into deciles —
    // the "how much of this corpus is genuinely new text" histogram
    // (novelty 10 = fully unique document, 0 = every shingle shared).
    // Scale shape: the q42 shingle census (distinct + df hash aggs)
    // and one linear join back on the shingle — never a doc-pair join.
    "q170_shingle_novelty" -> ((s, dir) => {
      val t = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          expr("filter(split(lower(text), ' '), x -> x != '')").as("l"))
        .filter(size(col("l")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(l) - 3), i -> concat(l[i], ' ', l[i+1], ' ', l[i+2]))"))
          .as("sh")).distinct()
        .localCheckpoint() // feeds the census and the join back
      val df = t.groupBy("sh").agg(cnt.as("dfreq"))
      val perDoc = t.join(df, "sh").groupBy("doc_id").agg(
        cnt.as("nt"),
        sum(when(col("dfreq") === 1L, 1L).otherwise(0L)).as("nu"))
      perDoc
        .selectExpr("nt", "nu", "nu * 1000000 DIV nt DIV 100000 AS novelty_decile")
        .groupBy("novelty_decile").agg(cnt.as("n_docs"),
          sum("nt").as("n_shingles"), sum("nu").as("n_unique"))
        .selectExpr("novelty_decile", "n_docs", "n_shingles", "n_unique",
          "n_unique * 1000000 DIV n_shingles AS unique_ppm")
        .orderBy("novelty_decile")
    }),

    // Brand share shift between the corpus's first and last shipping
    // year: exact DECIMAL revenue per brand per endpoint year, each
    // year's share ppm, the share delta (subtraction AFTER the two
    // non-negative divisions — integral DIV on a negative would floor
    // vs DuckDB's round), and the revenue rank movement. Scale shape:
    // the endpoint years come from a broadcast 1-row agg, so the
    // filter runs row-side right after the scan (two passes over the
    // fact, no pair blowup); part joins on its key; the two rank
    // windows run on the brands-sized relation (ndv-bounded by the
    // brand dimension — the documented single-partition exception).
    "q171_brand_share_shift" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.load(s, dir, "lineitem")
        .selectExpr("l_partkey", "year(l_shipdate) AS y", s"$netD AS net_d")
      val yy = li.agg(min("y").as("y1"), max("y").as("y2"))
      val p = Tables.load(s, dir, "part").select("p_partkey", "p_brand")
      val byBrand = li.crossJoin(broadcast(yy))
        .filter(col("y") === col("y1") || col("y") === col("y2"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(
          sum(when(col("y") === col("y1"), col("net_d"))).as("rev1_d"),
          sum(when(col("y") === col("y2"), col("net_d"))).as("rev2_d"))
        .selectExpr("p_brand",
          "CAST(coalesce(rev1_d, 0) * 10000 AS BIGINT) AS r1",
          "CAST(coalesce(rev2_d, 0) * 10000 AS BIGINT) AS r2")
      val w1 = Window.orderBy(desc("r1"), col("p_brand"))
      val w2 = Window.orderBy(desc("r2"), col("p_brand"))
      byBrand
        .withColumn("t1", sum("r1").over(Window.partitionBy()))
        .withColumn("t2", sum("r2").over(Window.partitionBy()))
        .withColumn("rank_first", row_number().over(w1))
        .withColumn("rank_last", row_number().over(w2))
        .selectExpr("p_brand",
          "CAST(r1 AS DOUBLE) / 10000 AS rev_first",
          "CAST(r2 AS DOUBLE) / 10000 AS rev_last",
          "r1 * 1000000 DIV GREATEST(t1, 1L) AS share_first_ppm",
          "r2 * 1000000 DIV GREATEST(t2, 1L) AS share_last_ppm",
          "r2 * 1000000 DIV GREATEST(t2, 1L) - r1 * 1000000 DIV GREATEST(t1, 1L) AS share_delta_ppm",
          "CAST(rank_first AS BIGINT) AS rank_first",
          "CAST(rank_last AS BIGINT) AS rank_last",
          "CAST(rank_first - rank_last AS BIGINT) AS rank_gain")
        .orderBy("p_brand")
    }),

    // Within-day repeat actions: per event type, how often a user
    // fires the SAME action type more than once in a calendar day —
    // the batch twin of a streaming dedup-at-ingest decision (is
    // (user, type, day) a safe idempotency key?). Scale shape: two
    // stacked hash aggs — (type, user, day) groups, then per type;
    // the doubles never aggregate, only COUNT.
    "q172_repeat_action_rate" -> ((s, dir) => {
      val g = Tables.load(s, dir, "events")
        .selectExpr("event_type", "user_id", "date_trunc('day', ts) AS d")
        .groupBy("event_type", "user_id", "d").agg(cnt.as("c"))
      g.groupBy("event_type").agg(
          sum("c").as("n_events"), cnt.as("n_user_days"),
          sum(when(col("c") > 1L, 1L).otherwise(0L)).as("n_repeat_groups"),
          max("c").as("max_repeats"))
        .selectExpr("event_type", "n_events", "n_user_days",
          "n_repeat_groups",
          "(n_events - n_user_days) * 1000000 DIV n_events AS repeat_ppm",
          "max_repeats")
        .orderBy("event_type")
    })
  )

  /** DuckDB oracles — SUM-derived outputs CAST to BIGINT (HUGEINT
    * discipline); shares via the q165 scale-4 integer detour. */
  val oracle: Map[String, String] = Map(
    "q166_cohort_ltv" -> """
WITH o AS (SELECT o_custkey, strftime(date_trunc('month', o_orderdate), '%Y-%m') m,
             CAST(o_totalprice AS DECIMAL(14,2)) price_d FROM orders),
first AS (SELECT o_custkey, MIN(m) cohort FROM o GROUP BY o_custkey),
cohorts AS (SELECT cohort, COUNT(*) n_customers FROM first GROUP BY cohort),
phases AS (SELECT f.cohort,
    CAST(SUM(CASE WHEN o.m = f.cohort THEN 1 ELSE 0 END) AS BIGINT) orders_first,
    CAST(SUM(CASE WHEN o.m <> f.cohort THEN 1 ELSE 0 END) AS BIGINT) orders_later,
    SUM(CASE WHEN o.m = f.cohort THEN o.price_d END) rev_first_d,
    SUM(CASE WHEN o.m <> f.cohort THEN o.price_d END) rev_later_d
  FROM o JOIN first f ON f.o_custkey = o.o_custkey GROUP BY f.cohort)
SELECT c.cohort, c.n_customers, p.orders_first, p.orders_later,
  CAST(COALESCE(p.rev_first_d, 0) AS DOUBLE) rev_first,
  CAST(COALESCE(p.rev_later_d, 0) AS DOUBLE) rev_later,
  CAST(CAST(COALESCE(p.rev_later_d, 0) * 100 AS BIGINT) * 1000000
    // GREATEST(CAST(COALESCE(p.rev_first_d, 0) * 100 AS BIGINT), 1) AS BIGINT) ltv_ratio_ppm
FROM cohorts c JOIN phases p ON p.cohort = c.cohort
ORDER BY c.cohort""",

    "q167_prefix_dup" -> """
WITH d AS (SELECT text, list_filter(string_split(lower(text), ' '), x -> x <> '') l FROM documents),
k AS (SELECT md5(text) full_h, array_to_string(l[1:8], ' ') pfx FROM d WHERE len(l) >= 8),
fam AS (SELECT pfx, COUNT(*) family_size, COUNT(DISTINCT full_h) n_texts FROM k GROUP BY pfx)
SELECT family_size, COUNT(*) n_families,
  CAST(SUM(CASE WHEN n_texts < family_size THEN 1 ELSE 0 END) AS BIGINT) n_exact_dup_families,
  CAST(SUM(family_size - n_texts) AS BIGINT) n_redundant_docs
FROM fam GROUP BY family_size ORDER BY family_size""",

    "q168_token_shape_mix" -> """
WITH d AS (SELECT lang, list_filter(string_split(lower(text), ' '), x -> x <> '') toks FROM documents),
t AS (SELECT lang,
    CAST(len(toks) AS BIGINT) n_toks,
    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) sum_len,
    CAST(len(list_filter(toks, x -> length(x) <= 3)) AS BIGINT) n_short,
    CAST(len(list_filter(toks, x -> length(x) >= 8)) AS BIGINT) n_long
  FROM d WHERE len(toks) > 0)
SELECT lang, COUNT(*) n_docs,
  CAST(SUM(n_toks) AS BIGINT) n_tokens,
  CAST(CAST(SUM(sum_len) AS BIGINT) * 100 // CAST(SUM(n_toks) AS BIGINT) AS BIGINT) mean_len_centichar,
  CAST(CAST(SUM(n_short) AS BIGINT) * 1000000 // CAST(SUM(n_toks) AS BIGINT) AS BIGINT) short_ppm,
  CAST(CAST(SUM(n_long) AS BIGINT) * 1000000 // CAST(SUM(n_toks) AS BIGINT) AS BIGINT) long_ppm
FROM t GROUP BY lang ORDER BY lang""",

    "q169_nation_trade_matrix" -> """
WITH pairs AS (SELECT ns.n_name supp_nation, nc.n_name cust_nation,
    SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) rev_d,
    COUNT(*) n_items
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation nc ON nc.n_nationkey = c_nationkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ns ON ns.n_nationkey = s_nationkey
  GROUP BY ns.n_name, nc.n_name),
tot AS (SELECT SUM(rev_d) total_d FROM pairs),
top AS (SELECT * FROM pairs ORDER BY rev_d DESC, supp_nation, cust_nation LIMIT 15)
SELECT t.supp_nation, t.cust_nation, t.n_items,
  CAST(t.rev_d AS DOUBLE) net_revenue,
  CAST(CAST(t.rev_d * 10000 AS HUGEINT) * 1000000 // CAST(tot.total_d * 10000 AS HUGEINT) AS BIGINT) trade_share_ppm
FROM top t CROSS JOIN tot
ORDER BY net_revenue DESC, t.supp_nation, t.cust_nation""",

    "q170_shingle_novelty" -> """
WITH d AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l) - 2)) i, l FROM d WHERE len(l) >= 3),
t AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] sh FROM s),
df AS (SELECT sh, COUNT(*) dfreq FROM t GROUP BY sh),
per_doc AS (SELECT t.doc_id, COUNT(*) nt,
    SUM(CASE WHEN df.dfreq = 1 THEN 1 ELSE 0 END) nu
  FROM t JOIN df ON df.sh = t.sh GROUP BY t.doc_id),
b AS (SELECT nt, nu, CAST(nu * 1000000 // nt // 100000 AS BIGINT) novelty_decile FROM per_doc)
SELECT novelty_decile, COUNT(*) n_docs,
  CAST(SUM(nt) AS BIGINT) n_shingles, CAST(SUM(nu) AS BIGINT) n_unique,
  CAST(CAST(SUM(nu) AS BIGINT) * 1000000 // CAST(SUM(nt) AS BIGINT) AS BIGINT) unique_ppm
FROM b GROUP BY novelty_decile ORDER BY novelty_decile""",

    "q171_brand_share_shift" -> """
WITH li AS (SELECT l_partkey, year(l_shipdate) y,
    CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) net_d
  FROM lineitem),
yy AS (SELECT MIN(y) y1, MAX(y) y2 FROM li),
by_brand AS (SELECT p_brand,
    CAST(COALESCE(SUM(CASE WHEN li.y = yy.y1 THEN li.net_d END), 0) * 10000 AS BIGINT) r1,
    CAST(COALESCE(SUM(CASE WHEN li.y = yy.y2 THEN li.net_d END), 0) * 10000 AS BIGINT) r2
  FROM li CROSS JOIN yy JOIN part ON p_partkey = l_partkey
  WHERE li.y = yy.y1 OR li.y = yy.y2 GROUP BY p_brand),
ranked AS (SELECT p_brand, r1, r2,
    CAST(SUM(r1) OVER () AS BIGINT) t1, CAST(SUM(r2) OVER () AS BIGINT) t2,
    ROW_NUMBER() OVER (ORDER BY r1 DESC, p_brand) rank_first,
    ROW_NUMBER() OVER (ORDER BY r2 DESC, p_brand) rank_last
  FROM by_brand)
SELECT p_brand,
  CAST(r1 AS DOUBLE) / 10000 rev_first,
  CAST(r2 AS DOUBLE) / 10000 rev_last,
  CAST(r1 * 1000000 // GREATEST(t1, 1) AS BIGINT) share_first_ppm,
  CAST(r2 * 1000000 // GREATEST(t2, 1) AS BIGINT) share_last_ppm,
  CAST(r2 * 1000000 // GREATEST(t2, 1) - r1 * 1000000 // GREATEST(t1, 1) AS BIGINT) share_delta_ppm,
  CAST(rank_first AS BIGINT) rank_first,
  CAST(rank_last AS BIGINT) rank_last,
  CAST(rank_first - rank_last AS BIGINT) rank_gain
FROM ranked ORDER BY p_brand""",

    "q172_repeat_action_rate" -> """
WITH g AS (SELECT event_type, user_id, date_trunc('day', ts) d, COUNT(*) c
  FROM events GROUP BY event_type, user_id, d)
SELECT event_type,
  CAST(SUM(c) AS BIGINT) n_events,
  COUNT(*) n_user_days,
  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) n_repeat_groups,
  CAST((CAST(SUM(c) AS BIGINT) - COUNT(*)) * 1000000 // CAST(SUM(c) AS BIGINT) AS BIGINT) repeat_ppm,
  CAST(MAX(c) AS BIGINT) max_repeats
FROM g GROUP BY event_type ORDER BY event_type"""
  ).map { case (k, v) => k -> v.trim }
}
