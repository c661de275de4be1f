package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Windows
import graft.sources.Tables

/** Distribution & flow wave (q173–q180, round 7): where value, users,
  * and text concentrate and how they move — signed ship-lag SLA
  * profiles (q173), source concentration with HHI (q174), customer
  * spend-quartile migration across the timeline midpoint (q175),
  * event-type audience overlap (q176), document length vs novelty
  * (q177), the revenue Pareto curve (q178), supply redundancy (q179),
  * and the tax × discount pricing grid (q180).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * Quantiles here are NEVER rank-windowed over the fact: every median/
  * percentile/quartile/decile comes from value-level counts + the
  * two-level distributed prefix sum ([[Windows.prefixSum]]), then a
  * threshold pick — the shape that has no single-task straggler at
  * 100 TB. Ties share a bucket by construction (value-based, not
  * row-based), which is also what makes the result engine-portable.
  */
object Flows {

  private def cnt = count(lit(1))

  private val netD =
    "CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  def queries: Map[String, Queries.QueryFn] = Map(

    // Ship-lag SLA profile: signed days between order and ship dates
    // (this corpus ships independently of ordering, so the lag is a
    // ±distribution — the report treats it as such), per priority:
    // exact lower median and p90 picked from value-level cumulative
    // counts (prefixSum, keyed per priority — no rank window over the
    // fact), and the >365d overdue tail as ppm.
    "q173_ship_lag_profile" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      val o = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val lagged = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .selectExpr("o_orderpriority AS pri",
          "CAST(datediff(to_date(l_shipdate), to_date(o_orderdate)) AS BIGINT) AS lag")
        .localCheckpoint() // value counts + the per-priority totals
      val counts = lagged.groupBy("pri", "lag").agg(cnt.as("c"))
      val cum = Windows.prefixSum(counts, Seq("pri"), "lag", "c", "cum")
      val tot = lagged.groupBy("pri").agg(cnt.as("n"),
        sum(when(col("lag") > 365L, 1L).otherwise(0L)).as("n_overdue"))
      cum.join(broadcast(tot), "pri")
        .groupBy("pri")
        .agg(
          min(when(col("cum") >= expr("(n + 1) DIV 2"), col("lag"))).as("median_lag_days"),
          min(when(col("cum") >= expr("(9 * n + 9) DIV 10"), col("lag"))).as("p90_lag_days"),
          first("n").as("n_items"), first("n_overdue").as("n_ov"))
        .selectExpr("pri AS o_orderpriority", "n_items",
          "median_lag_days", "p90_lag_days",
          "n_ov * 1000000 DIV n_items AS overdue_ppm")
        .orderBy("o_orderpriority")
    }),

    // Source concentration: each source's character share of the
    // corpus (ppm), its rank, the cumulative share down the ranking,
    // and the corpus-wide Herfindahl index (sum of squared shares) —
    // the "is this corpus secretly one crawler" report. The ranking
    // windows run on the sources-sized relation (ndv-bounded, the
    // documented exception); HHI is a broadcast 1-row aggregate.
    "q174_source_concentration" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bySrc = Tables.load(s, dir, "documents")
        .groupBy("source").agg(cnt.as("n_docs"), sum("n_chars").as("chars"))
      val tot = bySrc.agg(sum("chars").as("tot"))
      val shares = bySrc.crossJoin(broadcast(tot))
        .selectExpr("source", "n_docs", "chars",
          "chars * 1000000 DIV tot AS share_ppm")
      val hhi = shares.agg(sum(expr("share_ppm * share_ppm")).as("ss"))
        .selectExpr("ss DIV 1000000 AS hhi_ppm")
      val w = Window.orderBy(desc("share_ppm"), col("source"))
      shares
        .withColumn("rank", row_number().over(w))
        .withColumn("cum_share_ppm", sum("share_ppm").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(hhi))
        .selectExpr("CAST(rank AS BIGINT) AS rank", "source", "n_docs",
          "CAST(chars AS BIGINT) AS n_chars", "share_ppm",
          "cum_share_ppm", "hhi_ppm")
        .orderBy("rank")
    }),

    // Spend-quartile migration: customers active in BOTH halves of
    // the order timeline, quartiled by spend within each half
    // (value-level quartiles from an EXCLUSIVE prefix sum — ties
    // share a quartile, no rank window over customers), reported as
    // the 4×4 transition matrix with each origin row's shares. The
    // midpoint is a broadcast 1-row agg (the q164 pattern).
    "q175_segment_migration" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      // o_orderdate resolves TIMESTAMP_NTZ from parquet; unix_micros
      // needs the cast (the Tables.load events-ts precedent)
      val mid = o.agg(expr(
        "(unix_micros(CAST(min(o_orderdate) AS TIMESTAMP)) + " +
          "unix_micros(CAST(max(o_orderdate) AS TIMESTAMP))) DIV 2 AS mid"))
      val spend = o.crossJoin(broadcast(mid))
        .selectExpr("o_custkey",
          "CASE WHEN unix_micros(CAST(o_orderdate AS TIMESTAMP)) < mid THEN 1 ELSE 2 END AS half",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents")
        .groupBy("o_custkey", "half").agg(sum("cents").as("spend"))
      val both = spend.groupBy("o_custkey").agg(cnt.as("nh"))
        .filter(col("nh") === 2L).select("o_custkey")
      val sp = spend.join(both, "o_custkey").localCheckpoint() // quartile leg + the pivot
      // round-11: ONE prefix sum KEYED by half replaces the two
      // per-half legs, and the quartile assignment becomes three
      // broadcast THRESHOLDS + a CASE projection instead of a
      // value-level join back onto the spends (q = below*4 DIV n + 1
      // is a monotone step of `below`, so v >= min{v : below*4 >= j*n}
      // ⟺ q >= j+1 — same ties-share-a-quartile assignment, no
      // shuffle of the customer relation; guide §2.4/§3). The 4×4
      // pivot is one conditional-max groupBy, not an o_custkey
      // self-join.
      val vals = sp.groupBy("half", "spend").agg(cnt.as("c"))
      val nh = sp.groupBy("half").agg(cnt.as("n"))
      val thr = Windows.prefixSum(vals, Seq("half"), "spend", "c", "below",
          exclusive = true)
        .join(broadcast(nh), "half")
        .groupBy("half")
        .agg(min(when(expr("below * 4 >= n"), col("spend"))).as("t2"),
          min(when(expr("below * 4 >= 2 * n"), col("spend"))).as("t3"),
          min(when(expr("below * 4 >= 3 * n"), col("spend"))).as("t4"))
      val qs = sp.join(broadcast(thr), "half")
        .selectExpr("o_custkey", "half",
          "CASE WHEN t4 IS NOT NULL AND spend >= t4 THEN 4 " +
            "WHEN t3 IS NOT NULL AND spend >= t3 THEN 3 " +
            "WHEN t2 IS NOT NULL AND spend >= t2 THEN 2 ELSE 1 END AS q")
      val matrix = qs.groupBy("o_custkey")
        .agg(max(when(col("half") === 1, col("q"))).as("q1"),
          max(when(col("half") === 2, col("q"))).as("q2"))
        .groupBy("q1", "q2").agg(cnt.as("n_customers"))
      val rowTot = matrix.groupBy("q1").agg(sum("n_customers").as("row_n"))
      matrix.join(broadcast(rowTot), "q1")
        .selectExpr("CAST(q1 AS BIGINT) AS q_first", "CAST(q2 AS BIGINT) AS q_last",
          "n_customers", "n_customers * 1000000 DIV row_n AS origin_share_ppm")
        .orderBy("q_first", "q_last")
    }),

    // Event-type audience overlap: Jaccard of user bases for every
    // type pair — does "click" reach the "purchase" audience? Scale
    // shape: distinct (user, type) first, self-join keyed on USER
    // (each user contributes ≤ C(types,2) pairs — linear in users,
    // never a type-matrix × fact product), per-type audience sizes
    // broadcast back.
    "q176_event_type_overlap" -> ((s, dir) => {
      val ut = Tables.load(s, dir, "events")
        .select("user_id", "event_type").distinct()
        .localCheckpoint() // audiences + both self-join legs
      val aud = ut.groupBy("event_type").agg(cnt.as("n_aud"))
      val inter = ut.toDF("u", "ta")
        .join(ut.toDF("u2", "tb"), col("u") === col("u2") && col("ta") < col("tb"))
        .groupBy("ta", "tb").agg(cnt.as("n_both"))
      inter
        .join(broadcast(aud.toDF("ta", "n_a")), "ta")
        .join(broadcast(aud.toDF("tb", "n_b")), "tb")
        .selectExpr("ta AS type_a", "tb AS type_b", "n_a", "n_b", "n_both",
          "n_both * 1000000 DIV (n_a + n_b - n_both) AS jaccard_ppm")
        .orderBy("type_a", "type_b")
    }),

    // Length vs novelty: does a longer document bring more new text?
    // The q170 novelty kernel (shingle census, df=1 share) regrouped
    // by 256-char length blocks. Linear joins on the shingle and the
    // doc id — never a pair join.
    "q177_length_novelty_grid" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          expr("filter(split(lower(text), ' '), x -> x != '')").as("l"))
        .filter(size(col("l")) >= 3)
      val t = d.select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(l) - 3), i -> concat(l[i], ' ', l[i+1], ' ', l[i+2]))"))
          .as("sh")).distinct()
        .localCheckpoint() // census + join back
      val df = t.groupBy("sh").agg(cnt.as("dfreq"))
      val perDoc = t.join(df, "sh").groupBy("doc_id").agg(
        cnt.as("nt"),
        sum(when(col("dfreq") === 1L, 1L).otherwise(0L)).as("nu"))
      perDoc.join(d.select("doc_id", "n_chars"), "doc_id")
        .selectExpr("n_chars DIV 256 AS len_block", "nt", "nu")
        .groupBy("len_block").agg(cnt.as("n_docs"),
          sum("nt").as("n_shingles"), sum("nu").as("n_unique"))
        .selectExpr("len_block", "n_docs", "n_shingles", "n_unique",
          "n_unique * 1000000 DIV n_shingles AS unique_ppm")
        .orderBy("len_block")
    }),

    // The revenue Pareto curve: cumulative revenue share at each
    // customer-count decile, walking customers from the biggest
    // spender down — "do 20% of customers carry 80% of revenue".
    // Scale shape: customers collapse to value-level (spend, count,
    // revenue) rows; BOTH cumulatives are distributed prefix sums on
    // the negated spend (descending walk with an ascending kernel);
    // ceil-decile assignment makes whole tie-groups land in one
    // decile, so the curve is engine-portable.
    "q178_revenue_pareto" -> ((s, dir) => {
      val spend = Tables.load(s, dir, "orders")
        .selectExpr("o_custkey",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents")
        .groupBy("o_custkey").agg(sum("cents").as("spend"))
      val vals = spend.groupBy("spend").agg(cnt.as("c"), sum("spend").as("rev"))
        .withColumn("neg", -col("spend"))
        .localCheckpoint() // two prefix-sum legs
      // round-11: tot re-reduces from `vals` (no second scan of the
      // spend relation) and both cumulatives run in ONE prefix-sum
      // pass instead of two legs re-joined on the order key
      val tot = vals.agg(sum("c").as("n"), sum("rev").as("tot_rev"))
      Windows.prefixSumN(vals, Nil, "neg",
          Seq("c" -> "cum_cust", "rev" -> "cum_rev"))
        .crossJoin(broadcast(tot))
        .selectExpr("(cum_cust * 10 + n - 1) DIV n AS decile",
          "cum_cust", "cum_rev * 1000000 DIV tot_rev AS rev_ppm")
        .groupBy("decile").agg(max("cum_cust").as("n_customers_cum"),
          max("rev_ppm").as("revenue_cum_ppm"))
        .orderBy("decile")
    }),

    // Supply redundancy: how many distinct suppliers actually shipped
    // each part (lineitem evidence, not catalog claims) — histogram
    // plus each redundancy level's share of shipped revenue: the
    // single-source-risk report. Two stacked aggs; revenue stays
    // exact DECIMAL.
    "q179_supply_redundancy" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .selectExpr("l_partkey", "l_suppkey", s"$netD AS net_d")
      val perPart = li.groupBy("l_partkey").agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        sum("net_d").as("rev_d"))
      val tot = perPart.agg(sum("rev_d").as("tot_d"))
      perPart.groupBy("n_suppliers").agg(cnt.as("n_parts"), sum("rev_d").as("lvl_d"))
        .crossJoin(broadcast(tot))
        .selectExpr("n_suppliers", "n_parts",
          "CAST(lvl_d AS DOUBLE) AS net_revenue",
          "CAST(CAST(lvl_d * 10000 AS DECIMAL(19,0)) * 1000000 " +
            "DIV CAST(tot_d * 10000 AS DECIMAL(19,0)) AS BIGINT) AS revenue_share_ppm")
        .orderBy("n_suppliers")
    }),

    // Tax × discount pricing grid: the exact-DECIMAL interaction
    // report — net revenue and tax collected per (discount pct, tax
    // pct) cell, effective tax as ppm of net via the integer detour
    // (scale-6 DECIMAL products, never a float division). One
    // partial+final agg pair over the fact scan, no join.
    "q180_tax_discount_grid" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .selectExpr(
          "CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS disc_pct",
          "CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS tax_pct",
          s"$netD AS net_d",
          s"$netD * CAST(l_tax AS DECIMAL(4,2)) AS tax_d")
        .groupBy("disc_pct", "tax_pct")
        .agg(cnt.as("n_items"), sum("net_d").as("net"), sum("tax_d").as("tax"))
        .selectExpr("disc_pct", "tax_pct", "n_items",
          "CAST(net AS DOUBLE) AS net_revenue",
          "CAST(tax AS DOUBLE) AS tax_collected",
          "CAST(CAST(tax * 1000000 AS DECIMAL(25,0)) * 1000000 " +
            "DIV CAST(net * 1000000 AS DECIMAL(25,0)) AS BIGINT) AS effective_tax_ppm")
        .orderBy("disc_pct", "tax_pct")
    })
  )

  /** DuckDB oracles — SUM-derived BIGINT outputs CAST (HUGEINT
    * discipline); quantiles by the same value-level cumulative
    * threshold pick as the Spark side. */
  val oracle: Map[String, String] = Map(
    "q173_ship_lag_profile" -> """
WITH lag AS (SELECT o_orderpriority pri,
    CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) lag
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
counts AS (SELECT pri, lag, COUNT(*) c FROM lag GROUP BY pri, lag),
cum AS (SELECT pri, lag, SUM(c) OVER (PARTITION BY pri ORDER BY lag
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum FROM counts),
tot AS (SELECT pri, COUNT(*) n,
    SUM(CASE WHEN lag > 365 THEN 1 ELSE 0 END) n_ov FROM lag GROUP BY pri)
SELECT t.pri o_orderpriority, CAST(t.n AS BIGINT) n_items,
  MIN(CASE WHEN cum.cum >= (t.n + 1) // 2 THEN cum.lag END) median_lag_days,
  MIN(CASE WHEN cum.cum >= (9 * t.n + 9) // 10 THEN cum.lag END) p90_lag_days,
  CAST(CAST(t.n_ov AS BIGINT) * 1000000 // t.n AS BIGINT) overdue_ppm
FROM cum JOIN tot t ON t.pri = cum.pri
GROUP BY t.pri, t.n, t.n_ov ORDER BY o_orderpriority""",

    "q174_source_concentration" -> """
WITH by_src AS (SELECT source, COUNT(*) n_docs, CAST(SUM(n_chars) AS BIGINT) chars
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(chars) AS BIGINT) tot FROM by_src),
shares AS (SELECT source, n_docs, chars,
    CAST(chars * 1000000 // tot.tot AS BIGINT) share_ppm FROM by_src CROSS JOIN tot),
hhi AS (SELECT CAST(CAST(SUM(share_ppm * share_ppm) AS BIGINT) // 1000000 AS BIGINT) hhi_ppm FROM shares)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY share_ppm DESC, source) AS BIGINT) rank,
  source, n_docs, chars n_chars, share_ppm,
  CAST(SUM(share_ppm) OVER (ORDER BY share_ppm DESC, source
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum_share_ppm,
  hhi.hhi_ppm
FROM shares CROSS JOIN hhi ORDER BY rank""",

    "q175_segment_migration" -> """
WITH mid AS (SELECT (epoch_us(MIN(o_orderdate)) + epoch_us(MAX(o_orderdate))) // 2 mid FROM orders),
spend AS (SELECT o_custkey,
    CASE WHEN epoch_us(o_orderdate) < mid THEN 1 ELSE 2 END half,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) spend
  FROM orders CROSS JOIN mid GROUP BY o_custkey, half),
both_c AS (SELECT o_custkey FROM spend GROUP BY o_custkey HAVING COUNT(*) = 2),
sp AS (SELECT spend.* FROM spend JOIN both_c USING (o_custkey)),
n1 AS (SELECT COUNT(*) n FROM sp WHERE half = 1),
n2 AS (SELECT COUNT(*) n FROM sp WHERE half = 2),
v1 AS (SELECT spend, COUNT(*) c FROM sp WHERE half = 1 GROUP BY spend),
v2 AS (SELECT spend, COUNT(*) c FROM sp WHERE half = 2 GROUP BY spend),
q1m AS (SELECT spend, CAST(COALESCE(SUM(c) OVER (ORDER BY spend
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 4 // n1.n + 1 AS BIGINT) q1
  FROM v1 CROSS JOIN n1),
q2m AS (SELECT spend, CAST(COALESCE(SUM(c) OVER (ORDER BY spend
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 4 // n2.n + 1 AS BIGINT) q2
  FROM v2 CROSS JOIN n2),
h1 AS (SELECT o_custkey, q1 FROM sp JOIN q1m USING (spend) WHERE half = 1),
h2 AS (SELECT o_custkey, q2 FROM sp JOIN q2m USING (spend) WHERE half = 2),
matrix AS (SELECT q1, q2, COUNT(*) n_customers FROM h1 JOIN h2 USING (o_custkey) GROUP BY q1, q2),
row_tot AS (SELECT q1, CAST(SUM(n_customers) AS BIGINT) row_n FROM matrix GROUP BY q1)
SELECT m.q1 q_first, m.q2 q_last, m.n_customers,
  CAST(m.n_customers * 1000000 // rt.row_n AS BIGINT) origin_share_ppm
FROM matrix m JOIN row_tot rt ON rt.q1 = m.q1
ORDER BY q_first, q_last""",

    "q176_event_type_overlap" -> """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
aud AS (SELECT event_type, COUNT(*) n_aud FROM ut GROUP BY event_type),
inter AS (SELECT a.event_type ta, b.event_type tb, COUNT(*) n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY ta, tb)
SELECT i.ta type_a, i.tb type_b, aa.n_aud n_a, ab.n_aud n_b, i.n_both,
  CAST(i.n_both * 1000000 // (aa.n_aud + ab.n_aud - i.n_both) AS BIGINT) jaccard_ppm
FROM inter i JOIN aud aa ON aa.event_type = i.ta JOIN aud ab ON ab.event_type = i.tb
ORDER BY type_a, type_b""",

    "q177_length_novelty_grid" -> """
WITH d AS (SELECT doc_id, n_chars, list_filter(string_split(lower(text), ' '), x -> x <> '') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l) - 2)) i, l FROM d WHERE len(l) >= 3),
t AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] sh FROM s),
df AS (SELECT sh, COUNT(*) dfreq FROM t GROUP BY sh),
per_doc AS (SELECT t.doc_id, COUNT(*) nt,
    SUM(CASE WHEN df.dfreq = 1 THEN 1 ELSE 0 END) nu
  FROM t JOIN df ON df.sh = t.sh GROUP BY t.doc_id),
g AS (SELECT d.n_chars // 256 len_block, p.nt, p.nu
  FROM per_doc p JOIN d ON d.doc_id = p.doc_id)
SELECT len_block, COUNT(*) n_docs,
  CAST(SUM(nt) AS BIGINT) n_shingles, CAST(SUM(nu) AS BIGINT) n_unique,
  CAST(CAST(SUM(nu) AS BIGINT) * 1000000 // CAST(SUM(nt) AS BIGINT) AS BIGINT) unique_ppm
FROM g GROUP BY len_block ORDER BY len_block""",

    "q178_revenue_pareto" -> """
WITH spend AS (SELECT o_custkey,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) spend
  FROM orders GROUP BY o_custkey),
tot AS (SELECT COUNT(*) n, CAST(SUM(spend) AS BIGINT) tot_rev FROM spend),
vals AS (SELECT spend, COUNT(*) c, CAST(SUM(spend) AS BIGINT) rev FROM spend GROUP BY spend),
cums AS (SELECT spend,
    CAST(SUM(c) OVER (ORDER BY spend DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum_cust,
    CAST(SUM(rev) OVER (ORDER BY spend DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum_rev
  FROM vals)
SELECT CAST((cum_cust * 10 + tot.n - 1) // tot.n AS BIGINT) decile,
  CAST(MAX(cum_cust) AS BIGINT) n_customers_cum,
  CAST(MAX(cum_rev * 1000000 // tot.tot_rev) AS BIGINT) revenue_cum_ppm
FROM cums CROSS JOIN tot
GROUP BY decile ORDER BY decile""",

    "q179_supply_redundancy" -> """
WITH per_part AS (SELECT l_partkey,
    COUNT(DISTINCT l_suppkey) n_suppliers,
    SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) rev_d
  FROM lineitem GROUP BY l_partkey),
tot AS (SELECT SUM(rev_d) tot_d FROM per_part)
SELECT n_suppliers, COUNT(*) n_parts,
  CAST(SUM(rev_d) AS DOUBLE) net_revenue,
  CAST(CAST(SUM(rev_d) * 10000 AS HUGEINT) * 1000000 // CAST(tot.tot_d * 10000 AS HUGEINT) AS BIGINT) revenue_share_ppm
FROM per_part CROSS JOIN tot
GROUP BY n_suppliers, tot.tot_d ORDER BY n_suppliers""",

    "q180_tax_discount_grid" -> """
WITH li AS (SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) disc_pct,
    CAST(ROUND(l_tax * 100, 0) AS BIGINT) tax_pct,
    CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) net_d,
    CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * CAST(l_tax AS DECIMAL(4,2)) tax_d
  FROM lineitem)
SELECT disc_pct, tax_pct, COUNT(*) n_items,
  CAST(SUM(net_d) AS DOUBLE) net_revenue,
  CAST(SUM(tax_d) AS DOUBLE) tax_collected,
  CAST(CAST(SUM(tax_d) * 1000000 AS HUGEINT) * 1000000 // CAST(SUM(net_d) * 1000000 AS HUGEINT) AS BIGINT) effective_tax_ppm
FROM li GROUP BY disc_pct, tax_pct ORDER BY disc_pct, tax_pct"""
  ).map { case (k, v) => k -> v.trim }
}
