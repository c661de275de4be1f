package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Windows
import graft.sources.Tables

/** Spectrum & census wave (q181–q188, round 7): the distributional
  * censuses that calibrate both the engine and the corpus — order
  * fan-out (the join-cardinality evidence q143 estimates against,
  * q181), top-spender set stability across years (q182), the shingle
  * document-frequency spectrum (the "how much boilerplate" census,
  * q183), JSON property profiles over the event stream (q184), the
  * account-balance × revenue quartile grid (q185), weekday/weekend
  * value shift (q186), the brand × type dimension census (q187), and
  * priority mix drift across years (q188).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * The wave keeps the flow-wave disciplines: quantiles and top-k sets
  * are VALUE-threshold picks from prefix sums (ties included — no
  * rank window over facts, deterministic across engines); df spectrum
  * buckets are an integer CASE chain (a float log2 would flip at
  * exact powers of two); weekend predicates are written per-engine
  * against each engine's own day-numbering convention.
  */
object Spectrum {

  private def cnt = count(lit(1))

  private val netD =
    "CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  def queries: Map[String, Queries.QueryFn] = Map(

    // Order fan-out profile: how many lineitems does an order really
    // have, and where does the revenue sit along that histogram —
    // the measured join-cardinality evidence behind every
    // orders⋈lineitem estimate. Two stacked hash aggs; revenue exact
    // DECIMAL; shares against broadcast 1-row totals.
    "q181_order_fill_profile" -> ((s, dir) => {
      val perOrder = Tables.load(s, dir, "lineitem")
        .selectExpr("l_orderkey", s"$netD AS net_d")
        .groupBy("l_orderkey").agg(cnt.as("n_lines"), sum("net_d").as("rev_d"))
      val tot = perOrder.agg(cnt.as("n_orders_tot"), sum("rev_d").as("tot_d"))
      perOrder.groupBy("n_lines").agg(cnt.as("n_orders"), sum("rev_d").as("lvl_d"))
        .crossJoin(broadcast(tot))
        .selectExpr("n_lines", "n_orders",
          "CAST(lvl_d AS DOUBLE) AS net_revenue",
          "n_orders * 1000000 DIV n_orders_tot AS order_share_ppm",
          "CAST(CAST(lvl_d * 10000 AS DECIMAL(19,0)) * 1000000 " +
            "DIV CAST(tot_d * 10000 AS DECIMAL(19,0)) AS BIGINT) AS revenue_share_ppm")
        .orderBy("n_lines")
    }),

    // Top-spender stability: the top-100-by-spend customer SETS of
    // the first and last order years, their overlap and Jaccard — is
    // the head of the revenue distribution the same people? The
    // "top 100" is a VALUE cut: threshold = the 100th-largest spend
    // picked from a descending value-level prefix sum, ties included
    // — deterministic, no rank window over customers.
    "q182_top_customer_stability" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val yy = o.agg(min(year(col("o_orderdate"))).as("y1"),
        max(year(col("o_orderdate"))).as("y2"))
      val spend = o.crossJoin(broadcast(yy))
        .filter(year(col("o_orderdate")) === col("y1") ||
          year(col("o_orderdate")) === col("y2"))
        .selectExpr("o_custkey",
          "CASE WHEN year(o_orderdate) = y1 THEN 1 ELSE 2 END AS ep",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents")
        .groupBy("ep", "o_custkey").agg(sum("cents").as("spend"))
        .localCheckpoint() // threshold leg + the set census
      // round-11: ONE prefix sum KEYED by epoch replaces the two
      // per-epoch legs and their two checkpoints; the top sets live in
      // one ep-tagged relation, set sizes pivot by conditional max and
      // the overlap is a per-customer count==2 census instead of a
      // self-join (guide §2.4; identical values)
      val vals = spend.groupBy("ep", "spend").agg(cnt.as("c"))
        .withColumn("neg", -col("spend"))
      val n = spend.groupBy("ep").agg(cnt.as("n"))
      val thr = Windows.prefixSum(vals, Seq("ep"), "neg", "c", "cum")
        .join(broadcast(n), "ep")
        .groupBy("ep")
        .agg(max(when(col("cum") >= least(lit(100L), col("n")), col("spend")))
          .as("thr"))
      val tops = spend.join(broadcast(thr), "ep")
        .filter(col("spend") >= col("thr"))
        .select(col("ep"), col("o_custkey"), col("thr"))
        .localCheckpoint() // sizes pivot + overlap census
      val nn = tops.groupBy("ep").agg(cnt.as("nt"), min("thr").as("thrv"))
        .groupBy()
        .agg(max(when(col("ep") === 1, col("nt"))).as("n_top_first"),
          max(when(col("ep") === 2, col("nt"))).as("n_top_last"),
          max(when(col("ep") === 1, col("thrv"))).as("thr_first_cents"),
          max(when(col("ep") === 2, col("thrv"))).as("thr_last_cents"))
      val common = tops.groupBy("o_custkey").agg(cnt.as("k"))
        .agg(sum(when(col("k") === 2L, 1L).otherwise(0L)).as("n_common"))
      yy.crossJoin(broadcast(nn))
        .crossJoin(broadcast(common))
        .selectExpr("CAST(y1 AS BIGINT) AS year_first", "CAST(y2 AS BIGINT) AS year_last",
          "n_top_first", "n_top_last", "n_common",
          "n_common * 1000000 DIV (n_top_first + n_top_last - n_common) AS jaccard_ppm",
          "thr_first_cents", "thr_last_cents")
    }),

    // Shingle document-frequency spectrum: how many 3-gram shingles
    // live at each power-of-two df band, and what share of all
    // shingle OCCURRENCES they carry — the boilerplate census that
    // justifies every maxDf cap in the dedup family. Buckets are an
    // integer CASE chain (float log2 flips at exact powers of two).
    "q183_shingle_df_spectrum" -> ((s, dir) => {
      val t = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          expr("filter(split(lower(text), ' '), x -> x != '')").as("l"))
        .filter(size(col("l")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(l) - 3), i -> concat(l[i], ' ', l[i+1], ' ', l[i+2]))"))
          .as("sh")).distinct()
      val bucket = (1 to 10).foldLeft(when(col("dfreq") < 2L, 0L)) {
        case (acc, b) => acc.when(col("dfreq") < (2L << b), b.toLong)
      }.otherwise(11L)
      val spec = t.groupBy("sh").agg(cnt.as("dfreq"))
        .withColumn("df_band", bucket)
        .groupBy("df_band")
        .agg(cnt.as("n_shingles"), sum("dfreq").as("n_occurrences"))
      val tot = spec.agg(sum("n_occurrences").as("tot"))
      spec.crossJoin(broadcast(tot))
        .selectExpr("df_band", "n_shingles", "n_occurrences",
          "n_occurrences * 1000000 DIV tot AS occurrence_share_ppm")
        .orderBy("df_band")
    }),

    // JSON property profile: the event stream's props column decoded
    // ($.k, the q28 extraction) into a per-type value-bucket
    // histogram with each type's share — the semi-structured twin of
    // a numeric histogram. One extraction projection + two hash aggs.
    "q184_props_value_profile" -> ((s, dir) => {
      val k = Tables.load(s, dir, "events")
        .selectExpr("event_type",
          "CAST(get_json_object(props, '$.k') AS BIGINT) AS k")
        .filter(col("k").isNotNull)
      val grid = k.selectExpr("event_type", "k DIV 10 AS k_band")
        .groupBy("event_type", "k_band").agg(cnt.as("n"))
      val tot = k.groupBy("event_type").agg(cnt.as("n_type"))
      grid.join(broadcast(tot), "event_type")
        .selectExpr("event_type", "k_band", "n",
          "n * 1000000 DIV n_type AS type_share_ppm")
        .orderBy("event_type", "k_band")
    }),

    // Account balance × realized revenue: quartile each customer on
    // declared balance and on actual order revenue (0 for the
    // orderless), and cross-tabulate — does the balance field predict
    // value? Quartiles are value-level EXCLUSIVE prefix sums (ties —
    // including the whole zero-revenue group — share a quartile).
    "q185_acctbal_revenue_grid" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .selectExpr("c_custkey",
          "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal")
      val rev = Tables.load(s, dir, "orders")
        .selectExpr("o_custkey",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents")
        .groupBy("o_custkey").agg(sum("cents").as("rev"))
      val cr = cust.join(rev, col("c_custkey") === col("o_custkey"), "left")
        .selectExpr("c_custkey", "bal", "coalesce(rev, 0L) AS rev")
        .localCheckpoint() // two quartile legs + the final grid
      val n = cr.agg(cnt.as("n"))
      // round-11: the two per-column CDF legs STACK into one keyed
      // prefix sum, and the quartile assignment becomes three
      // broadcast THRESHOLDS + a CASE projection instead of two
      // value-level shuffle joins back onto the customers
      // (q = below*4 DIV n + 1 is a monotone step of `below`, so
      // v >= min{v : below*4 >= j*n} ⟺ q >= j+1 — identical
      // ties-share-a-quartile assignment, zero shuffles of the
      // customer relation; guide §2.4/§3)
      val vals = cr
        .selectExpr("stack(2, 'bal', bal, 'rev', rev) AS (k, v)")
        .groupBy("k", "v").agg(cnt.as("cn"))
      val thr = Windows.prefixSum(vals, Seq("k"), "v", "cn", "below",
          exclusive = true)
        .crossJoin(broadcast(n))
        .groupBy("k")
        .agg(min(when(expr("below * 4 >= n"), col("v"))).as("t2"),
          min(when(expr("below * 4 >= 2 * n"), col("v"))).as("t3"),
          min(when(expr("below * 4 >= 3 * n"), col("v"))).as("t4"))
      val thr1 = thr.groupBy()
        .agg(max(when(col("k") === "bal", col("t2"))).as("b2"),
          max(when(col("k") === "bal", col("t3"))).as("b3"),
          max(when(col("k") === "bal", col("t4"))).as("b4"),
          max(when(col("k") === "rev", col("t2"))).as("r2"),
          max(when(col("k") === "rev", col("t3"))).as("r3"),
          max(when(col("k") === "rev", col("t4"))).as("r4"))
      def q(v: String, t: String) = // BIGINT like the CDF-position form
        s"CAST(CASE WHEN ${t}4 IS NOT NULL AND $v >= ${t}4 THEN 4 " +
          s"WHEN ${t}3 IS NOT NULL AND $v >= ${t}3 THEN 3 " +
          s"WHEN ${t}2 IS NOT NULL AND $v >= ${t}2 THEN 2 ELSE 1 END AS BIGINT)"
      val grid = cr.crossJoin(broadcast(thr1))
        .selectExpr(s"${q("bal", "b")} AS q_bal", s"${q("rev", "r")} AS q_rev")
        .groupBy("q_bal", "q_rev").agg(cnt.as("n_customers"))
      val rowTot = grid.groupBy("q_bal").agg(sum("n_customers").as("row_n"))
      grid.join(broadcast(rowTot), "q_bal")
        .selectExpr("q_bal", "q_rev", "n_customers",
          "n_customers * 1000000 DIV row_n AS balance_share_ppm")
        .orderBy("q_bal", "q_rev")
    }),

    // Weekday/weekend shift: per event type, the exact median value
    // and the per-day volume rate on weekdays vs weekends — a
    // seasonality report with NO arithmetic on the double values
    // (medians are value-threshold picks; day counts come from the
    // data). Weekend predicates are per-engine (Spark weekday()
    // 0=Mon..6=Sun vs DuckDB dayofweek 0=Sun..6=Sat).
    "q186_weekend_value_shift" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .selectExpr("event_type", "value",
          "CASE WHEN weekday(ts) >= 5 THEN 1 ELSE 0 END AS we",
          "date_trunc('day', ts) AS d")
        .localCheckpoint() // counts, day census, and the value census
      val days = ev.select("we", "d").distinct()
        .groupBy("we").agg(cnt.as("n_days"))
      // round-11: per-(type, we) counts re-reduce from the value census
      // (one scan of ev instead of two), the median pick carries n and
      // n_days, and the weekday/weekend pivot is one conditional-max
      // groupBy instead of a two-leg self-join (guide §2.4; identical
      // values)
      val vals = ev.groupBy("event_type", "we", "value").agg(cnt.as("c"))
      val counts = vals.groupBy("event_type", "we").agg(sum("c").as("n"))
      val med = Windows.prefixSum(vals, Seq("event_type", "we"), "value", "c", "cum")
        .join(broadcast(counts), Seq("event_type", "we"))
        .groupBy("event_type", "we")
        .agg(min(when(col("cum") >= expr("(n + 1) DIV 2"), col("value")))
          .as("median_value"),
          max("n").as("n")) // n is constant per (type, we)
      med.join(broadcast(days), "we")
        .groupBy("event_type")
        .agg(max(when(col("we") === 0, col("n"))).as("n_wd"),
          max(when(col("we") === 1, col("n"))).as("n_we"),
          max(when(col("we") === 0, col("median_value"))).as("median_wd"),
          max(when(col("we") === 1, col("median_value"))).as("median_we"),
          max(when(col("we") === 0, col("n_days"))).as("days_wd"),
          max(when(col("we") === 1, col("n_days"))).as("days_we"))
        // the previous shape inner-joined the two sides — a type seen
        // on only one side must stay excluded
        .filter(col("n_wd").isNotNull && col("n_we").isNotNull)
        .selectExpr("event_type", "n_wd", "n_we", "median_wd", "median_we",
          "(n_we * days_wd) * 1000000 DIV (n_wd * days_we) AS rate_ratio_ppm")
        .orderBy("event_type")
    }),

    // Brand × type dimension census: distinct parts and integer mean
    // centiprice per cell, each cell's share of its brand — the
    // catalog-shape report a partition planner reads before choosing
    // a clustering key. Two hash aggs over the dimension scan.
    "q187_brand_type_coverage" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .selectExpr("p_brand", "p_type",
          "CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS centi")
      val cell = p.groupBy("p_brand", "p_type")
        .agg(cnt.as("n_parts"), sum("centi").as("sc"))
      val brandTot = cell.groupBy("p_brand").agg(sum("n_parts").as("brand_n"))
      cell.join(broadcast(brandTot), "p_brand")
        .selectExpr("p_brand", "p_type", "n_parts",
          "sc DIV n_parts AS mean_centiprice",
          "n_parts * 1000000 DIV brand_n AS brand_share_ppm")
        .orderBy("p_brand", "p_type")
    }),

    // Priority mix drift: each order priority's share of its year vs
    // its share in the FIRST year — did urgency creep in? Drift is a
    // subtraction of two non-negative integer shares (never an
    // integral division of a negative — Spark floors, DuckDB rounds).
    "q188_priority_mix_drift" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .selectExpr("CAST(year(o_orderdate) AS BIGINT) AS y", "o_orderpriority AS pri")
      val mix = o.groupBy("y", "pri").agg(cnt.as("n"))
      val yrTot = mix.groupBy("y").agg(sum("n").as("y_n"))
      val shares = mix.join(broadcast(yrTot), "y")
        .selectExpr("y", "pri", "n", "n * 1000000 DIV y_n AS share_ppm")
        .localCheckpoint() // base-year leg + the final report
      val y0 = shares.agg(min("y").as("y0"))
      val base = shares.crossJoin(broadcast(y0)).filter(col("y") === col("y0"))
        .selectExpr("pri", "share_ppm AS base_share_ppm")
      shares.join(broadcast(base), "pri")
        .selectExpr("y AS year", "pri AS o_orderpriority", "n AS n_orders",
          "share_ppm", "share_ppm - base_share_ppm AS drift_ppm")
        .orderBy("year", "o_orderpriority")
    })
  )

  /** DuckDB oracles — SUM-derived BIGINT outputs CAST; weekend
    * predicate in DuckDB's own day numbering. */
  val oracle: Map[String, String] = Map(
    "q181_order_fill_profile" -> """
WITH per_o AS (SELECT l_orderkey, COUNT(*) n_lines,
    SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) rev_d
  FROM lineitem GROUP BY l_orderkey),
tot AS (SELECT COUNT(*) n_orders_tot, SUM(rev_d) tot_d FROM per_o)
SELECT n_lines, COUNT(*) n_orders,
  CAST(SUM(rev_d) AS DOUBLE) net_revenue,
  CAST(COUNT(*) * 1000000 // tot.n_orders_tot AS BIGINT) order_share_ppm,
  CAST(CAST(SUM(rev_d) * 10000 AS HUGEINT) * 1000000 // CAST(tot.tot_d * 10000 AS HUGEINT) AS BIGINT) revenue_share_ppm
FROM per_o CROSS JOIN tot
GROUP BY n_lines, tot.n_orders_tot, tot.tot_d ORDER BY n_lines""",

    "q182_top_customer_stability" -> """
WITH yy AS (SELECT MIN(year(o_orderdate)) y1, MAX(year(o_orderdate)) y2 FROM orders),
spend AS (SELECT CASE WHEN year(o_orderdate) = yy.y1 THEN 1 ELSE 2 END ep, o_custkey,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) spend
  FROM orders CROSS JOIN yy
  WHERE year(o_orderdate) = yy.y1 OR year(o_orderdate) = yy.y2
  GROUP BY ep, o_custkey),
thr AS (SELECT ep, MAX(spend) FILTER (cum >= k) thr FROM (
    SELECT ep, spend,
      CAST(SUM(c) OVER (PARTITION BY ep ORDER BY spend DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum,
      LEAST(100, SUM(c) OVER (PARTITION BY ep)) k
    FROM (SELECT ep, spend, COUNT(*) c FROM spend GROUP BY ep, spend))
  GROUP BY ep),
t1 AS (SELECT s.o_custkey, t.thr FROM spend s JOIN thr t ON t.ep = 1 AND s.ep = 1 AND s.spend >= t.thr),
t2 AS (SELECT s.o_custkey, t.thr FROM spend s JOIN thr t ON t.ep = 2 AND s.ep = 2 AND s.spend >= t.thr),
n1 AS (SELECT COUNT(*) n_top_first, CAST(MIN(thr) AS BIGINT) thr_first_cents FROM t1),
n2 AS (SELECT COUNT(*) n_top_last, CAST(MIN(thr) AS BIGINT) thr_last_cents FROM t2),
com AS (SELECT COUNT(*) n_common FROM t1 JOIN t2 USING (o_custkey))
SELECT CAST(yy.y1 AS BIGINT) year_first, CAST(yy.y2 AS BIGINT) year_last,
  n1.n_top_first, n2.n_top_last, com.n_common,
  CAST(com.n_common * 1000000 // (n1.n_top_first + n2.n_top_last - com.n_common) AS BIGINT) jaccard_ppm,
  n1.thr_first_cents, n2.thr_last_cents
FROM yy CROSS JOIN n1 CROSS JOIN n2 CROSS JOIN com""",

    "q183_shingle_df_spectrum" -> """
WITH d AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l) - 2)) i, l FROM d WHERE len(l) >= 3),
t AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] sh FROM s),
df AS (SELECT sh, COUNT(*) dfreq FROM t GROUP BY sh),
spec AS (SELECT CASE WHEN dfreq < 2 THEN 0 WHEN dfreq < 4 THEN 1 WHEN dfreq < 8 THEN 2
      WHEN dfreq < 16 THEN 3 WHEN dfreq < 32 THEN 4 WHEN dfreq < 64 THEN 5
      WHEN dfreq < 128 THEN 6 WHEN dfreq < 256 THEN 7 WHEN dfreq < 512 THEN 8
      WHEN dfreq < 1024 THEN 9 WHEN dfreq < 2048 THEN 10 ELSE 11 END df_band,
    COUNT(*) n_shingles, CAST(SUM(dfreq) AS BIGINT) n_occurrences
  FROM df GROUP BY df_band),
tot AS (SELECT CAST(SUM(n_occurrences) AS BIGINT) tot FROM spec)
SELECT CAST(df_band AS BIGINT) df_band, n_shingles, n_occurrences,
  CAST(n_occurrences * 1000000 // tot.tot AS BIGINT) occurrence_share_ppm
FROM spec CROSS JOIN tot ORDER BY df_band""",

    "q184_props_value_profile" -> """
WITH k AS (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) k
  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
grid AS (SELECT event_type, k // 10 k_band, COUNT(*) n FROM k GROUP BY event_type, k_band),
tot AS (SELECT event_type, COUNT(*) n_type FROM k GROUP BY event_type)
SELECT g.event_type, CAST(g.k_band AS BIGINT) k_band, g.n,
  CAST(g.n * 1000000 // t.n_type AS BIGINT) type_share_ppm
FROM grid g JOIN tot t ON t.event_type = g.event_type
ORDER BY g.event_type, k_band""",

    "q185_acctbal_revenue_grid" -> """
WITH cust AS (SELECT c_custkey, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) bal FROM customer),
rev AS (SELECT o_custkey, CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) rev
  FROM orders GROUP BY o_custkey),
cr AS (SELECT c_custkey, bal, COALESCE(rev, 0) rev
  FROM cust LEFT JOIN rev ON o_custkey = c_custkey),
n AS (SELECT COUNT(*) n FROM cr),
qb AS (SELECT bal, CAST(COALESCE(SUM(cn) OVER (ORDER BY bal
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 4 // n.n + 1 AS BIGINT) q_bal
  FROM (SELECT bal, COUNT(*) cn FROM cr GROUP BY bal) CROSS JOIN n),
qr AS (SELECT rev, CAST(COALESCE(SUM(cn) OVER (ORDER BY rev
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 4 // n.n + 1 AS BIGINT) q_rev
  FROM (SELECT rev, COUNT(*) cn FROM cr GROUP BY rev) CROSS JOIN n),
grid AS (SELECT q_bal, q_rev, COUNT(*) n_customers
  FROM cr JOIN qb USING (bal) JOIN qr USING (rev) GROUP BY q_bal, q_rev),
row_tot AS (SELECT q_bal, CAST(SUM(n_customers) AS BIGINT) row_n FROM grid GROUP BY q_bal)
SELECT g.q_bal, g.q_rev, g.n_customers,
  CAST(g.n_customers * 1000000 // rt.row_n AS BIGINT) balance_share_ppm
FROM grid g JOIN row_tot rt ON rt.q_bal = g.q_bal
ORDER BY g.q_bal, g.q_rev""",

    "q186_weekend_value_shift" -> """
WITH ev AS (SELECT event_type, value,
    CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END we,
    date_trunc('day', ts) d
  FROM events),
days AS (SELECT we, COUNT(*) n_days FROM (SELECT DISTINCT we, d FROM ev) GROUP BY we),
counts AS (SELECT event_type, we, COUNT(*) n FROM ev GROUP BY event_type, we),
vals AS (SELECT event_type, we, value, COUNT(*) c FROM ev GROUP BY event_type, we, value),
cum AS (SELECT event_type, we, value, SUM(c) OVER (PARTITION BY event_type, we
    ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum FROM vals),
med AS (SELECT cum.event_type, cum.we,
    MIN(CASE WHEN cum.cum >= (c.n + 1) // 2 THEN cum.value END) median_value
  FROM cum JOIN counts c ON c.event_type = cum.event_type AND c.we = cum.we
  GROUP BY cum.event_type, cum.we)
SELECT cwd.event_type,
  CAST(cwd.n AS BIGINT) n_wd, CAST(cwe.n AS BIGINT) n_we,
  mwd.median_value median_wd, mwe.median_value median_we,
  CAST((cwe.n * dwd.n_days) * 1000000 // (cwd.n * dwe.n_days) AS BIGINT) rate_ratio_ppm
FROM counts cwd
JOIN counts cwe ON cwe.event_type = cwd.event_type AND cwd.we = 0 AND cwe.we = 1
JOIN med mwd ON mwd.event_type = cwd.event_type AND mwd.we = 0
JOIN med mwe ON mwe.event_type = cwd.event_type AND mwe.we = 1
JOIN days dwd ON dwd.we = 0 JOIN days dwe ON dwe.we = 1
ORDER BY cwd.event_type""",

    "q187_brand_type_coverage" -> """
WITH p AS (SELECT p_brand, p_type, CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) centi FROM part),
cell AS (SELECT p_brand, p_type, COUNT(*) n_parts, CAST(SUM(centi) AS BIGINT) sc
  FROM p GROUP BY p_brand, p_type),
bt AS (SELECT p_brand, CAST(SUM(n_parts) AS BIGINT) brand_n FROM cell GROUP BY p_brand)
SELECT c.p_brand, c.p_type, c.n_parts,
  CAST(c.sc // c.n_parts AS BIGINT) mean_centiprice,
  CAST(c.n_parts * 1000000 // bt.brand_n AS BIGINT) brand_share_ppm
FROM cell c JOIN bt ON bt.p_brand = c.p_brand
ORDER BY c.p_brand, c.p_type""",

    "q188_priority_mix_drift" -> """
WITH mix AS (SELECT CAST(year(o_orderdate) AS BIGINT) y, o_orderpriority pri, COUNT(*) n
  FROM orders GROUP BY y, pri),
yr AS (SELECT y, CAST(SUM(n) AS BIGINT) y_n FROM mix GROUP BY y),
shares AS (SELECT m.y, m.pri, m.n, CAST(m.n * 1000000 // yr.y_n AS BIGINT) share_ppm
  FROM mix m JOIN yr ON yr.y = m.y),
y0 AS (SELECT MIN(y) y0 FROM shares),
base AS (SELECT pri, share_ppm base_share_ppm FROM shares CROSS JOIN y0 WHERE y = y0.y0)
SELECT s.y AS "year", s.pri o_orderpriority, s.n n_orders, s.share_ppm,
  CAST(s.share_ppm - b.base_share_ppm AS BIGINT) drift_ppm
FROM shares s JOIN base b ON b.pri = s.pri
ORDER BY "year", o_orderpriority"""
  ).map { case (k, v) => k -> v.trim }
}
