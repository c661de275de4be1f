package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Text
import graft.operators.Windows
import graft.sources.Tables

/** Gains & composition wave (q261–q268, round 7): cumulative-share
  * curves and compositional profiles — the customer-value gains curve
  * (q261), hapax token mass (q262), seasonal amplitude (q263),
  * zero-discount policy by quantity band (q264), first-brand loyalty
  * (q265), supplier rank-quartile migration between endpoint years
  * (q266), month-end order bias (q267), and the part-size profile per
  * brand (q268).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * Decile/quartile positions come from value-level CDF positions
  * ((cum−1)·k DIV n over the reduced value domain, ties sharing a
  * cell) — rank-free, no window over a data-sized partition; all
  * shares are non-negative integer ppm; oracle aliases always use
  * `AS` (the DuckDB bare-alias reserved list).
  */
object Gains {

  private def cnt = count(lit(1))

  /** header order value in exact cents (scale-2 source, no residue). */
  private val orderCents =
    "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"

  def queries: Map[String, Queries.QueryFn] = Map(

    // The gains curve: customers into value deciles by lifetime
    // revenue — what share of total revenue does each decile hold,
    // and cumulatively from the top? Decile = CDF position over the
    // reduced revenue domain ((cum−1)·10 DIV n; ties share a decile);
    // the cumulative share runs over the bounded 10-row curve.
    "q261_value_gains_curve" -> ((s, dir) => {
      val rev = Tables.load(s, dir, "orders")
        .selectExpr("o_custkey", s"$orderCents AS c2")
        .groupBy("o_custkey").agg(sum("c2").as("rev"))
      val rc = rev.groupBy("rev").agg(cnt.as("c"))
      val n = rc.agg(sum("c").as("n"))
      val dec = Windows.prefixSum(rc, Nil, "rev", "c", "cum")
        .crossJoin(broadcast(n))
        .selectExpr("rev", "c", "(cum - 1) * 10 DIV n AS decile")
        .groupBy("decile")
        .agg(sum("c").as("n_customers"), sum(expr("rev * c")).as("d_rev"))
        .localCheckpoint() // curve + the 1-row total
      val tot = dec.agg(sum("d_rev").as("t_rev"))
      val w = Window.orderBy(col("decile").desc) // 10-row curve, bounded
      dec.crossJoin(broadcast(tot))
        .withColumn("cum_top", sum("d_rev").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .selectExpr("decile", "n_customers",
          "d_rev * 1000000 DIV t_rev AS share_ppm",
          "cum_top * 1000000 DIV t_rev AS cum_from_top_ppm")
        .orderBy("decile")
    }),

    // Hapax mass: tokens appearing in exactly ONE document — what
    // share of each language's vocabulary and token mass do they
    // carry? The long-tail tell for vocabulary pruning. One tokenize
    // + stacked aggs over the (lang, token) reduction.
    "q262_hapax_mass" -> ((s, dir) => {
      val lt = Tables.load(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          explode(Text.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("lang", "tok")
        .agg(countDistinct(col("doc_id")).as("df"), cnt.as("mass"))
      lt.groupBy("lang")
        .agg(cnt.as("vocab"), sum("mass").as("mass"),
          sum(when(col("df") === 1L, 1L).otherwise(0L)).as("hapax_vocab"),
          sum(when(col("df") === 1L, col("mass")).otherwise(0L))
            .as("hapax_mass"))
        .selectExpr("lang", "vocab", "hapax_vocab",
          "hapax_vocab * 1000000 DIV vocab AS hapax_vocab_ppm",
          "hapax_mass * 1000000 DIV mass AS hapax_mass_ppm")
        .orderBy("lang")
    }),

    // Seasonal amplitude: per event type, the spread of monthly
    // activity over the 12 month-of-year cells — (max−min)·10⁶ DIV
    // max. A flat profile scores 0; a one-month spike scores near 10⁶.
    "q263_month_amplitude" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .selectExpr("event_type", "CAST(month(ts) AS BIGINT) AS m")
        .groupBy("event_type", "m").agg(cnt.as("n_m"))
        .groupBy("event_type")
        .agg(cnt.as("n_months"), sum("n_m").as("n"),
          min("n_m").as("min_month"), max("n_m").as("max_month"))
        .selectExpr("event_type", "n_months", "n", "min_month", "max_month",
          "(max_month - min_month) * 1000000 DIV max_month AS amplitude_ppm")
        .orderBy("event_type")
    }),

    // Zero-discount policy: the share of undiscounted lines per
    // quantity band — are big orders always discounted? One
    // fixed-domain grid agg; discounts compare as exact scale-2
    // integers.
    "q264_zero_discount_bands" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .selectExpr("CAST(l_quantity AS BIGINT) DIV 10 AS qty_band",
          "CASE WHEN CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) = 0 THEN 1L ELSE 0L END AS z")
        .groupBy("qty_band")
        .agg(cnt.as("n_lines"), sum("z").as("n_zero"))
        .selectExpr("qty_band", "n_lines", "n_zero",
          "n_zero * 1000000 DIV n_lines AS zero_ppm")
        .orderBy("qty_band")
    }),

    // First-brand loyalty: is the brand of a customer's FIRST order
    // line still their modal brand over their lifetime? First = (min
    // date, min order, min line) pick; the generator emits DUPLICATE
    // line numbers within an order (q257 measures it), so the brand
    // itself is the final tie-break — the picked BRAND is then total-
    // ordered even where rows are not. Modal = argmax line count,
    // ties to the smallest brand. Census per segment.
    "q265_first_brand_loyalty" -> ((s, dir) => {
      val lines = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_linenumber")
        .join(Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.load(s, dir, "part")
          .select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select("o_custkey", "o_orderdate", "o_orderkey", "l_linenumber",
          "p_brand")
      // round-11: the first pick and the modal argmax come out of ONE
      // two-level aggregation — per (customer, brand) the earliest
      // (date, order, line) triple and the line count, then per
      // customer min-struct on ((triple), brand) for the first pick
      // (same 4-key tie order the row_number window used) and on
      // (−count, brand) for the modal — replacing the window leg, the
      // mx join-back, the first⋈modal join and the checkpoint
      // (guide §2.4; identical values)
      val pick = lines.groupBy("o_custkey", "p_brand")
        .agg(cnt.as("c"),
          min(struct(col("o_orderdate").as("d"), col("o_orderkey").as("o"),
            col("l_linenumber").as("l"))).as("m"))
        .groupBy("o_custkey")
        .agg(min(struct(col("m").as("m"), col("p_brand").as("b"))).as("f"),
          min(struct((-col("c")).as("nc"), col("p_brand").as("b"))).as("w"))
        .selectExpr("o_custkey", "f.b AS first_brand", "w.b AS modal_brand")
      pick
        .join(broadcast(Tables.load(s, dir, "customer")
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(cnt.as("n_customers"),
          sum(when(col("first_brand") === col("modal_brand"), 1L)
            .otherwise(0L)).as("n_loyal"))
        .selectExpr("c_mktsegment", "n_customers", "n_loyal",
          "n_loyal * 1000000 DIV n_customers AS loyal_ppm")
        .orderBy("c_mktsegment")
    }),

    // Supplier quartile migration: each supplier's revenue quartile
    // in the first full year (1995) vs the last (2000) — the 4×4
    // status-transition matrix. Quartiles are CDF positions over each
    // year's reduced revenue domain ((cum−1)·4 DIV n), rank-free.
    "q266_supplier_quartile_shift" -> ((s, dir) => {
      val yr = Tables.load(s, dir, "lineitem")
        .selectExpr("l_suppkey", "CAST(year(l_shipdate) AS BIGINT) AS y",
          "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT) AS c4")
        .filter(col("y").isin(1995L, 2000L))
        .groupBy("y", "l_suppkey").agg(sum("c4").as("rev"))
        .localCheckpoint() // CDF + membership legs
      val rc = yr.groupBy("y", "rev").agg(cnt.as("c"))
      val rt = rc.groupBy("y").agg(sum("c").as("n"))
      // round-11: the quartile assignment becomes three broadcast
      // THRESHOLDS + a CASE projection instead of a value-level
      // shuffle join back onto the suppliers ((cum−1)*4 DIV n is a
      // monotone step of cum, so rev >= min{rev : (cum−1)*4 >= j*n}
      // ⟺ quart >= j — identical ties-share-a-quartile assignment),
      // and the 1995→2000 pivot is one conditional-max groupBy per
      // supplier instead of a self-join (guide §2.4/§3; identical
      // values)
      val thr = Windows.prefixSum(rc, Seq("y"), "rev", "c", "cum")
        .join(broadcast(rt), "y")
        .groupBy("y")
        .agg(min(when(expr("(cum - 1) * 4 >= n"), col("rev"))).as("t1"),
          min(when(expr("(cum - 1) * 4 >= 2 * n"), col("rev"))).as("t2"),
          min(when(expr("(cum - 1) * 4 >= 3 * n"), col("rev"))).as("t3"))
      val qs = yr.join(broadcast(thr), "y")
        .selectExpr("y", "l_suppkey",
          "CAST(CASE WHEN t3 IS NOT NULL AND rev >= t3 THEN 3 " +
            "WHEN t2 IS NOT NULL AND rev >= t2 THEN 2 " +
            "WHEN t1 IS NOT NULL AND rev >= t1 THEN 1 ELSE 0 END AS BIGINT) AS quart")
      qs.groupBy("l_suppkey")
        .agg(max(when(col("y") === 1995L, col("quart"))).as("q95"),
          max(when(col("y") === 2000L, col("quart"))).as("q00"))
        .filter(col("q95").isNotNull && col("q00").isNotNull)
        .groupBy("q95", "q00").agg(cnt.as("n_suppliers"))
        .orderBy("q95", "q00")
    }),

    // Month-end bias: the share of orders landing in the last three
    // days of their month, per priority — the fiscal-deadline tell.
    // Pure calendar projection + one grid agg.
    "q267_month_end_bias" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .selectExpr("o_orderpriority AS prio",
          "CASE WHEN day(o_orderdate) >= day(last_day(o_orderdate)) - 2 THEN 1L ELSE 0L END AS me")
        .groupBy("prio")
        .agg(cnt.as("n_orders"), sum("me").as("n_month_end"))
        .selectExpr("prio", "n_orders", "n_month_end",
          "n_month_end * 1000000 DIV n_orders AS month_end_ppm")
        .orderBy("prio")
    }),

    // Part-size profile: per brand, the size spread and the modal
    // size's share — catalog uniformity. Argmax ties to the smallest
    // size; a dimension-only query (no fact scan at all).
    "q268_size_profile" -> ((s, dir) => {
      // round-11: totals and the (max count, min size) modal argmax
      // are ONE aggregation — min-struct on (−c, sz) — replacing the
      // separate mx leg, join-back filter and reassembly join
      // (guide §2.4; identical values)
      Tables.load(s, dir, "part")
        .selectExpr("p_brand", "CAST(p_size AS BIGINT) AS sz")
        .groupBy("p_brand", "sz").agg(cnt.as("c"))
        .groupBy("p_brand")
        .agg(sum("c").as("n_parts"), cnt.as("n_sizes"),
          min("sz").as("min_size"), max("sz").as("max_size"),
          min(struct((-col("c")).as("nc"), col("sz").as("v"))).as("w"))
        .selectExpr("p_brand", "n_parts", "n_sizes", "min_size", "max_size",
          "w.v AS modal_size", "(-w.nc) * 1000000 DIV n_parts AS modal_ppm")
        .orderBy("p_brand")
    })
  )

  /** DuckDB oracles — SUM-derived BIGINT outputs CAST; identical
    * CDF-position, argmax-tie, calendar, and ppm rules; every alias
    * written with AS. */
  val oracle: Map[String, String] = Map(
    "q261_value_gains_curve" -> """
WITH rev AS (SELECT o_custkey, CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY o_custkey),
rc AS (SELECT rev, COUNT(*) AS c FROM rev GROUP BY rev),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM rc),
dec AS (SELECT (CAST(SUM(c) OVER (ORDER BY rev) AS BIGINT) - 1) * 10 // n.n AS decile,
    c, rev FROM rc CROSS JOIN n),
cur AS (SELECT decile, CAST(SUM(c) AS BIGINT) AS n_customers,
    CAST(SUM(rev * c) AS BIGINT) AS d_rev
  FROM dec GROUP BY decile),
tot AS (SELECT CAST(SUM(d_rev) AS BIGINT) AS t_rev FROM cur)
SELECT decile, n_customers,
  CAST(d_rev * 1000000 // t_rev AS BIGINT) AS share_ppm,
  CAST(CAST(SUM(d_rev) OVER (ORDER BY decile DESC) AS BIGINT) * 1000000 // t_rev AS BIGINT) AS cum_from_top_ppm
FROM cur CROSS JOIN tot ORDER BY decile""",

    "q262_hapax_mass" -> """
WITH t AS (SELECT lang, doc_id, UNNEST(string_split(LOWER(text), ' ')) AS tok FROM documents),
lt AS (SELECT lang, tok, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS mass
  FROM t WHERE tok <> '' GROUP BY lang, tok)
SELECT lang, COUNT(*) AS vocab,
  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_vocab,
  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS hapax_vocab_ppm,
  CAST(SUM(CASE WHEN df = 1 THEN mass ELSE 0 END) * 1000000 // SUM(mass) AS BIGINT) AS hapax_mass_ppm
FROM lt GROUP BY lang ORDER BY lang""",

    "q263_month_amplitude" -> """
WITH m AS (SELECT event_type, CAST(month(ts) AS BIGINT) AS m, COUNT(*) AS n_m
  FROM events GROUP BY event_type, m)
SELECT event_type, COUNT(*) AS n_months, CAST(SUM(n_m) AS BIGINT) AS n,
  CAST(MIN(n_m) AS BIGINT) AS min_month, CAST(MAX(n_m) AS BIGINT) AS max_month,
  CAST((MAX(n_m) - MIN(n_m)) * 1000000 // MAX(n_m) AS BIGINT) AS amplitude_ppm
FROM m GROUP BY event_type ORDER BY event_type""",

    "q264_zero_discount_bands" -> """
SELECT CAST(l_quantity AS BIGINT) // 10 AS qty_band, COUNT(*) AS n_lines,
  CAST(SUM(CASE WHEN CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
  CAST(SUM(CASE WHEN CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) = 0 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS zero_ppm
FROM lineitem GROUP BY qty_band ORDER BY qty_band""",

    "q265_first_brand_loyalty" -> """
WITH lines AS (SELECT o_custkey, o_orderdate, o_orderkey, l_linenumber, p_brand
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey),
first AS (SELECT o_custkey, p_brand AS first_brand FROM (
    SELECT o_custkey, p_brand, ROW_NUMBER() OVER (PARTITION BY o_custkey
      ORDER BY o_orderdate, o_orderkey, l_linenumber, p_brand) AS rn FROM lines)
  WHERE rn = 1),
bc AS (SELECT o_custkey, p_brand, COUNT(*) AS c FROM lines GROUP BY o_custkey, p_brand),
mx AS (SELECT o_custkey, MAX(c) AS mc FROM bc GROUP BY o_custkey),
modal AS (SELECT bc.o_custkey, MIN(p_brand) AS modal_brand
  FROM bc JOIN mx ON mx.o_custkey = bc.o_custkey WHERE bc.c = mx.mc
  GROUP BY bc.o_custkey)
SELECT c_mktsegment, COUNT(*) AS n_customers,
  CAST(SUM(CASE WHEN first_brand = modal_brand THEN 1 ELSE 0 END) AS BIGINT) AS n_loyal,
  CAST(SUM(CASE WHEN first_brand = modal_brand THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS loyal_ppm
FROM first JOIN modal ON modal.o_custkey = first.o_custkey
JOIN customer ON c_custkey = first.o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q266_supplier_quartile_shift" -> """
WITH yr AS (SELECT CAST(year(l_shipdate) AS BIGINT) AS y, l_suppkey,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem WHERE year(l_shipdate) IN (1995, 2000) GROUP BY y, l_suppkey),
rc AS (SELECT y, rev, COUNT(*) AS c FROM yr GROUP BY y, rev),
rt AS (SELECT y, CAST(SUM(c) AS BIGINT) AS n FROM rc GROUP BY y),
q AS (SELECT rc.y, rc.rev,
    (CAST(SUM(c) OVER (PARTITION BY rc.y ORDER BY rev) AS BIGINT) - 1) * 4 // rt.n AS quart
  FROM rc JOIN rt ON rt.y = rc.y),
qs AS (SELECT yr.y, yr.l_suppkey, q.quart FROM yr JOIN q ON q.y = yr.y AND q.rev = yr.rev)
SELECT a.quart AS q95, b.quart AS q00, COUNT(*) AS n_suppliers
FROM qs a JOIN qs b ON b.l_suppkey = a.l_suppkey AND a.y = 1995 AND b.y = 2000
GROUP BY q95, q00 ORDER BY q95, q00""",

    "q267_month_end_bias" -> """
SELECT o_orderpriority AS prio, COUNT(*) AS n_orders,
  CAST(SUM(CASE WHEN day(o_orderdate) >= day(last_day(o_orderdate)) - 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_month_end,
  CAST(SUM(CASE WHEN day(o_orderdate) >= day(last_day(o_orderdate)) - 2 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS month_end_ppm
FROM orders GROUP BY prio ORDER BY prio""",

    "q268_size_profile" -> """
WITH sc AS (SELECT p_brand, CAST(p_size AS BIGINT) AS sz, COUNT(*) AS c
  FROM part GROUP BY p_brand, sz),
tot AS (SELECT p_brand, CAST(SUM(c) AS BIGINT) AS n_parts, COUNT(*) AS n_sizes,
    CAST(MIN(sz) AS BIGINT) AS min_size, CAST(MAX(sz) AS BIGINT) AS max_size
  FROM sc GROUP BY p_brand),
mx AS (SELECT p_brand, CAST(MAX(c) AS BIGINT) AS mc FROM sc GROUP BY p_brand),
modal AS (SELECT sc.p_brand, mx.mc, MIN(sz) AS modal_size
  FROM sc JOIN mx ON mx.p_brand = sc.p_brand WHERE sc.c = mx.mc
  GROUP BY sc.p_brand, mx.mc)
SELECT t.p_brand, t.n_parts, t.n_sizes, t.min_size, t.max_size,
  m.modal_size, CAST(m.mc * 1000000 // t.n_parts AS BIGINT) AS modal_ppm
FROM tot t JOIN modal m ON m.p_brand = t.p_brand ORDER BY t.p_brand"""
  ).map { case (k, v) => k -> v.trim }
}
