package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Windows
import graft.sources.Tables

/** Concordance & integrity wave (q213–q220, round 7): rank/direction
  * agreement statistics and structural audits — Kendall concordance
  * between discount and quantity over the fixed-domain cell grid
  * (q213), the document-length Gini per language via the distributed
  * Lorenz arithmetic (q214), quarterly nation revenue-rank churn
  * (q215), day-over-day and week-over-week revenue direction momentum
  * (q216), per-dimension exact p01/p99 quantiles with clipped mass —
  * the quantization-calibration profile (q217), per-user event-type
  * Gini-Simpson diversity bands (q218), the per-part discount-spread
  * audit (q219), and the implied-unit-price consistency audit (q220).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * Every ratio is integer ppm (or the documented doubled/Lorenz
  * integer forms) over non-negative operands, so truncating DIV and
  * flooring // agree; Kendall is reported as separate concordant /
  * discordant ppm (both non-negative) rather than a signed tau, which
  * would hit the DIV-vs-// negative-rounding divergence; quantile
  * picks are exact order statistics — an EXISTING value both engines
  * select identically, never an interpolation. CDFs over data-sized
  * domains (doc lengths, per-dimension embedding values) ride the
  * two-level [[Windows.prefixSum]]; plain windows appear only over
  * inherently bounded domains (25 nations/quarter, the calendar day
  * axis, discount×quantity cells).
  */
object Concord {

  private def cnt = count(lit(1))

  /** net price × (1−discount) in exact cents (scale 2). */
  private val cents2Expr =
    "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 100 AS BIGINT)"

  def queries: Map[String, Queries.QueryFn] = Map(

    // Kendall concordance between discount and quantity per brand:
    // does a deeper discount move more units? The pair space is the
    // FIXED 11×50 (discount, quantity) cell grid per brand — cell
    // pairs weight by c1*c2, so the join is scale-independent however
    // big the fact table gets. Concordant and discordant pair shares
    // are reported separately (both non-negative ppm) — a signed tau
    // would divide a negative, where Spark truncates and DuckDB
    // floors.
    "q213_kendall_discount_qty" -> ((s, dir) => {
      val cells = Tables.load(s, dir, "lineitem")
        .selectExpr("l_partkey",
          "CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS d",
          "CAST(l_quantity AS BIGINT) AS q")
        .join(broadcast(Tables.load(s, dir, "part")
          .select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "d", "q").agg(cnt.as("c"))
        .localCheckpoint() // both pair legs + the totals leg
      val tot = cells.groupBy("p_brand").agg(sum("c").as("n"))
      val a = cells.select(col("p_brand"), col("d").as("d1"),
        col("q").as("q1"), col("c").as("c1"))
      val b = cells.select(col("p_brand"), col("d").as("d2"),
        col("q").as("q2"), col("c").as("c2"))
      a.join(b, "p_brand")
        .filter(col("d1") < col("d2") ||
          (col("d1") === col("d2") && col("q1") < col("q2")))
        .selectExpr("p_brand",
          "CASE WHEN d1 < d2 AND q1 < q2 THEN c1 * c2 ELSE 0L END AS conc",
          "CASE WHEN d1 < d2 AND q1 > q2 THEN c1 * c2 ELSE 0L END AS disc")
        .groupBy("p_brand")
        .agg(sum("conc").as("n_conc"), sum("disc").as("n_disc"))
        .join(broadcast(tot), "p_brand")
        .selectExpr("p_brand", "n", "n_conc", "n_disc",
          "n_conc * 2000000 DIV (n * (n - 1)) AS conc_ppm",
          "n_disc * 2000000 DIV (n * (n - 1)) AS disc_ppm")
        .orderBy("p_brand")
    }),

    // Document-length Gini per language — how unequal is the length
    // distribution? Lorenz arithmetic over the reduced (lang, length,
    // count) relation: with C = exclusive cumulative count (the
    // two-level prefix sum — length ndv follows the data), the doubled
    // rank-sum 2·Σi·xᵢ = Σ x·(2·c·C + c·(c+1)) stays integer, and
    // gini_ppm = (2Σi·x − (n+1)·S)·10⁶ DIV (n·S). All terms
    // non-negative. (At lake scale the 10⁶ product wants DECIMAL(38);
    // BIGINT holds to ~10⁵ docs/lang at these lengths.)
    "q214_length_gini" -> ((s, dir) => {
      val lc = Tables.load(s, dir, "documents")
        .groupBy(col("lang"), col("n_chars").as("x")).agg(cnt.as("c"))
      val cum = Windows.prefixSum(lc, Seq("lang"), "x", "c", "cb",
        exclusive = true)
      cum.selectExpr("lang", "c AS cg", "x * c AS xs",
        "x * (2 * c * cb + c * (c + 1)) AS rs2")
        .groupBy("lang")
        .agg(sum("cg").as("n"), sum("xs").as("s"), sum("rs2").as("r2"))
        .selectExpr("lang", "n", "s AS total_chars",
          "(r2 - (n + 1) * s) * 1000000 DIV (n * s) AS gini_ppm")
        .orderBy("lang")
    }),

    // Quarterly revenue-rank churn: rank the 25 nations by order
    // revenue within each quarter, then sum each nation's
    // quarter-over-quarter |Δrank|. Rank windows are 25 rows per
    // quarter; the churn lag is keyed per nation over the bounded
    // quarter axis. Header-level money (exact cents) — no lineitem
    // needed.
    "q215_rank_churn" -> ((s, dir) => {
      val cn = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(Tables.load(s, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "n_name")
      val qrev = Tables.load(s, dir, "orders")
        .selectExpr("o_custkey",
          "year(o_orderdate) * 10 + quarter(o_orderdate) AS yq",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c2")
        .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
        .groupBy("n_name", "yq").agg(sum("c2").as("rev"))
      val rk = qrev.withColumn("r", row_number().over(
        Window.partitionBy("yq").orderBy(col("rev").desc, col("n_name"))))
      rk.withColumn("pr", lag("r", 1).over(
          Window.partitionBy("n_name").orderBy("yq")))
        .groupBy("n_name")
        .agg(cnt.as("n_quarters"),
          sum(when(col("pr").isNotNull, abs(col("r") - col("pr")))
            .otherwise(0L)).as("rank_churn"),
          min(col("r").cast("long")).as("best_rank"),
          max(col("r").cast("long")).as("worst_rank"))
        .orderBy("n_name")
    }),

    // Revenue direction momentum: does today's daily-revenue move
    // repeat yesterday's (lag 1), and last week's same weekday's
    // (lag 7)? Directions are integer signs of exact-cents deltas;
    // flat days drop out of both numerator and denominator. The day
    // axis is calendar-bounded (q120's precedent), so the lag windows
    // run over a fixture-bounded single partition.
    "q216_revenue_momentum" -> ((s, dir) => {
      val day = Tables.load(s, dir, "orders")
        .selectExpr("CAST(o_orderdate AS DATE) AS d",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c2")
        .groupBy("d").agg(sum("c2").as("rev"))
      val w = Window.orderBy("d")
      val sg = day
        .withColumn("dir", signum(col("rev") - lag("rev", 1).over(w)).cast("long"))
        .withColumn("pdir1", lag("dir", 1).over(w))
        .withColumn("pdir7", lag("dir", 7).over(w))
      sg.agg(
        cnt.as("n_days"),
        sum(when(col("dir") === 1L, 1L).otherwise(0L)).as("up_days"),
        sum(when(col("dir") =!= 0L && col("pdir1") =!= 0L &&
          col("dir") === col("pdir1"), 1L).otherwise(0L)).as("m1"),
        sum(when(col("dir") =!= 0L && col("pdir1") =!= 0L, 1L)
          .otherwise(0L)).as("b1"),
        sum(when(col("dir") =!= 0L && col("pdir7") =!= 0L &&
          col("dir") === col("pdir7"), 1L).otherwise(0L)).as("m7"),
        sum(when(col("dir") =!= 0L && col("pdir7") =!= 0L, 1L)
          .otherwise(0L)).as("b7"))
        .selectExpr("n_days", "up_days",
          "m1 * 1000000 DIV b1 AS mom1_ppm",
          "m7 * 1000000 DIV b7 AS mom7_ppm")
    }),

    // Per-dimension quantization calibration: exact p01/p99 order
    // statistics of each embedding dimension (k-th smallest with
    // k = ⌈n·p⌉ — an existing value, no interpolation) plus the mass
    // strictly outside the clip range. The per-dimension CDF ndv
    // follows the data, so it rides the two-level prefix sum keyed by
    // dimension.
    "q217_dim_quantiles" -> ((s, dir) => {
      val xc = Tables.load(s, dir, "embeddings")
        .select(explode(sequence(lit(1), lit(64))).as("pos"), col("embedding"))
        .select(col("pos"), element_at(col("embedding"), col("pos")).as("x"))
        .groupBy("pos", "x").agg(cnt.as("c"))
        .localCheckpoint() // CDF + totals + clip legs
      val tot = xc.groupBy("pos").agg(sum("c").as("n"))
      // round-11: both percentile picks are conditional mins of ONE
      // aggregate that also carries n — one broadcast join into the
      // clip census instead of three (guide §2.4; identical values)
      val pq = Windows.prefixSum(xc, Seq("pos"), "x", "c", "cum")
        .join(broadcast(tot), "pos")
        .groupBy("pos")
        .agg(min(when(expr("cum >= (n + 99) DIV 100"), col("x"))).as("p01"),
          min(when(expr("cum >= (n * 99 + 99) DIV 100"), col("x"))).as("p99"),
          max("n").as("n")) // n is constant per pos
      xc.join(broadcast(pq), "pos")
        .groupBy("pos", "n", "p01", "p99")
        .agg(sum(when(col("x") < col("p01") || col("x") > col("p99"),
          col("c")).otherwise(0L)).as("n_clip"))
        .selectExpr("pos", "n",
          "CAST(p01 AS DOUBLE) AS p01", "CAST(p99 AS DOUBLE) AS p99",
          "n_clip * 1000000 DIV n AS clipped_ppm")
        .orderBy("pos")
    }),

    // Per-user event-type diversity: Gini-Simpson concentration
    // 1 − Σ(nᵢ/n)² in exact ppm (10⁶ − Σnᵢ²·10⁶ DIV n²), banded at
    // 5000-ppm granularity (the population concentrates in a narrow
    // diversity range, so decile bands would collapse to one row).
    // Two stacked keyed aggs; per-user counts are small integers, so
    // the squares stay tiny.
    "q218_user_diversity" -> ((s, dir) => {
      val ut = Tables.load(s, dir, "events")
        .groupBy("user_id", "event_type").agg(cnt.as("c"))
      ut.groupBy("user_id")
        .agg(sum("c").as("n"), sum(col("c") * col("c")).as("ss"),
          cnt.as("n_types"))
        .selectExpr("user_id", "n", "n_types",
          "(1000000 - ss * 1000000 DIV (n * n)) DIV 5000 AS band")
        .groupBy("band")
        .agg(cnt.as("n_users"), sum("n").as("n_events"),
          min("n_types").as("min_types"), max("n_types").as("max_types"))
        .orderBy("band")
    }),

    // Discount-spread audit: does one part ship at many different
    // discounts? Per part min/max discount over its lines, then the
    // census per brand — parts with a single discount vs the widest
    // spread. Two stacked aggs over the reduced (part, discount)
    // relation; the dimension broadcasts.
    "q219_discount_spread" -> ((s, dir) => {
      val pd = Tables.load(s, dir, "lineitem")
        .selectExpr("l_partkey",
          "CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS d")
        .groupBy("l_partkey")
        .agg(min("d").as("dmin"), max("d").as("dmax"),
          countDistinct(col("d")).as("nd"))
      pd.join(broadcast(Tables.load(s, dir, "part")
          .select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(cnt.as("n_parts"),
          sum(when(col("nd") === 1L, 1L).otherwise(0L)).as("n_single"),
          max(col("dmax") - col("dmin")).as("max_spread"),
          sum(col("dmax") - col("dmin")).as("sum_spread"))
        .selectExpr("p_brand", "n_parts", "n_single", "max_spread",
          "sum_spread * 1000000 DIV n_parts AS mean_spread_ppm")
        .orderBy("p_brand")
    }),

    // Implied-unit-price consistency: extendedprice/quantity should
    // be one constant per part. The implied unit price in exact
    // truncated micro-dollars (cents·10⁴ DIV qty — same truncation
    // both engines, non-negative) is the consistency key; the census
    // per brand reports how many parts hold one implied price and the
    // worst relative spread.
    "q220_unit_price_audit" -> ((s, dir) => {
      val pu = Tables.load(s, dir, "lineitem")
        .selectExpr("l_partkey",
          "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 DIV CAST(l_quantity AS BIGINT) AS unit_micro")
        .groupBy("l_partkey")
        .agg(countDistinct(col("unit_micro")).as("nu"),
          min("unit_micro").as("umin"), max("unit_micro").as("umax"))
      pu.join(broadcast(Tables.load(s, dir, "part")
          .select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(cnt.as("n_parts"),
          sum(when(col("nu") === 1L, 1L).otherwise(0L)).as("n_consistent"),
          max("nu").as("max_prices"),
          max(expr("(umax - umin) * 1000000 DIV umin")).as("max_rel_spread_ppm"))
        .orderBy("p_brand")
    })
  )

  /** DuckDB oracles — SUM-derived BIGINT outputs CAST; identical
    * cell-grid, Lorenz, order-statistic, and ppm rules. */
  val oracle: Map[String, String] = Map(
    "q213_kendall_discount_qty" -> """
WITH cells AS (SELECT p_brand, CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) d,
    CAST(l_quantity AS BIGINT) q, COUNT(*) c
  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY p_brand, d, q),
tot AS (SELECT p_brand, CAST(SUM(c) AS BIGINT) n FROM cells GROUP BY p_brand),
pairs AS (SELECT a.p_brand,
    CAST(SUM(CASE WHEN a.d < b.d AND a.q < b.q THEN a.c * b.c ELSE 0 END) AS BIGINT) n_conc,
    CAST(SUM(CASE WHEN a.d < b.d AND a.q > b.q THEN a.c * b.c ELSE 0 END) AS BIGINT) n_disc
  FROM cells a JOIN cells b ON b.p_brand = a.p_brand
    AND (a.d < b.d OR (a.d = b.d AND a.q < b.q))
  GROUP BY a.p_brand)
SELECT p.p_brand, t.n, p.n_conc, p.n_disc,
  CAST(p.n_conc * 2000000 // (t.n * (t.n - 1)) AS BIGINT) conc_ppm,
  CAST(p.n_disc * 2000000 // (t.n * (t.n - 1)) AS BIGINT) disc_ppm
FROM pairs p JOIN tot t ON t.p_brand = p.p_brand ORDER BY p.p_brand""",

    "q214_length_gini" -> """
WITH lc AS (SELECT lang, n_chars x, COUNT(*) c FROM documents GROUP BY lang, x),
cum AS (SELECT lang, x, c,
    CAST(COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) cb
  FROM lc),
g AS (SELECT lang, CAST(SUM(c) AS BIGINT) n, CAST(SUM(x * c) AS BIGINT) s,
    CAST(SUM(x * (2 * c * cb + c * (c + 1))) AS BIGINT) r2
  FROM cum GROUP BY lang)
SELECT lang, n, s total_chars,
  CAST((r2 - (n + 1) * s) * 1000000 // (n * s) AS BIGINT) gini_ppm
FROM g ORDER BY lang""",

    "q215_rank_churn" -> """
WITH cn AS (SELECT c_custkey, n_name FROM customer JOIN nation ON n_nationkey = c_nationkey),
qrev AS (SELECT n_name, year(o_orderdate) * 10 + quarter(o_orderdate) yq,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) rev
  FROM orders JOIN cn ON c_custkey = o_custkey GROUP BY n_name, yq),
rk AS (SELECT n_name, yq,
    ROW_NUMBER() OVER (PARTITION BY yq ORDER BY rev DESC, n_name) r
  FROM qrev),
ch AS (SELECT n_name, r,
    LAG(r) OVER (PARTITION BY n_name ORDER BY yq) pr
  FROM rk)
SELECT n_name, COUNT(*) n_quarters,
  CAST(SUM(CASE WHEN pr IS NOT NULL THEN abs(r - pr) ELSE 0 END) AS BIGINT) rank_churn,
  CAST(MIN(r) AS BIGINT) best_rank, CAST(MAX(r) AS BIGINT) worst_rank
FROM ch GROUP BY n_name ORDER BY n_name""",

    "q216_revenue_momentum" -> """
WITH day AS (SELECT CAST(o_orderdate AS DATE) d,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) rev
  FROM orders GROUP BY d),
sg AS (SELECT d, CAST(sign(rev - LAG(rev, 1) OVER (ORDER BY d)) AS BIGINT) dir FROM day),
lg AS (SELECT dir, LAG(dir, 1) OVER (ORDER BY d) pdir1,
    LAG(dir, 7) OVER (ORDER BY d) pdir7 FROM sg)
SELECT COUNT(*) n_days,
  CAST(SUM(CASE WHEN dir = 1 THEN 1 ELSE 0 END) AS BIGINT) up_days,
  CAST(SUM(CASE WHEN dir <> 0 AND pdir1 <> 0 AND dir = pdir1 THEN 1 ELSE 0 END) * 1000000
    // SUM(CASE WHEN dir <> 0 AND pdir1 <> 0 THEN 1 ELSE 0 END) AS BIGINT) mom1_ppm,
  CAST(SUM(CASE WHEN dir <> 0 AND pdir7 <> 0 AND dir = pdir7 THEN 1 ELSE 0 END) * 1000000
    // SUM(CASE WHEN dir <> 0 AND pdir7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) mom7_ppm
FROM lg""",

    "q217_dim_quantiles" -> """
WITH xc AS (SELECT CAST(r.i AS INT) pos, embedding[CAST(r.i AS INT)] x, COUNT(*) c
  FROM embeddings CROSS JOIN range(1, 65) r(i) GROUP BY pos, x),
tot AS (SELECT pos, CAST(SUM(c) AS BIGINT) n FROM xc GROUP BY pos),
cum AS (SELECT pos, x, c,
    CAST(SUM(c) OVER (PARTITION BY pos ORDER BY x) AS BIGINT) cum
  FROM xc),
p01 AS (SELECT c.pos, MIN(x) p01 FROM cum c JOIN tot t ON t.pos = c.pos
  WHERE c.cum >= (t.n + 99) // 100 GROUP BY c.pos),
p99 AS (SELECT c.pos, MIN(x) p99 FROM cum c JOIN tot t ON t.pos = c.pos
  WHERE c.cum >= (t.n * 99 + 99) // 100 GROUP BY c.pos)
SELECT x.pos, t.n, CAST(a.p01 AS DOUBLE) p01, CAST(b.p99 AS DOUBLE) p99,
  CAST(SUM(CASE WHEN x.x < a.p01 OR x.x > b.p99 THEN x.c ELSE 0 END) * 1000000
    // t.n AS BIGINT) clipped_ppm
FROM xc x JOIN p01 a ON a.pos = x.pos JOIN p99 b ON b.pos = x.pos
JOIN tot t ON t.pos = x.pos
GROUP BY x.pos, t.n, a.p01, b.p99 ORDER BY x.pos""",

    "q218_user_diversity" -> """
WITH ut AS (SELECT user_id, event_type, COUNT(*) c FROM events GROUP BY user_id, event_type),
u AS (SELECT user_id, CAST(SUM(c) AS BIGINT) n, CAST(SUM(c * c) AS BIGINT) ss,
    COUNT(*) n_types
  FROM ut GROUP BY user_id),
b AS (SELECT user_id, n, n_types,
    (1000000 - ss * 1000000 // (n * n)) // 5000 band FROM u)
SELECT CAST(band AS BIGINT) band, COUNT(*) n_users,
  CAST(SUM(n) AS BIGINT) n_events,
  CAST(MIN(n_types) AS BIGINT) min_types, CAST(MAX(n_types) AS BIGINT) max_types
FROM b GROUP BY band ORDER BY band""",

    "q219_discount_spread" -> """
WITH pd AS (SELECT l_partkey,
    MIN(CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) dmin,
    MAX(CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) dmax,
    COUNT(DISTINCT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) nd
  FROM lineitem GROUP BY l_partkey)
SELECT p_brand, COUNT(*) n_parts,
  CAST(SUM(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT) n_single,
  CAST(MAX(dmax - dmin) AS BIGINT) max_spread,
  CAST(SUM(dmax - dmin) * 1000000 // COUNT(*) AS BIGINT) mean_spread_ppm
FROM pd JOIN part ON p_partkey = l_partkey
GROUP BY p_brand ORDER BY p_brand""",

    "q220_unit_price_audit" -> """
WITH pu AS (SELECT l_partkey,
    COUNT(DISTINCT CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 // CAST(l_quantity AS BIGINT)) nu,
    MIN(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 // CAST(l_quantity AS BIGINT)) umin,
    MAX(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 // CAST(l_quantity AS BIGINT)) umax
  FROM lineitem GROUP BY l_partkey)
SELECT p_brand, COUNT(*) n_parts,
  CAST(SUM(CASE WHEN nu = 1 THEN 1 ELSE 0 END) AS BIGINT) n_consistent,
  CAST(MAX(nu) AS BIGINT) max_prices,
  CAST(MAX((umax - umin) * 1000000 // umin) AS BIGINT) max_rel_spread_ppm
FROM pu JOIN part ON p_partkey = l_partkey
GROUP BY p_brand ORDER BY p_brand"""
  ).map { case (k, v) => k -> v.trim }
}
