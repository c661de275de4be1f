package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Drift & calibration wave (q148–q150, round 5): the measurements a
  * production pipeline runs BETWEEN ingests — per-source distribution
  * drift (exact two-sample KS statistic), the planner's join-order
  * choice checked against true intermediate sizes (q143/q147's
  * statistics put to their actual use), and deterministic weighted
  * sampling (Efraimidis–Spirakis A-ES with content-addressed draws)
  * with its selection shares reported against the weight shares it
  * targets.
  *
  * Same t2 gate as every wave: DuckDB oracles in [[oracle]],
  * prototyped at sf0.01 before the natives; determinism per SURVEY.md
  * §5 — the whole wave is pure integer arithmetic (the original A-ES
  * sampler's per-doc −ln(u)/w key was replaced by integer systematic
  * sampling in round 6 precisely to retire its libm-drift exposure).
  */
object Calibration {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Per-source distribution drift: the exact two-sample
    // Kolmogorov–Smirnov distance (in ppm) between each source's
    // n_chars distribution and the whole corpus — the "did this
    // source's length profile shift" report run before a source is
    // admitted to a training mix. Exact integer arithmetic: the CDF
    // difference |cs/n_s − ca/n| becomes |cs·n − ca·n_s|·1e6 DIV
    // (n_s·n) — no float ever. Scale shape: rows collapse to an
    // ndv-sized (source, value, count) relation FIRST; the per-source
    // CDFs are windows over the k·ndv grid (k sources), the corpus
    // CDF a window over ndv rows — never the document table. The
    // argmax value is the min-value-at-max pattern (no second pass).
    "q148_ks_drift" -> ((s, dir) => {
      val vc = Tables.load(s, dir, "documents")
        .groupBy(col("source"), col("n_chars").as("v")).agg(cnt.as("c"))
        .localCheckpoint() // read three ways: grid fill, corpus cdf, source totals
      val vals = vc.select("v").distinct()
      val srcs = vc.groupBy("source").agg(sum("c").as("n_s"))
      val grid = srcs.crossJoin(vals)
        .join(vc, Seq("source", "v"), "left")
        .select(col("source"), col("n_s"), col("v"),
          coalesce(col("c"), lit(0L)).as("c"))
      val cum = grid.withColumn("cs", sum("c").over(
        Window.partitionBy("source").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // corpus CDF over the ndv-sized value relation — ndv follows the
      // data (distinct doc lengths), so no partition-less window: the
      // two-level bucketed prefix sum keeps every WindowExec keyed
      // (PlanSpec pins the absence of SinglePartition windows)
      val acc = graft.operators.Windows.prefixSum(
          vc.groupBy("v").agg(sum("c").as("ac")), Nil, "v", "ac", "ca")
        .select("v", "ca")
      val tot = vc.agg(sum("c").as("n_all"))
      // the |cs·n − ca·n_s|·1e6 intermediate is bounded by n_s·n·1e6,
      // which wraps Long once n_s·n passes ~9.2e12 (a 1M-doc source in
      // a 10M-doc corpus) — so the products run in DECIMAL(38,0) and
      // only the ≤1e6 ppm quotient comes back to BIGINT. DuckDB's
      // HUGEINT absorbs the same product natively.
      val ks = cum.join(acc, "v").crossJoin(broadcast(tot))
        .selectExpr("source", "n_s", "v",
          "CAST(ABS(CAST(cs AS DECIMAL(19,0)) * n_all - CAST(ca AS DECIMAL(19,0)) * n_s) * 1000000 " +
            "DIV (CAST(n_s AS DECIMAL(19,0)) * n_all) AS BIGINT) AS d_ppm")
      ks.withColumn("md", max("d_ppm").over(Window.partitionBy("source")))
        .groupBy("source")
        .agg(min("n_s").as("n_docs"), max("d_ppm").as("ks_ppm"),
          min(when(col("d_ppm") === col("md"), col("v"))).as("at_value"))
        .orderBy("source")
    }),

    // The planner's join-order choice measured: for the 3-table query
    // lineitem ⋈ orders[status='F'] ⋈ customer, both candidate first
    // joins are costed with the q143 uniform estimate (BASE-table ndv,
    // what a real optimizer has) and with the EXACT intermediate size
    // (per-key count products — the join itself never materializes).
    // est_agrees pins that the estimate ranks the orders right even
    // where the filtered arm's absolute error is nonzero (err_ppm
    // measures it). Scale shape: per-key counts are hash aggs on the
    // join keys; every scalar reduces to a 1-row frame; the rank
    // windows run over the 2-row order relation.
    "q149_join_order" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val oF = o.filter(col("o_orderstatus") === "F")
      val cu = Tables.load(s, dir, "customer")
      def counts(df: DataFrame, k: String) =
        df.groupBy(col(k).as("k")).agg(cnt.as("c"))
      def actualOf(a: DataFrame, b: DataFrame) =
        a.join(b.withColumnRenamed("c", "cb"), "k")
          .agg(coalesce(sum(col("c") * col("cb")), lit(0L)).as("actual_rows"))
      // round-11: the q143 discipline — n and filtered-side scalars
      // derive from the per-key count relations (n = SUM(c); a null
      // key's rows still count toward n, as COUNT(*) did), and both
      // BASE-table ndvs come from ONE orders aggregate, so each
      // relation is scanned once per grouping key instead of once per
      // scalar leg (guide §1.2 step 1; identical exact integers).
      def arm(name: String, nL: DataFrame, nR: DataFrame,
              ndvL: DataFrame, ndvR: DataFrame, actual: DataFrame) =
        nL.crossJoin(nR).crossJoin(ndvL).crossJoin(ndvR).crossJoin(actual)
          .selectExpr(s"'$name' AS join_order",
            "n_l * n_r DIV GREATEST(ndv_l, ndv_r) AS est_rows", "actual_rows")
      def nOf(d: DataFrame, as: String) =
        d.agg(coalesce(sum(col("c")), lit(0L)).as(as))
      // NOT checkpointed: every consumer lives in the ONE final plan,
      // so repeated grouped subtrees dedupe via ReusedExchange (a
      // checkpoint per relation measured +8 jobs for nothing)
      val cok = counts(li, "l_orderkey")   // n_l/ndv_l + actual A
      val fok = counts(oF, "o_orderkey")   // n_r + actual A
      val focu = counts(oF, "o_custkey")   // n_l + actual B
      val ccu = counts(cu, "c_custkey")    // n_r/ndv_r + actual B
      val ondv = o.agg(countDistinct(col("o_orderkey")).as("ndv_okey"),
        countDistinct(col("o_custkey")).as("ndv_ckey"))
      val a = arm("A_lineitem_x_filtered_orders",
        nOf(cok, "n_l"), nOf(fok, "n_r"),
        cok.agg(count(col("k")).as("ndv_l")),
        ondv.select(col("ndv_okey").as("ndv_r")),
        actualOf(cok, fok))
      val b = arm("B_filtered_orders_x_customer",
        nOf(focu, "n_l"), nOf(ccu, "n_r"),
        ondv.select(col("ndv_ckey").as("ndv_l")),
        ccu.agg(count(col("k")).as("ndv_r")),
        actualOf(focu, ccu))
      a.unionByName(b)
        .withColumn("err_ppm",
          expr("ABS(est_rows - actual_rows) * 1000000 DIV actual_rows"))
        .withColumn("est_rank", rank().over(Window.orderBy("est_rows")).cast("long"))
        .withColumn("actual_rank", rank().over(Window.orderBy("actual_rows")).cast("long"))
        .withColumn("est_agrees",
          when(col("est_rank") === col("actual_rank"), 1L).otherwise(0L))
        .select("join_order", "est_rows", "actual_rows", "err_ppm",
          "est_rank", "actual_rank", "est_agrees")
        .orderBy("join_order")
    }),

    // Deterministic weighted sampling, INTEGER-ONLY: systematic
    // (midpoint) sampling over cumulative weights. Documents line up
    // in content-addressed order (md5 of doc_id — exactly
    // reproducible, the q66/q69 discipline) with running weight
    // intervals [cw−w, cw); the k=100 probe positions are the exact
    // integer midpoints p_i = ⌊(2i+1)·W / 2k⌋, and a document is
    // drawn once per position inside its interval (multiplicity for
    // weight-dominant docs), so Σdraws = k exactly and selection
    // probability tracks w/W — with no transcendental anywhere. The
    // A-ES −ln(u)/w key this replaces rolled a fresh libm call per
    // document, where a 1-ulp ln divergence at a ROUND boundary could
    // flip sample membership between engines (q139 bounded the same
    // risk to 256 bucket constants; here the arithmetic is exact).
    // positionsBelow(x) = |{i : p_i < x}| closes to
    // LEAST(k, ((2k·x − 1) DIV W + 1) DIV 2) on POSITIVE operands
    // only — Spark DIV truncates toward zero while DuckDB // floors,
    // so negative intermediates are fenced out by the x <= 0 guard
    // (DifferentialSpec pins the formula against direct position
    // enumeration). Scale shape: the cumulative weight is the q148
    // two-level bucketed prefix sum (no partition-less window, no
    // global sort, no top-k barrier); draws are a pure projection
    // against the broadcast 1-row total; shares are one hash agg per
    // side joined on source. Long-range bound: 2k·W < 2^63 ⟺
    // W < 4.6e16 total chars (≈46 PB of text).
    "q150_weighted_sample" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("source"), col("n_chars"),
          expr("concat(md5(concat('ws:', CAST(doc_id AS STRING))), ':', CAST(doc_id AS STRING))")
            .as("hk"))
        .localCheckpoint() // read twice: cumulative walk + per-source totals
      val cum = graft.operators.Windows.prefixSum(d, Nil, "hk", "n_chars", "cw",
        orderNum = Some(expr("CAST(conv(substr(hk, 1, 8), 16, 10) AS BIGINT)")))
      val tw = d.agg(sum("n_chars").as("w_all"))
      def below(x: String) =
        s"CASE WHEN ($x) <= 0 THEN 0L ELSE LEAST(100L, ((200 * ($x) - 1) DIV w_all + 1) DIV 2) END"
      val draws = cum.crossJoin(broadcast(tw))
        .withColumn("m", expr(s"${below("cw")} - ${below("cw - n_chars")}"))
      val per = d.groupBy("source").agg(cnt.as("n_docs"), sum("n_chars").as("w_src"))
      val ps = draws.groupBy("source")
        .agg(sum("m").as("n_sel"), sum(col("m") * col("n_chars")).as("w_sel"))
      // ps is ~#sources rows (metadata-scale) — broadcast it so the
      // share join never shuffles the per-source rollup
      per.join(broadcast(ps), Seq("source"), "left")
        .crossJoin(broadcast(tw))
        .selectExpr("source", "n_docs",
          "coalesce(n_sel, 0L) AS n_selected",
          "w_src * 1000000 DIV w_all AS weight_share_ppm",
          "coalesce(n_sel, 0L) * 1000000 DIV 100 AS sel_share_ppm",
          "coalesce(w_sel, 0L) AS w_selected")
        .orderBy("source")
    })
  )

  /** DuckDB oracles (validated at sf0.01 and sf0.1 before the natives). */
  val oracle: Map[String, String] = Map(
    "q148_ks_drift" -> """
WITH vc AS (SELECT source, n_chars AS v, COUNT(*) AS c FROM documents GROUP BY ALL),
vals AS (SELECT DISTINCT v FROM vc),
srcs AS (SELECT source, SUM(c) AS n_s FROM vc GROUP BY source),
grid AS (SELECT s.source, s.n_s, va.v, COALESCE(vc.c, 0) AS c
         FROM srcs s CROSS JOIN vals va
         LEFT JOIN vc ON vc.source = s.source AND vc.v = va.v),
cum AS (SELECT source, n_s, v,
          SUM(c) OVER (PARTITION BY source ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        FROM grid),
ac AS (SELECT v, SUM(c) AS c FROM vc GROUP BY v),
acc AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS ca FROM ac),
tot AS (SELECT SUM(c) AS n_all FROM vc),
ks AS (SELECT c.source, c.n_s, c.v,
         ABS(c.cs * n_all - a.ca * c.n_s) * 1000000 // (c.n_s * n_all) AS d_ppm
       FROM cum c JOIN acc a ON a.v = c.v CROSS JOIN tot),
mk AS (SELECT source, n_s, v, d_ppm,
         MAX(d_ppm) OVER (PARTITION BY source) AS md FROM ks)
SELECT source, CAST(MIN(n_s) AS BIGINT) AS n_docs,
  CAST(MAX(d_ppm) AS BIGINT) AS ks_ppm,
  MIN(CASE WHEN d_ppm = md THEN v END) AS at_value
FROM mk GROUP BY source ORDER BY source""",

    "q149_join_order" -> """
WITH lo AS (SELECT 'A_lineitem_x_filtered_orders' AS join_order,
    (SELECT COUNT(*) FROM lineitem) * (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'F')
      // GREATEST((SELECT COUNT(DISTINCT l_orderkey) FROM lineitem),
                  (SELECT COUNT(DISTINCT o_orderkey) FROM orders)) AS est_rows,
    (SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) FROM
      (SELECT l_orderkey k, COUNT(*) c FROM lineitem GROUP BY 1) a JOIN
      (SELECT o_orderkey k, COUNT(*) c FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) b ON a.k = b.k) AS actual_rows
  UNION ALL
  SELECT 'B_filtered_orders_x_customer',
    (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'F') * (SELECT COUNT(*) FROM customer)
      // GREATEST((SELECT COUNT(DISTINCT o_custkey) FROM orders),
                  (SELECT COUNT(DISTINCT c_custkey) FROM customer)),
    (SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) FROM
      (SELECT o_custkey k, COUNT(*) c FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) a JOIN
      (SELECT c_custkey k, COUNT(*) c FROM customer GROUP BY 1) b ON a.k = b.k)),
r AS (SELECT join_order, est_rows, actual_rows,
        ABS(est_rows - actual_rows) * 1000000 // actual_rows AS err_ppm,
        RANK() OVER (ORDER BY est_rows) AS est_rank,
        RANK() OVER (ORDER BY actual_rows) AS actual_rank
      FROM lo)
SELECT join_order, est_rows, actual_rows, err_ppm,
  CAST(est_rank AS BIGINT) AS est_rank, CAST(actual_rank AS BIGINT) AS actual_rank,
  CASE WHEN est_rank = actual_rank THEN CAST(1 AS BIGINT) ELSE 0 END AS est_agrees
FROM r ORDER BY join_order""",

    "q150_weighted_sample" -> """
WITH d AS (SELECT doc_id, source, n_chars,
    md5('ws:' || CAST(doc_id AS VARCHAR)) || ':' || CAST(doc_id AS VARCHAR) AS hk
  FROM documents WHERE n_chars > 0),
c AS (SELECT *, SUM(n_chars) OVER (ORDER BY hk
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM d),
tw AS (SELECT SUM(n_chars) AS w_all FROM d),
m AS (SELECT c.source, c.n_chars,
        (CASE WHEN cw <= 0 THEN 0
              ELSE LEAST(100, ((200 * cw - 1) // w_all + 1) // 2) END)
      - (CASE WHEN cw - n_chars <= 0 THEN 0
              ELSE LEAST(100, ((200 * (cw - n_chars) - 1) // w_all + 1) // 2) END) AS m
      FROM c CROSS JOIN tw),
per AS (SELECT d.source, COUNT(*) AS n_docs, SUM(d.n_chars) AS w_src FROM d GROUP BY d.source),
ps AS (SELECT source, SUM(m) AS n_sel, SUM(m * n_chars) AS w_sel FROM m GROUP BY source)
SELECT p.source, p.n_docs, CAST(COALESCE(ps.n_sel, 0) AS BIGINT) AS n_selected,
  CAST(p.w_src * 1000000 // w_all AS BIGINT) AS weight_share_ppm,
  CAST(COALESCE(ps.n_sel, 0) * 1000000 // 100 AS BIGINT) AS sel_share_ppm,
  CAST(COALESCE(ps.w_sel, 0) AS BIGINT) AS w_selected
FROM per p LEFT JOIN ps ON ps.source = p.source CROSS JOIN tw
ORDER BY p.source"""
  ).map { case (k, v) => k -> v.trim }
}
