package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Windows
import graft.sources.Tables

/** Integrity & reliability wave (q253–q260, round 7): structural
  * integrity audits and estimator-reliability checks — boundary-token
  * vocabulary (q253), specialist suppliers by lift (q254), split-half
  * mode stability — the bootstrap-flavored reliability of an argmax
  * estimator (q255), exact inter-event gap quantiles (q256), the
  * line-number sequence audit (q257), the dimension name↔key
  * consistency audit (q258), surrogate-id continuity (q259), and
  * tie-inclusive top-3 customer concentration via exact thresholds
  * (q260).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * Top-k mass is computed WITHOUT any rank window over a data-sized
  * partition: the k-th largest value per group is an exact order
  * statistic off the two-level prefix sum (ascending cum ≥ n−k+1),
  * and the mass sums everything at-or-above it — tie-INCLUSIVE by
  * definition, the only deterministic reading. Argmax ties break on
  * the smallest value; integer ppm throughout.
  */
object Integrity {

  private def cnt = count(lit(1))

  /** header order value in exact cents (scale-2 source, no residue). */
  private val orderCents =
    "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"

  def queries: Map[String, Queries.QueryFn] = Map(

    // Boundary tokens: each language's most common document-OPENING
    // and document-CLOSING token with shares — positional vocabulary,
    // the cheap discourse-structure tell. Two argmax legs over one
    // projection; ties to the smallest token.
    "q253_boundary_tokens" -> ((s, dir) => {
      val fl = Tables.load(s, dir, "documents")
        .selectExpr("lang",
          "filter(split(lower(text), ' '), x -> x <> '') AS l")
        .filter(size(col("l")) >= 1)
        .selectExpr("lang", "element_at(l, 1) AS ft",
          "element_at(l, size(l)) AS lt")
      // round-11: both positional argmaxes STACK into one (lang, pos,
      // token) census, the (max count, min token) pick is a min-struct
      // on (−n, tok), and the doc total re-reduces from the same
      // census (each doc contributes exactly one opening token) — one
      // scan and one pivot instead of two argmax legs, a totals leg
      // and a 3-way join (guide §2.4; identical values, same tie rule)
      val counts = fl
        .selectExpr("lang", "stack(2, 'f', ft, 'l', lt) AS (pos, tok)")
        .groupBy("lang", "pos", "tok").agg(cnt.as("n"))
      counts.groupBy("lang", "pos")
        .agg(sum("n").as("nd"),
          min(struct((-col("n")).as("nn"), col("tok").as("t"))).as("w"))
        .groupBy("lang")
        .agg(max(when(col("pos") === "f", col("nd"))).as("n_docs"),
          max(when(col("pos") === "f", col("w.t"))).as("top_first"),
          max(when(col("pos") === "f", -col("w.nn"))).as("first_n"),
          max(when(col("pos") === "l", col("w.t"))).as("top_last"),
          max(when(col("pos") === "l", -col("w.nn"))).as("last_n"))
        .selectExpr("lang", "n_docs", "top_first",
          "first_n * 1000000 DIV n_docs AS first_ppm",
          "top_last", "last_n * 1000000 DIV n_docs AS last_ppm")
        .orderBy("lang")
    }),

    // Specialist suppliers: a supplier is a specialist in a brand
    // when its (supplier, brand) line share runs ≥2× independence
    // (lift ≥ 2·10⁶ ppm). Census per brand: active vs specialist
    // suppliers. One reduced count relation + two broadcast marginals.
    "q254_specialist_suppliers" -> ((s, dir) => {
      val sb = Tables.load(s, dir, "lineitem")
        .select("l_suppkey", "l_partkey")
        .join(broadcast(Tables.load(s, dir, "part")
          .select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "p_brand").agg(cnt.as("n_sb"))
        .localCheckpoint() // marginals + lift grid
      val ms = sb.groupBy("l_suppkey").agg(sum("n_sb").as("n_s"))
      val mb = sb.groupBy("p_brand").agg(sum("n_sb").as("n_b"))
      val g = sb.agg(sum("n_sb").as("n"))
      sb.join(broadcast(ms), "l_suppkey").join(broadcast(mb), "p_brand")
        .crossJoin(broadcast(g))
        .selectExpr("p_brand", "l_suppkey",
          "n_sb * n * 1000000 DIV (n_s * n_b) AS lift_ppm")
        .groupBy("p_brand")
        .agg(cnt.as("n_active"),
          sum(when(col("lift_ppm") >= 2000000L, 1L).otherwise(0L))
            .as("n_specialists"))
        .selectExpr("p_brand", "n_active", "n_specialists",
          "n_specialists * 1000000 DIV n_active AS specialist_ppm")
        .orderBy("p_brand")
    }),

    // Split-half mode stability: q66's md5 split halves the stream;
    // does each type's modal value survive resampling? The classic
    // split-half reliability check on an argmax estimator — halves
    // computed with the REAL split key, modes with the portable
    // (max count, min value) tie rule.
    "q255_mode_stability" -> ((s, dir) => {
      val vc = Tables.load(s, dir, "events")
        .selectExpr("event_type", "value",
          "CASE WHEN md5(CAST(event_id AS STRING)) < '8' THEN 'a' ELSE 'b' END AS half")
        .groupBy("event_type", "half", "value").agg(cnt.as("c"))
      // round-11: the (max count, min value) mode is ONE min-struct
      // aggregation on (−c, value), and the a/b pivot is a
      // conditional-max groupBy instead of a self-join (guide §2.4;
      // identical values, same tie rule). An inner-join replica: a
      // type must appear in BOTH halves to report.
      val mode = vc.groupBy("event_type", "half")
        .agg(sum("c").as("n_h"),
          min(struct((-col("c")).as("nc"), col("value").as("v"))).as("w"))
      mode.groupBy("event_type")
        .agg(max(when(col("half") === "a", col("n_h"))).as("n_a"),
          max(when(col("half") === "b", col("n_h"))).as("n_b"),
          max(when(col("half") === "a", col("w.v"))).as("mode_a"),
          max(when(col("half") === "b", col("w.v"))).as("mode_b"))
        .filter(col("n_a").isNotNull && col("n_b").isNotNull)
        .selectExpr("event_type", "n_a", "n_b", "mode_a", "mode_b",
          "CASE WHEN mode_a = mode_b THEN 1L ELSE 0L END AS stable")
        .orderBy("event_type")
    }),

    // Inter-event gap quantiles: exact p50/p90/p99 of same-user
    // consecutive gaps (whole seconds) per event type. The gap domain
    // ndv follows the data, so the CDF rides the two-level prefix sum
    // keyed by type; gaps come from a lag keyed per (user, type).
    "q256_gap_quantiles" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("us"), col("event_id"))
      val gc = Tables.load(s, dir, "events")
        .selectExpr("user_id", "event_type", "event_id", "unix_micros(ts) AS us")
        .withColumn("gap", (col("us") - lag("us", 1).over(w)))
        .filter(col("gap").isNotNull)
        .selectExpr("event_type", "gap DIV 1000000 AS sec")
        .groupBy("event_type", "sec").agg(cnt.as("c"))
        .localCheckpoint() // CDF + totals
      val tot = gc.groupBy("event_type").agg(sum("c").as("n"))
      // round-11: all three percentile picks are conditional mins of
      // ONE aggregate carrying n — the previous shape ran three pick
      // legs over the CDF and a 4-relation join fan-in (guide §2.4;
      // identical values)
      def pick(cond: String, name: String) =
        min(when(expr(cond), col("sec"))).as(name)
      Windows.prefixSum(gc, Seq("event_type"), "sec", "c", "cum")
        .join(broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(max("n").as("n"), // n is constant per type
          pick("cum >= (n + 1) DIV 2", "p50_s"),
          pick("cum >= (9 * n + 9) DIV 10", "p90_s"),
          pick("cum >= (99 * n + 99) DIV 100", "p99_s"))
        .selectExpr("event_type", "n AS n_gaps", "p50_s", "p90_s", "p99_s")
        .orderBy("event_type")
    }),

    // Line-number audit: within every order, l_linenumber must be
    // exactly 1..n with no gaps or duplicates. One keyed reduction
    // proves it in a single pass: min=1, max=n, distinct=n.
    "q257_linenumber_audit" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .selectExpr("l_orderkey", "CAST(l_linenumber AS BIGINT) AS ln")
        .groupBy("l_orderkey")
        .agg(cnt.as("n"), min("ln").as("mn"), max("ln").as("mx"),
          countDistinct(col("ln")).as("nd"))
        .selectExpr(
          "CASE WHEN mn = 1 AND mx = n AND nd = n THEN 0L ELSE 1L END AS viol",
          "n")
        .agg(cnt.as("n_orders"), sum("viol").as("n_violations"),
          max("n").as("max_lines"))
        .selectExpr("n_orders", "n_violations",
          "n_violations * 1000000 DIV n_orders AS violation_ppm",
          "max_lines")
    }),

    // Dimension name↔key audit: customer and supplier names embed
    // their keys ('Customer#000000042'); parse the digits back and
    // count mismatches per dimension — the referential spell-check
    // for surrogate naming. Pure projections + one union agg.
    "q258_dim_key_audit" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .selectExpr("'customer' AS dim",
          "CASE WHEN CAST(regexp_extract(c_name, '#(\\\\d+)$', 1) AS BIGINT) = c_custkey THEN 0L ELSE 1L END AS bad")
      val su = Tables.load(s, dir, "supplier")
        .selectExpr("'supplier' AS dim",
          "CASE WHEN CAST(regexp_extract(s_name, '#(\\\\d+)$', 1) AS BIGINT) = s_suppkey THEN 0L ELSE 1L END AS bad")
      c.unionByName(su)
        .groupBy("dim")
        .agg(cnt.as("n_rows"), sum("bad").as("n_mismatch"))
        .selectExpr("dim", "n_rows", "n_mismatch",
          "n_mismatch * 1000000 DIV n_rows AS mismatch_ppm")
        .orderBy("dim")
    }),

    // Surrogate-id continuity: are event/document/order ids dense in
    // [min, max]? Missing count per table from one aggregate each —
    // the cheap tell for dropped or filtered-out rows upstream.
    "q259_id_continuity" -> ((s, dir) => {
      def audit(table: String, idCol: String) =
        Tables.load(s, dir, table)
          .agg(cnt.as("n"), min(col(idCol)).as("min_id"),
            max(col(idCol)).as("max_id"))
          .selectExpr(s"'$table' AS tbl", "n", "min_id", "max_id",
            "max_id - min_id + 1 - n AS n_missing")
      audit("events", "event_id")
        .unionByName(audit("documents", "doc_id"))
        .unionByName(audit("orders", "o_orderkey"))
        .orderBy("tbl")
    }),

    // Top-3 concentration: the revenue share of each nation's top
    // three customers, tie-INCLUSIVE (everyone at the 3rd-largest
    // revenue counts — the only deterministic reading). The 3rd
    // largest is an exact order statistic per nation: min revenue
    // with ascending CDF ≥ n−2 — no rank window over the customer
    // population exists.
    "q260_top3_concentration" -> ((s, dir) => {
      val cn = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(Tables.load(s, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "n_name")
      val rev = Tables.load(s, dir, "orders")
        .selectExpr("o_custkey", s"$orderCents AS c2")
        .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
        .groupBy("n_name", "o_custkey").agg(sum("c2").as("rev"))
        .localCheckpoint() // CDF + mass legs
      val rc = rev.groupBy("n_name", "rev").agg(cnt.as("c"))
      val rt = rc.groupBy("n_name").agg(sum("c").as("n"))
      // round-11: the threshold pick carries n, folding the rt re-join
      // into one broadcast (guide §2.4; identical values)
      val thr = Windows.prefixSum(rc, Seq("n_name"), "rev", "c", "cum")
        .join(broadcast(rt), "n_name")
        .groupBy("n_name")
        .agg(min(when(expr("cum >= n - 2"), col("rev"))).as("thr"),
          max("n").as("n")) // n is constant per nation
      rev.join(broadcast(thr), "n_name")
        .groupBy("n_name", "n")
        .agg(sum("rev").as("total_rev"),
          sum(when(col("rev") >= col("thr"), col("rev")).otherwise(0L))
            .as("top_rev"),
          sum(when(col("rev") >= col("thr"), 1L).otherwise(0L))
            .as("n_top"))
        .selectExpr("n_name", "n AS n_customers", "n_top",
          "top_rev * 1000000 DIV total_rev AS top_share_ppm")
        .orderBy("n_name")
    })
  )

  /** DuckDB oracles — SUM-derived BIGINT outputs CAST; identical
    * argmax-tie, threshold, split-key, and regex rules. */
  val oracle: Map[String, String] = Map(
    "q253_boundary_tokens" -> """
WITH fl AS (SELECT lang, list_filter(string_split(lower(text), ' '), x -> x <> '') l
  FROM documents),
ends AS (SELECT lang, l[1] ft, l[len(l)] lt FROM fl WHERE len(l) >= 1),
fc AS (SELECT lang, ft tok, COUNT(*) n FROM ends GROUP BY lang, ft),
fm AS (SELECT lang, MAX(n) mn FROM fc GROUP BY lang),
ftop AS (SELECT fc.lang, fm.mn, MIN(tok) top_first FROM fc JOIN fm ON fm.lang = fc.lang
  WHERE fc.n = fm.mn GROUP BY fc.lang, fm.mn),
lc AS (SELECT lang, lt tok, COUNT(*) n FROM ends GROUP BY lang, lt),
lm AS (SELECT lang, MAX(n) mn FROM lc GROUP BY lang),
ltop AS (SELECT lc.lang, lm.mn, MIN(tok) top_last FROM lc JOIN lm ON lm.lang = lc.lang
  WHERE lc.n = lm.mn GROUP BY lc.lang, lm.mn),
tot AS (SELECT lang, COUNT(*) n_docs FROM ends GROUP BY lang)
SELECT t.lang, t.n_docs, f.top_first,
  CAST(f.mn * 1000000 // t.n_docs AS BIGINT) first_ppm,
  l.top_last, CAST(l.mn * 1000000 // t.n_docs AS BIGINT) last_ppm
FROM tot t JOIN ftop f ON f.lang = t.lang JOIN ltop l ON l.lang = t.lang
ORDER BY t.lang""",

    "q254_specialist_suppliers" -> """
WITH sb AS (SELECT l_suppkey, p_brand, COUNT(*) n_sb
  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY l_suppkey, p_brand),
ms AS (SELECT l_suppkey, CAST(SUM(n_sb) AS BIGINT) n_s FROM sb GROUP BY l_suppkey),
mb AS (SELECT p_brand, CAST(SUM(n_sb) AS BIGINT) n_b FROM sb GROUP BY p_brand),
g AS (SELECT CAST(SUM(n_sb) AS BIGINT) n FROM sb),
lift AS (SELECT sb.p_brand,
    sb.n_sb * g.n * 1000000 // (ms.n_s * mb.n_b) lift_ppm
  FROM sb JOIN ms ON ms.l_suppkey = sb.l_suppkey
  JOIN mb ON mb.p_brand = sb.p_brand CROSS JOIN g)
SELECT p_brand, COUNT(*) n_active,
  CAST(SUM(CASE WHEN lift_ppm >= 2000000 THEN 1 ELSE 0 END) AS BIGINT) n_specialists,
  CAST(SUM(CASE WHEN lift_ppm >= 2000000 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) specialist_ppm
FROM lift GROUP BY p_brand ORDER BY p_brand""",

    "q255_mode_stability" -> """
WITH vc AS (SELECT event_type,
    CASE WHEN MD5(CAST(event_id AS VARCHAR)) < '8' THEN 'a' ELSE 'b' END half,
    value, COUNT(*) c
  FROM events GROUP BY event_type, half, value),
mx AS (SELECT event_type, half, MAX(c) mc, CAST(SUM(c) AS BIGINT) n_h
  FROM vc GROUP BY event_type, half),
md AS (SELECT vc.event_type, vc.half, mx.n_h, MIN(value) AS mval
  FROM vc JOIN mx ON mx.event_type = vc.event_type AND mx.half = vc.half
  WHERE vc.c = mx.mc GROUP BY vc.event_type, vc.half, mx.n_h)
SELECT a.event_type, a.n_h n_a, b.n_h n_b, a.mval mode_a, b.mval mode_b,
  CAST(CASE WHEN a.mval = b.mval THEN 1 ELSE 0 END AS BIGINT) AS stable
FROM md a JOIN md b ON b.event_type = a.event_type
  AND a.half = 'a' AND b.half = 'b'
ORDER BY a.event_type""",

    "q256_gap_quantiles" -> """
WITH g AS (SELECT event_type,
    (epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
      ORDER BY epoch_us(ts), event_id)) // 1000000 sec
  FROM events QUALIFY sec IS NOT NULL),
gc AS (SELECT event_type, CAST(sec AS BIGINT) sec, COUNT(*) c FROM g GROUP BY event_type, sec),
tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) n FROM gc GROUP BY event_type),
cum AS (SELECT event_type, sec, CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY sec) AS BIGINT) cum
  FROM gc),
p50 AS (SELECT c.event_type, MIN(sec) p50_s FROM cum c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (t.n + 1) // 2 GROUP BY c.event_type),
p90 AS (SELECT c.event_type, MIN(sec) p90_s FROM cum c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (9 * t.n + 9) // 10 GROUP BY c.event_type),
p99 AS (SELECT c.event_type, MIN(sec) p99_s FROM cum c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (99 * t.n + 99) // 100 GROUP BY c.event_type)
SELECT t.event_type, t.n n_gaps, a.p50_s, b.p90_s, c.p99_s
FROM tot t JOIN p50 a ON a.event_type = t.event_type
JOIN p90 b ON b.event_type = t.event_type
JOIN p99 c ON c.event_type = t.event_type
ORDER BY t.event_type""",

    "q257_linenumber_audit" -> """
WITH per AS (SELECT l_orderkey, COUNT(*) n, MIN(l_linenumber) mn,
    MAX(l_linenumber) mx, COUNT(DISTINCT l_linenumber) nd
  FROM lineitem GROUP BY l_orderkey)
SELECT COUNT(*) n_orders,
  CAST(SUM(CASE WHEN mn = 1 AND mx = n AND nd = n THEN 0 ELSE 1 END) AS BIGINT) n_violations,
  CAST(SUM(CASE WHEN mn = 1 AND mx = n AND nd = n THEN 0 ELSE 1 END) * 1000000 // COUNT(*) AS BIGINT) violation_ppm,
  CAST(MAX(n) AS BIGINT) max_lines
FROM per""",

    "q258_dim_key_audit" -> """
WITH pop AS (
  SELECT 'customer' dim,
    CASE WHEN CAST(regexp_extract(c_name, '#(\d+)$', 1) AS BIGINT) = c_custkey
         THEN 0 ELSE 1 END bad
  FROM customer
  UNION ALL
  SELECT 'supplier' dim,
    CASE WHEN CAST(regexp_extract(s_name, '#(\d+)$', 1) AS BIGINT) = s_suppkey
         THEN 0 ELSE 1 END bad
  FROM supplier)
SELECT dim, COUNT(*) n_rows, CAST(SUM(bad) AS BIGINT) n_mismatch,
  CAST(SUM(bad) * 1000000 // COUNT(*) AS BIGINT) mismatch_ppm
FROM pop GROUP BY dim ORDER BY dim""",

    "q259_id_continuity" -> """
SELECT * FROM (
  SELECT 'documents' tbl, COUNT(*) n, CAST(MIN(doc_id) AS BIGINT) min_id,
    CAST(MAX(doc_id) AS BIGINT) max_id,
    CAST(MAX(doc_id) - MIN(doc_id) + 1 - COUNT(*) AS BIGINT) n_missing
  FROM documents
  UNION ALL
  SELECT 'events', COUNT(*), CAST(MIN(event_id) AS BIGINT),
    CAST(MAX(event_id) AS BIGINT),
    CAST(MAX(event_id) - MIN(event_id) + 1 - COUNT(*) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'orders', COUNT(*), CAST(MIN(o_orderkey) AS BIGINT),
    CAST(MAX(o_orderkey) AS BIGINT),
    CAST(MAX(o_orderkey) - MIN(o_orderkey) + 1 - COUNT(*) AS BIGINT)
  FROM orders) ORDER BY tbl""",

    "q260_top3_concentration" -> """
WITH cn AS (SELECT c_custkey, n_name FROM customer JOIN nation ON n_nationkey = c_nationkey),
rev AS (SELECT n_name, o_custkey,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) rev
  FROM orders JOIN cn ON c_custkey = o_custkey GROUP BY n_name, o_custkey),
rc AS (SELECT n_name, rev, COUNT(*) c FROM rev GROUP BY n_name, rev),
rt AS (SELECT n_name, CAST(SUM(c) AS BIGINT) n FROM rc GROUP BY n_name),
cum AS (SELECT n_name, rev, CAST(SUM(c) OVER (PARTITION BY n_name ORDER BY rev) AS BIGINT) cum FROM rc),
thr AS (SELECT c.n_name, MIN(rev) thr FROM cum c JOIN rt t ON t.n_name = c.n_name
  WHERE c.cum >= t.n - 2 GROUP BY c.n_name)
SELECT r.n_name, t.n n_customers,
  CAST(SUM(CASE WHEN r.rev >= h.thr THEN 1 ELSE 0 END) AS BIGINT) n_top,
  CAST(SUM(CASE WHEN r.rev >= h.thr THEN r.rev ELSE 0 END) * 1000000
    // SUM(r.rev) AS BIGINT) top_share_ppm
FROM rev r JOIN thr h ON h.n_name = r.n_name JOIN rt t ON t.n_name = r.n_name
GROUP BY r.n_name, t.n ORDER BY r.n_name"""
  ).map { case (k, v) => k -> v.trim }
}
