package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.operators.Windows
import graft.sources.Tables

/** Division & margin wave (q221–q228, round 7): the relational-
  * division operator and margin/bias analyses — Tukey outlier fences
  * over exact quartiles (q221), order-priority escalation dynamics
  * (q222), same-nation trade locality (q223), per-vector
  * classification margin against exact-DECIMAL centroids (q224),
  * first-digit (Benford-style) price-digit bias spread (q225),
  * relational division proper — customers active in EVERY quarter
  * (q226), the language×source composition-independence lift matrix
  * (q227), and supplier-reuse loyalty (q228).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * Quartiles are exact order statistics (k-th smallest, k=⌈n·p⌉) over
  * the two-level prefix sum; the Tukey fences q1−1.5·IQR / q3+1.5·IQR
  * are single IEEE ops on identical doubles in both engines, used
  * only as comparison bounds; centroid cosines follow q203's proven
  * DECIMAL ladder (float → DECIMAL(18,9), centroids narrowed to
  * DECIMAL(14,9) so no product hits the precision-38 cap and
  * rescales); margins are differences and maxima of identical
  * doubles, never sums. All ppm arithmetic is non-negative integer.
  */
object Division {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Tukey outlier fences per event type: exact q1/q3 (k-th smallest,
    // k=⌈n/4⌉ / ⌈3n/4⌉) via the two-level prefix sum, then the mass
    // strictly outside q1−1.5·IQR / q3+1.5·IQR. The fences are per-row
    // IEEE arithmetic on identical doubles; the CDF never runs through
    // a single-task window.
    "q221_outlier_fences" -> ((s, dir) => {
      val vc = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("value").as("v")).agg(cnt.as("c"))
        .localCheckpoint() // CDF + totals + fence-census legs
      val tot = vc.groupBy("event_type").agg(sum("c").as("n"))
      // round-11: both quartile picks are conditional mins of ONE
      // aggregate that also carries n — one broadcast join into the
      // fence census instead of three (guide §2.4; identical values)
      val qq = Windows.prefixSum(vc, Seq("event_type"), "v", "c", "cum")
        .join(broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(min(when(expr("cum >= (n + 3) DIV 4"), col("v"))).as("q1"),
          min(when(expr("cum >= (3 * n + 3) DIV 4"), col("v"))).as("q3"),
          max("n").as("n")) // n is constant per type
      vc.join(broadcast(qq), "event_type")
        .groupBy("event_type", "n", "q1", "q3")
        .agg(sum(when(col("v") < col("q1") - (col("q3") - col("q1")) * 1.5,
            col("c")).otherwise(0L)).as("n_lo"),
          sum(when(col("v") > col("q3") + (col("q3") - col("q1")) * 1.5,
            col("c")).otherwise(0L)).as("n_hi"))
        .selectExpr("event_type", "n", "q1", "q3",
          "n_lo * 1000000 DIV n AS lo_ppm", "n_hi * 1000000 DIV n AS hi_ppm")
        .orderBy("event_type")
    }),

    // Priority escalation: TPC-H priorities are '1-URGENT'..'5-LOW',
    // so the leading digit is the ordinal. Per customer ordered by
    // order date (keyed lag), does the next order escalate (toward
    // urgent), de-escalate, or hold? Census per market segment.
    "q222_priority_escalation" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .selectExpr("o_custkey", "o_orderkey", "o_orderdate",
          "CAST(substring(o_orderpriority, 1, 1) AS INT) AS ord")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val tr = o.withColumn("prev", lag("ord", 1).over(w))
        .filter(col("prev").isNotNull)
        .selectExpr("o_custkey",
          "CASE WHEN ord < prev THEN 1L ELSE 0L END AS esc",
          "CASE WHEN ord > prev THEN 1L ELSE 0L END AS de")
      val seg = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_mktsegment")
      tr.join(broadcast(seg), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(cnt.as("n_transitions"), sum("esc").as("n_esc"),
          sum("de").as("n_de"))
        .selectExpr("c_mktsegment", "n_transitions", "n_esc", "n_de",
          "n_esc * 1000000 DIV n_transitions AS esc_ppm",
          "n_de * 1000000 DIV n_transitions AS de_ppm")
        .orderBy("c_mktsegment")
    }),

    // Trade locality: what share of each customer nation's purchase
    // revenue comes from same-nation suppliers, and how does it sit
    // against the corpus rate? One fact-fact shuffle on the order key;
    // both nation lookups are broadcast dims. Money aggregates in
    // LOSSLESS scale-4 (a ×100 product keeps fractional digits, and
    // CAST truncates in Spark but rounds in DuckDB — the q165 trap),
    // then floors to whole cents AFTER the exact sum (q201's form) so
    // the corpus-level ppm stays inside BIGINT.
    "q223_trade_locality" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(Tables.load(s, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("c_nation"),
          col("c_nationkey").as("cn"))
      val supp = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey").as("sn"))
      val rev = Tables.load(s, dir, "lineitem")
        .selectExpr("l_orderkey", "l_suppkey",
          "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT) AS c4")
        .join(Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy("c_nation")
        .agg(sum("c4").as("rev4"),
          sum(when(col("cn") === col("sn"), col("c4")).otherwise(0L))
            .as("local4"))
        .selectExpr("c_nation", "rev4 DIV 100 AS rev", "local4 DIV 100 AS local_rev")
        .localCheckpoint() // per-nation rows + the corpus total
      val tot = rev.agg(sum("rev").as("g_rev"), sum("local_rev").as("g_local"))
      rev.crossJoin(broadcast(tot))
        .selectExpr("c_nation", "rev AS rev_cents", "local_rev AS local_cents",
          "local_rev * 1000000 DIV rev AS local_ppm",
          "local_rev * 1000000 DIV rev - g_local * 1000000 DIV g_rev AS delta_ppm")
        .orderBy("c_nation")
    }),

    // Classification margin: each vector's cosine to its OWN label's
    // exact-DECIMAL summed centroid minus its best cosine to any other
    // label's — is the class separable around its centroid? Cosines
    // are per-row doubles from exact DECIMAL dot/norm sums (q203's
    // ladder); the margin is one IEEE subtraction and a MAX pick,
    // never a sum of doubles.
    "q224_centroid_margin" -> ((s, dir) => {
      val x = Tables.load(s, dir, "embeddings")
        .select(col("label").as("own"), col("vec_id"),
          explode(sequence(lit(1), lit(64))).as("pos"), col("embedding"))
        .select(col("own"), col("vec_id"), col("pos"),
          element_at(col("embedding"), col("pos"))
            .cast(DecimalType(18, 9)).as("xd"))
        .localCheckpoint() // centroid leg + dot leg + vec-norm leg
      val cent = x.groupBy(col("own").as("lc"), col("pos"))
        .agg(sum("xd").cast(DecimalType(14, 9)).as("v"))
        .localCheckpoint() // dot leg + centroid-norm leg
      val cnorm = cent.groupBy("lc")
        .agg(sum(expr("v * v")).as("nc"))
      val vnorm = x.groupBy("vec_id").agg(sum(expr("xd * xd")).as("nv"))
      val cos = x.join(broadcast(cent), "pos")
        .groupBy("own", "vec_id", "lc")
        .agg(sum(expr("xd * v")).as("dot"))
        .join(broadcast(cnorm), "lc")
        .join(vnorm, "vec_id")
        .selectExpr("own", "vec_id", "lc",
          "CAST(dot AS DOUBLE) / SQRT(CAST(nv AS DOUBLE) * CAST(nc AS DOUBLE)) AS cos")
      cos.groupBy("own", "vec_id")
        .agg(max(when(col("lc") === col("own"), col("cos"))).as("cos_own"),
          max(when(col("lc") =!= col("own"), col("cos"))).as("cos_other"))
        .selectExpr("own AS label", "vec_id",
          "cos_own - cos_other AS margin")
        .groupBy("label")
        .agg(cnt.as("n_vecs"),
          sum(when(col("margin") > 0, 1L).otherwise(0L)).as("n_separable"),
          round(min("margin"), 6).as("min_margin"),
          round(max("margin"), 6).as("max_margin"))
        .selectExpr("label", "n_vecs", "n_separable",
          "n_separable * 1000000 DIV n_vecs AS separable_ppm",
          "min_margin", "max_margin")
        .orderBy("label")
    }),

    // First-digit price bias: the leading significant digit of the
    // net amount (taken from the LOSSLESS scale-4 integer — a ×100
    // form would truncate in Spark and round in DuckDB, and a
    // boundary like 9999.5 would flip the digit), per digit — corpus
    // share plus the widest per-brand swing (Benford-style audit
    // without the transcendental reference: brands are compared to
    // each other and to the corpus, all integer ppm).
    "q225_benford_price" -> ((s, dir) => {
      val cents4 =
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)"
      val d = Tables.load(s, dir, "lineitem")
        .selectExpr("l_partkey",
          s"CAST(substring(CAST($cents4 AS STRING), 1, 1) AS BIGINT) AS digit")
        .join(broadcast(Tables.load(s, dir, "part")
          .select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "digit").agg(cnt.as("n_bd"))
        .localCheckpoint() // brand shares + corpus shares
      val bt = d.groupBy("p_brand").agg(sum("n_bd").as("n_b"))
      val shares = d.join(broadcast(bt), "p_brand")
        .selectExpr("digit", "n_bd * 1000000 DIV n_b AS ppm")
      val corpus = d.groupBy("digit").agg(sum("n_bd").as("n_d"))
      val g = d.agg(sum("n_bd").as("n"))
      shares.groupBy("digit")
        .agg(min("ppm").as("min_brand_ppm"), max("ppm").as("max_brand_ppm"))
        .join(broadcast(corpus), "digit")
        .crossJoin(broadcast(g))
        .selectExpr("digit", "n_d AS n",
          "n_d * 1000000 DIV n AS corpus_ppm",
          "min_brand_ppm", "max_brand_ppm")
        .orderBy("digit")
    }),

    // Relational division: customers with at least one order in EVERY
    // quarter of 1995 — the "for all" operator, done as the reduced
    // (customer, quarter) distinct + a count-equals-divisor gate, the
    // only division form that scales (no iterated anti-joins). Census
    // per market segment with the qualifying customers' 1995 revenue.
    "q226_relational_division" -> ((s, dir) => {
      val o95 = Tables.load(s, dir, "orders")
        .filter(expr("year(o_orderdate) = 1995"))
        .selectExpr("o_custkey", "quarter(o_orderdate) AS q",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c2")
        .localCheckpoint() // the division gate + the revenue leg
      val div = o95.select("o_custkey", "q").distinct()
        .groupBy("o_custkey").agg(cnt.as("nq"))
        .filter(col("nq") === 4L)
      val rev = o95.groupBy(col("o_custkey").as("ck"))
        .agg(sum("c2").as("rev"), cnt.as("n_orders"))
      val seg = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_mktsegment")
      div.join(rev, col("o_custkey") === col("ck"))
        .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(cnt.as("n_customers"), sum("n_orders").as("n_orders"),
          sum("rev").as("rev_cents"))
        .orderBy("c_mktsegment")
    }),

    // Composition independence: does language predict source? The
    // (lang × source) lift matrix against independence — n_ls·N·10⁶
    // DIV (n_l·n_s), all from one reduced count relation and its two
    // broadcast marginals.
    "q227_composition_lift" -> ((s, dir) => {
      val ls = Tables.load(s, dir, "documents")
        .groupBy("lang", "source").agg(cnt.as("n_ls"))
        .localCheckpoint() // cell counts + both marginals + the total
      val nl = ls.groupBy("lang").agg(sum("n_ls").as("n_l"))
      val ns = ls.groupBy("source").agg(sum("n_ls").as("n_s"))
      val g = ls.agg(sum("n_ls").as("n"))
      ls.join(broadcast(nl), "lang").join(broadcast(ns), "source")
        .crossJoin(broadcast(g))
        .selectExpr("lang", "source", "n_ls",
          "n_ls * n * 1000000 DIV (n_l * n_s) AS lift_ppm")
        .orderBy("lang", "source")
    }),

    // Supplier loyalty: per ≥2-order customer, how much supplier reuse
    // do their lines show (1 − distinct suppliers / lines, in ppm)?
    // Census per market segment. Two stacked keyed aggs over the fact
    // join; the reuse ratio is non-negative integer ppm.
    "q228_supplier_loyalty" -> ((s, dir) => {
      val per = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .join(Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(countDistinct(col("o_orderkey")).as("n_orders"),
          cnt.as("n_lines"),
          countDistinct(col("l_suppkey")).as("n_supp"))
        .filter(col("n_orders") >= 2)
      per.join(broadcast(Tables.load(s, dir, "customer")
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .selectExpr("c_mktsegment", "n_lines",
          "(n_lines - n_supp) * 1000000 DIV n_lines AS reuse_ppm")
        .groupBy("c_mktsegment")
        .agg(cnt.as("n_customers"), sum("n_lines").as("n_lines"),
          min("reuse_ppm").as("min_reuse_ppm"),
          max("reuse_ppm").as("max_reuse_ppm"))
        .orderBy("c_mktsegment")
    })
  )

  /** DuckDB oracles — SUM-derived BIGINT outputs CAST; identical
    * order-statistic, DECIMAL-ladder, digit, and ppm rules. */
  val oracle: Map[String, String] = Map(
    "q221_outlier_fences" -> """
WITH vc AS (SELECT event_type, value v, COUNT(*) c FROM events GROUP BY event_type, value),
tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) n FROM vc GROUP BY event_type),
cum AS (SELECT event_type, v,
    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) cum
  FROM vc),
q1 AS (SELECT c.event_type, MIN(v) q1 FROM cum c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (t.n + 3) // 4 GROUP BY c.event_type),
q3 AS (SELECT c.event_type, MIN(v) q3 FROM cum c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (3 * t.n + 3) // 4 GROUP BY c.event_type)
SELECT v.event_type, t.n, a.q1, b.q3,
  CAST(SUM(CASE WHEN v.v < a.q1 - 1.5 * (b.q3 - a.q1) THEN v.c ELSE 0 END) * 1000000 // t.n AS BIGINT) lo_ppm,
  CAST(SUM(CASE WHEN v.v > b.q3 + 1.5 * (b.q3 - a.q1) THEN v.c ELSE 0 END) * 1000000 // t.n AS BIGINT) hi_ppm
FROM vc v JOIN q1 a ON a.event_type = v.event_type
JOIN q3 b ON b.event_type = v.event_type
JOIN tot t ON t.event_type = v.event_type
GROUP BY v.event_type, t.n, a.q1, b.q3 ORDER BY v.event_type""",

    "q222_priority_escalation" -> """
WITH o AS (SELECT o_custkey, CAST(substring(o_orderpriority, 1, 1) AS INT) ord,
    LAG(CAST(substring(o_orderpriority, 1, 1) AS INT))
      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) prev
  FROM orders),
tr AS (SELECT o_custkey,
    CASE WHEN ord < prev THEN 1 ELSE 0 END esc,
    CASE WHEN ord > prev THEN 1 ELSE 0 END de
  FROM o WHERE prev IS NOT NULL)
SELECT c_mktsegment, COUNT(*) n_transitions,
  CAST(SUM(esc) AS BIGINT) n_esc, CAST(SUM(de) AS BIGINT) n_de,
  CAST(SUM(esc) * 1000000 // COUNT(*) AS BIGINT) esc_ppm,
  CAST(SUM(de) * 1000000 // COUNT(*) AS BIGINT) de_ppm
FROM tr JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q223_trade_locality" -> """
WITH rev4 AS (SELECT n.n_name c_nation,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) rev4,
    CAST(SUM(CASE WHEN c.c_nationkey = s.s_nationkey
      THEN CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)
      ELSE 0 END) AS BIGINT) local4
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer c ON c.c_custkey = o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN supplier s ON s.s_suppkey = l_suppkey
  GROUP BY n.n_name),
rev AS (SELECT c_nation, CAST(rev4 // 100 AS BIGINT) rev,
    CAST(local4 // 100 AS BIGINT) local_rev FROM rev4),
tot AS (SELECT CAST(SUM(rev) AS BIGINT) g_rev, CAST(SUM(local_rev) AS BIGINT) g_local FROM rev)
SELECT c_nation, rev rev_cents, local_rev local_cents,
  CAST(local_rev * 1000000 // rev AS BIGINT) local_ppm,
  CAST(local_rev * 1000000 // rev - g_local * 1000000 // g_rev AS BIGINT) delta_ppm
FROM rev CROSS JOIN tot ORDER BY c_nation""",

    "q224_centroid_margin" -> """
WITH x AS (SELECT label own, vec_id, CAST(r.i AS INT) pos,
    CAST(embedding[CAST(r.i AS INT)] AS DECIMAL(18,9)) xd
  FROM embeddings CROSS JOIN range(1, 65) r(i)),
cent AS (SELECT own lc, pos, CAST(SUM(xd) AS DECIMAL(14,9)) v FROM x GROUP BY own, pos),
cnorm AS (SELECT lc, SUM(v * v) nc FROM cent GROUP BY lc),
vnorm AS (SELECT vec_id, SUM(xd * xd) nv FROM x GROUP BY vec_id),
cos AS (SELECT x.own, x.vec_id, c.lc,
    CAST(SUM(x.xd * c.v) AS DOUBLE) / SQRT(CAST(n1.nv AS DOUBLE) * CAST(n2.nc AS DOUBLE)) cos
  FROM x JOIN cent c ON c.pos = x.pos
  JOIN vnorm n1 ON n1.vec_id = x.vec_id
  JOIN cnorm n2 ON n2.lc = c.lc
  GROUP BY x.own, x.vec_id, c.lc, n1.nv, n2.nc),
m AS (SELECT own AS label, vec_id,
    MAX(CASE WHEN lc = own THEN cos END) -
    MAX(CASE WHEN lc <> own THEN cos END) margin
  FROM cos GROUP BY own, vec_id)
SELECT label, COUNT(*) n_vecs,
  CAST(SUM(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS BIGINT) n_separable,
  CAST(SUM(CASE WHEN margin > 0 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) separable_ppm,
  CAST(ROUND(MIN(margin), 6) AS DOUBLE) min_margin,
  CAST(ROUND(MAX(margin), 6) AS DOUBLE) max_margin
FROM m GROUP BY label ORDER BY label""",

    "q225_benford_price" -> """
WITH d AS (SELECT p_brand,
    CAST(substring(CAST(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) digit,
    COUNT(*) n_bd
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY p_brand, digit),
bt AS (SELECT p_brand, CAST(SUM(n_bd) AS BIGINT) n_b FROM d GROUP BY p_brand),
shares AS (SELECT digit, CAST(d.n_bd * 1000000 // bt.n_b AS BIGINT) ppm
  FROM d JOIN bt ON bt.p_brand = d.p_brand),
corpus AS (SELECT digit, CAST(SUM(n_bd) AS BIGINT) n_d FROM d GROUP BY digit),
g AS (SELECT CAST(SUM(n_bd) AS BIGINT) n FROM d)
SELECT s.digit, c.n_d n, CAST(c.n_d * 1000000 // g.n AS BIGINT) corpus_ppm,
  CAST(MIN(s.ppm) AS BIGINT) min_brand_ppm, CAST(MAX(s.ppm) AS BIGINT) max_brand_ppm
FROM shares s JOIN corpus c ON c.digit = s.digit CROSS JOIN g
GROUP BY s.digit, c.n_d, g.n ORDER BY s.digit""",

    "q226_relational_division" -> """
WITH o95 AS (SELECT o_custkey, quarter(o_orderdate) q,
    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) c2
  FROM orders WHERE year(o_orderdate) = 1995),
div AS (SELECT o_custkey FROM (SELECT DISTINCT o_custkey, q FROM o95)
  GROUP BY o_custkey HAVING COUNT(*) = 4),
rev AS (SELECT o_custkey ck, CAST(SUM(c2) AS BIGINT) rev, COUNT(*) n_orders
  FROM o95 GROUP BY o_custkey)
SELECT c_mktsegment, COUNT(*) n_customers,
  CAST(SUM(n_orders) AS BIGINT) n_orders, CAST(SUM(rev) AS BIGINT) rev_cents
FROM div JOIN rev ON ck = div.o_custkey
JOIN customer ON c_custkey = div.o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q227_composition_lift" -> """
WITH ls AS (SELECT lang, source, COUNT(*) n_ls FROM documents GROUP BY lang, source),
nl AS (SELECT lang, CAST(SUM(n_ls) AS BIGINT) n_l FROM ls GROUP BY lang),
ns AS (SELECT source, CAST(SUM(n_ls) AS BIGINT) n_s FROM ls GROUP BY source),
g AS (SELECT CAST(SUM(n_ls) AS BIGINT) n FROM ls)
SELECT ls.lang, ls.source, ls.n_ls,
  CAST(ls.n_ls * g.n * 1000000 // (nl.n_l * ns.n_s) AS BIGINT) lift_ppm
FROM ls JOIN nl ON nl.lang = ls.lang JOIN ns ON ns.source = ls.source
CROSS JOIN g ORDER BY ls.lang, ls.source""",

    "q228_supplier_loyalty" -> """
WITH per AS (SELECT o_custkey,
    COUNT(DISTINCT l_orderkey) n_orders, COUNT(*) n_lines,
    COUNT(DISTINCT l_suppkey) n_supp
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY o_custkey HAVING COUNT(DISTINCT l_orderkey) >= 2),
r AS (SELECT c_mktsegment, n_lines,
    (n_lines - n_supp) * 1000000 // n_lines reuse_ppm
  FROM per JOIN customer ON c_custkey = o_custkey)
SELECT c_mktsegment, COUNT(*) n_customers, CAST(SUM(n_lines) AS BIGINT) n_lines,
  CAST(MIN(reuse_ppm) AS BIGINT) min_reuse_ppm,
  CAST(MAX(reuse_ppm) AS BIGINT) max_reuse_ppm
FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment"""
  ).map { case (k, v) => k -> v.trim }
}
