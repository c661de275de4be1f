package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.functions.Text
import graft.operators.Windows
import graft.sources.Tables

/** Robust-statistics & agreement wave (q205–q212, round 7): order-
  * statistic and concordance analyses no earlier wave touches — the
  * sole-late-supplier attribution (q205), revenue-weighted median
  * quantity (q206), median/MAD robust dispersion over the distributed
  * prefix-sum (q207), within-session event-type Jaccard (q208),
  * price-vs-revenue rank concordance (q209), binarized-centroid sign
  * agreement over embeddings (q210), near-dup copy-direction flow
  * between sources (q211), and per-type total-variation value drift
  * (q212).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * Medians are LOWER medians (the k-th smallest with k=(n+1) DIV 2) —
  * an engine-portable pick of an EXISTING value, never an
  * interpolation; MAD deviations are per-row IEEE |v−med| on
  * identical doubles in both engines, grouped and compared but never
  * summed. Cumulative distributions run through the two-level
  * [[Windows.prefixSum]] wherever the order domain's ndv follows the
  * data (value/deviation domains), and through a plain keyed window
  * only where the domain is inherently bounded (quantity ∈ 1..50).
  */
object Robust {

  private def cnt = count(lit(1))

  /** net price × (1−discount) in exact 10⁻⁴ dollars (the q195 form). */
  private val cents4Expr =
    "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)"

  def queries: Map[String, Queries.QueryFn] = Map(

    // Sole-late attribution: orders served by ≥2 suppliers where
    // EXACTLY ONE shipped late (>90 days after the order date) —
    // whose nation carries the blame? The uniqueness-within-group
    // shape: reduce to (order, supplier, late?) first, so the blame
    // argmax is a MAX over a relation that already has one row per
    // (order, supplier). One fact-fact shuffle on the order key;
    // supplier→nation is a broadcast dim.
    "q205_sole_late_supplier" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_orderdate")
      val perSupp = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .selectExpr("l_orderkey", "l_suppkey",
          "CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1L ELSE 0L END AS late")
        .groupBy("l_orderkey", "l_suppkey").agg(max("late").as("late"))
      val sole = perSupp.groupBy("l_orderkey")
        .agg(cnt.as("n_supp"), sum("late").as("n_late"),
          max(when(col("late") === 1L, col("l_suppkey"))).as("blame"))
        .filter(col("n_supp") >= 2 && col("n_late") === 1L)
        .localCheckpoint() // the nation census + the 1-row total
      val sn = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(Tables.load(s, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "n_name")
      val tot = sole.agg(cnt.as("g_orders"))
      sole.join(broadcast(sn), col("blame") === col("s_suppkey"))
        .groupBy("n_name")
        .agg(cnt.as("n_orders"), countDistinct(col("blame")).as("n_suppliers"))
        .crossJoin(broadcast(tot))
        .selectExpr("n_name", "n_orders", "n_suppliers",
          "n_orders * 1000000 DIV g_orders AS share_ppm")
        .orderBy("n_name")
    }),

    // Revenue-weighted median quantity per brand: the quantity at
    // which cumulative revenue (ascending in quantity) first covers
    // half the brand's total. The cumulative window is keyed per
    // brand over the REDUCED (brand, quantity) relation — quantity is
    // an inherently bounded integer domain (1..50), so the window
    // never exceeds 50 rows per key at any data scale.
    "q206_weighted_median_qty" -> ((s, dir) => {
      val pb = Tables.load(s, dir, "part").select("p_partkey", "p_brand")
      val bq = Tables.load(s, dir, "lineitem")
        .selectExpr("l_partkey", "CAST(l_quantity AS BIGINT) AS qty",
          s"$cents4Expr AS c4")
        .join(broadcast(pb), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "qty")
        .agg(sum("c4").as("w"), cnt.as("n"))
        .localCheckpoint() // cum leg + totals leg
      val w = Window.partitionBy("p_brand").orderBy("qty")
      val cum = bq.withColumn("cum", sum("w").over(w))
      val tot = bq.groupBy("p_brand")
        .agg(sum("w").as("tw"), sum("n").as("n_lines"))
      val wm = cum.join(broadcast(tot), "p_brand")
        .filter(col("cum") * 2 >= col("tw"))
        .groupBy("p_brand").agg(min("qty").as("wmedian_qty"))
      cum.join(broadcast(wm), "p_brand")
        .filter(col("qty") === col("wmedian_qty"))
        .join(broadcast(tot), "p_brand")
        .selectExpr("p_brand", "n_lines", "wmedian_qty",
          "cum * 1000000 DIV tw AS cum_share_ppm")
        .orderBy("p_brand")
    }),

    // Median + MAD of event values per type, and the share of rows
    // within one MAD. Both CDFs run over value domains whose ndv
    // follows the data, so both use the two-level distributed prefix
    // sum (q131's pattern) — no single-task window anywhere. The
    // median is the lower median (k-th smallest, k=(n+1) DIV 2);
    // |v−med| is a per-row IEEE op on identical doubles in both
    // engines, used only as a grouping/comparison key.
    "q207_value_mad" -> ((s, dir) => {
      val vc = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("value").as("v"))
        .agg(cnt.as("c"))
        .localCheckpoint() // CDF + totals + deviation re-reduce
      val tot = vc.groupBy("event_type").agg(sum("c").as("n"))
      // round-11: the median pick is ONE conditional-min aggregate that
      // carries n along, and `dev` keeps (n, med) as grouping keys — so
      // the MAD leg reads its threshold from its own rows (no second
      // tot join) and the within-MAD census folds into the FINAL
      // aggregate (the previous shape ran a separate `within` leg and a
      // 4-relation join fan-in; guide §2.4 — fewer legs, fewer
      // exchanges, identical values)
      val med = Windows.prefixSum(vc, Seq("event_type"), "v", "c", "cum")
        .join(broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(min(when(expr("cum >= (n + 1) DIV 2"), col("v"))).as("med"),
          max("n").as("n")) // n is constant per type
      val dev = vc.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("v") - col("med")))
        .groupBy("event_type", "n", "med", "dev").agg(sum("c").as("c"))
        .localCheckpoint() // CDF + within-MAD legs
      val mad = Windows.prefixSum(dev, Seq("event_type"), "dev", "c", "cum")
        .groupBy("event_type")
        .agg(min(when(expr("cum >= (n + 1) DIV 2"), col("dev"))).as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med", "mad")
        .agg(sum(when(col("dev") <= col("mad"), col("c")).otherwise(0L))
          .as("n_within"))
        .selectExpr("event_type", "n", "med", "mad",
          "n_within * 1000000 DIV n AS within_mad_ppm")
        .orderBy("event_type")
    }),

    // Within-session event-type affinity: which types co-occur in the
    // same 30-minute session, as Jaccard over session sets. The pair
    // join keys on (user, session) — fan-out bounded by the distinct
    // types in ONE session, never by the stream.
    "q208_session_cooccur" -> ((s, dir) => {
      val st = Windows.sessionize(
        Tables.load(s, dir, "events")
          .select("user_id", "ts", "event_id", "event_type"),
        col("user_id"), col("ts"), col("event_id"), gapMs = 1800000L)
        .select("user_id", "session_id", "event_type").distinct()
        .localCheckpoint() // both pair legs + per-type session counts
      val nt = st.groupBy("event_type").agg(cnt.as("n_t"))
      val l = st.select(col("user_id"), col("session_id"),
        col("event_type").as("t1"))
      val r = st.select(col("user_id"), col("session_id"),
        col("event_type").as("t2"))
      l.join(r, Seq("user_id", "session_id")).filter(col("t1") < col("t2"))
        .groupBy("t1", "t2").agg(cnt.as("n_both"))
        .join(broadcast(nt.select(col("event_type").as("t1"),
          col("n_t").as("n_1"))), "t1")
        .join(broadcast(nt.select(col("event_type").as("t2"),
          col("n_t").as("n_2"))), "t2")
        .selectExpr("t1", "t2", "n_both", "n_1", "n_2",
          "n_both * 1000000 DIV (n_1 + n_2 - n_both) AS jaccard_ppm")
        .orderBy("t1", "t2")
    }),

    // Rank concordance: within each brand, do parts rank the same by
    // list price as by realized revenue? Spearman's footrule
    // Σ|r_price − r_rev| with deterministic partkey tie-breaks, as
    // ppm of the permutation maximum ⌊n²/2⌋. Part is a dimension, so
    // the per-brand rank windows stay dimension-sized at any fact
    // scale; revenue joins in pre-aggregated.
    "q209_rank_agreement" -> ((s, dir) => {
      val rev = Tables.load(s, dir, "lineitem")
        .selectExpr("l_partkey", s"$cents4Expr AS c4")
        .groupBy("l_partkey").agg(sum("c4").as("rev"))
      val p = Tables.load(s, dir, "part")
        .select("p_partkey", "p_brand", "p_retailprice")
        .join(rev, col("p_partkey") === col("l_partkey"), "left")
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          coalesce(col("rev"), lit(0L)).as("rev"))
      val wp = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      val wr = Window.partitionBy("p_brand")
        .orderBy(col("rev").desc, col("p_partkey"))
      p.withColumn("rp", row_number().over(wp))
        .withColumn("rr", row_number().over(wr))
        .groupBy("p_brand")
        .agg(cnt.as("n_parts"),
          sum(abs(col("rp") - col("rr"))).as("footrule"))
        .selectExpr("p_brand", "n_parts", "footrule",
          "footrule * 1000000 DIV (n_parts * n_parts DIV 2) AS footrule_ppm")
        .orderBy("p_brand")
    }),

    // Binarized-centroid sign agreement: each label's reference sign
    // pattern is the sign of its exact DECIMAL dimension sums (q203's
    // summed centroid); each vector scores the dims agreeing with its
    // label's pattern. Census over 8-wide agreement bands — how tight
    // is each class around its binarized centroid? The reference
    // relation is 10×64 rows and broadcasts.
    "q210_sign_agreement" -> ((s, dir) => {
      val x = Tables.load(s, dir, "embeddings")
        .select(col("label"), col("vec_id"),
          explode(sequence(lit(1), lit(64))).as("pos"), col("embedding"))
        .select(col("label"), col("vec_id"), col("pos"),
          element_at(col("embedding"), col("pos")).as("x"))
        .localCheckpoint() // reference leg + scoring leg
      val ref = x.groupBy("label", "pos")
        .agg((sum(col("x").cast(DecimalType(18, 9))) >= 0).as("ref_pos"))
      x.join(broadcast(ref), Seq("label", "pos"))
        .groupBy("label", "vec_id")
        .agg(sum(when((col("x") >= 0) === col("ref_pos"), 1L).otherwise(0L))
          .as("n_agree"))
        .selectExpr("label", "n_agree DIV 8 AS band", "n_agree")
        .groupBy("label", "band")
        .agg(cnt.as("n_vecs"), min("n_agree").as("min_agree"),
          max("n_agree").as("max_agree"))
        .orderBy("label", "band")
    }),

    // Copy direction between sources: within each near-dup signature
    // group (q40's 3-component minhash), the lowest doc_id is the
    // original; every other member is a copy FROM the original's
    // source TO its own. The flow matrix is (source × source) counts —
    // which sources seed and which mirror. Group-scoped join on the
    // signature; no pair join over documents.
    "q211_copy_direction" -> ((s, dir) => {
      val sig = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(Text.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("doc_id", "source")
        .agg(Text.minhashComponent(col("tok"), "").as("h1"),
          Text.minhashComponent(col("tok"), "a").as("h2"),
          Text.minhashComponent(col("tok"), "b").as("h3"))
        .localCheckpoint() // group reduction + member join legs
      val grp = sig.groupBy("h1", "h2", "h3")
        .agg(cnt.as("n"), min("doc_id").as("rep"),
          expr("min_by(source, doc_id)").as("src_from"))
        .filter(col("n") > 1)
      sig.join(grp, Seq("h1", "h2", "h3"))
        .filter(col("doc_id") =!= col("rep"))
        .groupBy(col("src_from"), col("source").as("src_to"))
        .agg(cnt.as("n_copies"), countDistinct(col("rep")).as("n_groups"))
        .orderBy("src_from", "src_to")
    }),

    // Total-variation value drift: per event type, the TV distance in
    // ppm between the type's value-bucket distribution (width-10
    // buckets) and the corpus distribution — the summed counterpart
    // of q148's KS max. The (type × bucket) domain is a broadcast
    // cross of two tiny reduced relations; all shares are integer
    // ppm; TV = Σ|diff| DIV 2.
    "q212_tv_drift" -> ((s, dir) => {
      val tb = Tables.load(s, dir, "events")
        .selectExpr("event_type", "CAST(FLOOR(value / 10) AS BIGINT) AS b")
        .groupBy("event_type", "b").agg(cnt.as("n_tb"))
        .localCheckpoint() // type totals + bucket totals + the grid
      val tt = tb.groupBy("event_type").agg(sum("n_tb").as("n_t"))
      val gb = tb.groupBy("b").agg(sum("n_tb").as("n_b"))
      val g = tb.agg(sum("n_tb").as("n"))
      tt.crossJoin(broadcast(gb))
        .join(tb, Seq("event_type", "b"), "left")
        .crossJoin(broadcast(g))
        .selectExpr("event_type", "n_t",
          "abs(coalesce(n_tb, 0L) * 1000000 DIV n_t - n_b * 1000000 DIV n) AS d")
        .groupBy("event_type", "n_t") // grid rows carry n_t from tt
        .agg(cnt.as("n_buckets"), sum("d").as("sd"))
        .selectExpr("event_type", "n_t AS n", "n_buckets",
          "sd DIV 2 AS tv_ppm")
        .orderBy("event_type")
    })
  )

  /** DuckDB oracles — SUM-derived BIGINT outputs CAST; identical
    * lower-median, tie, bucket, and ppm rules. */
  val oracle: Map[String, String] = Map(
    "q205_sole_late_supplier" -> """
WITH per_supp AS (SELECT l_orderkey, l_suppkey,
    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY l_orderkey, l_suppkey),
sole AS (SELECT l_orderkey, COUNT(*) n_supp,
    CAST(SUM(late) AS BIGINT) n_late,
    MAX(CASE WHEN late = 1 THEN l_suppkey END) blame
  FROM per_supp GROUP BY l_orderkey
  HAVING COUNT(*) >= 2 AND SUM(late) = 1),
tot AS (SELECT COUNT(*) g_orders FROM sole),
sn AS (SELECT s_suppkey, n_name FROM supplier JOIN nation ON n_nationkey = s_nationkey)
SELECT n_name, COUNT(*) n_orders, COUNT(DISTINCT blame) n_suppliers,
  CAST(COUNT(*) * 1000000 // g_orders AS BIGINT) share_ppm
FROM sole JOIN sn ON s_suppkey = blame CROSS JOIN tot
GROUP BY n_name, g_orders ORDER BY n_name""",

    "q206_weighted_median_qty" -> """
WITH bq AS (SELECT p_brand, CAST(l_quantity AS BIGINT) qty,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) w,
    COUNT(*) n
  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY p_brand, qty),
cum AS (SELECT p_brand, qty,
    CAST(SUM(w) OVER (PARTITION BY p_brand ORDER BY qty) AS BIGINT) cum
  FROM bq),
tot AS (SELECT p_brand, CAST(SUM(w) AS BIGINT) tw, CAST(SUM(n) AS BIGINT) n_lines
  FROM bq GROUP BY p_brand),
wm AS (SELECT c.p_brand, MIN(qty) wmedian_qty
  FROM cum c JOIN tot t ON t.p_brand = c.p_brand
  WHERE c.cum * 2 >= t.tw GROUP BY c.p_brand)
SELECT c.p_brand, t.n_lines, w.wmedian_qty,
  CAST(c.cum * 1000000 // t.tw AS BIGINT) cum_share_ppm
FROM cum c JOIN wm w ON w.p_brand = c.p_brand AND c.qty = w.wmedian_qty
JOIN tot t ON t.p_brand = c.p_brand
ORDER BY c.p_brand""",

    "q207_value_mad" -> """
WITH vc AS (SELECT event_type, value v, COUNT(*) c FROM events GROUP BY event_type, value),
tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) n FROM vc GROUP BY event_type),
cum AS (SELECT event_type, v,
    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) cum
  FROM vc),
med AS (SELECT c.event_type, MIN(v) med
  FROM cum c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (t.n + 1) // 2 GROUP BY c.event_type),
dev AS (SELECT v.event_type, m.med, abs(v.v - m.med) dev, CAST(SUM(c) AS BIGINT) c
  FROM vc v JOIN med m ON m.event_type = v.event_type
  GROUP BY v.event_type, m.med, abs(v.v - m.med)),
cum2 AS (SELECT event_type, dev,
    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY dev) AS BIGINT) cum
  FROM dev),
mad AS (SELECT c.event_type, MIN(dev) mad
  FROM cum2 c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (t.n + 1) // 2 GROUP BY c.event_type),
win AS (SELECT d.event_type, CAST(SUM(d.c) AS BIGINT) n_within
  FROM dev d JOIN mad a ON a.event_type = d.event_type
  WHERE d.dev <= a.mad GROUP BY d.event_type)
SELECT t.event_type, t.n, m.med, a.mad,
  CAST(w.n_within * 1000000 // t.n AS BIGINT) within_mad_ppm
FROM tot t JOIN med m ON m.event_type = t.event_type
JOIN mad a ON a.event_type = t.event_type
JOIN win w ON w.event_type = t.event_type
ORDER BY t.event_type""",

    "q208_session_cooccur" -> """
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
st AS (SELECT DISTINCT user_id, event_type,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) session_id
  FROM g),
nt AS (SELECT event_type, COUNT(*) n_t FROM st GROUP BY event_type),
pairs AS (SELECT l.event_type t1, r.event_type t2, COUNT(*) n_both
  FROM st l JOIN st r ON r.user_id = l.user_id AND r.session_id = l.session_id
    AND l.event_type < r.event_type
  GROUP BY l.event_type, r.event_type)
SELECT p.t1, p.t2, p.n_both, n1.n_t n_1, n2.n_t n_2,
  CAST(p.n_both * 1000000 // (n1.n_t + n2.n_t - p.n_both) AS BIGINT) jaccard_ppm
FROM pairs p JOIN nt n1 ON n1.event_type = p.t1
JOIN nt n2 ON n2.event_type = p.t2
ORDER BY p.t1, p.t2""",

    "q209_rank_agreement" -> """
WITH rev AS (SELECT l_partkey,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) rev
  FROM lineitem GROUP BY l_partkey),
p AS (SELECT p_partkey, p_brand, p_retailprice, COALESCE(r.rev, 0) rev
  FROM part LEFT JOIN rev r ON r.l_partkey = p_partkey),
rk AS (SELECT p_brand,
    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) rp,
    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY rev DESC, p_partkey) rr
  FROM p)
SELECT p_brand, COUNT(*) n_parts, CAST(SUM(abs(rp - rr)) AS BIGINT) footrule,
  CAST(SUM(abs(rp - rr)) * 1000000 // (COUNT(*) * COUNT(*) // 2) AS BIGINT) footrule_ppm
FROM rk GROUP BY p_brand ORDER BY p_brand""",

    "q210_sign_agreement" -> """
WITH x AS (SELECT label, vec_id, CAST(r.i AS INT) pos,
    embedding[CAST(r.i AS INT)] x
  FROM embeddings CROSS JOIN range(1, 65) r(i)),
ref AS (SELECT label, pos, SUM(CAST(x AS DECIMAL(18,9))) >= 0 ref_pos
  FROM x GROUP BY label, pos),
agree AS (SELECT x.label, x.vec_id,
    CAST(SUM(CASE WHEN (x.x >= 0) = r.ref_pos THEN 1 ELSE 0 END) AS BIGINT) n_agree
  FROM x JOIN ref r ON r.label = x.label AND r.pos = x.pos
  GROUP BY x.label, x.vec_id)
SELECT label, n_agree // 8 band, COUNT(*) n_vecs,
  CAST(MIN(n_agree) AS BIGINT) min_agree, CAST(MAX(n_agree) AS BIGINT) max_agree
FROM agree GROUP BY label, band ORDER BY label, band""",

    "q211_copy_direction" -> """
WITH toks AS (
  SELECT doc_id, source, UNNEST(string_split(LOWER(text), ' ')) AS tok FROM documents),
sig AS (
  SELECT doc_id, source,
         MIN(MD5(tok)) h1, MIN(MD5('a' || tok)) h2, MIN(MD5('b' || tok)) h3
  FROM toks WHERE tok <> '' GROUP BY doc_id, source),
grp AS (SELECT h1, h2, h3, COUNT(*) n, MIN(doc_id) rep,
    arg_min(source, doc_id) src_from
  FROM sig GROUP BY h1, h2, h3 HAVING COUNT(*) > 1)
SELECT g.src_from, s.source src_to, COUNT(*) n_copies,
  COUNT(DISTINCT g.rep) n_groups
FROM sig s JOIN grp g ON g.h1 = s.h1 AND g.h2 = s.h2 AND g.h3 = s.h3
WHERE s.doc_id <> g.rep
GROUP BY g.src_from, s.source ORDER BY src_from, src_to""",

    "q212_tv_drift" -> """
WITH tb AS (SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) b, COUNT(*) n_tb
  FROM events GROUP BY event_type, b),
tt AS (SELECT event_type, CAST(SUM(n_tb) AS BIGINT) n_t FROM tb GROUP BY event_type),
gb AS (SELECT b, CAST(SUM(n_tb) AS BIGINT) n_b FROM tb GROUP BY b),
g AS (SELECT CAST(SUM(n_tb) AS BIGINT) n FROM tb),
grid AS (SELECT tt.event_type, tt.n_t, gb.b, gb.n_b,
    COALESCE(tb.n_tb, 0) n_tb
  FROM tt CROSS JOIN gb
  LEFT JOIN tb ON tb.event_type = tt.event_type AND tb.b = gb.b)
SELECT event_type, n_t n, COUNT(*) n_buckets,
  CAST(SUM(abs(n_tb * 1000000 // n_t - n_b * 1000000 // n)) // 2 AS BIGINT) tv_ppm
FROM grid CROSS JOIN g
GROUP BY event_type, n_t ORDER BY event_type"""
  ).map { case (k, v) => k -> v.trim }
}
