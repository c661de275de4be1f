package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Text
import graft.sources.Tables

/** Data-forensics & profile wave (q229–q236, round 7): behavioral
  * predictability and field-level profiling no earlier wave touches —
  * per-user event-bigram predictability (q229), conditional quantity
  * quantiles per discount level (q230), the temporal revenue
  * half-life date per brand (q231), pairwise diurnal-profile
  * distances between event types (q232), the customer/supplier
  * balance-band census (q233), near-dup survivorship policy agreement
  * (q234), the decimal-precision census of the value field (q235),
  * and brand shipping-lifecycle coverage (q236).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * Quantile and half-life picks are exact order statistics over
  * inherently bounded order domains (quantity ∈ 1..50, the calendar
  * day/quarter axes), so their cumulative windows are keyed and
  * fixture-bounded; precision tests compare v·10ᵏ to its floor —
  * exact IEEE ops on identical doubles; survivorship ties break on
  * doc_id, the engine-portable rule every dedup kernel here uses.
  */
object Forensics {

  private def cnt = count(lit(1))

  /** net price × (1−discount) in lossless scale-4 (the q165-trap-safe
    * money form). */
  private val cents4Expr =
    "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)"

  def queries: Map[String, Queries.QueryFn] = Map(

    // Sequence predictability: per ≥2-event user, how repetitive is
    // the event-type bigram stream — (transitions − distinct bigrams)
    // / transitions, in ppm, banded. Keyed lag per user; two stacked
    // aggs; users scale out, the per-user window fans in.
    "q229_seq_predictability" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val bg = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag("event_type", 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("user_id"), concat_ws(">", col("prev"), col("event_type"))
          .as("bigram"))
      bg.groupBy("user_id")
        .agg(cnt.as("n_tr"), countDistinct(col("bigram")).as("n_bg"))
        .selectExpr("user_id", "n_tr",
          "(n_tr - n_bg) * 1000000 DIV n_tr AS pred_ppm")
        .selectExpr("user_id", "n_tr", "pred_ppm DIV 100000 AS band")
        .groupBy("band")
        .agg(cnt.as("n_users"), sum("n_tr").as("n_transitions"))
        .orderBy("band")
    }),

    // Conditional quantiles: the p25/p50/p75 of quantity at each
    // discount level — does a deeper discount shift the whole
    // quantity distribution? Exact order statistics (k = ⌈n·p⌉) over
    // the reduced (discount, quantity) relation; quantity's domain is
    // inherently 1..50, so the keyed cumulative window is bounded at
    // any data scale.
    "q230_conditional_quantiles" -> ((s, dir) => {
      val dq = Tables.load(s, dir, "lineitem")
        .selectExpr(
          "CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS d",
          "CAST(l_quantity AS BIGINT) AS qty")
        .groupBy("d", "qty").agg(cnt.as("c"))
        .localCheckpoint() // CDF + totals legs
      val tot = dq.groupBy("d").agg(sum("c").as("n"))
      val cum = dq.withColumn("cum",
        sum("c").over(Window.partitionBy("d").orderBy("qty")))
        .join(broadcast(tot), "d")
      def pick(cond: String, name: String) =
        cum.filter(expr(cond)).groupBy("d").agg(min("qty").as(name))
      pick("cum >= (n + 3) DIV 4", "q25")
        .join(pick("cum >= (n + 1) DIV 2", "q50"), "d")
        .join(pick("cum >= (3 * n + 3) DIV 4", "q75"), "d")
        .join(tot, "d")
        .selectExpr("d", "n", "q25", "q50", "q75")
        .orderBy("d")
    }),

    // Revenue half-life: per brand, the first shipping day by which
    // half the brand's lifetime revenue had accrued, plus the span it
    // sits in. Lossless scale-4 money; the cumulative window is keyed
    // per brand over the calendar-bounded day axis.
    "q231_revenue_halfdate" -> ((s, dir) => {
      val bd = Tables.load(s, dir, "lineitem")
        .selectExpr("l_partkey", "CAST(l_shipdate AS DATE) AS day",
          s"$cents4Expr AS c4")
        .join(broadcast(Tables.load(s, dir, "part")
          .select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "day").agg(sum("c4").as("w"))
      // round-11: totals/span ride a second unordered window over the
      // SAME brand exchange instead of a separate agg + broadcast join
      // (guide §2.4: two operations keyed the same way share one
      // exchange) — with one consumer left, the checkpoint goes too
      val wb = Window.partitionBy("p_brand")
      bd.withColumn("cum",
          sum("w").over(Window.partitionBy("p_brand").orderBy("day")))
        .withColumn("tw", sum("w").over(wb))
        .withColumn("first_day", min("day").over(wb))
        .withColumn("last_day", max("day").over(wb))
        .filter(col("cum") * 2 >= col("tw"))
        .groupBy("p_brand", "first_day", "last_day")
        .agg(min("day").as("half_day"))
        .selectExpr("p_brand", "first_day", "half_day", "last_day",
          "datediff(half_day, first_day) * 1000000 DIV greatest(datediff(last_day, first_day), 1) AS half_pos_ppm")
        .orderBy("p_brand")
    }),

    // Diurnal-profile distance: for each pair of event types, the
    // total-variation distance between their hour-of-day activity
    // profiles (UTC) — which behaviors share a clock? The full
    // (type, hour) grid comes from a broadcast cross of two tiny
    // distinct relations, so missing hours count as zero; the pair
    // join runs over 24-row profiles.
    "q232_diurnal_distance" -> ((s, dir) => {
      val th = Tables.load(s, dir, "events")
        .selectExpr("event_type", "hour(ts) AS h")
        .groupBy("event_type", "h").agg(cnt.as("n_th"))
        .localCheckpoint() // grid + totals legs
      val tt = th.groupBy("event_type").agg(sum("n_th").as("n_t"))
      val hours = th.select("h").distinct()
      val prof = tt.crossJoin(broadcast(hours))
        .join(th, Seq("event_type", "h"), "left")
        .selectExpr("event_type", "h",
          "coalesce(n_th, 0L) * 1000000 DIV n_t AS ppm")
      val a = prof.select(col("event_type").as("t1"), col("h"),
        col("ppm").as("p1"))
      val b = prof.select(col("event_type").as("t2"), col("h"),
        col("ppm").as("p2"))
      a.join(b, "h").filter(col("t1") < col("t2"))
        .groupBy("t1", "t2")
        .agg(sum(abs(col("p1") - col("p2"))).as("sd"))
        .selectExpr("t1", "t2", "sd DIV 2 AS tv_ppm")
        .orderBy("t1", "t2")
    }),

    // Balance-band census: customers and suppliers unioned under a
    // role tag, account balances banded (negative / low / mid / high),
    // per nation — the two-population financial profile in one grid.
    // Shares are within (nation, role); bands compare doubles against
    // integer constants, exact in both engines.
    "q233_balance_census" -> ((s, dir) => {
      val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
      val c = Tables.load(s, dir, "customer")
        .selectExpr("c_nationkey AS nk", "c_acctbal AS bal", "'customer' AS role")
      val su = Tables.load(s, dir, "supplier")
        .selectExpr("s_nationkey AS nk", "s_acctbal AS bal", "'supplier' AS role")
      val banded = c.unionByName(su)
        .join(broadcast(n), col("nk") === col("n_nationkey"))
        .selectExpr("n_name", "role",
          """CASE WHEN bal < 0 THEN 'a_neg' WHEN bal < 1000 THEN 'b_low'
                  WHEN bal < 5000 THEN 'c_mid' ELSE 'd_high' END AS band""")
        .groupBy("n_name", "role", "band").agg(cnt.as("n"))
        .localCheckpoint() // cells + within-(nation, role) totals
      val tot = banded.groupBy("n_name", "role").agg(sum("n").as("nt"))
      banded.join(broadcast(tot), Seq("n_name", "role"))
        .selectExpr("n_name", "role", "band", "n",
          "n * 1000000 DIV nt AS share_ppm")
        .orderBy("n_name", "role", "band")
    }),

    // Survivorship policy agreement: within each near-dup signature
    // group, do three keep policies — lowest doc_id, longest text
    // (tie: lowest id), preferred source (lexicographic min, tie:
    // lowest id) — pick the same survivor? Each policy is a two-step
    // group-scoped reduction (extremum, then id tie-break), never a
    // pair join; ties break on doc_id everywhere, the dedup kernels'
    // portable rule.
    "q234_survivorship_policies" -> ((s, dir) => {
      val sig = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          explode(Text.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("doc_id", "source", "n_chars")
        .agg(Text.minhashComponent(col("tok"), "").as("h1"),
          Text.minhashComponent(col("tok"), "a").as("h2"),
          Text.minhashComponent(col("tok"), "b").as("h3"))
      // (single consumer since the min-struct rewrite — no checkpoint)
      val keys = Seq("h1", "h2", "h3")
      // round-11: all three policies are min-struct argmaxes of ONE
      // aggregation — "longest text, tie lowest id" minimizes
      // (−n_chars, doc_id) and "preferred source, tie lowest id"
      // minimizes (source, doc_id) — replacing the two join-back
      // policy legs and the 3-way reassembly join (guide §2.4;
      // identical survivors, same tie rules)
      val grp = sig.groupBy(keys.map(col): _*)
        .agg(cnt.as("ng"), min("doc_id").as("p1"),
          min(struct((-col("n_chars")).as("nl"), col("doc_id").as("d"))).as("w2"),
          min(struct(col("source").as("s"), col("doc_id").as("d"))).as("w3"))
        .filter(col("ng") > 1)
      grp.selectExpr("ng", "p1", "w2.d AS p2", "w3.d AS p3")
        .selectExpr(
          "CASE WHEN p1 = p2 AND p2 = p3 THEN 1L ELSE 0L END AS all3",
          "CASE WHEN p1 = p2 THEN 1L ELSE 0L END AS a12",
          "CASE WHEN p1 = p3 THEN 1L ELSE 0L END AS a13",
          "CASE WHEN p2 = p3 THEN 1L ELSE 0L END AS a23")
        .agg(cnt.as("n_groups"), sum("all3").as("n_all"),
          sum("a12").as("n_12"), sum("a13").as("n_13"), sum("a23").as("n_23"))
        .selectExpr("n_groups",
          "n_all * 1000000 DIV n_groups AS all_agree_ppm",
          "n_12 * 1000000 DIV n_groups AS id_len_ppm",
          "n_13 * 1000000 DIV n_groups AS id_src_ppm",
          "n_23 * 1000000 DIV n_groups AS len_src_ppm")
    }),

    // Decimal-precision census of the value field: per event type,
    // what share of values are whole / one-decimal / two-decimal?
    // v·10ᵏ == floor(v·10ᵏ) is an exact IEEE test on identical
    // doubles in both engines — the field-profiling primitive for
    // spotting quantized or human-entered numerics.
    "q235_precision_census" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .selectExpr("event_type",
          "CASE WHEN value = floor(value) THEN 1L ELSE 0L END AS p0",
          "CASE WHEN value * 10 = floor(value * 10) THEN 1L ELSE 0L END AS p1",
          "CASE WHEN value * 100 = floor(value * 100) THEN 1L ELSE 0L END AS p2")
        .groupBy("event_type")
        .agg(cnt.as("n"), sum("p0").as("n0"), sum("p1").as("n1"),
          sum("p2").as("n2"))
        .selectExpr("event_type", "n",
          "n0 * 1000000 DIV n AS int_ppm",
          "n1 * 1000000 DIV n AS dec1_ppm",
          "n2 * 1000000 DIV n AS dec2_ppm")
        .orderBy("event_type")
    }),

    // Shipping-lifecycle coverage: per brand, the first and last
    // shipping quarter, the span between them, and how many of those
    // quarters actually shipped — a sparse or dense product lifetime?
    // One broadcast-dim join + two stacked aggs, all integer quarter
    // arithmetic.
    "q236_lifecycle_span" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .selectExpr("l_partkey",
          "CAST(year(l_shipdate) * 4 + quarter(l_shipdate) - 1 AS BIGINT) AS aq")
        .join(broadcast(Tables.load(s, dir, "part")
          .select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(min("aq").as("fq"), max("aq").as("lq"),
          countDistinct(col("aq")).as("active"))
        .selectExpr("p_brand", "fq AS first_q", "lq AS last_q",
          "lq - fq + 1 AS span_q", "active",
          "active * 1000000 DIV (lq - fq + 1) AS coverage_ppm")
        .orderBy("p_brand")
    })
  )

  /** DuckDB oracles — SUM-derived BIGINT outputs CAST; identical
    * order-statistic, band, tie, and ppm rules. */
  val oracle: Map[String, String] = Map(
    "q229_seq_predictability" -> """
WITH bg AS (SELECT user_id,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) || '>' || event_type bigram
  FROM events QUALIFY LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NOT NULL),
u AS (SELECT user_id, COUNT(*) n_tr, COUNT(DISTINCT bigram) n_bg FROM bg GROUP BY user_id),
b AS (SELECT user_id, n_tr,
    (n_tr - n_bg) * 1000000 // n_tr // 100000 band FROM u)
SELECT CAST(band AS BIGINT) band, COUNT(*) n_users,
  CAST(SUM(n_tr) AS BIGINT) n_transitions
FROM b GROUP BY band ORDER BY band""",

    "q230_conditional_quantiles" -> """
WITH dq AS (SELECT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) d,
    CAST(l_quantity AS BIGINT) qty, COUNT(*) c
  FROM lineitem GROUP BY d, qty),
tot AS (SELECT d, CAST(SUM(c) AS BIGINT) n FROM dq GROUP BY d),
cum AS (SELECT dq.d, qty, CAST(SUM(c) OVER (PARTITION BY dq.d ORDER BY qty) AS BIGINT) cum,
    t.n FROM dq JOIN tot t ON t.d = dq.d),
q25 AS (SELECT d, MIN(qty) q25 FROM cum WHERE cum >= (n + 3) // 4 GROUP BY d),
q50 AS (SELECT d, MIN(qty) q50 FROM cum WHERE cum >= (n + 1) // 2 GROUP BY d),
q75 AS (SELECT d, MIN(qty) q75 FROM cum WHERE cum >= (3 * n + 3) // 4 GROUP BY d)
SELECT t.d, t.n, a.q25, b.q50, c.q75
FROM tot t JOIN q25 a ON a.d = t.d JOIN q50 b ON b.d = t.d JOIN q75 c ON c.d = t.d
ORDER BY t.d""",

    "q231_revenue_halfdate" -> """
WITH bd AS (SELECT p_brand, CAST(l_shipdate AS DATE) AS day,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) w
  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY p_brand, day),
tot AS (SELECT p_brand, CAST(SUM(w) AS BIGINT) tw, MIN(day) first_day, MAX(day) last_day
  FROM bd GROUP BY p_brand),
cum AS (SELECT p_brand, day, CAST(SUM(w) OVER (PARTITION BY p_brand ORDER BY day) AS BIGINT) cum
  FROM bd),
half AS (SELECT c.p_brand, MIN(day) half_day
  FROM cum c JOIN tot t ON t.p_brand = c.p_brand
  WHERE c.cum * 2 >= t.tw GROUP BY c.p_brand)
SELECT t.p_brand, t.first_day, h.half_day, t.last_day,
  CAST(datediff('day', t.first_day, h.half_day) * 1000000
    // greatest(datediff('day', t.first_day, t.last_day), 1) AS BIGINT) half_pos_ppm
FROM tot t JOIN half h ON h.p_brand = t.p_brand ORDER BY t.p_brand""",

    "q232_diurnal_distance" -> """
WITH th AS (SELECT event_type, hour(ts) h, COUNT(*) n_th FROM events GROUP BY event_type, h),
tt AS (SELECT event_type, CAST(SUM(n_th) AS BIGINT) n_t FROM th GROUP BY event_type),
hours AS (SELECT DISTINCT h FROM th),
prof AS (SELECT tt.event_type, hours.h,
    CAST(COALESCE(th.n_th, 0) * 1000000 // tt.n_t AS BIGINT) ppm
  FROM tt CROSS JOIN hours
  LEFT JOIN th ON th.event_type = tt.event_type AND th.h = hours.h)
SELECT a.event_type t1, b.event_type t2,
  CAST(SUM(abs(a.ppm - b.ppm)) // 2 AS BIGINT) tv_ppm
FROM prof a JOIN prof b ON b.h = a.h AND a.event_type < b.event_type
GROUP BY t1, t2 ORDER BY t1, t2""",

    "q233_balance_census" -> """
WITH pop AS (
  SELECT c_nationkey nk, c_acctbal bal, 'customer' AS role FROM customer
  UNION ALL
  SELECT s_nationkey nk, s_acctbal bal, 'supplier' AS role FROM supplier),
banded AS (SELECT n_name, role,
    CASE WHEN bal < 0 THEN 'a_neg' WHEN bal < 1000 THEN 'b_low'
         WHEN bal < 5000 THEN 'c_mid' ELSE 'd_high' END band,
    COUNT(*) n
  FROM pop JOIN nation ON n_nationkey = nk GROUP BY n_name, role, band),
tot AS (SELECT n_name, role, CAST(SUM(n) AS BIGINT) nt FROM banded GROUP BY n_name, role)
SELECT b.n_name, b.role, b.band, b.n,
  CAST(b.n * 1000000 // t.nt AS BIGINT) share_ppm
FROM banded b JOIN tot t ON t.n_name = b.n_name AND t.role = b.role
ORDER BY b.n_name, b.role, b.band""",

    "q234_survivorship_policies" -> """
WITH toks AS (SELECT doc_id, source, n_chars,
    UNNEST(string_split(LOWER(text), ' ')) tok FROM documents),
sig AS (SELECT doc_id, source, n_chars,
    MIN(MD5(tok)) h1, MIN(MD5('a' || tok)) h2, MIN(MD5('b' || tok)) h3
  FROM toks WHERE tok <> '' GROUP BY doc_id, source, n_chars),
grp AS (SELECT h1, h2, h3, COUNT(*) ng, MIN(doc_id) p1,
    MAX(n_chars) mx, MIN(source) ms
  FROM sig GROUP BY h1, h2, h3 HAVING COUNT(*) > 1),
p2 AS (SELECT s.h1, s.h2, s.h3, MIN(s.doc_id) p2
  FROM sig s JOIN grp g ON g.h1 = s.h1 AND g.h2 = s.h2 AND g.h3 = s.h3
  WHERE s.n_chars = g.mx GROUP BY s.h1, s.h2, s.h3),
p3 AS (SELECT s.h1, s.h2, s.h3, MIN(s.doc_id) p3
  FROM sig s JOIN grp g ON g.h1 = s.h1 AND g.h2 = s.h2 AND g.h3 = s.h3
  WHERE s.source = g.ms GROUP BY s.h1, s.h2, s.h3),
j AS (SELECT g.p1, p2.p2, p3.p3 FROM grp g
  JOIN p2 ON p2.h1 = g.h1 AND p2.h2 = g.h2 AND p2.h3 = g.h3
  JOIN p3 ON p3.h1 = g.h1 AND p3.h2 = g.h2 AND p3.h3 = g.h3)
SELECT COUNT(*) n_groups,
  CAST(SUM(CASE WHEN p1 = p2 AND p2 = p3 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) all_agree_ppm,
  CAST(SUM(CASE WHEN p1 = p2 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) id_len_ppm,
  CAST(SUM(CASE WHEN p1 = p3 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) id_src_ppm,
  CAST(SUM(CASE WHEN p2 = p3 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) len_src_ppm
FROM j""",

    "q235_precision_census" -> """
SELECT event_type, COUNT(*) n,
  CAST(SUM(CASE WHEN value = floor(value) THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) int_ppm,
  CAST(SUM(CASE WHEN value * 10 = floor(value * 10) THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) dec1_ppm,
  CAST(SUM(CASE WHEN value * 100 = floor(value * 100) THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) dec2_ppm
FROM events GROUP BY event_type ORDER BY event_type""",

    "q236_lifecycle_span" -> """
WITH pq AS (SELECT p_brand,
    year(l_shipdate) * 4 + quarter(l_shipdate) - 1 aq
  FROM lineitem JOIN part ON p_partkey = l_partkey)
SELECT p_brand, CAST(MIN(aq) AS BIGINT) first_q, CAST(MAX(aq) AS BIGINT) last_q,
  CAST(MAX(aq) - MIN(aq) + 1 AS BIGINT) span_q,
  COUNT(DISTINCT aq) active,
  CAST(COUNT(DISTINCT aq) * 1000000 // (MAX(aq) - MIN(aq) + 1) AS BIGINT) coverage_ppm
FROM pq GROUP BY p_brand ORDER BY p_brand"""
  ).map { case (k, v) => k -> v.trim }
}
