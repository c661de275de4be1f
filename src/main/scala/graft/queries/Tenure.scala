package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Windows
import graft.sources.Tables

/** Tenure & asymmetry wave (q245–q252, round 7): directional and
  * status-over-time structures — the trade asymmetry matrix (q245),
  * dormancy-and-revival (q246), the order-value premium per priority
  * against exact medians (q247), year-over-year elite (top-decile)
  * retention via exact thresholds (q248), per-source bigram style
  * fingerprints (q249), churn labeling against the corpus horizon by
  * modal event type (q250), each brand's seasonal revenue peak
  * (q251), and the first-order-value → lifetime-value quartile grid
  * (q252).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * Every decile/quartile/median threshold is an exact order statistic
  * picked from the value domain via the two-level prefix sum (never a
  * rank window over a data-sized partition, never NTILE whose
  * remainder rules differ); header money is DECIMAL(14,2)·100 — exact
  * cents with no fractional residue (the ×100 trap needs a scale-4
  * product, which header prices don't have); argmax ties break on the
  * smallest key, the battery's portable rule.
  */
object Tenure {

  private def cnt = count(lit(1))

  /** net line revenue in lossless scale-4. */
  private val cents4Expr =
    "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)"

  /** header order value in exact cents (scale-2 source — no residue). */
  private val orderCents =
    "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"

  def queries: Map[String, Queries.QueryFn] = Map(

    // Trade asymmetry: revenue flowing (customer nation A ← supplier
    // nation B) vs the reverse direction, for each unordered nation
    // pair — who runs the surplus? The matrix reduces to ≤ 625 rows
    // before its transpose self-join; scale-4 sums floor to cents.
    "q245_reciprocal_trade" -> ((s, dir) => {
      val cn = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(Tables.load(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name").as("cnat"))),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "cnat")
      val sn = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("snk"), col("n_name").as("snat"))),
          col("s_nationkey") === col("snk"))
        .select("s_suppkey", "snat")
      val m = Tables.load(s, dir, "lineitem")
        .selectExpr("l_orderkey", "l_suppkey", s"$cents4Expr AS c4")
        .join(Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .groupBy("cnat", "snat").agg(sum("c4").as("c4"))
        .selectExpr("cnat", "snat", "c4 DIV 100 AS rev")
        .localCheckpoint() // both directions of the transpose join
      val fwd = m.select(col("cnat").as("a"), col("snat").as("b"),
        col("rev").as("rev_ab"))
      val bwd = m.select(col("snat").as("a"), col("cnat").as("b"),
        col("rev").as("rev_ba"))
      fwd.join(bwd, Seq("a", "b")).filter(col("a") < col("b"))
        .selectExpr("a", "b", "rev_ab", "rev_ba",
          "abs(rev_ab - rev_ba) * 1000000 DIV (rev_ab + rev_ba) AS asym_ppm")
        .orderBy("a", "b")
    }),

    // Dormancy & revival: customers who went ≥ 365 days between
    // consecutive orders and came back — how common is resurrection,
    // per segment? Keyed lag per customer; integer day gaps.
    "q246_dormancy_revival" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val gaps = Tables.load(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("gap", datediff(col("o_orderdate"),
          lag("o_orderdate", 1).over(w)))
        .filter(col("gap").isNotNull)
        .groupBy("o_custkey")
        .agg(cnt.as("n_gaps"), max("gap").as("max_gap"),
          sum(when(col("gap") >= 365, 1L).otherwise(0L)).as("n_dormant"))
      gaps.join(broadcast(Tables.load(s, dir, "customer")
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(cnt.as("n_customers"),
          sum(when(col("n_dormant") >= 1, 1L).otherwise(0L)).as("n_revived"),
          max(col("max_gap").cast("long")).as("max_gap_days"))
        .selectExpr("c_mktsegment", "n_customers", "n_revived",
          "n_revived * 1000000 DIV n_customers AS revived_ppm",
          "max_gap_days")
        .orderBy("c_mktsegment")
    }),

    // Priority premium: the exact median order value per priority vs
    // the corpus median — do urgent orders run larger? Both medians
    // are lower-median picks over the (priority, cents) / (cents)
    // reduced domains via the two-level prefix sum; the premium is a
    // non-negative integer ratio.
    "q247_priority_premium" -> ((s, dir) => {
      // round-11: the checkpointed relation is the REDUCED (prio, c2)
      // count grid, and the corpus domain re-reduces from it (same
      // counts, summed over prio) instead of re-scanning the order
      // projection; the median picks are conditional mins carrying n,
      // so the assembly needs no pt re-join (guide §2.3/§2.4 — one
      // scan, fewer exchanges, identical values)
      val pc = Tables.load(s, dir, "orders")
        .selectExpr("o_orderpriority AS prio", s"$orderCents AS c2")
        .groupBy("prio", "c2").agg(cnt.as("c"))
        .localCheckpoint() // per-priority CDF rows + corpus re-reduce
      // round-11b: the corpus CDF STACKS into the same keyed prefix sum
      // as the per-priority CDFs under a sentinel key (per-key passes
      // are independent, so values are identical to the former second
      // Nil-keyed prefixSum call; one bucket machinery instead of two —
      // guide §2.4). The 6-row median relation is checkpointed so the
      // sentinel split below does not replay the pass per consumer.
      val vc = pc.unionByName(
        pc.groupBy("c2").agg(sum("c").as("c"))
          .select(lit("__all").as("prio"), col("c2"), col("c")))
      val pt = vc.groupBy("prio").agg(sum("c").as("n"))
      val med = Windows.prefixSum(vc, Seq("prio"), "c2", "c", "cum")
        .join(broadcast(pt), "prio")
        .groupBy("prio")
        .agg(min(when(expr("cum >= (n + 1) DIV 2"), col("c2")))
            .as("median_cents"),
          max("n").as("n")) // n is constant per priority
        .localCheckpoint() // priority rows + the corpus row
      med.filter(col("prio") =!= "__all")
        .crossJoin(broadcast(med.filter(col("prio") === "__all")
          .select(col("median_cents").as("g_median"))))
        .selectExpr("prio", "n", "median_cents", "g_median",
          "median_cents * 1000000 DIV g_median AS rel_ppm")
        .orderBy("prio")
    }),

    // Elite retention: is a top-decile-revenue customer this year
    // still top-decile next year? The decile boundary is an exact
    // order statistic per year (min revenue with CDF ≥ n − n DIV 10),
    // picked over the reduced (year, revenue) domain — no rank window
    // over the customer population ever exists.
    "q248_elite_retention" -> ((s, dir) => {
      val yr = Tables.load(s, dir, "orders")
        .selectExpr("CAST(year(o_orderdate) AS BIGINT) AS y", "o_custkey",
          s"$orderCents AS c2")
        .groupBy("y", "o_custkey").agg(sum("c2").as("rev"))
        .localCheckpoint() // CDF + membership legs
      val rc = yr.groupBy("y", "rev").agg(cnt.as("c"))
      val rt = rc.groupBy("y").agg(sum("c").as("n"))
      val thr = Windows.prefixSum(rc, Seq("y"), "rev", "c", "cum")
        .join(broadcast(rt), "y")
        .filter(expr("cum >= n - n DIV 10"))
        .groupBy("y").agg(min("rev").as("thr"))
      val elite = yr.join(broadcast(thr), "y")
        .filter(col("rev") >= col("thr"))
        .select(col("y"), col("o_custkey"))
        .localCheckpoint() // both years of the self-join
      val nxt = elite.select((col("y") - 1).as("y2"),
        col("o_custkey").as("ck2"))
      elite.join(nxt, col("y") === col("y2") &&
          col("o_custkey") === col("ck2"), "left")
        .groupBy("y")
        .agg(cnt.as("n_elite"),
          sum(when(col("ck2").isNotNull, 1L).otherwise(0L)).as("n_stay"))
        .filter(col("y") < 2001L) // the last year has no successor
        .selectExpr("y", "n_elite", "n_stay",
          "n_stay * 1000000 DIV n_elite AS stay_ppm")
        .orderBy("y")
    }),

    // Style fingerprint: each source's most frequent word bigram and
    // its share — the cheap stylometric tell. Bigrams via the q88
    // in-array transform (no window over the token stream); argmax by
    // (max count, then MIN bigram), the portable tie rule.
    "q249_style_fingerprint" -> ((s, dir) => {
      val bg = Tables.load(s, dir, "documents")
        .selectExpr("source",
          "filter(split(lower(text), ' '), x -> x <> '') AS l")
        .withColumn("n", size(col("l"))).filter(col("n") >= 2)
        .select(col("source"), explode(expr(
          "transform(sequence(1, n - 1), i -> concat(element_at(l, i), '>', element_at(l, i + 1)))"))
          .as("bigram"))
        .groupBy("source", "bigram").agg(cnt.as("c"))
      // round-11: totals and the (max count, min bigram) argmax are
      // ONE aggregation — min-struct on (−c, bigram) — replacing the
      // mx leg, join-back filter and reassembly join (guide §2.4;
      // identical values, same tie rule)
      bg.groupBy("source")
        .agg(sum("c").as("n_bigrams"),
          min(struct((-col("c")).as("nc"), col("bigram").as("b"))).as("w"))
        .selectExpr("source", "n_bigrams", "w.b AS top_bigram",
          "(-w.nc) AS top_n",
          "(-w.nc) * 1000000 DIV n_bigrams AS top_share_ppm")
        .orderBy("source")
    }),

    // Churn census: a user is churned if their last event predates the
    // corpus horizon (global max ts) by over 60 days. Census by the
    // user's MODAL event type (argmax count, tie: smallest type name)
    // — which behaviors retain? Integer µs arithmetic; the horizon is
    // a broadcast 1-row aggregate.
    "q250_churn_census" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
        .localCheckpoint() // horizon + per-user reduction legs
      val horizon = ev.agg(max("us").as("h_us"))
      // round-11: last-seen and the (max count, min type) modal fold
      // into ONE two-level aggregation — per (user, type) the count
      // and last timestamp, then per user a min-struct on (−c, type)
      // and a max — replacing the mx join-back and the last⋈modal
      // join (guide §2.4; identical values, same tie rule)
      val perUser = ev.groupBy("user_id", "event_type")
        .agg(cnt.as("c"), max("us").as("lu"))
        .groupBy("user_id")
        .agg(max("lu").as("last_us"),
          min(struct((-col("c")).as("nc"), col("event_type").as("t"))).as("w"))
        .selectExpr("user_id", "last_us", "w.t AS modal_type")
      perUser.crossJoin(broadcast(horizon))
        .selectExpr("modal_type",
          "CASE WHEN last_us < h_us - 60L * 86400000000 THEN 1L ELSE 0L END AS churned")
        .groupBy("modal_type")
        .agg(cnt.as("n_users"), sum("churned").as("n_churned"))
        .selectExpr("modal_type", "n_users", "n_churned",
          "n_churned * 1000000 DIV n_users AS churn_ppm")
        .orderBy("modal_type")
    }),

    // Seasonal peak: each brand's highest-revenue quarter-of-year and
    // that quarter's share of the brand's total — argmax over the
    // 4-cell seasonal profile, ties to the earliest quarter.
    "q251_seasonal_peak" -> ((s, dir) => {
      val bq = Tables.load(s, dir, "lineitem")
        .selectExpr("l_partkey",
          "CAST(quarter(l_shipdate) AS BIGINT) AS qoy", s"$cents4Expr AS c4")
        .join(broadcast(Tables.load(s, dir, "part")
          .select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "qoy").agg(sum("c4").as("qc"))
      // round-11: totals and the (max revenue, min quarter) argmax are
      // ONE min-struct aggregation on (−qc, qoy) — no mx leg, no
      // join-back, no reassembly join, no checkpoint (guide §2.4;
      // identical values, same tie rule)
      bq.groupBy("p_brand")
        .agg(sum("qc").as("tc"),
          min(struct((-col("qc")).as("nc"), col("qoy").as("q"))).as("w"))
        .selectExpr("p_brand", "w.q AS peak_q",
          "(-w.nc) * 1000000 DIV tc AS peak_ppm")
        .orderBy("p_brand")
    }),

    // Does the first order's size predict the customer's lifetime
    // value? Quartile both (exact global thresholds via the unkeyed
    // two-level prefix sum over each reduced value domain), then the
    // 4×4 transition grid. First order = earliest date, tie lowest
    // order key — a two-step group-scoped reduction.
    "q252_first_value_ltv_grid" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .selectExpr("o_custkey", "o_orderkey", "o_orderdate",
          s"$orderCents AS c2")
      // round-11b: first-order value and lifetime value come out of ONE
      // aggregation — min(struct(date, orderkey, c2)) picks the same
      // (min date, min orderkey) row the fd/fk/firstVal legs picked
      // (o_orderkey is unique, so c2 is never consulted as a tie-break)
      // and carries its c2 along, while sum(c2) rides the same pass.
      // Replaces two joins, three aggregations and the orders
      // checkpoint (guide §2.4; identical values — the oracle's
      // fd/fk/cust CTEs pin the tie rule this struct reproduces).
      val cust = o.groupBy("o_custkey")
        .agg(min(struct(col("o_orderdate").as("d"), col("o_orderkey").as("k"),
            col("c2").as("v"))).as("m"),
          sum("c2").as("lv"))
        .select(col("o_custkey"), col("m.v").as("fv"), col("lv"))
        .localCheckpoint() // two CDFs + the grid
      // round-11: the two per-column CDF legs STACK into one keyed
      // prefix sum (both domains share the customer count n), pivoted
      // to a single broadcast threshold row (guide §2.4; identical
      // values)
      val vc = cust
        .selectExpr("stack(2, 'f', fv, 'l', lv) AS (k, v)")
        .groupBy("k", "v").agg(cnt.as("c"))
      val n = cust.agg(cnt.as("n"))
      val qq = Windows.prefixSum(vc, Seq("k"), "v", "c", "cum")
        .crossJoin(broadcast(n))
        .groupBy("k")
        .agg(min(when(expr("cum >= (n + 3) DIV 4"), col("v"))).as("q1"),
          min(when(expr("cum >= (n + 1) DIV 2"), col("v"))).as("q2"),
          min(when(expr("cum >= (3 * n + 3) DIV 4"), col("v"))).as("q3"))
      val thr = qq.groupBy()
        .agg(max(when(col("k") === "f", col("q1"))).as("f1"),
          max(when(col("k") === "f", col("q2"))).as("f2"),
          max(when(col("k") === "f", col("q3"))).as("f3"),
          max(when(col("k") === "l", col("q1"))).as("l1"),
          max(when(col("k") === "l", col("q2"))).as("l2"),
          max(when(col("k") === "l", col("q3"))).as("l3"))
      cust.crossJoin(broadcast(thr))
        .selectExpr(
          "CASE WHEN fv < f1 THEN 1 WHEN fv < f2 THEN 2 WHEN fv < f3 THEN 3 ELSE 4 END AS first_q",
          "CASE WHEN lv < l1 THEN 1 WHEN lv < l2 THEN 2 WHEN lv < l3 THEN 3 ELSE 4 END AS ltv_q")
        .groupBy("first_q", "ltv_q").agg(cnt.as("n_customers"))
        .orderBy("first_q", "ltv_q")
    })
  )

  /** DuckDB oracles — SUM-derived BIGINT outputs CAST; identical
    * threshold, argmax-tie, horizon, and ppm rules. */
  val oracle: Map[String, String] = Map(
    "q245_reciprocal_trade" -> """
WITH m AS (SELECT cn.n_name cnat, sn.n_name snat,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) // 100 AS BIGINT) rev
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer c ON c.c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN supplier s ON s.s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  GROUP BY cnat, snat)
SELECT f.cnat a, f.snat b, f.rev rev_ab, r.rev rev_ba,
  CAST(abs(f.rev - r.rev) * 1000000 // (f.rev + r.rev) AS BIGINT) asym_ppm
FROM m f JOIN m r ON r.cnat = f.snat AND r.snat = f.cnat
WHERE f.cnat < f.snat ORDER BY a, b""",

    "q246_dormancy_revival" -> """
WITH g AS (SELECT o_custkey,
    datediff('day', LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate) gap
  FROM orders QUALIFY gap IS NOT NULL),
per AS (SELECT o_custkey, COUNT(*) n_gaps, MAX(gap) max_gap,
    CAST(SUM(CASE WHEN gap >= 365 THEN 1 ELSE 0 END) AS BIGINT) n_dormant
  FROM g GROUP BY o_custkey)
SELECT c_mktsegment, COUNT(*) n_customers,
  CAST(SUM(CASE WHEN n_dormant >= 1 THEN 1 ELSE 0 END) AS BIGINT) n_revived,
  CAST(SUM(CASE WHEN n_dormant >= 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) revived_ppm,
  CAST(MAX(max_gap) AS BIGINT) max_gap_days
FROM per JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q247_priority_premium" -> """
WITH oc AS (SELECT o_orderpriority prio,
    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) c2 FROM orders),
pc AS (SELECT prio, c2, COUNT(*) c FROM oc GROUP BY prio, c2),
pt AS (SELECT prio, CAST(SUM(c) AS BIGINT) n FROM pc GROUP BY prio),
cum AS (SELECT prio, c2, CAST(SUM(c) OVER (PARTITION BY prio ORDER BY c2) AS BIGINT) cum FROM pc),
med AS (SELECT c.prio, MIN(c2) median_cents
  FROM cum c JOIN pt t ON t.prio = c.prio WHERE c.cum >= (t.n + 1) // 2 GROUP BY c.prio),
gc AS (SELECT c2, COUNT(*) c FROM oc GROUP BY c2),
gt AS (SELECT CAST(SUM(c) AS BIGINT) n FROM gc),
gcum AS (SELECT c2, CAST(SUM(c) OVER (ORDER BY c2) AS BIGINT) cum FROM gc),
gmed AS (SELECT MIN(c2) g_median FROM gcum CROSS JOIN gt WHERE cum >= (n + 1) // 2)
SELECT m.prio, t.n, m.median_cents, g.g_median,
  CAST(m.median_cents * 1000000 // g.g_median AS BIGINT) rel_ppm
FROM med m JOIN pt t ON t.prio = m.prio CROSS JOIN gmed g
ORDER BY m.prio""",

    "q248_elite_retention" -> """
WITH yr AS (SELECT CAST(year(o_orderdate) AS BIGINT) y, o_custkey,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) rev
  FROM orders GROUP BY y, o_custkey),
rc AS (SELECT y, rev, COUNT(*) c FROM yr GROUP BY y, rev),
rt AS (SELECT y, CAST(SUM(c) AS BIGINT) n FROM rc GROUP BY y),
cum AS (SELECT y, rev, CAST(SUM(c) OVER (PARTITION BY y ORDER BY rev) AS BIGINT) cum FROM rc),
thr AS (SELECT c.y, MIN(rev) thr FROM cum c JOIN rt t ON t.y = c.y
  WHERE c.cum >= t.n - t.n // 10 GROUP BY c.y),
elite AS (SELECT yr.y, yr.o_custkey FROM yr JOIN thr ON thr.y = yr.y
  WHERE yr.rev >= thr.thr)
SELECT e.y, COUNT(*) n_elite,
  CAST(SUM(CASE WHEN n.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) n_stay,
  CAST(SUM(CASE WHEN n.o_custkey IS NOT NULL THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) stay_ppm
FROM elite e LEFT JOIN elite n ON n.y = e.y + 1 AND n.o_custkey = e.o_custkey
WHERE e.y < 2001 GROUP BY e.y ORDER BY e.y""",

    "q249_style_fingerprint" -> """
WITH d AS (SELECT source, list_filter(string_split(lower(text), ' '), x -> x <> '') l
  FROM documents),
p AS (SELECT source, unnest(generate_series(1, len(l) - 1)) i, l FROM d WHERE len(l) >= 2),
bg AS (SELECT source, l[i] || '>' || l[i+1] bigram FROM p),
c AS (SELECT source, bigram, COUNT(*) c FROM bg GROUP BY source, bigram),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) n_bigrams FROM c GROUP BY source),
mx AS (SELECT source, CAST(MAX(c) AS BIGINT) mc FROM c GROUP BY source),
top AS (SELECT c.source, m.mc, MIN(bigram) top_bigram
  FROM c JOIN mx m ON m.source = c.source WHERE c.c = m.mc GROUP BY c.source, m.mc)
SELECT t.source, t.n_bigrams, p.top_bigram, p.mc top_n,
  CAST(p.mc * 1000000 // t.n_bigrams AS BIGINT) top_share_ppm
FROM tot t JOIN top p ON p.source = t.source ORDER BY t.source""",

    "q250_churn_census" -> """
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) us FROM events),
h AS (SELECT MAX(us) h_us FROM ev),
l AS (SELECT user_id, MAX(us) last_us FROM ev GROUP BY user_id),
tc AS (SELECT user_id, event_type, COUNT(*) c FROM ev GROUP BY user_id, event_type),
mx AS (SELECT user_id, MAX(c) mc FROM tc GROUP BY user_id),
modal AS (SELECT tc.user_id, MIN(event_type) modal_type
  FROM tc JOIN mx ON mx.user_id = tc.user_id WHERE tc.c = mx.mc GROUP BY tc.user_id),
u AS (SELECT modal_type,
    CASE WHEN last_us < h_us - 60 * 86400000000 THEN 1 ELSE 0 END churned
  FROM l JOIN modal ON modal.user_id = l.user_id CROSS JOIN h)
SELECT modal_type, COUNT(*) n_users, CAST(SUM(churned) AS BIGINT) n_churned,
  CAST(SUM(churned) * 1000000 // COUNT(*) AS BIGINT) churn_ppm
FROM u GROUP BY modal_type ORDER BY modal_type""",

    "q251_seasonal_peak" -> """
WITH bq AS (SELECT p_brand, CAST(quarter(l_shipdate) AS BIGINT) qoy,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) qc
  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY p_brand, qoy),
tot AS (SELECT p_brand, CAST(SUM(qc) AS BIGINT) tc FROM bq GROUP BY p_brand),
mx AS (SELECT p_brand, CAST(MAX(qc) AS BIGINT) mc FROM bq GROUP BY p_brand),
pk AS (SELECT bq.p_brand, m.mc, MIN(qoy) peak_q
  FROM bq JOIN mx m ON m.p_brand = bq.p_brand WHERE bq.qc = m.mc
  GROUP BY bq.p_brand, m.mc)
SELECT p.p_brand, p.peak_q, CAST(p.mc * 1000000 // t.tc AS BIGINT) peak_ppm
FROM pk p JOIN tot t ON t.p_brand = p.p_brand ORDER BY p.p_brand""",

    "q252_first_value_ltv_grid" -> """
WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) c2 FROM orders),
fd AS (SELECT o_custkey, MIN(o_orderdate) fd FROM o GROUP BY o_custkey),
fk AS (SELECT o.o_custkey, MIN(o_orderkey) fk FROM o JOIN fd ON fd.o_custkey = o.o_custkey
  WHERE o.o_orderdate = fd.fd GROUP BY o.o_custkey),
cust AS (SELECT l.o_custkey, f.c2 fv, l.lv FROM
  (SELECT o_custkey, CAST(SUM(c2) AS BIGINT) lv FROM o GROUP BY o_custkey) l
  JOIN fk ON fk.o_custkey = l.o_custkey
  JOIN o f ON f.o_orderkey = fk.fk),
fq AS (SELECT MIN(CASE WHEN cum >= (n + 3) // 4 THEN fv END) f1,
    MIN(CASE WHEN cum >= (n + 1) // 2 THEN fv END) f2,
    MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN fv END) f3
  FROM (SELECT fv, SUM(c) OVER (ORDER BY fv) cum, n FROM
    (SELECT fv, COUNT(*) c FROM cust GROUP BY fv)
    CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) n FROM cust))),
lq AS (SELECT MIN(CASE WHEN cum >= (n + 3) // 4 THEN lv END) l1,
    MIN(CASE WHEN cum >= (n + 1) // 2 THEN lv END) l2,
    MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN lv END) l3
  FROM (SELECT lv, SUM(c) OVER (ORDER BY lv) cum, n FROM
    (SELECT lv, COUNT(*) c FROM cust GROUP BY lv)
    CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) n FROM cust)))
SELECT CASE WHEN fv < f1 THEN 1 WHEN fv < f2 THEN 2 WHEN fv < f3 THEN 3 ELSE 4 END first_q,
  CASE WHEN lv < l1 THEN 1 WHEN lv < l2 THEN 2 WHEN lv < l3 THEN 3 ELSE 4 END ltv_q,
  COUNT(*) n_customers
FROM cust CROSS JOIN fq CROSS JOIN lq
GROUP BY first_q, ltv_q ORDER BY first_q, ltv_q"""
  ).map { case (k, v) => k -> v.trim }
}
