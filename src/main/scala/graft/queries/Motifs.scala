package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sequence-motif & hierarchy wave (q189–q196, round 7): the
  * row-adjacent patterns and rollups the earlier waves never touch —
  * temporal proximity joins done with bucket equi-joins (q189), exact
  * per-group modes (q190), gaps-and-islands activity streaks (q191),
  * order-cadence regularity bands (q192), the region→nation revenue
  * rollup (q193), consecutive-event trend persistence (q194),
  * per-nation supplier HHI (q195), and round-number bias detection
  * (q196).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * Sequence windows are ALWAYS keyed per user/customer (bounded fan-
  * in per key — the scalable window shape); the proximity join
  * never compares timestamps across the whole stream, only within
  * (user, time-bucket) cells; doubles are compared, grouped, and
  * counted but never aggregated arithmetically.
  */
object Motifs {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Temporal proximity: which event types cluster within ±5 minutes
    // of the SAME user's purchase? The scalable range-join form: both
    // sides bucket into 5-minute cells, purchases replicate to the
    // three neighboring cells (never the events side — purchases are
    // the smaller relation), the join keys on (user, cell), and the
    // exact |dt| <= 300s predicate filters the survivors. No
    // stream-wide theta join ever exists.
    "q189_purchase_proximity" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .selectExpr("event_id", "user_id", "event_type",
          "unix_micros(ts) AS us")
        .localCheckpoint() // both join legs
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("us").as("p_us"))
        .withColumn("cell", explode(expr(
          "array(p_us DIV 300000000 - 1, p_us DIV 300000000, p_us DIV 300000000 + 1)")))
      val o = ev.selectExpr("event_id", "user_id", "event_type", "us",
        "us DIV 300000000 AS cell")
      p.join(o, col("p_user") === col("user_id") && p("cell") === o("cell"))
        .filter(col("event_id") =!= col("p_id") &&
          abs(col("us") - col("p_us")) <= 300000000L)
        .groupBy("event_type").agg(cnt.as("n_near"),
          countDistinct(col("p_id")).as("n_purchases_touched"))
        .orderBy("event_type")
    }),

    // Exact mode per event type: the most frequent value, its count,
    // and its support — argmax by (max count, then MIN value) done as
    // two hash aggs + a keyed join, the engine-portable tie rule (no
    // float struct ordering in the shuffle).
    "q190_mode_value" -> ((s, dir) => {
      // round-11: the (max count, min value) mode is ONE min-struct
      // aggregation on (−c, value) — same tie rule, no max leg, no
      // join-back probe, no checkpoint (guide §2.4; identical values)
      Tables.load(s, dir, "events")
        .groupBy("event_type", "value").agg(cnt.as("c"))
        .groupBy("event_type")
        .agg(sum("c").as("n_events"),
          min(struct((-col("c")).as("nc"), col("value").as("v"))).as("w"))
        .selectExpr("event_type", "w.v AS mode_value",
          "(-w.nc) AS mode_count", "n_events",
          "mode_count * 1000000 DIV n_events AS support_ppm")
        .orderBy("event_type")
    }),

    // Activity streaks: each user's LONGEST run of consecutive active
    // days (gaps-and-islands: epoch-day minus per-user row_number is
    // constant within a run), reported as a histogram — the retention
    // shape a DAU curve hides. All windows keyed per user.
    "q191_active_streaks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val days = Tables.load(s, dir, "events")
        .selectExpr("user_id", "unix_date(CAST(date_trunc('day', ts) AS DATE)) AS d")
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("d")
      val streaks = days
        .withColumn("island", col("d") - row_number().over(w))
        .groupBy("user_id", "island").agg(cnt.as("len"))
        .groupBy("user_id").agg(max("len").as("best"))
      val tot = streaks.agg(cnt.as("n_users_tot"))
      streaks.groupBy("best").agg(cnt.as("n_users"))
        .crossJoin(broadcast(tot))
        .selectExpr("best AS streak_days", "n_users",
          "n_users * 1000000 DIV n_users_tot AS user_share_ppm")
        .orderBy("streak_days")
    }),

    // Order cadence: per customer, the mean day-gap between
    // consecutive orders (integer division — no float means), banded
    // into 30-day buckets; single-order customers land in band -1.
    // The lag window is keyed per customer.
    "q192_order_regularity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
      val gaps = Tables.load(s, dir, "orders")
        .selectExpr("o_custkey", "o_orderkey",
          "unix_date(CAST(o_orderdate AS DATE)) AS d")
        .withColumn("gap", col("d") - lag("d", 1).over(w))
        .groupBy("o_custkey").agg(cnt.as("n_orders"),
          sum("gap").as("gap_sum"), count(col("gap")).as("n_gaps"),
          max("gap").as("max_gap"))
      gaps
        .selectExpr("o_custkey", "n_orders", "max_gap",
          "CASE WHEN n_gaps = 0 THEN -1L ELSE gap_sum DIV n_gaps DIV 30 END AS cadence_band")
        .groupBy("cadence_band")
        .agg(cnt.as("n_customers"), sum("n_orders").as("n_orders"),
          max("max_gap").as("max_gap_days"))
        .orderBy("cadence_band")
    }),

    // The region -> nation revenue rollup: exact cents per nation,
    // each nation's share of its region, each region's share of the
    // world — the hierarchical business report over a 4-relation dim
    // chain, all dimension joins broadcast.
    "q193_region_rollup" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .selectExpr("o_custkey",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents")
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      val byNation = o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(sum("cents").as("cents"), cnt.as("n_orders"))
        .localCheckpoint() // region totals + world total + the report
      val regTot = byNation.groupBy("region").agg(sum("cents").as("reg_cents"))
      val tot = byNation.agg(sum("cents").as("tot_cents"))
      byNation.join(broadcast(regTot), "region").crossJoin(broadcast(tot))
        .selectExpr("region", "nation", "n_orders",
          "CAST(cents AS DOUBLE) / 100 AS net_revenue",
          "cents * 1000000 DIV reg_cents AS nation_share_of_region_ppm",
          "reg_cents * 1000000 DIV tot_cents AS region_share_ppm")
        .orderBy("region", "nation")
    }),

    // Trend persistence: for consecutive same-user events, does the
    // value keep moving the same way? Up/down/flat transitions per
    // type of the LATER event — pure double comparisons (never
    // arithmetic), lag keyed per user.
    "q194_trend_persistence" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      Tables.load(s, dir, "events")
        .selectExpr("event_id", "user_id", "event_type", "value",
          "unix_micros(ts) AS us")
        .withColumn("prev", lag("value", 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy("event_type").agg(cnt.as("n_pairs"),
          sum(when(col("value") > col("prev"), 1L).otherwise(0L)).as("n_up"),
          sum(when(col("value") < col("prev"), 1L).otherwise(0L)).as("n_down"))
        .selectExpr("event_type", "n_pairs", "n_up", "n_down",
          "n_up * 1000000 DIV n_pairs AS up_ppm",
          "n_down * 1000000 DIV n_pairs AS down_ppm")
        .orderBy("event_type")
    }),

    // Supplier concentration WITHIN each nation: revenue HHI over a
    // nation's suppliers — which supply bases are monocultures? Two
    // stacked aggs (supplier cents, then per-nation sum of squared
    // ppm shares), integer-exact throughout.
    "q195_nation_supplier_hhi" -> ((s, dir) => {
      // ×10000 (the FULL scale-4) so the BIGINT cast is exact — a ×100
      // would leave 2 fractional digits, and CAST(DECIMAL AS BIGINT)
      // truncates in Spark but ROUNDS in DuckDB (the q165 trap's cast
      // form, measured here)
      val li = Tables.load(s, dir, "lineitem")
        .selectExpr("l_suppkey",
          "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * " +
            "(1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT) AS c4")
      val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
      val perSupp = li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), col("s_suppkey"))
        .agg(sum("c4").as("cents"))
        .localCheckpoint() // nation totals + the share pass
      val natTot = perSupp.groupBy("nation")
        .agg(sum("cents").as("nat_cents"), cnt.as("n_suppliers"))
      perSupp.join(broadcast(natTot), "nation")
        .selectExpr("nation", "n_suppliers", "nat_cents",
          "cents * 1000000 DIV nat_cents AS share_ppm")
        .groupBy("nation")
        .agg(first("n_suppliers").as("n_suppliers"),
          first("nat_cents").as("nc"),
          sum(expr("share_ppm * share_ppm")).as("ss"))
        .selectExpr("nation", "n_suppliers",
          "CAST(nc AS DOUBLE) / 10000 AS net_revenue",
          "ss DIV 1000000 AS hhi_ppm")
        .orderBy("nation")
    }),

    // Round-number bias: what share of each type's values are exact
    // integers — the "human-entered vs instrumented" tell. One agg
    // pair; the comparison value = floor(value) is exact IEEE, never
    // a tolerance.
    "q196_round_value_bias" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy("event_type").agg(cnt.as("n_events"),
          sum(when(col("value") === floor(col("value")), 1L).otherwise(0L))
            .as("n_round"))
        .selectExpr("event_type", "n_events", "n_round",
          "n_round * 1000000 DIV n_events AS round_ppm")
        .orderBy("event_type")
    })
  )

  /** DuckDB oracles — SUM-derived BIGINT outputs CAST; identical
    * bucket/tie rules. */
  val oracle: Map[String, String] = Map(
    "q189_purchase_proximity" -> """
WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) us FROM events),
p AS (SELECT e.event_id p_id, e.user_id p_user, e.us p_us, e.us // 300000000 + d.d cell
  FROM ev e CROSS JOIN (SELECT unnest([-1, 0, 1]) d) d WHERE e.event_type = 'purchase'),
o AS (SELECT event_id, user_id, event_type, us, us // 300000000 cell FROM ev)
SELECT o.event_type, COUNT(*) n_near,
  COUNT(DISTINCT p.p_id) n_purchases_touched
FROM p JOIN o ON o.user_id = p.p_user AND o.cell = p.cell
WHERE o.event_id <> p.p_id AND abs(o.us - p.p_us) <= 300000000
GROUP BY o.event_type ORDER BY o.event_type""",

    "q190_mode_value" -> """
WITH counts AS (SELECT event_type, value, COUNT(*) c FROM events GROUP BY event_type, value),
mx AS (SELECT event_type, MAX(c) mx, CAST(SUM(c) AS BIGINT) n_events FROM counts GROUP BY event_type)
SELECT c.event_type, MIN(c.value) mode_value,
  CAST(MIN(m.mx) AS BIGINT) mode_count, MIN(m.n_events) n_events,
  CAST(MIN(m.mx) * 1000000 // MIN(m.n_events) AS BIGINT) support_ppm
FROM counts c JOIN mx m ON m.event_type = c.event_type AND c.c = m.mx
GROUP BY c.event_type ORDER BY c.event_type""",

    "q191_active_streaks" -> """
WITH days AS (SELECT DISTINCT user_id, CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS BIGINT) d FROM events),
runs AS (SELECT user_id, d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) island FROM days),
lens AS (SELECT user_id, island, COUNT(*) len FROM runs GROUP BY user_id, island),
best AS (SELECT user_id, CAST(MAX(len) AS BIGINT) best FROM lens GROUP BY user_id),
tot AS (SELECT COUNT(*) n_users_tot FROM best)
SELECT best streak_days, COUNT(*) n_users,
  CAST(COUNT(*) * 1000000 // tot.n_users_tot AS BIGINT) user_share_ppm
FROM best CROSS JOIN tot GROUP BY best, tot.n_users_tot ORDER BY streak_days""",

    "q192_order_regularity" -> """
WITH o AS (SELECT o_custkey, o_orderkey,
    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) d FROM orders),
g AS (SELECT o_custkey, d - LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) gap FROM o),
per_c AS (SELECT o_custkey, COUNT(*) n_orders,
    CAST(SUM(gap) AS BIGINT) gap_sum, COUNT(gap) n_gaps,
    CAST(MAX(gap) AS BIGINT) max_gap
  FROM g GROUP BY o_custkey),
banded AS (SELECT o_custkey, n_orders, max_gap,
    CASE WHEN n_gaps = 0 THEN -1 ELSE gap_sum // n_gaps // 30 END cadence_band
  FROM per_c)
SELECT CAST(cadence_band AS BIGINT) cadence_band, COUNT(*) n_customers,
  CAST(SUM(n_orders) AS BIGINT) n_orders, MAX(max_gap) max_gap_days
FROM banded GROUP BY cadence_band ORDER BY cadence_band""",

    "q193_region_rollup" -> """
WITH by_nation AS (SELECT r_name region, n_name nation,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) cents,
    COUNT(*) n_orders
  FROM orders JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
  GROUP BY r_name, n_name),
reg AS (SELECT region, CAST(SUM(cents) AS BIGINT) reg_cents FROM by_nation GROUP BY region),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) tot_cents FROM by_nation)
SELECT b.region, b.nation, b.n_orders,
  CAST(b.cents AS DOUBLE) / 100 net_revenue,
  CAST(b.cents * 1000000 // r.reg_cents AS BIGINT) nation_share_of_region_ppm,
  CAST(r.reg_cents * 1000000 // tot.tot_cents AS BIGINT) region_share_ppm
FROM by_nation b JOIN reg r ON r.region = b.region CROSS JOIN tot
ORDER BY b.region, b.nation""",

    "q194_trend_persistence" -> """
WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) us FROM events),
p AS (SELECT event_type, value,
    LAG(value) OVER (PARTITION BY user_id ORDER BY us, event_id) prev
  FROM e)
SELECT event_type, COUNT(*) n_pairs,
  CAST(SUM(CASE WHEN value > prev THEN 1 ELSE 0 END) AS BIGINT) n_up,
  CAST(SUM(CASE WHEN value < prev THEN 1 ELSE 0 END) AS BIGINT) n_down,
  CAST(CAST(SUM(CASE WHEN value > prev THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // COUNT(*) AS BIGINT) up_ppm,
  CAST(CAST(SUM(CASE WHEN value < prev THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // COUNT(*) AS BIGINT) down_ppm
FROM p WHERE prev IS NOT NULL
GROUP BY event_type ORDER BY event_type""",

    "q195_nation_supplier_hhi" -> """
WITH per_s AS (SELECT n_name nation, s_suppkey,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) cents
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  GROUP BY n_name, s_suppkey),
nat AS (SELECT nation, CAST(SUM(cents) AS BIGINT) nat_cents, COUNT(*) n_suppliers
  FROM per_s GROUP BY nation),
shares AS (SELECT p.nation, n.n_suppliers, n.nat_cents,
    CAST(p.cents * 1000000 // n.nat_cents AS BIGINT) share_ppm
  FROM per_s p JOIN nat n ON n.nation = p.nation)
SELECT nation, MIN(n_suppliers) n_suppliers,
  CAST(MIN(nat_cents) AS DOUBLE) / 10000 net_revenue,
  CAST(CAST(SUM(share_ppm * share_ppm) AS BIGINT) // 1000000 AS BIGINT) hhi_ppm
FROM shares GROUP BY nation ORDER BY nation""",

    "q196_round_value_bias" -> """
SELECT event_type, COUNT(*) n_events,
  CAST(SUM(CASE WHEN value = floor(value) THEN 1 ELSE 0 END) AS BIGINT) n_round,
  CAST(CAST(SUM(CASE WHEN value = floor(value) THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // COUNT(*) AS BIGINT) round_ppm
FROM events GROUP BY event_type ORDER BY event_type"""
  ).map { case (k, v) => k -> v.trim }
}
