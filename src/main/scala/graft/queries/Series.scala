package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries
import graft.sources.Tables

/** Time-series/reshaping wave (q70-q78): dense/regularized series,
  * funnels, transition matrices, and unpivot/melt —
  * the batch forms of the gap-handling, conversion tracking, and
  * behavior modeling every streaming dashboard needs. Same t2 gate as
  * every other wave. */
object Series {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Gap-fill + forward-fill: hourly event counts per user densified
    // over each user's [first, last] hour (TimeSeries.gapFill), gaps
    // at 0 and the last active hour's count carried forward. Counts
    // are integers, so the fill is exactly reproducible.
    "q70_gap_fill" -> ((s, dir) => {
      val hourly = Tables.load(s, dir, "events")
        .filter(col("user_id") <= 3)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(cnt.as("n"))
      TimeSeries.gapFill(hourly, "user_id", "h", "n")
        .orderBy("user_id", "h")
        .limit(200)
    }),

    // Sequenced conversion funnel: first 'view', then a 'click' within
    // an hour of it, then a 'purchase' within an hour of that click —
    // per-user stage times via chained conditional min-aggregates.
    // Each stage is one hash agg + an equi join on user_id (all
    // co-partitioned on the same key), and the stage frames shrink
    // monotonically, so later joins broadcast at any scale.
    "q71_funnel" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val hour = expr("INTERVAL 1 HOUR")
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, Seq("user_id"))
        .filter(col("ts") > col("t1") && col("ts") <= col("t1") + hour)
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, Seq("user_id"))
        .filter(col("ts") > col("t2") && col("ts") <= col("t2") + hour)
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      s1.agg(cnt.as("n_view"))
        .crossJoin(s2.agg(cnt.as("n_view_click")))
        .crossJoin(s3.agg(cnt.as("n_view_click_purchase")))
    }),

    // UNPIVOT/melt — the inverse of q51's pivot: measure columns
    // become (measure, value) rows via ONE scan (Spark's unpivot plans
    // an Expand, where the UNION ALL oracle formulation scans three
    // times), then an exact-decimal rollup per measure.
    "q73_unpivot" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          Array(col("l_discount").as("discount"),
            col("l_extendedprice").as("extendedprice"),
            col("l_quantity").as("quantity")),
          "measure", "v")
        .groupBy("measure")
        .agg(sum(col("v").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"), cnt.as("n"))
        .orderBy("measure")
    }),

    // Window navigation functions (first/nth/last value) over a full
    // unbounded frame — the remaining window family after q17's ranks,
    // q18's lag/lead, and q53's distributions. The ordering
    // (c_acctbal, c_custkey) is provably unique, so nth_value is
    // deterministic; the frame must be spelled UNBOUNDED FOLLOWING or
    // last_value degenerates to the current row in both engines.
    "q74_win_navigation" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          first(col("c_acctbal")).over(w).cast("double").as("seg_min_bal"),
          nth_value(col("c_acctbal"), 3).over(w).cast("double").as("seg_third_bal"),
          last(col("c_acctbal")).over(w).cast("double").as("seg_max_bal"))
        .orderBy("c_mktsegment", "c_custkey")
        .limit(200)
    }),

    // Cohort retention matrix: users bucketed by first-activity week
    // (their cohort), counted in every week they return — the standard
    // product-analytics triangle. Two hash aggs + one equi join on
    // user_id; the per-user cohort frame is |users| rows and
    // broadcast-able at any scale. Weeks cast to DATE on both engines
    // (DuckDB's week-trunc is a DATE, Spark's a TIMESTAMP).
    "q75_retention" -> ((s, dir) => {
      val uw = Tables.load(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("w"))
        .distinct()
      val fw = uw.groupBy("user_id").agg(min(col("w")).as("cohort"))
      uw.join(fw, Seq("user_id"))
        .groupBy("cohort", "w").agg(cnt.as("n_users"))
        .orderBy("cohort", "w")
    }),

    // Inter-event time histogram: per-user gap to the previous event
    // (LAG over the provably-unique ordering), bucketed by exact
    // integer microsecond arithmetic (SURVEY.md §5 — engine-portable,
    // unlike second-boundary date_diff), counted per 10-minute bucket.
    // Window shuffles once on user_id; the histogram agg input is one
    // row per event with map-side partials.
    "q76_gap_histogram" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.load(s, dir, "events")
        .select(col("ts"), lag(col("ts"), 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .select(expr("(unix_micros(ts) - unix_micros(prev)) DIV 600000000").as("bucket_10min"))
        .groupBy("bucket_10min").agg(cnt.as("n"))
        .orderBy("bucket_10min")
        .limit(100)
    }),

    // Percent-of-total: each customer's ppm share of their segment's
    // balance via an UNORDERED partition window (sum OVER partition,
    // no frame/order — the one window form q17-q76 never used). All
    // arithmetic in exact integer cents and ppm DIV; positive balances
    // only, because integer division of negatives floors in DuckDB but
    // truncates in Spark.
    "q77_pct_of_total" -> ((s, dir) => {
      Tables.load(s, dir, "customer")
        .filter(col("c_acctbal") > 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          (col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
        .withColumn("share_ppm", expr("cents * 1000000 DIV sum(cents) OVER (PARTITION BY c_mktsegment)"))
        .select("c_custkey", "c_mktsegment", "share_ppm")
        .orderBy("c_mktsegment", "c_custkey")
        .limit(200)
    }),

    // Bag-semantics set operations: EXCEPT ALL / INTERSECT ALL keep
    // multiplicities (q23 covers the DISTINCT set forms) — Catalyst
    // rewrites both to aggregations over per-side counts, so they stay
    // hash-partitionable like any groupBy at scale.
    "q78_setops_all" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 100000).select(col("o_custkey").as("k"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      val ex = a.exceptAll(b).agg(cnt.as("n")).select(lit("except_all").as("op"), col("n"))
      val in = a.intersectAll(b).agg(cnt.as("n")).select(lit("intersect_all").as("op"), col("n"))
      ex.union(in).orderBy("op")
    }),

    // Event-type transition matrix (first-order Markov counts): each
    // user's stream ordered by (ts, event_id) — a provably-unique key,
    // so LAG is total-ordered — then one hash agg over (prev, curr).
    // One window shuffle on user_id, one agg shuffle on the 5x5 matrix.
    "q72_transitions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.load(s, dir, "events")
        .select(col("event_type").as("curr"),
          lag(col("event_type"), 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .groupBy("prev", "curr").agg(cnt.as("n"))
        .orderBy("prev", "curr")
    }),

    // SCD Type-2 reconstruction (round 5): each user's event stream
    // collapsed into validity intervals of its current event_type —
    // the gaps-and-islands build every dimension-history (and session
    // state) pipeline runs. Change flags via LAG over the provably
    // unique (ts, event_id) order, island ids via a running sum
    // (ROWS frame pinned so both engines agree even though the order
    // key is unique), valid_to = the NEXT island's valid_from (NULL =
    // still open). The report folds the interval table per state:
    // version counts and exact integer dwell in MICROseconds (closed
    // intervals only — an open interval has no defined dwell; a state
    // seen only as some user's final island reports NULL like the
    // oracle's empty SUM). Scale shape: both windows are KEYED by
    // user_id (per-user history is bounded; users shard), the island
    // relation is change-count-sized, and the final agg is 5 rows.
    "q137_scd2" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val chg = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("grp", sum(col("chg")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      val versions = chg.groupBy("user_id", "grp")
        .agg(min(col("event_type")).as("state"), // constant within an island
          min(col("ts")).as("valid_from"),
          cnt.as("n_events"))
      val wg = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("grp")
      val dwell = unix_micros(col("valid_to")) - unix_micros(col("valid_from"))
      versions.withColumn("valid_to", lead(col("valid_from"), 1).over(wg))
        .groupBy("state")
        .agg(cnt.as("n_versions"),
          sum(col("n_events")).as("n_events"),
          sum(when(col("valid_to").isNotNull, dwell)).as("dwell_us"),
          max(when(col("valid_to").isNotNull, dwell)).as("max_dwell_us"))
        .orderBy("state")
    })
  )

  /** DuckDB oracle (validated at sf0.01/sf0.1 before the native). */
  val oracle: Map[String, String] = Map(
    "q70_gap_fill" -> """
WITH e AS (SELECT user_id, date_trunc('hour', ts) h FROM events WHERE user_id <= 3),
hourly AS (SELECT user_id, h, COUNT(*) n FROM e GROUP BY 1, 2),
b AS (SELECT user_id, min(h) h0, max(h) h1 FROM hourly GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) h FROM b),
f AS (SELECT g.user_id, g.h, COALESCE(n, 0) n
      FROM grid g LEFT JOIN hourly ON hourly.user_id = g.user_id AND hourly.h = g.h)
SELECT user_id, h, n,
  COALESCE(LAST_VALUE(CASE WHEN n > 0 THEN n END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY h), 0) carried
FROM f ORDER BY user_id, h LIMIT 200""",

    "q71_funnel" -> """
WITH s1 AS (SELECT user_id, min(ts) t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) t2 FROM events e JOIN s1 ON s1.user_id = e.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 1 HOUR
       GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) t3 FROM events e JOIN s2 ON s2.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 1 HOUR
       GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM s1) n_view,
       (SELECT COUNT(*) FROM s2) n_view_click,
       (SELECT COUNT(*) FROM s3) n_view_click_purchase""",

    "q73_unpivot" -> """
SELECT measure, CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) total, COUNT(*) n
FROM (
  SELECT 'discount' measure, l_discount v FROM lineitem
  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'quantity', l_quantity FROM lineitem
) GROUP BY measure ORDER BY measure""",

    "q74_win_navigation" -> """
SELECT c_custkey, c_mktsegment,
  CAST(FIRST_VALUE(c_acctbal) OVER w AS DOUBLE) seg_min_bal,
  CAST(NTH_VALUE(c_acctbal, 3) OVER w AS DOUBLE) seg_third_bal,
  CAST(LAST_VALUE(c_acctbal) OVER w AS DOUBLE) seg_max_bal
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY c_mktsegment, c_custkey LIMIT 200""",

    "q75_retention" -> """
WITH uw AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) w FROM events),
fw AS (SELECT user_id, min(w) cohort FROM uw GROUP BY user_id)
SELECT fw.cohort, uw.w, COUNT(*) n_users
FROM uw JOIN fw ON fw.user_id = uw.user_id
GROUP BY 1, 2 ORDER BY 1, 2""",

    "q76_gap_histogram" -> """
WITH d AS (SELECT user_id, ts, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev
           FROM events),
g AS (SELECT (epoch_us(ts) - epoch_us(prev)) // 600000000 AS bucket_10min
      FROM d WHERE prev IS NOT NULL)
SELECT CAST(bucket_10min AS BIGINT) bucket_10min, COUNT(*) n
FROM g GROUP BY 1 ORDER BY 1 LIMIT 100""",

    "q77_pct_of_total" -> """
WITH c AS (SELECT c_custkey, c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) cents
           FROM customer WHERE c_acctbal > 0)
SELECT c_custkey, c_mktsegment,
  CAST(cents * 1000000 // SUM(cents) OVER (PARTITION BY c_mktsegment) AS BIGINT) share_ppm
FROM c ORDER BY c_mktsegment, c_custkey LIMIT 200""",

    "q78_setops_all" -> """
WITH a AS (SELECT o_custkey k FROM orders WHERE o_totalprice > 100000),
     b AS (SELECT o_custkey k FROM orders WHERE o_orderstatus = 'F')
SELECT 'except_all' op, COUNT(*) n FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
UNION ALL
SELECT 'intersect_all', COUNT(*) FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
ORDER BY op""",

    "q72_transitions" -> """
WITH o AS (SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev
           FROM events)
SELECT prev, event_type AS curr, COUNT(*) n
FROM o WHERE prev IS NOT NULL
GROUP BY prev, curr ORDER BY prev, curr""",

    // q137: the same islands build — LAG change flags, ROWS-framed
    // running sum, LEAD for valid_to — with dwell in exact integer
    // epoch microseconds (epoch_us twin of Spark's unix_micros under
    // the shared UTC session)
    "q137_scd2" -> """
WITH e AS (SELECT user_id, ts, event_id, event_type FROM events),
f AS (SELECT *, CASE WHEN LAG(event_type) OVER w IS NULL
                      OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) grp FROM f),
v AS (SELECT user_id, grp, MIN(event_type) state, MIN(ts) valid_from, COUNT(*) n_events
      FROM g GROUP BY user_id, grp),
i AS (SELECT *, LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY grp) valid_to FROM v)
SELECT state, COUNT(*) n_versions, CAST(SUM(n_events) AS BIGINT) n_events,
  CAST(SUM(CASE WHEN valid_to IS NOT NULL
                THEN epoch_us(valid_to) - epoch_us(valid_from) END) AS BIGINT) dwell_us,
  CAST(MAX(CASE WHEN valid_to IS NOT NULL
                THEN epoch_us(valid_to) - epoch_us(valid_from) END) AS BIGINT) max_dwell_us
FROM i GROUP BY state ORDER BY state"""
  ).map { case (k, v) => k -> v.trim }
}
