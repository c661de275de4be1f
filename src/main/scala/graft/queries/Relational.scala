package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Windows
import graft.sources.Tables

/** Native DataFrame-API implementations of the §2 relational contract
  * (scans, joins, aggregation, windows, set ops, scalar functions,
  * subqueries). Semantics mirror the validated SQL in
  * [[QueryTexts]] exactly — every DECIMAL cast, NULLS FIRST, tiebreak
  * column, and integer DIV is a determinism rule (SURVEY.md §5); the
  * SQL texts remain as a differential-testing surface.
  *
  * Scale notes are inline per query: dimension sides broadcast,
  * aggregates run partial+final, windows shuffle once on their
  * partition key.
  */
object Relational {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def cnt: Column = count(lit(1))

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, Queries.QueryFn] = Map(

    // Timestamp-range filter + projection: both pushed into the parquet
    // scan (PushedFilters + 4-column ReadSchema); top-100 runs as
    // TakeOrderedAndProject, no global sort materialized.
    "q01_scan_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_quantity"))
        .limit(100)
    }),

    "q02_predicates" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_totalprice").between(50000, 200000) &&
                col("o_orderstatus").isin("F", "O") &&
                !col("o_orderpriority").like("1-%") &&
                col("o_custkey").isNotNull)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
        .limit(100)
    }),

    // Fact-dim equi-join: customer is the small side — planner
    // broadcasts it under the 10 MB threshold; at 100 TB the same plan
    // holds as long as the dim fits, else AQE falls back to sort-merge.
    "q03_join_inner" -> ((s, dir) => {
      t(s, dir, "orders").join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(cnt.as("n"), sum(dec2(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q5 shape: lineitem is the only big table; region/nation/
    // supplier/customer chain broadcasts, revenue aggregates
    // partial+final per nation.
    "q04_join_multiway" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // COUNT(o_orderkey) (not COUNT(*)) preserves left-outer null
    // semantics: customers with no orders count 0.
    "q05_join_left_outer" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("n_orders").desc, col("c_custkey"))
        .limit(50)
    }),

    // EXISTS == left-semi join: probe side streams, no fan-out on
    // duplicate order keys.
    "q06_join_semi" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left_semi")
        .agg(cnt.as("n_customers_with_orders"))
    }),

    // NOT EXISTS with an extra predicate: push the predicate into the
    // build side *before* the anti join so the hash table only holds
    // qualifying orders.
    "q07_join_anti" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 250000),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(50)
    }),

    // Theta self-join: the equi conjunct (region key) hashes, the
    // inequality filters post-probe — never a cartesian product.
    "q08_join_theta" -> ((s, dir) => {
      val n1 = t(s, dir, "nation").as("n1")
      val n2 = t(s, dir, "nation").as("n2")
      n1.join(n2, col("n1.n_regionkey") === col("n2.n_regionkey") &&
                  col("n1.n_nationkey") < col("n2.n_nationkey"))
        .select(col("n1.n_name").as("a"), col("n2.n_name").as("b"))
        .orderBy("a", "b")
    }),

    // Range "join" without the join: per event, the number of
    // same-user events in (ts, ts+5min] is a RANGE-frame count over
    // one sort on (user_id, ts) — [0,5min] minus the [0,0] ties. One
    // WindowExec instead of a pair-materializing self-join: at 100 TB
    // the pair join explodes on hot users; this stays linear per user.
    "q09_join_range" -> ((s, dir) => {
      val us = unix_micros(col("ts"))
      val within = Window.partitionBy("user_id").orderBy(us).rangeBetween(0, 300000000L)
      val ties = Window.partitionBy("user_id").orderBy(us).rangeBetween(0, 0)
      t(s, dir, "events")
        .select(col("event_type"),
          (cnt.over(within) - cnt.over(ties)).as("follows"))
        .groupBy("event_type")
        .agg(sum(col("follows")).as("follow_within_5m"))
        .filter(col("follow_within_5m") > 0)
        .orderBy("event_type")
    }),

    // As-of join as a running window aggregate (graft.operators.Windows):
    // one shuffle on user_id instead of a pair-exploding time join.
    "q10_join_asof" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("last_signup_ts",
          Windows.asOfPrior(col("user_id"), col("ts"), col("event_id"),
            col("event_type") === "signup"))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "last_signup_ts")
        .orderBy("event_id")
        .limit(100)
    }),

    // TPC-H Q1: partial+final HashAggregate over 2 grouping keys — the
    // reference's distribute-partials/merge-at-coordinator idea is
    // exactly what Spark does for free here.
    "q11_agg_hash" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).cast("double").as("sum_disc_price"),
          round(avg(dec2(col("l_quantity"))), 6).cast("double").as("avg_qty"),
          cnt.as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Multiple COUNT(DISTINCT): Catalyst expands to one Expand +
    // two-phase agg — no per-group hash sets on the driver.
    "q12_agg_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("d_parts"),
             countDistinct(col("l_suppkey")).as("d_supps"),
             cnt.as("n"))
        .orderBy("l_returnflag")
    }),

    "q13_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("yr", expr("EXTRACT(year FROM o_orderdate)"))
        .rollup("yr", "o_orderstatus")
        .agg(grouping(col("yr")).as("g_yr"),
             grouping(col("o_orderstatus")).as("g_st"),
             sum(dec2(col("o_totalprice"))).cast("double").as("revenue"),
             cnt.as("n"))
        .orderBy(col("g_yr"), col("g_st"),
                 col("yr").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    }),

    "q14_cube" -> ((s, dir) => {
      t(s, dir, "documents")
        .cube("lang", "source")
        .agg(grouping(col("lang")).as("g_l"),
             grouping(col("source")).as("g_s"),
             cnt.as("n"),
             round(avg(dec2(col("n_chars"))), 6).cast("double").as("avg_chars"))
        .orderBy(col("g_l"), col("g_s"),
                 col("lang").asc_nulls_first, col("source").asc_nulls_first)
    }),

    // Explicit GROUPING SETS incl. the grand total — Spark 4's
    // Dataset.groupingSets API (one Expand + single aggregate, same
    // plan the SQL text produces).
    "q15_grouping_sets" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("day", date_trunc("day", col("ts")).cast("date"))
      e.groupingSets(Seq(Seq(col("event_type")), Seq(col("day")), Seq()),
          col("event_type"), col("day"))
        .agg(grouping(col("event_type")).as("g_t"),
             grouping(col("day")).as("g_d"),
             cnt.as("n"))
        .orderBy(col("g_t"), col("g_d"),
                 col("event_type").asc_nulls_first, col("day").asc_nulls_first)
    }),

    "q16_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(cnt.as("n"), sum(dec2(col("o_totalprice"))).cast("double").as("tot"))
        .filter(col("n") >= 5)
        .orderBy(col("n").desc, col("o_custkey"))
        .limit(50)
    }),

    // One window spec shared by all three rank functions → single
    // WindowExec pass (shuffle once on segment, sort once).
    "q17_win_rank" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          row_number().over(w).as("rn"))
        .orderBy("c_mktsegment", "rn")
        .limit(100)
    }),

    "q18_win_lag_ma" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ma = w.rowsBetween(-3, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          round(dec2(col("value")), 2).cast("double").as("value"),
          round(dec2(lag(col("value"), 1).over(w)), 2).cast("double").as("prev_value"),
          round(dec2(lead(col("value"), 1).over(w)), 2).cast("double").as("next_value"),
          round(avg(dec2(col("value"))).over(ma), 6).cast("double").as("ma4"))
        .orderBy("user_id", "event_id")
        .limit(200)
    }),

    // RANGE frame needs a numeric sort key: epoch millis, not the
    // timestamp itself (SURVEY.md §2 q19).
    "q19_win_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(unix_millis(col("ts")))
        .rangeBetween(-600000, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), cnt.over(w).as("n_last_10m"))
        .orderBy("event_id")
        .limit(200)
    }),

    // Top-k per group via the Windows operator: no global sort, rank
    // computed per event_type partition. The window orders by the raw
    // value (SQL window refs resolve to the input column, not the
    // rounded alias).
    "q20_topk_per_group" -> ((s, dir) => {
      Windows.topKPerGroup(
          t(s, dir, "events"), 5, col("event_type"), col("value").desc, col("event_id"))
        .select(col("event_type"), col("event_id"),
                round(dec2(col("value")), 2).cast("double").as("value"), col("rn"))
        .orderBy("event_type", "rn")
    }),

    // Global top-50 → TakeOrderedAndProject: per-partition heaps, no
    // full shuffle-sort.
    "q21_sort_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), round(dec2(col("o_totalprice")), 2).cast("double").as("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
    }),

    "q22_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val b = c.filter(col("c_acctbal") > 5000).select("c_custkey")
      a.union(b).agg(cnt.as("n")).select(lit("all").as("tag"), col("n"))
        .union(a.union(b).distinct().agg(cnt.as("n")).select(lit("dedup").as("tag"), col("n")))
        .orderBy("tag")
    }),

    "q23_intersect_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
      val open = o.filter(col("o_orderstatus") === "O").select("o_custkey")
      f.intersect(open).agg(cnt.as("n")).select(lit("intersect").as("tag"), col("n"))
        .union(f.except(open).agg(cnt.as("n")).select(lit("except").as("tag"), col("n")))
        .orderBy("tag")
    }),

    "q24_string_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("ub"),
          lower(col("p_type")).as("lt"),
          substring(col("p_name"), 1, 10).as("sub10"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
          regexp_replace(col("p_type"), " ", "_").as("repl"),
          length(col("p_name")).as("len"),
          lpad(col("p_size").cast("string"), 4, "0").as("padded"),
          col("p_type").like("%a%").as("has_a"),
          regexp_extract(col("p_name"), "[a-z]+", 0).as("first_word"))
        .orderBy("p_partkey")
        .limit(100)
    }),

    "q25_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("EXTRACT(year FROM o_orderdate)").as("yr"),
          expr("EXTRACT(month FROM o_orderdate)").as("mo"),
          expr("EXTRACT(day FROM o_orderdate)").as("dy"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).cast("date").as("plus30"),
          datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_y2k"))
        .orderBy("o_orderkey")
        .limit(100)
    }),

    "q26_math_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(dec2(col("l_extendedprice")), 0).cast("double").as("r0"),
          abs(col("l_quantity") - 25).as("ab"),
          ceil(col("l_discount") * 100).as("ce"),
          floor(col("l_tax") * 100).as("fl"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(log(col("l_extendedprice")), 6).as("lg"),
          round(pow(col("l_quantity"), 2), 6).as("pw"),
          (col("l_quantity").cast("int") % 7).as("md"))
        // (l_orderkey, l_linenumber) is NOT unique in this synthetic
        // lineitem (FIXTURES.md): at sf0.1 ties reach the LIMIT-100
        // prefix and engines break them differently. Ordering by every
        // output column makes any remaining ties identical rows.
        .orderBy("l_orderkey", "l_linenumber", "r0", "ab", "ce", "fl", "sq", "lg", "pw", "md")
        .limit(100)
    }),

    "q27_case_coalesce" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(cnt.as("n"),
          sum(when(col("o_totalprice") > 150000, 1).otherwise(0)).as("n_big"),
          coalesce(nullif(min(col("o_orderpriority")), lit("1-URGENT")), lit("none"))
            .as("min_nonurgent"))
        .select(col("o_orderstatus"),
          when(col("o_orderstatus") === "F", "finished")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("partial").as("status_name"),
          col("n"), col("n_big"), col("min_nonurgent"))
        .orderBy("o_orderstatus")
    }),

    "q28_json" -> ((s, dir) => {
      val k = get_json_object(col("props"), "$.k").cast("bigint")
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(cnt.as("n"), sum(k).as("sum_k"), min(k).as("min_k"), max(k).as("max_k"))
        .orderBy("event_type")
    }),

    // Uncorrelated scalar subquery as an explicit broadcast of the
    // 1-row aggregate — the distributed shape Catalyst builds for a
    // scalar subquery, spelled out.
    "q29_scalar_subquery" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val avgPrice = p.agg(avg(col("p_retailprice")).as("avg_price"))
      p.crossJoin(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("avg_price"))
        .groupBy("p_brand")
        .agg(cnt.as("n_above_avg"))
        .orderBy("p_brand")
    }),

    // IN (subquery) == left-semi join on the deduplicated key set.
    "q30_in_subquery" -> ((s, dir) => {
      val machinery = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "MACHINERY" && col("c_acctbal") > 0)
        .select("c_custkey")
      t(s, dir, "orders")
        .join(machinery, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(cnt.as("n"))
        .orderBy("o_orderstatus")
    }),

    // Correlated scalar subquery decorrelated by hand: aggregate once
    // per correlation key, then join — one pass over customer instead
    // of a per-row subquery.
    "q31_correlated_subquery" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val perNation = c.groupBy(col("c_nationkey").as("nk"))
        .agg(avg(col("c_acctbal")).as("nation_avg"))
      c.join(broadcast(perNation), col("c_nationkey") === col("nk"))
        .filter(col("c_acctbal") > col("nation_avg"))
        .select(col("c_custkey"), col("c_nationkey"),
                round(dec2(col("c_acctbal")), 2).cast("double").as("bal"))
        .orderBy("c_custkey")
        .limit(100)
    })
  )
}
