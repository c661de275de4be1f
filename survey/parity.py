#!/usr/bin/env python3
"""Cross-engine parity check: run every battery query on DuckDB and on
Spark 4.1.2 (Spark-SQL translation) at sf0.01 and diff normalized rows."""
import sys, time, json, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from battery import Q as DUCK_Q, TABLES, setup
import duckdb

D = "/root/testdata/sf0.01"

# Spark-SQL translations. None => same text as DuckDB.
S = {name: None for name in DUCK_Q}

S["q10_join_asof"] = """
WITH w AS (
  SELECT event_id, user_id, ts, event_type,
         MAX(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
  FROM events)
SELECT event_id, user_id, ts, last_signup_ts
FROM w WHERE event_type = 'purchase'
ORDER BY event_id LIMIT 100"""

S["q13_rollup"] = """
SELECT EXTRACT(year FROM o_orderdate) AS yr, o_orderstatus,
       GROUPING(EXTRACT(year FROM o_orderdate)) AS g_yr,
       GROUPING(o_orderstatus) AS g_st,
       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue, COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (EXTRACT(year FROM o_orderdate), o_orderstatus)
ORDER BY g_yr, g_st, yr NULLS FIRST, o_orderstatus NULLS FIRST"""

S["q17_win_rank"] = """
SELECT c_mktsegment, c_custkey, c_acctbal,
       RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
       DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk,
       ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
FROM customer
ORDER BY c_mktsegment, rn LIMIT 100"""

S["q18_win_lag_ma"] = """
SELECT user_id, event_id, ROUND(CAST(value AS DECIMAL(18,2)), 2) AS value,
       ROUND(CAST(LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DECIMAL(18,2)), 2) AS prev_value,
       ROUND(CAST(LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DECIMAL(18,2)), 2) AS next_value,
       ROUND(AVG(CAST(value AS DECIMAL(18,2)))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS ma4
FROM events
ORDER BY user_id, event_id LIMIT 200"""

S["q19_win_range_frame"] = """
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY unix_millis(ts)
                      RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW) AS n_last_10m
FROM events
ORDER BY event_id LIMIT 200"""

S["q24_string_funcs"] = """
SELECT p_partkey,
       UPPER(p_brand) AS ub, LOWER(p_type) AS lt,
       SUBSTR(p_name, 1, 10) AS sub10,
       TRIM(CONCAT('  ', p_name, '  ')) AS trimmed,
       REPLACE(p_type, ' ', '_') AS repl,
       LENGTH(p_name) AS len,
       LPAD(CAST(p_size AS STRING), 4, '0') AS padded,
       (p_type LIKE '%a%') AS has_a,
       REGEXP_EXTRACT(p_name, '[a-z]+', 0) AS first_word
FROM part ORDER BY p_partkey LIMIT 100"""

S["q25_date_funcs"] = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(month FROM o_orderdate) AS mo,
       EXTRACT(day FROM o_orderdate) AS dy,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
       datediff(DATE '2000-01-01', CAST(o_orderdate AS DATE)) AS days_to_y2k
FROM orders ORDER BY o_orderkey LIMIT 100"""

S["q26_math_funcs"] = """
SELECT l_orderkey, l_linenumber,
       ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 0) AS r0,
       ABS(l_quantity - 25) AS ab, CEIL(l_discount * 100) AS ce, FLOOR(l_tax * 100) AS fl,
       ROUND(SQRT(l_quantity), 6) AS sq, ROUND(LN(l_extendedprice), 6) AS lg,
       ROUND(POWER(l_quantity, 2), 6) AS pw, MOD(CAST(l_quantity AS INT), 7) AS md
FROM lineitem ORDER BY l_orderkey, l_linenumber, r0, ab, ce, fl, sq, lg, pw, md LIMIT 100"""

S["q28_json"] = """
SELECT event_type,
       COUNT(*) AS n,
       SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS sum_k,
       MIN(CAST(get_json_object(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(get_json_object(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type"""

S["q33_window_sliding"] = """
WITH o AS (SELECT explode(array(0,1,2,3)) AS k),
     s AS (SELECT e.event_type,
                  (CAST(FLOOR(unix_millis(ts) / 900000) AS BIGINT) - o.k) * 900 AS win_start_s,
                  unix_millis(ts) AS ems
           FROM events e CROSS JOIN o)
SELECT win_start_s, event_type, COUNT(*) AS n
FROM s WHERE ems >= win_start_s * 1000 AND ems < (win_start_s + 3600) * 1000
GROUP BY 1, 2 ORDER BY win_start_s, event_type LIMIT 200"""

S["q34_sessionize"] = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN unix_millis(ts) - unix_millis(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
 s AS (
  SELECT user_id, ts, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g)
SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions,
       COUNT(*) AS n_events,
       ROUND(CAST(COUNT(*) AS DECIMAL(18,6)) / COUNT(DISTINCT session_id), 6) AS events_per_session
FROM s GROUP BY user_id ORDER BY user_id"""

S["q35_dedup_exact"] = """
WITH h AS (SELECT doc_id, MD5(text) AS th FROM documents),
 d AS (SELECT th, MIN(doc_id) AS keep_id, COUNT(*) AS n FROM h GROUP BY th)
SELECT COUNT(*) AS n_unique, SUM(n) AS n_total, SUM(n) - COUNT(*) AS n_dupes_removed
FROM d"""

S["q36_text_tokenize"] = """
WITH t AS (SELECT explode(split(LOWER(text), ' ')) AS tok FROM documents)
SELECT tok, COUNT(*) AS n FROM t WHERE tok <> ''
GROUP BY tok ORDER BY n DESC, tok LIMIT 20"""

S["q37_text_stats"] = """
SELECT lang, COUNT(*) AS n_docs,
       ROUND(AVG(CAST(n_chars AS DECIMAL(18,2))), 6) AS avg_chars,
       ROUND(CAST(percentile(n_chars, 0.5) AS DECIMAL(18,6)), 6) AS median_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY lang ORDER BY lang"""

S["q38_knn_cosine"] = """
WITH qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label,
       ROUND(aggregate(zip_with(e.embedding, qv.v, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)
         / (SQRT(aggregate(e.embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
          * SQRT(aggregate(qv.v, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS cos_sim
FROM embeddings e CROSS JOIN qv
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id LIMIT 10"""

S["q39_vector_centroid"] = """
SELECT label, pos,
       ROUND(AVG(CAST(element_at(embedding, pos) AS DECIMAL(18,9))), 6) AS centroid
FROM embeddings LATERAL VIEW explode(sequence(1, 8)) t AS pos
GROUP BY label, pos ORDER BY label, pos"""

S["q40_dedup_near"] = """
WITH toks AS (
  SELECT doc_id, explode(split(LOWER(text), ' ')) AS tok FROM documents),
 sig AS (
  SELECT doc_id,
         MIN(MD5(tok)) AS h1,
         MIN(MD5(CONCAT('a', tok))) AS h2,
         MIN(MD5(CONCAT('b', tok))) AS h3
  FROM toks WHERE tok <> '' GROUP BY doc_id),
 grp AS (SELECT h1, h2, h3, COUNT(*) AS n, MIN(doc_id) AS rep
         FROM sig GROUP BY h1, h2, h3)
SELECT COUNT(*) AS n_groups, SUM(n) AS n_docs,
       SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS n_near_dupes
FROM grp"""

def norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if v is None: vals.append("NULL")
            elif isinstance(v, bool): vals.append(str(v).lower())
            elif isinstance(v, float): vals.append(f"{v:.6f}")
            elif hasattr(v, "isoformat"): vals.append(v.isoformat()[:26])
            else: vals.append(str(v))
        out.append("|".join(vals))
    return out

# --- DuckDB side
con = duckdb.connect(); con.execute("SET threads TO 4")
setup(con, D)
duck = {name: norm(con.execute(sql).fetchall()) for name, sql in DUCK_Q.items()}

# --- Spark side
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", 4)
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
for t in TABLES:
    df = spark.read.parquet(f"{D}/{t}.parquet")
    if t == "events":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    df.createOrReplaceTempView(t)

report = {}
for name in DUCK_Q:
    sql = S[name] if S[name] is not None else DUCK_Q[name]
    try:
        srows = norm([tuple(r) for r in spark.sql(sql).collect()])
        if srows == duck[name]:
            report[name] = "MATCH"
        else:
            diffs = [i for i, (a, b) in enumerate(zip(duck[name], srows)) if a != b]
            report[name] = {"duck_n": len(duck[name]), "spark_n": len(srows),
                            "first_diffs": [(i, duck[name][i], srows[i]) for i in diffs[:2]]}
    except Exception as e:
        report[name] = {"spark_error": str(e).split(chr(10))[0][:300]}

n_match = sum(1 for v in report.values() if v == "MATCH")
for k, v in report.items():
    print(k, "OK" if v == "MATCH" else json.dumps(v)[:400])
print(f"== {n_match}/{len(report)} MATCH")
spark.stop()
