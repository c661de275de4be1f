#!/usr/bin/env python3
"""Validate the SURVEY §2 operator-inventory query battery against DuckDB
(the t2 oracle) and time it at sf0.1 for BASELINE.md."""
import duckdb, sys, time, statistics, json

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def setup(con, d):
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

Q = {}  # name -> duckdb sql

Q["q01_scan_filter_project"] = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity LIMIT 100"""

Q["q02_predicates"] = """
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
WHERE o_totalprice BETWEEN 50000 AND 200000
  AND o_orderstatus IN ('F','O')
  AND NOT (o_orderpriority LIKE '1-%')
  AND o_custkey IS NOT NULL
ORDER BY o_orderkey LIMIT 100"""

Q["q03_join_inner"] = """
SELECT c.c_mktsegment, COUNT(*) AS n,
       SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""

Q["q04_join_multiway"] = """
SELECT n.n_name,
       SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name ORDER BY revenue DESC, n.n_name"""

Q["q05_join_left_outer"] = """
SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY n_orders DESC, c.c_custkey LIMIT 50"""

Q["q06_join_semi"] = """
SELECT COUNT(*) AS n_customers_with_orders
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""

Q["q07_join_anti"] = """
SELECT c.c_custkey, c.c_name
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
ORDER BY c.c_custkey LIMIT 50"""

Q["q08_join_theta"] = """
SELECT n1.n_name AS a, n2.n_name AS b
FROM nation n1 JOIN nation n2
  ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
ORDER BY a, b"""

Q["q09_join_range"] = """
SELECT e1.event_type, COUNT(*) AS follow_within_5m
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
GROUP BY e1.event_type ORDER BY e1.event_type"""

Q["q10_join_asof"] = """
WITH w AS (
  SELECT event_id, user_id, ts, event_type,
         MAX(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
  FROM events)
SELECT event_id, user_id, ts, last_signup_ts
FROM w WHERE event_type = 'purchase'
ORDER BY event_id LIMIT 100"""

Q["q11_agg_hash"] = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
       SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
       SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
       ROUND(AVG(CAST(l_quantity AS DECIMAL(18,2))), 6) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""

Q["q12_agg_distinct"] = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS d_parts,
       COUNT(DISTINCT l_suppkey) AS d_supps,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

Q["q13_rollup"] = """
SELECT EXTRACT(year FROM o_orderdate) AS yr, o_orderstatus,
       GROUPING(EXTRACT(year FROM o_orderdate)) AS g_yr,
       GROUPING(o_orderstatus) AS g_st,
       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue, COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (EXTRACT(year FROM o_orderdate), o_orderstatus)
ORDER BY g_yr, g_st, yr NULLS FIRST, o_orderstatus NULLS FIRST"""

Q["q14_cube"] = """
SELECT lang, source, GROUPING(lang) AS g_l, GROUPING(source) AS g_s,
       COUNT(*) AS n, ROUND(AVG(CAST(n_chars AS DECIMAL(18,2))), 6) AS avg_chars
FROM documents
GROUP BY CUBE (lang, source)
ORDER BY g_l, g_s, lang NULLS FIRST, source NULLS FIRST"""

Q["q15_grouping_sets"] = """
SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       GROUPING(event_type) AS g_t, GROUPING(CAST(date_trunc('day', ts) AS DATE)) AS g_d,
       COUNT(*) AS n
FROM events
GROUP BY GROUPING SETS ((event_type), (CAST(date_trunc('day', ts) AS DATE)), ())
ORDER BY g_t, g_d, event_type NULLS FIRST, day NULLS FIRST"""

Q["q16_having"] = """
SELECT o_custkey, COUNT(*) AS n, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
ORDER BY n DESC, o_custkey LIMIT 50"""

Q["q17_win_rank"] = """
SELECT c_mktsegment, c_custkey, c_acctbal,
       RANK()       OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       ROW_NUMBER() OVER w AS rn
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_mktsegment, rn LIMIT 100"""

Q["q18_win_lag_ma"] = """
SELECT user_id, event_id, ROUND(CAST(value AS DECIMAL(18,2)), 2) AS value,
       ROUND(CAST(LAG(value)  OVER w AS DECIMAL(18,2)), 2) AS prev_value,
       ROUND(CAST(LEAD(value) OVER w AS DECIMAL(18,2)), 2) AS next_value,
       ROUND(AVG(CAST(value AS DECIMAL(18,2)))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS ma4
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id LIMIT 200"""

Q["q19_win_range_frame"] = """
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                      RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW) AS n_last_10m
FROM events
ORDER BY event_id LIMIT 200"""

Q["q20_topk_per_group"] = """
WITH r AS (
  SELECT event_type, event_id, ROUND(CAST(value AS DECIMAL(18,2)), 2) AS value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
  FROM events)
SELECT event_type, event_id, value, rn FROM r WHERE rn <= 5
ORDER BY event_type, rn"""

Q["q21_sort_limit"] = """
SELECT o_orderkey, ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50"""

Q["q22_union"] = """
SELECT 'all' AS tag, COUNT(*) AS n FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t
UNION ALL
SELECT 'dedup' AS tag, COUNT(*) AS n FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t
ORDER BY tag"""

Q["q23_intersect_except"] = """
SELECT 'intersect' AS tag, COUNT(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
UNION ALL
SELECT 'except' AS tag, COUNT(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
ORDER BY tag"""

Q["q24_string_funcs"] = """
SELECT p_partkey,
       UPPER(p_brand) AS ub, LOWER(p_type) AS lt,
       SUBSTR(p_name, 1, 10) AS sub10,
       TRIM(CONCAT('  ', p_name, '  ')) AS trimmed,
       REPLACE(p_type, ' ', '_') AS repl,
       LENGTH(p_name) AS len,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS padded,
       (p_type LIKE '%a%') AS has_a,
       REGEXP_EXTRACT(p_name, '[a-z]+') AS first_word
FROM part ORDER BY p_partkey LIMIT 100"""

Q["q25_date_funcs"] = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(month FROM o_orderdate) AS mo,
       EXTRACT(day FROM o_orderdate) AS dy,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
FROM orders ORDER BY o_orderkey LIMIT 100"""

Q["q26_math_funcs"] = """
SELECT l_orderkey, l_linenumber,
       ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 0) AS r0,
       ABS(l_quantity - 25) AS ab, CAST(CEIL(l_discount * 100) AS BIGINT) AS ce, CAST(FLOOR(l_tax * 100) AS BIGINT) AS fl,
       ROUND(SQRT(l_quantity), 6) AS sq, ROUND(LN(l_extendedprice), 6) AS lg,
       ROUND(POWER(l_quantity, 2), 6) AS pw, MOD(CAST(l_quantity AS INT), 7) AS md
FROM lineitem ORDER BY l_orderkey, l_linenumber, r0, ab, ce, fl, sq, lg, pw, md LIMIT 100"""

Q["q27_case_coalesce"] = """
SELECT o_orderstatus,
       CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' ELSE 'partial' END AS status_name,
       COUNT(*) AS n,
       SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS n_big,
       COALESCE(NULLIF(MIN(o_orderpriority), '1-URGENT'), 'none') AS min_nonurgent
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

Q["q28_json"] = """
SELECT event_type,
       COUNT(*) AS n,
       SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type"""

Q["q29_scalar_subquery"] = """
SELECT p_brand, COUNT(*) AS n_above_avg
FROM part
WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
GROUP BY p_brand ORDER BY p_brand"""

Q["q30_in_subquery"] = """
SELECT o_orderstatus, COUNT(*) AS n
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 0)
GROUP BY o_orderstatus ORDER BY o_orderstatus"""

Q["q31_correlated_subquery"] = """
SELECT c.c_custkey, c.c_nationkey, ROUND(CAST(c.c_acctbal AS DECIMAL(18,2)), 2) AS bal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_nationkey = c.c_nationkey)
ORDER BY c.c_custkey LIMIT 100"""

Q["q32_window_tumbling"] = """
SELECT date_trunc('hour', ts) AS win_start, event_type, COUNT(*) AS n,
       SUM(CAST(value AS DECIMAL(18,2))) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY win_start, event_type LIMIT 200"""

Q["q33_window_sliding"] = """
WITH o AS (SELECT UNNEST([0,1,2,3]) AS k),
     s AS (SELECT e.event_type,
                  ((epoch_ms(ts) // 900000) - o.k) * 900 AS win_start_s,
                  epoch_ms(ts) AS ems
           FROM events e CROSS JOIN o)
SELECT win_start_s, event_type, COUNT(*) AS n
FROM s WHERE ems >= win_start_s * 1000 AND ems < (win_start_s + 3600) * 1000
GROUP BY 1, 2 ORDER BY win_start_s, event_type LIMIT 200"""

Q["q34_sessionize"] = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
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

Q["q35_dedup_exact"] = """
WITH h AS (SELECT doc_id, MD5(text) AS th FROM documents),
 d AS (SELECT th, MIN(doc_id) AS keep_id, COUNT(*) AS n FROM h GROUP BY th)
SELECT COUNT(*) AS n_unique, SUM(n) AS n_total, SUM(n) - COUNT(*) AS n_dupes_removed
FROM d"""

Q["q36_text_tokenize"] = """
WITH t AS (SELECT UNNEST(string_split(LOWER(text), ' ')) AS tok FROM documents)
SELECT tok, COUNT(*) AS n FROM t WHERE tok <> ''
GROUP BY tok ORDER BY n DESC, tok LIMIT 20"""

Q["q37_text_stats"] = """
SELECT lang, COUNT(*) AS n_docs,
       ROUND(AVG(CAST(n_chars AS DECIMAL(18,2))), 6) AS avg_chars,
       ROUND(CAST(quantile_cont(n_chars, 0.5) AS DECIMAL(18,6)), 6) AS median_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY lang ORDER BY lang"""

Q["q38_knn_cosine"] = """
WITH qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label,
       ROUND(list_sum(list_transform(list_zip(e.embedding, qv.v), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * SQRT(list_sum(list_transform(qv.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
FROM embeddings e, qv
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id LIMIT 10"""

Q["q39_vector_centroid"] = """
SELECT label, CAST(r.i AS INT) AS pos,
       ROUND(AVG(CAST(e.embedding[CAST(r.i AS INT)] AS DECIMAL(18,9))), 6) AS centroid
FROM embeddings e CROSS JOIN range(1, 9) r(i)
GROUP BY label, pos ORDER BY label, pos"""

Q["q40_dedup_near"] = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS tok FROM documents),
 sig AS (
  SELECT doc_id,
         MIN(MD5(tok)) AS h1,
         MIN(MD5('a' || tok)) AS h2,
         MIN(MD5('b' || tok)) AS h3
  FROM toks WHERE tok <> '' GROUP BY doc_id),
 grp AS (SELECT h1, h2, h3, COUNT(*) AS n, MIN(doc_id) AS rep
         FROM sig GROUP BY h1, h2, h3)
SELECT COUNT(*) AS n_groups, SUM(n) AS n_docs,
       SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS n_near_dupes
FROM grp"""

def run(d, reps=1, label=""):
    con = duckdb.connect()
    con.execute("SET threads TO 4")
    setup(con, d)
    out = {}
    for name, sql in Q.items():
        times = []
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                res = con.execute(sql).fetchall()
                times.append(time.perf_counter() - t0)
            out[name] = {"rows": len(res), "ms": round(min(times)*1000, 1)}
            print(f"{label} {name:28s} rows={len(res):6d}  {min(times)*1000:8.1f} ms")
        except Exception as e:
            out[name] = {"error": str(e).split(chr(10))[0]}
            print(f"{label} {name:28s} ERROR: {e}")
    return out

if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "validate"
    if mode == "validate":
        run("/root/testdata/sf0.01", reps=1, label="[sf0.01]")
    else:
        r = run("/root/testdata/sf0.1", reps=3, label="[sf0.1]")
        total = sum(v["ms"] for v in r.values() if "ms" in v)
        print(f"TOTAL {total:.1f} ms over {len(r)} queries")
        json.dump(r, open("/tmp/baseline_sf01.json","w"), indent=1)
