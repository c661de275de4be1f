package graft.queries

/** Hand-written Spark-SQL texts extending the differential-testing
  * surface beyond the generated 40-core [[QueryTexts]]: each entry is
  * an INDEPENDENT SQL formulation of a wave query whose native
  * DataFrame implementation it must match row-for-row (schema, order,
  * and values — DifferentialSpec generates one test per key). Unlike
  * [[QueryTexts]] these are not generated; each was adapted into
  * Spark dialect from the wave's validated DuckDB oracle text (the
  * same formulation the driver's gate runs), so the differential
  * triangle is closed in CI without DuckDB: native == Spark-SQL here,
  * Spark-SQL ≡ DuckDB oracle by construction, native == DuckDB at the
  * driver's gate.
  *
  * Determinism rules follow SURVEY.md §5 (exact DECIMAL sums, doubles
  * only in final casts/rounds, total-order ORDER BY keys) — do not
  * "simplify" a CAST here; several exist precisely because a double
  * aggregate would tie-break differently across engines.
  */
object QueryTextsExt {

  /** Shared unrolled-k-means prefix (2 Lloyd iterations, k=4, md5-seeded)
    * used by the q85/q108/q124/q125(no)/q129/q132/q135 ANN family — the
    * same prefix the waves' DuckDB oracles unroll; ends at the final
    * centroid set `c2`. Per-query tails append from `a3` onward.
    */
  private val kmPrefix = """
WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
seeds AS (SELECT v, clabel FROM (
  SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS STRING)), vec_id) AS BIGINT) clabel FROM e)
  WHERE clabel <= 4),
c0 AS (SELECT clabel, v AS cent FROM seeds),
a1 AS (SELECT e.vec_id, e.v, c.clabel,
         aggregate(zip_with(e.v, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x) d2
       FROM e CROSS JOIN c0 c),
b1 AS (SELECT vec_id, v, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a1) WHERE rn = 1),
m1 AS (SELECT clabel, r.pos, CAST(ROUND(AVG(CAST(element_at(v, r.pos) AS DECIMAL(18,9))), 6) AS DOUBLE) c
       FROM b1 CROSS JOIN (SELECT explode(sequence(1, 64)) pos) r GROUP BY clabel, r.pos),
c1l AS (SELECT clabel, transform(array_sort(collect_list(struct(pos, c))), s -> s.c) cent
        FROM m1 GROUP BY clabel),
c1 AS (SELECT c0.clabel, COALESCE(c1l.cent, c0.cent) cent FROM c0 LEFT JOIN c1l USING (clabel)),
a2 AS (SELECT e.vec_id, e.v, c.clabel,
         aggregate(zip_with(e.v, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x) d2
       FROM e CROSS JOIN c1 c),
b2 AS (SELECT vec_id, v, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a2) WHERE rn = 1),
m2 AS (SELECT clabel, r.pos, CAST(ROUND(AVG(CAST(element_at(v, r.pos) AS DECIMAL(18,9))), 6) AS DOUBLE) c
       FROM b2 CROSS JOIN (SELECT explode(sequence(1, 64)) pos) r GROUP BY clabel, r.pos),
c2l AS (SELECT clabel, transform(array_sort(collect_list(struct(pos, c))), s -> s.c) cent
        FROM m2 GROUP BY clabel),
c2 AS (SELECT c1.clabel, COALESCE(c2l.cent, c1.cent) cent FROM c1 LEFT JOIN c2l USING (clabel))""".trim

  /** IVF-PQ extension of [[kmPrefix]] shared by q101/q134: residual
    * vectors against the final coarse centroids, two 32-dim subspaces,
    * one unrolled k-means iteration per subspace codebook, and the
    * per-vector PQ codes (e0/e1).
    */
  private val pqPrefix = kmPrefix + """,
a3 AS (SELECT e.vec_id, e.v, c.clabel,
         aggregate(zip_with(e.v, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x) d2
       FROM e CROSS JOIN c2 c),
asg AS (SELECT vec_id, v, clabel AS bucket FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a3) WHERE rn = 1),
res AS (SELECT a.vec_id, a.bucket,
         zip_with(a.v, c.cent, (x, y) -> CAST(CAST(x - y AS FLOAT) AS DOUBLE)) rv
        FROM asg a JOIN c2 c ON c.clabel = a.bucket),
pseed AS (SELECT vec_id, clabel FROM (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS STRING)), vec_id) AS BIGINT) clabel FROM res)
  WHERE clabel <= 4),
r0 AS (SELECT vec_id, slice(rv, 1, 32) sv FROM res),
r1 AS (SELECT vec_id, slice(rv, 33, 32) sv FROM res),
p0c0 AS (SELECT ps.clabel, r0.sv AS cent FROM pseed ps JOIN r0 ON r0.vec_id = ps.vec_id),
p0a1 AS (SELECT r0.vec_id, r0.sv, c.clabel,
          aggregate(zip_with(r0.sv, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x) d2
         FROM r0 CROSS JOIN p0c0 c),
p0b1 AS (SELECT vec_id, sv, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM p0a1) WHERE rn = 1),
p0m1 AS (SELECT clabel, r.pos, CAST(ROUND(AVG(CAST(element_at(sv, r.pos) AS DECIMAL(18,9))), 6) AS DOUBLE) c
         FROM p0b1 CROSS JOIN (SELECT explode(sequence(1, 32)) pos) r GROUP BY clabel, r.pos),
p0c1l AS (SELECT clabel, transform(array_sort(collect_list(struct(pos, c))), s -> s.c) cent
          FROM p0m1 GROUP BY clabel),
p0cb AS (SELECT c.clabel, COALESCE(l.cent, c.cent) cent FROM p0c0 c LEFT JOIN p0c1l l USING (clabel)),
p1c0 AS (SELECT ps.clabel, r1.sv AS cent FROM pseed ps JOIN r1 ON r1.vec_id = ps.vec_id),
p1a1 AS (SELECT r1.vec_id, r1.sv, c.clabel,
          aggregate(zip_with(r1.sv, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x) d2
         FROM r1 CROSS JOIN p1c0 c),
p1b1 AS (SELECT vec_id, sv, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM p1a1) WHERE rn = 1),
p1m1 AS (SELECT clabel, r.pos, CAST(ROUND(AVG(CAST(element_at(sv, r.pos) AS DECIMAL(18,9))), 6) AS DOUBLE) c
         FROM p1b1 CROSS JOIN (SELECT explode(sequence(1, 32)) pos) r GROUP BY clabel, r.pos),
p1c1l AS (SELECT clabel, transform(array_sort(collect_list(struct(pos, c))), s -> s.c) cent
          FROM p1m1 GROUP BY clabel),
p1cb AS (SELECT c.clabel, COALESCE(l.cent, c.cent) cent FROM p1c0 c LEFT JOIN p1c1l l USING (clabel)),
e0a AS (SELECT r0.vec_id, c.clabel,
          aggregate(zip_with(r0.sv, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x) d2
        FROM r0 CROSS JOIN p0cb c),
e0 AS (SELECT vec_id, clabel AS code FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM e0a) WHERE rn = 1),
e1a AS (SELECT r1.vec_id, c.clabel,
          aggregate(zip_with(r1.sv, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x) d2
        FROM r1 CROSS JOIN p1cb c),
e1 AS (SELECT vec_id, clabel AS code FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM e1a) WHERE rn = 1)"""

  val spark: Map[String, String] = Map(

    "q58_agg_of_agg" -> """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
SELECT c_count, COUNT(*) custdist FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC""",

    "q59_argmax_of_agg" -> """
WITH rev AS (
  SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) r
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, CAST(r AS DOUBLE) total_revenue
FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
ORDER BY s_suppkey""",

    "q60_scan_agg" -> """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) revenue,
       COUNT(*) n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""",

    "q61_cond_ratio" -> """
WITH j AS (SELECT CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) rev, p_type
           FROM lineitem JOIN part ON p_partkey = l_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01')
SELECT CAST(ROUND(100.0 * CAST(SUM(CASE WHEN p_type='PROMO' THEN rev END) AS DOUBLE)
          / CAST(SUM(rev) AS DOUBLE), 6) AS DOUBLE) promo_pct, COUNT(*) n FROM j""",

    "q62_correlated_ratio" -> """
WITH pa AS (SELECT l_partkey pk, AVG(l_quantity) aq FROM lineitem GROUP BY l_partkey)
SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS DOUBLE) avg_yearly,
       COUNT(*) n
FROM lineitem JOIN part ON p_partkey = l_partkey JOIN pa ON pa.pk = lineitem.l_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * aq""",

    "q63_having_in" -> """
SELECT c.c_custkey, c.c_name, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) tot, big.sq
FROM orders o
JOIN (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) sq
      FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180) big
  ON big.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY tot DESC, o.o_orderkey LIMIT 50""",

    "q64_anti_scalar" -> """
WITH pos AS (SELECT CAST(c_acctbal AS DECIMAL(18,2)) b FROM customer WHERE c_acctbal > 0)
SELECT c_mktsegment, COUNT(*) numcust, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) totacctbal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM pos) > (SELECT SUM(b) FROM pos)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q52_stats_agg" -> """
WITH m AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
     * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_qty_price,
  ROUND(SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS stddev_pop_qty
FROM m ORDER BY l_returnflag""",

    "q53_win_distribution" -> """
SELECT c_custkey, c_mktsegment,
  NTILE(4) OVER w AS quartile,
  ROUND(PERCENT_RANK() OVER w, 6) AS pr,
  ROUND(CUME_DIST() OVER w, 6) AS cd
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_mktsegment, c_custkey LIMIT 200""",

    "q55_fuzzy_match" -> """
WITH p1 AS (SELECT p_partkey, p_name FROM part WHERE p_partkey < 100),
     p2 AS (SELECT p_partkey, p_name FROM part WHERE p_partkey >= 100 AND p_partkey < 200)
SELECT p1.p_partkey AS a, p2.p_partkey AS b, levenshtein(p1.p_name, p2.p_name) AS dist
FROM p1 CROSS JOIN p2
WHERE levenshtein(p1.p_name, p2.p_name) <= 3
ORDER BY dist, a, b LIMIT 100""",

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

    "q72_transitions" -> """
WITH o AS (SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev
           FROM events)
SELECT prev, event_type AS curr, COUNT(*) n
FROM o WHERE prev IS NOT NULL
GROUP BY prev, curr ORDER BY prev, curr""",

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

    "q78_setops_all" -> """
WITH a AS (SELECT o_custkey k FROM orders WHERE o_totalprice > 100000),
     b AS (SELECT o_custkey k FROM orders WHERE o_orderstatus = 'F')
SELECT 'except_all' op, COUNT(*) n FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
UNION ALL
SELECT 'intersect_all', COUNT(*) FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
ORDER BY op""",

    "q83_latest_version" -> """
WITH r AS (SELECT user_id, event_type, value,
  ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT event_type, COUNT(*) AS n_keys,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_latest
FROM r WHERE rn = 1 GROUP BY event_type ORDER BY event_type""",

    "q84_skew_salted" -> """
SELECT p.p_brand, COUNT(*) AS n,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand ORDER BY p.p_brand""",

    "q118_user_anomaly" -> """
WITH e AS (SELECT event_id, user_id, value,
        CAST(value AS DECIMAL(18,6)) v,
        CAST(ROUND(value*value, 10) AS DECIMAL(28,10)) v2 FROM events),
u AS (SELECT user_id, CAST(COUNT(*) AS DECIMAL(8,0)) n, SUM(v) sv,
        CAST(SUM(v2) AS DECIMAL(20,10)) sq
      FROM e GROUP BY user_id HAVING COUNT(*) >= 30),
z AS (SELECT e.event_id, e.user_id, e.value,
        CAST(u.n * e.v - u.sv AS DECIMAL(19,6)) dlt,
        CAST(u.n * u.sq AS DECIMAL(24,12))
          - CAST(CAST(u.sv AS DECIMAL(19,6)) * CAST(u.sv AS DECIMAL(19,6)) AS DECIMAL(24,12)) den
      FROM e JOIN u USING (user_id))
SELECT event_id, user_id, value,
  ROUND(CAST(dlt * dlt AS DOUBLE) / CAST(den AS DOUBLE), 6) AS z2
FROM z WHERE den > 0
ORDER BY z2 DESC, event_id LIMIT 10""",

    "q120_cumulative_users" -> """
WITH ev AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
fd AS (SELECT user_id, MIN(d) d0 FROM ev GROUP BY user_id),
newu AS (SELECT d0 AS d, COUNT(*) n_new FROM fd GROUP BY d0),
dau AS (SELECT d, COUNT(*) dau FROM ev GROUP BY d)
SELECT dau.d AS event_day, CAST(COALESCE(newu.n_new, 0) AS BIGINT) AS n_new,
  CAST(SUM(COALESCE(newu.n_new, 0)) OVER (ORDER BY dau.d) AS BIGINT) AS cum_users,
  dau.dau AS dau
FROM dau LEFT JOIN newu USING (d) ORDER BY event_day""",

    "q162_discount_revenue" -> """
WITH li AS (SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) disc_pct,
              CAST(l_extendedprice AS DECIMAL(14,2)) gross_d,
              CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) net_d
            FROM lineitem)
SELECT disc_pct, COUNT(*) n_items,
  CAST(SUM(gross_d) AS DOUBLE) gross_revenue,
  CAST(SUM(net_d) AS DOUBLE) net_revenue,
  CAST(SUM(gross_d) - SUM(net_d) AS DOUBLE) discount_given
FROM li GROUP BY disc_pct ORDER BY disc_pct""",

    "q197_order_reconciliation" -> """
WITH line AS (SELECT l_orderkey,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2))) * 1000000 AS BIGINT)) AS BIGINT) line_micro
  FROM lineitem GROUP BY l_orderkey),
o AS (SELECT o_orderstatus,
    COALESCE(l.line_micro, 0) - CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 diff,
    CASE WHEN l.line_micro IS NULL THEN 'no_lines'
         WHEN l.line_micro > CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 THEN 'over'
         WHEN l.line_micro < CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 THEN 'under'
         ELSE 'exact' END band
  FROM orders LEFT JOIN line l ON l.l_orderkey = o_orderkey)
SELECT o_orderstatus, band, COUNT(*) n_orders,
  CAST(SUM(abs(diff)) AS BIGINT) abs_diff_micro,
  CAST(MAX(abs(diff)) AS BIGINT) max_abs_diff_micro
FROM o GROUP BY o_orderstatus, band ORDER BY o_orderstatus, band""",

    "q215_rank_churn" -> """
WITH cn AS (SELECT c_custkey, n_name FROM customer JOIN nation ON n_nationkey = c_nationkey),
qrev AS (SELECT n_name, year(o_orderdate) * 10 + quarter(o_orderdate) yq,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) rev
  FROM orders JOIN cn ON c_custkey = o_custkey GROUP BY n_name, yq),
rk AS (SELECT n_name, yq,
    ROW_NUMBER() OVER (PARTITION BY yq ORDER BY rev DESC, n_name) r
  FROM qrev),
ch AS (SELECT n_name, r,
    LAG(r) OVER (PARTITION BY n_name ORDER BY yq) pr
  FROM rk)
SELECT n_name, COUNT(*) n_quarters,
  CAST(SUM(CASE WHEN pr IS NOT NULL THEN abs(r - pr) ELSE 0 END) AS BIGINT) rank_churn,
  CAST(MIN(r) AS BIGINT) best_rank, CAST(MAX(r) AS BIGINT) worst_rank
FROM ch GROUP BY n_name ORDER BY n_name""",

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

    "q237_monotone_runs" -> """
WITH f AS (SELECT user_id, ts, event_id,
    CASE WHEN value > LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         THEN 1 ELSE 0 END rise
  FROM events),
i AS (SELECT user_id, rise,
    SUM(1 - rise) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) isl
  FROM f),
runs AS (SELECT user_id, isl, CAST(SUM(rise) AS BIGINT) rises FROM i GROUP BY user_id, isl),
u AS (SELECT user_id, MAX(rises) + 1 longest FROM runs GROUP BY user_id)
SELECT CAST(longest AS BIGINT) longest, COUNT(*) n_users
FROM u GROUP BY longest ORDER BY longest""",

    "q244_basket_breadth" -> """
WITH per AS (SELECT l_orderkey, COUNT(*) n_lines,
    COUNT(DISTINCT p_brand) n_brands
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY l_orderkey)
SELECT n_lines, n_brands, COUNT(*) n_orders
FROM per GROUP BY n_lines, n_brands ORDER BY n_lines, n_brands""",

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

    "q51_pivot" -> """
SELECT EXTRACT(year FROM o_orderdate) AS yr,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_f,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_o,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p,
  COUNT(*) AS n
FROM orders GROUP BY yr ORDER BY yr""",

    "q66_hash_split" -> """
WITH s AS (
  SELECT doc_id, lang, n_chars,
    CASE WHEN md5(CAST(doc_id AS STRING)) < 'c' THEN 'train'
         WHEN md5(CAST(doc_id AS STRING)) < 'e' THEN 'val'
         ELSE 'test' END AS split
  FROM documents)
SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM s GROUP BY split, lang ORDER BY split, lang""",

    "q69_stratified_sample" -> """
WITH r AS (SELECT doc_id, lang,
  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS STRING)), doc_id) rn
  FROM documents)
SELECT lang, doc_id, rn FROM r WHERE rn <= 5 ORDER BY lang, rn""",

    "q75_retention" -> """
WITH uw AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) w FROM events),
fw AS (SELECT user_id, min(w) cohort FROM uw GROUP BY user_id)
SELECT fw.cohort, uw.w, COUNT(*) n_users
FROM uw JOIN fw ON fw.user_id = uw.user_id
GROUP BY 1, 2 ORDER BY 1, 2""",

    "q255_mode_stability" -> """
WITH vc AS (SELECT event_type,
    CASE WHEN MD5(CAST(event_id AS STRING)) < '8' THEN 'a' ELSE 'b' END half,
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

    // ---- text-family adaptations: DuckDB string_split/unnest/// map
    // to Spark split/explode/DIV; element_at is the 1-based indexer
    // (arr[i] would be 0-based), slice(arr, start, LENGTH) replaces
    // the inclusive-end list_slice, and sequence() must be guarded
    // against start > stop (it would count DOWN, not return empty).

    "q47_token_count" -> """
SELECT lang, COUNT(*) n_docs,
       CAST(SUM(size(split(text, ' '))) AS BIGINT) sum_ws_tokens,
       CAST(SUM(size(regexp_extract_all(text, '[a-z]+|[0-9]+', 0))) AS BIGINT) sum_re_tokens,
       CAST(SUM((n_chars + 3) DIV 4) AS BIGINT) sum_bpe_est
FROM documents GROUP BY lang ORDER BY lang""",

    "q89_vocab_growth" -> """
WITH tk AS (SELECT source, tok FROM documents
            LATERAL VIEW explode(filter(split(lower(text), ' '), x -> x != '')) t AS tok),
tf AS (SELECT source, tok, COUNT(*) c FROM tk GROUP BY source, tok)
SELECT source, CAST(SUM(c) AS BIGINT) AS toks, COUNT(*) AS vocab,
  CAST(CAST(COUNT(*) AS DECIMAL(38,0)) * 1000000 DIV SUM(c) AS BIGINT) AS ttr_ppm,
  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
FROM tf GROUP BY source ORDER BY source""",

    "q111_token_entropy" -> """
WITH tk AS (SELECT doc_id, source, tok FROM documents
            LATERAL VIEW explode(filter(split(lower(text), ' '), x -> x != '')) t AS tok),
tf AS (SELECT doc_id, source, tok, COUNT(*) AS tf FROM tk GROUP BY doc_id, source, tok),
h AS (SELECT doc_id, source,
        SUM(CAST(ROUND(-(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE))
          * ln(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE)), 9) AS DECIMAL(18,9))) AS hd
      FROM (SELECT *, SUM(tf) OVER (PARTITION BY doc_id) AS dl FROM tf)
      GROUP BY doc_id, source)
SELECT source, COUNT(*) AS n_docs,
  ROUND(CAST(SUM(hd) AS DOUBLE) / COUNT(*), 6) AS mean_entropy,
  CAST(MIN(hd) AS DOUBLE) AS min_entropy,
  CAST(MAX(hd) AS DOUBLE) AS max_entropy
FROM h GROUP BY source ORDER BY source""",

    "q152_vocab_exclusivity" -> """
WITH pairs AS (SELECT DISTINCT source, tok FROM documents
               LATERAL VIEW explode(filter(split(lower(text), ' '), x -> x != '')) t AS tok),
card AS (SELECT tok, COUNT(*) ns FROM pairs GROUP BY tok)
SELECT p.source, COUNT(*) n_vocab,
  CAST(SUM(CASE WHEN c.ns = 1 THEN 1 ELSE 0 END) AS BIGINT) n_exclusive,
  CAST(SUM(CASE WHEN c.ns = 1 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) exclusive_ppm
FROM pairs p JOIN card c ON c.tok = p.tok
GROUP BY p.source ORDER BY p.source""",

    "q238_wordlen_spectrum" -> """
WITH t AS (SELECT lang, tok FROM documents
           LATERAL VIEW explode(split(LOWER(text), ' ')) e AS tok),
wl AS (SELECT lang, least(CAST(length(tok) AS BIGINT), 20) wlen, COUNT(*) n
  FROM t WHERE tok != '' GROUP BY lang, wlen),
tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) nt FROM wl GROUP BY lang)
SELECT wl.lang, CAST(wlen AS BIGINT) wlen, n,
  CAST(n * 1000000 DIV nt AS BIGINT) ppm
FROM wl JOIN tot ON tot.lang = wl.lang ORDER BY wl.lang, wlen""",

    "q262_hapax_mass" -> """
WITH t AS (SELECT lang, doc_id, tok FROM documents
           LATERAL VIEW explode(split(LOWER(text), ' ')) e AS tok),
lt AS (SELECT lang, tok, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS mass
  FROM t WHERE tok != '' GROUP BY lang, tok)
SELECT lang, COUNT(*) AS vocab,
  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_vocab,
  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) AS hapax_vocab_ppm,
  CAST(SUM(CASE WHEN df = 1 THEN mass ELSE 0 END) * 1000000 DIV SUM(mass) AS BIGINT) AS hapax_mass_ppm
FROM lt GROUP BY lang ORDER BY lang""",

    "q167_prefix_dup" -> """
WITH d AS (SELECT text, filter(split(lower(text), ' '), x -> x != '') l FROM documents),
k AS (SELECT md5(text) full_h, array_join(slice(l, 1, 8), ' ') pfx FROM d WHERE size(l) >= 8),
fam AS (SELECT pfx, COUNT(*) family_size, COUNT(DISTINCT full_h) n_texts FROM k GROUP BY pfx)
SELECT family_size, COUNT(*) n_families,
  CAST(SUM(CASE WHEN n_texts < family_size THEN 1 ELSE 0 END) AS BIGINT) n_exact_dup_families,
  CAST(SUM(family_size - n_texts) AS BIGINT) n_redundant_docs
FROM fam GROUP BY family_size ORDER BY family_size""",

    "q86_chunking" -> """
WITH d AS (SELECT doc_id, source, filter(split(lower(text), ' '), x -> x != '') l FROM documents),
n AS (SELECT doc_id, source, l, size(l) n FROM d WHERE size(l) > 0),
c AS (SELECT doc_id, source, st, l, n FROM n
      LATERAL VIEW explode(sequence(1, n, 24)) s AS st),
ch AS (SELECT doc_id, source, slice(l, st, least(32, n - st + 1)) chunk FROM c),
h AS (SELECT doc_id, source, md5(array_join(chunk, ' ')) ch_hash, size(chunk) ch_toks FROM ch)
SELECT source, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_chunks,
  COUNT(DISTINCT ch_hash) AS n_distinct,
  CAST(SUM(ch_toks) AS BIGINT) AS toks,
  CAST(MIN(ch_toks) AS BIGINT) AS min_toks
FROM h GROUP BY source ORDER BY source""",

    "q90_dup_degree" -> """
WITH d AS (SELECT doc_id, split(lower(text), ' ') l FROM documents
           WHERE size(split(lower(text), ' ')) >= 3),
s AS (SELECT doc_id, i, l FROM d
      LATERAL VIEW explode(sequence(1, size(l) - 2)) t AS i),
sh AS (SELECT DISTINCT doc_id,
         concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh
       FROM s),
shk AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000)),
card AS (SELECT doc_id, COUNT(*) nt FROM shk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
edge AS (SELECT i, j FROM inter x
         JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j
         WHERE CAST(x.ci AS DOUBLE) / (ca.nt + cb.nt - x.ci) >= 0.2),
deg AS (SELECT doc_id, COUNT(*) degree FROM
        (SELECT i doc_id FROM edge UNION ALL SELECT j FROM edge) GROUP BY doc_id)
SELECT degree, COUNT(*) AS n_docs FROM deg GROUP BY degree ORDER BY degree""",

    "q203_centroid_confusion" -> """
WITH c AS (SELECT label, CAST(i AS INT) pos,
    CAST(SUM(CAST(element_at(embedding, CAST(i AS INT)) AS DECIMAL(18,9))) AS DECIMAL(14,9)) v
  FROM embeddings LATERAL VIEW explode(sequence(1, 64)) r AS i GROUP BY label, pos)
SELECT a.label l1, b.label l2,
  CAST(ROUND(CAST(SUM(a.v * b.v) AS DOUBLE)
    / SQRT(CAST(SUM(a.v * a.v) AS DOUBLE) * CAST(SUM(b.v * b.v) AS DOUBLE)), 6) AS DOUBLE) cos6
FROM c a JOIN c b ON b.pos = a.pos AND a.label < b.label
GROUP BY a.label, b.label ORDER BY l1, l2""",

    // list_sum(list_transform(list_zip(a,b), ...)) maps to
    // aggregate(zip_with(a, b, ...), 0d, (acc,v) -> acc+v) — BOTH fold
    // left-to-right over the same in-row array order, so the double
    // sums are bit-identical across the engines
    "q43_dedup_embedding" -> """
WITH p AS (SELECT a.label, a.vec_id i, b.vec_id j,
  aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
            CAST(0 AS DOUBLE), (acc, v) -> acc + v)
  / (SQRT(aggregate(transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                    CAST(0 AS DOUBLE), (acc, v) -> acc + v))
   * SQRT(aggregate(transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                    CAST(0 AS DOUBLE), (acc, v) -> acc + v))) cos
 FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id)
SELECT label, COUNT(*) n_pairs, ROUND(MAX(cos), 6) max_cos
FROM p WHERE cos >= 0.3 GROUP BY label ORDER BY label""",

    "q44_ann_lsh" -> """
WITH b AS (SELECT vec_id, label, embedding,
  concat(CASE WHEN element_at(embedding, 1) >= 0 THEN '1' ELSE '0' END,
         CASE WHEN element_at(embedding, 2) >= 0 THEN '1' ELSE '0' END,
         CASE WHEN element_at(embedding, 3) >= 0 THEN '1' ELSE '0' END,
         CASE WHEN element_at(embedding, 4) >= 0 THEN '1' ELSE '0' END) bucket
  FROM embeddings),
qv AS (SELECT embedding v, bucket FROM b WHERE vec_id = 0)
SELECT e.vec_id, e.label,
  ROUND(aggregate(zip_with(e.embedding, qv.v, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                  CAST(0 AS DOUBLE), (acc, v) -> acc + v)
  / (SQRT(aggregate(transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                    CAST(0 AS DOUBLE), (acc, v) -> acc + v))
   * SQRT(aggregate(transform(qv.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                    CAST(0 AS DOUBLE), (acc, v) -> acc + v))), 6) cos_sim
FROM b e JOIN qv ON e.bucket = qv.bucket
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id LIMIT 5""",

    // ---- integer-ppm kernels: DuckDB epoch_us maps to unix_micros,
    // // to DIV; the ppm arithmetic stays all-integer on both engines

    "q68_mixing_weights" -> """
WITH t AS (SELECT source,
             CAST(SUM(size(filter(split(lower(text), ' '), x -> x != ''))) AS BIGINT) AS toks,
             COUNT(*) AS n_docs
           FROM documents GROUP BY source)
SELECT source, n_docs, toks,
  CAST(CAST(toks AS DECIMAL(38,0)) * 1000000 DIV (SELECT SUM(toks) FROM t) AS BIGINT) AS weight_ppm
FROM t ORDER BY source""",

    "q76_gap_histogram" -> """
WITH d AS (SELECT user_id, ts, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev
           FROM events),
g AS (SELECT (unix_micros(ts) - unix_micros(prev)) DIV 600000000 AS bucket_10min
      FROM d WHERE prev IS NOT NULL)
SELECT CAST(bucket_10min AS BIGINT) bucket_10min, COUNT(*) n
FROM g GROUP BY 1 ORDER BY 1 LIMIT 100""",

    "q77_pct_of_total" -> """
WITH c AS (SELECT c_custkey, c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) cents
           FROM customer WHERE c_acctbal > 0)
SELECT c_custkey, c_mktsegment,
  CAST(cents * 1000000 DIV SUM(cents) OVER (PARTITION BY c_mktsegment) AS BIGINT) share_ppm
FROM c ORDER BY c_mktsegment, c_custkey LIMIT 200""",

    "q91_burstiness" -> """
WITH b AS (SELECT user_id, unix_micros(ts) DIV 3600000000 h, COUNT(*) c
           FROM events GROUP BY user_id, h)
SELECT user_id, CAST(SUM(c) AS BIGINT) AS n, CAST(MAX(c) AS BIGINT) AS max_h,
  CAST(MAX(c) * 1000000 DIV SUM(c) AS BIGINT) AS burst_ppm
FROM b GROUP BY user_id ORDER BY burst_ppm DESC, user_id LIMIT 25""",

    "q99_seasonality" -> """
SELECT (unix_micros(ts) DIV 86400000000 + 4) % 7 AS dow,
       (unix_micros(ts) % 86400000000) DIV 3600000000 AS hour,
       COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY dow, hour ORDER BY dow, hour""",

    "q102_skew_profile" -> """
WITH c AS (SELECT o_custkey, COUNT(*) AS n_rows FROM orders GROUP BY o_custkey),
s AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total, COUNT(*) AS n_keys FROM c)
SELECT c.o_custkey, c.n_rows,
  c.n_rows * 1000000 DIV s.total AS share_ppm,
  s.n_keys,
  GREATEST(1, (c.n_rows * 32 + s.total - 1) DIV s.total) AS salts
FROM c CROSS JOIN s
ORDER BY c.n_rows DESC, c.o_custkey LIMIT 20""",

    "q196_round_value_bias" -> """
SELECT event_type, COUNT(*) n_events,
  CAST(SUM(CASE WHEN value = floor(value) THEN 1 ELSE 0 END) AS BIGINT) n_round,
  CAST(CAST(SUM(CASE WHEN value = floor(value) THEN 1 ELSE 0 END) AS BIGINT) * 1000000 DIV COUNT(*) AS BIGINT) round_ppm
FROM events GROUP BY event_type ORDER BY event_type""",

    "q263_month_amplitude" -> """
WITH m AS (SELECT event_type, CAST(month(ts) AS BIGINT) AS m, COUNT(*) AS n_m
  FROM events GROUP BY event_type, m)
SELECT event_type, COUNT(*) AS n_months, CAST(SUM(n_m) AS BIGINT) AS n,
  CAST(MIN(n_m) AS BIGINT) AS min_month, CAST(MAX(n_m) AS BIGINT) AS max_month,
  CAST((MAX(n_m) - MIN(n_m)) * 1000000 DIV MAX(n_m) AS BIGINT) AS amplitude_ppm
FROM m GROUP BY event_type ORDER BY event_type""",

    "q264_zero_discount_bands" -> """
SELECT CAST(l_quantity AS BIGINT) DIV 10 AS qty_band, COUNT(*) AS n_lines,
  CAST(SUM(CASE WHEN CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
  CAST(SUM(CASE WHEN CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) = 0 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) AS zero_ppm
FROM lineitem GROUP BY qty_band ORDER BY qty_band""",

    "q267_month_end_bias" -> """
SELECT o_orderpriority AS prio, COUNT(*) AS n_orders,
  CAST(SUM(CASE WHEN day(o_orderdate) >= day(last_day(o_orderdate)) - 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_month_end,
  CAST(SUM(CASE WHEN day(o_orderdate) >= day(last_day(o_orderdate)) - 2 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) AS month_end_ppm
FROM orders GROUP BY prio ORDER BY prio""",

    "q81_inverted_index" -> """
WITH tk AS (SELECT DISTINCT doc_id, tok FROM documents
            LATERAL VIEW explode(filter(split(lower(text), ' '), x -> x != '')) t AS tok),
post AS (SELECT tok, COUNT(*) AS df FROM tk GROUP BY tok)
SELECT COUNT(*) AS n_terms,
  CAST(SUM(df) AS BIGINT) AS n_postings,
  CAST(MAX(df) AS BIGINT) AS max_posting,
  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
  MIN(CASE WHEN df = (SELECT MAX(df) FROM post) THEN tok END) AS heaviest_term
FROM post""",

    "q87_packing_waste" -> """
WITH d AS (SELECT size(filter(split(lower(text), ' '), x -> x != '')) n FROM documents),
b AS (SELECT n, CAST(GREATEST(16, shiftleft(1, length(bin(n - 1)))) AS BIGINT) bucket
  FROM d WHERE n > 0)
SELECT bucket, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS toks,
  CAST(SUM(bucket - n) AS BIGINT) AS pad,
  CAST(CAST(SUM(bucket - n) AS DECIMAL(38,0)) * 1000000 DIV (SUM(n) + SUM(bucket - n)) AS BIGINT) AS pad_ppm
FROM b GROUP BY bucket ORDER BY bucket""",

    "q92_apply_mixing" -> """
WITH d AS (SELECT doc_id, source,
  size(filter(split(lower(text), ' '), x -> x != '')) toks,
  substr(md5(CAST(doc_id AS STRING)), 1, 8) r
  FROM documents),
k AS (SELECT * FROM d WHERE r <= CASE source
  WHEN 'src0' THEN 'ffffffff' WHEN 'src1' THEN 'bfffffff'
  WHEN 'src2' THEN '7fffffff' WHEN 'src3' THEN '3fffffff'
  WHEN 'src4' THEN '19999999' ELSE '7fffffff' END)
SELECT source, COUNT(*) AS n_kept, CAST(SUM(toks) AS BIGINT) AS toks_kept
FROM k GROUP BY source ORDER BY source""",

    "q172_repeat_action_rate" -> """
WITH g AS (SELECT event_type, user_id, date_trunc('day', ts) d, COUNT(*) c
  FROM events GROUP BY event_type, user_id, d)
SELECT event_type,
  CAST(SUM(c) AS BIGINT) n_events,
  COUNT(*) n_user_days,
  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) n_repeat_groups,
  CAST((CAST(SUM(c) AS BIGINT) - COUNT(*)) * 1000000 DIV CAST(SUM(c) AS BIGINT) AS BIGINT) repeat_ppm,
  CAST(MAX(c) AS BIGINT) max_repeats
FROM g GROUP BY event_type ORDER BY event_type""",

    "q190_mode_value" -> """
WITH counts AS (SELECT event_type, value, COUNT(*) c FROM events GROUP BY event_type, value),
mx AS (SELECT event_type, MAX(c) mx, CAST(SUM(c) AS BIGINT) n_events FROM counts GROUP BY event_type)
SELECT c.event_type, MIN(c.value) mode_value,
  CAST(MIN(m.mx) AS BIGINT) mode_count, MIN(m.n_events) n_events,
  CAST(MIN(m.mx) * 1000000 DIV MIN(m.n_events) AS BIGINT) support_ppm
FROM counts c JOIN mx m ON m.event_type = c.event_type AND c.c = m.mx
GROUP BY c.event_type ORDER BY c.event_type""",

    "q235_precision_census" -> """
SELECT event_type, COUNT(*) n,
  CAST(SUM(CASE WHEN value = floor(value) THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) int_ppm,
  CAST(SUM(CASE WHEN value * 10 = floor(value * 10) THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) dec1_ppm,
  CAST(SUM(CASE WHEN value * 100 = floor(value * 100) THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) dec2_ppm
FROM events GROUP BY event_type ORDER BY event_type""",

    "q236_lifecycle_span" -> """
WITH pq AS (SELECT p_brand,
    year(l_shipdate) * 4 + quarter(l_shipdate) - 1 aq
  FROM lineitem JOIN part ON p_partkey = l_partkey)
SELECT p_brand, CAST(MIN(aq) AS BIGINT) first_q, CAST(MAX(aq) AS BIGINT) last_q,
  CAST(MAX(aq) - MIN(aq) + 1 AS BIGINT) span_q,
  COUNT(DISTINCT aq) active,
  CAST(COUNT(DISTINCT aq) * 1000000 DIV (MAX(aq) - MIN(aq) + 1) AS BIGINT) coverage_ppm
FROM pq GROUP BY p_brand ORDER BY p_brand""",

    "q242_repurchase_rate" -> """
WITH cpo AS (SELECT DISTINCT o_custkey, l_partkey, l_orderkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
pairs AS (SELECT o_custkey, l_partkey, COUNT(*) n_orders
  FROM cpo GROUP BY o_custkey, l_partkey)
SELECT p_brand, COUNT(*) n_pairs,
  CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) n_repeat,
  CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) repeat_ppm
FROM pairs JOIN part ON p_partkey = l_partkey
GROUP BY p_brand ORDER BY p_brand""",

    "q257_linenumber_audit" -> """
WITH per AS (SELECT l_orderkey, COUNT(*) n, MIN(l_linenumber) mn,
    MAX(l_linenumber) mx, COUNT(DISTINCT l_linenumber) nd
  FROM lineitem GROUP BY l_orderkey)
SELECT COUNT(*) n_orders,
  CAST(SUM(CASE WHEN mn = 1 AND mx = n AND nd = n THEN 0 ELSE 1 END) AS BIGINT) n_violations,
  CAST(SUM(CASE WHEN mn = 1 AND mx = n AND nd = n THEN 0 ELSE 1 END) * 1000000 DIV COUNT(*) AS BIGINT) violation_ppm,
  CAST(MAX(n) AS BIGINT) max_lines
FROM per""",

    "q258_dim_key_audit" -> """
WITH pop AS (
  SELECT 'customer' dim,
    CASE WHEN CAST(regexp_extract(c_name, '#(\\d+)$', 1) AS BIGINT) = c_custkey
         THEN 0 ELSE 1 END bad
  FROM customer
  UNION ALL
  SELECT 'supplier' dim,
    CASE WHEN CAST(regexp_extract(s_name, '#(\\d+)$', 1) AS BIGINT) = s_suppkey
         THEN 0 ELSE 1 END bad
  FROM supplier)
SELECT dim, COUNT(*) n_rows, CAST(SUM(bad) AS BIGINT) n_mismatch,
  CAST(SUM(bad) * 1000000 DIV COUNT(*) AS BIGINT) mismatch_ppm
FROM pop GROUP BY dim ORDER BY dim""",

    "q96_rolling_actives" -> """
WITH du AS (SELECT DISTINCT user_id, unix_micros(ts) DIV 86400000000 d FROM events),
days AS (SELECT explode(sequence(MIN(d), MAX(d))) AS day FROM du),
span AS (SELECT user_id, explode(sequence(d, d + 6)) rd FROM du),
r7 AS (SELECT rd, COUNT(DISTINCT user_id) dau7 FROM span GROUP BY rd),
r1 AS (SELECT d, COUNT(*) dau1 FROM du GROUP BY d)
SELECT days.day, COALESCE(r1.dau1, 0) AS dau1, COALESCE(r7.dau7, 0) AS dau7
FROM days LEFT JOIN r7 ON r7.rd = days.day LEFT JOIN r1 ON r1.d = days.day
ORDER BY day""",

    "q113_sig_groups" -> """
WITH d AS (SELECT doc_id, lower(text) lt, split(lower(text), ' ') l FROM documents),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) t AS i),
t AS (SELECT DISTINCT doc_id,
        concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh
      FROM s),
sig AS (SELECT doc_id,
  MIN(substr(md5(sh), 1, 4)) || ':' || MIN(substr(md5(sh), 5, 4)) || ':' ||
  MIN(substr(md5(sh), 9, 4)) || ':' || MIN(substr(md5(sh), 13, 4)) || ':' ||
  MIN(substr(md5(sh), 17, 4)) || ':' || MIN(substr(md5(sh), 21, 4)) || ':' ||
  MIN(substr(md5(sh), 25, 4)) || ':' || MIN(substr(md5(sh), 29, 4)) AS sig
  FROM t GROUP BY doc_id),
alls AS (SELECT d.doc_id, COALESCE(sig.sig, 'short:' || md5(d.lt), 'null:') AS sig
         FROM d LEFT JOIN sig USING (doc_id)),
g AS (SELECT sig, COUNT(*) n FROM alls GROUP BY sig)
SELECT COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
  CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_redundant, MAX(n) AS max_group
FROM g""",

    "q165_supplier_concentration" -> """
WITH rev AS (SELECT l_suppkey supplier,
    SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) rev_d,
    COUNT(*) n_items
  FROM lineitem GROUP BY l_suppkey),
tot AS (SELECT SUM(rev_d) total_d FROM rev),
top AS (SELECT * FROM rev ORDER BY rev_d DESC, supplier LIMIT 10)
SELECT t.supplier, t.n_items,
  CAST(t.rev_d AS DOUBLE) net_revenue,
  CAST(CAST(t.rev_d * 10000 AS DECIMAL(19,0)) * 1000000 DIV CAST(tot.total_d * 10000 AS DECIMAL(19,0)) AS BIGINT) revenue_share_ppm
FROM top t CROSS JOIN tot
ORDER BY net_revenue DESC, t.supplier""",

    "q184_props_value_profile" -> """
WITH k AS (SELECT event_type, CAST(get_json_object(props, '$.k') AS BIGINT) k
  FROM events WHERE get_json_object(props, '$.k') IS NOT NULL),
grid AS (SELECT event_type, k DIV 10 k_band, COUNT(*) n FROM k GROUP BY event_type, k_band),
tot AS (SELECT event_type, COUNT(*) n_type FROM k GROUP BY event_type)
SELECT g.event_type, CAST(g.k_band AS BIGINT) k_band, g.n,
  CAST(g.n * 1000000 DIV t.n_type AS BIGINT) type_share_ppm
FROM grid g JOIN tot t ON t.event_type = g.event_type
ORDER BY g.event_type, k_band""",

    "q201_line_position_decay" -> """
WITH pos AS (SELECT l_linenumber, COUNT(*) n_lines,
    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) qty_sum,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) DIV 100 AS BIGINT) c2
  FROM lineitem GROUP BY l_linenumber),
tot AS (SELECT CAST(SUM(c2) AS BIGINT) g_c2 FROM pos)
SELECT l_linenumber, n_lines,
  CAST(qty_sum DIV n_lines AS BIGINT) mean_qty,
  CAST(c2 * 1000000 DIV g_c2 AS BIGINT) rev_share_ppm
FROM pos CROSS JOIN tot ORDER BY l_linenumber""",

    "q214_length_gini" -> """
WITH lc AS (SELECT lang, n_chars x, COUNT(*) c FROM documents GROUP BY lang, x),
cum AS (SELECT lang, x, c,
    CAST(COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) cb
  FROM lc),
g AS (SELECT lang, CAST(SUM(c) AS BIGINT) n, CAST(SUM(x * c) AS BIGINT) s,
    CAST(SUM(x * (2 * c * cb + c * (c + 1))) AS BIGINT) r2
  FROM cum GROUP BY lang)
SELECT lang, n, s total_chars,
  CAST((r2 - (n + 1) * s) * 1000000 DIV (n * s) AS BIGINT) gini_ppm
FROM g ORDER BY lang""",

    "q218_user_diversity" -> """
WITH ut AS (SELECT user_id, event_type, COUNT(*) c FROM events GROUP BY user_id, event_type),
u AS (SELECT user_id, CAST(SUM(c) AS BIGINT) n, CAST(SUM(c * c) AS BIGINT) ss,
    COUNT(*) n_types
  FROM ut GROUP BY user_id),
b AS (SELECT user_id, n, n_types,
    (1000000 - ss * 1000000 DIV (n * n)) DIV 5000 band FROM u)
SELECT CAST(band AS BIGINT) band, COUNT(*) n_users,
  CAST(SUM(n) AS BIGINT) n_events,
  CAST(MIN(n_types) AS BIGINT) min_types, CAST(MAX(n_types) AS BIGINT) max_types
FROM b GROUP BY band ORDER BY band""",

    "q227_composition_lift" -> """
WITH ls AS (SELECT lang, source, COUNT(*) n_ls FROM documents GROUP BY lang, source),
nl AS (SELECT lang, CAST(SUM(n_ls) AS BIGINT) n_l FROM ls GROUP BY lang),
ns AS (SELECT source, CAST(SUM(n_ls) AS BIGINT) n_s FROM ls GROUP BY source),
g AS (SELECT CAST(SUM(n_ls) AS BIGINT) n FROM ls)
SELECT ls.lang, ls.source, ls.n_ls,
  CAST(ls.n_ls * g.n * 1000000 DIV (nl.n_l * ns.n_s) AS BIGINT) lift_ppm
FROM ls JOIN nl ON nl.lang = ls.lang JOIN ns ON ns.source = ls.source
CROSS JOIN g ORDER BY ls.lang, ls.source""",

    "q248_elite_retention" -> """
WITH yr AS (SELECT CAST(year(o_orderdate) AS BIGINT) y, o_custkey,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) rev
  FROM orders GROUP BY y, o_custkey),
rc AS (SELECT y, rev, COUNT(*) c FROM yr GROUP BY y, rev),
rt AS (SELECT y, CAST(SUM(c) AS BIGINT) n FROM rc GROUP BY y),
cum AS (SELECT y, rev, CAST(SUM(c) OVER (PARTITION BY y ORDER BY rev) AS BIGINT) cum FROM rc),
thr AS (SELECT c.y, MIN(rev) thr FROM cum c JOIN rt t ON t.y = c.y
  WHERE c.cum >= t.n - t.n DIV 10 GROUP BY c.y),
elite AS (SELECT yr.y, yr.o_custkey FROM yr JOIN thr ON thr.y = yr.y
  WHERE yr.rev >= thr.thr)
SELECT e.y, COUNT(*) n_elite,
  CAST(SUM(CASE WHEN n.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) n_stay,
  CAST(SUM(CASE WHEN n.o_custkey IS NOT NULL THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) stay_ppm
FROM elite e LEFT JOIN elite n ON n.y = e.y + 1 AND n.o_custkey = e.o_custkey
WHERE e.y < 2001 GROUP BY e.y ORDER BY e.y""",

    "q250_churn_census" -> """
WITH ev AS (SELECT user_id, event_type, unix_micros(ts) us FROM events),
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
  CAST(SUM(churned) * 1000000 DIV COUNT(*) AS BIGINT) churn_ppm
FROM u GROUP BY modal_type ORDER BY modal_type""",

    // Spark has no QUALIFY — the window filter moves to an outer select
    "q229_seq_predictability" -> """
WITH lg AS (SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev
  FROM events),
bg AS (SELECT user_id, prev || '>' || event_type bigram FROM lg WHERE prev IS NOT NULL),
u AS (SELECT user_id, COUNT(*) n_tr, COUNT(DISTINCT bigram) n_bg FROM bg GROUP BY user_id),
b AS (SELECT user_id, n_tr,
    (n_tr - n_bg) * 1000000 DIV n_tr DIV 100000 band FROM u)
SELECT CAST(band AS BIGINT) band, COUNT(*) n_users,
  CAST(SUM(n_tr) AS BIGINT) n_transitions
FROM b GROUP BY band ORDER BY band""",

    "q110_epoch_mix" -> """
WITH t AS (SELECT source,
             CAST(SUM(size(filter(split(lower(text), ' '), x -> x != ''))) AS BIGINT) AS toks
           FROM documents GROUP BY source),
w AS (SELECT * FROM (VALUES ('src0',300000),('src1',250000),('src2',200000),
                            ('src3',150000),('src4',100000)) AS w(source, w_ppm))
SELECT t.source, toks,
  CAST(CAST(1000000000 AS BIGINT) * w_ppm DIV 1000000 AS BIGINT) AS target_toks,
  CAST(CAST(CAST(1000000000 AS BIGINT) * w_ppm DIV 1000000 AS DECIMAL(38,0)) * 1000000 DIV toks AS BIGINT) AS epochs_ppm
FROM t JOIN w USING (source) ORDER BY source""",

    "q153_event_burst_echo" -> """
WITH e AS (SELECT event_type, user_id,
        CASE WHEN LAG(ts) OVER w IS NOT NULL
              AND unix_millis(ts) - unix_millis(LAG(ts) OVER w) <= 10000
             THEN 1 ELSE 0 END AS echo
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
SELECT event_type, COUNT(*) n_events,
  CAST(SUM(echo) AS BIGINT) n_echoes,
  CAST(COUNT(DISTINCT CASE WHEN echo = 1 THEN user_id END) AS BIGINT) n_echo_users,
  CAST(SUM(echo) * 1000000 DIV COUNT(*) AS BIGINT) echo_ppm
FROM e GROUP BY event_type ORDER BY event_type""",

    "q176_event_type_overlap" -> """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
aud AS (SELECT event_type, COUNT(*) n_aud FROM ut GROUP BY event_type),
inter AS (SELECT a.event_type ta, b.event_type tb, COUNT(*) n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY ta, tb)
SELECT i.ta type_a, i.tb type_b, aa.n_aud n_a, ab.n_aud n_b, i.n_both,
  CAST(i.n_both * 1000000 DIV (aa.n_aud + ab.n_aud - i.n_both) AS BIGINT) jaccard_ppm
FROM inter i JOIN aud aa ON aa.event_type = i.ta JOIN aud ab ON ab.event_type = i.tb
ORDER BY type_a, type_b""",

    "q179_supply_redundancy" -> """
WITH per_part AS (SELECT l_partkey,
    COUNT(DISTINCT l_suppkey) n_suppliers,
    SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) rev_d
  FROM lineitem GROUP BY l_partkey),
tot AS (SELECT SUM(rev_d) tot_d FROM per_part)
SELECT n_suppliers, COUNT(*) n_parts,
  CAST(SUM(rev_d) AS DOUBLE) net_revenue,
  CAST(CAST(SUM(rev_d) * 10000 AS DECIMAL(19,0)) * 1000000 DIV CAST(tot.tot_d * 10000 AS DECIMAL(19,0)) AS BIGINT) revenue_share_ppm
FROM per_part CROSS JOIN tot
GROUP BY n_suppliers, tot.tot_d ORDER BY n_suppliers""",

    "q187_brand_type_coverage" -> """
WITH p AS (SELECT p_brand, p_type, CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) centi FROM part),
cell AS (SELECT p_brand, p_type, COUNT(*) n_parts, CAST(SUM(centi) AS BIGINT) sc
  FROM p GROUP BY p_brand, p_type),
bt AS (SELECT p_brand, CAST(SUM(n_parts) AS BIGINT) brand_n FROM cell GROUP BY p_brand)
SELECT c.p_brand, c.p_type, c.n_parts,
  CAST(c.sc DIV c.n_parts AS BIGINT) mean_centiprice,
  CAST(c.n_parts * 1000000 DIV bt.brand_n AS BIGINT) brand_share_ppm
FROM cell c JOIN bt ON bt.p_brand = c.p_brand
ORDER BY c.p_brand, c.p_type""",

    "q189_purchase_proximity" -> """
WITH ev AS (SELECT event_id, user_id, event_type, unix_micros(ts) us FROM events),
p AS (SELECT e.event_id p_id, e.user_id p_user, e.us p_us, e.us DIV 300000000 + d.d cell
  FROM ev e CROSS JOIN (SELECT explode(array(-1, 0, 1)) d) d WHERE e.event_type = 'purchase'),
o AS (SELECT event_id, user_id, event_type, us, us DIV 300000000 cell FROM ev)
SELECT o.event_type, COUNT(*) n_near,
  COUNT(DISTINCT p.p_id) n_purchases_touched
FROM p JOIN o ON o.user_id = p.p_user AND o.cell = p.cell
WHERE o.event_id <> p.p_id AND abs(o.us - p.p_us) <= 300000000
GROUP BY o.event_type ORDER BY o.event_type""",

    "q198_basket_affinity" -> """
WITH ob AS (SELECT DISTINCT l_orderkey ok, p_brand b
    FROM lineitem JOIN part ON p_partkey = l_partkey),
n_orders AS (SELECT COUNT(DISTINCT ok) n_orders FROM ob),
nb AS (SELECT b, COUNT(*) n_b FROM ob GROUP BY b),
pairs AS (SELECT l.b b1, r.b b2, COUNT(*) n_pair
  FROM ob l JOIN ob r ON r.ok = l.ok AND l.b < r.b GROUP BY l.b, r.b)
SELECT p.b1, p.b2, p.n_pair, n1.n_b n_b1, n2.n_b n_b2,
  CAST(p.n_pair * no.n_orders * 1000000 DIV (n1.n_b * n2.n_b) AS BIGINT) lift_ppm
FROM pairs p JOIN nb n1 ON n1.b = p.b1 JOIN nb n2 ON n2.b = p.b2
CROSS JOIN n_orders no ORDER BY p.b1, p.b2""",

    "q200_returns_mix" -> """
WITH by_brand AS (SELECT p_brand, COUNT(*) n_lines,
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) n_returned
  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY p_brand),
tot AS (SELECT CAST(SUM(n_lines) AS BIGINT) g_lines,
    CAST(SUM(n_returned) AS BIGINT) g_returned FROM by_brand)
SELECT p_brand, n_lines, n_returned,
  CAST(n_returned * 1000000 DIV n_lines AS BIGINT) return_ppm,
  CAST(n_returned * 1000000 DIV n_lines - g_returned * 1000000 DIV g_lines AS BIGINT) delta_ppm
FROM by_brand CROSS JOIN tot ORDER BY p_brand""",

    "q219_discount_spread" -> """
WITH pd AS (SELECT l_partkey,
    MIN(CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) dmin,
    MAX(CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) dmax,
    COUNT(DISTINCT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) nd
  FROM lineitem GROUP BY l_partkey)
SELECT p_brand, COUNT(*) n_parts,
  CAST(SUM(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT) n_single,
  CAST(MAX(dmax - dmin) AS BIGINT) max_spread,
  CAST(SUM(dmax - dmin) * 1000000 DIV COUNT(*) AS BIGINT) mean_spread_ppm
FROM pd JOIN part ON p_partkey = l_partkey
GROUP BY p_brand ORDER BY p_brand""",

    // percentile() is Spark's exact interpolated quantile — the same
    // linear-interpolation semantics as DuckDB's quantile_cont
    "q79_percentile_stats" -> """
SELECT l_returnflag, COUNT(*) AS n,
  ROUND(percentile(l_extendedprice, 0.25), 6) AS p25,
  ROUND(percentile(l_extendedprice, 0.50), 6) AS p50,
  ROUND(percentile(l_extendedprice, 0.75), 6) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // octet_length(text) IS the UTF-8 byte length (DuckDB needed an
    // explicit encode() to BLOB first)
    "q49_multimodal_features" -> """
SELECT lang, COUNT(*) n_media,
       CAST(SUM(octet_length(text)) AS BIGINT) sum_bytes,
       COUNT(DISTINCT md5(text)) n_distinct_content,
       CAST(SUM(octet_length(text) DIV 100) AS BIGINT) sum_frames
FROM documents GROUP BY lang ORDER BY lang""",

    // collect_list is order-nondeterministic; sort_array makes the
    // result canonical exactly like DuckDB's list_sort(list(...))
    "q54_array_funcs" -> """
WITH t AS (SELECT l_returnflag, l_linestatus FROM lineitem GROUP BY 1, 2)
SELECT l_returnflag,
  array_join(sort_array(collect_list(l_linestatus)), ',') AS statuses,
  CAST(size(collect_list(l_linestatus)) AS BIGINT) AS n_statuses,
  array_contains(collect_list(l_linestatus), 'F') AS has_f
FROM t GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q70_gap_fill" -> """
WITH e AS (SELECT user_id, date_trunc('hour', ts) h FROM events WHERE user_id <= 3),
hourly AS (SELECT user_id, h, COUNT(*) n FROM e GROUP BY 1, 2),
b AS (SELECT user_id, min(h) h0, max(h) h1 FROM hourly GROUP BY 1),
grid AS (SELECT user_id, explode(sequence(h0, h1, INTERVAL 1 HOUR)) h FROM b),
f AS (SELECT g.user_id, g.h, COALESCE(n, 0) n
      FROM grid g LEFT JOIN hourly ON hourly.user_id = g.user_id AND hourly.h = g.h)
SELECT user_id, h, n,
  COALESCE(LAST_VALUE(CASE WHEN n > 0 THEN n END) IGNORE NULLS
           OVER (PARTITION BY user_id ORDER BY h), 0) carried
FROM f ORDER BY user_id, h LIMIT 200""",

    "q104_snapshot_diff" -> """
WITH d AS (SELECT doc_id, text FROM documents),
o AS (SELECT doc_id, md5(COALESCE(text, chr(0))) h FROM d
      WHERE md5('old:' || CAST(doc_id AS STRING)) < 'e'),
n AS (SELECT doc_id, md5(COALESCE(CASE WHEN md5('edit:' || CAST(doc_id AS STRING)) < '2'
        THEN text || ' v2' ELSE text END, chr(0))) h
      FROM d WHERE md5('new:' || CAST(doc_id AS STRING)) < 'e'),
j AS (SELECT CASE WHEN o.h IS NULL THEN 'added' WHEN n.h IS NULL THEN 'removed'
        WHEN o.h <> n.h THEN 'changed' ELSE 'unchanged' END status
      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
SELECT status, COUNT(*) AS n FROM j GROUP BY status ORDER BY status""",

    "q106_bpe_merges" -> """
WITH w AS (SELECT t AS word, COUNT(*) n
           FROM (SELECT tok AS t FROM documents
                 LATERAL VIEW explode(split(lower(text), ' ')) e AS tok)
           WHERE t != '' GROUP BY t),
p AS (SELECT substr(word, CAST(i AS INT), 2) pair, n
      FROM (SELECT * FROM w WHERE length(word) >= 2)
      LATERAL VIEW explode(sequence(1, length(word) - 1)) u AS i)
SELECT pair, CAST(SUM(n) AS BIGINT) AS freq
FROM p GROUP BY pair ORDER BY freq DESC, pair LIMIT 20""",

    "q121_dml_roundtrip" -> """
WITH survivors AS (SELECT doc_id, text, lang, source,
        CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
      FROM documents WHERE lang != 'de'),
src AS (SELECT doc_id, text, lang, source, n_chars * 2 AS n_chars
        FROM documents WHERE doc_id % 7 = 3),
final AS (SELECT * FROM src UNION ALL SELECT * FROM survivors WHERE doc_id % 7 != 3)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
  CAST(SUM(length(text)) AS BIGINT) AS sum_len
FROM final GROUP BY lang ORDER BY lang""",

    "q141_mv_incremental" -> """
WITH survivors AS (SELECT doc_id, text, lang, source,
        CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
      FROM documents WHERE lang != 'de'),
src AS (SELECT doc_id, text, lang, source, n_chars * 2 AS n_chars
        FROM documents WHERE doc_id % 7 = 3),
final AS (SELECT * FROM src UNION ALL SELECT * FROM survivors WHERE doc_id % 7 != 3)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
  CAST(SUM(length(text)) AS BIGINT) AS sum_len
FROM final GROUP BY lang ORDER BY lang""",

    "q163_quality_length_grid" -> """
WITH d AS (SELECT n_chars, filter(split(lower(text), ' '), x -> x != '') toks FROM documents),
t AS (SELECT n_chars DIV 64 len_block,
        CAST(size(array_distinct(toks)) AS BIGINT) * 1000000 DIV size(toks) DIV 100000 q_bucket
      FROM d WHERE size(toks) > 0),
grid AS (SELECT len_block, q_bucket, COUNT(*) n_docs FROM t GROUP BY len_block, q_bucket),
tot AS (SELECT len_block, COUNT(*) block_total FROM t GROUP BY len_block)
SELECT g.len_block, g.q_bucket, g.n_docs,
  CAST(g.n_docs * 1000000 DIV tt.block_total AS BIGINT) block_share_ppm
FROM grid g JOIN tot tt ON tt.len_block = g.len_block
ORDER BY g.len_block, g.q_bucket""",

    "q181_order_fill_profile" -> """
WITH per_o AS (SELECT l_orderkey, COUNT(*) n_lines,
    SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) rev_d
  FROM lineitem GROUP BY l_orderkey),
tot AS (SELECT COUNT(*) n_orders_tot, SUM(rev_d) tot_d FROM per_o)
SELECT n_lines, COUNT(*) n_orders,
  CAST(SUM(rev_d) AS DOUBLE) net_revenue,
  CAST(COUNT(*) * 1000000 DIV tot.n_orders_tot AS BIGINT) order_share_ppm,
  CAST(CAST(SUM(rev_d) * 10000 AS DECIMAL(19,0)) * 1000000 DIV CAST(tot.tot_d * 10000 AS DECIMAL(19,0)) AS BIGINT) revenue_share_ppm
FROM per_o CROSS JOIN tot
GROUP BY n_lines, tot.n_orders_tot, tot.tot_d ORDER BY n_lines""",

    "q188_priority_mix_drift" -> """
WITH mix AS (SELECT CAST(year(o_orderdate) AS BIGINT) y, o_orderpriority pri, COUNT(*) n
  FROM orders GROUP BY y, pri),
yr AS (SELECT y, CAST(SUM(n) AS BIGINT) y_n FROM mix GROUP BY y),
shares AS (SELECT m.y, m.pri, m.n, CAST(m.n * 1000000 DIV yr.y_n AS BIGINT) share_ppm
  FROM mix m JOIN yr ON yr.y = m.y),
y0 AS (SELECT MIN(y) y0 FROM shares),
base AS (SELECT pri, share_ppm base_share_ppm FROM shares CROSS JOIN y0 WHERE y = y0.y0)
SELECT s.y AS `year`, s.pri o_orderpriority, s.n n_orders, s.share_ppm,
  CAST(s.share_ppm - b.base_share_ppm AS BIGINT) drift_ppm
FROM shares s JOIN base b ON b.pri = s.pri
ORDER BY `year`, o_orderpriority""",

    "q191_active_streaks" -> """
WITH days AS (SELECT DISTINCT user_id,
    CAST(datediff(CAST(date_trunc('day', ts) AS DATE), DATE '1970-01-01') AS BIGINT) d
  FROM events),
runs AS (SELECT user_id, d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) island FROM days),
lens AS (SELECT user_id, island, COUNT(*) len FROM runs GROUP BY user_id, island),
best AS (SELECT user_id, CAST(MAX(len) AS BIGINT) best FROM lens GROUP BY user_id),
tot AS (SELECT COUNT(*) n_users_tot FROM best)
SELECT best streak_days, COUNT(*) n_users,
  CAST(COUNT(*) * 1000000 DIV tot.n_users_tot AS BIGINT) user_share_ppm
FROM best CROSS JOIN tot GROUP BY best, tot.n_users_tot ORDER BY streak_days""",

    "q210_sign_agreement" -> """
WITH x AS (SELECT label, vec_id, CAST(i AS INT) pos,
    element_at(embedding, CAST(i AS INT)) x
  FROM embeddings LATERAL VIEW explode(sequence(1, 64)) r AS i),
ref AS (SELECT label, pos, SUM(CAST(x AS DECIMAL(18,9))) >= 0 ref_pos
  FROM x GROUP BY label, pos),
agree AS (SELECT x.label, x.vec_id,
    CAST(SUM(CASE WHEN (x.x >= 0) = r.ref_pos THEN 1 ELSE 0 END) AS BIGINT) n_agree
  FROM x JOIN ref r ON r.label = x.label AND r.pos = x.pos
  GROUP BY x.label, x.vec_id)
SELECT label, n_agree DIV 8 band, COUNT(*) n_vecs,
  CAST(MIN(n_agree) AS BIGINT) min_agree, CAST(MAX(n_agree) AS BIGINT) max_agree
FROM agree GROUP BY label, band ORDER BY label, band""",

    // arg_min maps to min_by
    "q211_copy_direction" -> """
WITH toks AS (
  SELECT doc_id, source, tok FROM documents
  LATERAL VIEW explode(split(LOWER(text), ' ')) e AS tok),
sig AS (
  SELECT doc_id, source,
         MIN(MD5(tok)) h1, MIN(MD5('a' || tok)) h2, MIN(MD5('b' || tok)) h3
  FROM toks WHERE tok != '' GROUP BY doc_id, source),
grp AS (SELECT h1, h2, h3, COUNT(*) n, MIN(doc_id) rep,
    min_by(source, doc_id) src_from
  FROM sig GROUP BY h1, h2, h3 HAVING COUNT(*) > 1)
SELECT g.src_from, s.source src_to, COUNT(*) n_copies,
  COUNT(DISTINCT g.rep) n_groups
FROM sig s JOIN grp g ON g.h1 = s.h1 AND g.h2 = s.h2 AND g.h3 = s.h3
WHERE s.doc_id <> g.rep
GROUP BY g.src_from, s.source ORDER BY src_from, src_to""",

    "q228_supplier_loyalty" -> """
WITH per AS (SELECT o_custkey,
    COUNT(DISTINCT l_orderkey) n_orders, COUNT(*) n_lines,
    COUNT(DISTINCT l_suppkey) n_supp
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY o_custkey HAVING COUNT(DISTINCT l_orderkey) >= 2),
r AS (SELECT c_mktsegment, n_lines,
    (n_lines - n_supp) * 1000000 DIV n_lines reuse_ppm
  FROM per JOIN customer ON c_custkey = o_custkey)
SELECT c_mktsegment, COUNT(*) n_customers, CAST(SUM(n_lines) AS BIGINT) n_lines,
  CAST(MIN(reuse_ppm) AS BIGINT) min_reuse_ppm,
  CAST(MAX(reuse_ppm) AS BIGINT) max_reuse_ppm
FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q232_diurnal_distance" -> """
WITH th AS (SELECT event_type, hour(ts) h, COUNT(*) n_th FROM events GROUP BY event_type, h),
tt AS (SELECT event_type, CAST(SUM(n_th) AS BIGINT) n_t FROM th GROUP BY event_type),
hours AS (SELECT DISTINCT h FROM th),
prof AS (SELECT tt.event_type, hours.h,
    CAST(COALESCE(th.n_th, 0) * 1000000 DIV tt.n_t AS BIGINT) ppm
  FROM tt CROSS JOIN hours
  LEFT JOIN th ON th.event_type = tt.event_type AND th.h = hours.h)
SELECT a.event_type t1, b.event_type t2,
  CAST(SUM(abs(a.ppm - b.ppm)) DIV 2 AS BIGINT) tv_ppm
FROM prof a JOIN prof b ON b.h = a.h AND a.event_type < b.event_type
GROUP BY t1, t2 ORDER BY t1, t2""",

    "q65_repetition" -> """
WITH d AS (SELECT doc_id, split(lower(text), ' ') l FROM documents),
t AS (SELECT doc_id, size(l) nt, size(array_distinct(l)) nd FROM d WHERE size(l) >= 2),
i AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 2)
      LATERAL VIEW explode(sequence(1, size(l) - 1)) e AS i),
bg AS (SELECT doc_id, element_at(l, i) || ' ' || element_at(l, i + 1) bg FROM i),
bc AS (SELECT doc_id, bg, COUNT(*) c FROM bg GROUP BY doc_id, bg),
tb AS (SELECT doc_id, MAX(c) maxc, SUM(c) tot FROM bc GROUP BY doc_id)
SELECT t.doc_id, t.nt n_tokens,
  CAST(ROUND(1 - CAST(nd AS DOUBLE) / nt, 6) AS DOUBLE) dup_word_frac,
  CAST(ROUND(CAST(maxc AS DOUBLE) / tot, 6) AS DOUBLE) top_bigram_frac
FROM t JOIN tb ON tb.doc_id = t.doc_id
ORDER BY t.doc_id LIMIT 25""",

    "q67_contamination" -> """
WITH d AS (SELECT doc_id, source, split(lower(text), ' ') l FROM documents),
s AS (SELECT doc_id, source, i, l FROM (SELECT * FROM d WHERE size(l) >= 5)
      LATERAL VIEW explode(sequence(1, size(l) - 4)) e AS i),
sh AS (SELECT DISTINCT doc_id, source,
         concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2),
                   element_at(l, i + 3), element_at(l, i + 4)) sh
       FROM s),
ev AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0'),
cont AS (SELECT DISTINCT sh.doc_id FROM sh WHERE source != 'src0' AND sh IN (SELECT sh FROM ev))
SELECT d.source, COUNT(*) AS n_train_docs,
  CAST(SUM(CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
FROM d LEFT JOIN cont ON d.doc_id = cont.doc_id
WHERE d.source != 'src0'
GROUP BY d.source ORDER BY d.source""",

    "q103_concat_packing" -> """
WITH d AS (SELECT doc_id, source,
  size(filter(split(lower(text), ' '), x -> x != '')) n FROM documents),
p AS (SELECT source, n,
  CAST(COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
  FROM d WHERE n > 0),
g AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS toks,
  CAST(SUM(CASE WHEN st DIV 512 < (st + n - 1) DIV 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
  FROM p GROUP BY source)
SELECT source, n_docs, toks, (toks + 511) DIV 512 AS n_bins, n_split_docs,
  (toks - ((toks + 511) DIV 512 - 1) * 512) * 1000000 DIV 512 AS tail_fill_ppm
FROM g ORDER BY source""",

    "q116_intradoc_repeat" -> """
WITH d AS (SELECT doc_id, source, filter(split(lower(text), ' '), x -> x != '') l FROM documents),
s AS (SELECT doc_id, source, i, l FROM (SELECT * FROM d WHERE size(l) >= 2)
      LATERAL VIEW explode(sequence(1, size(l) - 1)) e AS i),
bg AS (SELECT doc_id, source, element_at(l, i) || ' ' || element_at(l, i + 1) g FROM s),
c AS (SELECT doc_id, source, g, COUNT(*) c FROM bg GROUP BY ALL),
pd AS (SELECT doc_id, source, SUM(c) tot, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) dup FROM c GROUP BY ALL)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(tot) AS BIGINT) AS total_bigrams,
  CAST(SUM(dup) AS BIGINT) AS dup_bigrams,
  CAST(SUM(dup) * 1000000 DIV SUM(tot) AS BIGINT) AS dup_ppm
FROM pd GROUP BY source ORDER BY source""",

    "q119_stopword_scrub" -> """
WITH d AS (SELECT source, filter(split(lower(text), ' '), x -> x != '') l FROM documents),
sc AS (SELECT source, size(l) nt,
        length(array_join(l, ' ')) len_orig,
        filter(l, x -> x NOT IN ('the', 'a')) kept FROM d),
pd AS (SELECT source, nt, nt - size(kept) removed,
        len_orig - length(array_join(kept, ' ')) chars_removed FROM sc)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_toks,
  CAST(SUM(removed) AS BIGINT) AS toks_removed,
  CAST(SUM(chars_removed) AS BIGINT) AS chars_removed,
  CAST(SUM(removed) * 1000000 DIV SUM(nt) AS BIGINT) AS removed_ppm
FROM pd GROUP BY source ORDER BY source""",

    "q180_tax_discount_grid" -> """
WITH li AS (SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) disc_pct,
    CAST(ROUND(l_tax * 100, 0) AS BIGINT) tax_pct,
    CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) net_d,
    CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * CAST(l_tax AS DECIMAL(4,2)) tax_d
  FROM lineitem)
SELECT disc_pct, tax_pct, COUNT(*) n_items,
  CAST(SUM(net_d) AS DOUBLE) net_revenue,
  CAST(SUM(tax_d) AS DOUBLE) tax_collected,
  CAST(CAST(SUM(tax_d) * 1000000 AS DECIMAL(25,0)) * 1000000 DIV CAST(SUM(net_d) * 1000000 AS DECIMAL(25,0)) AS BIGINT) effective_tax_ppm
FROM li GROUP BY disc_pct, tax_pct ORDER BY disc_pct, tax_pct""",

    "q194_trend_persistence" -> """
WITH e AS (SELECT event_id, user_id, event_type, value, unix_micros(ts) us FROM events),
p AS (SELECT event_type, value,
    LAG(value) OVER (PARTITION BY user_id ORDER BY us, event_id) prev
  FROM e)
SELECT event_type, COUNT(*) n_pairs,
  CAST(SUM(CASE WHEN value > prev THEN 1 ELSE 0 END) AS BIGINT) n_up,
  CAST(SUM(CASE WHEN value < prev THEN 1 ELSE 0 END) AS BIGINT) n_down,
  CAST(CAST(SUM(CASE WHEN value > prev THEN 1 ELSE 0 END) AS BIGINT) * 1000000 DIV COUNT(*) AS BIGINT) up_ppm,
  CAST(CAST(SUM(CASE WHEN value < prev THEN 1 ELSE 0 END) AS BIGINT) * 1000000 DIV COUNT(*) AS BIGINT) down_ppm
FROM p WHERE prev IS NOT NULL
GROUP BY event_type ORDER BY event_type""",

    "q199_dual_sourcing" -> """
WITH ps AS (SELECT l_partkey, l_suppkey,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) sc
  FROM lineitem GROUP BY l_partkey, l_suppkey),
per AS (SELECT l_partkey, COUNT(*) n_suppliers,
    CAST(SUM(sc) AS BIGINT) pc, CAST(MAX(sc) AS BIGINT) mx
  FROM ps GROUP BY l_partkey),
dec AS (SELECT n_suppliers, mx * 1000000 DIV pc DIV 100000 top_share_decile, pc FROM per)
SELECT n_suppliers, CAST(top_share_decile AS BIGINT) top_share_decile,
  COUNT(*) n_parts, CAST(SUM(pc) AS BIGINT) cents4
FROM dec GROUP BY n_suppliers, top_share_decile
ORDER BY n_suppliers, top_share_decile""",

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
  CAST(SUM(abs(n_tb * 1000000 DIV n_t - n_b * 1000000 DIV n)) DIV 2 AS BIGINT) tv_ppm
FROM grid CROSS JOIN g
GROUP BY event_type, n_t ORDER BY event_type""",

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
  CAST(SUM(esc) * 1000000 DIV COUNT(*) AS BIGINT) esc_ppm,
  CAST(SUM(de) * 1000000 DIV COUNT(*) AS BIGINT) de_ppm
FROM tr JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

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
  CAST(b.n * 1000000 DIV t.nt AS BIGINT) share_ppm
FROM banded b JOIN tot t ON t.n_name = b.n_name AND t.role = b.role
ORDER BY b.n_name, b.role, b.band""",

    // Spark datediff(end, start); DuckDB datediff('day', start, end)
    "q243_order_overlap" -> """
WITH per AS (SELECT o_custkey, o_orderkey, o_orderdate, MAX(l_shipdate) last_ship
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY o_custkey, o_orderkey, o_orderdate),
lagd AS (SELECT o_custkey, o_orderdate,
    LAG(last_ship) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) prev_ship
  FROM per),
p AS (SELECT o_custkey,
    CASE WHEN prev_ship > o_orderdate THEN 1 ELSE 0 END ov
  FROM lagd WHERE prev_ship IS NOT NULL)
SELECT c_mktsegment, COUNT(*) n_pairs, CAST(SUM(ov) AS BIGINT) n_overlap,
  CAST(SUM(ov) * 1000000 DIV COUNT(*) AS BIGINT) overlap_ppm
FROM p JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q245_reciprocal_trade" -> """
WITH m AS (SELECT cn.n_name cnat, sn.n_name snat,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) DIV 100 AS BIGINT) rev
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer c ON c.c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN supplier s ON s.s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  GROUP BY cnat, snat)
SELECT f.cnat a, f.snat b, f.rev rev_ab, r.rev rev_ba,
  CAST(abs(f.rev - r.rev) * 1000000 DIV (f.rev + r.rev) AS BIGINT) asym_ppm
FROM m f JOIN m r ON r.cnat = f.snat AND r.snat = f.cnat
WHERE f.cnat < f.snat ORDER BY a, b""",

    "q246_dormancy_revival" -> """
WITH lagd AS (SELECT o_custkey, o_orderdate,
    LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) prev_d
  FROM orders),
g AS (SELECT o_custkey, datediff(o_orderdate, prev_d) gap
  FROM lagd WHERE prev_d IS NOT NULL),
per AS (SELECT o_custkey, COUNT(*) n_gaps, MAX(gap) max_gap,
    CAST(SUM(CASE WHEN gap >= 365 THEN 1 ELSE 0 END) AS BIGINT) n_dormant
  FROM g GROUP BY o_custkey)
SELECT c_mktsegment, COUNT(*) n_customers,
  CAST(SUM(CASE WHEN n_dormant >= 1 THEN 1 ELSE 0 END) AS BIGINT) n_revived,
  CAST(SUM(CASE WHEN n_dormant >= 1 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) revived_ppm,
  CAST(MAX(max_gap) AS BIGINT) max_gap_days
FROM per JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q80_tfidf_topterm" -> """
WITH tk AS (SELECT doc_id, tok FROM documents
            LATERAL VIEW explode(filter(split(lower(text), ' '), x -> x != '')) t AS tok),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk GROUP BY doc_id, tok),
dl AS (SELECT doc_id, COUNT(*) AS len FROM tk GROUP BY doc_id),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tk GROUP BY tok),
sc AS (SELECT tf.doc_id, tf.tok, tf.tf * 1000000000 DIV (dl.len * df.df) AS score
       FROM tf JOIN dl USING (doc_id) JOIN df USING (tok)),
top AS (SELECT doc_id, tok,
          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rn
        FROM sc)
SELECT tok AS term, COUNT(*) AS n_docs_top
FROM top WHERE rn = 1
GROUP BY tok ORDER BY n_docs_top DESC, term LIMIT 20""",

    "q88_bigram_lm" -> """
WITH d AS (SELECT filter(split(lower(text), ' '), x -> x != '') l FROM documents),
p AS (SELECT i, l FROM (SELECT * FROM d WHERE size(l) >= 2)
      LATERAL VIEW explode(sequence(1, size(l) - 1)) e AS i),
bg AS (SELECT element_at(l, i) tok, element_at(l, i + 1) nxt FROM p),
cnt AS (SELECT tok, nxt, COUNT(*) c FROM bg GROUP BY tok, nxt),
tot AS (SELECT tok, CAST(SUM(c) AS BIGINT) t FROM cnt GROUP BY tok),
top AS (SELECT tok, nxt, c, ROW_NUMBER() OVER (PARTITION BY tok ORDER BY c DESC, nxt) rn FROM cnt)
SELECT tot.tok AS tok, tot.t AS n_follow, top.nxt AS top_next,
  CAST(top.c AS BIGINT) AS top_c,
  CAST(CAST(top.c AS DECIMAL(38,0)) * 1000000 DIV tot.t AS BIGINT) AS p_ppm
FROM tot JOIN top ON top.tok = tot.tok AND top.rn = 1
ORDER BY n_follow DESC, tok LIMIT 20""",

    "q155_head_tail_overlap" -> """
WITH d AS (SELECT source, filter(split(lower(text), ' '), x -> x != '') toks FROM documents),
h AS (SELECT source,
        slice(toks, 1, size(toks) DIV 2) h,
        slice(toks, size(toks) DIV 2 + 1, size(toks) - size(toks) DIV 2) t2
      FROM d WHERE size(toks) >= 2),
j AS (SELECT source,
        CAST(size(array_distinct(h)) AS BIGINT) nh,
        CAST(size(array_distinct(t2)) AS BIGINT) ntl,
        CAST(size(array_distinct(concat(h, t2))) AS BIGINT) un
      FROM h),
x AS (SELECT source, (nh + ntl - un) * 1000000 DIV un AS jacc FROM j)
SELECT source, COUNT(*) n_docs,
  CAST(SUM(jacc) DIV COUNT(*) AS BIGINT) mean_jacc_ppm,
  CAST(SUM(CASE WHEN jacc >= 500000 THEN 1 ELSE 0 END) AS BIGINT) n_high_overlap
FROM x GROUP BY source ORDER BY source""",

    "q157_cross_lang_leakage" -> """
WITH d AS (SELECT lang, filter(split(lower(text), ' '), x -> x != '') t FROM documents),
s AS (SELECT lang, i, t FROM (SELECT * FROM d WHERE size(t) >= 3)
      LATERAL VIEW explode(sequence(1, size(t) - 2)) e AS i),
sl AS (SELECT DISTINCT lang,
         concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)) sh
       FROM s),
vocab AS (SELECT lang, COUNT(*) v FROM sl GROUP BY lang),
pairs AS (SELECT a.lang lang_a, b.lang lang_b, COUNT(*) n_shared
          FROM sl a JOIN sl b ON a.sh = b.sh AND a.lang < b.lang
          GROUP BY a.lang, b.lang)
SELECT p.lang_a, p.lang_b, p.n_shared,
  CAST(p.n_shared * 1000000 DIV LEAST(va.v, vb.v) AS BIGINT) leak_ppm
FROM pairs p JOIN vocab va ON va.lang = p.lang_a
JOIN vocab vb ON vb.lang = p.lang_b
ORDER BY p.lang_a, p.lang_b""",

    "q174_source_concentration" -> """
WITH by_src AS (SELECT source, COUNT(*) n_docs, CAST(SUM(n_chars) AS BIGINT) chars
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(chars) AS BIGINT) tot FROM by_src),
shares AS (SELECT source, n_docs, chars,
    CAST(chars * 1000000 DIV tot.tot AS BIGINT) share_ppm FROM by_src CROSS JOIN tot),
hhi AS (SELECT CAST(CAST(SUM(share_ppm * share_ppm) AS BIGINT) DIV 1000000 AS BIGINT) hhi_ppm FROM shares)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY share_ppm DESC, source) AS BIGINT) rank,
  source, n_docs, chars n_chars, share_ppm,
  CAST(SUM(share_ppm) OVER (ORDER BY share_ppm DESC, source
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum_share_ppm,
  hhi.hhi_ppm
FROM shares CROSS JOIN hhi ORDER BY rank""",

    "q202_doc_meta_audit" -> """
WITH d AS (SELECT lang, n_chars, CAST(length(text) AS BIGINT) real_chars,
    CAST(size(split(text, ' ')) AS BIGINT) n_words FROM documents),
g AS (SELECT lang, COUNT(*) n_docs,
    CAST(SUM(CASE WHEN n_chars != real_chars THEN 1 ELSE 0 END) AS BIGINT) n_meta_mismatch,
    CAST(MAX(abs(n_chars - real_chars)) AS BIGINT) max_meta_diff,
    CAST(SUM(n_words) AS BIGINT) words_total,
    CAST(MAX(n_words) AS BIGINT) words_max,
    CAST(SUM(real_chars) AS BIGINT) chars_total
  FROM d GROUP BY lang)
SELECT lang, n_docs, n_meta_mismatch, max_meta_diff, words_total, words_max,
  CAST(words_total DIV n_docs AS BIGINT) words_per_doc,
  CAST(chars_total * 1000000 DIV words_total AS BIGINT) chars_per_word_ppm
FROM g ORDER BY lang""",

    "q220_unit_price_audit" -> """
WITH pu AS (SELECT l_partkey,
    COUNT(DISTINCT CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 DIV CAST(l_quantity AS BIGINT)) nu,
    MIN(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 DIV CAST(l_quantity AS BIGINT)) umin,
    MAX(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 DIV CAST(l_quantity AS BIGINT)) umax
  FROM lineitem GROUP BY l_partkey)
SELECT p_brand, COUNT(*) n_parts,
  CAST(SUM(CASE WHEN nu = 1 THEN 1 ELSE 0 END) AS BIGINT) n_consistent,
  CAST(MAX(nu) AS BIGINT) max_prices,
  CAST(MAX((umax - umin) * 1000000 DIV umin) AS BIGINT) max_rel_spread_ppm
FROM pu JOIN part ON p_partkey = l_partkey
GROUP BY p_brand ORDER BY p_brand""",

    "q239_hhi_drift" -> """
WITH ys AS (SELECT CAST(year(l_shipdate) AS BIGINT) y, l_suppkey,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) sc
  FROM lineitem GROUP BY y, l_suppkey),
yt AS (SELECT y, CAST(SUM(sc) AS BIGINT) yc, COUNT(*) n_suppliers FROM ys GROUP BY y),
hhi AS (SELECT ys.y, yt.n_suppliers,
    CAST(SUM((ys.sc * 1000000 DIV yt.yc) * (ys.sc * 1000000 DIV yt.yc)) DIV 1000000 AS BIGINT) hhi_ppm
  FROM ys JOIN yt ON yt.y = ys.y GROUP BY ys.y, yt.n_suppliers),
d AS (SELECT y, n_suppliers, hhi_ppm,
    LAG(hhi_ppm) OVER (ORDER BY y) prev FROM hhi)
SELECT y, n_suppliers, hhi_ppm,
  CAST(hhi_ppm - COALESCE(prev, hhi_ppm) AS BIGINT) delta_ppm
FROM d ORDER BY y""",

    "q251_seasonal_peak" -> """
WITH bq AS (SELECT p_brand, CAST(quarter(l_shipdate) AS BIGINT) qoy,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) qc
  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY p_brand, qoy),
tot AS (SELECT p_brand, CAST(SUM(qc) AS BIGINT) tc FROM bq GROUP BY p_brand),
mx AS (SELECT p_brand, CAST(MAX(qc) AS BIGINT) mc FROM bq GROUP BY p_brand),
pk AS (SELECT bq.p_brand, m.mc, MIN(qoy) peak_q
  FROM bq JOIN mx m ON m.p_brand = bq.p_brand WHERE bq.qc = m.mc
  GROUP BY bq.p_brand, m.mc)
SELECT p.p_brand, p.peak_q, CAST(p.mc * 1000000 DIV t.tc AS BIGINT) peak_ppm
FROM pk p JOIN tot t ON t.p_brand = p.p_brand ORDER BY p.p_brand""",

    "q268_size_profile" -> """
WITH sc AS (SELECT p_brand, CAST(p_size AS BIGINT) AS sz, COUNT(*) AS c
  FROM part GROUP BY p_brand, sz),
tot AS (SELECT p_brand, CAST(SUM(c) AS BIGINT) AS n_parts, COUNT(*) AS n_sizes,
    CAST(MIN(sz) AS BIGINT) AS min_size, CAST(MAX(sz) AS BIGINT) AS max_size
  FROM sc GROUP BY p_brand),
mx AS (SELECT p_brand, CAST(MAX(c) AS BIGINT) AS mc FROM sc GROUP BY p_brand),
modal AS (SELECT sc.p_brand, mx.mc, MIN(sz) AS modal_size
  FROM sc JOIN mx ON mx.p_brand = sc.p_brand WHERE sc.c = mx.mc
  GROUP BY sc.p_brand, mx.mc)
SELECT t.p_brand, t.n_parts, t.n_sizes, t.min_size, t.max_size,
  m.modal_size, CAST(m.mc * 1000000 DIV t.n_parts AS BIGINT) AS modal_ppm
FROM tot t JOIN modal m ON m.p_brand = t.p_brand ORDER BY t.p_brand""",

    // DuckDB's ordered string_agg maps to array_join over a
    // struct-sorted collect_list (array_sort orders by the leading
    // field, the bit position)
    "q41_dedup_simhash" -> """
WITH t AS (SELECT doc_id, tok FROM documents
           LATERAL VIEW explode(split(lower(text), ' ')) e AS tok
           WHERE tok != ''),
bits AS (SELECT doc_id, tok, b FROM t
         LATERAL VIEW explode(sequence(1, 16)) s AS b),
contrib AS (SELECT doc_id, b,
  CASE WHEN instr('0123456789abcdef', substr(md5(tok), b, 1)) - 1 >= 8 THEN 1 ELSE -1 END c
  FROM bits),
bitsum AS (SELECT doc_id, b, SUM(c) s FROM contrib GROUP BY doc_id, b),
sig AS (SELECT doc_id,
  array_join(transform(array_sort(collect_list(struct(b,
    CASE WHEN s > 0 THEN '1' ELSE '0' END AS bit))), x -> x.bit), '') sg
  FROM bitsum GROUP BY doc_id),
grp AS (SELECT sg, COUNT(*) n FROM sig GROUP BY sg)
SELECT COUNT(*) n_groups, CAST(SUM(n) AS BIGINT) n_docs,
       CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) n_near_dupes
FROM grp""",

    "q45_lang_id" -> """
WITH t AS (SELECT doc_id, lang, tok FROM documents
           LATERAL VIEW explode(split(lower(text), ' ')) e AS tok
           WHERE tok != ''),
profile AS (SELECT lang pl, tok ptok, COUNT(*) c FROM t GROUP BY lang, tok),
tot AS (SELECT lang plang, COUNT(*) tc FROM t GROUP BY lang),
scored AS (
  SELECT t.doc_id, t.lang, tot.plang, SUM((COALESCE(p.c, 0) * 1000000) DIV tot.tc) score
  FROM t CROSS JOIN tot
  LEFT JOIN profile p ON p.pl = tot.plang AND p.ptok = t.tok
  GROUP BY t.doc_id, t.lang, tot.plang),
pred AS (SELECT doc_id, lang, plang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) rn FROM scored)
SELECT lang, plang AS pred_lang, COUNT(*) n FROM pred WHERE rn = 1
GROUP BY lang, plang ORDER BY lang, pred_lang""",

    "q98_attribution" -> """
WITH w AS (SELECT user_id, ts, event_type, event_id,
        MAX(CASE WHEN event_type = 'view' THEN ts END)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) last_view
      FROM events)
SELECT unix_micros(ts) DIV 86400000000 AS day,
  COUNT(*) AS n_purchases,
  CAST(SUM(CASE WHEN last_view IS NOT NULL
      AND unix_micros(ts) - unix_micros(last_view) <= 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS attributed,
  CAST(SUM(CASE WHEN last_view IS NOT NULL
      AND unix_micros(ts) - unix_micros(last_view) <= 86400000000
      THEN (unix_micros(ts) - unix_micros(last_view)) DIV 60000000 ELSE 0 END) AS BIGINT) AS attr_latency_min
FROM w WHERE event_type = 'purchase'
GROUP BY day ORDER BY day""",

    "q130_temperature_mix" -> """
WITH t AS (SELECT source,
             CAST(SUM(size(filter(split(lower(text), ' '), x -> x != ''))) AS BIGINT) AS toks
           FROM documents GROUP BY source),
r AS (SELECT source, toks,
        CAST(CAST(ROUND(SQRT(CAST(toks AS DOUBLE)), 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT) micro
      FROM t),
tot AS (SELECT SUM(toks) tt, SUM(micro) tm FROM r),
p AS (SELECT source, toks,
        CAST(CAST(toks AS DECIMAL(38,0)) * 1000000 DIV tot.tt AS BIGINT) natural_ppm,
        CAST(CAST(micro AS DECIMAL(38,0)) * 1000000 DIV tot.tm AS BIGINT) tempered_ppm
      FROM r CROSS JOIN tot)
SELECT source, toks, natural_ppm, tempered_ppm,
  CAST(tempered_ppm * 100 DIV NULLIF(natural_ppm, 0) AS BIGINT) AS boost_pct
FROM p ORDER BY source""",

    "q147_equi_depth_hist" -> """
WITH src AS (
  SELECT 'l_quantity' AS col_name, CAST(l_quantity AS BIGINT) AS v FROM lineitem
  UNION ALL
  SELECT 'p_size', CAST(p_size AS BIGINT) FROM part),
vc AS (SELECT col_name, v, COUNT(*) AS c FROM src GROUP BY ALL),
cu AS (SELECT col_name, v, c,
         SUM(c) OVER (PARTITION BY col_name ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_ex,
         SUM(c) OVER (PARTITION BY col_name) AS total
       FROM vc),
b AS (SELECT col_name, COALESCE(cum_ex, 0) * 8 DIV total AS bucket, v, c FROM cu)
SELECT col_name, CAST(bucket AS BIGINT) AS bucket, MIN(v) AS lo, MAX(v) AS hi,
  CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_distinct
FROM b GROUP BY col_name, bucket ORDER BY col_name, bucket""",

    "q156_gram_diversity" -> """
WITH d AS (SELECT source, filter(split(lower(text), ' '), x -> x != '') l FROM documents),
g AS (SELECT source, l FROM d WHERE size(l) >= 3),
tt AS (SELECT source, COUNT(*) n_docs, SUM(size(l) - 2) total_grams FROM g GROUP BY source),
s AS (SELECT source, i, l FROM g
      LATERAL VIEW explode(sequence(1, size(l) - 2)) e AS i),
dg AS (SELECT DISTINCT source,
         concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) gram
       FROM s),
dc AS (SELECT source, COUNT(*) distinct_grams FROM dg GROUP BY source)
SELECT tt.source, tt.n_docs,
  CAST(tt.total_grams AS BIGINT) total_grams,
  CAST(dc.distinct_grams AS BIGINT) distinct_grams,
  CAST(dc.distinct_grams * 1000000 DIV tt.total_grams AS BIGINT) diversity_ppm
FROM tt JOIN dc ON dc.source = tt.source ORDER BY tt.source""",

    "q192_order_regularity" -> """
WITH o AS (SELECT o_custkey, o_orderkey,
    CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) d FROM orders),
g AS (SELECT o_custkey, d - LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) gap FROM o),
per_c AS (SELECT o_custkey, COUNT(*) n_orders,
    CAST(SUM(gap) AS BIGINT) gap_sum, COUNT(gap) n_gaps,
    CAST(MAX(gap) AS BIGINT) max_gap
  FROM g GROUP BY o_custkey),
banded AS (SELECT o_custkey, n_orders, max_gap,
    CASE WHEN n_gaps = 0 THEN -1 ELSE gap_sum DIV n_gaps DIV 30 END cadence_band
  FROM per_c)
SELECT CAST(cadence_band AS BIGINT) cadence_band, COUNT(*) n_customers,
  CAST(SUM(n_orders) AS BIGINT) n_orders,
  CAST(MAX(max_gap) AS INT) max_gap_days
FROM banded GROUP BY cadence_band ORDER BY cadence_band""",

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
  CAST(SUM(abs(rp - rr)) * 1000000 DIV (COUNT(*) * COUNT(*) DIV 2) AS BIGINT) footrule_ppm
FROM rk GROUP BY p_brand ORDER BY p_brand""",

    "q230_conditional_quantiles" -> """
WITH dq AS (SELECT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) d,
    CAST(l_quantity AS BIGINT) qty, COUNT(*) c
  FROM lineitem GROUP BY d, qty),
tot AS (SELECT d, CAST(SUM(c) AS BIGINT) n FROM dq GROUP BY d),
cum AS (SELECT dq.d, qty, CAST(SUM(c) OVER (PARTITION BY dq.d ORDER BY qty) AS BIGINT) cum,
    t.n FROM dq JOIN tot t ON t.d = dq.d),
q25 AS (SELECT d, MIN(qty) q25 FROM cum WHERE cum >= (n + 3) DIV 4 GROUP BY d),
q50 AS (SELECT d, MIN(qty) q50 FROM cum WHERE cum >= (n + 1) DIV 2 GROUP BY d),
q75 AS (SELECT d, MIN(qty) q75 FROM cum WHERE cum >= (3 * n + 3) DIV 4 GROUP BY d)
SELECT t.d, t.n, a.q25, b.q50, c.q75
FROM tot t JOIN q25 a ON a.d = t.d JOIN q50 b ON b.d = t.d JOIN q75 c ON c.d = t.d
ORDER BY t.d""",

    "q241_dedup_vocab_cost" -> """
WITH toks0 AS (SELECT doc_id, lang, tok FROM documents
               LATERAL VIEW explode(split(LOWER(text), ' ')) e AS tok),
sig AS (SELECT doc_id, lang,
    MIN(MD5(tok)) h1, MIN(MD5('a' || tok)) h2, MIN(MD5('b' || tok)) h3
  FROM toks0 WHERE tok != '' GROUP BY doc_id, lang),
keep AS (SELECT MIN(doc_id) doc_id FROM sig GROUP BY h1, h2, h3),
before AS (SELECT lang, COUNT(DISTINCT tok) vocab_before
  FROM toks0 WHERE tok != '' GROUP BY lang),
after AS (SELECT lang, COUNT(DISTINCT tok) vocab_after
  FROM toks0 JOIN keep USING (doc_id) WHERE tok != '' GROUP BY lang)
SELECT b.lang, b.vocab_before, a.vocab_after,
  CAST((b.vocab_before - a.vocab_after) * 1000000 DIV b.vocab_before AS BIGINT) lost_ppm
FROM before b JOIN after a ON a.lang = b.lang ORDER BY b.lang""",

    "q48_fingerprint" -> """
WITH d AS (SELECT doc_id, split(lower(text), ' ') l FROM documents),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) e AS i),
sh AS (SELECT DISTINCT doc_id,
         md5(concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2))) h
       FROM s),
rk AS (SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) rn FROM sh),
fp AS (SELECT doc_id, md5(concat(
         MAX(CASE WHEN rn=1 THEN h ELSE '' END), '|', MAX(CASE WHEN rn=2 THEN h ELSE '' END), '|',
         MAX(CASE WHEN rn=3 THEN h ELSE '' END), '|', MAX(CASE WHEN rn=4 THEN h ELSE '' END))) f
       FROM rk WHERE rn <= 4 GROUP BY doc_id),
grp AS (SELECT f, COUNT(*) n FROM fp GROUP BY f)
SELECT COUNT(*) n_fingerprints, CAST(SUM(n) AS BIGINT) n_docs,
       CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) n_shared
FROM grp""",

    "q94_winsorize" -> """
WITH f AS (SELECT l_returnflag flag,
    ROUND(percentile(l_extendedprice, 0.05), 6) lo,
    ROUND(percentile(l_extendedprice, 0.95), 6) hi
  FROM lineitem GROUP BY l_returnflag)
SELECT l.l_returnflag, f.lo, f.hi, COUNT(*) AS n,
  CAST(SUM(CASE WHEN l.l_extendedprice < f.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
  CAST(SUM(CASE WHEN l.l_extendedprice > f.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
  CAST(SUM(CASE WHEN l.l_extendedprice < f.lo THEN CAST(f.lo AS DECIMAL(18,6))
                WHEN l.l_extendedprice > f.hi THEN CAST(f.hi AS DECIMAL(18,6))
                ELSE CAST(l.l_extendedprice AS DECIMAL(18,6)) END) AS DOUBLE) AS wsum
FROM lineitem l JOIN f ON f.flag = l.l_returnflag
GROUP BY l.l_returnflag, f.lo, f.hi ORDER BY l.l_returnflag""",

    "q100_curation_pipeline" -> """
WITH rep AS (SELECT MIN(doc_id) doc_id FROM documents GROUP BY md5(text)),
u AS (SELECT d.* FROM documents d LEFT SEMI JOIN rep ON rep.doc_id = d.doc_id),
k AS (SELECT * FROM u WHERE substr(md5(CAST(doc_id AS STRING)), 1, 8) <= CASE source
  WHEN 'src0' THEN 'ffffffff' WHEN 'src1' THEN 'bfffffff'
  WHEN 'src2' THEN '7fffffff' WHEN 'src3' THEN '3fffffff'
  WHEN 'src4' THEN '19999999' ELSE '7fffffff' END),
s AS (SELECT *, CASE WHEN md5('s:' || CAST(doc_id AS STRING)) < 'c' THEN 'train'
                     WHEN md5('s:' || CAST(doc_id AS STRING)) < 'e' THEN 'val'
                     ELSE 'test' END split FROM k)
SELECT split, source, COUNT(*) AS n_docs,
  CAST(SUM(size(filter(split(lower(text), ' '), x -> x != ''))) AS BIGINT) AS toks
FROM s GROUP BY split, source ORDER BY split, source""",

    "q117_span_dedup" -> """
WITH d AS (SELECT doc_id, filter(split(lower(text), ' '), x -> x != '') l FROM documents),
tot AS (SELECT CAST(SUM(size(l)) AS BIGINT) total_tokens FROM d),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 8)
      LATERAL VIEW explode(sequence(1, size(l) - 7)) e AS i),
g AS (SELECT doc_id, i, array_join(slice(l, i, 8), ' ') gram FROM s),
dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
cov AS (SELECT DISTINCT doc_id, p FROM
        (SELECT doc_id, p FROM (SELECT doc_id, i FROM g LEFT SEMI JOIN dup USING (gram))
         LATERAL VIEW explode(sequence(i, i + 7)) e AS p)),
agg AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) docs_affected,
               CAST(COUNT(*) AS BIGINT) covered FROM cov)
SELECT docs_affected, covered AS covered_tokens, total_tokens,
  CAST(covered * 1000000 DIV total_tokens AS BIGINT) AS covered_ppm
FROM agg, tot""",

    "q168_token_shape_mix" -> """
WITH d AS (SELECT lang, filter(split(lower(text), ' '), x -> x != '') toks FROM documents),
t AS (SELECT lang,
    CAST(size(toks) AS BIGINT) n_toks,
    CAST(aggregate(transform(toks, x -> length(x)), 0, (acc, v) -> acc + v) AS BIGINT) sum_len,
    CAST(size(filter(toks, x -> length(x) <= 3)) AS BIGINT) n_short,
    CAST(size(filter(toks, x -> length(x) >= 8)) AS BIGINT) n_long
  FROM d WHERE size(toks) > 0)
SELECT lang, COUNT(*) n_docs,
  CAST(SUM(n_toks) AS BIGINT) n_tokens,
  CAST(CAST(SUM(sum_len) AS BIGINT) * 100 DIV CAST(SUM(n_toks) AS BIGINT) AS BIGINT) mean_len_centichar,
  CAST(CAST(SUM(n_short) AS BIGINT) * 1000000 DIV CAST(SUM(n_toks) AS BIGINT) AS BIGINT) short_ppm,
  CAST(CAST(SUM(n_long) AS BIGINT) * 1000000 DIV CAST(SUM(n_toks) AS BIGINT) AS BIGINT) long_ppm
FROM t GROUP BY lang ORDER BY lang""",

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
  CAST(b.cents * 1000000 DIV r.reg_cents AS BIGINT) nation_share_of_region_ppm,
  CAST(r.reg_cents * 1000000 DIV tot.tot_cents AS BIGINT) region_share_ppm
FROM by_nation b JOIN reg r ON r.region = b.region CROSS JOIN tot
ORDER BY b.region, b.nation""",

    "q195_nation_supplier_hhi" -> """
WITH per_s AS (SELECT n_name nation, s_suppkey,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) cents
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  GROUP BY n_name, s_suppkey),
nat AS (SELECT nation, CAST(SUM(cents) AS BIGINT) nat_cents, COUNT(*) n_suppliers
  FROM per_s GROUP BY nation),
shares AS (SELECT p.nation, n.n_suppliers, n.nat_cents,
    CAST(p.cents * 1000000 DIV n.nat_cents AS BIGINT) share_ppm
  FROM per_s p JOIN nat n ON n.nation = p.nation)
SELECT nation, MIN(n_suppliers) n_suppliers,
  CAST(MIN(nat_cents) AS DOUBLE) / 10000 net_revenue,
  CAST(CAST(SUM(share_ppm * share_ppm) AS BIGINT) DIV 1000000 AS BIGINT) hhi_ppm
FROM shares GROUP BY nation ORDER BY nation""",

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
  CAST(COUNT(*) * 1000000 DIV g_orders AS BIGINT) share_ppm
FROM sole JOIN sn ON s_suppkey = blame CROSS JOIN tot
GROUP BY n_name, g_orders ORDER BY n_name""",

    "q216_revenue_momentum" -> """
WITH day AS (SELECT CAST(o_orderdate AS DATE) d,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) rev
  FROM orders GROUP BY d),
sg AS (SELECT d, CAST(sign(rev - LAG(rev, 1) OVER (ORDER BY d)) AS BIGINT) dir FROM day),
lg AS (SELECT dir, LAG(dir, 1) OVER (ORDER BY d) pdir1,
    LAG(dir, 7) OVER (ORDER BY d) pdir7 FROM sg)
SELECT COUNT(*) n_days,
  CAST(SUM(CASE WHEN dir = 1 THEN 1 ELSE 0 END) AS BIGINT) up_days,
  CAST(SUM(CASE WHEN dir <> 0 AND pdir1 <> 0 AND dir = pdir1 THEN 1 ELSE 0 END) * 1000000
    DIV SUM(CASE WHEN dir <> 0 AND pdir1 <> 0 THEN 1 ELSE 0 END) AS BIGINT) mom1_ppm,
  CAST(SUM(CASE WHEN dir <> 0 AND pdir7 <> 0 AND dir = pdir7 THEN 1 ELSE 0 END) * 1000000
    DIV SUM(CASE WHEN dir <> 0 AND pdir7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) mom7_ppm
FROM lg""",

    "q249_style_fingerprint" -> """
WITH d AS (SELECT source, filter(split(lower(text), ' '), x -> x != '') l FROM documents),
p AS (SELECT source, i, l FROM (SELECT * FROM d WHERE size(l) >= 2)
      LATERAL VIEW explode(sequence(1, size(l) - 1)) e AS i),
bg AS (SELECT source, element_at(l, i) || '>' || element_at(l, i + 1) bigram FROM p),
c AS (SELECT source, bigram, COUNT(*) c FROM bg GROUP BY source, bigram),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) n_bigrams FROM c GROUP BY source),
mx AS (SELECT source, CAST(MAX(c) AS BIGINT) mc FROM c GROUP BY source),
top AS (SELECT c.source, m.mc, MIN(bigram) top_bigram
  FROM c JOIN mx m ON m.source = c.source WHERE c.c = m.mc GROUP BY c.source, m.mc)
SELECT t.source, t.n_bigrams, p.top_bigram, p.mc top_n,
  CAST(p.mc * 1000000 DIV t.n_bigrams AS BIGINT) top_share_ppm
FROM tot t JOIN top p ON p.source = t.source ORDER BY t.source""",

    "q254_specialist_suppliers" -> """
WITH sb AS (SELECT l_suppkey, p_brand, COUNT(*) n_sb
  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY l_suppkey, p_brand),
ms AS (SELECT l_suppkey, CAST(SUM(n_sb) AS BIGINT) n_s FROM sb GROUP BY l_suppkey),
mb AS (SELECT p_brand, CAST(SUM(n_sb) AS BIGINT) n_b FROM sb GROUP BY p_brand),
g AS (SELECT CAST(SUM(n_sb) AS BIGINT) n FROM sb),
lift AS (SELECT sb.p_brand,
    sb.n_sb * g.n * 1000000 DIV (ms.n_s * mb.n_b) lift_ppm
  FROM sb JOIN ms ON ms.l_suppkey = sb.l_suppkey
  JOIN mb ON mb.p_brand = sb.p_brand CROSS JOIN g)
SELECT p_brand, COUNT(*) n_active,
  CAST(SUM(CASE WHEN lift_ppm >= 2000000 THEN 1 ELSE 0 END) AS BIGINT) n_specialists,
  CAST(SUM(CASE WHEN lift_ppm >= 2000000 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) specialist_ppm
FROM lift GROUP BY p_brand ORDER BY p_brand""",

    "q261_value_gains_curve" -> """
WITH rev AS (SELECT o_custkey, CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY o_custkey),
rc AS (SELECT rev, COUNT(*) AS c FROM rev GROUP BY rev),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM rc),
dec AS (SELECT (CAST(SUM(c) OVER (ORDER BY rev) AS BIGINT) - 1) * 10 DIV n.n AS decile,
    c, rev FROM rc CROSS JOIN n),
cur AS (SELECT decile, CAST(SUM(c) AS BIGINT) AS n_customers,
    CAST(SUM(rev * c) AS BIGINT) AS d_rev
  FROM dec GROUP BY decile),
tot AS (SELECT CAST(SUM(d_rev) AS BIGINT) AS t_rev FROM cur)
SELECT decile, n_customers,
  CAST(d_rev * 1000000 DIV t_rev AS BIGINT) AS share_ppm,
  CAST(CAST(SUM(d_rev) OVER (ORDER BY decile DESC) AS BIGINT) * 1000000 DIV t_rev AS BIGINT) AS cum_from_top_ppm
FROM cur CROSS JOIN tot ORDER BY decile""",

    "q42_dedup_ngram_jaccard" -> """
WITH d AS (SELECT doc_id, split(lower(text), ' ') l FROM documents
           WHERE size(split(lower(text), ' ')) >= 3),
s AS (SELECT doc_id, i, l FROM d
      LATERAL VIEW explode(sequence(1, size(l) - 2)) t AS i),
sh AS (SELECT DISTINCT doc_id,
         concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh
       FROM s),
shk AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000)),
card AS (SELECT doc_id, COUNT(*) nt FROM shk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
jac AS (SELECT x.i, x.j, CAST(x.ci AS DOUBLE) / (ca.nt + cb.nt - x.ci) jc
        FROM inter x
        JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j)
SELECT COUNT(*) n_pairs, CAST(ROUND(AVG(CAST(jc AS DECIMAL(18,9))), 6) AS DOUBLE) avg_j, ROUND(MAX(jc), 6) max_j
FROM jac WHERE jc >= 0.2""",

    "q82_containment" -> """
WITH d AS (SELECT doc_id, split(lower(text), ' ') l FROM documents
           WHERE size(split(lower(text), ' ')) >= 3),
s AS (SELECT doc_id, i, l FROM d
      LATERAL VIEW explode(sequence(1, size(l) - 2)) t AS i),
sh AS (SELECT DISTINCT doc_id,
         concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh
       FROM s),
shk AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000)),
card AS (SELECT doc_id, COUNT(*) AS nt FROM shk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id <> b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT COUNT(*) AS n_pairs,
  CAST(SUM(CASE WHEN ci * 10 >= nt * 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_contained,
  CAST(ROUND(AVG(CAST(CAST(ci AS DOUBLE) / nt AS DECIMAL(18,9))), 6) AS DOUBLE) AS avg_ct,
  ROUND(MAX(CAST(ci AS DOUBLE) / nt), 6) AS max_ct
FROM inter JOIN card ON inter.i = card.doc_id""",

    "q95_cooccur_lift" -> """
WITH dt AS (SELECT DISTINCT doc_id, tok FROM documents
            LATERAL VIEW explode(filter(split(lower(text), ' '), x -> x != '')) e AS tok),
dfreq AS (SELECT tok, COUNT(*) c FROM dt GROUP BY tok),
vocab AS (SELECT tok, c FROM (SELECT tok, c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) rn FROM dfreq) WHERE rn <= 1000),
dv AS (SELECT dt.doc_id, dt.tok FROM dt LEFT SEMI JOIN vocab ON vocab.tok = dt.tok),
pair AS (SELECT a.tok ta, b.tok tb, COUNT(*) cab
         FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.tok < b.tok
         GROUP BY a.tok, b.tok),
nd AS (SELECT COUNT(*) n FROM documents)
SELECT p.ta, p.tb, p.cab,
  CAST(CAST(p.cab AS DECIMAL(38,0)) * nd.n * 1000000 DIV (CAST(va.c AS DECIMAL(38,0)) * vb.c) AS BIGINT) AS lift_ppm
FROM pair p CROSS JOIN nd
JOIN vocab va ON va.tok = p.ta JOIN vocab vb ON vb.tok = p.tb
WHERE p.cab >= 5
ORDER BY lift_ppm DESC, p.ta, p.tb LIMIT 20""",

    "q160_packing_curve" -> """
WITH d AS (SELECT size(filter(split(lower(text), ' '), x -> x != '')) n FROM documents),
t AS (SELECT CAST(n AS BIGINT) n FROM d WHERE n > 0),
ctx AS (SELECT CAST(c AS BIGINT) ctx FROM (SELECT explode(array(512, 1024, 2048, 4096)) c)),
a AS (SELECT ctx, COUNT(*) n_docs, SUM(n) total_tokens,
        SUM(GREATEST(0, ctx - n)) solo_pad, SUM(GREATEST(0, n - ctx)) solo_trunc
      FROM t CROSS JOIN ctx GROUP BY ctx)
SELECT ctx, n_docs, CAST(total_tokens AS BIGINT) total_tokens,
  CAST(solo_pad * 1000000 DIV (n_docs * ctx) AS BIGINT) solo_pad_ppm,
  CAST(solo_trunc * 1000000 DIV total_tokens AS BIGINT) solo_trunc_ppm,
  CAST((total_tokens + ctx - 1) DIV ctx AS BIGINT) concat_bins,
  CAST(((total_tokens + ctx - 1) DIV ctx * ctx - total_tokens) * 1000000
       DIV ((total_tokens + ctx - 1) DIV ctx * ctx) AS BIGINT) concat_waste_ppm
FROM a ORDER BY ctx""",

    "q169_nation_trade_matrix" -> """
WITH pairs AS (SELECT ns.n_name supp_nation, nc.n_name cust_nation,
    SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) rev_d,
    COUNT(*) n_items
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation nc ON nc.n_nationkey = c_nationkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ns ON ns.n_nationkey = s_nationkey
  GROUP BY ns.n_name, nc.n_name),
tot AS (SELECT SUM(rev_d) total_d FROM pairs),
top AS (SELECT * FROM pairs ORDER BY rev_d DESC, supp_nation, cust_nation LIMIT 15)
SELECT t.supp_nation, t.cust_nation, t.n_items,
  CAST(t.rev_d AS DOUBLE) net_revenue,
  CAST(CAST(t.rev_d * 10000 AS DECIMAL(19,0)) * 1000000 DIV CAST(tot.total_d * 10000 AS DECIMAL(19,0)) AS BIGINT) trade_share_ppm
FROM top t CROSS JOIN tot
ORDER BY net_revenue DESC, t.supp_nation, t.cust_nation""",

    "q170_shingle_novelty" -> """
WITH d AS (SELECT doc_id, filter(split(lower(text), ' '), x -> x != '') l FROM documents),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) e AS i),
t AS (SELECT DISTINCT doc_id,
        concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh
      FROM s),
df AS (SELECT sh, COUNT(*) dfreq FROM t GROUP BY sh),
per_doc AS (SELECT t.doc_id, COUNT(*) nt,
    SUM(CASE WHEN df.dfreq = 1 THEN 1 ELSE 0 END) nu
  FROM t JOIN df ON df.sh = t.sh GROUP BY t.doc_id),
b AS (SELECT nt, nu, CAST(nu * 1000000 DIV nt DIV 100000 AS BIGINT) novelty_decile FROM per_doc)
SELECT novelty_decile, COUNT(*) n_docs,
  CAST(SUM(nt) AS BIGINT) n_shingles, CAST(SUM(nu) AS BIGINT) n_unique,
  CAST(CAST(SUM(nu) AS BIGINT) * 1000000 DIV CAST(SUM(nt) AS BIGINT) AS BIGINT) unique_ppm
FROM b GROUP BY novelty_decile ORDER BY novelty_decile""",

    "q177_length_novelty_grid" -> """
WITH d AS (SELECT doc_id, n_chars, filter(split(lower(text), ' '), x -> x != '') l FROM documents),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) e AS i),
t AS (SELECT DISTINCT doc_id,
        concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh
      FROM s),
df AS (SELECT sh, COUNT(*) dfreq FROM t GROUP BY sh),
per_doc AS (SELECT t.doc_id, COUNT(*) nt,
    SUM(CASE WHEN df.dfreq = 1 THEN 1 ELSE 0 END) nu
  FROM t JOIN df ON df.sh = t.sh GROUP BY t.doc_id),
g AS (SELECT d.n_chars DIV 256 len_block, p.nt, p.nu
  FROM per_doc p JOIN d ON d.doc_id = p.doc_id)
SELECT len_block, COUNT(*) n_docs,
  CAST(SUM(nt) AS BIGINT) n_shingles, CAST(SUM(nu) AS BIGINT) n_unique,
  CAST(CAST(SUM(nu) AS BIGINT) * 1000000 DIV CAST(SUM(nt) AS BIGINT) AS BIGINT) unique_ppm
FROM g GROUP BY len_block ORDER BY len_block""",

    "q178_revenue_pareto" -> """
WITH spend AS (SELECT o_custkey,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) spend
  FROM orders GROUP BY o_custkey),
tot AS (SELECT COUNT(*) n, CAST(SUM(spend) AS BIGINT) tot_rev FROM spend),
vals AS (SELECT spend, COUNT(*) c, CAST(SUM(spend) AS BIGINT) rev FROM spend GROUP BY spend),
cums AS (SELECT spend,
    CAST(SUM(c) OVER (ORDER BY spend DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum_cust,
    CAST(SUM(rev) OVER (ORDER BY spend DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum_rev
  FROM vals)
SELECT CAST((cum_cust * 10 + tot.n - 1) DIV tot.n AS BIGINT) decile,
  CAST(MAX(cum_cust) AS BIGINT) n_customers_cum,
  CAST(MAX(cum_rev * 1000000 DIV tot.tot_rev) AS BIGINT) revenue_cum_ppm
FROM cums CROSS JOIN tot
GROUP BY decile ORDER BY decile""",

    "q240_split_fairness" -> """
WITH e AS (SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) b,
    CASE WHEN MD5(CAST(event_id AS STRING)) < '8' THEN 'a' ELSE 'b' END half,
    COUNT(*) n_tbh
  FROM events GROUP BY event_type, b, half),
ht AS (SELECT event_type, half, CAST(SUM(n_tbh) AS BIGINT) n_h FROM e GROUP BY event_type, half),
dom AS (SELECT DISTINCT event_type, b FROM e),
grid AS (SELECT dom.event_type, dom.b, ht.half,
    CAST(COALESCE(e.n_tbh, 0) * 1000000 DIV ht.n_h AS BIGINT) ppm
  FROM dom JOIN ht ON ht.event_type = dom.event_type
  LEFT JOIN e ON e.event_type = dom.event_type AND e.b = dom.b AND e.half = ht.half)
SELECT a.event_type, COUNT(*) n_buckets,
  CAST(SUM(abs(a.ppm - b.ppm)) DIV 2 AS BIGINT) tv_ppm
FROM grid a JOIN grid b ON b.event_type = a.event_type AND b.b = a.b
  AND a.half = 'a' AND b.half = 'b'
GROUP BY a.event_type ORDER BY a.event_type""",

    "q266_supplier_quartile_shift" -> """
WITH yr AS (SELECT CAST(year(l_shipdate) AS BIGINT) AS y, l_suppkey,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem WHERE year(l_shipdate) IN (1995, 2000) GROUP BY y, l_suppkey),
rc AS (SELECT y, rev, COUNT(*) AS c FROM yr GROUP BY y, rev),
rt AS (SELECT y, CAST(SUM(c) AS BIGINT) AS n FROM rc GROUP BY y),
q AS (SELECT rc.y, rc.rev,
    (CAST(SUM(c) OVER (PARTITION BY rc.y ORDER BY rev) AS BIGINT) - 1) * 4 DIV rt.n AS quart
  FROM rc JOIN rt ON rt.y = rc.y),
qs AS (SELECT yr.y, yr.l_suppkey, q.quart FROM yr JOIN q ON q.y = yr.y AND q.rev = yr.rev)
SELECT a.quart AS q95, b.quart AS q00, COUNT(*) AS n_suppliers
FROM qs a JOIN qs b ON b.l_suppkey = a.l_suppkey AND a.y = 1995 AND b.y = 2000
GROUP BY q95, q00 ORDER BY q95, q00""",

    "q46_quality_score" -> """
WITH t AS (SELECT doc_id, source, tok FROM documents
           LATERAL VIEW explode(split(lower(text), ' ')) e AS tok
           WHERE tok <> ''),
per_doc AS (
  SELECT doc_id, source, COUNT(*) ntok, COUNT(DISTINCT tok) nuniq,
         SUM(CASE WHEN tok IN ('the','a') THEN 1 ELSE 0 END) nstop,
         SUM(length(tok)) sumlen
  FROM t GROUP BY doc_id, source),
scored AS (
  SELECT doc_id, source,
    (6 * ((nuniq * 1000000) DIV ntok)
   + 3 * (1000000 - ((nstop * 1000000) DIV ntok))
   + 1 * (least((sumlen * 100) DIV ntok, 800) * 1250)) DIV 10 AS score
  FROM per_doc)
SELECT source, COUNT(*) n_docs,
       CAST(ROUND(AVG(CAST(score AS DECIMAL(18,6))), 6) AS DOUBLE) avg_score,
       CAST(MIN(score) AS BIGINT) min_score, CAST(MAX(score) AS BIGINT) max_score,
       CAST(SUM(CASE WHEN score < 500000 THEN 1 ELSE 0 END) AS BIGINT) n_low
FROM scored GROUP BY source ORDER BY source""",

    "q105_mirror_matrix" -> """
WITH d AS (SELECT doc_id, source, split(lower(text), ' ') l FROM documents),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) t AS i),
sh AS (SELECT DISTINCT doc_id,
         concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh
       FROM s),
shk AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000)),
card AS (SELECT doc_id, COUNT(*) nt FROM shk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
edge AS (SELECT i, j FROM inter x
         JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j
         WHERE CAST(x.ci AS DOUBLE) / (ca.nt + cb.nt - x.ci) >= 0.2),
sp AS (SELECT da.source sa, db.source sb FROM edge e
       JOIN d da ON da.doc_id = e.i JOIN d db ON db.doc_id = e.j
       WHERE da.source <> db.source)
SELECT LEAST(sa, sb) AS src_a, GREATEST(sa, sb) AS src_b, COUNT(*) AS n_pairs
FROM sp GROUP BY src_a, src_b ORDER BY src_a, src_b""",

    "q107_quality_floor" -> """
WITH t AS (SELECT doc_id, source, tok FROM documents
           LATERAL VIEW explode(split(lower(text), ' ')) e AS tok
           WHERE tok <> ''),
per_doc AS (
  SELECT doc_id, source, COUNT(*) ntok, COUNT(DISTINCT tok) nuniq,
         SUM(CASE WHEN tok IN ('the','a') THEN 1 ELSE 0 END) nstop,
         SUM(length(tok)) sumlen
  FROM t GROUP BY doc_id, source),
scored AS (
  SELECT source, ntok, CAST(
    (6 * ((nuniq * 1000000) DIV ntok)
   + 3 * (1000000 - ((nstop * 1000000) DIV ntok))
   + 1 * (least((sumlen * 100) DIV ntok, 800) * 1250)) DIV 10 AS DOUBLE) AS v
  FROM per_doc),
f AS (SELECT source, ROUND(percentile(v, 0.10), 6) floor_score
      FROM scored GROUP BY source)
SELECT s.source, f.floor_score, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN s.v >= f.floor_score THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN s.v >= f.floor_score THEN s.ntok ELSE 0 END) AS BIGINT) AS kept_toks
FROM scored s JOIN f USING (source)
GROUP BY s.source, f.floor_score ORDER BY s.source""",

    "q109_bm25" -> """
WITH tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM (
    SELECT doc_id, tok FROM documents
    LATERAL VIEW explode(filter(split(lower(text), ' '), x -> x <> '')) e AS tok
  ) GROUP BY doc_id, tok),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
tot AS (SELECT COUNT(*) AS nd, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
qtf AS (SELECT * FROM tf WHERE tok IN ('spark','hash','window')),
df AS (SELECT tok, COUNT(*) AS df FROM qtf GROUP BY tok),
c AS (SELECT qtf.doc_id,
  CAST(ROUND(ROUND(ln((CAST(nd - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0), 6)
       * ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
       * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(nd AS DOUBLE)))))), 6)
    AS DECIMAL(18,6)) AS contrib
  FROM qtf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN tot)
SELECT doc_id, CAST(SUM(contrib) AS DOUBLE) AS score
FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""",

    "q114_vocab_drift" -> """
WITH d AS (SELECT doc_id, text FROM documents),
o AS (SELECT text FROM d WHERE md5('old:' || CAST(doc_id AS STRING)) < 'e'),
n AS (SELECT CASE WHEN md5('edit:' || CAST(doc_id AS STRING)) < '2'
        THEN text || ' v2' ELSE text END AS text
      FROM d WHERE md5('new:' || CAST(doc_id AS STRING)) < 'e'),
ot AS (SELECT t AS tok, COUNT(*) c FROM (SELECT explode(split(lower(text), ' ')) t FROM o)
       WHERE t <> '' GROUP BY t),
nt AS (SELECT t AS tok, COUNT(*) c FROM (SELECT explode(split(lower(text), ' ')) t FROM n)
       WHERE t <> '' GROUP BY t),
tot AS (SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM ot) ocnt,
               (SELECT CAST(SUM(c) AS BIGINT) FROM nt) ncnt),
j AS (SELECT COALESCE(ot.tok, nt.tok) tok,
        CAST(COALESCE(ot.c, 0) AS BIGINT) * 1000000 DIV ocnt AS old_ppm,
        CAST(COALESCE(nt.c, 0) AS BIGINT) * 1000000 DIV ncnt AS new_ppm
      FROM ot FULL OUTER JOIN nt ON ot.tok = nt.tok CROSS JOIN tot),
tv AS (SELECT CAST(SUM(ABS(new_ppm - old_ppm)) AS BIGINT) tv_ppm, COUNT(*) n_toks FROM j)
SELECT j.tok, j.old_ppm, j.new_ppm, j.new_ppm - j.old_ppm AS delta_ppm,
       tv.tv_ppm, tv.n_toks
FROM j CROSS JOIN tv
ORDER BY ABS(j.new_ppm - j.old_ppm) DESC, j.tok LIMIT 10""",

    "q115_gopher_rules" -> """
WITH t AS (SELECT doc_id, source, tok FROM documents
           LATERAL VIEW explode(filter(split(lower(text), ' '), x -> x <> '')) e AS tok),
tf AS (SELECT doc_id, source, tok, COUNT(*) c FROM t GROUP BY ALL),
pd AS (SELECT doc_id, source, SUM(c) nw, SUM(c * length(tok)) sumlen,
       SUM(CASE WHEN tok IN ('the','a') THEN c ELSE 0 END) nstop, MAX(c) maxtf
       FROM tf GROUP BY ALL),
fl AS (SELECT source,
       CASE WHEN nw BETWEEN 30 AND 80 THEN 1 ELSE 0 END r_len,
       CASE WHEN sumlen * 10 BETWEEN 44 * nw AND 48 * nw THEN 1 ELSE 0 END r_mwl,
       CASE WHEN nstop >= 3 THEN 1 ELSE 0 END r_stop,
       CASE WHEN maxtf * 10 <= nw THEN 1 ELSE 0 END r_rep
       FROM pd)
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(r_len) AS BIGINT) AS pass_len, CAST(SUM(r_mwl) AS BIGINT) AS pass_mwl,
  CAST(SUM(r_stop) AS BIGINT) AS pass_stop, CAST(SUM(r_rep) AS BIGINT) AS pass_rep,
  CAST(SUM(r_len * r_mwl * r_stop * r_rep) AS BIGINT) AS pass_all
FROM fl GROUP BY source ORDER BY source""",

    "q122_perplexity" -> """
WITH d AS (SELECT doc_id, source, filter(split(lower(text), ' '), x -> x <> '') l FROM documents),
v AS (SELECT COUNT(DISTINCT tok) nv FROM (SELECT explode(l) tok FROM d)),
bg0 AS (SELECT doc_id, source, i, l FROM (SELECT * FROM d WHERE size(l) >= 2)
        LATERAL VIEW explode(sequence(1, size(l) - 1)) t AS i),
bgall AS (SELECT doc_id, source, element_at(l, i) tok, element_at(l, i + 1) nxt FROM bg0),
c AS (SELECT tok, nxt, COUNT(*) c FROM bgall GROUP BY tok, nxt),
nf AS (SELECT tok, SUM(c) nf FROM c GROUP BY tok),
cost AS (SELECT c.tok, c.nxt,
  CAST(ROUND(ln(CAST(nf.nf + v.nv AS DOUBLE) / (c.c + 1)), 9) AS DECIMAL(18,9)) w
  FROM c JOIN nf ON nf.tok = c.tok CROSS JOIN v),
pd AS (SELECT b.doc_id, b.source,
         CAST(ROUND(CAST(SUM(cost.w) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) nll
  FROM bgall b JOIN cost ON cost.tok = b.tok AND cost.nxt = b.nxt
  GROUP BY b.doc_id, b.source)
SELECT source, COUNT(*) AS n_docs,
  ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS mean_nll,
  CAST(MIN(nll) AS DOUBLE) AS min_nll,
  CAST(MAX(nll) AS DOUBLE) AS max_nll
FROM pd GROUP BY source ORDER BY source""",

    "q123_split_leakage" -> """
WITH s AS (SELECT doc_id, text,
    CASE WHEN md5(CAST(doc_id AS STRING)) < 'c' THEN 'train'
         WHEN md5(CAST(doc_id AS STRING)) < 'e' THEN 'val'
         ELSE 'test' END AS split FROM documents),
d AS (SELECT doc_id, split, split(lower(text), ' ') l FROM s),
g AS (SELECT doc_id, split, i, l FROM (SELECT * FROM d WHERE size(l) >= 5)
      LATERAL VIEW explode(sequence(1, size(l) - 4)) t AS i),
sh AS (SELECT DISTINCT doc_id, split,
        concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2),
                  element_at(l, i + 3), element_at(l, i + 4)) sh
       FROM g),
tr AS (SELECT DISTINCT sh FROM sh WHERE split = 'train'),
leak AS (SELECT DISTINCT doc_id FROM (SELECT * FROM sh WHERE split <> 'train') x
         LEFT SEMI JOIN tr ON tr.sh = x.sh)
SELECT s.split, COUNT(*) AS n_docs,
  CAST(COUNT(leak.doc_id) AS BIGINT) AS n_leaked,
  CAST(COUNT(leak.doc_id) * 1000000 DIV COUNT(*) AS BIGINT) AS leaked_ppm
FROM s LEFT JOIN leak ON leak.doc_id = s.doc_id
WHERE s.split <> 'train'
GROUP BY s.split ORDER BY s.split""",

    "q126_boilerplate_quality" -> """
WITH t AS (SELECT doc_id, tok FROM documents
           LATERAL VIEW explode(split(lower(text), ' ')) e AS tok
           WHERE tok <> ''),
per_doc AS (
  SELECT doc_id, COUNT(*) ntok, COUNT(DISTINCT tok) nuniq,
         SUM(CASE WHEN tok IN ('the','a') THEN 1 ELSE 0 END) nstop,
         SUM(length(tok)) sumlen
  FROM t GROUP BY doc_id),
scored AS (
  SELECT doc_id,
    (6 * ((nuniq * 1000000) DIV ntok)
   + 3 * (1000000 - ((nstop * 1000000) DIV ntok))
   + 1 * (least((sumlen * 100) DIV ntok, 800) * 1250)) DIV 10 AS score
  FROM per_doc),
deg AS (SELECT doc_id, n_chars,
        COUNT(*) OVER (PARTITION BY
          md5(array_join(slice(split(lower(text), ' '), 1, 5), ' '))) AS degree
        FROM documents),
b AS (SELECT CASE WHEN degree = 1 THEN '1' WHEN degree = 2 THEN '2' ELSE '3+' END AS prefix_degree,
             score, n_chars
      FROM deg JOIN scored USING (doc_id))
SELECT prefix_degree, COUNT(*) AS n_docs,
  CAST(ROUND(AVG(CAST(score AS DECIMAL(18,6))), 6) AS DOUBLE) AS avg_score,
  CAST(ROUND(AVG(CAST(n_chars AS DECIMAL(18,6))), 6) AS DOUBLE) AS avg_chars
FROM b GROUP BY prefix_degree ORDER BY prefix_degree""",

    "q127_ann_recall" -> """
WITH e AS (SELECT vec_id, embedding,
  concat(CASE WHEN element_at(embedding, 1) >= 0 THEN '1' ELSE '0' END,
         CASE WHEN element_at(embedding, 2) >= 0 THEN '1' ELSE '0' END,
         CASE WHEN element_at(embedding, 3) >= 0 THEN '1' ELSE '0' END,
         CASE WHEN element_at(embedding, 4) >= 0 THEN '1' ELSE '0' END) bucket
  FROM embeddings),
q AS (SELECT vec_id qid, embedding qv, bucket qbucket FROM e WHERE vec_id < 20),
scored AS (SELECT q.qid, q.qbucket, e.vec_id, e.bucket,
  ROUND(
    aggregate(zip_with(e.embedding, q.qv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, x) -> acc + x)
    / (SQRT(aggregate(e.embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
     * SQRT(aggregate(q.qv, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) cos
  FROM e JOIN q ON e.vec_id <> q.qid),
topk AS (SELECT * FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) rn FROM scored)
  WHERE rn <= 10),
cands AS (SELECT qid, COUNT(*) n_candidates FROM scored WHERE bucket = qbucket GROUP BY qid),
h AS (SELECT qid, SUM(CASE WHEN bucket = qbucket THEN 1 ELSE 0 END) n_hits FROM topk GROUP BY qid)
SELECT h.qid, CAST(COALESCE(c.n_candidates, 0) AS BIGINT) AS n_candidates,
  CAST(h.n_hits AS BIGINT) AS n_hits,
  CAST(h.n_hits * 1000000 DIV 10 AS BIGINT) AS recall_ppm
FROM h LEFT JOIN cands c ON h.qid = c.qid
ORDER BY h.qid""",

    "q128_minhash_fidelity" -> """
WITH d AS (SELECT doc_id, split(lower(text), ' ') l FROM documents),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) x AS i),
t AS (SELECT DISTINCT doc_id,
        concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh FROM s),
sig AS (SELECT doc_id,
  MIN(substr(md5(sh), 1, 4)) h1, MIN(substr(md5(sh), 5, 4)) h2,
  MIN(substr(md5(sh), 9, 4)) h3, MIN(substr(md5(sh), 13, 4)) h4,
  MIN(substr(md5(sh), 17, 4)) h5, MIN(substr(md5(sh), 21, 4)) h6,
  MIN(substr(md5(sh), 25, 4)) h7, MIN(substr(md5(sh), 29, 4)) h8
  FROM t GROUP BY doc_id),
cand AS (
  SELECT a.doc_id i, b.doc_id j FROM sig a JOIN sig b
    ON a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3 AND a.h4 = b.h4 AND a.doc_id < b.doc_id
  UNION SELECT a.doc_id, b.doc_id FROM sig a JOIN sig b
    ON a.h5 = b.h5 AND a.h6 = b.h6 AND a.h7 = b.h7 AND a.h8 = b.h8 AND a.doc_id < b.doc_id),
card AS (SELECT doc_id, COUNT(*) nt FROM t GROUP BY doc_id),
inter AS (SELECT c.i, c.j, COUNT(*) ci FROM cand c
          JOIN t ta ON ta.doc_id = c.i JOIN t tb ON tb.doc_id = c.j AND ta.sh = tb.sh
          GROUP BY c.i, c.j),
m AS (SELECT c.i, c.j,
  (CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END + CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END
 + CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END + CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END
 + CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END + CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END
 + CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END + CASE WHEN a.h8 = b.h8 THEN 1 ELSE 0 END) matches
  FROM cand c JOIN sig a ON a.doc_id = c.i JOIN sig b ON b.doc_id = c.j),
p AS (SELECT m.matches, m.matches * 125000 est_ppm,
        COALESCE(x.ci, 0) * 1000000 DIV (ca.nt + cb.nt - COALESCE(x.ci, 0)) exact_ppm
      FROM m LEFT JOIN inter x ON x.i = m.i AND x.j = m.j
      JOIN card ca ON ca.doc_id = m.i JOIN card cb ON cb.doc_id = m.j)
SELECT CAST(matches AS BIGINT) AS matches, CAST(est_ppm AS BIGINT) AS est_ppm,
  COUNT(*) AS n_pairs,
  CAST(ROUND(AVG(CAST(exact_ppm AS DECIMAL(18,6))), 6) AS DOUBLE) AS avg_exact_ppm,
  CAST(ROUND(AVG(CAST(ABS(est_ppm - exact_ppm) AS DECIMAL(18,6))), 6) AS DOUBLE) AS avg_abs_err_ppm
FROM p GROUP BY matches, est_ppm ORDER BY matches""",

    "q131_training_manifest" -> """
WITH tr AS (
  SELECT doc_id, source,
    CAST(size(filter(split(lower(text), ' '), x -> x <> '')) AS BIGINT) ntok
  FROM documents
  WHERE md5(CAST(doc_id AS STRING)) < 'c'),
loc AS (SELECT doc_id, source, ntok,
  ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS STRING)), doc_id) rk,
  COALESCE(SUM(ntok) OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS STRING)), doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_toks
  FROM tr),
tot AS (SELECT source, COUNT(*) nd, SUM(ntok) td FROM tr GROUP BY source),
offs AS (SELECT source,
  COALESCE(SUM(nd) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) doc_off,
  COALESCE(SUM(td) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) tok_off
  FROM tot)
SELECT CAST(offs.doc_off + loc.rk AS BIGINT) AS global_step, loc.source, loc.doc_id,
  loc.ntok AS ntok, CAST(offs.tok_off + loc.cum_toks AS BIGINT) AS tok_offset
FROM loc JOIN offs ON loc.source = offs.source
WHERE (offs.doc_off + loc.rk) % 97 = 1
ORDER BY global_step""",

    "q136_dedup_curve" -> """
WITH d AS (SELECT doc_id, split(lower(text), ' ') l FROM documents),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) x AS i),
sh AS (SELECT DISTINCT doc_id,
         concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh FROM s),
shk AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000)),
card AS (SELECT doc_id, COUNT(*) nt FROM shk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
jac AS (SELECT x.j, ROUND(CAST(x.ci AS DOUBLE) / (ca.nt + cb.nt - x.ci), 6) jc
        FROM inter x
        JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j),
mj AS (SELECT j, MAX(jc) mj FROM jac GROUP BY j),
t AS (SELECT explode(array(50, 60, 70, 80, 90)) tp),
drops AS (SELECT t.tp, SUM(CASE WHEN mj.mj >= t.tp / 100.0 THEN 1 ELSE 0 END) nd
          FROM t LEFT JOIN mj ON mj.mj >= t.tp / 100.0 GROUP BY t.tp),
n AS (SELECT COUNT(*) n_docs FROM documents)
SELECT CAST(drops.tp AS BIGINT) AS threshold_pct, CAST(n.n_docs AS BIGINT) AS n_docs,
  CAST(drops.nd AS BIGINT) AS n_dropped,
  CAST(n.n_docs - drops.nd AS BIGINT) AS n_survivors,
  CAST(drops.nd * 1000000 DIV n.n_docs AS BIGINT) AS drop_ppm
FROM drops CROSS JOIN n ORDER BY threshold_pct""",

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
                THEN unix_micros(valid_to) - unix_micros(valid_from) END) AS BIGINT) dwell_us,
  CAST(MAX(CASE WHEN valid_to IS NOT NULL
                THEN unix_micros(valid_to) - unix_micros(valid_from) END) AS BIGINT) max_dwell_us
FROM i GROUP BY state ORDER BY state""",

    "q138_rrf_hybrid" -> """
WITH tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM (
    SELECT doc_id, tok FROM documents
    LATERAL VIEW explode(filter(split(lower(text), ' '), x -> x <> '')) e AS tok
  ) GROUP BY doc_id, tok),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
tot AS (SELECT COUNT(*) AS nd, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
qtf AS (SELECT * FROM tf WHERE tok IN ('spark','hash','window')),
df AS (SELECT tok, COUNT(*) AS df FROM qtf GROUP BY tok),
c AS (SELECT qtf.doc_id,
  CAST(ROUND(ROUND(ln((CAST(nd - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0), 6)
       * ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
       * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(nd AS DOUBLE)))))), 6)
    AS DECIMAL(18,6)) AS contrib
  FROM qtf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN tot),
bm AS (SELECT doc_id, CAST(SUM(contrib) AS DOUBLE) AS score
       FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50),
bmr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r FROM bm),
qv AS (SELECT embedding v FROM embeddings WHERE vec_id = 0),
cs AS (SELECT e.vec_id,
  ROUND(aggregate(zip_with(e.embedding, qv.v, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, x) -> acc + x)
  / (SQRT(aggregate(e.embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
   * SQRT(aggregate(qv.v, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) cs
  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
vt AS (SELECT vec_id, cs FROM cs ORDER BY cs DESC, vec_id LIMIT 50),
vr AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cs DESC, vec_id) AS r FROM vt)
SELECT COALESCE(bmr.doc_id, vr.vec_id) AS doc_id,
  CAST(COALESCE(CAST(ROUND(1.0 / (60.0 + bmr.r), 6) AS DECIMAL(18,6)), 0)
     + COALESCE(CAST(ROUND(1.0 / (60.0 + vr.r), 6) AS DECIMAL(18,6)), 0) AS DOUBLE) AS rrf_score,
  CAST(bmr.r AS BIGINT) AS bm25_rank, CAST(vr.r AS BIGINT) AS cos_rank
FROM bmr FULL OUTER JOIN vr ON bmr.doc_id = vr.vec_id
ORDER BY rrf_score DESC, doc_id LIMIT 10""",

    "q139_dsir_weights" -> """
WITH d AS (SELECT doc_id, lang, source, split(lower(text), ' ') l FROM documents),
bg AS (SELECT doc_id, lang, source,
         concat_ws(' ', element_at(l, i), element_at(l, i + 1)) AS bgr
       FROM (SELECT doc_id, lang, source, i, l
             FROM (SELECT * FROM d WHERE size(l) >= 2)
             LATERAL VIEW explode(sequence(1, size(l) - 1)) t AS i)),
hb AS (SELECT doc_id, lang, source,
         (instr('0123456789abcdef', substr(md5(bgr), 1, 1)) - 1) * 16
         + instr('0123456789abcdef', substr(md5(bgr), 2, 1)) - 1 AS b
       FROM bg),
tc AS (SELECT b, COUNT(*) ct FROM hb WHERE lang = 'en' GROUP BY b),
rc AS (SELECT b, COUNT(*) cr FROM hb GROUP BY b),
tot AS (SELECT (SELECT CAST(SUM(ct) AS BIGINT) FROM tc) tt,
               (SELECT CAST(SUM(cr) AS BIGINT) FROM rc) rt),
llr AS (SELECT rc.b,
          CAST(ROUND(ln((CAST(COALESCE(tc.ct, 0) AS DOUBLE) + 1.0) / (CAST(tt AS DOUBLE) + 256.0))
                   - ln((CAST(cr AS DOUBLE) + 1.0) / (CAST(rt AS DOUBLE) + 256.0)), 6) AS DECIMAL(18,6)) w
        FROM rc LEFT JOIN tc ON tc.b = rc.b CROSS JOIN tot),
dw AS (SELECT hb.doc_id, hb.source, SUM(w) sw FROM hb JOIN llr ON llr.b = hb.b
       GROUP BY hb.doc_id, hb.source)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(sw) AS DOUBLE) AS sum_w,
       CAST(MAX(sw) AS DOUBLE) AS max_w
FROM dw GROUP BY source ORDER BY source""",

    "q148_ks_drift" -> """
WITH vc AS (SELECT source, n_chars AS v, COUNT(*) AS c FROM documents GROUP BY ALL),
vals AS (SELECT DISTINCT v FROM vc),
srcs AS (SELECT source, SUM(c) AS n_s FROM vc GROUP BY source),
grid AS (SELECT s.source, s.n_s, va.v, COALESCE(vc.c, 0) AS c
         FROM srcs s CROSS JOIN vals va
         LEFT JOIN vc ON vc.source = s.source AND vc.v = va.v),
cum AS (SELECT source, n_s, v,
          SUM(c) OVER (PARTITION BY source ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        FROM grid),
ac AS (SELECT v, SUM(c) AS c FROM vc GROUP BY v),
acc AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS ca FROM ac),
tot AS (SELECT SUM(c) AS n_all FROM vc),
ks AS (SELECT c.source, c.n_s, c.v,
         ABS(c.cs * n_all - a.ca * c.n_s) * 1000000 DIV (c.n_s * n_all) AS d_ppm
       FROM cum c JOIN acc a ON a.v = c.v CROSS JOIN tot),
mk AS (SELECT source, n_s, v, d_ppm,
         MAX(d_ppm) OVER (PARTITION BY source) AS md FROM ks)
SELECT source, CAST(MIN(n_s) AS BIGINT) AS n_docs,
  CAST(MAX(d_ppm) AS BIGINT) AS ks_ppm,
  MIN(CASE WHEN d_ppm = md THEN v END) AS at_value
FROM mk GROUP BY source ORDER BY source""",

    "q150_weighted_sample" -> """
WITH d AS (SELECT doc_id, source, n_chars,
    md5('ws:' || CAST(doc_id AS STRING)) || ':' || CAST(doc_id AS STRING) AS hk
  FROM documents WHERE n_chars > 0),
c AS (SELECT *, SUM(n_chars) OVER (ORDER BY hk
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM d),
tw AS (SELECT SUM(n_chars) AS w_all FROM d),
m AS (SELECT c.source, c.n_chars,
        (CASE WHEN cw <= 0 THEN 0
              ELSE LEAST(100, ((200 * cw - 1) DIV w_all + 1) DIV 2) END)
      - (CASE WHEN cw - n_chars <= 0 THEN 0
              ELSE LEAST(100, ((200 * (cw - n_chars) - 1) DIV w_all + 1) DIV 2) END) AS m
      FROM c CROSS JOIN tw),
per AS (SELECT d.source, COUNT(*) AS n_docs, SUM(d.n_chars) AS w_src FROM d GROUP BY d.source),
ps AS (SELECT source, SUM(m) AS n_sel, SUM(m * n_chars) AS w_sel FROM m GROUP BY source)
SELECT p.source, p.n_docs, CAST(COALESCE(ps.n_sel, 0) AS BIGINT) AS n_selected,
  CAST(p.w_src * 1000000 DIV w_all AS BIGINT) AS weight_share_ppm,
  CAST(COALESCE(ps.n_sel, 0) * 1000000 DIV 100 AS BIGINT) AS sel_share_ppm,
  CAST(COALESCE(ps.w_sel, 0) AS BIGINT) AS w_selected
FROM per p LEFT JOIN ps ON ps.source = p.source CROSS JOIN tw
ORDER BY p.source""",

    "q151_token_budget_curve" -> """
WITH d AS (SELECT n_chars, filter(split(lower(text), ' '), x -> x <> '') toks FROM documents),
t AS (SELECT n_chars,
        CAST(size(array_distinct(toks)) AS BIGINT) * 1000000 DIV size(toks) AS ttr
      FROM d WHERE size(toks) > 0),
s AS (SELECT ttr, COUNT(*) n_docs, SUM(n_chars) chars FROM t GROUP BY ttr),
p AS (SELECT ttr,
        SUM(n_docs) OVER (ORDER BY ttr DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_docs,
        SUM(chars) OVER (ORDER BY ttr DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_chars
      FROM s),
tot AS (SELECT COUNT(*) n_total, SUM(n_chars) chars_total FROM t),
k AS (SELECT CAST(i AS BIGINT) decile FROM (SELECT explode(sequence(1, 10)) i))
SELECT k.decile,
  CAST(MIN_BY(p.ttr, p.cum_docs) AS BIGINT) AS ttr_ppm_at_knot,
  CAST(MIN(p.cum_docs) AS BIGINT) AS cum_docs,
  CAST(MIN_BY(p.cum_chars, p.cum_docs) * 1000000 DIV MAX(tot.chars_total) AS BIGINT) AS cum_chars_ppm
FROM p CROSS JOIN tot JOIN k ON p.cum_docs * 10 >= k.decile * tot.n_total
GROUP BY k.decile ORDER BY k.decile""",

    "q154_hist_selectivity" -> """
WITH vc AS (SELECT CAST(l_quantity AS BIGINT) v, COUNT(*) c FROM lineitem GROUP BY 1),
pref AS (SELECT v, c,
           COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_ex
         FROM vc),
tot AS (SELECT SUM(c) total FROM vc),
b AS (SELECT CAST(cum_ex * 8 DIV total AS BIGINT) AS bucket,
        MIN(v) lo, MAX(v) hi, SUM(c) n_rows
      FROM pref CROSS JOIN tot GROUP BY 1),
bc AS (SELECT bucket, lo, hi, n_rows,
         COALESCE(SUM(n_rows) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cumb,
         (lo + hi) DIV 2 AS probe
       FROM b),
act AS (SELECT bc.bucket, SUM(vc.c) actual_le
        FROM vc JOIN bc ON vc.v <= bc.probe GROUP BY bc.bucket)
SELECT bc.bucket, bc.lo, bc.hi, bc.probe,
  CAST(bc.n_rows AS BIGINT) n_rows,
  CAST(bc.cumb + bc.n_rows * (bc.probe - bc.lo + 1) DIV (bc.hi - bc.lo + 1) AS BIGINT) est_le,
  CAST(act.actual_le AS BIGINT) actual_le,
  CAST(ABS(bc.cumb + bc.n_rows * (bc.probe - bc.lo + 1) DIV (bc.hi - bc.lo + 1) - act.actual_le) * 1000000
       DIV GREATEST(act.actual_le, 1) AS BIGINT) err_ppm
FROM bc JOIN act ON act.bucket = bc.bucket ORDER BY bc.bucket""",

    "q158_topk_token_share" -> """
WITH w AS (SELECT tok FROM documents
           LATERAL VIEW explode(filter(split(lower(text), ' '), x -> x <> '')) e AS tok),
tc AS (SELECT tok, COUNT(*) c FROM w GROUP BY tok),
byc AS (SELECT c, COUNT(*) m, c * COUNT(*) occ FROM tc GROUP BY c),
p AS (SELECT c,
        SUM(m) OVER (ORDER BY c DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_m,
        SUM(occ) OVER (ORDER BY c DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_occ
      FROM byc),
tot AS (SELECT SUM(m) ndv, SUM(occ) total_occ FROM byc),
ks AS (SELECT CAST(k AS BIGINT) k FROM (SELECT explode(array(1, 10, 100, 1000)) k))
SELECT ks.k,
  CAST(LEAST(ks.k, MAX(tot.ndv)) AS BIGINT) k_used,
  CAST((MIN_BY(p.cum_occ, p.cum_m) - (MIN(p.cum_m) - LEAST(ks.k, MAX(tot.ndv))) * MIN_BY(p.c, p.cum_m))
       * 1000000 DIV MAX(tot.total_occ) AS BIGINT) share_ppm
FROM p CROSS JOIN tot JOIN ks ON p.cum_m >= LEAST(ks.k, tot.ndv)
GROUP BY ks.k ORDER BY ks.k""",

    "q159_price_drift" -> """
WITH li AS (SELECT l_partkey part, CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) cents,
              l_shipdate, l_orderkey, l_linenumber FROM lineitem),
o AS (SELECT part, cents,
        ROW_NUMBER() OVER (PARTITION BY part ORDER BY l_shipdate, l_orderkey, l_linenumber) rna,
        ROW_NUMBER() OVER (PARTITION BY part ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) rnd
      FROM li),
f AS (SELECT part, COUNT(*) n_sales,
        MIN(CASE WHEN rna = 1 THEN cents END) first_cents,
        MIN(CASE WHEN rnd = 1 THEN cents END) last_cents
      FROM o GROUP BY part)
SELECT part, n_sales, first_cents, last_cents,
  CAST(CASE WHEN last_cents > first_cents THEN 1
            WHEN last_cents < first_cents THEN -1 ELSE 0 END AS BIGINT) direction,
  CAST(ABS(last_cents - first_cents) * 1000000 DIV first_cents AS BIGINT) abs_drift_ppm
FROM f ORDER BY abs_drift_ppm DESC, part LIMIT 20""",

    "q164_temporal_split_drift" -> """
WITH mid AS (SELECT unix_micros(MIN(ts)) mn, unix_micros(MAX(ts)) mx FROM events),
tagged AS (SELECT event_type, event_id, value,
    CASE WHEN unix_micros(ts) < (mn + mx) DIV 2 THEN 'before' ELSE 'after' END half
  FROM events CROSS JOIN mid),
ranked AS (SELECT event_type, half, value,
    ROW_NUMBER() OVER (PARTITION BY event_type, half ORDER BY value, event_id) rn,
    COUNT(*) OVER (PARTITION BY event_type, half) n
  FROM tagged),
med AS (SELECT event_type, half, value FROM ranked WHERE rn = (n + 1) DIV 2),
counts AS (SELECT event_type, half, COUNT(*) n FROM tagged GROUP BY event_type, half)
SELECT cb.event_type, cb.n AS n_before, ca.n AS n_after,
  CAST(ca.n * 1000000 DIV cb.n AS BIGINT) rate_ratio_ppm,
  mb.value AS median_before, ma.value AS median_after,
  CAST(CASE WHEN ma.value > mb.value THEN 1
            WHEN ma.value < mb.value THEN -1 ELSE 0 END AS BIGINT) value_shift
FROM counts cb
JOIN counts ca ON ca.event_type = cb.event_type AND cb.half = 'before' AND ca.half = 'after'
JOIN med mb ON mb.event_type = cb.event_type AND mb.half = 'before'
JOIN med ma ON ma.event_type = cb.event_type AND ma.half = 'after'
ORDER BY cb.event_type""",

    "q166_cohort_ltv" -> """
WITH o AS (SELECT o_custkey, date_format(date_trunc('month', o_orderdate), 'yyyy-MM') m,
             CAST(o_totalprice AS DECIMAL(14,2)) price_d FROM orders),
first AS (SELECT o_custkey, MIN(m) cohort FROM o GROUP BY o_custkey),
cohorts AS (SELECT cohort, COUNT(*) n_customers FROM first GROUP BY cohort),
phases AS (SELECT f.cohort,
    CAST(SUM(CASE WHEN o.m = f.cohort THEN 1 ELSE 0 END) AS BIGINT) orders_first,
    CAST(SUM(CASE WHEN o.m <> f.cohort THEN 1 ELSE 0 END) AS BIGINT) orders_later,
    SUM(CASE WHEN o.m = f.cohort THEN o.price_d END) rev_first_d,
    SUM(CASE WHEN o.m <> f.cohort THEN o.price_d END) rev_later_d
  FROM o JOIN first f ON f.o_custkey = o.o_custkey GROUP BY f.cohort)
SELECT c.cohort, c.n_customers, p.orders_first, p.orders_later,
  CAST(COALESCE(p.rev_first_d, 0) AS DOUBLE) rev_first,
  CAST(COALESCE(p.rev_later_d, 0) AS DOUBLE) rev_later,
  CAST(CAST(COALESCE(p.rev_later_d, 0) * 100 AS BIGINT) * 1000000
    DIV GREATEST(CAST(COALESCE(p.rev_first_d, 0) * 100 AS BIGINT), 1) AS BIGINT) ltv_ratio_ppm
FROM cohorts c JOIN phases p ON p.cohort = c.cohort
ORDER BY c.cohort""",

    "q171_brand_share_shift" -> """
WITH li AS (SELECT l_partkey, year(l_shipdate) y,
    CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) net_d
  FROM lineitem),
yy AS (SELECT MIN(y) y1, MAX(y) y2 FROM li),
by_brand AS (SELECT p_brand,
    CAST(COALESCE(SUM(CASE WHEN li.y = yy.y1 THEN li.net_d END), 0) * 10000 AS BIGINT) r1,
    CAST(COALESCE(SUM(CASE WHEN li.y = yy.y2 THEN li.net_d END), 0) * 10000 AS BIGINT) r2
  FROM li CROSS JOIN yy JOIN part ON p_partkey = l_partkey
  WHERE li.y = yy.y1 OR li.y = yy.y2 GROUP BY p_brand),
ranked AS (SELECT p_brand, r1, r2,
    CAST(SUM(r1) OVER () AS BIGINT) t1, CAST(SUM(r2) OVER () AS BIGINT) t2,
    ROW_NUMBER() OVER (ORDER BY r1 DESC, p_brand) rank_first,
    ROW_NUMBER() OVER (ORDER BY r2 DESC, p_brand) rank_last
  FROM by_brand)
SELECT p_brand,
  CAST(r1 AS DOUBLE) / 10000 rev_first,
  CAST(r2 AS DOUBLE) / 10000 rev_last,
  CAST(r1 * 1000000 DIV GREATEST(t1, 1) AS BIGINT) share_first_ppm,
  CAST(r2 * 1000000 DIV GREATEST(t2, 1) AS BIGINT) share_last_ppm,
  CAST(r2 * 1000000 DIV GREATEST(t2, 1) - r1 * 1000000 DIV GREATEST(t1, 1) AS BIGINT) share_delta_ppm,
  CAST(rank_first AS BIGINT) rank_first,
  CAST(rank_last AS BIGINT) rank_last,
  CAST(rank_first - rank_last AS BIGINT) rank_gain
FROM ranked ORDER BY p_brand""",

    "q173_ship_lag_profile" -> """
WITH lag AS (SELECT o_orderpriority pri,
    CAST(datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) AS BIGINT) lag
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
counts AS (SELECT pri, lag, COUNT(*) c FROM lag GROUP BY pri, lag),
cum AS (SELECT pri, lag, SUM(c) OVER (PARTITION BY pri ORDER BY lag
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum FROM counts),
tot AS (SELECT pri, COUNT(*) n,
    SUM(CASE WHEN lag > 365 THEN 1 ELSE 0 END) n_ov FROM lag GROUP BY pri)
SELECT t.pri o_orderpriority, CAST(t.n AS BIGINT) n_items,
  MIN(CASE WHEN cum.cum >= (t.n + 1) DIV 2 THEN cum.lag END) median_lag_days,
  MIN(CASE WHEN cum.cum >= (9 * t.n + 9) DIV 10 THEN cum.lag END) p90_lag_days,
  CAST(CAST(t.n_ov AS BIGINT) * 1000000 DIV t.n AS BIGINT) overdue_ppm
FROM cum JOIN tot t ON t.pri = cum.pri
GROUP BY t.pri, t.n, t.n_ov ORDER BY o_orderpriority""",

    "q175_segment_migration" -> """
WITH mid AS (SELECT (unix_micros(CAST(MIN(o_orderdate) AS TIMESTAMP))
                   + unix_micros(CAST(MAX(o_orderdate) AS TIMESTAMP))) DIV 2 mid FROM orders),
spend AS (SELECT o_custkey,
    CASE WHEN unix_micros(CAST(o_orderdate AS TIMESTAMP)) < mid THEN 1 ELSE 2 END half,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) spend
  FROM orders CROSS JOIN mid GROUP BY o_custkey, half),
both_c AS (SELECT o_custkey FROM spend GROUP BY o_custkey HAVING COUNT(*) = 2),
sp AS (SELECT spend.* FROM spend JOIN both_c USING (o_custkey)),
n1 AS (SELECT COUNT(*) n FROM sp WHERE half = 1),
n2 AS (SELECT COUNT(*) n FROM sp WHERE half = 2),
v1 AS (SELECT spend, COUNT(*) c FROM sp WHERE half = 1 GROUP BY spend),
v2 AS (SELECT spend, COUNT(*) c FROM sp WHERE half = 2 GROUP BY spend),
q1m AS (SELECT spend, CAST(COALESCE(SUM(c) OVER (ORDER BY spend
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 4 DIV n1.n + 1 AS BIGINT) q1
  FROM v1 CROSS JOIN n1),
q2m AS (SELECT spend, CAST(COALESCE(SUM(c) OVER (ORDER BY spend
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 4 DIV n2.n + 1 AS BIGINT) q2
  FROM v2 CROSS JOIN n2),
h1 AS (SELECT o_custkey, q1 FROM sp JOIN q1m USING (spend) WHERE half = 1),
h2 AS (SELECT o_custkey, q2 FROM sp JOIN q2m USING (spend) WHERE half = 2),
matrix AS (SELECT q1, q2, COUNT(*) n_customers FROM h1 JOIN h2 USING (o_custkey) GROUP BY q1, q2),
row_tot AS (SELECT q1, CAST(SUM(n_customers) AS BIGINT) row_n FROM matrix GROUP BY q1)
SELECT m.q1 q_first, m.q2 q_last, m.n_customers,
  CAST(m.n_customers * 1000000 DIV rt.row_n AS BIGINT) origin_share_ppm
FROM matrix m JOIN row_tot rt ON rt.q1 = m.q1
ORDER BY q_first, q_last""",

    "q182_top_customer_stability" -> """
WITH yy AS (SELECT MIN(year(o_orderdate)) y1, MAX(year(o_orderdate)) y2 FROM orders),
spend AS (SELECT CASE WHEN year(o_orderdate) = yy.y1 THEN 1 ELSE 2 END ep, o_custkey,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) spend
  FROM orders CROSS JOIN yy
  WHERE year(o_orderdate) = yy.y1 OR year(o_orderdate) = yy.y2
  GROUP BY ep, o_custkey),
thr AS (SELECT ep, MAX(spend) FILTER (WHERE cum >= k) thr FROM (
    SELECT ep, spend,
      CAST(SUM(c) OVER (PARTITION BY ep ORDER BY spend DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum,
      LEAST(100, SUM(c) OVER (PARTITION BY ep)) k
    FROM (SELECT ep, spend, COUNT(*) c FROM spend GROUP BY ep, spend))
  GROUP BY ep),
t1 AS (SELECT s.o_custkey, t.thr FROM spend s JOIN thr t ON t.ep = 1 AND s.ep = 1 AND s.spend >= t.thr),
t2 AS (SELECT s.o_custkey, t.thr FROM spend s JOIN thr t ON t.ep = 2 AND s.ep = 2 AND s.spend >= t.thr),
n1 AS (SELECT COUNT(*) n_top_first, CAST(MIN(thr) AS BIGINT) thr_first_cents FROM t1),
n2 AS (SELECT COUNT(*) n_top_last, CAST(MIN(thr) AS BIGINT) thr_last_cents FROM t2),
com AS (SELECT COUNT(*) n_common FROM t1 JOIN t2 USING (o_custkey))
SELECT CAST(yy.y1 AS BIGINT) year_first, CAST(yy.y2 AS BIGINT) year_last,
  n1.n_top_first, n2.n_top_last, com.n_common,
  CAST(com.n_common * 1000000 DIV (n1.n_top_first + n2.n_top_last - com.n_common) AS BIGINT) jaccard_ppm,
  n1.thr_first_cents, n2.thr_last_cents
FROM yy CROSS JOIN n1 CROSS JOIN n2 CROSS JOIN com""",

    "q183_shingle_df_spectrum" -> """
WITH d AS (SELECT doc_id, filter(split(lower(text), ' '), x -> x <> '') l FROM documents),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) x AS i),
t AS (SELECT DISTINCT doc_id,
        concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh FROM s),
df AS (SELECT sh, COUNT(*) dfreq FROM t GROUP BY sh),
spec AS (SELECT CASE WHEN dfreq < 2 THEN 0 WHEN dfreq < 4 THEN 1 WHEN dfreq < 8 THEN 2
      WHEN dfreq < 16 THEN 3 WHEN dfreq < 32 THEN 4 WHEN dfreq < 64 THEN 5
      WHEN dfreq < 128 THEN 6 WHEN dfreq < 256 THEN 7 WHEN dfreq < 512 THEN 8
      WHEN dfreq < 1024 THEN 9 WHEN dfreq < 2048 THEN 10 ELSE 11 END df_band,
    COUNT(*) n_shingles, CAST(SUM(dfreq) AS BIGINT) n_occurrences
  FROM df GROUP BY df_band),
tot AS (SELECT CAST(SUM(n_occurrences) AS BIGINT) tot FROM spec)
SELECT CAST(df_band AS BIGINT) df_band, n_shingles, n_occurrences,
  CAST(n_occurrences * 1000000 DIV tot.tot AS BIGINT) occurrence_share_ppm
FROM spec CROSS JOIN tot ORDER BY df_band""",

    "q185_acctbal_revenue_grid" -> """
WITH cust AS (SELECT c_custkey, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) bal FROM customer),
rev AS (SELECT o_custkey, CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) rev
  FROM orders GROUP BY o_custkey),
cr AS (SELECT c_custkey, bal, COALESCE(rev, 0) rev
  FROM cust LEFT JOIN rev ON o_custkey = c_custkey),
n AS (SELECT COUNT(*) n FROM cr),
qb AS (SELECT bal, CAST(COALESCE(SUM(cn) OVER (ORDER BY bal
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 4 DIV n.n + 1 AS BIGINT) q_bal
  FROM (SELECT bal, COUNT(*) cn FROM cr GROUP BY bal) CROSS JOIN n),
qr AS (SELECT rev, CAST(COALESCE(SUM(cn) OVER (ORDER BY rev
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 4 DIV n.n + 1 AS BIGINT) q_rev
  FROM (SELECT rev, COUNT(*) cn FROM cr GROUP BY rev) CROSS JOIN n),
grid AS (SELECT q_bal, q_rev, COUNT(*) n_customers
  FROM cr JOIN qb USING (bal) JOIN qr USING (rev) GROUP BY q_bal, q_rev),
row_tot AS (SELECT q_bal, CAST(SUM(n_customers) AS BIGINT) row_n FROM grid GROUP BY q_bal)
SELECT g.q_bal, g.q_rev, g.n_customers,
  CAST(g.n_customers * 1000000 DIV rt.row_n AS BIGINT) balance_share_ppm
FROM grid g JOIN row_tot rt ON rt.q_bal = g.q_bal
ORDER BY g.q_bal, g.q_rev""",

    "q186_weekend_value_shift" -> """
WITH ev AS (SELECT event_type, value,
    CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END we,
    date_trunc('day', ts) d
  FROM events),
days AS (SELECT we, COUNT(*) n_days FROM (SELECT DISTINCT we, d FROM ev) GROUP BY we),
counts AS (SELECT event_type, we, COUNT(*) n FROM ev GROUP BY event_type, we),
vals AS (SELECT event_type, we, value, COUNT(*) c FROM ev GROUP BY event_type, we, value),
cum AS (SELECT event_type, we, value, SUM(c) OVER (PARTITION BY event_type, we
    ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum FROM vals),
med AS (SELECT cum.event_type, cum.we,
    MIN(CASE WHEN cum.cum >= (c.n + 1) DIV 2 THEN cum.value END) median_value
  FROM cum JOIN counts c ON c.event_type = cum.event_type AND c.we = cum.we
  GROUP BY cum.event_type, cum.we)
SELECT cwd.event_type,
  CAST(cwd.n AS BIGINT) n_wd, CAST(cwe.n AS BIGINT) n_we,
  mwd.median_value median_wd, mwe.median_value median_we,
  CAST((cwe.n * dwd.n_days) * 1000000 DIV (cwd.n * dwe.n_days) AS BIGINT) rate_ratio_ppm
FROM counts cwd
JOIN counts cwe ON cwe.event_type = cwd.event_type AND cwd.we = 0 AND cwe.we = 1
JOIN med mwd ON mwd.event_type = cwd.event_type AND mwd.we = 0
JOIN med mwe ON mwe.event_type = cwd.event_type AND mwe.we = 1
JOIN days dwd ON dwd.we = 0 JOIN days dwe ON dwe.we = 1
ORDER BY cwd.event_type""",

    "q204_value_ladder" -> """
WITH e AS (SELECT user_id, event_type, value, unix_micros(ts) us, event_id FROM events),
r AS (SELECT user_id, event_type, value,
    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY us, event_id) ra,
    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY us DESC, event_id DESC) rd
  FROM e),
fl AS (SELECT user_id, event_type, COUNT(*) n,
    MAX(CASE WHEN ra = 1 THEN value END) first_v,
    MAX(CASE WHEN rd = 1 THEN value END) last_v
  FROM r GROUP BY user_id, event_type),
per AS (SELECT event_type, COUNT(*) n_users,
    CAST(SUM(CASE WHEN last_v > first_v THEN 1 ELSE 0 END) AS BIGINT) n_up,
    CAST(SUM(CASE WHEN last_v < first_v THEN 1 ELSE 0 END) AS BIGINT) n_down
  FROM fl WHERE n >= 2 GROUP BY event_type)
SELECT event_type, n_users, n_up, n_down,
  CAST(n_up * 1000000 DIV n_users AS BIGINT) up_ppm,
  CAST(n_down * 1000000 DIV n_users AS BIGINT) down_ppm
FROM per ORDER BY event_type""",

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
  CAST(c.cum * 1000000 DIV t.tw AS BIGINT) cum_share_ppm
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
  WHERE c.cum >= (t.n + 1) DIV 2 GROUP BY c.event_type),
dev AS (SELECT v.event_type, m.med, abs(v.v - m.med) dev, CAST(SUM(c) AS BIGINT) c
  FROM vc v JOIN med m ON m.event_type = v.event_type
  GROUP BY v.event_type, m.med, abs(v.v - m.med)),
cum2 AS (SELECT event_type, dev,
    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY dev) AS BIGINT) cum
  FROM dev),
mad AS (SELECT c.event_type, MIN(dev) mad
  FROM cum2 c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (t.n + 1) DIV 2 GROUP BY c.event_type),
win AS (SELECT d.event_type, CAST(SUM(d.c) AS BIGINT) n_within
  FROM dev d JOIN mad a ON a.event_type = d.event_type
  WHERE d.dev <= a.mad GROUP BY d.event_type)
SELECT t.event_type, t.n, m.med, a.mad,
  CAST(w.n_within * 1000000 DIV t.n AS BIGINT) within_mad_ppm
FROM tot t JOIN med m ON m.event_type = t.event_type
JOIN mad a ON a.event_type = t.event_type
JOIN win w ON w.event_type = t.event_type
ORDER BY t.event_type""",

    "q208_session_cooccur" -> """
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN unix_millis(ts) - unix_millis(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
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
  CAST(p.n_both * 1000000 DIV (n1.n_t + n2.n_t - p.n_both) AS BIGINT) jaccard_ppm
FROM pairs p JOIN nt n1 ON n1.event_type = p.t1
JOIN nt n2 ON n2.event_type = p.t2
ORDER BY p.t1, p.t2""",

    "q213_kendall_discount_qty" -> """
WITH cells AS (SELECT p_brand, CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) d,
    CAST(l_quantity AS BIGINT) q, COUNT(*) c
  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY p_brand, d, q),
tot AS (SELECT p_brand, CAST(SUM(c) AS BIGINT) n FROM cells GROUP BY p_brand),
pairs AS (SELECT a.p_brand,
    CAST(SUM(CASE WHEN a.d < b.d AND a.q < b.q THEN a.c * b.c ELSE 0 END) AS BIGINT) n_conc,
    CAST(SUM(CASE WHEN a.d < b.d AND a.q > b.q THEN a.c * b.c ELSE 0 END) AS BIGINT) n_disc
  FROM cells a JOIN cells b ON b.p_brand = a.p_brand
    AND (a.d < b.d OR (a.d = b.d AND a.q < b.q))
  GROUP BY a.p_brand)
SELECT p.p_brand, t.n, p.n_conc, p.n_disc,
  CAST(p.n_conc * 2000000 DIV (t.n * (t.n - 1)) AS BIGINT) conc_ppm,
  CAST(p.n_disc * 2000000 DIV (t.n * (t.n - 1)) AS BIGINT) disc_ppm
FROM pairs p JOIN tot t ON t.p_brand = p.p_brand ORDER BY p.p_brand""",

    "q217_dim_quantiles" -> """
WITH xc AS (SELECT r.pos, element_at(embedding, r.pos) x, COUNT(*) c
  FROM embeddings CROSS JOIN (SELECT explode(sequence(1, 64)) pos) r GROUP BY r.pos, x),
tot AS (SELECT pos, CAST(SUM(c) AS BIGINT) n FROM xc GROUP BY pos),
cum AS (SELECT pos, x, c,
    CAST(SUM(c) OVER (PARTITION BY pos ORDER BY x) AS BIGINT) cum
  FROM xc),
p01 AS (SELECT c.pos, MIN(x) p01 FROM cum c JOIN tot t ON t.pos = c.pos
  WHERE c.cum >= (t.n + 99) DIV 100 GROUP BY c.pos),
p99 AS (SELECT c.pos, MIN(x) p99 FROM cum c JOIN tot t ON t.pos = c.pos
  WHERE c.cum >= (t.n * 99 + 99) DIV 100 GROUP BY c.pos)
SELECT x.pos, t.n, CAST(a.p01 AS DOUBLE) p01, CAST(b.p99 AS DOUBLE) p99,
  CAST(SUM(CASE WHEN x.x < a.p01 OR x.x > b.p99 THEN x.c ELSE 0 END) * 1000000
    DIV t.n AS BIGINT) clipped_ppm
FROM xc x JOIN p01 a ON a.pos = x.pos JOIN p99 b ON b.pos = x.pos
JOIN tot t ON t.pos = x.pos
GROUP BY x.pos, t.n, a.p01, b.p99 ORDER BY x.pos""",

    "q221_outlier_fences" -> """
WITH vc AS (SELECT event_type, value v, COUNT(*) c FROM events GROUP BY event_type, value),
tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) n FROM vc GROUP BY event_type),
cum AS (SELECT event_type, v,
    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) cum
  FROM vc),
q1 AS (SELECT c.event_type, MIN(v) q1 FROM cum c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (t.n + 3) DIV 4 GROUP BY c.event_type),
q3 AS (SELECT c.event_type, MIN(v) q3 FROM cum c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (3 * t.n + 3) DIV 4 GROUP BY c.event_type)
SELECT v.event_type, t.n, a.q1, b.q3,
  CAST(SUM(CASE WHEN v.v < a.q1 - 1.5 * (b.q3 - a.q1) THEN v.c ELSE 0 END) * 1000000 DIV t.n AS BIGINT) lo_ppm,
  CAST(SUM(CASE WHEN v.v > b.q3 + 1.5 * (b.q3 - a.q1) THEN v.c ELSE 0 END) * 1000000 DIV t.n AS BIGINT) hi_ppm
FROM vc v JOIN q1 a ON a.event_type = v.event_type
JOIN q3 b ON b.event_type = v.event_type
JOIN tot t ON t.event_type = v.event_type
GROUP BY v.event_type, t.n, a.q1, b.q3 ORDER BY v.event_type""",

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
rev AS (SELECT c_nation, CAST(rev4 DIV 100 AS BIGINT) rev,
    CAST(local4 DIV 100 AS BIGINT) local_rev FROM rev4),
tot AS (SELECT CAST(SUM(rev) AS BIGINT) g_rev, CAST(SUM(local_rev) AS BIGINT) g_local FROM rev)
SELECT c_nation, rev rev_cents, local_rev local_cents,
  CAST(local_rev * 1000000 DIV rev AS BIGINT) local_ppm,
  CAST(local_rev * 1000000 DIV rev - g_local * 1000000 DIV g_rev AS BIGINT) delta_ppm
FROM rev CROSS JOIN tot ORDER BY c_nation""",

    "q225_benford_price" -> """
WITH d AS (SELECT p_brand,
    CAST(substring(CAST(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT) AS STRING), 1, 1) AS BIGINT) digit,
    COUNT(*) n_bd
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY p_brand, digit),
bt AS (SELECT p_brand, CAST(SUM(n_bd) AS BIGINT) n_b FROM d GROUP BY p_brand),
shares AS (SELECT digit, CAST(d.n_bd * 1000000 DIV bt.n_b AS BIGINT) ppm
  FROM d JOIN bt ON bt.p_brand = d.p_brand),
corpus AS (SELECT digit, CAST(SUM(n_bd) AS BIGINT) n_d FROM d GROUP BY digit),
g AS (SELECT CAST(SUM(n_bd) AS BIGINT) n FROM d)
SELECT s.digit, c.n_d n, CAST(c.n_d * 1000000 DIV g.n AS BIGINT) corpus_ppm,
  CAST(MIN(s.ppm) AS BIGINT) min_brand_ppm, CAST(MAX(s.ppm) AS BIGINT) max_brand_ppm
FROM shares s JOIN corpus c ON c.digit = s.digit CROSS JOIN g
GROUP BY s.digit, c.n_d, g.n ORDER BY s.digit""",

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
  CAST(datediff(h.half_day, t.first_day) * 1000000
    DIV greatest(datediff(t.last_day, t.first_day), 1) AS BIGINT) half_pos_ppm
FROM tot t JOIN half h ON h.p_brand = t.p_brand ORDER BY t.p_brand""",

    "q234_survivorship_policies" -> """
WITH toks AS (SELECT doc_id, source, n_chars, tok FROM documents
              LATERAL VIEW explode(split(LOWER(text), ' ')) e AS tok),
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
  CAST(SUM(CASE WHEN p1 = p2 AND p2 = p3 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) all_agree_ppm,
  CAST(SUM(CASE WHEN p1 = p2 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) id_len_ppm,
  CAST(SUM(CASE WHEN p1 = p3 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) id_src_ppm,
  CAST(SUM(CASE WHEN p2 = p3 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) len_src_ppm
FROM j""",

    "q247_priority_premium" -> """
WITH oc AS (SELECT o_orderpriority prio,
    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) c2 FROM orders),
pc AS (SELECT prio, c2, COUNT(*) c FROM oc GROUP BY prio, c2),
pt AS (SELECT prio, CAST(SUM(c) AS BIGINT) n FROM pc GROUP BY prio),
cum AS (SELECT prio, c2, CAST(SUM(c) OVER (PARTITION BY prio ORDER BY c2) AS BIGINT) cum FROM pc),
med AS (SELECT c.prio, MIN(c2) median_cents
  FROM cum c JOIN pt t ON t.prio = c.prio WHERE c.cum >= (t.n + 1) DIV 2 GROUP BY c.prio),
gc AS (SELECT c2, COUNT(*) c FROM oc GROUP BY c2),
gt AS (SELECT CAST(SUM(c) AS BIGINT) n FROM gc),
gcum AS (SELECT c2, CAST(SUM(c) OVER (ORDER BY c2) AS BIGINT) cum FROM gc),
gmed AS (SELECT MIN(c2) g_median FROM gcum CROSS JOIN gt WHERE cum >= (n + 1) DIV 2)
SELECT m.prio, t.n, m.median_cents, g.g_median,
  CAST(m.median_cents * 1000000 DIV g.g_median AS BIGINT) rel_ppm
FROM med m JOIN pt t ON t.prio = m.prio CROSS JOIN gmed g
ORDER BY m.prio""",

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
fq AS (SELECT MIN(CASE WHEN cum >= (n + 3) DIV 4 THEN fv END) f1,
    MIN(CASE WHEN cum >= (n + 1) DIV 2 THEN fv END) f2,
    MIN(CASE WHEN cum >= (3 * n + 3) DIV 4 THEN fv END) f3
  FROM (SELECT fv, SUM(c) OVER (ORDER BY fv) cum, n FROM
    (SELECT fv, COUNT(*) c FROM cust GROUP BY fv)
    CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) n FROM cust))),
lq AS (SELECT MIN(CASE WHEN cum >= (n + 3) DIV 4 THEN lv END) l1,
    MIN(CASE WHEN cum >= (n + 1) DIV 2 THEN lv END) l2,
    MIN(CASE WHEN cum >= (3 * n + 3) DIV 4 THEN lv END) l3
  FROM (SELECT lv, SUM(c) OVER (ORDER BY lv) cum, n FROM
    (SELECT lv, COUNT(*) c FROM cust GROUP BY lv)
    CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) n FROM cust)))
SELECT CASE WHEN fv < f1 THEN 1 WHEN fv < f2 THEN 2 WHEN fv < f3 THEN 3 ELSE 4 END first_q,
  CASE WHEN lv < l1 THEN 1 WHEN lv < l2 THEN 2 WHEN lv < l3 THEN 3 ELSE 4 END ltv_q,
  COUNT(*) n_customers
FROM cust CROSS JOIN fq CROSS JOIN lq
GROUP BY first_q, ltv_q ORDER BY first_q, ltv_q""",

    "q253_boundary_tokens" -> """
WITH fl AS (SELECT lang, filter(split(lower(text), ' '), x -> x <> '') l
  FROM documents),
ends AS (SELECT lang, element_at(l, 1) ft, element_at(l, size(l)) lt FROM fl WHERE size(l) >= 1),
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
  CAST(f.mn * 1000000 DIV t.n_docs AS BIGINT) first_ppm,
  l.top_last, CAST(l.mn * 1000000 DIV t.n_docs AS BIGINT) last_ppm
FROM tot t JOIN ftop f ON f.lang = t.lang JOIN ltop l ON l.lang = t.lang
ORDER BY t.lang""",

    "q256_gap_quantiles" -> """
WITH g AS (SELECT event_type, sec FROM (
    SELECT event_type,
      (unix_micros(ts) - LAG(unix_micros(ts)) OVER (PARTITION BY user_id, event_type
        ORDER BY unix_micros(ts), event_id)) DIV 1000000 sec
    FROM events) WHERE sec IS NOT NULL),
gc AS (SELECT event_type, CAST(sec AS BIGINT) sec, COUNT(*) c FROM g GROUP BY event_type, sec),
tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) n FROM gc GROUP BY event_type),
cum AS (SELECT event_type, sec, CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY sec) AS BIGINT) cum
  FROM gc),
p50 AS (SELECT c.event_type, MIN(sec) p50_s FROM cum c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (t.n + 1) DIV 2 GROUP BY c.event_type),
p90 AS (SELECT c.event_type, MIN(sec) p90_s FROM cum c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (9 * t.n + 9) DIV 10 GROUP BY c.event_type),
p99 AS (SELECT c.event_type, MIN(sec) p99_s FROM cum c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum >= (99 * t.n + 99) DIV 100 GROUP BY c.event_type)
SELECT t.event_type, t.n n_gaps, a.p50_s, b.p90_s, c.p99_s
FROM tot t JOIN p50 a ON a.event_type = t.event_type
JOIN p90 b ON b.event_type = t.event_type
JOIN p99 c ON c.event_type = t.event_type
ORDER BY t.event_type""",

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
    DIV SUM(r.rev) AS BIGINT) top_share_ppm
FROM rev r JOIN thr h ON h.n_name = r.n_name JOIN rt t ON t.n_name = r.n_name
GROUP BY r.n_name, t.n ORDER BY r.n_name""",

    "q265_first_brand_loyalty" -> """
WITH lines AS (SELECT o_custkey, o_orderdate, o_orderkey, l_linenumber, p_brand
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey),
first AS (SELECT o_custkey, p_brand AS first_brand FROM (
    SELECT o_custkey, p_brand, ROW_NUMBER() OVER (PARTITION BY o_custkey
      ORDER BY o_orderdate, o_orderkey, l_linenumber, p_brand) AS rn FROM lines)
  WHERE rn = 1),
bc AS (SELECT o_custkey, p_brand, COUNT(*) AS c FROM lines GROUP BY o_custkey, p_brand),
mx AS (SELECT o_custkey, MAX(c) AS mc FROM bc GROUP BY o_custkey),
modal AS (SELECT bc.o_custkey, MIN(p_brand) AS modal_brand
  FROM bc JOIN mx ON mx.o_custkey = bc.o_custkey WHERE bc.c = mx.mc
  GROUP BY bc.o_custkey)
SELECT c_mktsegment, COUNT(*) AS n_customers,
  CAST(SUM(CASE WHEN first_brand = modal_brand THEN 1 ELSE 0 END) AS BIGINT) AS n_loyal,
  CAST(SUM(CASE WHEN first_brand = modal_brand THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) AS loyal_ppm
FROM first JOIN modal ON modal.o_custkey = first.o_custkey
JOIN customer ON c_custkey = first.o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q50_dedup_lsh_bands" -> """
WITH d AS (SELECT doc_id, split(lower(text), ' ') l FROM documents),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) x AS i),
t AS (SELECT DISTINCT doc_id,
        concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh FROM s),
sig AS (SELECT doc_id,
  MIN(substr(md5(sh), 1, 4)) h1, MIN(substr(md5(sh), 5, 4)) h2,
  MIN(substr(md5(sh), 9, 4)) h3, MIN(substr(md5(sh), 13, 4)) h4,
  MIN(substr(md5(sh), 17, 4)) h5, MIN(substr(md5(sh), 21, 4)) h6,
  MIN(substr(md5(sh), 25, 4)) h7, MIN(substr(md5(sh), 29, 4)) h8
  FROM t GROUP BY doc_id),
cand AS (
  SELECT a.doc_id i, b.doc_id j FROM sig a JOIN sig b
    ON a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3 AND a.h4 = b.h4 AND a.doc_id < b.doc_id
  UNION SELECT a.doc_id, b.doc_id FROM sig a JOIN sig b
    ON a.h5 = b.h5 AND a.h6 = b.h6 AND a.h7 = b.h7 AND a.h8 = b.h8 AND a.doc_id < b.doc_id),
card AS (SELECT doc_id, COUNT(*) nt FROM t GROUP BY doc_id),
inter AS (SELECT c.i, c.j, COUNT(*) ci FROM cand c
          JOIN t ta ON ta.doc_id = c.i JOIN t tb ON tb.doc_id = c.j AND ta.sh = tb.sh
          GROUP BY c.i, c.j),
jac AS (SELECT c.i, c.j, CAST(COALESCE(x.ci, 0) AS DOUBLE) / (ca.nt + cb.nt - COALESCE(x.ci, 0)) jc
        FROM cand c LEFT JOIN inter x ON x.i = c.i AND x.j = c.j
        JOIN card ca ON ca.doc_id = c.i JOIN card cb ON cb.doc_id = c.j)
SELECT COUNT(*) n_candidates,
       CAST(SUM(CASE WHEN jc >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) n_verified,
       CAST(ROUND(AVG(CAST(jc AS DECIMAL(18,9))), 6) AS DOUBLE) avg_jaccard
FROM jac""",

    "q56_ann_ivf" -> """
WITH cm AS (
  SELECT label, r.pos, CAST(ROUND(AVG(CAST(element_at(embedding, r.pos) AS DECIMAL(18,9))), 6) AS DOUBLE) c
  FROM embeddings CROSS JOIN (SELECT explode(sequence(1, 64)) pos) r GROUP BY label, r.pos),
cent AS (SELECT label AS clabel,
           transform(array_sort(collect_list(struct(pos, c))), s -> s.c) cent
         FROM cm GROUP BY label),
assign AS (
  SELECT e.vec_id, e.label, e.embedding, c.clabel,
    aggregate(zip_with(e.embedding, c.cent,
      (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), 0D, (acc, x) -> acc + x) d2
  FROM embeddings e CROSS JOIN cent c),
bucketed AS (
  SELECT vec_id, label, embedding, clabel AS bucket,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn
  FROM assign),
b AS (SELECT vec_id, label, embedding, bucket FROM bucketed WHERE rn = 1),
qv AS (SELECT embedding v, bucket FROM b WHERE vec_id = 0)
SELECT e.vec_id, e.label,
  ROUND(aggregate(zip_with(e.embedding, qv.v, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, x) -> acc + x)
  / (SQRT(aggregate(e.embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
   * SQRT(aggregate(qv.v, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) cos_sim
FROM b e JOIN qv ON e.bucket = qv.bucket
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id LIMIT 5""",

    "q161_lsh_band_curve" -> """
WITH d AS (SELECT doc_id, filter(split(lower(text), ' '), x -> x <> '') l FROM documents),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) x AS i),
t AS (SELECT DISTINCT doc_id,
        concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh FROM s),
sig AS (SELECT doc_id,
  MIN(substr(md5(sh), 1, 4)) h1, MIN(substr(md5(sh), 5, 4)) h2,
  MIN(substr(md5(sh), 9, 4)) h3, MIN(substr(md5(sh), 13, 4)) h4,
  MIN(substr(md5(sh), 17, 4)) h5, MIN(substr(md5(sh), 21, 4)) h6,
  MIN(substr(md5(sh), 25, 4)) h7, MIN(substr(md5(sh), 29, 4)) h8
  FROM t GROUP BY doc_id),
bands AS (
  SELECT '2x4' cfg, doc_id, 1 bi, h1||h2||h3||h4 bv FROM sig
  UNION ALL SELECT '2x4', doc_id, 2, h5||h6||h7||h8 FROM sig
  UNION ALL SELECT '4x2', doc_id, 1, h1||h2 FROM sig
  UNION ALL SELECT '4x2', doc_id, 2, h3||h4 FROM sig
  UNION ALL SELECT '4x2', doc_id, 3, h5||h6 FROM sig
  UNION ALL SELECT '4x2', doc_id, 4, h7||h8 FROM sig
  UNION ALL SELECT '8x1', doc_id, 1, h1 FROM sig
  UNION ALL SELECT '8x1', doc_id, 2, h2 FROM sig
  UNION ALL SELECT '8x1', doc_id, 3, h3 FROM sig
  UNION ALL SELECT '8x1', doc_id, 4, h4 FROM sig
  UNION ALL SELECT '8x1', doc_id, 5, h5 FROM sig
  UNION ALL SELECT '8x1', doc_id, 6, h6 FROM sig
  UNION ALL SELECT '8x1', doc_id, 7, h7 FROM sig
  UNION ALL SELECT '8x1', doc_id, 8, h8 FROM sig),
cand AS (SELECT DISTINCT a.cfg, a.doc_id i, b.doc_id j
         FROM bands a JOIN bands b
           ON a.cfg = b.cfg AND a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id),
tk AS (SELECT t.doc_id, t.sh FROM t
       JOIN (SELECT sh FROM t GROUP BY sh HAVING COUNT(*) <= 1000) k ON k.sh = t.sh),
card AS (SELECT doc_id, COUNT(*) nt FROM tk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM tk a JOIN tk b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
truth AS (SELECT x.i, x.j FROM inter x
          JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j
          WHERE 10 * x.ci >= 7 * (ca.nt + cb.nt - x.ci)),
nt AS (SELECT COUNT(*) n_true_total FROM truth),
nc AS (SELECT cfg, COUNT(*) n_candidates FROM cand GROUP BY cfg),
nv AS (SELECT c.cfg, COUNT(*) n_true_candidates
       FROM cand c JOIN truth tr ON tr.i = c.i AND tr.j = c.j GROUP BY c.cfg)
SELECT nc.cfg, nc.n_candidates,
  CAST(COALESCE(nv.n_true_candidates, 0) AS BIGINT) n_true_candidates,
  CAST(nt.n_true_total AS BIGINT) n_true_total,
  CAST(COALESCE(nv.n_true_candidates, 0) * 1000000 DIV GREATEST(nt.n_true_total, 1) AS BIGINT) recall_ppm,
  CAST(COALESCE(nv.n_true_candidates, 0) * 1000000 DIV GREATEST(nc.n_candidates, 1) AS BIGINT) precision_ppm
FROM nc LEFT JOIN nv ON nv.cfg = nc.cfg CROSS JOIN nt
ORDER BY nc.cfg""",

    // q57/q93/q97: connected components via min-label propagation
    // UNROLLED to 6 steps instead of WITH RECURSIVE — Spark 4.1's
    // recursive CTE accepts only UNION ALL, under which a cyclic
    // reachability recursion never terminates. 6 propagation steps
    // converge for any component diameter <= 6; the near-dup clusters
    // on this corpus are pairs/triples (diameter <= 2, see q93's
    // cluster-size spectrum), so the bound has 3x margin.
    "q57_dedup_components" -> """
WITH
d AS (SELECT doc_id, split(lower(text), ' ') l FROM documents),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) x AS i),
t AS (SELECT DISTINCT doc_id,
        concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh FROM s),
sig AS (SELECT doc_id,
  MIN(substr(md5(sh), 1, 4)) h1, MIN(substr(md5(sh), 5, 4)) h2,
  MIN(substr(md5(sh), 9, 4)) h3, MIN(substr(md5(sh), 13, 4)) h4,
  MIN(substr(md5(sh), 17, 4)) h5, MIN(substr(md5(sh), 21, 4)) h6,
  MIN(substr(md5(sh), 25, 4)) h7, MIN(substr(md5(sh), 29, 4)) h8
  FROM t GROUP BY doc_id),
cand AS (
  SELECT a.doc_id i, b.doc_id j FROM sig a JOIN sig b
    ON a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3 AND a.h4 = b.h4 AND a.doc_id < b.doc_id
  UNION SELECT a.doc_id, b.doc_id FROM sig a JOIN sig b
    ON a.h5 = b.h5 AND a.h6 = b.h6 AND a.h7 = b.h7 AND a.h8 = b.h8 AND a.doc_id < b.doc_id),
card AS (SELECT doc_id, COUNT(*) nt FROM t GROUP BY doc_id),
inter AS (SELECT c.i, c.j, COUNT(*) ci FROM cand c
          JOIN t ta ON ta.doc_id = c.i JOIN t tb ON tb.doc_id = c.j AND ta.sh = tb.sh
          GROUP BY c.i, c.j),
pairs AS (SELECT x.i, x.j FROM inter x
          JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j
          WHERE CAST(x.ci AS DOUBLE) / (ca.nt + cb.nt - x.ci) >= 0.7),
edges AS (SELECT i a, j b FROM pairs UNION SELECT j, i FROM pairs),
l0 AS (SELECT a doc, a lab FROM (SELECT DISTINCT a FROM edges)),
l1 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l0 l
       JOIN edges e ON e.a = l.doc JOIN l0 n ON n.doc = e.b GROUP BY l.doc),
l2 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l1 l
       JOIN edges e ON e.a = l.doc JOIN l1 n ON n.doc = e.b GROUP BY l.doc),
l3 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l2 l
       JOIN edges e ON e.a = l.doc JOIN l2 n ON n.doc = e.b GROUP BY l.doc),
l4 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l3 l
       JOIN edges e ON e.a = l.doc JOIN l3 n ON n.doc = e.b GROUP BY l.doc),
l5 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l4 l
       JOIN edges e ON e.a = l.doc JOIN l4 n ON n.doc = e.b GROUP BY l.doc),
l6 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l5 l
       JOIN edges e ON e.a = l.doc JOIN l5 n ON n.doc = e.b GROUP BY l.doc),
roots AS (SELECT doc, lab root FROM l6),
comp AS (SELECT root, COUNT(*) sz FROM roots GROUP BY root)
SELECT COUNT(*) n_components, CAST(SUM(sz) AS BIGINT) n_docs_in_dupes, MAX(sz) max_component
FROM comp""",

    "q93_dup_clusters" -> """
WITH
d AS (SELECT doc_id, split(lower(text), ' ') l FROM documents),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) x AS i),
sh AS (SELECT DISTINCT doc_id,
        concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh FROM s),
shk AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000)),
card AS (SELECT doc_id, COUNT(*) nt FROM shk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
edge AS (SELECT i, j FROM inter x
         JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j
         WHERE CAST(x.ci AS DOUBLE) / (ca.nt + cb.nt - x.ci) >= 0.2),
dedge AS (SELECT i, j FROM edge UNION SELECT j, i FROM edge),
l0 AS (SELECT i doc, i lab FROM (SELECT DISTINCT i FROM dedge)),
l1 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l0 l
       JOIN dedge e ON e.i = l.doc JOIN l0 n ON n.doc = e.j GROUP BY l.doc),
l2 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l1 l
       JOIN dedge e ON e.i = l.doc JOIN l1 n ON n.doc = e.j GROUP BY l.doc),
l3 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l2 l
       JOIN dedge e ON e.i = l.doc JOIN l2 n ON n.doc = e.j GROUP BY l.doc),
l4 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l3 l
       JOIN dedge e ON e.i = l.doc JOIN l3 n ON n.doc = e.j GROUP BY l.doc),
l5 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l4 l
       JOIN dedge e ON e.i = l.doc JOIN l4 n ON n.doc = e.j GROUP BY l.doc),
l6 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l5 l
       JOIN dedge e ON e.i = l.doc JOIN l5 n ON n.doc = e.j GROUP BY l.doc),
comp AS (SELECT doc, lab root FROM l6),
sz AS (SELECT root, COUNT(*) n FROM comp GROUP BY root)
SELECT n AS cluster_size, COUNT(*) AS n_clusters
FROM sz GROUP BY n ORDER BY cluster_size""",

    "q97_keep_best" -> """
WITH
d AS (SELECT doc_id, split(lower(text), ' ') l FROM documents),
toks AS (SELECT doc_id, size(filter(l, x -> x <> '')) q FROM d),
s AS (SELECT doc_id, i, l FROM (SELECT * FROM d WHERE size(l) >= 3)
      LATERAL VIEW explode(sequence(1, size(l) - 2)) x AS i),
sh AS (SELECT DISTINCT doc_id,
        concat_ws(' ', element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)) sh FROM s),
shk AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000)),
card AS (SELECT doc_id, COUNT(*) nt FROM shk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
edge AS (SELECT i, j FROM inter x
         JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j
         WHERE CAST(x.ci AS DOUBLE) / (ca.nt + cb.nt - x.ci) >= 0.2),
dedge AS (SELECT i, j FROM edge UNION SELECT j, i FROM edge),
l0 AS (SELECT i doc, i lab FROM (SELECT DISTINCT i FROM dedge)),
l1 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l0 l
       JOIN dedge e ON e.i = l.doc JOIN l0 n ON n.doc = e.j GROUP BY l.doc),
l2 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l1 l
       JOIN dedge e ON e.i = l.doc JOIN l1 n ON n.doc = e.j GROUP BY l.doc),
l3 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l2 l
       JOIN dedge e ON e.i = l.doc JOIN l2 n ON n.doc = e.j GROUP BY l.doc),
l4 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l3 l
       JOIN dedge e ON e.i = l.doc JOIN l3 n ON n.doc = e.j GROUP BY l.doc),
l5 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l4 l
       JOIN dedge e ON e.i = l.doc JOIN l4 n ON n.doc = e.j GROUP BY l.doc),
l6 AS (SELECT l.doc, LEAST(MIN(l.lab), MIN(n.lab)) lab FROM l5 l
       JOIN dedge e ON e.i = l.doc JOIN l5 n ON n.doc = e.j GROUP BY l.doc),
comp AS (SELECT doc, lab root FROM l6),
per AS (SELECT c.root, COUNT(*) n, SUM(t.q) tq,
          MIN(named_struct('nq', -t.q, 'doc', c.doc)) m
        FROM comp c JOIN toks t ON t.doc_id = c.doc GROUP BY c.root)
SELECT COUNT(*) AS n_clusters,
  CAST(SUM(n - 1) AS BIGINT) AS n_removed,
  CAST(SUM(-(m.nq)) AS BIGINT) AS kept_toks,
  CAST(SUM(tq + (m.nq)) AS BIGINT) AS removed_toks
FROM per""",

    "q85_kmeans_train" -> (kmPrefix + """
SELECT clabel, CAST(r.pos AS BIGINT) AS pos, element_at(cent, r.pos) AS c
FROM c2 CROSS JOIN (SELECT explode(sequence(1, 64)) pos) r
ORDER BY clabel, pos"""),

    "q108_quant_error" -> (kmPrefix + """,
a3 AS (SELECT e.vec_id, c.clabel,
         aggregate(zip_with(e.v, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x) d2
       FROM e CROSS JOIN c2 c),
b3 AS (SELECT vec_id, clabel, d2 FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a3) WHERE rn = 1)
SELECT clabel AS bucket, COUNT(*) AS n_vecs,
  CAST(SUM(CAST(ROUND(d2, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mse
FROM b3 GROUP BY clabel ORDER BY bucket"""),

    "q124_diversity_sample" -> (kmPrefix + """,
a3 AS (SELECT e.vec_id, c.clabel,
         aggregate(zip_with(e.v, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x) d2
       FROM e CROSS JOIN c2 c),
b3 AS (SELECT vec_id, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a3) WHERE rn = 1),
sizes AS (SELECT clabel, COUNT(*) n_before FROM b3 GROUP BY clabel),
tgt AS (SELECT MIN(n_before) m FROM sizes),
bounds AS (SELECT clabel, n_before,
   lpad(lower(hex(CAST(
     CAST(tgt.m AS BIGINT) * 4294967296 DIV n_before - 1 AS BIGINT))), 8, '0') bound
  FROM sizes CROSS JOIN tgt),
j AS (SELECT b3.clabel, bounds.n_before,
        CASE WHEN substring(md5(CAST(b3.vec_id AS STRING)), 1, 8) <= bounds.bound
             THEN 1 ELSE 0 END k
      FROM b3 JOIN bounds ON b3.clabel = bounds.clabel)
SELECT clabel, n_before, CAST(SUM(k) AS BIGINT) AS n_kept,
  CAST(SUM(k) * 1000000 DIV n_before AS BIGINT) AS kept_ppm
FROM j GROUP BY clabel, n_before ORDER BY clabel"""),

    "q125_embedding_decontam" -> """
WITH e AS (SELECT vec_id, label, embedding,
  CASE WHEN md5(CAST(vec_id AS STRING)) < 'e' THEN 'train' ELSE 'eval' END AS split,
  concat(CASE WHEN element_at(embedding, 1) >= 0 THEN '1' ELSE '0' END,
         CASE WHEN element_at(embedding, 2) >= 0 THEN '1' ELSE '0' END,
         CASE WHEN element_at(embedding, 3) >= 0 THEN '1' ELSE '0' END,
         CASE WHEN element_at(embedding, 4) >= 0 THEN '1' ELSE '0' END) bucket
  FROM embeddings),
tr AS (SELECT * FROM e WHERE split = 'train'),
ev AS (SELECT * FROM e WHERE split = 'eval'),
hits AS (SELECT DISTINCT tr.vec_id, tr.label
  FROM tr JOIN ev ON tr.bucket = ev.bucket
  WHERE ROUND(
    aggregate(zip_with(tr.embedding, ev.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, x) -> acc + x)
    / (SQRT(aggregate(tr.embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
     * SQRT(aggregate(ev.embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) >= 0.3),
base AS (SELECT label, COUNT(*) n_train FROM tr GROUP BY label),
fl AS (SELECT label, COUNT(*) n_flagged FROM hits GROUP BY label)
SELECT base.label, base.n_train,
  CAST(COALESCE(fl.n_flagged, 0) AS BIGINT) AS n_flagged,
  CAST(COALESCE(fl.n_flagged, 0) * 1000000 DIV base.n_train AS BIGINT) AS flagged_ppm
FROM base LEFT JOIN fl ON base.label = fl.label
ORDER BY base.label""",

    "q129_cluster_purity" -> (kmPrefix + """,
a3 AS (SELECT e.vec_id, c.clabel,
         aggregate(zip_with(e.v, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x) d2
       FROM e CROSS JOIN c2 c),
b3 AS (SELECT vec_id, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a3) WHERE rn = 1),
lbl AS (SELECT b3.clabel, emb.label FROM b3 JOIN embeddings emb USING (vec_id)),
cl AS (SELECT clabel, label, COUNT(*) n FROM lbl GROUP BY clabel, label),
top AS (SELECT clabel, label top_label, n top_n FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY clabel ORDER BY n DESC, label) rn FROM cl)
  WHERE rn = 1),
sz AS (SELECT clabel, CAST(SUM(n) AS BIGINT) n_vecs FROM cl GROUP BY clabel)
SELECT sz.clabel, sz.n_vecs, top.top_label, CAST(top.top_n AS BIGINT) AS top_n,
  CAST(top.top_n * 1000000 DIV sz.n_vecs AS BIGINT) AS purity_ppm
FROM sz JOIN top USING (clabel) ORDER BY sz.clabel"""),

    "q132_ivf_nprobe_recall" -> (kmPrefix + """,
a3 AS (SELECT e.vec_id, e.v, c.clabel,
         aggregate(zip_with(e.v, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x) d2
       FROM e CROSS JOIN c2 c),
b3 AS (SELECT vec_id, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a3) WHERE rn = 1),
qr AS (SELECT vec_id qid, clabel,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rnk
       FROM a3 WHERE vec_id < 20),
sc AS (SELECT q.vec_id qid, x.vec_id,
  ROUND(aggregate(zip_with(x.v, q.v, (a, b) -> a * b), 0D, (acc, y) -> acc + y)
    / (SQRT(aggregate(x.v, 0D, (acc, y) -> acc + y * y))
     * SQRT(aggregate(q.v, 0D, (acc, y) -> acc + y * y))), 6) cos
  FROM e x JOIN e q ON x.vec_id <> q.vec_id AND q.vec_id < 20),
ex10 AS (SELECT qid, vec_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) rn FROM sc)
  WHERE rn <= 10),
cand AS (SELECT sc.qid, sc.vec_id, sc.cos, np.np
         FROM sc JOIN b3 ON b3.vec_id = sc.vec_id
                 JOIN qr ON qr.qid = sc.qid AND qr.clabel = b3.clabel
                 CROSS JOIN (SELECT explode(sequence(1, 4)) np) np
         WHERE qr.rnk <= np.np),
sizes AS (SELECT np, COUNT(*) DIV 20 avg_cands FROM cand GROUP BY np),
t10 AS (SELECT qid, vec_id, np FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid, np ORDER BY cos DESC, vec_id) rn FROM cand)
  WHERE rn <= 10),
h AS (SELECT np, SUM(CASE WHEN ex10.vec_id IS NOT NULL THEN 1 ELSE 0 END) n_hits
      FROM t10 LEFT JOIN ex10 ON t10.qid = ex10.qid AND t10.vec_id = ex10.vec_id
      GROUP BY np)
SELECT CAST(h.np AS BIGINT) AS nprobe, CAST(sizes.avg_cands AS BIGINT) AS avg_cands,
  CAST(h.n_hits AS BIGINT) AS n_hits,
  CAST(h.n_hits * 1000000 DIV 200 AS BIGINT) AS recall_ppm
FROM h JOIN sizes ON h.np = sizes.np ORDER BY nprobe"""),

    "q135_semdedup" -> (kmPrefix + """,
a3 AS (SELECT e.vec_id, c.clabel,
         aggregate(zip_with(e.v, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x) d2
       FROM e CROSS JOIN c2 c),
b3 AS (SELECT vec_id, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a3) WHERE rn = 1),
asg AS (SELECT b3.vec_id, b3.clabel, e.v FROM b3 JOIN e USING (vec_id)),
p AS (SELECT a.clabel, b.vec_id j,
        ROUND(aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
          / (SQRT(aggregate(a.v, 0D, (acc, x) -> acc + x * x))
           * SQRT(aggregate(b.v, 0D, (acc, x) -> acc + x * x))), 6) cos
      FROM asg a JOIN asg b ON a.clabel = b.clabel AND a.vec_id < b.vec_id),
d AS (SELECT clabel, COUNT(DISTINCT j) n_dropped FROM p WHERE cos >= 0.3 GROUP BY clabel),
n AS (SELECT clabel, COUNT(*) n_vecs FROM asg GROUP BY clabel)
SELECT n.clabel, CAST(n.n_vecs AS BIGINT) AS n_vecs,
  CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
  CAST(n.n_vecs - COALESCE(d.n_dropped, 0) AS BIGINT) AS n_kept
FROM n LEFT JOIN d USING (clabel) ORDER BY n.clabel"""),

    "q143_join_card_est" -> """
WITH s AS (
  SELECT 'j1_lineitem_orders' AS join_name,
    (SELECT COUNT(*) FROM lineitem) n_left, (SELECT COUNT(*) FROM orders) n_right,
    (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) ndv_left,
    (SELECT COUNT(DISTINCT o_orderkey) FROM orders) ndv_right,
    (SELECT CAST(SUM(a.c * b.c) AS BIGINT) FROM
       (SELECT l_orderkey k, COUNT(*) c FROM lineitem GROUP BY 1) a
       JOIN (SELECT o_orderkey k, COUNT(*) c FROM orders GROUP BY 1) b ON a.k = b.k) actual
  UNION ALL
  SELECT 'j2_lineitem_self_suppkey',
    (SELECT COUNT(*) FROM lineitem), (SELECT COUNT(*) FROM lineitem),
    (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem),
    (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem),
    (SELECT CAST(SUM(a.c * a.c) AS BIGINT) FROM
       (SELECT l_suppkey k, COUNT(*) c FROM lineitem GROUP BY 1) a)
  UNION ALL
  SELECT 'j3_orders_F_customer',
    (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'F'),
    (SELECT COUNT(*) FROM customer),
    (SELECT COUNT(DISTINCT o_custkey) FROM orders),
    (SELECT COUNT(DISTINCT c_custkey) FROM customer),
    (SELECT CAST(SUM(a.c * b.c) AS BIGINT) FROM
       (SELECT o_custkey k, COUNT(*) c FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) a
       JOIN (SELECT c_custkey k, COUNT(*) c FROM customer GROUP BY 1) b ON a.k = b.k))
SELECT join_name, n_left, n_right, ndv_left, ndv_right, actual,
  n_left * n_right DIV GREATEST(ndv_left, ndv_right) AS est_uniform,
  ABS(n_left * n_right DIV GREATEST(ndv_left, ndv_right) - actual) * 1000000 DIV actual AS err_ppm
FROM s ORDER BY join_name""",

    "q144_bfs_reach" -> """
WITH pe AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
edges AS (SELECT 'p' || CAST(p AS STRING) AS src, 's' || CAST(s AS STRING) AS dst FROM pe
          UNION ALL
          SELECT 's' || CAST(s AS STRING), 'p' || CAST(p AS STRING) FROM pe),
f0 AS (SELECT DISTINCT 's' || CAST(s AS STRING) AS id FROM pe WHERE s % 7 = 0),
v0 AS (SELECT id FROM f0),
f1 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN f0 ON f0.id = e.src
       WHERE e.dst NOT IN (SELECT id FROM v0)),
v1 AS (SELECT id FROM v0 UNION ALL SELECT id FROM f1),
f2 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN f1 ON f1.id = e.src
       WHERE e.dst NOT IN (SELECT id FROM v1)),
v2 AS (SELECT id FROM v1 UNION ALL SELECT id FROM f2),
f3 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN f2 ON f2.id = e.src
       WHERE e.dst NOT IN (SELECT id FROM v2)),
lv AS (SELECT CAST(0 AS BIGINT) AS level, id FROM f0
       UNION ALL SELECT 1, id FROM f1
       UNION ALL SELECT 2, id FROM f2
       UNION ALL SELECT 3, id FROM f3)
SELECT level, COUNT(*) AS n_reached,
  CAST(SUM(CASE WHEN id LIKE 'p%' THEN 1 ELSE 0 END) AS BIGINT) AS n_parts,
  CAST(SUM(CASE WHEN id LIKE 's%' THEN 1 ELSE 0 END) AS BIGINT) AS n_sups,
  MIN(id) AS first_node
FROM lv GROUP BY level ORDER BY level""",

    "q145_zone_prune" -> """
WITH lay AS (
  SELECT 'natural' AS layout, doc_id DIV 50 AS blk, n_chars FROM documents
  UNION ALL
  SELECT 'clustered', n_chars DIV 64, n_chars FROM documents),
zs AS (SELECT layout, blk, MIN(n_chars) AS zmin, MAX(n_chars) AS zmax,
              COUNT(*) AS n_rows FROM lay GROUP BY ALL),
pr AS (SELECT * FROM (VALUES ('p1_ge_450', 450, 9223372036854775807),
                             ('p2_le_150', 0, 150),
                             ('p3_mid_250_350', 250, 350)) AS t(pred, lo, hi)),
e AS (SELECT p.pred, z.layout, z.blk, z.n_rows,
        CASE WHEN z.zmax < p.lo OR z.zmin > p.hi THEN 1 ELSE 0 END AS pruned
      FROM zs z CROSS JOIN pr p),
m AS (SELECT l.layout, p.pred, COUNT(*) AS n_match
      FROM lay l CROSS JOIN pr p WHERE l.n_chars BETWEEN p.lo AND p.hi
      GROUP BY ALL)
SELECT e.layout, e.pred, COUNT(*) AS blocks_total,
  CAST(SUM(e.pruned) AS BIGINT) AS blocks_pruned,
  CAST(SUM(CASE WHEN e.pruned = 0 THEN e.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
  CAST(COALESCE(MIN(m.n_match), 0) AS BIGINT) AS rows_matched,
  CAST(SUM(e.pruned) AS BIGINT) * 1000000 DIV COUNT(*) AS prune_ppm
FROM e LEFT JOIN m ON m.layout = e.layout AND m.pred = e.pred
GROUP BY e.layout, e.pred ORDER BY e.layout, e.pred""",

    "q146_bloom_join" -> """
WITH bkeys AS (SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
mm AS (SELECT COUNT(*) * 8 AS m FROM bkeys),
pos AS (SELECT DISTINCT CAST(conv(substr(md5('b' || CAST(h.i AS STRING) || ':' || CAST(k AS STRING)), 1, 8), 16, 10) AS BIGINT) % m AS p
        FROM bkeys CROSS JOIN (SELECT explode(array(1, 2, 3)) i) h CROSS JOIN mm),
probe AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
pp AS (SELECT probe.k, CAST(conv(substr(md5('b' || CAST(h.i AS STRING) || ':' || CAST(probe.k AS STRING)), 1, 8), 16, 10) AS BIGINT) % m AS p
       FROM probe CROSS JOIN (SELECT explode(array(1, 2, 3)) i) h CROSS JOIN mm),
hits AS (SELECT pp.k, COUNT(*) AS nh FROM pp JOIN pos ON pos.p = pp.p GROUP BY pp.k),
pass AS (SELECT k FROM hits WHERE nh = 3),
tru  AS (SELECT DISTINCT probe.k FROM probe JOIN bkeys ON bkeys.k = probe.k),
s AS (SELECT (SELECT COUNT(*) FROM bkeys) AS n_build,
             (SELECT m FROM mm) AS m_bits,
             (SELECT COUNT(*) FROM pos) AS n_bits_set,
             (SELECT COUNT(*) FROM probe) AS n_probe,
             (SELECT COUNT(*) FROM pass) AS n_pass,
             (SELECT COUNT(*) FROM tru) AS n_true)
SELECT n_build, m_bits, n_bits_set, n_probe, n_pass, n_true,
  n_pass - n_true AS n_false_pos,
  CASE WHEN n_probe - n_true = 0 THEN 0
       ELSE (n_pass - n_true) * 1000000 DIV (n_probe - n_true) END AS fp_ppm
FROM s""",

    "q149_join_order" -> """
WITH lo AS (SELECT 'A_lineitem_x_filtered_orders' AS join_order,
    (SELECT COUNT(*) FROM lineitem) * (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'F')
      DIV GREATEST((SELECT COUNT(DISTINCT l_orderkey) FROM lineitem),
                   (SELECT COUNT(DISTINCT o_orderkey) FROM orders)) AS est_rows,
    (SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) FROM
      (SELECT l_orderkey k, COUNT(*) c FROM lineitem GROUP BY 1) a JOIN
      (SELECT o_orderkey k, COUNT(*) c FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) b ON a.k = b.k) AS actual_rows
  UNION ALL
  SELECT 'B_filtered_orders_x_customer',
    (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'F') * (SELECT COUNT(*) FROM customer)
      DIV GREATEST((SELECT COUNT(DISTINCT o_custkey) FROM orders),
                   (SELECT COUNT(DISTINCT c_custkey) FROM customer)),
    (SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) FROM
      (SELECT o_custkey k, COUNT(*) c FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) a JOIN
      (SELECT c_custkey k, COUNT(*) c FROM customer GROUP BY 1) b ON a.k = b.k)),
r AS (SELECT join_order, est_rows, actual_rows,
        ABS(est_rows - actual_rows) * 1000000 DIV actual_rows AS err_ppm,
        RANK() OVER (ORDER BY est_rows) AS est_rank,
        RANK() OVER (ORDER BY actual_rows) AS actual_rank
      FROM lo)
SELECT join_order, est_rows, actual_rows, err_ppm,
  CAST(est_rank AS BIGINT) AS est_rank, CAST(actual_rank AS BIGINT) AS actual_rank,
  CASE WHEN est_rank = actual_rank THEN CAST(1 AS BIGINT) ELSE 0 END AS est_agrees
FROM r ORDER BY join_order""",

    "q224_centroid_margin" -> """
WITH x AS (SELECT label own, vec_id, r.pos,
    CAST(element_at(embedding, r.pos) AS DECIMAL(18,9)) xd
  FROM embeddings CROSS JOIN (SELECT explode(sequence(1, 64)) pos) r),
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
  CAST(SUM(CASE WHEN margin > 0 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT) separable_ppm,
  CAST(ROUND(MIN(margin), 6) AS DOUBLE) min_margin,
  CAST(ROUND(MAX(margin), 6) AS DOUBLE) max_margin
FROM m GROUP BY label ORDER BY label""",

    "q112_table_stats" -> """
SELECT * FROM (
  SELECT 'o_custkey' AS col_name, COUNT(*) AS n_rows, COUNT(*) - COUNT(o_custkey) AS n_nulls,
    COUNT(DISTINCT o_custkey) AS ndv, CAST(MIN(o_custkey) AS STRING) AS min_s, CAST(MAX(o_custkey) AS STRING) AS max_s FROM orders
  UNION ALL
  SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate), COUNT(DISTINCT o_orderdate), CAST(MIN(o_orderdate) AS STRING), CAST(MAX(o_orderdate) AS STRING) FROM orders
  UNION ALL
  SELECT 'o_orderkey', COUNT(*), COUNT(*) - COUNT(o_orderkey), COUNT(DISTINCT o_orderkey), CAST(MIN(o_orderkey) AS STRING), CAST(MAX(o_orderkey) AS STRING) FROM orders
  UNION ALL
  SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority), CAST(MIN(o_orderpriority) AS STRING), CAST(MAX(o_orderpriority) AS STRING) FROM orders
  UNION ALL
  SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus), CAST(MIN(o_orderstatus) AS STRING), CAST(MAX(o_orderstatus) AS STRING) FROM orders
) ORDER BY col_name""",

    "q133_time_travel" -> """
WITH survivors AS (SELECT doc_id, text, lang, source,
        CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
      FROM documents WHERE lang <> 'de'),
src AS (SELECT doc_id, text, lang, source, n_chars * 2 AS n_chars
        FROM documents WHERE doc_id % 7 = 3),
final AS (SELECT * FROM src UNION ALL SELECT * FROM survivors WHERE doc_id % 7 <> 3),
d AS (SELECT COALESCE(o.doc_id, f.doc_id) AS doc_id,
        CASE WHEN o.doc_id IS NULL THEN 'added'
             WHEN f.doc_id IS NULL THEN 'removed'
             WHEN o.text <> f.text OR o.lang <> f.lang OR o.source <> f.source
                  OR o.n_chars <> f.n_chars THEN 'changed'
             ELSE 'unchanged' END AS status
      FROM documents o FULL JOIN final f ON o.doc_id = f.doc_id)
SELECT doc_id, status FROM d WHERE status <> 'unchanged' ORDER BY doc_id""",

    "q140_constraints" -> """
SELECT 'c1_orders_pk_unique' AS constraint_name, COUNT(*) AS n_checked,
       COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations FROM orders
UNION ALL
SELECT 'c2_lineitem_pk_unique', COUNT(*),
       COUNT(*) - COUNT(DISTINCT l_orderkey, l_linenumber) FROM lineitem
UNION ALL
SELECT 'c3_lineitem_fk_orders', (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'c4_lineitem_fk_part', (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'c5_orders_fk_customer', (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'c6_customer_fk_nation', (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
          (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
UNION ALL
SELECT 'c7_events_value_nonneg', COUNT(*),
       CAST(SUM(CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM events
UNION ALL
SELECT 'c8_events_type_enum', COUNT(*),
       CAST(SUM(CASE WHEN event_type NOT IN ('click','error','purchase','signup','view')
                     OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events
UNION ALL
SELECT 'c9_documents_text_nonempty', COUNT(*),
       CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT) FROM documents
ORDER BY constraint_name""",

    "q142_graph_pagerank" -> """
WITH pe AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
nodes AS (SELECT 'p' || CAST(p AS STRING) AS id FROM (SELECT DISTINCT p FROM pe)
          UNION ALL
          SELECT 's' || CAST(s AS STRING) FROM (SELECT DISTINCT s FROM pe)),
edges AS (SELECT 'p' || CAST(p AS STRING) AS src, 's' || CAST(s AS STRING) AS dst FROM pe
          UNION ALL
          SELECT 's' || CAST(s AS STRING), 'p' || CAST(p AS STRING) FROM pe),
n AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
r0 AS (SELECT id, CAST(1000000000 AS BIGINT) DIV n AS r FROM nodes CROSS JOIN n),
i1 AS (SELECT r0.id, (15 * 10000000 DIV n) + 85 * COALESCE(inc.m, 0) DIV 100 AS r
       FROM r0 CROSS JOIN n LEFT JOIN (
         SELECT e.dst AS id, CAST(SUM(r0.r DIV deg.od) AS BIGINT) AS m
         FROM edges e JOIN r0 ON r0.id = e.src JOIN deg ON deg.src = e.src
         GROUP BY e.dst) inc ON inc.id = r0.id),
i2 AS (SELECT i1.id, (15 * 10000000 DIV n) + 85 * COALESCE(inc.m, 0) DIV 100 AS r
       FROM i1 CROSS JOIN n LEFT JOIN (
         SELECT e.dst AS id, CAST(SUM(i1.r DIV deg.od) AS BIGINT) AS m
         FROM edges e JOIN i1 ON i1.id = e.src JOIN deg ON deg.src = e.src
         GROUP BY e.dst) inc ON inc.id = i1.id),
i3 AS (SELECT i2.id, (15 * 10000000 DIV n) + 85 * COALESCE(inc.m, 0) DIV 100 AS r
       FROM i2 CROSS JOIN n LEFT JOIN (
         SELECT e.dst AS id, CAST(SUM(i2.r DIV deg.od) AS BIGINT) AS m
         FROM edges e JOIN i2 ON i2.id = e.src JOIN deg ON deg.src = e.src
         GROUP BY e.dst) inc ON inc.id = i2.id)
SELECT i3.id AS node, CAST(i3.r AS BIGINT) AS rank_ppb,
       CAST(COALESCE(deg.od, 0) AS BIGINT) AS degree
FROM i3 LEFT JOIN deg ON deg.src = i3.id
ORDER BY rank_ppb DESC, node LIMIT 20""",

    "q101_ivfpq" -> (pqPrefix + """,
q0 AS (SELECT slice(rv, 1, 32) s0, slice(rv, 33, 32) s1, bucket FROM res WHERE vec_id = 0),
t0 AS (SELECT c.clabel AS code,
         CAST(ROUND(aggregate(zip_with(q.s0, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x), 6) AS DECIMAL(18,6)) d
       FROM p0cb c CROSS JOIN q0 q),
t1 AS (SELECT c.clabel AS code,
         CAST(ROUND(aggregate(zip_with(q.s1, c.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x), 6) AS DECIMAL(18,6)) d
       FROM p1cb c CROSS JOIN q0 q),
cand AS (SELECT vec_id FROM res WHERE bucket = (SELECT bucket FROM q0))
SELECT c.vec_id, CAST(t0.d + t1.d AS DOUBLE) AS adc_dist
FROM cand c
JOIN e0 ON e0.vec_id = c.vec_id JOIN t0 ON t0.code = e0.code
JOIN e1 ON e1.vec_id = c.vec_id JOIN t1 ON t1.code = e1.code
ORDER BY adc_dist, c.vec_id LIMIT 10"""),

    "q134_ivfpq_nprobe" -> (pqPrefix + """,
qr AS (SELECT vec_id qid, clabel,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rnk
       FROM a3 WHERE vec_id < 20),
qres AS (SELECT q.vec_id qid, c.clabel,
           zip_with(q.v, c.cent, (x, y) -> CAST(CAST(x - y AS FLOAT) AS DOUBLE)) qv
         FROM e q CROSS JOIN c2 c WHERE q.vec_id < 20),
dt0 AS (SELECT qres.qid, qres.clabel, b.clabel AS code,
          CAST(ROUND(aggregate(zip_with(slice(qres.qv, 1, 32), b.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x), 6) AS DECIMAL(18,6)) d
        FROM qres CROSS JOIN p0cb b),
dt1 AS (SELECT qres.qid, qres.clabel, b.clabel AS code,
          CAST(ROUND(aggregate(zip_with(slice(qres.qv, 33, 32), b.cent, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x), 6) AS DECIMAL(18,6)) d
        FROM qres CROSS JOIN p1cb b),
cand AS (SELECT qr.qid, qr.rnk, qr.clabel, r.vec_id
         FROM res r JOIN qr ON qr.clabel = r.bucket AND r.vec_id <> qr.qid),
adc AS (SELECT c.qid, c.rnk, c.vec_id, CAST(t0.d + t1.d AS DOUBLE) adc
        FROM cand c
        JOIN e0 ON e0.vec_id = c.vec_id
        JOIN dt0 t0 ON t0.qid = c.qid AND t0.clabel = c.clabel AND t0.code = e0.code
        JOIN e1 ON e1.vec_id = c.vec_id
        JOIN dt1 t1 ON t1.qid = c.qid AND t1.clabel = c.clabel AND t1.code = e1.code),
anp AS (SELECT qid, vec_id, adc, np.np FROM adc CROSS JOIN (SELECT explode(sequence(1, 4)) np) np
        WHERE rnk <= np.np),
sizes AS (SELECT np, COUNT(*) DIV 20 avg_cands FROM anp GROUP BY np),
exd AS (SELECT q.vec_id qid, x.vec_id,
          ROUND(aggregate(zip_with(x.v, q.v, (a, b) -> (a - b) * (a - b)), 0D, (acc, y) -> acc + y), 6) l2
        FROM e x JOIN e q ON q.vec_id < 20 AND x.vec_id <> q.vec_id),
ex10 AS (SELECT qid, vec_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2, vec_id) rn FROM exd) WHERE rn <= 10),
t10 AS (SELECT qid, vec_id, np FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid, np ORDER BY adc, vec_id) rn FROM anp) WHERE rn <= 10),
h AS (SELECT np, SUM(CASE WHEN ex10.vec_id IS NOT NULL THEN 1 ELSE 0 END) n_hits
      FROM t10 LEFT JOIN ex10 ON t10.qid = ex10.qid AND t10.vec_id = ex10.vec_id
      GROUP BY np)
SELECT CAST(h.np AS BIGINT) AS nprobe, CAST(sizes.avg_cands AS BIGINT) AS avg_cands,
  CAST(h.n_hits AS BIGINT) AS n_hits,
  CAST(h.n_hits * 1000000 DIV 200 AS BIGINT) AS recall_ppm
FROM h JOIN sizes ON h.np = sizes.np ORDER BY nprobe""")
  ).map { case (k, v) => k -> v.trim }
}
