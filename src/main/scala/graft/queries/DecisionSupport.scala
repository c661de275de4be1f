package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Third extension wave (q58-q65): TPC-H-derived decision-support
  * shapes adapted to this schema (no partsupp/commitdate columns
  * exist — see TESTDATA.md), plus the q65 repetition-quality signals.
  * Each adds a composite plan shape the q01-q57 contract does not
  * cover:
  *
  *   - q58: aggregate-of-aggregate distribution (TPC-H Q13)
  *   - q59: argmax-of-aggregate via exact-decimal max equality (Q15)
  *   - q60: single-row arithmetic scan aggregate (Q6)
  *   - q61: conditional ratio over a fact-dim join (Q14)
  *   - q62: correlated-average filter, rewritten prune-first (Q17)
  *   - q63: having-filtered semi-aggregate join (Q18)
  *   - q64: scalar-threshold + anti-join rollup (Q22)
  *
  * Same t2 gate as every other query: DuckDB oracles in [[oracle]],
  * validated at sf0.01 and sf0.1 before the natives were written.
  * Determinism rules follow SURVEY.md §5: exact decimal sums, doubles
  * only in final casts/rounds, total-order ORDER BY keys.
  */
object DecisionSupport {

  private def cnt = count(lit(1))
  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Aggregate of aggregate: orders-per-customer histogram. The LEFT
    // join keeps order-less customers in the 0 bucket; both
    // aggregations are hash aggs with map-side partials, and the
    // second one's input is already tiny (|customers| rows).
    "q58_agg_of_agg" -> ((s, dir) => {
      val per = Tables.load(s, dir, "customer").as("c")
        .join(Tables.load(s, dir, "orders").as("o"),
          col("o.o_custkey") === col("c.c_custkey"), "left")
        .groupBy(col("c.c_custkey")).agg(count(col("o.o_orderkey")).as("c_count"))
      per.groupBy("c_count").agg(cnt.as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Argmax of an aggregate: top-revenue supplier for a quarter. The
    // max is a 1-row broadcast joined back on exact-decimal equality
    // (doubles here could tie-break differently across engines); the
    // revenue agg shuffles once on l_suppkey.
    "q59_argmax_of_agg" -> ((s, dir) => {
      val rev = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).as("r"))
      val top = rev.join(broadcast(rev.agg(max(col("r")).as("mr"))), col("r") === col("mr"))
      Tables.load(s, dir, "supplier")
        .join(top, col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("r").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // Single-row arithmetic scan aggregate: every predicate reaches
    // the parquet scan (shipdate min/max + quantity pushed), and the
    // whole query is one WholeStageCodegen pass with a partial+final
    // agg — the minimal full-scan shape at 100 TB.
    "q60_scan_agg" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast("double").as("revenue"), cnt.as("n"))),

    // Conditional ratio over a fact-dim join: promo revenue share for
    // one month. part broadcasts; the two sums come out of ONE pass
    // (sum over a when() that yields NULL outside the branch).
    "q61_cond_ratio" -> ((s, dir) => {
      val rev = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .join(broadcast(Tables.load(s, dir, "part")), col("p_partkey") === col("l_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", rev)).as("pr"), sum(rev).as("tr"), cnt.as("n"))
        .select(round(lit(100.0) * col("pr").cast("double") / col("tr").cast("double"), 6)
          .as("promo_pct"), col("n"))
    }),

    // Correlated-average filter (SQL: per-part AVG subquery),
    // rewritten the way it should run at scale: prune lineitem to the
    // brand's parts FIRST (broadcast semi-shaped join), compute the
    // per-part average over that pruned slice, and broadcast it back —
    // the correlated subquery never touches the full fact table.
    // avg(l_quantity) is exact (integer-valued doubles), so the 0.2x
    // threshold compare is deterministic.
    "q62_correlated_ratio" -> ((s, dir) => {
      val bp = Tables.load(s, dir, "part")
        .filter(col("p_brand") === "Brand#1").select("p_partkey")
      val li = Tables.load(s, dir, "lineitem")
        .join(broadcast(bp), col("l_partkey") === col("p_partkey"))
      val pa = li.groupBy(col("l_partkey").as("pk")).agg(avg(col("l_quantity")).as("aq"))
      li.join(broadcast(pa), col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.2) * col("aq"))
        .agg(round(sum(dec2(col("l_extendedprice"))).cast("double") / 7.0, 6)
          .as("avg_yearly"), cnt.as("n"))
    }),

    // Having-filtered aggregate as join input: large-volume orders.
    // The HAVING prunes on the aggregate BEFORE the joins (orders and
    // customer only see qualifying keys); ordering by (tot, orderkey)
    // is total because o_orderkey is unique.
    "q63_having_in" -> ((s, dir) => {
      val big = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(sum(dec2(col("l_quantity"))).as("sqd"))
        .filter(col("sqd") > 180)
        .select(col("l_orderkey"), col("sqd").cast("double").as("sq"))
      Tables.load(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice").cast("double").as("tot"), col("sq"))
        .orderBy(col("tot").desc, col("o_orderkey"))
        .limit(50)
    }),

    // Scalar-threshold + anti-join rollup: above-average-balance
    // customers with no large orders. The global average is compared
    // as bal*n > sum(bal) — all exact decimals, so the boundary rows
    // match the oracle bit-for-bit (a double avg could flip them); the
    // 1-row aggregate broadcasts, the anti-join prunes on o_custkey.
    "q64_anti_scalar" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val pos = cust.filter(col("c_acctbal") > 0)
        .agg(cnt.as("npos"), sum(dec2(col("c_acctbal"))).as("sb"))
      val bigOrders = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 300000).select("o_custkey")
      cust.crossJoin(broadcast(pos))
        .filter(dec2(col("c_acctbal")) * col("npos") > col("sb"))
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(cnt.as("numcust"), sum(dec2(col("c_acctbal"))).cast("double").as("totacctbal"))
        .orderBy("c_mktsegment")
    }),

    // Gopher-style repetition quality signals (operators.TextAnalysis
    // .repetitionSignals): dup-word fraction computed inside the scan,
    // top-bigram fraction from one explode + two hash aggs. The corpus-
    // filtering signal a training-data pipeline runs alongside q45/q46.
    "q65_repetition" -> ((s, dir) =>
      graft.operators.TextAnalysis.repetitionSignals(Tables.load(s, dir, "documents"))
        .orderBy("doc_id").limit(25))
  )

  /** DuckDB oracles (validated on DuckDB 1.0.0 at sf0.01 and sf0.1
    * before the natives were written). */
  val oracle: Map[String, String] = Map(
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

    "q65_repetition" -> """
WITH d AS (SELECT doc_id, string_split(lower(text),' ') l FROM documents),
t AS (SELECT doc_id, len(l) nt, len(list_distinct(l)) nd FROM d WHERE len(l) >= 2),
i AS (SELECT doc_id, unnest(generate_series(1, len(l)-1)) i, l FROM d WHERE len(l) >= 2),
bg AS (SELECT doc_id, l[i] || ' ' || l[i+1] bg FROM i),
bc AS (SELECT doc_id, bg, COUNT(*) c FROM bg GROUP BY doc_id, bg),
tb AS (SELECT doc_id, MAX(c) maxc, SUM(c) tot FROM bc GROUP BY doc_id)
SELECT t.doc_id, t.nt n_tokens,
  CAST(ROUND(1 - CAST(nd AS DOUBLE)/nt, 6) AS DOUBLE) dup_word_frac,
  CAST(ROUND(CAST(maxc AS DOUBLE)/tot, 6) AS DOUBLE) top_bigram_frac
FROM t JOIN tb ON tb.doc_id = t.doc_id
ORDER BY t.doc_id LIMIT 25"""
  ).map { case (k, v) => k -> v.trim }
}
