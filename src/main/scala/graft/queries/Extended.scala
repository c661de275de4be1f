package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.functions.Vectors
import graft.operators.{AnnSearch, Dedup}
import graft.sources.Tables

/** Second extension wave (q51-q55): classic analytics operators beyond
  * the original contract — pivot, exact-moment statistics, window
  * distribution functions, array aggregation, and fuzzy string
  * matching. Same t2 gate as everything else (oracles in [[oracle]]).
  */
object Extended {

  private def cnt = count(lit(1))
  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  def queries: Map[String, Queries.QueryFn] = Map(

    // PIVOT: status categories become revenue columns via the pivot
    // API (explicit value list => no extra distinct pass at scale);
    // missing cells coalesce to 0 to match the conditional-agg oracle.
    "q51_pivot" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .withColumn("yr", expr("EXTRACT(year FROM o_orderdate)"))
      val zero = lit(0).cast(DecimalType(28, 2))
      val rev = o.groupBy("yr").pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(dec2(col("o_totalprice"))))
        .select(col("yr"),
          coalesce(col("F"), zero).cast("double").as("rev_f"),
          coalesce(col("O"), zero).cast("double").as("rev_o"),
          coalesce(col("P"), zero).cast("double").as("rev_p"))
      rev.join(o.groupBy("yr").agg(cnt.as("n")), "yr").orderBy("yr")
    }),

    // Correlation/stddev from EXACT decimal moments: the five sums are
    // decimal (associative, partitioning-independent), only the final
    // closed-form formula runs in double — so the result is
    // deterministic, unlike native corr()/stddev() whose double sums
    // are order-dependent (SURVEY.md §5 rule applied to statistics).
    "q52_stats_agg" -> ((s, dir) => {
      val x = dec2(col("l_quantity"))
      val y = dec2(col("l_extendedprice"))
      val m = Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(cnt.as("n"), sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      val (n, sx, sy, sxx, syy, sxy) =
        (col("n").cast("double"), col("sx").cast("double"), col("sy").cast("double"),
          col("sxx").cast("double"), col("syy").cast("double"), col("sxy").cast("double"))
      m.select(col("l_returnflag"), col("n"),
          round((n * sxy - sx * sy) /
            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6).as("corr_qty_price"),
          round(sqrt((n * sxx - sx * sx) / (n * n)), 6).as("stddev_pop_qty"))
        .orderBy("l_returnflag")
    }),

    // Distribution window functions over a provably-unique ordering.
    "q53_win_distribution" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("c_mktsegment", "c_custkey")
        .limit(200)
    }),

    // Array aggregation: collect + sort (sort_array makes collect_list
    // order-independent => deterministic) + containment. The array is
    // surfaced as a joined string: the driver's row-sort comparator
    // can't order raw array cells, and the string form is
    // engine-portable.
    "q54_array_funcs" -> ((s, dir) => {
      val t = Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus").agg(lit(1))
        .select("l_returnflag", "l_linestatus")
      t.groupBy("l_returnflag")
        .agg(sort_array(collect_list(col("l_linestatus"))).as("statuses_arr"),
             cnt.as("n_statuses"))
        .select(col("l_returnflag"),
          array_join(col("statuses_arr"), ",").as("statuses"),
          col("n_statuses"),
          array_contains(col("statuses_arr"), "F").as("has_f"))
        .orderBy("l_returnflag")
    }),

    // Fuzzy match: Levenshtein join between two keyed slices — the
    // edit-distance verification kernel of fuzzy dedup (run AFTER
    // blocking at scale; the slices here are the blocks).
    "q55_fuzzy_match" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
      val p1 = p.filter(col("p_partkey") < 100).select(col("p_partkey").as("a"), col("p_name").as("na"))
      val p2 = p.filter(col("p_partkey") >= 100 && col("p_partkey") < 200)
        .select(col("p_partkey").as("b"), col("p_name").as("nb"))
      p1.crossJoin(broadcast(p2))
        .select(col("a"), col("b"), levenshtein(col("na"), col("nb")).as("dist"))
        .filter(col("dist") <= 3)
        .orderBy("dist", "a", "b")
        .limit(100)
    }),

    // IVF ANN (graft.operators.AnnSearch): per-label centroids form
    // the inverted file; every vector (and the query) is assigned to
    // its nearest centroid, then exact cosine re-ranks only the
    // query's bucket (nprobe=1). Complements q44's LSH: trained coarse
    // quantizer vs hash buckets.
    "q56_ann_ivf" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val b = AnnSearch.assignBuckets(e, AnnSearch.centroids(e, dims = 64)).localCheckpoint()
      val qv = b.filter(col("vec_id") === 0)
        .select(col("embedding").as("v"), col("bucket").as("qbucket"))
      b.join(broadcast(qv), col("bucket") === col("qbucket"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"),
          round(Vectors.cosineSimilarity(col("embedding"), col("v")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(5)
    }),

    // Exact near-dup GROUPS: the q50 candidate+verify pipeline, then
    // transitive closure via iterative connected components
    // (Dedup.connectedComponents) — the upgrade from greedy pairwise
    // removal to true duplicate clusters. Oracle: recursive CTE.
    "q57_dedup_components" -> ((s, dir) => {
      val arr = Dedup.shingleArrays(Tables.load(s, dir, "documents"))
        .repartition(col("doc_id")).localCheckpoint()
      val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
      val cand = Dedup.lshCandidates(
        Dedup.minhashSignatureFromArrays(arr, k = 8).localCheckpoint(),
        bands = Seq(Seq(1, 2, 3, 4), Seq(5, 6, 7, 8)))
      val pairs = Dedup.jaccardVerify(cand, sh).filter(col("jc") >= 0.7).select("i", "j")
      Dedup.connectedComponents(pairs)
        .groupBy("root").agg(cnt.as("sz"))
        .agg(cnt.as("n_components"),
          sum(col("sz")).as("n_docs_in_dupes"),
          max(col("sz")).as("max_component"))
    }),

    // Tables.analyze under the oracle gate: the ANALYZE primitive —
    // per-column row/null/ndv/min/max stats in long form, the numbers
    // a cost-based planner decides broadcast-vs-shuffle and bucket
    // counts with. Exact mode here (count DISTINCT — oracle-checkable);
    // the operator's default approx mode is the one-pass mergeable-HLL
    // 100 TB path (tolerance-tested in SourcesSpec, same split as
    // q85/Sketches). ONE scan feeds all five columns' aggregates.
    "q112_table_stats" -> ((s, dir) =>
      Tables.analyze(Tables.load(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
            "o_orderpriority"), exact = true)
        .orderBy("col_name"))
  )

  val oracle: Map[String, String] = Map(
    "q51_pivot" -> """
SELECT EXTRACT(year FROM o_orderdate) AS yr,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_f,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_o,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p,
  COUNT(*) AS n
FROM orders GROUP BY yr ORDER BY yr""",

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

    "q54_array_funcs" -> """
WITH t AS (SELECT l_returnflag, l_linestatus FROM lineitem GROUP BY 1, 2)
SELECT l_returnflag,
  array_to_string(list_sort(list(l_linestatus)), ',') AS statuses,
  len(list(l_linestatus)) AS n_statuses,
  list_contains(list(l_linestatus), 'F') AS has_f
FROM t GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q55_fuzzy_match" -> """
WITH p1 AS (SELECT p_partkey, p_name FROM part WHERE p_partkey < 100),
     p2 AS (SELECT p_partkey, p_name FROM part WHERE p_partkey >= 100 AND p_partkey < 200)
SELECT p1.p_partkey AS a, p2.p_partkey AS b, levenshtein(p1.p_name, p2.p_name) AS dist
FROM p1 CROSS JOIN p2
WHERE levenshtein(p1.p_name, p2.p_name) <= 3
ORDER BY dist, a, b LIMIT 100""",

    "q56_ann_ivf" -> """
WITH cm AS (
  SELECT label, r.pos, CAST(ROUND(AVG(CAST(embedding[CAST(r.pos AS INT)] AS DECIMAL(18,9))), 6) AS DOUBLE) c
  FROM embeddings CROSS JOIN range(1, 65) r(pos) GROUP BY label, r.pos),
cent AS (SELECT label AS clabel, list(c ORDER BY pos) cent FROM cm GROUP BY label),
assign AS (
  SELECT e.vec_id, e.label, e.embedding, c.clabel,
    list_sum(list_transform(list_zip(e.embedding, c.cent),
      p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2]))) d2
  FROM embeddings e CROSS JOIN cent c),
bucketed AS (
  SELECT vec_id, label, embedding, clabel AS bucket,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn
  FROM assign),
b AS (SELECT vec_id, label, embedding, bucket FROM bucketed WHERE rn = 1),
qv AS (SELECT embedding v, bucket FROM b WHERE vec_id = 0)
SELECT e.vec_id, e.label,
  ROUND(list_sum(list_transform(list_zip(e.embedding, qv.v), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))
  /(SQRT(list_sum(list_transform(e.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
   *SQRT(list_sum(list_transform(qv.v, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),6) cos_sim
FROM b e JOIN qv ON e.bucket = qv.bucket
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id LIMIT 5""",

    "q57_dedup_components" -> """
WITH RECURSIVE
d AS (SELECT doc_id, string_split(lower(text),' ') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l)-2)) i, l FROM d WHERE len(l) >= 3),
t AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] sh FROM s),
sig AS (SELECT doc_id,
  MIN(substr(md5(sh), 1, 4)) h1, MIN(substr(md5(sh), 5, 4)) h2,
  MIN(substr(md5(sh), 9, 4)) h3, MIN(substr(md5(sh), 13, 4)) h4,
  MIN(substr(md5(sh), 17, 4)) h5, MIN(substr(md5(sh), 21, 4)) h6,
  MIN(substr(md5(sh), 25, 4)) h7, MIN(substr(md5(sh), 29, 4)) h8
  FROM t GROUP BY doc_id),
cand0 AS (
  SELECT a.doc_id i, b.doc_id j FROM sig a JOIN sig b
    ON a.h1=b.h1 AND a.h2=b.h2 AND a.h3=b.h3 AND a.h4=b.h4 AND a.doc_id < b.doc_id
  UNION ALL SELECT a.doc_id, b.doc_id FROM sig a JOIN sig b
    ON a.h5=b.h5 AND a.h6=b.h6 AND a.h7=b.h7 AND a.h8=b.h8 AND a.doc_id < b.doc_id),
-- explicit DISTINCT: DuckDB 1.0 does not dedup a bare UNION inside a
-- non-recursive CTE when the WITH block is RECURSIVE (observed: 453
-- rows instead of 254), which doubles ci and breaks the Jaccard
cand AS (SELECT DISTINCT i, j FROM cand0),
card AS (SELECT doc_id, COUNT(*) nt FROM t GROUP BY doc_id),
inter AS (SELECT c.i, c.j, COUNT(*) ci FROM cand c
          JOIN t ta ON ta.doc_id = c.i JOIN t tb ON tb.doc_id = c.j AND ta.sh = tb.sh
          GROUP BY c.i, c.j),
pairs AS (SELECT x.i, x.j FROM inter x
          JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j
          WHERE CAST(x.ci AS DOUBLE)/(ca.nt + cb.nt - x.ci) >= 0.7),
edges AS (SELECT i a, j b FROM pairs UNION SELECT j, i FROM pairs),
reach(doc, peer) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.peer FROM edges e JOIN reach r ON r.doc = e.b),
roots AS (SELECT doc, MIN(peer) root FROM reach GROUP BY doc),
comp AS (SELECT root, COUNT(*) sz FROM roots GROUP BY root)
SELECT COUNT(*) n_components, CAST(SUM(sz) AS BIGINT) n_docs_in_dupes, MAX(sz) max_component
FROM comp""",

    // one SELECT per column UNION ALL'd (SQL has no stack()); VARCHAR
    // min/max casts render identically on both engines (timestamps as
    // 'yyyy-MM-dd HH:mm:ss' at second precision, UTC sessions)
    "q112_table_stats" -> """
SELECT * FROM (
  SELECT 'o_custkey' AS col_name, COUNT(*) AS n_rows, COUNT(*) - COUNT(o_custkey) AS n_nulls,
    COUNT(DISTINCT o_custkey) AS ndv, CAST(MIN(o_custkey) AS VARCHAR) AS min_s, CAST(MAX(o_custkey) AS VARCHAR) AS max_s FROM orders
  UNION ALL
  SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate), COUNT(DISTINCT o_orderdate), CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_orderkey', COUNT(*), COUNT(*) - COUNT(o_orderkey), COUNT(DISTINCT o_orderkey), CAST(MIN(o_orderkey) AS VARCHAR), CAST(MAX(o_orderkey) AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority), CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus), CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR) FROM orders
) ORDER BY col_name"""
  ).map { case (k, v) => k -> v.trim }
}
