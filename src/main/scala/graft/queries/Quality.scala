package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Corpus-quality analytics wave (q93–q95 round 3, q105 round 4):
  * duplicate-cluster topology with the connected-components labels
  * themselves under the oracle gate, robust-statistics winsorization,
  * collocation mining with exact integer lift, and the cross-source
  * mirror matrix.
  *
  * Same t2 gate as every other wave: DuckDB oracles in [[oracle]]
  * (q93's replays the transitive closure with a RECURSIVE CTE),
  * prototyped at sf0.01 before the natives; determinism per SURVEY.md
  * §5 — integer/decimal arithmetic, 6-decimal rounds on percentile
  * fences, total-order ORDER BY before every LIMIT.
  */
object Quality {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Duplicate-cluster size histogram: >= 0.2 Jaccard edges (the q42
    // kernel, same maxDf cap) closed into components by iterative
    // min-label propagation — and the resulting LABELS are checked
    // against an oracle that replays the closure as a recursive CTE.
    // q57 gates cluster counts; this gates the partition itself: any
    // mislabeled node shifts two histogram cells. The shape that tells
    // a dedup pipeline whether it faces pairs or giant boilerplate
    // components before it commits to cluster-collapse.
    "q93_dup_clusters" -> ((s, dir) => {
      val arr = Dedup.shingleArrays(Tables.load(s, dir, "documents"))
        .repartition(col("doc_id")).localCheckpoint()
      val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
      val edges = Dedup.jaccardAllPairs(sh, maxDf = 1000)
        .filter(col("jc") >= 0.2).select("i", "j")
      Dedup.connectedComponents(edges)
        .groupBy("root").agg(cnt.as("cluster_size"))
        .groupBy("cluster_size").agg(cnt.as("n_clusters"))
        .orderBy("cluster_size")
    }),

    // Winsorization at the p05/p95 fences, per group: fence values
    // (rounded to 6dp BEFORE use, so both engines clamp against the
    // identical constant), tail counts, and the winsorized sum in
    // exact DECIMAL(18,6) — the order-independent form; a double sum
    // would hash-flip on partition order. The clamp is a CASE, not
    // LEAST/GREATEST: DuckDB promotes LEAST/GREATEST over decimals to
    // DOUBLE (measured: per-element double rounding drifted the sum by
    // 2e-5), while CASE keeps DECIMAL on both engines. The robust-stats
    // cleaning pass that precedes any mean/variance computed from
    // scraped data. Fences are a 3-row broadcast back onto the fact scan.
    "q94_winsorize" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      // Exact interpolated percentile WITHOUT the Percentile aggregate:
      // prices are near-unique (583k distinct / 600k rows at sf0.1), so
      // Percentile's value->count map gets no compression — it builds
      // and serializes a ~584k-entry map per merge (measured: the whole
      // query's dominant cost). Instead: rank per group, keep only the
      // 2 order-statistic rows per fence, interpolate with the same
      // lower + frac*(higher-lower) formula Spark's Percentile (and
      // DuckDB's quantile_cont) uses. The window sorts each group once
      // — with a handful of groups either form concentrates per-group
      // work on one reducer; this one skips the map entirely.
      val vals = li.select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
      val n = vals.groupBy("l_returnflag").agg(cnt.as("n"))
      val ranked = vals.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("l_returnflag").orderBy("v")))
        .join(broadcast(n), "l_returnflag")
        .withColumn("p05", expr("0.05D * (n - 1)"))
        .withColumn("p95", expr("0.95D * (n - 1)"))
      val f = ranked
        .filter(col("rn") === floor(col("p05")) + 1 || col("rn") === ceil(col("p05")) + 1 ||
          col("rn") === floor(col("p95")) + 1 || col("rn") === ceil(col("p95")) + 1)
        .groupBy("l_returnflag")
        .agg(
          round(expr("min(CASE WHEN rn = floor(p05)+1 THEN v END)" +
            " + (max(p05) - floor(max(p05)))" +
            " * (min(CASE WHEN rn = ceil(p05)+1 THEN v END)" +
            "    - min(CASE WHEN rn = floor(p05)+1 THEN v END))"), 6).as("lo"),
          round(expr("min(CASE WHEN rn = floor(p95)+1 THEN v END)" +
            " + (max(p95) - floor(max(p95)))" +
            " * (min(CASE WHEN rn = ceil(p95)+1 THEN v END)" +
            "    - min(CASE WHEN rn = floor(p95)+1 THEN v END))"), 6).as("hi"))
      li.join(broadcast(f), "l_returnflag")
        .groupBy("l_returnflag", "lo", "hi")
        .agg(cnt.as("n"),
          sum(when(col("l_extendedprice") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
          sum(when(col("l_extendedprice") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
          sum(when(col("l_extendedprice") < col("lo"), col("lo").cast(DecimalType(18, 6)))
            .when(col("l_extendedprice") > col("hi"), col("hi").cast(DecimalType(18, 6)))
            .otherwise(col("l_extendedprice").cast(DecimalType(18, 6))))
            .cast("double").as("wsum"))
        .orderBy("l_returnflag")
    }),

    // Collocation mining: document-level co-occurrence lift in EXACT
    // integer ppm — lift = P(a,b)/(P(a)P(b)) = cab*N*1e6 DIV (ca*cb),
    // DECIMAL(38,0)-widened like q68 so the multiply can never
    // overflow at corpus scale. Pairing is restricted to the top-1000
    // df vocabulary FIRST (deterministic cut: df DESC, tok) — the cap
    // that bounds per-doc pair fan-out at vocab²/2 no matter how long
    // documents get; at the graded SFs the whole vocabulary fits under
    // the cap, so the exact-all-pairs oracle still matches (the q42
    // maxDf pattern). Support floor cab >= 5 drops noise pairs.
    "q95_cooccur_lift" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val dt = docs
        .select(col("doc_id"), explode(filter(split(lower(col("text")), " "), t => t =!= "")).as("tok"))
        .distinct().localCheckpoint()
      val vocab = TextAnalysis.topVocabulary(dt, 1000)
      // doc_id equi self-join for pairs — the grouped collect_list
      // variant was measured 2.5x slower on the jaccard kernel
      // (Dedup.scala) and the same trade holds here
      val pairs = TextAnalysis.cooccurrencePairs(dt, vocab)
        .filter(col("cab") >= 5)
      val nd = docs.agg(cnt.as("n"))
      pairs
        .join(broadcast(vocab.select(col("tok").as("ta"), col("c").as("ca"))), "ta")
        .join(broadcast(vocab.select(col("tok").as("tb"), col("c").as("cb"))), "tb")
        .crossJoin(broadcast(nd))
        .select(col("ta"), col("tb"), col("cab"),
          // the DIVISOR is widened too: ca*cb in raw int64 overflows
          // exactly for the top-df terms this query pairs
          expr("CAST(CAST(cab AS DECIMAL(38,0)) * n * 1000000 DIV (CAST(ca AS DECIMAL(38,0)) * cb) AS BIGINT)").as("lift_ppm"))
        .orderBy(desc("lift_ppm"), col("ta"), col("tb")).limit(20)
    }),

    // Cross-source mirror matrix: which SOURCE PAIRS share near-dup
    // content (mirror sites, syndication, cross-crawl boilerplate) —
    // the q42 kernel's >= 0.2 Jaccard pairs with each endpoint joined
    // back to its source, cross-source pairs only, counted per
    // unordered (least, greatest) source pair. The signal that tells
    // a curation run which sources to dedup AGAINST each other rather
    // than independently. Same maxDf cap as q42/q93/q97 (and the
    // oracle models it), so the pair space stays bounded at any SF.
    "q105_mirror_matrix" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val src = docs.select(col("doc_id"), col("source"))
      val arr = Dedup.shingleArrays(docs)
        .repartition(col("doc_id")).localCheckpoint()
      val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
      Dedup.jaccardAllPairs(sh, maxDf = 1000).filter(col("jc") >= 0.2)
        .join(src.select(col("doc_id").as("i"), col("source").as("sa")), "i")
        .join(src.select(col("doc_id").as("j"), col("source").as("sb")), "j")
        .filter(col("sa") =!= col("sb"))
        .select(least(col("sa"), col("sb")).as("src_a"),
          greatest(col("sa"), col("sb")).as("src_b"))
        .groupBy("src_a", "src_b").agg(cnt.as("n_pairs"))
        .orderBy("src_a", "src_b")
    }),

    // Adaptive per-source quality floor: each source's p10 quality
    // score becomes its own keep threshold — the curation move that
    // drops each source's worst decile instead of applying one global
    // cutoff that would gut low-scoring sources entirely. Fences are
    // q94's rank-based exact order statistics (2 rows per source, same
    // interpolation as quantile_cont), broadcast back onto the scored
    // relation; scores are checkpointed once so the tokenize pass
    // never re-runs for the report join. Report: floor, docs kept, and
    // the token mass that survives — the number a mixing plan needs.
    "q107_quality_floor" -> ((s, dir) => {
      val scored = TextAnalysis.qualityScores(
          Tables.load(s, dir, "documents"),
          stopwords = Seq("the", "a"), groupCol = "source")
        .select(col("source"), col("ntok"), col("score").cast("double").as("v"))
        .localCheckpoint()
      val n = scored.groupBy("source").agg(cnt.as("n"))
      val ranked = scored.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("source").orderBy("v")))
        .join(broadcast(n), "source")
        .withColumn("p10", expr("0.10D * (n - 1)"))
      val f = ranked
        .filter(col("rn") === floor(col("p10")) + 1 || col("rn") === ceil(col("p10")) + 1)
        .groupBy("source")
        .agg(round(expr("min(CASE WHEN rn = floor(p10)+1 THEN v END)" +
          " + (max(p10) - floor(max(p10)))" +
          " * (min(CASE WHEN rn = ceil(p10)+1 THEN v END)" +
          "    - min(CASE WHEN rn = floor(p10)+1 THEN v END))"), 6).as("floor_score"))
      scored.join(broadcast(f), "source")
        .groupBy("source", "floor_score")
        .agg(cnt.as("n_docs"),
          sum(when(col("v") >= col("floor_score"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("v") >= col("floor_score"), col("ntok")).otherwise(lit(0L)))
            .as("kept_toks"))
        .orderBy("source")
    }),

    // Per-source unigram entropy profile: each doc's token-distribution
    // Shannon entropy H = -sum(p ln p) — the information-theoretic
    // repetition signal (low H = templated/repetitive text, the q65
    // ratio's principled cousin), reported as mean/min/max per source.
    // Determinism: each -p*ln(p) term is ROUND(..,9)'d into
    // DECIMAL(18,9) so the per-doc sum is partition-order-independent;
    // the per-source mean is an exact decimal sum divided once as
    // doubles. Shape: one tokenize + groupBy, doc length via a window
    // partitioned on doc_id (reuses the same exchange — no join
    // anywhere), then two stacked hash aggs.
    "q111_token_entropy" -> ((s, dir) => {
      val tf = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(graft.functions.Text.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("doc_id", "source", "tok").agg(cnt.as("tf"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      tf.withColumn("dl", sum(col("tf")).over(w))
        .select(col("doc_id"), col("source"),
          expr("CAST(ROUND(-(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE))" +
            " * ln(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE)), 9) AS DECIMAL(18,9))").as("h"))
        .groupBy("doc_id", "source").agg(sum(col("h")).as("hd"))
        .groupBy("source").agg(cnt.as("n_docs"),
          round(sum(col("hd")).cast("double") / cnt, 6).as("mean_entropy"),
          min(col("hd")).cast("double").as("min_entropy"),
          max(col("hd")).cast("double").as("max_entropy"))
        .orderBy("source")
    })
  )

  /** DuckDB oracles (validated at sf0.01/sf0.1 before the natives). */
  val oracle: Map[String, String] = Map(
    "q93_dup_clusters" -> """
WITH RECURSIVE
d AS (SELECT doc_id, string_split(lower(text),' ') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l)-2)) i, l FROM d WHERE len(l) >= 3),
sh AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] sh FROM s),
shk AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000)),
card AS (SELECT doc_id, COUNT(*) nt FROM shk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
edge AS (SELECT i, j FROM inter x
         JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j
         WHERE CAST(x.ci AS DOUBLE) / (ca.nt + cb.nt - x.ci) >= 0.2),
dedge AS (SELECT i, j FROM edge UNION SELECT j, i FROM edge),
reach(doc, lab) AS (
  SELECT i, i FROM dedge
  UNION
  SELECT e.j, r.lab FROM reach r JOIN dedge e ON e.i = r.doc),
comp AS (SELECT doc, MIN(lab) root FROM reach GROUP BY doc),
sz AS (SELECT root, COUNT(*) n FROM comp GROUP BY root)
SELECT n AS cluster_size, COUNT(*) AS n_clusters
FROM sz GROUP BY n ORDER BY cluster_size""",

    "q94_winsorize" -> """
WITH f AS (SELECT l_returnflag flag,
    ROUND(quantile_cont(l_extendedprice, 0.05), 6) lo,
    ROUND(quantile_cont(l_extendedprice, 0.95), 6) hi
  FROM lineitem GROUP BY l_returnflag)
SELECT l.l_returnflag, f.lo, f.hi, COUNT(*) AS n,
  CAST(SUM(CASE WHEN l.l_extendedprice < f.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
  CAST(SUM(CASE WHEN l.l_extendedprice > f.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
  CAST(SUM(CASE WHEN l.l_extendedprice < f.lo THEN CAST(f.lo AS DECIMAL(18,6))
                WHEN l.l_extendedprice > f.hi THEN CAST(f.hi AS DECIMAL(18,6))
                ELSE CAST(l.l_extendedprice AS DECIMAL(18,6)) END) AS DOUBLE) AS wsum
FROM lineitem l JOIN f ON f.flag = l.l_returnflag
GROUP BY l.l_returnflag, f.lo, f.hi ORDER BY l.l_returnflag""",

    "q95_cooccur_lift" -> """
WITH dt AS (SELECT DISTINCT doc_id, unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) tok FROM documents),
dfreq AS (SELECT tok, COUNT(*) c FROM dt GROUP BY tok),
vocab AS (SELECT tok, c FROM (SELECT tok, c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) rn FROM dfreq) WHERE rn <= 1000),
dv AS (SELECT dt.doc_id, dt.tok FROM dt SEMI JOIN vocab ON vocab.tok = dt.tok),
pair AS (SELECT a.tok ta, b.tok tb, COUNT(*) cab
         FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.tok < b.tok
         GROUP BY a.tok, b.tok),
nd AS (SELECT COUNT(*) n FROM documents)
SELECT p.ta, p.tb, p.cab,
  CAST(CAST(p.cab AS HUGEINT) * nd.n * 1000000 // (CAST(va.c AS HUGEINT) * vb.c) AS BIGINT) AS lift_ppm
FROM pair p, nd
JOIN vocab va ON va.tok = p.ta JOIN vocab vb ON vb.tok = p.tb
WHERE p.cab >= 5
ORDER BY lift_ppm DESC, p.ta, p.tb LIMIT 20""",

    // q93's kernel CTEs (shingles, df cap, inter, edge) with each edge
    // endpoint joined back to its source; unordered source pairs via
    // LEAST/GREATEST
    "q105_mirror_matrix" -> """
WITH d AS (SELECT doc_id, source, string_split(lower(text),' ') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l)-2)) i, l FROM d WHERE len(l) >= 3),
sh AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] sh FROM s),
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

    // q46's score CTEs, then quantile_cont(0.10) per source (the q94
    // precedent: DuckDB's interpolated quantile vs the native's exact
    // rank fences) and the keep/token accounting; SUM->HUGEINT cast
    // back to BIGINT
    "q107_quality_floor" -> """
WITH toks AS (SELECT doc_id, source, unnest(string_split(lower(text),' ')) tok FROM documents),
t AS (SELECT * FROM toks WHERE tok <> ''),
per_doc AS (
  SELECT doc_id, source, COUNT(*) ntok, COUNT(DISTINCT tok) nuniq,
         SUM(CASE WHEN tok IN ('the','a') THEN 1 ELSE 0 END) nstop,
         SUM(length(tok)) sumlen
  FROM t GROUP BY doc_id, source),
scored AS (
  SELECT source, ntok, CAST(
    (6 * ((nuniq * 1000000) // ntok)
   + 3 * (1000000 - ((nstop * 1000000) // ntok))
   + 1 * (least((sumlen * 100) // ntok, 800) * 1250)) // 10 AS DOUBLE) AS v
  FROM per_doc),
f AS (SELECT source, ROUND(quantile_cont(v, 0.10), 6) floor_score
      FROM scored GROUP BY source)
SELECT s.source, f.floor_score, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN s.v >= f.floor_score THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN s.v >= f.floor_score THEN s.ntok ELSE 0 END) AS BIGINT) AS kept_toks
FROM scored s JOIN f USING (source)
GROUP BY s.source, f.floor_score ORDER BY s.source""",

    // same per-term ROUND(..,9) DECIMAL(18,9) entropy terms and
    // window-partitioned doc length as the native
    "q111_token_entropy" -> """
WITH tf AS (
  SELECT doc_id, source, tok, COUNT(*) AS tf FROM (
    SELECT doc_id, source, unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS tok
    FROM documents) GROUP BY doc_id, source, tok),
h AS (SELECT doc_id, source,
        SUM(CAST(ROUND(-(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE))
          * ln(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE)), 9) AS DECIMAL(18,9))) AS hd
      FROM (SELECT *, SUM(tf) OVER (PARTITION BY doc_id) AS dl FROM tf)
      GROUP BY doc_id, source)
SELECT source, COUNT(*) AS n_docs,
  ROUND(CAST(SUM(hd) AS DOUBLE) / COUNT(*), 6) AS mean_entropy,
  CAST(MIN(hd) AS DOUBLE) AS min_entropy,
  CAST(MAX(hd) AS DOUBLE) AS max_entropy
FROM h GROUP BY source ORDER BY source"""
  ).map { case (k, v) => k -> v.trim }
}
