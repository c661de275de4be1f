package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Text
import graft.operators.{Dedup, Skew}
import graft.sources.Tables

/** Retrieval / curation wave (q79–q85, q102): the search-and-versioning
  * side of a training-data pipeline — distribution stats, term
  * importance, inverted-index shape, asymmetric (quote) containment,
  * CDC latest-version dedup, trained-k-means IVF, and the skew pair
  * (salted join + the detection profile that says when to salt) under
  * the oracle gate.
  *
  * Same t2 gate as every other wave: DuckDB oracles in [[oracle]],
  * prototyped on DuckDB at sf0.01 before the natives were written;
  * determinism per SURVEY.md §5 — integer DIV scores, exact-decimal
  * sums, struct-argmax with explicit tie-break, total-order ORDER BY.
  */
object Retrieval {

  private def cnt = count(lit(1))

  /** The q109 BM25 scorer (Lucene's +1 idf variant, k1=1.2 b=0.75) for
    * the fixed 3-term query, un-limited: (doc_id, score). Shared by
    * q109 (top-10 report) and q138 (the text arm of hybrid fusion) so
    * the fused ranking is the ranking of the SHIPPED scorer, not a
    * near-copy. Determinism as documented at q109: the one
    * transcendental (ln in idf) is per-TERM from exact integer counts
    * and ROUND(..,6)'d before any per-doc math; per-(doc,term)
    * contributions are rounded into DECIMAL(18,6) so the per-doc sum
    * is partition-order-independent. */
  private def bm25Scores(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val tf = Text.tokenize(Tables.load(s, dir, "documents"))
      .groupBy("doc_id", "tok").agg(cnt.as("tf"))
      .localCheckpoint()
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val tot = dl.agg(cnt.as("nd"), sum(col("dl")).as("sumdl"))
    val qtf = tf.filter(col("tok").isin("spark", "hash", "window"))
    val dfr = qtf.groupBy("tok").agg(cnt.as("df"))
    qtf.join(broadcast(dfr), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        expr("CAST(ROUND(ROUND(ln((CAST(nd - df AS DOUBLE) + 0.5D) / (CAST(df AS DOUBLE) + 0.5D) + 1.0D), 6)" +
          " * ((CAST(tf AS DOUBLE) * 2.2D) / (CAST(tf AS DOUBLE) + 1.2D * (0.25D + 0.75D" +
          " * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(nd AS DOUBLE)))))), 6) AS DECIMAL(18,6))")
          .as("contrib"))
      .groupBy("doc_id").agg(sum(col("contrib")).cast("double").as("score"))
  }

  def queries: Map[String, Queries.QueryFn] = Map(

    // Exact interpolated quartiles of price per return flag: the
    // distribution-profiling primitive (outlier fences, SLA
    // percentiles). percentile() is exact linear interpolation at
    // p*(n-1) on both engines; one shuffle on the group key, each
    // group sorted within its reducer.
    "q79_percentile_stats" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(cnt.as("n"),
          round(expr("percentile(l_extendedprice, 0.25D)"), 6).as("p25"),
          round(expr("percentile(l_extendedprice, 0.50D)"), 6).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75D)"), 6).as("p75"))
        .orderBy("l_returnflag")
    }),

    // Term importance: each doc's top rarity-weighted term, tf-idf
    // style but in EXACT integer arithmetic — score_ppb =
    // tf * 1e9 DIV (doc_len * df) — so no log/fp nondeterminism can
    // flip an argmax tie across engines. The per-doc argmax is a
    // min(struct(-score, term)) hash aggregate (no window sort);
    // report: docs-won per term, top 20.
    "q80_tfidf_topterm" -> ((s, dir) => {
      // ONE tokenize pass: doc lengths and document frequencies both
      // derive from the (doc, term, tf) relation — dl = sum(tf) per
      // doc, df = row count per term (tf is distinct per (doc, tok)) —
      // where three independent uses of the raw token stream would
      // re-scan and re-explode the whole corpus three times
      // (tokenization dominates at corpus scale). localCheckpoint, not
      // persist: the cache manager would warm the cold benchmark.
      val tf = Text.tokenize(Tables.load(s, dir, "documents"))
        .groupBy("doc_id", "tok").agg(cnt.as("tf"))
        .localCheckpoint()
      val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("len"))
      val df = tf.groupBy("tok").agg(cnt.as("df"))
      tf.join(dl, "doc_id").join(df, "tok")
        .select(col("doc_id"),
          struct(negate(expr("tf * 1000000000 DIV (len * df)")).as("ns"),
            col("tok").as("t")).as("st"))
        .groupBy("doc_id").agg(min(col("st")).as("m"))
        .select(col("m.t").as("term"))
        .groupBy("term").agg(cnt.as("n_docs_top"))
        .orderBy(desc("n_docs_top"), col("term")).limit(20)
    }),

    // Inverted-index shape: distinct (term, doc) postings, then the
    // index stats a planner sizes bucket counts with — term count,
    // posting mass, the heaviest posting list (argmax by min-struct,
    // ties to the lexicographically first term), singleton terms.
    // Explode + two hash aggs; no window, no sort until the 1-row end.
    "q81_inverted_index" -> ((s, dir) => {
      val post = Text.tokenize(Tables.load(s, dir, "documents"))
        .distinct()
        .groupBy("tok").agg(cnt.as("df"))
      post.agg(
        cnt.as("n_terms"),
        sum(col("df")).as("n_postings"),
        max(col("df")).as("max_posting"),
        sum(when(col("df") === 1, 1).otherwise(0)).as("n_singletons"),
        min(struct(negate(col("df")).as("nd"), col("tok").as("t"))).as("m"))
        .select(col("n_terms"), col("n_postings"), col("max_posting"),
          col("n_singletons"), col("m.t").as("heaviest_term"))
    }),

    // Asymmetric containment |A∩B|/|A| over 3-gram shingles: catches
    // quote/subset duplication Jaccard misses (a doc fully quoted
    // inside a larger one has containment 1.0 but small Jaccard). The
    // >= 0.9 threshold is exact integer arithmetic (ci*10 >= na*9);
    // same maxDf hot-shingle cap as q42 (no-op at graded SFs).
    "q82_containment" -> ((s, dir) => {
      val arr = Dedup.shingleArrays(Tables.load(s, dir, "documents"))
        .repartition(col("doc_id")).localCheckpoint()
      val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
      Dedup.containmentAllPairs(sh, maxDf = 1000)
        .agg(cnt.as("n_pairs"),
          sum(when(col("ci") * 10 >= col("na") * 9, 1).otherwise(0)).as("n_contained"),
          round(avg(col("ct").cast(DecimalType(18, 9))), 6).cast("double").as("avg_ct"),
          round(max(col("ct")), 6).as("max_ct"))
    }),

    // CDC latest-version dedup: keep each (user, event_type) key's
    // most recent event — ties broken by event_id so "latest" is a
    // total order — then aggregate the surviving versions. One shuffle
    // on the key, one sort within partitions; the upsert-compaction
    // shape every CDC ingest pipeline runs.
    "q83_latest_version" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.load(s, dir, "events")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy("event_type")
        .agg(cnt.as("n_keys"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_latest"))
        .orderBy("event_type")
    }),

    // The TRAINED quantizer under the hash gate: 2 Lloyd iterations of
    // AnnSearch.kmeansCentroids (k=4, full-corpus training) against an
    // oracle that UNROLLS the same two rounds in SQL — content-addressed
    // md5 seeds, the q56 distance/argmin machinery, exact-decimal means,
    // empty clusters keeping their prior centroid. Deterministic k-means
    // is oracle-checkable precisely because every step is: fp-free
    // seeding, fixed iteration count, decimal means. Output: the k x 64
    // centroid components as scalar rows (clabel, pos, c).
    "q85_kmeans_train" -> ((s, dir) => {
      val cents = graft.operators.AnnSearch.kmeansCentroids(
        Tables.load(s, dir, "embeddings"), dims = 64, k = 4, iters = 2,
        sampleBound = None)
      cents
        .select(col("clabel"), explode(sequence(lit(1), lit(64))).as("pos"), col("cent"))
        // bigint like the oracle's generate_series/labels — no dtype
        // skew for consumers that do compare schemas strictly
        .select(col("clabel").cast("long").as("clabel"), col("pos").cast("long").as("pos"),
          element_at(col("cent"), col("pos")).as("c"))
        .orderBy("clabel", "pos")
    }),

    // Index-health report: per-bucket quantization error of the
    // trained IVF index — n_vecs (list balance) and mean squared
    // distance to the assigned centroid (how much resolution each
    // list loses). The two numbers that tell an index operator
    // whether to re-train, raise k, or split a hot list BEFORE search
    // quality degrades. One zero-shuffle broadcast argmin over the
    // corpus (assignBucketsWithDist) + one grouped sum; per-vector
    // errors enter the mean as ROUND(d2, 6) DECIMAL(18,6) — the ADC
    // discipline — so the aggregate is partition-order-independent
    // and the final double division has identical operands on both
    // engines.
    "q108_quant_error" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val coarse = graft.operators.AnnSearch.kmeansCentroids(
        emb, dims = 64, k = 4, iters = 2, sampleBound = None).localCheckpoint()
      graft.operators.AnnSearch.assignBucketsWithDist(emb, coarse)
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(cnt.as("n_vecs"),
          sum(round(col("d2"), 6).cast(DecimalType(18, 6))).as("sqe"))
        .select(col("bucket"), col("n_vecs"),
          (col("sqe").cast("double") / col("n_vecs")).as("mse"))
        .orderBy("bucket")
    }),

    // BM25 top-10 retrieval (Lucene's +1 idf variant, k1=1.2 b=0.75)
    // for a 3-term query — full-text ranking over the corpus with no
    // external index. The one transcendental (ln in idf) is computed
    // once per TERM from exact integer counts and ROUND(..,6)'d before
    // it touches any per-doc arithmetic; the per-(doc,term)
    // contribution is then pure IEEE rational arithmetic with
    // identical operand order on both engines, rounded into
    // DECIMAL(18,6) so the per-doc sum is partition-order-independent
    // (the ADC discipline). Shape: tokenize once (localCheckpoint),
    // restrict to query terms FIRST, df + corpus totals broadcast, one
    // doc_id-keyed join against doc lengths, total-order top-10.
    "q109_bm25" -> ((s, dir) =>
      bm25Scores(s, dir).orderBy(desc("score"), col("doc_id")).limit(10)),

    // Skew.saltedJoin under the oracle gate: the salted join must be
    // row-identical to the plain equi-join (the oracle IS the plain
    // join) while spreading each part key over 8 salt sub-keys —
    // deterministic salting by md5-free hash of the orderkey on the
    // big side, dimension replicated 8x. Result invariance is the
    // operator's contract; the plan-shape benefit shows at skew.
    "q84_skew_salted" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val part = Tables.load(s, dir, "part")
        .withColumnRenamed("p_partkey", "l_partkey")
      Skew.saltedJoin(li, part, "l_partkey", salts = 8, saltBy = col("l_orderkey"))
        .groupBy("p_brand")
        .agg(cnt.as("n"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
        .orderBy("p_brand")
    }),

    // Skew.profile under the oracle gate: q84's DETECTION companion —
    // the top-20 hottest customer keys of `orders` with row share
    // (integer ppm) and the salt factor saltedJoin would need at
    // 32-way parallelism. One groupBy + a broadcast 1-row summary;
    // all-integer arithmetic so DuckDB replays it exactly.
    "q102_skew_profile" -> ((s, dir) =>
      Skew.profile(Tables.load(s, dir, "orders"), "o_custkey",
        partitions = 32, topK = 20)),

    // Diff.snapshotDiff under the oracle gate: two md5-derived
    // snapshots of the documents table (old keeps md5('old:'||id)<'e',
    // new keeps md5('new:'||id)<'e' and rewrites text for the
    // md5('edit:'||id)<'2' subset) diffed into added / removed /
    // changed / unchanged counts — the crawl-to-crawl accounting a
    // corpus pipeline runs between dumps. Both snapshots are
    // content-addressed projections of ONE table, so DuckDB replays
    // the whole scenario; the operator shuffles (key, 16-byte hash),
    // never the documents.
    "q104_snapshot_diff" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
      val oldSnap = d.filter(
        md5(concat(lit("old:"), col("doc_id").cast("string"))) < "e")
      val newSnap = d.filter(
          md5(concat(lit("new:"), col("doc_id").cast("string"))) < "e")
        .withColumn("text",
          when(md5(concat(lit("edit:"), col("doc_id").cast("string"))) < "2",
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.operators.Diff.snapshotDiff(oldSnap, newSnap,
          Seq("doc_id"), Seq("text"))
        .groupBy("status").agg(cnt.as("n")).orderBy("status")
    }),

    // q104's companion at the DISTRIBUTION level: crawl-to-crawl
    // vocabulary drift. q104 counts which rows changed; this measures
    // how much the token distribution moved — total-variation distance
    // in EXACT integer ppm (sum of |new_share - old_share|, no logs,
    // no floats anywhere) plus the top-10 moving tokens, the report
    // that catches a crawler suddenly ingesting boilerplate or losing
    // a source. Shape: two tokenize+groupBy passes, one full-outer
    // join keyed on token (hash-partitionable), 1-row totals and the
    // TV summary broadcast; the joined ppm relation is checkpointed
    // once and feeds both the TV aggregate and the movers top-k.
    "q114_vocab_drift" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
      val oldT = d.filter(
        md5(concat(lit("old:"), col("doc_id").cast("string"))) < "e")
      val newT = d.filter(
          md5(concat(lit("new:"), col("doc_id").cast("string"))) < "e")
        .select(when(md5(concat(lit("edit:"), col("doc_id").cast("string"))) < "2",
          concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"))
      def tokCounts(t: org.apache.spark.sql.DataFrame, as: String) = t
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "").groupBy("tok").agg(cnt.as(as))
      val ot = tokCounts(oldT, "oc")
      val nt = tokCounts(newT, "nc")
      val tot = ot.agg(sum(col("oc")).as("ocnt"))
        .crossJoin(nt.agg(sum(col("nc")).as("ncnt")))
      val j = ot.join(nt, Seq("tok"), "full_outer")
        .crossJoin(broadcast(tot))
        .select(col("tok"),
          expr("coalesce(oc, 0L) * 1000000L DIV ocnt").as("old_ppm"),
          expr("coalesce(nc, 0L) * 1000000L DIV ncnt").as("new_ppm"))
        .localCheckpoint()
      val tv = j.agg(sum(abs(col("new_ppm") - col("old_ppm"))).as("tv_ppm"),
        cnt.as("n_toks"))
      j.crossJoin(broadcast(tv))
        .select(col("tok"), col("old_ppm"), col("new_ppm"),
          (col("new_ppm") - col("old_ppm")).as("delta_ppm"),
          col("tv_ppm"), col("n_toks"))
        .orderBy(abs(col("delta_ppm")).desc, col("tok")).limit(10)
    }),

    // Hybrid retrieval via Reciprocal Rank Fusion (round 5): the q109
    // BM25 text ranking and the q38 exact-cosine vector ranking fused
    // as RRF(d) = Σ 1/(60 + rank_d) over the two systems — the
    // standard score-free fusion for lexical+semantic search (doc_id
    // and vec_id share the corpus id space). Each arm is its own
    // top-50 with a total-order tie-break (score desc, id), so ranks
    // are provably unique; each 1/(60+r) term is ROUND(..,6)-captured
    // into DECIMAL(18,6) before the sum (§5), and a doc present in
    // only one list contributes only that term (COALESCE 0). Scale
    // shape: both arms reduce to 50 rows before fusion — the
    // row_number windows and the full-outer join run on k rows, not
    // the corpus; the corpus-sized work is the two scorers, each
    // already scale-shaped (q109's broadcast df / q38's broadcast
    // query vector).
    "q138_rrf_hybrid" -> ((s, dir) => {
      val bm = bm25Scores(s, dir)
        .orderBy(desc("score"), col("doc_id")).limit(50)
        .withColumn("br", row_number().over(
          Window.orderBy(desc("score"), col("doc_id"))).cast("long"))
      val e = Tables.load(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("v"))
      val vt = e.crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(graft.functions.Vectors.cosineSimilarity(col("embedding"), col("v")), 6).as("cs"))
        .orderBy(col("cs").desc, col("vec_id")).limit(50)
        .withColumn("vr", row_number().over(
          Window.orderBy(col("cs").desc, col("vec_id"))).cast("long"))
      val rrfTerm = (r: org.apache.spark.sql.Column) =>
        round(lit(1.0) / (lit(60.0) + r.cast("double")), 6).cast(DecimalType(18, 6))
      bm.select(col("doc_id"), col("br"))
        .join(vt.select(col("vec_id"), col("vr")),
          col("doc_id") === col("vec_id"), "full_outer")
        .select(coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
          (coalesce(rrfTerm(col("br")), lit(0).cast(DecimalType(18, 6))) +
            coalesce(rrfTerm(col("vr")), lit(0).cast(DecimalType(18, 6))))
            .cast("double").as("rrf_score"),
          col("br").as("bm25_rank"), col("vr").as("cos_rank"))
        .orderBy(desc("rrf_score"), col("doc_id")).limit(10)
    })
  )

  /** DuckDB oracles (validated at sf0.01/sf0.1 before the natives). */
  val oracle: Map[String, String] = Map(
    "q79_percentile_stats" -> """
SELECT l_returnflag, COUNT(*) AS n,
  ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
  ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
  ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q80_tfidf_topterm" -> """
WITH tk AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS tok
  FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk GROUP BY doc_id, tok),
dl AS (SELECT doc_id, COUNT(*) AS len FROM tk GROUP BY doc_id),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tk GROUP BY tok),
sc AS (SELECT tf.doc_id, tf.tok, tf.tf * 1000000000 // (dl.len * df.df) AS score
       FROM tf JOIN dl USING (doc_id) JOIN df USING (tok)),
top AS (SELECT doc_id, tok,
          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rn
        FROM sc)
SELECT tok AS term, COUNT(*) AS n_docs_top
FROM top WHERE rn = 1
GROUP BY tok ORDER BY n_docs_top DESC, term LIMIT 20""",

    "q81_inverted_index" -> """
WITH tk AS (
  SELECT DISTINCT doc_id, unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS tok
  FROM documents),
post AS (SELECT tok, COUNT(*) AS df FROM tk GROUP BY tok)
SELECT COUNT(*) AS n_terms,
  CAST(SUM(df) AS BIGINT) AS n_postings,
  CAST(MAX(df) AS BIGINT) AS max_posting,
  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
  MIN(CASE WHEN df = (SELECT MAX(df) FROM post) THEN tok END) AS heaviest_term
FROM post""",

    "q82_containment" -> """
WITH d AS (SELECT doc_id, string_split(lower(text),' ') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l)-2)) i, l FROM d WHERE len(l) >= 3),
sh AS (SELECT DISTINCT doc_id, l[i]||' '||l[i+1]||' '||l[i+2] sh FROM s),
shk AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000)),
card AS (SELECT doc_id, COUNT(*) AS nt FROM shk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id <> b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT COUNT(*) AS n_pairs,
  CAST(SUM(CASE WHEN ci * 10 >= nt * 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_contained,
  ROUND(AVG(CAST(CAST(ci AS DOUBLE) / nt AS DECIMAL(18,9))), 6) AS avg_ct,
  ROUND(MAX(CAST(ci AS DOUBLE) / nt), 6) AS max_ct
FROM inter JOIN card ON inter.i = card.doc_id""",

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

    // integer ppm + ceil-division salts; SUM(BIGINT) is HUGEINT in
    // DuckDB (surfaces as float64 downstream) — CAST the total back to
    // BIGINT so every term stays exact integer on both engines
    "q102_skew_profile" -> """
WITH c AS (SELECT o_custkey, COUNT(*) AS n_rows FROM orders GROUP BY o_custkey),
s AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total, COUNT(*) AS n_keys FROM c)
SELECT c.o_custkey, c.n_rows,
  c.n_rows * 1000000 // s.total AS share_ppm,
  s.n_keys,
  GREATEST(1, (c.n_rows * 32 + s.total - 1) // s.total) AS salts
FROM c CROSS JOIN s
ORDER BY c.n_rows DESC, c.o_custkey LIMIT 20""",

    // status via md5 comparison = text comparison (the operator's
    // sentinel-joined hash differs in VALUE but never in equality)
    "q104_snapshot_diff" -> """
WITH d AS (SELECT doc_id, text FROM documents),
o AS (SELECT doc_id, md5(COALESCE(text, chr(0))) h FROM d
      WHERE md5('old:' || CAST(doc_id AS VARCHAR)) < 'e'),
n AS (SELECT doc_id, md5(COALESCE(CASE WHEN md5('edit:' || CAST(doc_id AS VARCHAR)) < '2'
        THEN text || ' v2' ELSE text END, chr(0))) h
      FROM d WHERE md5('new:' || CAST(doc_id AS VARCHAR)) < 'e'),
j AS (SELECT CASE WHEN o.h IS NULL THEN 'added' WHEN n.h IS NULL THEN 'removed'
        WHEN o.h <> n.h THEN 'changed' ELSE 'unchanged' END status
      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
SELECT status, COUNT(*) AS n FROM j GROUP BY status ORDER BY status""",

    "q85_kmeans_train" -> """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
seeds AS (SELECT v, clabel FROM (
  SELECT v, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) clabel FROM e)
  WHERE clabel <= 4),
c0 AS (SELECT clabel, v AS cent FROM seeds),
a1 AS (SELECT e.vec_id, e.v, c.clabel,
         list_sum(list_transform(list_zip(e.v, c.cent), p -> (p[1]-p[2])*(p[1]-p[2]))) d2
       FROM e CROSS JOIN c0 c),
b1 AS (SELECT vec_id, v, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a1) WHERE rn = 1),
m1 AS (SELECT clabel, r.pos, CAST(ROUND(AVG(CAST(v[CAST(r.pos AS INT)] AS DECIMAL(18,9))),6) AS DOUBLE) c
       FROM b1 CROSS JOIN range(1,65) r(pos) GROUP BY clabel, r.pos),
c1l AS (SELECT clabel, list(c ORDER BY pos) cent FROM m1 GROUP BY clabel),
c1 AS (SELECT c0.clabel, COALESCE(c1l.cent, c0.cent) cent FROM c0 LEFT JOIN c1l USING (clabel)),
a2 AS (SELECT e.vec_id, e.v, c.clabel,
         list_sum(list_transform(list_zip(e.v, c.cent), p -> (p[1]-p[2])*(p[1]-p[2]))) d2
       FROM e CROSS JOIN c1 c),
b2 AS (SELECT vec_id, v, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a2) WHERE rn = 1),
m2 AS (SELECT clabel, r.pos, CAST(ROUND(AVG(CAST(v[CAST(r.pos AS INT)] AS DECIMAL(18,9))),6) AS DOUBLE) c
       FROM b2 CROSS JOIN range(1,65) r(pos) GROUP BY clabel, r.pos),
c2l AS (SELECT clabel, list(c ORDER BY pos) cent FROM m2 GROUP BY clabel),
c2 AS (SELECT c1.clabel, COALESCE(c2l.cent, c1.cent) cent FROM c1 LEFT JOIN c2l USING (clabel))
SELECT clabel, r.pos, cent[CAST(r.pos AS INT)] AS c
FROM c2 CROSS JOIN range(1,65) r(pos)
ORDER BY clabel, pos""",

    // q85's training CTEs verbatim (seeds..c2), then one full-corpus
    // assignment keeping the argmin DISTANCE, and the per-bucket mean
    // over ROUND(d2,6) DECIMAL(18,6) entries (the ADC discipline)
    "q108_quant_error" -> """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
seeds AS (SELECT v, clabel FROM (
  SELECT v, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) clabel FROM e)
  WHERE clabel <= 4),
c0 AS (SELECT clabel, v AS cent FROM seeds),
a1 AS (SELECT e.vec_id, e.v, c.clabel,
         list_sum(list_transform(list_zip(e.v, c.cent), p -> (p[1]-p[2])*(p[1]-p[2]))) d2
       FROM e CROSS JOIN c0 c),
b1 AS (SELECT vec_id, v, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a1) WHERE rn = 1),
m1 AS (SELECT clabel, r.pos, CAST(ROUND(AVG(CAST(v[CAST(r.pos AS INT)] AS DECIMAL(18,9))),6) AS DOUBLE) c
       FROM b1 CROSS JOIN range(1,65) r(pos) GROUP BY clabel, r.pos),
c1l AS (SELECT clabel, list(c ORDER BY pos) cent FROM m1 GROUP BY clabel),
c1 AS (SELECT c0.clabel, COALESCE(c1l.cent, c0.cent) cent FROM c0 LEFT JOIN c1l USING (clabel)),
a2 AS (SELECT e.vec_id, e.v, c.clabel,
         list_sum(list_transform(list_zip(e.v, c.cent), p -> (p[1]-p[2])*(p[1]-p[2]))) d2
       FROM e CROSS JOIN c1 c),
b2 AS (SELECT vec_id, v, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a2) WHERE rn = 1),
m2 AS (SELECT clabel, r.pos, CAST(ROUND(AVG(CAST(v[CAST(r.pos AS INT)] AS DECIMAL(18,9))),6) AS DOUBLE) c
       FROM b2 CROSS JOIN range(1,65) r(pos) GROUP BY clabel, r.pos),
c2l AS (SELECT clabel, list(c ORDER BY pos) cent FROM m2 GROUP BY clabel),
c2 AS (SELECT c1.clabel, COALESCE(c2l.cent, c1.cent) cent FROM c1 LEFT JOIN c2l USING (clabel)),
a3 AS (SELECT e.vec_id, c.clabel,
         list_sum(list_transform(list_zip(e.v, c.cent), p -> (p[1]-p[2])*(p[1]-p[2]))) d2
       FROM e CROSS JOIN c2 c),
b3 AS (SELECT vec_id, clabel, d2 FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a3) WHERE rn = 1)
SELECT clabel AS bucket, COUNT(*) AS n_vecs,
  CAST(SUM(CAST(ROUND(d2, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mse
FROM b3 GROUP BY clabel ORDER BY bucket""",

    // same operand order as the native, ln ROUND(..,6)'d per term from
    // integer counts before any per-doc arithmetic, DECIMAL(18,6)
    // contribution sum (D-suffix double literals are Spark-only; plain
    // literals promote to DOUBLE here identically)
    "q109_bm25" -> """
WITH tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS tok
    FROM documents) GROUP BY doc_id, tok),
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

    // q104's snapshot scenario, drifted at the distribution level —
    // all-integer ppm shares and TV sum (HUGEINT cast back), same
    // total-order movers top-10 as the native
    "q114_vocab_drift" -> """
WITH d AS (SELECT doc_id, text FROM documents),
o AS (SELECT text FROM d WHERE md5('old:' || CAST(doc_id AS VARCHAR)) < 'e'),
n AS (SELECT CASE WHEN md5('edit:' || CAST(doc_id AS VARCHAR)) < '2'
        THEN text || ' v2' ELSE text END AS text
      FROM d WHERE md5('new:' || CAST(doc_id AS VARCHAR)) < 'e'),
ot AS (SELECT t AS tok, COUNT(*) c FROM (SELECT unnest(string_split(lower(text),' ')) t FROM o)
       WHERE t <> '' GROUP BY t),
nt AS (SELECT t AS tok, COUNT(*) c FROM (SELECT unnest(string_split(lower(text),' ')) t FROM n)
       WHERE t <> '' GROUP BY t),
tot AS (SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM ot) ocnt,
               (SELECT CAST(SUM(c) AS BIGINT) FROM nt) ncnt),
j AS (SELECT COALESCE(ot.tok, nt.tok) tok,
        CAST(COALESCE(ot.c,0) AS BIGINT)*1000000 // ocnt AS old_ppm,
        CAST(COALESCE(nt.c,0) AS BIGINT)*1000000 // ncnt AS new_ppm
      FROM ot FULL OUTER JOIN nt ON ot.tok = nt.tok CROSS JOIN tot),
tv AS (SELECT CAST(SUM(ABS(new_ppm - old_ppm)) AS BIGINT) tv_ppm, COUNT(*) n_toks FROM j)
SELECT j.tok, j.old_ppm, j.new_ppm, j.new_ppm - j.old_ppm AS delta_ppm,
       tv.tv_ppm, tv.n_toks
FROM j CROSS JOIN tv
ORDER BY ABS(j.new_ppm - j.old_ppm) DESC, j.tok LIMIT 10""",

    // q138: q109's BM25 CTEs verbatim (top-50) + q38's cosine text
    // (top-50), each ranked by the same total order, RRF terms
    // ROUND(..,6) into DECIMAL(18,6) before the fused sum
    "q138_rrf_hybrid" -> """
WITH tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS tok
    FROM documents) GROUP BY doc_id, tok),
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
  ROUND(list_sum(list_transform(list_zip(e.embedding, qv.v), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))
  /(SQRT(list_sum(list_transform(e.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
   *SQRT(list_sum(list_transform(qv.v, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),6) cs
  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
vt AS (SELECT vec_id, cs FROM cs ORDER BY cs DESC, vec_id LIMIT 50),
vr AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cs DESC, vec_id) AS r FROM vt)
SELECT COALESCE(bmr.doc_id, vr.vec_id) AS doc_id,
  CAST(COALESCE(CAST(ROUND(1.0/(60.0 + bmr.r), 6) AS DECIMAL(18,6)), 0)
     + COALESCE(CAST(ROUND(1.0/(60.0 + vr.r), 6) AS DECIMAL(18,6)), 0) AS DOUBLE) AS rrf_score,
  CAST(bmr.r AS BIGINT) AS bm25_rank, CAST(vr.r AS BIGINT) AS cos_rank
FROM bmr FULL OUTER JOIN vr ON bmr.doc_id = vr.vec_id
ORDER BY rrf_score DESC, doc_id LIMIT 10"""
  ).map { case (k, v) => k -> v.trim }
}
