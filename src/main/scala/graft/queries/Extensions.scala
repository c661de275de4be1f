package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Vectors
import graft.operators.{Dedup, Multimodal, TextAnalysis}
import graft.sources.Tables

/** Training-data-pipeline extensions beyond the reference's surface
  * (q41-q50): the operators a 100 TB LLM-data pipeline needs — dedup
  * (SimHash, n-gram Jaccard, embedding near-dup, MinHash+LSH banding),
  * similarity search (LSH-bucketed ANN), text analysis (language ID,
  * quality scoring, token counting, fingerprinting), and multimodal
  * column plumbing. Each has a DuckDB oracle in [[oracle]] and is part
  * of the same t2 gate as q01-q40.
  *
  * Thresholds were chosen empirically against the testdata so every
  * query returns non-trivial rows at both sf0.01 and sf0.1 (e.g.
  * same-label embedding cosine tops out at ~0.51, so the near-dup
  * threshold is 0.3; shingle-Jaccard of planted near-dup docs is
  * ~0.97, so the verify threshold 0.7 separates them cleanly).
  */
object Extensions {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // SimHash near-dup grouping: 16-bit signatures in one
    // groupBy(doc_id) pass, then group-by-signature — two shuffles
    // total, no pair join at any point.
    "q41_dedup_simhash" -> ((s, dir) => {
      val toks = TextAnalysis.tokenOccurrences(Tables.load(s, dir, "documents"))
      val sig = Dedup.simhashSignature(toks, nBits = 16)
      Dedup.groupStats(sig.groupBy("sg").agg(cnt.as("n")), "n_near_dupes")
    }),

    // All-pairs 3-gram Jaccard over shingle-sharing docs: the exact
    // verification kernel. Single pass: the shingle self-join *is*
    // both candidate generation and intersection counting (a pair
    // appears once per shared shingle), so no candidate set is
    // materialized and re-joined. The hot-shingle hazard (one
    // boilerplate shingle shared by m docs => m^2/2 join rows in one
    // reducer) is capped by maxDf = 1000: shingles above that document
    // frequency are dropped before the self-join, bounding per-shingle
    // fan-out at maxDf^2/2 regardless of how viral a shingle gets
    // (hot-shingle case proven in ScaleSpec). The ORACLE models the
    // same cap (shk CTE), so native/oracle parity holds at ANY scale
    // factor, not just while the fixture's df stays under the cap
    // (observed max df 25 at sf0.1; a biting-cap equivalence case is
    // pinned in CheckPropsSpec).
    "q42_dedup_ngram_jaccard" -> ((s, dir) => {
      // The per-doc shingle ARRAYS are checkpointed once — compact (one
      // row per doc) — and the three uses (self-join a/b +
      // cardinalities) explode them lazily; checkpointing the EXPLODED
      // relation instead was measured several times slower (row-copy
      // cost scales with the fanned-out row count). (localCheckpoint,
      // NOT .persist(): the cache manager would match the identical
      // plan across queries, silently warming the cold-run benchmark.)
      val arr = Dedup.shingleArrays(Tables.load(s, dir, "documents"))
        .repartition(col("doc_id")).localCheckpoint()
      val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
      Dedup.jaccardAllPairs(sh, maxDf = 1000)
        .filter(col("jc") >= 0.2)
        .agg(cnt.as("n_pairs"),
          round(avg(col("jc").cast(DecimalType(18, 9))), 6).cast("double").as("avg_j"),
          round(max(col("jc")), 6).as("max_j"))
    }),

    // Embedding-cosine near-dup with label blocking: pairs only form
    // within a label (the ANN-bucket pattern); cosine in double via
    // HOFs. At 100 TB the label becomes an LSH/IVF bucket id.
    "q43_dedup_embedding" -> ((s, dir) => {
      // Norms are computed once per vector BEFORE the pair join (n
      // folds), not per pair (n^2 folds) — same values, ~3x less work.
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("nrm", Vectors.l2Norm(col("embedding")))
      e.as("a")
        .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.label").as("label"),
          (Vectors.dot(col("a.embedding"), col("b.embedding")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
        .filter(col("cos") >= 0.3)
        .groupBy("label")
        .agg(cnt.as("n_pairs"), round(max(col("cos")), 6).as("max_cos"))
        .orderBy("label")
    }),

    // LSH-bucketed ANN: 4-bit sign bucket (axis-aligned random
    // hyperplanes), candidates = query's bucket only, exact cosine
    // re-rank inside. The scale path vs q38's brute force: bucket
    // count grows with bits, candidates shrink geometrically.
    "q44_ann_lsh" -> ((s, dir) => {
      val signBucket = concat((1 to 4).map(i =>
        when(element_at(col("embedding"), i) >= 0, "1").otherwise("0")): _*)
      val b = Tables.load(s, dir, "embeddings").withColumn("bucket", signBucket)
      val qv = b.filter(col("vec_id") === 0)
        .select(col("embedding").as("v"), col("bucket").as("qbucket"))
      b.join(broadcast(qv), col("bucket") === col("qbucket"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"),
          round(Vectors.cosineSimilarity(col("embedding"), col("v")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(5)
    }),

    // Language-ID confusion matrix (graft.operators.TextAnalysis):
    // integer-ppm unigram profiles, argmax prediction.
    "q45_lang_id" -> ((s, dir) => {
      TextAnalysis.langIdPredictions(Tables.load(s, dir, "documents"))
        .groupBy("lang", "pred_lang")
        .agg(cnt.as("n"))
        .orderBy("lang", "pred_lang")
    }),

    // Per-source quality-score profile from the integer-ppm scorer.
    "q46_quality_score" -> ((s, dir) => {
      TextAnalysis.qualityScores(Tables.load(s, dir, "documents"),
          stopwords = Seq("the", "a"), groupCol = "source")
        .groupBy("source")
        .agg(cnt.as("n_docs"),
          round(avg(col("score").cast(DecimalType(18, 6))), 6).cast("double").as("avg_score"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"),
          sum(when(col("score") < 500000, 1).otherwise(0)).as("n_low"))
        .orderBy("source")
    }),

    // Token counting three ways: whitespace split, a BPE-ish regex
    // segmentation (codegen'd regexp_extract_all, no UDF), and a
    // chars/4 estimate — the standard triad for corpus sizing.
    "q47_token_count" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .groupBy("lang")
        .agg(cnt.as("n_docs"),
          sum(size(split(col("text"), " "))).as("sum_ws_tokens"),
          sum(size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)"))).as("sum_re_tokens"),
          sum(expr("(n_chars + 3) DIV 4")).as("sum_bpe_est"))
        .orderBy("lang")
    }),

    // Document fingerprinting: bottom-4 sketch of shingle hashes
    // (winnowing-style), collapsed to one md5 fingerprint per doc.
    // Grouping fingerprints finds shared-content docs without any
    // pair join.
    "q48_fingerprint" -> ((s, dir) => {
      // The whole fingerprint is a per-row projection over the shingle
      // ARRAY: slice(array_sort(transform(md5))) picks the bottom-4
      // hashes INSIDE the row — no explode, no collect_list buffers,
      // and zero shuffles until the final tiny group-by-fingerprint
      // (measured ~15x faster than the explode + grouped-collect
      // formulation, and embarrassingly parallel at any scale).
      val fp = Dedup.shingleArrays(Tables.load(s, dir, "documents"))
        .select(col("doc_id"),
          slice(array_sort(transform(col("shs"), sh => md5(sh))), 1, 4).as("hs"))
        // try_element_at: ANSI mode (Spark 4 default) makes plain
        // element_at THROW past the array end; docs with <4 shingles
        // must pad with '' instead (matching the oracle's ELSE '').
        .select(col("doc_id"), md5(concat_ws("|",
          (1 to 4).map(i => coalesce(try_element_at(col("hs"), lit(i)), lit(""))): _*)).as("f"))
      Dedup.groupStats(fp.groupBy("f").agg(cnt.as("n")), "n_shared")
        .withColumnRenamed("n_groups", "n_fingerprints")
    }),

    // Multimodal plumbing (graft.operators.Multimodal): binary payload
    // + typed metadata through a partition-wise decode stub, features
    // aggregated back in DataFrame land.
    "q49_multimodal_features" -> ((s, dir) => {
      Multimodal.decodeFeatures(Multimodal.ingest(Tables.load(s, dir, "documents")))
        .groupBy("lang")
        .agg(cnt.as("n_media"),
          sum(col("byte_len")).as("sum_bytes"),
          countDistinct(col("content_hash")).as("n_distinct_content"),
          sum(col("frames")).as("sum_frames"))
        .orderBy("lang")
    }),

    // Full MinHash+LSH banding pipeline: shingle -> 8-component
    // signature -> 2 bands of 4 -> candidate pairs -> exact Jaccard
    // verify. The end-to-end 100 TB near-dup shape: candidates scale
    // with true dup density (254 pairs over 5000 docs here), not
    // quadratically.
    "q50_dedup_lsh_bands" -> ((s, dir) => {
      // The per-doc shingle ARRAYS are checkpointed once (compact: one
      // row per doc) and feed everything: the signature is computed
      // in-row with zero shuffles (minhashSignatureFromArrays), and
      // verify/cardinalities explode the same checkpoint. The
      // signature is checkpointed too — it feeds both band self-joins.
      // (localCheckpoint, NOT .persist(): the cache manager would match
      // the identical plan across queries, warming the cold benchmark.)
      val arr = Dedup.shingleArrays(Tables.load(s, dir, "documents"))
        .repartition(col("doc_id")).localCheckpoint()
      val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
      val sig = Dedup.minhashSignatureFromArrays(arr, k = 8).localCheckpoint()
      val cand = Dedup.lshCandidates(sig, bands = Seq(Seq(1, 2, 3, 4), Seq(5, 6, 7, 8)))
      Dedup.jaccardVerify(cand, sh)
        .agg(cnt.as("n_candidates"),
          sum(when(col("jc") >= 0.7, 1).otherwise(0)).as("n_verified"),
          round(avg(col("jc").cast(DecimalType(18, 9))), 6).cast("double").as("avg_jaccard"))
    }),

    // Dedup.signatureKey under the oracle gate: the IN-ROW MinHash
    // signature key — the exact column the streaming ingest filter
    // (StreamingAnalytics.nearDupStream) dedups on — grouped over the
    // corpus. Reports what the filter would do to this corpus: distinct
    // keys, signature-identical groups, docs the filter drops. The key
    // is a pure projection (zero shuffle until the one groupBy on the
    // key); short texts enter via their prefixed exact-content
    // fallback, so the whole keyspace is gated, not just the happy
    // path.
    "q113_sig_groups" -> ((s, dir) => {
      val g = Tables.load(s, dir, "documents")
        .select(Dedup.signatureKey(col("text")).as("sig"))
        .groupBy("sig").agg(cnt.as("n"))
      g.agg(cnt.as("n_keys"), sum(col("n")).as("n_docs"),
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
          max(col("n")).as("max_group"))
        .select(col("n_keys"), col("n_docs"), col("n_dup_groups"),
          (col("n_docs") - col("n_keys")).as("n_redundant"), col("max_group"))
    }),

    // The dedup DIAL (round 5): survivorship under the q42 Jaccard
    // kernel at thresholds 0.50..0.90 — the report that sets the
    // near-dup threshold from measured data, the way q132/q134 set
    // nprobe for the ANN stack. The kernel runs ONCE; each doc's max
    // Jaccard to any LOWER-id partner (keep-first, q135's rule) is
    // one groupBy, and the whole curve is conditional sums over that
    // per-doc max — never five kernel passes. jc is ROUND(..,6)'d
    // before every threshold compare (§5); docs with no candidate
    // pair survive every threshold by construction.
    "q136_dedup_curve" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val arr = Dedup.shingleArrays(docs)
        .repartition(col("doc_id")).localCheckpoint()
      val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
      val ths = 50 to 90 by 10
      val mj = Dedup.jaccardAllPairs(sh, maxDf = 1000)
        .select(col("j"), round(col("jc"), 6).as("jc"))
        .groupBy("j").agg(max(col("jc")).as("mj"))
      val dropped = mj.agg(
        sum(when(col("mj") >= ths.head / 100.0, 1L).otherwise(0L)).as(s"d${ths.head}"),
        ths.tail.map(t => sum(when(col("mj") >= t / 100.0, 1L).otherwise(0L)).as(s"d$t")): _*)
      docs.agg(cnt.as("n_docs")).crossJoin(dropped)
        .select(col("n_docs"), explode(array(ths.map(t =>
          struct(lit(t.toLong).as("threshold_pct"),
            coalesce(col(s"d$t"), lit(0L)).as("n_dropped"))): _*)).as("x"))
        .select(col("x.threshold_pct"), col("n_docs"), col("x.n_dropped"))
        .withColumn("n_survivors", col("n_docs") - col("n_dropped"))
        .withColumn("drop_ppm", expr("n_dropped * 1000000 DIV n_docs"))
        .orderBy("threshold_pct")
    })
  )

  /** DuckDB oracles for q41-q50 (validated on DuckDB 1.0.0 at sf0.01
    * and sf0.1 before the natives were written — tools/ prototypes). */
  val oracle: Map[String, String] = Map(
    "q41_dedup_simhash" -> """
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text),' ')) tok FROM documents),
t AS (SELECT * FROM toks WHERE tok <> ''),
bits AS (SELECT doc_id, tok, unnest(generate_series(1,16)) b FROM t),
contrib AS (SELECT doc_id, b,
  CASE WHEN strpos('0123456789abcdef', substr(md5(tok), b, 1)) - 1 >= 8 THEN 1 ELSE -1 END c
  FROM bits),
bitsum AS (SELECT doc_id, b, SUM(c) s FROM contrib GROUP BY doc_id, b),
sig AS (SELECT doc_id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) sg
        FROM bitsum GROUP BY doc_id),
grp AS (SELECT sg, COUNT(*) n FROM sig GROUP BY sg)
SELECT COUNT(*) n_groups, CAST(SUM(n) AS BIGINT) n_docs,
       CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) n_near_dupes
FROM grp""",

    "q42_dedup_ngram_jaccard" -> """
WITH d AS (SELECT doc_id, string_split(lower(text),' ') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l)-2)) i, l FROM d WHERE len(l) >= 3),
sh AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] sh FROM s),
shk AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000)),
card AS (SELECT doc_id, COUNT(*) nt FROM shk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
jac AS (SELECT x.i, x.j, CAST(x.ci AS DOUBLE)/(ca.nt + cb.nt - x.ci) jc
        FROM inter x
        JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j)
SELECT COUNT(*) n_pairs, CAST(ROUND(AVG(CAST(jc AS DECIMAL(18,9))),6) AS DOUBLE) avg_j, ROUND(MAX(jc),6) max_j
FROM jac WHERE jc >= 0.2""",

    "q43_dedup_embedding" -> """
WITH p AS (SELECT a.label, a.vec_id i, b.vec_id j,
  list_sum(list_transform(list_zip(a.embedding,b.embedding), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))
  /(SQRT(list_sum(list_transform(a.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
   *SQRT(list_sum(list_transform(b.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) cos
 FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id)
SELECT label, COUNT(*) n_pairs, ROUND(MAX(cos),6) max_cos
FROM p WHERE cos >= 0.3 GROUP BY label ORDER BY label""",

    "q44_ann_lsh" -> """
WITH b AS (SELECT vec_id, label, embedding,
  concat(CASE WHEN embedding[1]>=0 THEN '1' ELSE '0' END, CASE WHEN embedding[2]>=0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[3]>=0 THEN '1' ELSE '0' END, CASE WHEN embedding[4]>=0 THEN '1' ELSE '0' END) bucket
  FROM embeddings),
qv AS (SELECT embedding v, bucket FROM b WHERE vec_id = 0)
SELECT e.vec_id, e.label,
  ROUND(list_sum(list_transform(list_zip(e.embedding, qv.v), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))
  /(SQRT(list_sum(list_transform(e.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
   *SQRT(list_sum(list_transform(qv.v, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),6) cos_sim
FROM b e JOIN qv ON e.bucket = qv.bucket
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id LIMIT 5""",

    "q45_lang_id" -> """
WITH toks AS (SELECT doc_id, lang, unnest(string_split(lower(text),' ')) tok FROM documents),
t AS (SELECT * FROM toks WHERE tok <> ''),
profile AS (SELECT lang pl, tok ptok, COUNT(*) c FROM t GROUP BY lang, tok),
tot AS (SELECT lang plang, COUNT(*) tc FROM t GROUP BY lang),
scored AS (
  SELECT t.doc_id, t.lang, tot.plang, SUM((COALESCE(p.c, 0) * 1000000) // tot.tc) score
  FROM t CROSS JOIN tot
  LEFT JOIN profile p ON p.pl = tot.plang AND p.ptok = t.tok
  GROUP BY t.doc_id, t.lang, tot.plang),
pred AS (SELECT doc_id, lang, plang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) rn FROM scored)
SELECT lang, plang AS pred_lang, COUNT(*) n FROM pred WHERE rn = 1
GROUP BY lang, plang ORDER BY lang, pred_lang""",

    "q46_quality_score" -> """
WITH toks AS (SELECT doc_id, source, unnest(string_split(lower(text),' ')) tok FROM documents),
t AS (SELECT * FROM toks WHERE tok <> ''),
per_doc AS (
  SELECT doc_id, source, COUNT(*) ntok, COUNT(DISTINCT tok) nuniq,
         SUM(CASE WHEN tok IN ('the','a') THEN 1 ELSE 0 END) nstop,
         SUM(length(tok)) sumlen
  FROM t GROUP BY doc_id, source),
scored AS (
  SELECT doc_id, source,
    (6 * ((nuniq * 1000000) // ntok)
   + 3 * (1000000 - ((nstop * 1000000) // ntok))
   + 1 * (least((sumlen * 100) // ntok, 800) * 1250)) // 10 AS score
  FROM per_doc)
SELECT source, COUNT(*) n_docs,
       CAST(ROUND(AVG(CAST(score AS DECIMAL(18,6))), 6) AS DOUBLE) avg_score,
       CAST(MIN(score) AS BIGINT) min_score, CAST(MAX(score) AS BIGINT) max_score,
       CAST(SUM(CASE WHEN score < 500000 THEN 1 ELSE 0 END) AS BIGINT) n_low
FROM scored GROUP BY source ORDER BY source""",

    "q47_token_count" -> """
SELECT lang, COUNT(*) n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) sum_ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT) sum_re_tokens,
       CAST(SUM((n_chars + 3) // 4) AS BIGINT) sum_bpe_est
FROM documents GROUP BY lang ORDER BY lang""",

    "q48_fingerprint" -> """
WITH d AS (SELECT doc_id, string_split(lower(text),' ') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l)-2)) i, l FROM d WHERE len(l) >= 3),
sh AS (SELECT DISTINCT doc_id, md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2]) h FROM s),
rk AS (SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) rn FROM sh),
fp AS (SELECT doc_id, md5(concat(
         MAX(CASE WHEN rn=1 THEN h ELSE '' END), '|', MAX(CASE WHEN rn=2 THEN h ELSE '' END), '|',
         MAX(CASE WHEN rn=3 THEN h ELSE '' END), '|', MAX(CASE WHEN rn=4 THEN h ELSE '' END))) f
       FROM rk WHERE rn <= 4 GROUP BY doc_id),
grp AS (SELECT f, COUNT(*) n FROM fp GROUP BY f)
SELECT COUNT(*) n_fingerprints, CAST(SUM(n) AS BIGINT) n_docs,
       CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) n_shared
FROM grp""",

    "q49_multimodal_features" -> """
SELECT lang, COUNT(*) n_media,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) sum_bytes,
       COUNT(DISTINCT md5(text)) n_distinct_content,
       CAST(SUM(octet_length(encode(text)) // 100) AS BIGINT) sum_frames
FROM documents GROUP BY lang ORDER BY lang""",

    "q50_dedup_lsh_bands" -> """
WITH d AS (SELECT doc_id, string_split(lower(text),' ') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l)-2)) i, l FROM d WHERE len(l) >= 3),
t AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] sh FROM s),
sig AS (SELECT doc_id,
  MIN(substr(md5(sh), 1, 4)) h1, MIN(substr(md5(sh), 5, 4)) h2,
  MIN(substr(md5(sh), 9, 4)) h3, MIN(substr(md5(sh), 13, 4)) h4,
  MIN(substr(md5(sh), 17, 4)) h5, MIN(substr(md5(sh), 21, 4)) h6,
  MIN(substr(md5(sh), 25, 4)) h7, MIN(substr(md5(sh), 29, 4)) h8
  FROM t GROUP BY doc_id),
cand AS (
  SELECT a.doc_id i, b.doc_id j FROM sig a JOIN sig b
    ON a.h1=b.h1 AND a.h2=b.h2 AND a.h3=b.h3 AND a.h4=b.h4 AND a.doc_id < b.doc_id
  UNION SELECT a.doc_id, b.doc_id FROM sig a JOIN sig b
    ON a.h5=b.h5 AND a.h6=b.h6 AND a.h7=b.h7 AND a.h8=b.h8 AND a.doc_id < b.doc_id),
card AS (SELECT doc_id, COUNT(*) nt FROM t GROUP BY doc_id),
inter AS (SELECT c.i, c.j, COUNT(*) ci FROM cand c
          JOIN t ta ON ta.doc_id = c.i JOIN t tb ON tb.doc_id = c.j AND ta.sh = tb.sh
          GROUP BY c.i, c.j),
jac AS (SELECT c.i, c.j, CAST(COALESCE(x.ci,0) AS DOUBLE)/(ca.nt + cb.nt - COALESCE(x.ci,0)) jc
        FROM cand c LEFT JOIN inter x ON x.i = c.i AND x.j = c.j
        JOIN card ca ON ca.doc_id = c.i JOIN card cb ON cb.doc_id = c.j)
SELECT COUNT(*) n_candidates,
       CAST(SUM(CASE WHEN jc >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) n_verified,
       CAST(ROUND(AVG(CAST(jc AS DECIMAL(18,9))), 6) AS DOUBLE) avg_jaccard
FROM jac""",

    // q50's hex-window signature components concatenated into the one
    // key string; docs under the shingle width join back via the
    // prefixed exact-content fallback — byte-identical to
    // Dedup.signatureKey (OperatorSpec differential test)
    "q113_sig_groups" -> """
WITH d AS (SELECT doc_id, lower(text) lt, string_split(lower(text),' ') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l)-2)) i, l FROM d WHERE len(l) >= 3),
t AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] sh FROM s),
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

    // q42's capped kernel verbatim, then per-doc max Jaccard to a
    // lower-id partner and the conditional-sum threshold curve
    "q136_dedup_curve" -> """
WITH d AS (SELECT doc_id, string_split(lower(text),' ') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l)-2)) i, l FROM d WHERE len(l) >= 3),
sh AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] sh FROM s),
shk AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000)),
card AS (SELECT doc_id, COUNT(*) nt FROM shk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
jac AS (SELECT x.j, ROUND(CAST(x.ci AS DOUBLE)/(ca.nt + cb.nt - x.ci), 6) jc
        FROM inter x
        JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j),
mj AS (SELECT j, MAX(jc) mj FROM jac GROUP BY j),
t AS (SELECT unnest([50, 60, 70, 80, 90]) tp),
n AS (SELECT COUNT(*) n_docs FROM documents)
SELECT CAST(t.tp AS BIGINT) AS threshold_pct, CAST(n.n_docs AS BIGINT) AS n_docs,
  CAST((SELECT COUNT(*) FROM mj WHERE mj.mj >= t.tp / 100.0) AS BIGINT) AS n_dropped,
  CAST(n.n_docs - (SELECT COUNT(*) FROM mj WHERE mj.mj >= t.tp / 100.0) AS BIGINT) AS n_survivors,
  CAST((SELECT COUNT(*) FROM mj WHERE mj.mj >= t.tp / 100.0) * 1000000 // n.n_docs AS BIGINT) AS drop_ppm
FROM t CROSS JOIN n ORDER BY threshold_pct"""
  ).map { case (k, v) => k -> v.trim }
}
