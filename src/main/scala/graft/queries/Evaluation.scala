package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.{Text, Vectors}
import graft.operators.{AnnSearch, Dedup, Pq}
import graft.sources.Tables

/** Index & estimator evaluation wave (q127–q130, round 4): the
  * engine's approximate structures measured against their own exact
  * ground truth, inside the engine, under the same oracle gate as
  * everything else.
  *
  * A 100 TB pipeline doesn't just RUN an LSH index or a MinHash
  * dedup — it has to decide whether the approximation is good enough
  * to trust (recall, estimator bias, cluster purity) and how to
  * re-weight what it keeps (temperature mixing). Each query here is
  * that decision's report:
  *   - q127: recall@10 of the q44 sign-LSH bucket index vs exact
  *     brute-force top-10 over a benchmark query set;
  *   - q128: the 8-component MinHash Jaccard estimate vs exact set
  *     Jaccard on the q50 LSH candidate pairs — a calibration curve;
  *   - q129: label purity of the q85 trained k-means clustering;
  *   - q130: temperature-scaled (α = 0.5) source mixing weights next
  *     to the natural token-mass weights (the sampling-temperature
  *     rebalance used to keep long-tail sources alive in a mix).
  *
  * Determinism per SURVEY.md §5: integer/ppm arithmetic, ROUND(..,6)
  * before any float threshold or DECIMAL capture, provably unique
  * orderings, md5 only (never native hash()), and the one transcendental
  * (sqrt in q130) captured as DECIMAL(18,6) immediately — sqrt is
  * correctly rounded per IEEE-754 in both engines, so the rounded
  * capture is bit-identical.
  */
object Evaluation {

  private def cnt = count(lit(1))

  /** q44's 4-bit axis-sign bucket — kept textually identical so the
    * recall this wave reports is the recall of the SHIPPED index. */
  private def signBucket = concat((1 to 4).map(i =>
    when(element_at(col("embedding"), i) >= 0, "1").otherwise("0")): _*)

  def queries: Map[String, Queries.QueryFn] = Map(

    // Recall@10 of the sign-LSH bucket index: for each of the first 20
    // vectors as query points, the exact cosine top-10 (the q38 brute
    // force — the ground truth an index evaluation must pay for once)
    // is intersected with the query's LSH bucket (the only candidates
    // q44 would ever score). Scale shape: the query set is the small
    // benchmark side — it broadcasts onto one corpus scan; the exact
    // top-10 window partitions by query id (never SinglePartition);
    // bucket membership is a pure projection. Ground-truth cost is
    // |queries| x |corpus|, the irreducible price of measuring recall,
    // paid on a bounded query set by construction.
    "q127_ann_recall" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings").withColumn("bucket", signBucket)
      val qs = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("bucket").as("qbucket"))
      val scored = e.join(broadcast(qs), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("qbucket"), col("vec_id"), col("bucket"),
          round(Vectors.cosineSimilarity(col("embedding"), col("qv")), 6).as("cos"))
      val topk = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rn") <= 10)
      // Candidate counts come from a bucket census (one corpus groupBy,
      // ~2^bits rows), NOT by filtering the |queries| x |corpus| scored
      // relation: the query's own bucket always contains the query, so
      // its candidate count is the census minus self.
      val census = e.groupBy("bucket").agg(cnt.as("nb"))
      topk.groupBy("qid")
        .agg(sum(when(col("bucket") === col("qbucket"), 1L).otherwise(0L)).as("n_hits"))
        .join(broadcast(qs.select(col("qid"), col("qbucket"))), Seq("qid"))
        .join(broadcast(census), col("qbucket") === col("bucket"))
        .withColumn("n_candidates", col("nb") - 1)
        .withColumn("recall_ppm", expr("n_hits * 1000000 DIV 10"))
        .select("qid", "n_candidates", "n_hits", "recall_ppm")
        .orderBy("qid")
    }),

    // MinHash estimator calibration: on q50's banded-LSH candidate
    // pairs, the signature's Jaccard estimate (matching components / 8,
    // exact in ppm: matches x 125000) against the exact set Jaccard,
    // grouped into the 5 possible estimate levels a 2x4-band candidate
    // can have (>= 4 matches by construction). The per-level mean exact
    // Jaccard and mean absolute error are the calibration curve that
    // says whether 8 components are enough before trusting the
    // estimate at 100 TB (where exact verification of every candidate
    // is the cost being avoided). Same kernel costs as q50: signatures
    // in-row, candidates from band equi-joins, exact verification only
    // on the candidate set.
    "q128_minhash_fidelity" -> ((s, dir) => {
      val arr = Dedup.shingleArrays(Tables.load(s, dir, "documents"))
        .repartition(col("doc_id")).localCheckpoint()
      val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
      val sig = Dedup.minhashSignatureFromArrays(arr, k = 8).localCheckpoint()
      val cand = Dedup.lshCandidates(sig, bands = Seq(Seq(1, 2, 3, 4), Seq(5, 6, 7, 8)))
      val si = sig.select(col("doc_id").as("i") +: (1 to 8).map(n => col(s"h$n").as(s"a$n")): _*)
      val sj = sig.select(col("doc_id").as("j") +: (1 to 8).map(n => col(s"h$n").as(s"b$n")): _*)
      val m = cand.join(si, "i").join(sj, "j")
        .withColumn("matches",
          (1 to 8).map(n => when(col(s"a$n") === col(s"b$n"), 1L).otherwise(0L)).reduce(_ + _))
        .withColumn("est_ppm", col("matches") * 125000)
      val card = sh.groupBy("doc_id").agg(cnt.as("nt"))
      val inter = cand
        .join(sh.select(col("doc_id").as("i"), col("sh").as("ia")), "i")
        .join(sh.select(col("doc_id").as("j"), col("sh").as("ib")), "j")
        .filter(col("ia") === col("ib"))
        .groupBy("i", "j").agg(cnt.as("ci"))
      m.join(inter, Seq("i", "j"), "left")
        .join(card.select(col("doc_id").as("i"), col("nt").as("na")), "i")
        .join(card.select(col("doc_id").as("j"), col("nt").as("nb")), "j")
        .withColumn("ci", coalesce(col("ci"), lit(0L)))
        .withColumn("exact_ppm", expr("ci * 1000000 DIV (na + nb - ci)"))
        .withColumn("err_ppm", abs(col("est_ppm") - col("exact_ppm")))
        .groupBy("matches", "est_ppm")
        .agg(cnt.as("n_pairs"),
          round(avg(col("exact_ppm").cast(DecimalType(18, 6))), 6).cast("double").as("avg_exact_ppm"),
          round(avg(col("err_ppm").cast(DecimalType(18, 6))), 6).cast("double").as("avg_abs_err_ppm"))
        .select("matches", "est_ppm", "n_pairs", "avg_exact_ppm", "avg_abs_err_ppm")
        .orderBy("matches")
    }),

    // Cluster purity of the trained coarse quantizer: q85's 2-round
    // k-means, every vector assigned by the zero-shuffle broadcast
    // argmin, then each cluster's modal true label and purity in ppm —
    // the clustering-quality number that says whether the IVF
    // partition is semantically coherent (pure lists = neighbors
    // co-located = high recall at low nprobe). Modal label via the
    // min-struct hash-agg argmax (no window), the q80/q88 pattern.
    "q129_cluster_purity" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents = AnnSearch.kmeansCentroids(
        emb, dims = 64, k = 4, iters = 2, sampleBound = None).localCheckpoint()
      AnnSearch.assignBuckets(emb, cents)
        .select(col("bucket").cast("long").as("clabel"), col("label"))
        .groupBy("clabel", "label").agg(cnt.as("n"))
        .groupBy("clabel")
        .agg(sum(col("n")).as("n_vecs"),
          min(struct((-col("n")).as("nn"), col("label").as("lb"))).as("m"))
        .select(col("clabel"), col("n_vecs"),
          col("m").getField("lb").as("top_label"),
          (-col("m").getField("nn")).as("top_n"))
        .withColumn("purity_ppm", expr("top_n * 1000000 DIV n_vecs"))
        .orderBy("clabel")
    }),

    // The IVF recall curve: recall@10 of the trained q85 quantizer at
    // nprobe = 1..4, against the same exact brute-force ground truth
    // as q127 — the report that sets the nprobe knob (the IVF recall/
    // cost dial) from measured data instead of folklore. A candidate
    // in a bucket of centroid-rank r participates at every nprobe >= r
    // (in-row sequence explode — the nested candidate sets computed
    // once, never 4 separate searches); at nprobe = k the curve must
    // reach exactly 1e6 — a built-in sanity pin. Ground truth and the
    // per-(query, nprobe) top-10 windows are all keyed; ~2^k-row side
    // tables broadcast. AnnProbeSpec proves recall monotonicity
    // unit-wise; this puts the whole curve under the DuckDB hash gate.
    "q132_ivf_nprobe_recall" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val cents = AnnSearch.kmeansCentroids(
        e, dims = 64, k = 4, iters = 2, sampleBound = None).localCheckpoint()
      val assigned = AnnSearch.assignBuckets(e, cents)
        .select(col("vec_id"), col("bucket").cast("long").as("clabel"))
      val qs = e.filter(col("vec_id") < 20)
      val qp = AnnSearch.probeBuckets(qs, cents, nprobe = 4)
        .select(col("vec_id").as("qid"), posexplode(col("buckets")))
        .select(col("qid"), (col("pos") + 1).cast("long").as("rnk"),
          col("col").cast("long").as("clabel"))
      val qv = qs.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val scored = e.join(broadcast(qv), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(Vectors.cosineSimilarity(col("embedding"), col("qv")), 6).as("cos"))
      val exact10 = scored.withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rn") <= 10).select(col("qid"), col("vec_id"), lit(1L).as("ex"))
      val cand = scored.join(assigned, Seq("vec_id"))
        .join(broadcast(qp), Seq("qid", "clabel"))
        .withColumn("nprobe", explode(sequence(col("rnk"), lit(4L))))
      val sizes = cand.groupBy("nprobe").agg(expr("count(1) DIV 20").as("avg_cands"))
      val t10 = cand.withColumn("rn", row_number().over(
          Window.partitionBy("qid", "nprobe").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rn") <= 10)
      t10.join(broadcast(exact10), Seq("qid", "vec_id"), "left")
        .groupBy("nprobe").agg(sum(coalesce(col("ex"), lit(0L))).as("n_hits"))
        .join(broadcast(sizes), Seq("nprobe"))
        .withColumn("recall_ppm", expr("n_hits * 1000000 DIV 200"))
        .select("nprobe", "avg_cands", "n_hits", "recall_ppm")
        .orderBy("nprobe")
    }),

    // The SHIPPED stack's recall curve: q101's residual IVF-PQ (same
    // coarse quantizer, residuals, codebooks, encodes) searched with
    // multi-probe ADC at nprobe = 1..4, recall@10 vs the exact
    // squared-L2 top-10 — q132 measures the IVF dial alone, this
    // measures IVF x PQ together, the number that says whether 32x
    // compression + 1-of-k probing is good enough before trusting it
    // at 100 TB. The multi-probe identity: in probed cell c the query
    // is quantized as (q - cent_c), so each (query, cell) gets its OWN
    // residual and m x k ADC table — all of it tiny (|q| x k cells x
    // m x k codes rows, broadcast); candidates participate at every
    // nprobe >= their cell's rank (q132's one in-row sequence
    // explode). ADC entries are 6-decimal DECIMAL captures (q101's
    // discipline) so the m-way sum is partition-order-independent;
    // every window is keyed by (qid, nprobe). Ground-truth cost is
    // |queries| x |corpus| on a bounded query set, as q127.
    "q134_ivfpq_nprobe" -> ((s, dir) => {
      val w = 32 // dims 64 / m 2
      val e = Tables.load(s, dir, "embeddings")
      val cents = AnnSearch.kmeansCentroids(
        e, dims = 64, k = 4, iters = 2, sampleBound = None).localCheckpoint()
      val res = Pq.residuals(e, cents).localCheckpoint()
      val book = Pq.train(res, dims = 64, m = 2, k = 4, iters = 1,
        sampleBound = None).localCheckpoint()
      val codes = Pq.encode(res, book, dims = 64, m = 2)
      val assigned = res.select(col("vec_id"), col("bucket").cast("long").as("clabel"))
      val qs = e.filter(col("vec_id") < 20)
      val qp = AnnSearch.probeBuckets(qs, cents, nprobe = 4)
        .select(col("vec_id").as("qid"), posexplode(col("buckets")))
        .select(col("qid"), (col("pos") + 1).cast("long").as("rnk"),
          col("col").cast("long").as("clabel"))
      // per-(query, probed cell) residual — the same float roundtrip
      // as Pq.residuals, against EVERY cell's centroid
      val qres = qs.select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .crossJoin(broadcast(cents.select(
          col("clabel").cast("long").as("clabel"), col("cent"))))
        .select(col("qid"), col("clabel"),
          zip_with(col("qv"), col("cent"),
            (x, y) => (x.cast("double") - y).cast("float")).as("qr"))
      // ADC tables: (qid, cell, sub, code) -> 6-decimal DECIMAL distance
      val dt = qres.crossJoin(broadcast(book.select(
          col("sub"), col("clabel").as("code"), col("cent").as("bc"))))
        .select(col("qid"), col("clabel"), col("sub"), col("code"),
          round(Vectors.sqDist(
            slice(col("qr"), col("sub") * w + 1, lit(w)), col("bc")), 6)
            .cast(DecimalType(18, 6)).as("d"))
      val adc = codes.join(assigned, Seq("vec_id"))
        .join(broadcast(qp), Seq("clabel"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("rnk"), col("clabel"), col("vec_id"),
          posexplode(col("codes")).as(Seq("sub", "code")))
        .join(broadcast(dt), Seq("qid", "clabel", "sub", "code"))
        .groupBy("qid", "rnk", "vec_id")
        .agg(sum(col("d")).cast("double").as("adc"))
        .withColumn("nprobe", explode(sequence(col("rnk"), lit(4L))))
      val sizes = adc.groupBy("nprobe").agg(expr("count(1) DIV 20").as("avg_cands"))
      val qv = qs.select(col("vec_id").as("qid"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
      val ex10 = e.join(broadcast(qv), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(Vectors.sqDist(col("embedding"), col("qv")), 6).as("l2"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("l2"), col("vec_id"))))
        .filter(col("rn") <= 10).select(col("qid"), col("vec_id"), lit(1L).as("ex"))
      val t10 = adc.withColumn("rn", row_number().over(
          Window.partitionBy("qid", "nprobe").orderBy(col("adc"), col("vec_id"))))
        .filter(col("rn") <= 10)
      t10.join(broadcast(ex10), Seq("qid", "vec_id"), "left")
        .groupBy("nprobe").agg(sum(coalesce(col("ex"), lit(0L))).as("n_hits"))
        .join(broadcast(sizes), Seq("nprobe"))
        .withColumn("recall_ppm", expr("n_hits * 1000000 DIV 200"))
        .select("nprobe", "avg_cands", "n_hits", "recall_ppm")
        .orderBy("nprobe")
    }),

    // Temperature-scaled mixing weights (α = 0.5): w_i ∝ sqrt(mass_i),
    // the standard sampling-temperature rebalance that keeps long-tail
    // sources alive in a training mix, reported next to q68's natural
    // weights and the per-source boost it implies. sqrt is the wave's
    // one transcendental: computed once per SOURCE (k rows, not
    // corpus rows) from an exact integer mass, ROUND(..,6)-captured
    // into DECIMAL(18,6) micro-units immediately, so every downstream
    // share is pure integer arithmetic — partition-order-independent
    // and identical cross-engine. One corpus tokenize + groupBy; the
    // totals are a 1-row broadcast; DECIMAL(38,0) widening before the
    // x 1e6 products (q68's rule: toks x 1e6 overflows int64 past
    // ~9e12 tokens, which a 100 TB corpus exceeds).
    "q130_temperature_mix" -> ((s, dir) => {
      val t = Tables.load(s, dir, "documents")
        .select(col("source"),
          size(filter(Text.tokens(col("text")), x => x =!= "")).as("ntok"))
        .groupBy("source").agg(sum(col("ntok")).as("toks"))
        .withColumn("micro",
          (round(sqrt(col("toks").cast("double")), 6).cast(DecimalType(18, 6)) * 1000000)
            .cast("long"))
      t.crossJoin(broadcast(
          t.agg(sum(col("toks")).as("tt"), sum(col("micro")).as("tm"))))
        .select(col("source"), col("toks"),
          expr("CAST(toks AS DECIMAL(38,0)) * 1000000 DIV tt").cast("long").as("natural_ppm"),
          expr("CAST(micro AS DECIMAL(38,0)) * 1000000 DIV tm").cast("long").as("tempered_ppm"))
        .withColumn("boost_pct",
          expr("tempered_ppm * 100 DIV NULLIF(natural_ppm, 0)"))
        .orderBy("source")
    }))

  /** q50's shingle/signature/candidate CTEs verbatim — q128 evaluates
    * the SHIPPED estimator, so the oracle must model the same one. */
  private val lshCtes = """
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
    ON a.h5=b.h5 AND a.h6=b.h6 AND a.h7=b.h7 AND a.h8=b.h8 AND a.doc_id < b.doc_id)"""

  def oracle: Map[String, String] = Map(

    "q127_ann_recall" -> """
WITH e AS (SELECT vec_id, embedding,
  concat(CASE WHEN embedding[1]>=0 THEN '1' ELSE '0' END, CASE WHEN embedding[2]>=0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[3]>=0 THEN '1' ELSE '0' END, CASE WHEN embedding[4]>=0 THEN '1' ELSE '0' END) bucket
  FROM embeddings),
q AS (SELECT vec_id qid, embedding qv, bucket qbucket FROM e WHERE vec_id < 20),
scored AS (SELECT q.qid, q.qbucket, e.vec_id, e.bucket,
  ROUND(
    list_sum(list_transform(list_zip(e.embedding, q.qv), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))
    /(SQRT(list_sum(list_transform(e.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
     *SQRT(list_sum(list_transform(q.qv, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 6) cos
  FROM e JOIN q ON e.vec_id <> q.qid),
topk AS (SELECT * FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) rn FROM scored)
  WHERE rn <= 10),
cands AS (SELECT qid, COUNT(*) n_candidates FROM scored WHERE bucket = qbucket GROUP BY qid),
h AS (SELECT qid, SUM(CASE WHEN bucket = qbucket THEN 1 ELSE 0 END) n_hits FROM topk GROUP BY qid)
SELECT h.qid, CAST(COALESCE(c.n_candidates, 0) AS BIGINT) AS n_candidates,
  CAST(h.n_hits AS BIGINT) AS n_hits,
  CAST(h.n_hits * 1000000 // 10 AS BIGINT) AS recall_ppm
FROM h LEFT JOIN cands c ON h.qid = c.qid
ORDER BY h.qid""",

    "q128_minhash_fidelity" -> (lshCtes + """,
card AS (SELECT doc_id, COUNT(*) nt FROM t GROUP BY doc_id),
inter AS (SELECT c.i, c.j, COUNT(*) ci FROM cand c
          JOIN t ta ON ta.doc_id = c.i JOIN t tb ON tb.doc_id = c.j AND ta.sh = tb.sh
          GROUP BY c.i, c.j),
m AS (SELECT c.i, c.j,
  (CASE WHEN a.h1=b.h1 THEN 1 ELSE 0 END + CASE WHEN a.h2=b.h2 THEN 1 ELSE 0 END
 + CASE WHEN a.h3=b.h3 THEN 1 ELSE 0 END + CASE WHEN a.h4=b.h4 THEN 1 ELSE 0 END
 + CASE WHEN a.h5=b.h5 THEN 1 ELSE 0 END + CASE WHEN a.h6=b.h6 THEN 1 ELSE 0 END
 + CASE WHEN a.h7=b.h7 THEN 1 ELSE 0 END + CASE WHEN a.h8=b.h8 THEN 1 ELSE 0 END) matches
  FROM cand c JOIN sig a ON a.doc_id = c.i JOIN sig b ON b.doc_id = c.j),
p AS (SELECT m.matches, m.matches * 125000 est_ppm,
        COALESCE(x.ci, 0) * 1000000 // (ca.nt + cb.nt - COALESCE(x.ci, 0)) exact_ppm
      FROM m LEFT JOIN inter x ON x.i = m.i AND x.j = m.j
      JOIN card ca ON ca.doc_id = m.i JOIN card cb ON cb.doc_id = m.j)
SELECT CAST(matches AS BIGINT) AS matches, CAST(est_ppm AS BIGINT) AS est_ppm,
  COUNT(*) AS n_pairs,
  CAST(ROUND(AVG(CAST(exact_ppm AS DECIMAL(18,6))), 6) AS DOUBLE) AS avg_exact_ppm,
  CAST(ROUND(AVG(CAST(ABS(est_ppm - exact_ppm) AS DECIMAL(18,6))), 6) AS DOUBLE) AS avg_abs_err_ppm
FROM p GROUP BY matches, est_ppm ORDER BY matches"""),

    "q129_cluster_purity" -> (Diversity.kmeansCtes + """,
lbl AS (SELECT b3.clabel, emb.label FROM b3 JOIN embeddings emb USING (vec_id)),
cl AS (SELECT clabel, label, COUNT(*) n FROM lbl GROUP BY clabel, label),
top AS (SELECT clabel, label top_label, n top_n FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY clabel ORDER BY n DESC, label) rn FROM cl)
  WHERE rn = 1),
sz AS (SELECT clabel, CAST(SUM(n) AS BIGINT) n_vecs FROM cl GROUP BY clabel)
SELECT sz.clabel, sz.n_vecs, top.top_label, CAST(top.top_n AS BIGINT) AS top_n,
  CAST(top.top_n * 1000000 // sz.n_vecs AS BIGINT) AS purity_ppm
FROM sz JOIN top USING (clabel) ORDER BY sz.clabel"""),

    "q132_ivf_nprobe_recall" -> (Diversity.kmeansCtes + """,
qr AS (SELECT vec_id qid, clabel,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rnk
       FROM a3 WHERE vec_id < 20),
sc AS (SELECT q.vec_id qid, x.vec_id,
  ROUND(list_sum(list_transform(list_zip(x.v, q.v), p -> p[1]*p[2]))
    /(SQRT(list_sum(list_transform(x.v, y -> y*y)))
     *SQRT(list_sum(list_transform(q.v, y -> y*y)))), 6) cos
  FROM e x JOIN e q ON x.vec_id <> q.vec_id AND q.vec_id < 20),
ex10 AS (SELECT qid, vec_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) rn FROM sc)
  WHERE rn <= 10),
cand AS (SELECT sc.qid, sc.vec_id, sc.cos, np.np
         FROM sc JOIN b3 ON b3.vec_id = sc.vec_id
                 JOIN qr ON qr.qid = sc.qid AND qr.clabel = b3.clabel
                 CROSS JOIN range(1, 5) np(np)
         WHERE qr.rnk <= np.np),
sizes AS (SELECT np, COUNT(*) // 20 avg_cands FROM cand GROUP BY np),
t10 AS (SELECT qid, vec_id, np FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid, np ORDER BY cos DESC, vec_id) rn FROM cand)
  WHERE rn <= 10),
h AS (SELECT np, SUM(CASE WHEN ex10.vec_id IS NOT NULL THEN 1 ELSE 0 END) n_hits
      FROM t10 LEFT JOIN ex10 ON t10.qid = ex10.qid AND t10.vec_id = ex10.vec_id
      GROUP BY np)
SELECT CAST(h.np AS BIGINT) AS nprobe, CAST(sizes.avg_cands AS BIGINT) AS avg_cands,
  CAST(h.n_hits AS BIGINT) AS n_hits,
  CAST(h.n_hits * 1000000 // 200 AS BIGINT) AS recall_ppm
FROM h JOIN sizes ON h.np = sizes.np ORDER BY nprobe"""),

    // q101's pipeline CTEs (Composite.ivfpqCtes) verbatim, then: probe
    // ranks from a3, per-(query, cell) float-rounded residuals, DECIMAL
    // ADC tables per subspace, candidates at nprobe >= cell rank, ADC
    // top-10 vs the exact L2 top-10
    "q134_ivfpq_nprobe" -> (Composite.ivfpqCtes + """,
qr AS (SELECT vec_id qid, clabel,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rnk
       FROM a3 WHERE vec_id < 20),
qres AS (SELECT q.vec_id qid, c.clabel,
           list_transform(list_zip(q.v, c.cent), p -> CAST(CAST(p[1]-p[2] AS FLOAT) AS DOUBLE)) qv
         FROM e q CROSS JOIN c2 c WHERE q.vec_id < 20),
dt0 AS (SELECT qres.qid, qres.clabel, b.clabel AS code,
          CAST(ROUND(list_sum(list_transform(list_zip(qres.qv[1:32], b.cent), p -> (p[1]-p[2])*(p[1]-p[2]))), 6) AS DECIMAL(18,6)) d
        FROM qres CROSS JOIN p0cb b),
dt1 AS (SELECT qres.qid, qres.clabel, b.clabel AS code,
          CAST(ROUND(list_sum(list_transform(list_zip(qres.qv[33:64], b.cent), p -> (p[1]-p[2])*(p[1]-p[2]))), 6) AS DECIMAL(18,6)) d
        FROM qres CROSS JOIN p1cb b),
cand AS (SELECT qr.qid, qr.rnk, qr.clabel, r.vec_id
         FROM res r JOIN qr ON qr.clabel = r.bucket AND r.vec_id <> qr.qid),
adc AS (SELECT c.qid, c.rnk, c.vec_id, CAST(t0.d + t1.d AS DOUBLE) adc
        FROM cand c
        JOIN e0 ON e0.vec_id = c.vec_id
        JOIN dt0 t0 ON t0.qid = c.qid AND t0.clabel = c.clabel AND t0.code = e0.code
        JOIN e1 ON e1.vec_id = c.vec_id
        JOIN dt1 t1 ON t1.qid = c.qid AND t1.clabel = c.clabel AND t1.code = e1.code),
anp AS (SELECT qid, vec_id, adc, np.np FROM adc CROSS JOIN range(1,5) np(np)
        WHERE rnk <= np.np),
sizes AS (SELECT np, COUNT(*) // 20 avg_cands FROM anp GROUP BY np),
exd AS (SELECT q.vec_id qid, x.vec_id,
          ROUND(list_sum(list_transform(list_zip(x.v, q.v), p -> (p[1]-p[2])*(p[1]-p[2]))), 6) l2
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
  CAST(h.n_hits * 1000000 // 200 AS BIGINT) AS recall_ppm
FROM h JOIN sizes ON h.np = sizes.np ORDER BY nprobe"""),

    "q130_temperature_mix" -> """
WITH t AS (SELECT source,
             CAST(SUM(len(list_filter(string_split(lower(text),' '), x -> x <> ''))) AS BIGINT) AS toks
           FROM documents GROUP BY source),
r AS (SELECT source, toks,
        CAST(CAST(ROUND(SQRT(CAST(toks AS DOUBLE)), 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT) micro
      FROM t),
tot AS (SELECT SUM(toks) tt, SUM(micro) tm FROM r),
p AS (SELECT source, toks,
        CAST(CAST(toks AS HUGEINT) * 1000000 // tot.tt AS BIGINT) natural_ppm,
        CAST(CAST(micro AS HUGEINT) * 1000000 // tot.tm AS BIGINT) tempered_ppm
      FROM r CROSS JOIN tot)
SELECT source, toks, natural_ppm, tempered_ppm,
  CAST(tempered_ppm * 100 // NULLIF(natural_ppm, 0) AS BIGINT) AS boost_pct
FROM p ORDER BY source""")
}
