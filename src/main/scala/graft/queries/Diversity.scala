package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Vectors
import graft.operators.{AnnSearch, TextAnalysis}
import graft.sources.Tables

/** Diversity & cross-split curation wave (q124–q126 round 4, q135
  * round 5): cluster-stratified diversity downsampling,
  * embedding-space cross-split decontamination, the
  * boilerplate-prefix quality audit, and cluster-scoped semantic
  * dedup (SemDeDup).
  *
  * Same t2 gate as every wave: DuckDB oracles in [[oracle]],
  * prototyped at sf0.01 before the natives; determinism per SURVEY.md
  * §5 — md5 content addressing (never rand()), integer/ppm arithmetic,
  * explicit DECIMAL widths, ROUND before any float comparison.
  */
object Diversity {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Cluster-stratified diversity downsampling: train the q85 coarse
    // k-means, assign every vector (zero-shuffle broadcast argmin),
    // then keep each cluster down to the SMALLEST cluster's mass with
    // a content-addressed per-cluster rate — the embedding-space
    // rebalance that stops one over-crawled mode from dominating a
    // training mix. Membership is a pure projection (md5 prefix vs a
    // per-cluster hex bound), so the sampled corpus is reproducible on
    // any engine at any cluster size. The 2^32-scaled bound is
    // computed through DECIMAL(38,0) — m * 2^32 overflows int64 once
    // clusters pass ~2^31 vectors, which a 100 TB corpus does.
    "q124_diversity_sample" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents = AnnSearch.kmeansCentroids(
        emb, dims = 64, k = 4, iters = 2, sampleBound = None).localCheckpoint()
      val assigned = AnnSearch.assignBuckets(emb, cents)
        .select(col("bucket").cast("long").as("clabel"), col("vec_id"))
      val sizes = assigned.groupBy("clabel").agg(cnt.as("n_before"))
      val tgt = sizes.agg(min(col("n_before")).as("m"))
      val bounds = sizes.crossJoin(broadcast(tgt))
        .withColumn("bound", lpad(lower(hex(
          expr("(CAST(m AS DECIMAL(38,0)) * 4294967296) DIV n_before - 1"))),
          8, "0"))
      assigned.join(broadcast(bounds), Seq("clabel"))
        .withColumn("k",
          when(substring(md5(col("vec_id").cast("string")), 1, 8) <= col("bound"), 1L)
            .otherwise(0L))
        .groupBy("clabel", "n_before")
        .agg(sum(col("k")).as("n_kept"))
        .withColumn("kept_ppm", expr("n_kept * 1000000 DIV n_before"))
        .select("clabel", "n_before", "n_kept", "kept_ppm")
        .orderBy("clabel")
    }),

    // Embedding-space cross-split decontamination: after the q66-style
    // content-addressed split, flag TRAIN vectors whose cosine to any
    // EVAL vector reaches 0.3 — the semantic leak a shingle check
    // (q123) can't see, because paraphrases share no 5-gram. Candidate
    // pairs come from the q44 sign-LSH bucket join (eval side is the
    // small benchmark set -> broadcast), exact cosine re-checked inside
    // the bucket only; the cosine is ROUND(..,6)'d before the
    // threshold compare so both engines make the identical keep/flag
    // call at the boundary.
    "q125_embedding_decontam" -> ((s, dir) => {
      val signBucket = concat((1 to 4).map(i =>
        when(element_at(col("embedding"), i) >= 0, "1").otherwise("0")): _*)
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("bucket", signBucket)
        .withColumn("split",
          when(md5(col("vec_id").cast("string")) < "e", "train").otherwise("eval"))
      val tr = e.filter(col("split") === "train")
        .select(col("vec_id"), col("label"), col("bucket"), col("embedding"))
      val ev = e.filter(col("split") === "eval")
        .select(col("bucket").as("ebucket"), col("embedding").as("ev"))
      val hits = tr.join(broadcast(ev), col("bucket") === col("ebucket"))
        .filter(round(Vectors.cosineSimilarity(col("embedding"), col("ev")), 6) >= 0.3)
        .select("vec_id", "label").distinct()
      tr.groupBy("label").agg(cnt.as("n_train"))
        .join(hits.groupBy("label").agg(cnt.as("n_flagged")), Seq("label"), "left")
        .withColumn("n_flagged", coalesce(col("n_flagged"), lit(0L)))
        .withColumn("flagged_ppm", expr("n_flagged * 1000000 DIV n_train"))
        .orderBy("label")
    }),

    // Boilerplate-prefix quality audit: documents sharing their first
    // five tokens are template families (mirror headers, scraped
    // boilerplate, form letters); bucket docs by family size and
    // report the q46 quality score per bucket — the one-pass answer to
    // "is templated content actually worse?", which decides whether a
    // prefix-dedup stage earns its place in the pipeline. Family size
    // via a window over the md5 prefix fingerprint (one shuffle on the
    // fingerprint key); scores reuse the integer-ppm scorer, averaged
    // through DECIMAL(18,6) like q46 so the mean is
    // partition-order-independent.
    "q126_boilerplate_quality" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val scored = TextAnalysis.qualityScores(docs, Seq("the", "a"), "source")
        .select("doc_id", "score")
      val fp = md5(array_join(slice(split(lower(col("text")), " "), 1, 5), " "))
      docs.select(col("doc_id"), col("n_chars"), fp.as("fp"))
        .withColumn("degree", cnt.over(Window.partitionBy("fp")))
        .join(scored, Seq("doc_id"))
        .withColumn("prefix_degree",
          when(col("degree") === 1, "1").when(col("degree") === 2, "2").otherwise("3+"))
        .groupBy("prefix_degree")
        .agg(cnt.as("n_docs"),
          round(avg(col("score").cast(DecimalType(18, 6))), 6).cast("double").as("avg_score"),
          round(avg(col("n_chars").cast(DecimalType(18, 6))), 6).cast("double").as("avg_chars"))
        .orderBy("prefix_degree")
    }),

    // Cluster-scoped semantic dedup (the SemDeDup recipe): train the
    // q85 coarse k-means, assign every vector, and WITHIN each cluster
    // drop any vector whose cosine to a lower-id cluster-mate reaches
    // the threshold (keep-first — deterministic, no greedy order
    // dependence). The cluster partition is what makes semantic dedup
    // tractable: the pair space is n²/k per cluster, and at 100 TB the
    // dial is k (the paper's recipe — grow k so clusters stay
    // bounded), not a smarter join. Norms computed once per vector
    // before the pair join (q43's rule); cosine ROUND(..,6)'d before
    // the threshold so both engines make the identical drop call at
    // the boundary; the trained assignment is checkpointed once and
    // reused on both sides of the self-join.
    "q135_semdedup" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val cents = AnnSearch.kmeansCentroids(
        e, dims = 64, k = 4, iters = 2, sampleBound = None).localCheckpoint()
      val asg = AnnSearch.assignBuckets(e, cents)
        .select(col("vec_id"), col("bucket").cast("long").as("clabel"),
          col("embedding"), Vectors.l2Norm(col("embedding")).as("nrm"))
        .localCheckpoint()
      val dropped = asg.as("a").join(asg.as("b"),
          col("a.clabel") === col("b.clabel") && col("a.vec_id") < col("b.vec_id"))
        .filter(round(Vectors.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 6) >= 0.3)
        .select(col("a.clabel").as("clabel"), col("b.vec_id").as("j"))
        .distinct()
      asg.groupBy("clabel").agg(cnt.as("n_vecs"))
        .join(dropped.groupBy("clabel").agg(cnt.as("n_dropped")), Seq("clabel"), "left")
        .withColumn("n_dropped", coalesce(col("n_dropped"), lit(0L)))
        .withColumn("n_kept", col("n_vecs") - col("n_dropped"))
        .select("clabel", "n_vecs", "n_dropped", "n_kept")
        .orderBy("clabel")
    }))

  /** q85's two-round k-means CTEs verbatim (seeds..b3) for q124 (and
    * q129's purity report, which grades the same trained quantizer). */
  private[queries] val kmeansCtes = """
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
b3 AS (SELECT vec_id, clabel FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn FROM a3) WHERE rn = 1)"""

  def oracle: Map[String, String] = Map(

    "q124_diversity_sample" -> (kmeansCtes + """,
sizes AS (SELECT clabel, COUNT(*) n_before FROM b3 GROUP BY clabel),
tgt AS (SELECT MIN(n_before) m FROM sizes),
bounds AS (SELECT clabel, n_before,
   lpad(lower(to_hex(CAST(
     CAST(tgt.m AS DECIMAL(38,0)) * 4294967296 // n_before - 1 AS BIGINT))), 8, '0') bound
  FROM sizes CROSS JOIN tgt),
j AS (SELECT b3.clabel, bounds.n_before,
        CASE WHEN substring(md5(CAST(b3.vec_id AS VARCHAR)), 1, 8) <= bounds.bound
             THEN 1 ELSE 0 END k
      FROM b3 JOIN bounds ON b3.clabel = bounds.clabel)
SELECT clabel, n_before, CAST(SUM(k) AS BIGINT) AS n_kept,
  CAST(SUM(k) * 1000000 // n_before AS BIGINT) AS kept_ppm
FROM j GROUP BY clabel, n_before ORDER BY clabel"""),

    "q125_embedding_decontam" -> """
WITH e AS (SELECT vec_id, label, embedding,
  CASE WHEN md5(CAST(vec_id AS VARCHAR)) < 'e' THEN 'train' ELSE 'eval' END AS split,
  concat(CASE WHEN embedding[1]>=0 THEN '1' ELSE '0' END, CASE WHEN embedding[2]>=0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[3]>=0 THEN '1' ELSE '0' END, CASE WHEN embedding[4]>=0 THEN '1' ELSE '0' END) bucket
  FROM embeddings),
tr AS (SELECT * FROM e WHERE split = 'train'),
ev AS (SELECT * FROM e WHERE split = 'eval'),
hits AS (SELECT DISTINCT tr.vec_id, tr.label
  FROM tr JOIN ev ON tr.bucket = ev.bucket
  WHERE ROUND(
    list_sum(list_transform(list_zip(tr.embedding, ev.embedding), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))
    /(SQRT(list_sum(list_transform(tr.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
     *SQRT(list_sum(list_transform(ev.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 6) >= 0.3),
base AS (SELECT label, COUNT(*) n_train FROM tr GROUP BY label),
fl AS (SELECT label, COUNT(*) n_flagged FROM hits GROUP BY label)
SELECT base.label, base.n_train,
  CAST(COALESCE(fl.n_flagged, 0) AS BIGINT) AS n_flagged,
  CAST(COALESCE(fl.n_flagged, 0) * 1000000 // base.n_train AS BIGINT) AS flagged_ppm
FROM base LEFT JOIN fl ON base.label = fl.label
ORDER BY base.label""",

    "q126_boilerplate_quality" -> """
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text),' ')) tok FROM documents),
t AS (SELECT * FROM toks WHERE tok <> ''),
per_doc AS (
  SELECT doc_id, COUNT(*) ntok, COUNT(DISTINCT tok) nuniq,
         SUM(CASE WHEN tok IN ('the','a') THEN 1 ELSE 0 END) nstop,
         SUM(length(tok)) sumlen
  FROM t GROUP BY doc_id),
scored AS (
  SELECT doc_id,
    (6 * ((nuniq * 1000000) // ntok)
   + 3 * (1000000 - ((nstop * 1000000) // ntok))
   + 1 * (least((sumlen * 100) // ntok, 800) * 1250)) // 10 AS score
  FROM per_doc),
deg AS (SELECT doc_id, n_chars,
        COUNT(*) OVER (PARTITION BY
          md5(array_to_string(list_slice(string_split(lower(text),' '),1,5),' '))) AS degree
        FROM documents),
b AS (SELECT CASE WHEN degree = 1 THEN '1' WHEN degree = 2 THEN '2' ELSE '3+' END AS prefix_degree,
             score, n_chars
      FROM deg JOIN scored USING (doc_id))
SELECT prefix_degree, COUNT(*) AS n_docs,
  CAST(ROUND(AVG(CAST(score AS DECIMAL(18,6))), 6) AS DOUBLE) AS avg_score,
  CAST(ROUND(AVG(CAST(n_chars AS DECIMAL(18,6))), 6) AS DOUBLE) AS avg_chars
FROM b GROUP BY prefix_degree ORDER BY prefix_degree""",

    // the same trained assignment (kmeansCtes' b3), then the in-cluster
    // keep-first pair drop with the identical ROUND(..,6) boundary
    "q135_semdedup" -> (kmeansCtes + """,
asg AS (SELECT b3.vec_id, b3.clabel, e.v FROM b3 JOIN e USING (vec_id)),
p AS (SELECT a.clabel, b.vec_id j,
        ROUND(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]))
          /(SQRT(list_sum(list_transform(a.v, x -> x*x)))
           *SQRT(list_sum(list_transform(b.v, x -> x*x)))), 6) cos
      FROM asg a JOIN asg b ON a.clabel = b.clabel AND a.vec_id < b.vec_id),
d AS (SELECT clabel, COUNT(DISTINCT j) n_dropped FROM p WHERE cos >= 0.3 GROUP BY clabel),
n AS (SELECT clabel, COUNT(*) n_vecs FROM asg GROUP BY clabel)
SELECT n.clabel, CAST(n.n_vecs AS BIGINT) AS n_vecs,
  CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
  CAST(n.n_vecs - COALESCE(d.n_dropped, 0) AS BIGINT) AS n_kept
FROM n LEFT JOIN d USING (clabel) ORDER BY n.clabel"""))
}
