package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}
import graft.sources.Tables

/** Corpus-curation wave (q66-q69): the reproducibility-critical steps
  * of a training-data pipeline — deterministic splits, train/eval
  * contamination checks, mixture weights, stratified samples. All
  * randomness is content-addressed md5 (see [[graft.operators.Sampling]]),
  * so every query is exactly reproducible on any engine and
  * oracle-checkable like the rest of the contract.
  *
  * Same t2 gate as every other wave: DuckDB oracles in [[oracle]],
  * prototyped and validated on DuckDB 1.0.0 at sf0.01 before the
  * natives were written; determinism per SURVEY.md §5 (integer ppm
  * arithmetic, BIGINT casts around DuckDB HUGEINT sums, total-order
  * ORDER BY keys).
  */
object Curation {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Deterministic train/val/test assignment by md5-hex threshold:
    // ~75% / ~12.5% / ~12.5%. Pure per-row projection — membership is
    // stable across runs, engines, and cluster sizes, which is what
    // makes a split auditable. Report is docs + char mass per
    // (split, lang) cell.
    "q66_hash_split" -> ((s, dir) => {
      Sampling.deterministicSplit(Tables.load(s, dir, "documents"),
          "doc_id", Seq("train" -> "c", "val" -> "e"), "test")
        .groupBy("split", "lang")
        .agg(cnt.as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .orderBy("split", "lang")
    }),

    // Train/eval contamination: source 'src0' plays the eval set; a
    // training doc is contaminated if it shares any 5-gram shingle
    // with it. The eval shingle set stays small => broadcast semi
    // join; training corpus streams through one shingle pass
    // (Dedup.contaminatedDocs).
    "q67_contamination" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val train = d.filter(col("source") =!= "src0")
      val cont = Dedup.contaminatedDocs(train, d.filter(col("source") === "src0"), n = 5)
        .withColumn("hit", lit(1))
      train.join(broadcast(cont), Seq("doc_id"), "left")
        .groupBy("source")
        .agg(cnt.as("n_train_docs"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_contaminated"))
        .orderBy("source")
    }),

    // Mixture weights: each source's share of total token mass as an
    // integer ppm (exact integer division — no fp nondeterminism).
    // Two hash aggs; the grand total is a 1-row broadcast. The ppm
    // numerator is widened to DECIMAL(38,0): toks * 1e6 overflows
    // int64 past ~9.2e12 total tokens — inside full-corpus scale —
    // and ANSI Spark would throw where DuckDB silently promotes to
    // HUGEINT. DIV brings it back to a plain BIGINT ppm (< 1e6).
    "q68_mixing_weights" -> ((s, dir) => {
      val t = Tables.load(s, dir, "documents")
        .select(col("source"),
          size(filter(graft.functions.Text.tokens(col("text")), x => x =!= "")).as("ntok"))
        .groupBy("source").agg(cnt.as("n_docs"), sum(col("ntok")).as("toks"))
      t.crossJoin(broadcast(t.agg(sum(col("toks")).as("tt"))))
        .select(col("source"), col("n_docs"), col("toks"),
          expr("CAST(toks AS DECIMAL(38,0)) * 1000000 DIV tt").as("weight_ppm"))
        .orderBy("source")
    }),

    // Deterministic stratified sample: 5 docs per language, ranked by
    // md5(doc_id) — a fair sample that is still exactly reproducible
    // (Sampling.stratifiedTake). One shuffle on lang.
    "q69_stratified_sample" -> ((s, dir) => {
      Sampling.stratifiedTake(Tables.load(s, dir, "documents"), "lang", 5, "doc_id")
        .select(col("lang"), col("doc_id"), col("rn"))
        .orderBy("lang", "rn")
    }),

    // Token-budget epoch planner: q68 reports the mix a corpus HAS;
    // this computes the mix a training run NEEDS — given target
    // weights (ppm) and a 1B-token budget, each source's target token
    // draw and the repeat factor (epochs, ppm — >1e6 means the source
    // must be upsampled / multi-epoched to hit its share, the
    // data-constrained regime every over-weighted small source lands
    // in). One groupBy over the corpus + a broadcast 5-row plan; all
    // integer/decimal arithmetic (the q68 HUGEINT discipline).
    "q110_epoch_mix" -> ((s, dir) => {
      import s.implicits._
      val plan = Seq(("src0", 300000L), ("src1", 250000L), ("src2", 200000L),
        ("src3", 150000L), ("src4", 100000L)).toDF("source", "w_ppm")
      val t = Tables.load(s, dir, "documents")
        .select(col("source"),
          size(filter(graft.functions.Text.tokens(col("text")), x => x =!= "")).as("ntok"))
        .groupBy("source").agg(sum(col("ntok")).as("toks"))
      t.join(broadcast(plan), "source")
        .select(col("source"), col("toks"),
          expr("1000000000L * w_ppm DIV 1000000").as("target_toks"),
          expr("CAST(1000000000L * w_ppm DIV 1000000 AS DECIMAL(38,0)) * 1000000 DIV toks")
            .as("epochs_ppm"))
        .orderBy("source")
    })
  )

  /** DuckDB oracles (validated at sf0.01/sf0.1 before the natives). */
  val oracle: Map[String, String] = Map(
    "q66_hash_split" -> """
WITH s AS (
  SELECT doc_id, lang, n_chars,
    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'c' THEN 'train'
         WHEN md5(CAST(doc_id AS VARCHAR)) < 'e' THEN 'val'
         ELSE 'test' END AS split
  FROM documents)
SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM s GROUP BY split, lang ORDER BY split, lang""",

    "q67_contamination" -> """
WITH d AS (SELECT doc_id, source, string_split(lower(text),' ') l FROM documents),
s AS (SELECT doc_id, source, unnest(generate_series(1, len(l)-4)) i, l FROM d WHERE len(l) >= 5),
sh AS (SELECT DISTINCT doc_id, source, l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4] sh FROM s),
ev AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0'),
cont AS (SELECT DISTINCT sh.doc_id FROM sh WHERE source <> 'src0' AND sh IN (SELECT sh FROM ev))
SELECT d.source, COUNT(*) AS n_train_docs,
  CAST(SUM(CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
FROM d LEFT JOIN cont ON d.doc_id = cont.doc_id
WHERE d.source <> 'src0'
GROUP BY d.source ORDER BY d.source""",

    "q68_mixing_weights" -> """
WITH t AS (SELECT source,
             CAST(SUM(len(list_filter(string_split(lower(text),' '), x -> x <> ''))) AS BIGINT) AS toks,
             COUNT(*) AS n_docs
           FROM documents GROUP BY source)
SELECT source, n_docs, toks,
  CAST(CAST(toks AS HUGEINT) * 1000000 // (SELECT SUM(toks) FROM t) AS BIGINT) AS weight_ppm
FROM t ORDER BY source""",

    "q69_stratified_sample" -> """
WITH r AS (SELECT doc_id, lang,
  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) rn
  FROM documents)
SELECT lang, doc_id, rn FROM r WHERE rn <= 5 ORDER BY lang, rn""",

    // q68's token-count CTE + a VALUES plan; HUGEINT products cast
    // back to BIGINT (the q102/q103 discipline)
    "q110_epoch_mix" -> """
WITH t AS (SELECT source,
             CAST(SUM(len(list_filter(string_split(lower(text),' '), x -> x <> ''))) AS BIGINT) AS toks
           FROM documents GROUP BY source),
w AS (SELECT * FROM (VALUES ('src0',300000),('src1',250000),('src2',200000),
                            ('src3',150000),('src4',100000)) AS w(source, w_ppm))
SELECT t.source, toks,
  CAST(CAST(1000000000 AS BIGINT) * w_ppm // 1000000 AS BIGINT) AS target_toks,
  CAST(CAST(CAST(1000000000 AS BIGINT) * w_ppm // 1000000 AS HUGEINT) * 1000000 // toks AS BIGINT) AS epochs_ppm
FROM t JOIN w USING (source) ORDER BY source"""
  ).map { case (k, v) => k -> v.trim }
}
