package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Sampling
import graft.sources.Tables

/** Composite wave (q99–q100): cyclic load profiling and the CAPSTONE —
  * the full curation pipeline (exact dedup → mixing-plan downsample →
  * train/val/test split → audit report) as ONE declarative plan, every
  * stage the library's own operator, the whole thing replayed exactly
  * by the DuckDB oracle because every stage is md5-content-addressed.
  *
  * Same t2 gate as every other wave; determinism per SURVEY.md §5.
  */
object Composite {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Day-of-week x hour-of-day activity matrix — the cyclic
    // seasonality profile capacity planning reads. PURE integer epoch
    // arithmetic ((d+4)%7 — 1970-01-01 was a Thursday; hour from the
    // in-day micros remainder): no timezone/calendar functions, so
    // both engines agree bit-for-bit in UTC. One scan, one groupBy
    // with map-side partials; exact-decimal value mass.
    "q99_seasonality" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .select(expr("(unix_micros(ts) DIV 86400000000 + 4) % 7").as("dow"),
          expr("(unix_micros(ts) % 86400000000) DIV 3600000000").as("hour"),
          col("user_id"), col("value"))
        .groupBy("dow", "hour")
        .agg(cnt.as("n"), countDistinct(col("user_id")).as("users"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .orderBy("dow", "hour")
    }),

    // The curation pipeline end-to-end: (1) exact dedup keeping each
    // content hash's min doc_id; (2) Sampling.rateSample applies the
    // q92 mixing plan; (3) Sampling.deterministicSplit assigns
    // train/val/test — on a PREFIXED id ("s:" + doc_id): the rate
    // filter kept the LOW end of md5(doc_id), so splitting on the same
    // hash would put every survivor in 'train'; the prefix decorrelates
    // the two decisions while keeping both content-addressed; (4) the
    // per-(split, source) audit report. Stages 1–3 are a semi join +
    // two pure filters/projections — the report's groupBy is the only
    // aggregation shuffle after the dedup.
    "q100_curation_pipeline" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val rep = docs.groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
      val uniq = docs.join(rep.select("doc_id"), Seq("doc_id"), "left_semi")
      val mixed = Sampling.rateSample(uniq, "doc_id", "source",
        Corpus.demoMixingPlan, defaultBound = Corpus.demoMixingDefault)
      Sampling.deterministicSplit(
          mixed.withColumn("sid", concat(lit("s:"), col("doc_id"))),
          "sid", Seq("train" -> "c", "val" -> "e"), default = "test")
        .groupBy("split", "source")
        .agg(cnt.as("n_docs"),
          sum(size(filter(split(lower(col("text")), " "), t => t =!= ""))).as("toks"))
        .orderBy("split", "source")
    })
  )

  /** DuckDB oracles (validated at sf0.01/sf0.1 before the natives). */
  val oracle: Map[String, String] = Map(
    "q99_seasonality" -> """
SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
       (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
       COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY dow, hour ORDER BY dow, hour""",

    "q100_curation_pipeline" -> """
WITH rep AS (SELECT MIN(doc_id) doc_id FROM documents GROUP BY md5(text)),
u AS (SELECT d.* FROM documents d SEMI JOIN rep ON rep.doc_id = d.doc_id),
k AS (SELECT * FROM u WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <= CASE source
  WHEN 'src0' THEN 'ffffffff' WHEN 'src1' THEN 'bfffffff'
  WHEN 'src2' THEN '7fffffff' WHEN 'src3' THEN '3fffffff'
  WHEN 'src4' THEN '19999999' ELSE '7fffffff' END),
s AS (SELECT *, CASE WHEN md5('s:' || CAST(doc_id AS VARCHAR)) < 'c' THEN 'train'
                     WHEN md5('s:' || CAST(doc_id AS VARCHAR)) < 'e' THEN 'val'
                     ELSE 'test' END split FROM k)
SELECT split, source, COUNT(*) AS n_docs,
  CAST(SUM(len(list_filter(string_split(lower(text),' '), x -> x <> ''))) AS BIGINT) AS toks
FROM s GROUP BY split, source ORDER BY split, source"""
  ).map { case (k, v) => k -> v.trim }
}
