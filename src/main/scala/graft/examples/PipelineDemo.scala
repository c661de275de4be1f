package graft.examples

import org.apache.spark.sql.functions._
import graft.Graft
import graft.operators.{Dedup, TextAnalysis}

/** End-to-end training-data curation pipeline composed from the
  * operator library — the workload the engine is built for:
  *
  *   ingest -> language ID -> quality filter -> near-dup removal
  *          -> token accounting
  *
  * Run: `sbt "runMain graft.examples.PipelineDemo [sfDir]"`.
  * Every stage is a DataFrame transform; at cluster scale the same
  * code runs over a partitioned lake instead of one parquet file.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dataDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val engine = Graft.local(dataDir)
    val docs = engine.table("documents")
    println(s"[pipeline] ingested:       ${docs.count()} docs")

    // localCheckpoint after each stage: the five stage-count actions
    // would otherwise recompute every upstream stage per count
    // 1. language ID: keep docs whose predicted language matches the
    //    declared one (drops mislabeled/ambiguous docs)
    val langOk = TextAnalysis.langIdPredictions(docs)
      .filter(col("pred_lang") === col("lang"))
      .select("doc_id")
    val docsLang = docs.join(langOk, "doc_id").localCheckpoint()
    println(s"[pipeline] language-clean: ${docsLang.count()} docs")

    // 2. quality filter: integer-ppm score floor
    val quality = TextAnalysis.qualityScores(docsLang, Seq("the", "a"), "source")
      .filter(col("score") >= 500000)
      .select("doc_id")
    val docsQual = docsLang.join(quality, "doc_id").localCheckpoint()
    println(s"[pipeline] quality-pass:   ${docsQual.count()} docs")

    // 3. near-dup removal (MinHash + LSH + exact-Jaccard verify ->
    //    duplicate clusters -> one representative per cluster)
    val deduped = Dedup.dedupCorpus(docsQual, threshold = 0.7).localCheckpoint()
    println(s"[pipeline] deduplicated:   ${deduped.count()} docs")

    // 4. token accounting for the surviving corpus
    val tokens = deduped
      .select(explode(graft.functions.Text.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    println(s"[pipeline] corpus tokens:  ${tokens.count()}")

    // 5. what would INGEST-time dedup have caught? The signature census
    //    over the raw corpus — the same in-row key nearDupStream drops
    //    on at the door (q113's shape)
    val sigDupes = docs.select(Dedup.signatureKey(col("text")).as("sig"))
      .groupBy("sig").count().filter(col("count") > 1).count()
    println(s"[pipeline] sig-dup groups: $sigDupes (ingest filter would drop these)")

    // 6. one-scan column stats of the survivors (approx-HLL ndv — the
    //    ANALYZE numbers a planner broadcasts-vs-shuffles on)
    graft.sources.Tables.analyze(deduped, Seq("source", "lang"))
      .collect().foreach(r => println(
        s"[pipeline] stats ${r.getString(0)}: ndv=${r.getLong(3)} " +
          s"min=${r.getString(4)} max=${r.getString(5)}"))

    // 7. retrieval spot-check: BM25 top-3 for a 3-term query, no
    //    external index (q109's ranking over the same corpus)
    graft.SparkEntry.queries("q109_bm25")(engine.spark, dataDir)
      .limit(3).collect().foreach(r => println(
        s"[pipeline] bm25 doc=${r.getLong(0)} score=${r.getDouble(1)}"))

    engine.close()
  }
}
