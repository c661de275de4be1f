package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.{Text, Vectors}
import graft.sources.Tables

/** LLM-data-pipeline operators (SURVEY.md §2 q35-q40): dedup,
  * tokenization, text stats, vector similarity/centroids. These are
  * the north-star additions — each is the small-scale, oracle-checked
  * form of a pattern that must hold at 100 TB (noted per query).
  */
object Pipeline {

  def queries: Map[String, Queries.QueryFn] = Map(

    // Exact dedup: hash the content, group by hash. One shuffle on the
    // 128-bit key; at 100 TB this is the canonical first dedup pass
    // (the hash is 16 bytes regardless of document size).
    "q35_dedup_exact" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .groupBy(Text.contentHash(col("text")).as("th"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_unique"),
             sum(col("n")).as("n_total"),
             (sum(col("n")) - count(lit(1))).as("n_dupes_removed"))
    }),

    // Tokenize + explode + top-k terms: generator (explode) then
    // partial+final count — the wordcount shape; top-20 via
    // TakeOrderedAndProject.
    "q36_text_tokenize" -> ((s, dir) => {
      Text.tokenize(Tables.load(s, dir, "documents"))
        .groupBy("tok")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(20)
    }),

    // Per-language doc stats with an exact median. Exact percentile
    // aggregates per group; at real scale swap to approx_percentile
    // (excluded from the oracle contract — engine-specific sketch).
    "q37_text_stats" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_chars").cast(DecimalType(18, 2))), 6).cast("double").as("avg_chars"),
          round(percentile(col("n_chars"), lit(0.5)).cast(DecimalType(18, 6)), 6)
            .cast("double").as("median_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang")
    }),

    // Brute-force cosine top-10 against one query vector: the exact
    // baseline for ANN. The 1-row query side broadcasts; similarity is
    // pure higher-order-function math (no UDF). Scale path: LSH/IVF
    // bucketing in graft.operators (see AnnSearch).
    "q38_knn_cosine" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("v"))
      e.crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"),
          round(Vectors.cosineSimilarity(col("embedding"), col("v")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    }),

    // Per-label element-wise centroid: posexplode-style fan-out of the
    // first 8 dims, then one hash aggregate per (label, pos). Scales
    // as rows×dims with no driver-side state.
    "q39_vector_centroid" -> ((s, dir) => {
      Tables.load(s, dir, "embeddings")
        .select(col("label"), col("embedding"),
                explode(sequence(lit(1), lit(8))).as("pos"))
        .groupBy("label", "pos")
        .agg(round(avg(element_at(col("embedding"), col("pos")).cast(DecimalType(18, 9))), 6)
          .cast("double").as("centroid"))
        .orderBy("label", "pos")
    }),

    // Near-dup candidate groups via a 3-component minhash signature
    // (graft.functions.Text.minhashComponent): tokenize → signature →
    // group by signature. This replaces the O(n^2) pair join with a
    // shuffle on the signature — the LSH banding pattern at 100 TB.
    "q40_dedup_near" -> ((s, dir) => {
      Text.tokenize(Tables.load(s, dir, "documents"))
        .groupBy("doc_id")
        .agg(Text.minhashComponent(col("tok"), "").as("h1"),
             Text.minhashComponent(col("tok"), "a").as("h2"),
             Text.minhashComponent(col("tok"), "b").as("h3"))
        .groupBy("h1", "h2", "h3")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("rep"))
        .agg(count(lit(1)).as("n_groups"),
             sum(col("n")).as("n_docs"),
             sum(when(col("n") > 1, col("n") - 1).otherwise(0)).as("n_near_dupes"))
    })
  )
}
