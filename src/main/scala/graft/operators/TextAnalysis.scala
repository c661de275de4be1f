package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language
  * identification, quality scoring, token counting.
  *
  * Scores are computed in INTEGER arithmetic (parts-per-million via
  * integer DIV) rather than floating point: fp sums are
  * order-dependent across partitionings/engines, so a float-scored
  * classifier could flip predictions between runs — ppm integers make
  * every score exactly reproducible anywhere (SURVEY.md §5).
  */
object TextAnalysis {

  /** (doc_id, [extraCols...], tok) occurrences, empty tokens dropped.
    * Tokenization is defined ONCE in [[graft.functions.Text.tokens]] —
    * all operators must agree on what a token is. */
  def tokenOccurrences(docs: DataFrame, extraCols: String*): DataFrame = {
    val keep = (Seq("doc_id") ++ extraCols).map(col)
    docs.select(keep :+ explode(graft.functions.Text.tokens(col("text"))).as("tok"): _*)
      .filter(col("tok") =!= "")
  }

  /** Per-document token profile: `(doc_id, [extraCols...], nw, sumlen,
    * nstop, maxtf)` — total words, summed word length, stopword hits,
    * and the modal token's count. The inputs every repetition /
    * length / symbol-ratio quality rule (the Gopher-style filters)
    * reads, computed in ONE tokenize + two stacked hash aggregates —
    * integer-only, so every downstream rule is exactly reproducible.
    */
  def docTokenProfile(docs: DataFrame, stopwords: Seq[String],
                      extraCols: String*): DataFrame = {
    val keys = (Seq("doc_id") ++ extraCols).map(col)
    tokenOccurrences(docs, extraCols: _*)
      .groupBy(keys :+ col("tok"): _*).agg(count(lit(1)).as("c"))
      .groupBy(keys: _*)
      .agg(sum(col("c")).as("nw"),
        sum(col("c") * length(col("tok"))).as("sumlen"),
        sum(when(col("tok").isInCollection(stopwords), col("c")).otherwise(0L)).as("nstop"),
        max(col("c")).as("maxtf"))
  }

  /** Unigram-frequency language ID, self-trained: build per-language
    * token profiles (counts normalized to ppm of the language's token
    * mass by integer division), score every doc against every
    * language, predict the argmax (ties broken by language name).
    *
    * Returns (doc_id, lang, pred_lang). The profile is tiny
    * (languages x vocabulary) and broadcast; scoring is one shuffle on
    * (doc, language). At 100 TB the profile would be trained on a
    * sample and the scoring pass stays identical.
    */
  def langIdPredictions(docs: DataFrame): DataFrame = {
    // The tokenize pass is recomputed for profile/totals/scoring
    // rather than checkpointed: measured at sf0.1, an eager
    // localCheckpoint of the shared aggregate costs MORE than the two
    // extra codegen'd tokenize scans it saves (3.7s vs 3.0s) — it
    // breaks whole-stage pipelines and serializes the broadcast
    // builds behind a materialization job.
    val t = tokenOccurrences(docs, "lang")
    val profile = t.groupBy(col("lang").as("pl"), col("tok").as("ptok"))
      .agg(count(lit(1)).as("c"))
    val tot = t.groupBy(col("lang").as("plang")).agg(count(lit(1)).as("tc"))
    // Pre-aggregate per-doc token multiplicities BEFORE fanning out
    // across languages: scoring weights each distinct token by its
    // occurrence count (occ * ppm == summing ppm per occurrence,
    // exactly, in integers), so the language fan-out shuffles distinct
    // doc-tokens (~vocab-bounded) instead of every occurrence.
    val docToks = t.groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("occ"))
    val scored = docToks
      .crossJoin(broadcast(tot))
      .join(broadcast(profile), col("pl") === col("plang") && col("ptok") === col("tok"), "left")
      .groupBy("doc_id", "lang", "plang")
      .agg(sum(expr("occ * ((coalesce(c, 0) * 1000000) DIV tc)")).as("score"))
    // argmax(score, ties -> smallest language) as min(struct(-score,
    // lang)): a partial+final hash aggregate — no window shuffle+sort.
    // Scores are exact integers, so negation is lossless.
    scored.groupBy("doc_id", "lang")
      .agg(min(struct(negate(col("score")).as("ns"), col("plang"))).as("b"))
      .select(col("doc_id"), col("lang"), col("b.plang").as("pred_lang"))
  }

  /** Per-doc integer quality score in [0, 1e6]: weighted blend of
    * lexical diversity (distinct/total tokens), stopword sparsity, and
    * a capped mean-token-length term. One groupBy(doc_id) pass.
    * Output: per-doc grouping cols + ntok + score.
    */
  def qualityScores(docs: DataFrame, stopwords: Seq[String], groupCol: String): DataFrame = {
    val t = tokenOccurrences(docs, groupCol)
    t.groupBy("doc_id", groupCol)
      .agg(count(lit(1)).as("ntok"),
        countDistinct(col("tok")).as("nuniq"),
        sum(when(col("tok").isin(stopwords: _*), 1).otherwise(0)).as("nstop"),
        sum(length(col("tok"))).as("sumlen"))
      .withColumn("score", expr(
        """(6 * ((nuniq * 1000000) DIV ntok)
           | + 3 * (1000000 - ((nstop * 1000000) DIV ntok))
           | + 1 * (least((sumlen * 100) DIV ntok, 800) * 1250)) DIV 10""".stripMargin))
  }

  /** Gopher-style repetition signals per document:
    *   - `dup_word_frac`: 1 - distinct/total tokens — computed entirely
    *     INSIDE the scan (size/array_distinct on the token array, no
    *     explode, no shuffle);
    *   - `top_bigram_frac`: share of the most frequent 2-gram —
    *     bigrams explode once, then two hash aggregations on doc_id
    *     (counts, then max/total), all map-side-combining.
    * Both ratios are doubles over per-doc exact integers, so they are
    * partitioning-independent. High values flag boilerplate/spam for
    * corpus filtering. Output: (doc_id, n_tokens, dup_word_frac,
    * top_bigram_frac); docs with < 2 tokens are dropped (no bigram is
    * defined, mirroring the shingle rule in Dedup.shingles).
    */
  def repetitionSignals(docs: DataFrame, docId: String = "doc_id",
                        text: String = "text"): DataFrame = {
    val toks = docs.select(col(docId).as("doc_id"),
      graft.functions.Text.tokens(col(text)).as("l")).filter(size(col("l")) >= 2)
    val perDoc = toks.select(col("doc_id"), size(col("l")).as("n_tokens"),
      size(array_distinct(col("l"))).as("nd"))
    val bigrams = toks.select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(l) - 1), i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))")).as("bg"))
    val top = bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("maxc"), sum(col("c")).as("tot"))
    perDoc.join(top, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        round(lit(1) - col("nd").cast("double") / col("n_tokens"), 6).as("dup_word_frac"),
        round(col("maxc").cast("double") / col("tot"), 6).as("top_bigram_frac"))
  }

  /** The `cap` highest-document-frequency terms of a DISTINCT
    * (doc_id, tok) relation, as (tok, c) — the deterministic cut
    * (df DESC, tok ASC) collocation mining restricts itself to.
    * Checkpointed: callers read it at least twice (membership filter +
    * marginals) and it is top-k tiny by construction. */
  def topVocabulary(docTokens: DataFrame, cap: Int): DataFrame = {
    require(cap > 0, s"vocabulary cap must be positive, got $cap")
    docTokens.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("tok")).limit(cap)
      .localCheckpoint()
  }

  /** Document-level co-occurrence pair counts (ta, tb, cab), ta < tb,
    * restricted to `vocab` (a (tok, c) table, normally
    * [[topVocabulary]]). The vocabulary restriction happens BEFORE the
    * doc_id self-join, which is what bounds per-doc pair fan-out at
    * vocab²/2 regardless of document length — without it one
    * 100k-distinct-token document emits 5e9 join rows in one task.
    * The broadcast semi join costs one pass; ScaleSpec proves the
    * bound with a corpus whose uncapped pairing would be 25x larger.
    */
  def cooccurrencePairs(docTokens: DataFrame, vocab: DataFrame): DataFrame = {
    val dv = docTokens.join(broadcast(vocab.select("tok")), Seq("tok"), "left_semi")
    dv.select(col("doc_id"), col("tok").as("ta"))
      .join(dv.select(col("doc_id"), col("tok").as("tb")), Seq("doc_id"))
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("cab"))
  }
}
