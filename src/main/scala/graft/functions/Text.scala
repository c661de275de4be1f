package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for document tables (SURVEY.md §2
  * q35-q40 and the LLM-data-pipeline additions).
  *
  * Hashing is always `md5` — engine-native `hash()` differs between
  * engines and even between Spark versions, so content-addressed
  * operations (dedup keys, minhash signatures) would not be portable
  * or oracle-checkable with it.
  */
object Text {

  /** Lowercased whitespace tokens of a text column (keeps empty tokens;
    * filter with `tok =!= ""` downstream). */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Content hash for exact dedup. */
  def contentHash(text: Column): Column = md5(text)

  /** One minhash component: min over the group of `md5(prefix || token)`.
    * Aggregate function — use inside `groupBy(docId).agg(...)`.
    * Different `prefix` values act as independent hash functions; a
    * k-component signature is k of these. This is the LSH building
    * block: docs sharing a signature band land in the same group-by
    * bucket, replacing the O(n^2) pair join with a shuffle on the
    * signature — the pattern that survives 100 TB.
    */
  def minhashComponent(tok: Column, prefix: String): Column =
    min(md5(if (prefix.isEmpty) tok else concat(lit(prefix), tok)))

  /** Scrub a text column: drop every token in `stopwords` (and empty
    * tokens), re-join on single spaces. A pure projection — the
    * redaction pattern (stopword strip, PII-token drop, boilerplate
    * removal) costs one codegen'd map pass at any scale, no shuffle.
    */
  def scrub(text: Column, stopwords: Seq[String]): Column =
    array_join(
      filter(tokens(text), t => t =!= "" && !t.isInCollection(stopwords)), " ")

  /** Explode a documents table into (doc_id, tok) pairs, empty tokens
    * dropped. */
  def tokenize(docs: DataFrame, docId: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(col(docId), explode(tokens(col(text))).as("tok"))
      .filter(col("tok") =!= "")
}
