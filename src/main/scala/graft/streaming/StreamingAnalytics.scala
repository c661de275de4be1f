package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming twins of the streaming-shaped batch queries
  * (SURVEY.md §2 q32-q34). Each transform is source-agnostic: apply it
  * to `spark.readStream...` for incremental execution (micro-batch,
  * state-store-backed, watermark-governed late-data drops) or to a
  * batch DataFrame for the oracle-checkable one-shot answer — the
  * aggregation semantics are identical by construction, which is
  * exactly what the batch q32-q34 pin down.
  *
  * Scale: all three group by (time bucket, key), so state is
  * partitioned by key across executors; the 1-hour/30-min watermarks
  * bound state size to the window horizon per key.
  */
object StreamingAnalytics {

  /** Tumbling 1h counts per event_type — twin of q32. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(18, 2))).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Sliding 1h windows every 15min — twin of q33 (each event lands in
    * 4 windows; the built-in `window(slide)` does the q33 explode). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_seconds(col("win.start")).as("win_start_s"),
              col("event_type"), col("n"))

  /** Streaming exact dedup: drop events whose `idCols` were already
    * seen within the watermark horizon — the streaming twin of q35's
    * content-hash dedup (hash the payload upstream into an id column
    * for content dedup). `dropDuplicatesWithinWatermark` keys state on
    * the ids alone, so a redelivery RESTAMPED with a different event
    * time is still dropped; state is evicted as the watermark advances.
    */
  def dedupStream(events: DataFrame, watermarkCol: String, horizon: String,
                  idCols: Seq[String]): DataFrame =
    events
      .withWatermark(watermarkCol, horizon)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming NEAR-dup filter: drop documents whose full MinHash
    * signature ([[graft.operators.Dedup.signatureKey]] — in-row, pure
    * projection, value-identical to the batch LSH pipeline's
    * signature) was already seen within the watermark horizon. This is
    * ingest-time dedup: signature-identical mirrors, redeliveries and
    * boilerplate copies never enter the lake, shrinking what the batch
    * near-dup passes (q40/q50) must pair up later. Texts shorter than
    * the shingle width are exact-deduped via their content-hash
    * fallback key. State = one (sig → seen) entry per surviving doc
    * within the horizon, hash-partitioned on the signature and evicted
    * by the watermark — bounded by unique-doc rate x horizon, not
    * corpus size.
    */
  def nearDupStream(docs: DataFrame, watermarkCol: String, horizon: String,
                    textCol: String = "text", k: Int = 8, n: Int = 3): DataFrame = {
    require(!docs.columns.contains("_sig"),
      "reserved working column _sig — rename it on the input")
    docs
      .withColumn("_sig", graft.operators.Dedup.signatureKey(col(textCol), k, n))
      .withWatermark(watermarkCol, horizon)
      .dropDuplicatesWithinWatermark(Seq("_sig"))
      .drop("_sig")
  }

  /** Stream-static enrichment: join a stream against a (small) static
    * dimension — the broadcast is re-usable every micro-batch, no
    * state store involved. The standard lookup-enrichment shape; for
    * dims too big to broadcast the same call plans a shuffled join
    * per micro-batch.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
             joinType: String = "left"): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), keys, joinType)

  /** 30-min-gap sessions per user — twin of q34's sessionize; the
    * state store merges/extends sessions as events arrive. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sess"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sess.start").as("session_start"), col("n_events"))

  /** Stream-stream interval join — the streaming twin of the q09 range
    * join: each left event pairs with the right-side events of the same
    * key whose timestamp falls in (left.ts, left.ts + `horizon`].
    *
    * Both sides MUST be watermarked and the join condition MUST bound
    * right.ts relative to left.ts from both directions — that is what
    * lets Spark evict state: a buffered left row can be dropped once
    * the right watermark passes left.ts + horizon, and vice versa, so
    * state is bounded by rate x horizon per key instead of growing
    * forever. State is hash-partitioned on `key` across executors, the
    * same shuffle key the batch q09 uses.
    *
    * Column contract: both inputs need (`key`, `ts`); right-side
    * payload columns survive with a `r_` prefix.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   horizon: String = "5 minutes",
                   watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark).as("l")
    val r = right
      .select(col(key).as(s"r_$key") +:
        right.columns.filterNot(_ == key).map(c => col(c).as(s"r_$c")): _*)
      .withWatermark("r_ts", watermark).as("r")
    l.join(r,
      col(s"l.$key") === col(s"r.r_$key") &&
        col("r.r_ts") > col("l.ts") &&
        col("r.r_ts") <= col("l.ts") + expr(s"INTERVAL $horizon"))
  }
}
