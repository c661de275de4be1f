package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: the concat-and-split
  * scheme (lay documents head-to-tail, cut the token stream every
  * `capacity` tokens) that GPT-style pipelines use to fill context
  * windows with zero padding — the assignment step that q86's
  * chunking and q87's padding-waste accounting both stop short of.
  */
object Packing {

  /** Assign each document its packed context-window span. Every group
    * (shard) packs independently: docs are laid head-to-tail in
    * `orderCol` order and the concatenated token stream is cut every
    * `capacity` tokens. Adds to each input row:
    *   - `start`      — the doc's 0-based token offset in its group's
    *     stream;
    *   - `bin_first` / `bin_last` — the first/last context window the
    *     doc lands in (`start DIV capacity` etc.);
    *   - `n_boundary` — how many window boundaries cut this doc
    *     (0 = packed whole; the attention-masking / doc-split cost a
    *     trainer pays for the zero padding).
    *
    * Scale: ONE window cumsum PARTITIONED by `groupCol` — no global
    * sort, groups pack in parallel, so parallelism = #shards. That
    * partitioned window is the honest scale contract: pack within
    * shards (as real pipelines do), never across the whole corpus in
    * one ordered stream.
    *
    * Determinism: `orderCol` must totally order each group (unique per
    * group, e.g. doc_id) or the cumsum is partition-order-dependent.
    * A non-positive or null `lenCol` fails loudly per the repo's
    * loud-misassignment convention — a zero-length doc would silently
    * alias its successor's offsets.
    */
  def concatPack(docs: DataFrame, groupCol: String, orderCol: String,
                 lenCol: String, capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val reserved = Seq("start", "bin_first", "bin_last", "n_boundary", "_end")
      .filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"reserved output columns ${reserved.mkString(", ")} — rename them on the input")
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val len = when(col(lenCol).isNotNull && col(lenCol) > 0,
      col(lenCol).cast("long")).otherwise(raise_error(concat(
      lit(s"Packing.concatPack: $lenCol of "), col(orderCol).cast("string"),
      lit(" is "), coalesce(col(lenCol).cast("string"), lit("null")),
      lit(" — filter empty docs upstream"))))
    // the check rides `_end` (evaluated for EVERY row), not just the
    // window sum (which never evaluates a group's last row's length);
    // integer DIV throughout — a double division would lose exactness
    // past 2^53 stream offsets, reachable in a large shard
    docs.withColumn("start", coalesce(sum(len).over(w), lit(0L)))
      .withColumn("_end", col("start") + len - 1)
      .withColumn("bin_first", expr(s"start DIV ${capacity}L"))
      .withColumn("bin_last", expr(s"_end DIV ${capacity}L"))
      .withColumn("n_boundary", col("bin_last") - col("bin_first"))
      .drop("_end")
  }
}
