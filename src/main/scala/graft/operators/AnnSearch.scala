package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Approximate-nearest-neighbor building blocks over embedding
  * columns. Three tiers, increasingly scalable:
  *   1. brute force (q38) — exact baseline, full scan per query;
  *   2. sign-bucket LSH (q44) — random-hyperplane buckets, no training;
  *   3. IVF (q56) — coarse centroids as an inverted file: vectors are
  *      assigned to their nearest centroid, queries search only their
  *      centroid's list (nprobe=1 here; union more buckets to raise
  *      recall).
  *
  * Determinism: centroids are exact decimal averages rounded to 6
  * digits (partitioning-independent), and every distance/similarity is
  * the same fixed-order left-to-right array fold on both engines — so
  * argmin assignments can't flip between runs or engines (the q38
  * parity precedent).
  */
object AnnSearch {

  /** Per-`labelCol` element-wise centroids as ordered double arrays:
    * (clabel, cent). `dims` = embedding width. */
  def centroids(emb: DataFrame, dims: Int, labelCol: String = "label"): DataFrame =
    emb
      .select(col(labelCol).as("clabel"), explode(sequence(lit(1), lit(dims))).as("pos"),
        col("embedding"))
      .groupBy("clabel", "pos")
      .agg(round(avg(element_at(col("embedding"), col("pos")).cast(DecimalType(18, 9))), 6)
        .cast("double").as("c"))
      .groupBy("clabel")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cent"))

  /** Squared L2 distance between a float embedding and a double
    * centroid array — fixed-order HOF fold (matches the oracle's
    * list_sum/list_transform exactly). */
  private def sqDist(v: Column, cent: Column): Column =
    aggregate(zip_with(v, cent, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Assign each vector to its nearest centroid (ties by centroid
    * label): adds a `bucket` column. The centroid table collapses to a
    * single broadcast row (an array of (clabel, cent) structs), and the
    * argmin is `array_min` over per-centroid (distance, label) structs
    * computed INSIDE the vector scan — zero shuffles, embarrassingly
    * parallel, where a window/row_number argmin would shuffle and sort
    * |vectors| x |centroids| rows. Struct ordering compares (d, label)
    * lexicographically with NaN ordered greatest — exactly the previous
    * ORDER BY (d2, clabel) semantics, including NaN distances — and
    * each distance is computed once per (vector, centroid) pair.
    *
    * An empty centroid table yields an empty result (as the join
    * formulation did). Reserved working column names (must not exist on
    * `emb`): `_cs`, `bucket` — the same convention Skew.saltedJoin
    * documents for `_salt`. */
  def assignBuckets(emb: DataFrame, cents: DataFrame): DataFrame = {
    val reserved = Seq("_cs", "bucket").filter(emb.columns.contains)
    require(reserved.isEmpty,
      s"assignBuckets reserves working columns ${reserved.mkString(", ")} — rename them on the input")
    val centArr = cents
      .agg(collect_list(struct(col("clabel"), col("cent"))).as("_cs"))
      .filter(size(col("_cs")) > 0)
    val best = array_min(transform(col("_cs"),
      c => struct(sqDist(col("embedding"), c.getField("cent")).as("d"),
        c.getField("clabel").as("l")))).getField("l")
    emb.crossJoin(broadcast(centArr))
      .withColumn("bucket", best)
      .drop("_cs")
  }
}
