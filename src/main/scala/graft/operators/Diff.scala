package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot diff: the data-versioning primitive a corpus
  * pipeline runs between two crawls/dumps — which keyed rows were
  * added, removed, changed, or carried unchanged. Content equality is
  * by md5 over the selected columns, so "changed" never depends on
  * column-by-column null semantics at the join, and the wide content
  * columns themselves never travel through the shuffle — only 16-byte
  * hashes do.
  */
object Diff {

  /** md5 over `cols` with an explicit null sentinel per column (a null
    * and the empty string must not collide) joined on  (a
    * separator no tokenizer emits), so (a, bc) and (ab, c) differ. */
  private def contentHash(cols: Seq[String]): Column =
    md5(concat_ws("",
      cols.map(c => coalesce(col(c).cast("string"), lit("null"))): _*))

  /** One row per key present in EITHER snapshot:
    * (keys..., old_hash, new_hash, status) with status in
    * added | removed | changed | unchanged.
    *
    * Scale: each side reduces to (keys, 16-byte hash) BEFORE the
    * full-outer join — the join shuffles hashes, not documents; with
    * both snapshots bucketed on the key (`Tables.writeBucketed`) even
    * that shuffle disappears. Keys must be unique per snapshot (it's a
    * keyed table diff, not a bag diff — duplicate keys would
    * cross-join at the full-outer join); enforce upstream with q83's
    * latest-version compaction.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String], contentCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(contentCols.nonEmpty, "at least one content column")
    val reserved = Seq("old_hash", "new_hash", "status").filter(keys.contains)
    require(reserved.isEmpty,
      s"reserved output columns ${reserved.mkString(", ")} used as keys")
    val o = oldSnap.select(keys.map(col) :+ contentHash(contentCols).as("old_hash"): _*)
    val n = newSnap.select(keys.map(col) :+ contentHash(contentCols).as("new_hash"): _*)
    o.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged"))
  }
}
