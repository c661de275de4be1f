package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary columns with
  * typed metadata, processed per-partition through a typed Dataset.
  *
  * The Spark-side shape is the real thing — binary payload column,
  * metadata struct, partition-wise batch decode with per-partition
  * decoder init — while the decoder itself is a STUB (this container
  * has no image/audio codecs): it derives deterministic features from
  * the bytes so results stay oracle-checkable. Swap
  * [[Multimodal.decodePartition]]'s body for a real codec (JNI/FFI
  * image lib) without touching any plumbing.
  *
  * At scale: records flow partition-parallel, the decoder is
  * initialized once per partition (amortizing model/codec setup, the
  * same batching argument as mapInPandas), and features return to
  * DataFrame land for Catalyst-optimized aggregation.
  */
object Multimodal {

  /** An opaque media payload + typed metadata. `content` stands in for
    * image/audio/video bytes. */
  final case class MediaRecord(doc_id: Long, lang: String, content: Array[Byte],
                               width: Int, height: Int)

  /** Features a decoder extracts per record. */
  final case class MediaFeatures(doc_id: Long, lang: String, byte_len: Long,
                                 content_hash: String, frames: Long)

  /** Ingest documents as media records: text bytes as the opaque
    * payload, synthetic width/height metadata derived from n_chars. */
  def ingest(docs: DataFrame): Dataset[MediaRecord] =
    docs.select(
      col("doc_id"), col("lang"),
      encode(col("text"), "UTF-8").as("content"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"))
      .as(Encoders.product[MediaRecord])

  /** Partition-wise decode. STUB: a real implementation would
    * initialize a codec here (once per partition) and decode
    * `r.content`; this one computes deterministic byte-level features
    * (length, md5 hex, a frame count at 100 bytes/frame). */
  def decodePartition(it: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    val md = MessageDigest.getInstance("MD5") // per-partition "decoder" init
    it.map { r =>
      md.reset()
      val hex = md.digest(r.content).map("%02x".format(_)).mkString
      MediaFeatures(r.doc_id, r.lang, r.content.length.toLong, hex, r.content.length / 100L)
    }
  }

  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    media.mapPartitions(decodePartition _)(Encoders.product[MediaFeatures])

  /** One sampled "frame" of a media payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Deterministic frame sampling: chunk the payload into
    * `frameBytes`-sized frames and keep every `everyN`-th (video
    * frame-sampling shape; here byte chunks stand in for decoded
    * frames). Flat-maps partition-parallel — output size is
    * payload/(frameBytes*everyN) per record, never collected to the
    * driver.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int, everyN: Int): Dataset[Frame] = {
    require(frameBytes > 0 && everyN > 0)
    media.mapPartitions(_.flatMap { r =>
      r.content.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % everyN == 0 => Frame(r.doc_id, idx, chunk)
      }
    })(Encoders.product[Frame])
  }
}
