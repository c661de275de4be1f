package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary columns with
  * typed metadata, processed per-partition through a typed Dataset.
  *
  * All three modalities decode REAL bytes with pure-JDK codecs:
  *   - [[decodeImages]]: javax.imageio parses actual PNG bytes —
  *     width/height/channels/mean luminance. [[encodePng]] synthesizes
  *     deterministic real PNGs so the path is testable end-to-end.
  *   - [[decodeAudio]]: javax.sound.sampled parses actual RIFF/WAVE
  *     PCM bytes — sample rate, channels, bit depth, frame count,
  *     mean |sample|. [[encodeWav]] synthesizes deterministic WAVs.
  *   - [[decodeVideos]] / [[extractFrames]]: ImageIO's GIF reader
  *     parses actual multi-frame animated GIFs — frame count, frame
  *     dims, frame-0 mean, and real decoded frames re-encoded as PNG.
  *     [[encodeGif]] synthesizes deterministic multi-frame GIFs.
  *   - [[decodeFeatures]] remains the codec-less byte-level fallback
  *     for containers outside the JDK's codecs (MP4/H.264 etc.) —
  *     swap its body for a JNI/FFI codec without touching plumbing.
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

  /** Partition-wise byte-level decode — the codec-less fallback tier
    * (real image decode is [[decodeImagePartition]]): deterministic
    * byte facts (length, md5 hex, a frame count at 100 bytes/frame)
    * for modalities this JVM cannot parse. */
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

  /** Facts only a real decode can produce: pixel dimensions, band
    * count, mean sample value. `ok` = false marks an undecodable
    * payload (corrupt bytes are a fact of 100 TB media corpora —
    * surfaced as data, not a job-killing throw). */
  final case class ImageFeatures(doc_id: Long, lang: String, ok: Boolean,
                                 width: Int, height: Int, channels: Int,
                                 mean_luma: Double)

  /** Deterministic real PNG bytes: a `width` x `height` RGB image whose
    * pixel (x, y) is an integer function of (x, y, seed), compressed by
    * the JDK's ImageIO PNG writer. Real in every sense — a correct PNG
    * decoder recovers exactly these dimensions and samples. */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"bad image dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (x * 31 + y * 17 + seed % 251).toInt & 0xff
        img.setRGB(x, y, (v << 16) | (((v * 3) & 0xff) << 8) | ((v * 7) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Ingest documents as REAL media records: the payload is an actual
    * PNG ([[encodePng]], sized from n_chars metadata, seeded by
    * doc_id), so decode tests run against genuinely compressed image
    * bytes. Encoding runs inside the partition iterator —
    * partition-parallel, never on the driver. */
  def ingestImages(docs: DataFrame): Dataset[MediaRecord] =
    docs.select(col("doc_id"), col("lang"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"))
      .as(Encoders.product[(Long, String, Int, Int)])
      .mapPartitions(_.map { case (id, lang, w, h) =>
        MediaRecord(id, lang, encodePng(w, h, id), w, h)
      })(Encoders.product[MediaRecord])

  /** Exact integer mean over every raster sample (truncated division —
    * deterministic). The caller is responsible for handing this a
    * raster whose samples are COLOR VALUES: palette-indexed rasters
    * (GIF frames, palette PNGs) must go through [[toRgb]] first or the
    * "mean" is a mean of palette indices — an implementation-dependent
    * artifact of the writer's quantizer ordering. */
  private def rasterMean(raster: java.awt.image.Raster): Double = {
    val (w, h, bands) = (raster.getWidth, raster.getHeight, raster.getNumBands)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
        x += 1
      }
      y += 1
    }
    (sum / (w.toLong * h * bands)).toDouble
  }

  /** Render any image into truecolor TYPE_INT_RGB via its own color
    * model — the step that turns palette INDICES back into the colors
    * they name. Order-independent (colors, not palette order), so the
    * result is deterministic even though quantizer palette ordering is
    * a JDK implementation detail. */
  private def toRgb(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage =
    if (img.getType == java.awt.image.BufferedImage.TYPE_INT_RGB) img
    else {
      val out = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try g.drawImage(img, 0, 0, null) finally g.dispose()
      out
    }

  /** Partition-wise REAL image decode via javax.imageio: per-partition
    * decoder init (ImageIO's disk cache off — pure in-memory decode),
    * then each payload is parsed as an image. Decoded width/height come
    * from the pixel data, channels from the raster band count, and
    * mean_luma is the exact integer mean of every sample (truncated
    * division — deterministic). Undecodable bytes yield
    * `ok = false` rows with zeroed facts. */
  def decodeImagePartition(it: Iterator[MediaRecord]): Iterator[ImageFeatures] = {
    javax.imageio.ImageIO.setUseCache(false) // per-partition decoder init
    it.map { r =>
      // NonFatal, not just IOException: JDK ImageIO throws
      // RuntimeExceptions (NegativeArraySize, IndexOutOfBounds,
      // IllegalArgument) on fuzzed/truncated payloads — any of them
      // escaping here would fail the task 4x and kill the job, the
      // exact outcome the ok=false contract exists to prevent.
      val img =
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content)))
        catch { case scala.util.control.NonFatal(_) => None }
      img match {
        case Some(im) =>
          val bands = im.getRaster.getNumBands
          // palette-indexed inputs (palette PNG/GIF) carry indices in
          // the raster; mean over toRgb's color samples either way
          ImageFeatures(r.doc_id, r.lang, ok = true, im.getWidth, im.getHeight,
            bands, rasterMean(toRgb(im).getRaster))
        case None =>
          ImageFeatures(r.doc_id, r.lang, ok = false, 0, 0, 0, 0.0)
      }
    }
  }

  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageFeatures] =
    media.mapPartitions(decodeImagePartition _)(Encoders.product[ImageFeatures])

  /** Facts only a real audio decode can produce: sample rate, channel
    * count, bit depth, frame count, and the exact integer mean of
    * |sample| over every 16-bit PCM sample (truncated division —
    * deterministic). `ok` = false marks undecodable payloads, same
    * contract as [[ImageFeatures]]. */
  final case class AudioFeatures(doc_id: Long, lang: String, ok: Boolean,
                                 sample_rate: Int, channels: Int, bits: Int,
                                 n_frames: Long, mean_abs: Double)

  /** Deterministic real WAV bytes: 16-bit little-endian PCM where
    * frame f, channel c carries the integer waveform
    * ((f*2731 + c*8191 + (seed%251)*977) % 65536) - 32768, containered
    * by the JDK's own RIFF/WAVE writer (javax.sound.sampled — pure
    * JVM, no external codec, no audio hardware). A correct WAV decoder
    * recovers exactly these samples. */
  def encodeWav(sampleRate: Int, channels: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames > 0,
      s"bad audio shape rate=$sampleRate ch=$channels frames=$nFrames")
    val data = new Array[Byte](nFrames * channels * 2)
    var f = 0
    var k = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        val v = (((f * 2731L + c * 8191L + (seed % 251L) * 977L) % 65536L) - 32768L).toShort
        data(k) = (v & 0xff).toByte
        data(k + 1) = ((v >> 8) & 0xff).toByte
        k += 2
        c += 1
      }
      f += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, channels,
      true, false) // signed, little-endian
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Ingest documents as REAL audio records: the payload is an actual
    * WAV ([[encodeWav]] at 8 kHz; channels from doc_id parity, frame
    * count from n_chars, waveform seeded by doc_id). Encoding runs
    * inside the partition iterator — partition-parallel, never on the
    * driver. The width/height metadata slots carry (channels, frames)
    * at encode time; decode must recover them FROM THE BYTES. */
  def ingestAudio(docs: DataFrame): Dataset[MediaRecord] =
    docs.select(col("doc_id"), col("lang"),
      (col("doc_id") % 2 + 1).cast("int").as("width"),
      (col("n_chars") % 200 + 50).cast("int").as("height"))
      .as(Encoders.product[(Long, String, Int, Int)])
      .mapPartitions(_.map { case (id, lang, ch, fr) =>
        MediaRecord(id, lang, encodeWav(8000, ch, fr, id), ch, fr)
      })(Encoders.product[MediaRecord])

  /** Partition-wise REAL audio decode via javax.sound.sampled: parse
    * the RIFF/WAVE container, read format facts from the header, then
    * every PCM sample from the stream. mean_abs is computed for 16-bit
    * PCM (the WAV norm) honoring the container's declared endianness;
    * other bit depths report their true format facts with mean_abs 0.
    * Undecodable bytes yield `ok = false` rows — corrupt payloads are
    * data, not job-killing throws (same contract as the image tier). */
  def decodeAudioPartition(it: Iterator[MediaRecord]): Iterator[AudioFeatures] = {
    it.map { r =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.content))
        try {
          val fmt = ais.getFormat
          val bytes = ais.readAllBytes()
          var sum = 0L
          var n = 0L
          if (fmt.getSampleSizeInBits == 16) {
            var i = 0
            while (i + 1 < bytes.length) {
              val s =
                if (fmt.isBigEndian) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
                else ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
              sum += math.abs(s.toLong)
              n += 1
              i += 2
            }
          }
          AudioFeatures(r.doc_id, r.lang, ok = true, fmt.getSampleRate.toInt,
            fmt.getChannels, fmt.getSampleSizeInBits, ais.getFrameLength,
            (if (n == 0) 0L else sum / n).toDouble)
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) =>
        AudioFeatures(r.doc_id, r.lang, ok = false, 0, 0, 0, 0L, 0.0)
      }
    }
  }

  def decodeAudio(media: Dataset[MediaRecord]): Dataset[AudioFeatures] =
    media.mapPartitions(decodeAudioPartition _)(Encoders.product[AudioFeatures])

  /** Facts only a real video decode can produce: the frame count, the
    * pixel dimensions, and frame 0's exact integer mean sample value.
    * Same `ok = false` contract as the image/audio tiers. */
  final case class VideoFeatures(doc_id: Long, lang: String, ok: Boolean,
                                 n_frames: Int, width: Int, height: Int,
                                 mean_luma_f0: Double)

  /** Deterministic real VIDEO bytes: a multi-frame animated GIF (the
    * simplest motion container the JDK can both write and read) where
    * frame f's pixel (x, y) is an integer function of (x, y, f, seed),
    * written frame-by-frame through ImageIO's GIF sequence writer. A
    * correct GIF decoder recovers exactly nFrames frames at these
    * dimensions. */
  def encodeGif(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0,
      s"bad video shape ${width}x$height x$nFrames")
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val v = (x * 31 + y * 17 + f * 53 + seed % 251).toInt & 0xff
            img.setRGB(x, y, (v << 16) | (v << 8) | v) // grayscale: GIF palette-safe
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Ingest documents as REAL video records: the payload is an actual
    * multi-frame GIF (frame count from n_chars, square frames sized
    * from n_chars, pixel pattern seeded by doc_id), encoded inside the
    * partition iterator — partition-parallel, never on the driver. */
  def ingestVideos(docs: DataFrame): Dataset[MediaRecord] =
    docs.select(col("doc_id"), col("lang"),
      (col("n_chars") % 24 + 4).cast("int").as("width"),
      (col("n_chars") % 7 + 2).cast("int").as("height")) // height slot carries nFrames
      .as(Encoders.product[(Long, String, Int, Int)])
      .mapPartitions(_.map { case (id, lang, side, nf) =>
        MediaRecord(id, lang, encodeGif(side, side, nf, id), side, nf)
      })(Encoders.product[MediaRecord])

  /** Open a payload with the shared per-partition GIF reader and run
    * `f` over (reader, frameCount); the input stream always closes.
    * The reader/iis open-close dance lives HERE so the two video
    * consumers cannot drift. */
  private def withGifFrames[T](reader: javax.imageio.ImageReader,
                               content: Array[Byte])(f: (javax.imageio.ImageReader, Int) => T): T = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      reader.setInput(iis, false, true)
      f(reader, reader.getNumImages(true))
    } finally iis.close()
  }

  /** Partition-wise REAL video decode: one GIF ImageReader per
    * partition (per-partition decoder init, the mapInPandas batching
    * argument), each payload parsed for its frame count and frame 0
    * decoded for dimensions and exact integer mean COLOR value — GIF
    * frames come back palette-indexed, so the frame goes through
    * [[toRgb]] before the mean (a raw raster mean would average
    * quantizer palette INDICES, a JDK implementation detail).
    * Undecodable bytes yield `ok = false` rows, never throws. */
  def decodeVideoPartition(it: Iterator[MediaRecord]): Iterator[VideoFeatures] = {
    javax.imageio.ImageIO.setUseCache(false)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    it.map { r =>
      try {
        withGifFrames(reader, r.content) { (rd, n) =>
          val f0 = rd.read(0)
          VideoFeatures(r.doc_id, r.lang, ok = true, n, f0.getWidth, f0.getHeight,
            rasterMean(toRgb(f0).getRaster))
        }
      } catch { case scala.util.control.NonFatal(_) =>
        VideoFeatures(r.doc_id, r.lang, ok = false, 0, 0, 0, 0.0)
      }
    }
  }

  def decodeVideos(media: Dataset[MediaRecord]): Dataset[VideoFeatures] =
    media.mapPartitions(decodeVideoPartition _)(Encoders.product[VideoFeatures])

  /** One REAL decoded frame of a video payload, re-encoded as PNG
    * bytes (lossless, so downstream image operators can decode it with
    * [[decodeImagePartition]]). */
  final case class DecodedFrame(doc_id: Long, frame_idx: Int, width: Int,
                                height: Int, png: Array[Byte])

  /** REAL video frame sampling: decode every `everyN`-th frame of each
    * GIF payload and emit it as a TRUECOLOR PNG — [[toRgb]] first, so
    * downstream [[decodeImagePartition]] sees 3-band color samples
    * (a palette PNG would hand it palette indices) — the
    * decode-then-sample shape of a video feature pipeline (cf.
    * [[sampleFrames]], the byte-chunk form for payloads with no JVM
    * codec). Flat-maps partition-parallel; frames of undecodable
    * payloads are simply absent (the features tier is where
    * corruption is surfaced). */
  def extractFrames(media: Dataset[MediaRecord], everyN: Int): Dataset[DecodedFrame] = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      it.flatMap { r =>
        try {
          withGifFrames(reader, r.content) { (rd, n) =>
            (0 until n by everyN).map { i =>
              val img = toRgb(rd.read(i))
              val png = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", png)
              DecodedFrame(r.doc_id, i, img.getWidth, img.getHeight, png.toByteArray)
            }
          }
        } catch { case scala.util.control.NonFatal(_) => Seq.empty }
      }
    }(Encoders.product[DecodedFrame])
  }

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
