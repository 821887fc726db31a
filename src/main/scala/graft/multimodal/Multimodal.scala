package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal (image/audio/video) columns as opaque binary + typed
  * metadata — the training-pipeline pattern for media at 100 TB: payloads
  * stay as `binary` columns co-partitioned with their metadata; per-asset
  * compute runs batch-at-a-time inside partitions (`mapPartitions` on a
  * typed Dataset — the JVM analog of `mapInPandas`: one iterator per
  * partition, no per-row shuffling, no driver collect).
  *
  * The decode boundary dispatches on the container's magic bytes:
  *
  *   - **image** assets are REAL PNGs (encoded and decoded with
  *     `javax.imageio` — pure JDK, no native libs): an 8-bit grayscale
  *     raster whose pixels are the document's UTF-8 bytes zero-padded to
  *     width×height. Every image query exercises an actual format parser
  *     on actual compressed bytes (signature, IHDR, zlib-inflated
  *     scanlines), not a synthetic header.
  *   - **audio** assets are REAL PCM WAVs (`javax.sound.sampled` — pure
  *     JDK): RIFF container, 8-bit mono samples = the document bytes
  *     zero-padded to width×height (appended silence), so every audio
  *     query exercises an actual RIFF/fmt-chunk parser.
  *   - **video** assets remain STUBBED with the deterministic GRF1
  *     container (no pure-JDK video codec exists):
  *       magic "GRF1" | kind u8 | width i32 BE | height i32 BE | payload
  *     Swap `decodePayload`'s GRF1 arm for an actual codec (JavaCV,
  *     ffmpeg-over-pipe) and nothing else changes.
  *
  * Both containers carry the same raster bytes at the same dimensions
  * (width = ceil(√n)), which keeps the dimension arithmetic
  * oracle-checkable in plain SQL even though the PNG bytes themselves are
  * opaque to DuckDB.
  */
object Multimodal {

  val Magic: Array[Byte] = "GRF1".getBytes("US-ASCII")
  val FrameBytes = 64

  case class Asset(asset_id: Long, kind: String, payload: Array[Byte])
  case class Decoded(asset_id: Long, kind: String, width: Int, height: Int,
                     n_pixels: Long)
  case class Histogram(asset_id: Long, histogram: Array[Double])
  case class Frame(asset_id: Long, frame_no: Int, frame_fp: Long)

  private val kinds = Array("image", "audio", "video")

  /** Deterministic kind per doc (stable mix of the three modalities). */
  def kindOf(docId: Long): String = kinds((docId % 3).toInt)

  /** width = ceil(sqrt(n)), height = ceil(n / width) — mirrored in the
    * oracle SQL (DecodeDimsSql). */
  def dimsFor(n: Int): (Int, Int) = {
    val w = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    val h = math.max(1, (n + w - 1) / w)
    (w, h)
  }

  /** Media file writer: image → real PNG, audio → real WAV, video →
    * GRF1 stub (no pure-JDK video codec exists). */
  def encodePayload(kind: String, data: Array[Byte]): Array[Byte] =
    if (kind == "image") encodePng(data)
    else if (kind == "audio") encodeWav(data)
    else {
      val (w, h) = dimsFor(data.length)
      val buf = java.nio.ByteBuffer.allocate(Magic.length + 1 + 8 + w * h)
      buf.put(Magic)
      buf.put(kinds.indexOf(kind).toByte)
      buf.putInt(w)
      buf.putInt(h)
      buf.put(data)          // zero-padded to w*h by allocate()
      buf.array()
    }

  private val PngMagic: Array[Byte] = Array(0x89.toByte, 'P'.toByte,
    'N'.toByte, 'G'.toByte, 0x0D, 0x0A, 0x1A, 0x0A)

  // ImageIO's default scratch-file cache turns every in-memory decode
  // into tmp-dir I/O inside executor tasks; keep codec work on-heap.
  javax.imageio.ImageIO.setUseCache(false)

  /** Encode a byte buffer as a REAL grayscale PNG: width = ceil(√n) (the
    * shared dims formula), pixels = the bytes zero-padded to w×h. PNG
    * grayscale is lossless, so decode returns exactly these bytes. */
  def encodePng(data: Array[Byte]): Array[Byte] = {
    val (w, h) = dimsFor(data.length)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h,
      java.util.Arrays.copyOf(data, w * h))
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real PNG decode via javax.imageio (new reader instance per call —
    * thread-safe inside partition iterators). Non-gray inputs are
    * converted so the downstream body is always one byte per pixel. */
  private def decodePng(payload: Array[Byte])
      : Option[(String, Int, Int, Array[Byte])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val gray =
          if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
          else {
            val g = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val gr = g.createGraphics()
            try gr.drawImage(img, 0, 0, null) finally gr.dispose()
            g
          }
        val body = new Array[Byte](w * h)
        gray.getRaster.getDataElements(0, 0, w, h, body)
        Some(("image", w, h, body))
      }
    } catch {
      // Corrupt-but-signed PNGs surface as IIOException, EOF, or decoder
      // runtime errors depending on where the stream breaks; all of them
      // mean "not a decodable asset", never "kill the task".
      case scala.util.control.NonFatal(_) => None
    }

  /** Encode a byte buffer as a REAL PCM WAV (RIFF container, 8-bit
    * unsigned mono @ 8 kHz): the samples are the bytes zero-padded to
    * width×height — zero-padding PCM is appended silence, so the shared
    * dims formula stays recoverable from the frame count alone (with
    * w = ceil(√n), h = ceil(n/w): w·h ∈ ((w−1)², w²], so
    * dimsFor(w·h) = (w, h) — the padded length round-trips the dims). */
  def encodeWav(data: Array[Byte]): Array[Byte] = {
    val (w, h) = dimsFor(data.length)
    val padded = java.util.Arrays.copyOf(data, w * h)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(padded), fmt, padded.length.toLong)
    val bos = new java.io.ByteArrayOutputStream(padded.length + 64)
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real WAV decode via javax.sound.sampled (header parse + PCM frame
    * extraction — a new stream per call, thread-safe inside partition
    * iterators). Dims recovered from the frame count (see encodeWav). */
  private def decodeWav(payload: Array[Byte])
      : Option[(String, Int, Int, Array[Byte])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val body = try ais.readAllBytes() finally ais.close()
      if (body.isEmpty) None
      else {
        val (w, h) = dimsFor(body.length)
        Some(("audio", w, h, body))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private val RiffMagic: Array[Byte] = "RIFF".getBytes("US-ASCII")
  private val WaveTag: Array[Byte] = "WAVE".getBytes("US-ASCII")

  /** The decode boundary: dispatch on magic bytes — real PNG parse for
    * images, real WAV parse for audio, GRF1 stub for video. Returns None
    * on malformed input (corrupt media is data, not an exception, at
    * 100 TB). */
  def decodePayload(payload: Array[Byte])
      : Option[(String, Int, Int, Array[Byte])] = {
    if (payload.length >= PngMagic.length &&
      payload.take(PngMagic.length).sameElements(PngMagic))
      decodePng(payload)
    else if (payload.length >= 12 &&
      payload.take(4).sameElements(RiffMagic) &&
      payload.slice(8, 12).sameElements(WaveTag))
      decodeWav(payload)
    else if (payload.length < 13 ||
      !payload.take(4).sameElements(Magic)) None
    else {
      val buf = java.nio.ByteBuffer.wrap(payload)
      buf.position(4)
      val kind = kinds.lift(buf.get().toInt)
      val w = buf.getInt
      val h = buf.getInt
      // Long arithmetic: a crafted header like w=h=65536 overflows Int
      // (w*h == 0) and would pass an Int-typed length check.
      if (kind.isEmpty || w <= 0 || h <= 0 ||
        payload.length.toLong != 13L + w.toLong * h) None
      else {
        val body = new Array[Byte](w * h)
        buf.get(body)
        Some((kind.get, w, h, body))
      }
    }
  }

  /** Synthesize the assets table from documents: one GRF1 blob per doc. */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        Asset(id, kindOf(id), encodePayload(kindOf(id), text.getBytes("UTF-8")))
      })
  }

  /** Decode metadata extraction — one partition-iterator pass, malformed
    * assets dropped. */
  def decoded(assetsDs: Dataset[Asset]): Dataset[Decoded] = {
    import assetsDs.sparkSession.implicits._
    assetsDs.mapPartitions(_.flatMap { a =>
      decodePayload(a.payload).map { case (kind, w, h, _) =>
        Decoded(a.asset_id, kind, w, h, w.toLong * h)
      }
    })
  }

  /** Feature extraction: 16-bin byte histogram (density), batch-shaped:
    * one primitive accumulation array per asset, no boxing in the loop. */
  def byteHistograms(assetsDs: Dataset[Asset]): Dataset[Histogram] = {
    import assetsDs.sparkSession.implicits._
    assetsDs.mapPartitions(_.flatMap { a =>
      decodePayload(a.payload).map { case (_, _, _, body) =>
        val counts = new Array[Double](16)
        var i = 0
        while (i < body.length) {
          counts((body(i) & 0xFF) >>> 4) += 1.0
          i += 1
        }
        val n = math.max(1, body.length).toDouble
        Histogram(a.asset_id, counts.map(_ / n))
      }
    })
  }

  /** Strided "resize" (every factor-th pixel) — deterministic stand-in for
    * real resampling; re-encodes to GRF1 so resizes compose. */
  def resized(assetsDs: Dataset[Asset], factor: Int): Dataset[Asset] = {
    import assetsDs.sparkSession.implicits._
    assetsDs.mapPartitions(_.flatMap { a =>
      decodePayload(a.payload).map { case (kind, _, _, body) =>
        val sampled = body.grouped(factor).map(_.head).toArray
        Asset(a.asset_id, kind, encodePayload(kind, sampled))
      }
    })
  }

  /** Frame sampling for video assets: payload = sequence of 64-byte
    * frames; keep every `every`-th frame, fingerprint each (xxhash-free
    * deterministic Long fp so the column stays primitive). */
  def sampledFrames(assetsDs: Dataset[Asset], every: Int): Dataset[Frame] = {
    import assetsDs.sparkSession.implicits._
    assetsDs.filter(_.kind == "video").mapPartitions(_.flatMap { a =>
      decodePayload(a.payload).toSeq.flatMap { case (_, _, _, body) =>
        body.grouped(FrameBytes).zipWithIndex
          .filter(_._2 % every == 0)
          .map { case (frame, idx) =>
            Frame(a.asset_id, idx, java.util.Arrays.hashCode(frame).toLong)
          }
      }
    })
  }

  // ---- Oracle-checkable registry queries (dimension/stat arithmetic) ----

  /** Payload stats straight off the documents bytes (pre-container):
    * byte length + md5 — the binary-column scan pattern. */
  def payloadStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("fp"))
      .orderBy("doc_id")

  /** Decoded dims per asset — the mapPartitions decode path, verified
    * against pure-SQL integer math in the oracle. */
  def decodeDims(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    decoded(assets(spark, dir))
      .select(col("asset_id").as("doc_id"), col("kind"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy("doc_id")
  }

  /** Dimensions after a factor-4 strided resize + re-encode — the full
    * decode → transform → encode → decode chain through the partition
    * iterators, against pure integer/sqrt math in the oracle (the resize
    * keeps ceil(n_px/4) bytes, then GRF1 re-dims them). */
  def resizeDims(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    decoded(resized(assets(spark, dir), factor = 4))
      .select(col("asset_id").as("doc_id"), col("kind"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy("doc_id")
  }

  /** Sampled-frame counts per video asset (every 4th frame), vs SQL. */
  def frameSampleCounts(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    sampledFrames(assets(spark, dir), every = 4)
      .groupBy(col("asset_id").as("doc_id"))
      .agg(count(lit(1)).as("n_frames"))
      .orderBy("doc_id")
  }
}
