package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.Asset

/** The binary plumbing around the real-codec decode boundary
  * (PNG/WAV/AVI/animated-GIF): container roundtrip, malformed-input
  * tolerance, feature extraction, resize composition, frame sampling. */
class MultimodalSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("animated GIFs: real multi-frame container, independent block walk, lossless roundtrip") {
    val data = ("the animated gif payload also needs more than sixty-four " +
      "bytes so the container carries several full frames plus one " +
      "partial tail frame").getBytes("UTF-8")
    val enc = Multimodal.encodeGif(data)
    assert(enc.take(6).sameElements("GIF89a".getBytes("US-ASCII")) ||
      enc.take(6).sameElements("GIF87a".getBytes("US-ASCII")))
    // Independent container parse — a hand-rolled walk of the GIF block
    // grammar (logical screen descriptor, global/local color tables,
    // 0x21 extensions, 0x2C image descriptors, 0x3B trailer), no
    // ImageIO: the frame count must fall out of the raw bytes.
    def countImageDescriptors(b: Array[Byte]): Int = {
      var p = 13 // header (6) + logical screen descriptor (7)
      val gflags = b(10) & 0xFF
      if ((gflags & 0x80) != 0) p += 3 * (2 << (gflags & 7))
      var count = 0
      var done = false
      def skipSubBlocks(): Unit = {
        var n = b(p) & 0xFF
        while (n != 0) { p += 1 + n; n = b(p) & 0xFF }
        p += 1
      }
      while (!done && p < b.length) {
        (b(p) & 0xFF) match {
          case 0x3B => done = true
          case 0x21 => p += 2; skipSubBlocks()
          case 0x2C =>
            count += 1
            val lflags = b(p + 9) & 0xFF
            p += 10
            if ((lflags & 0x80) != 0) p += 3 * (2 << (lflags & 7))
            p += 1 // LZW minimum code size
            skipSubBlocks()
          case other => fail(f"unknown GIF block 0x$other%02x at $p")
        }
      }
      assert(done, "no GIF trailer (0x3B) found")
      count
    }
    val (w, h) = Multimodal.dimsFor(data.length)
    val expFrames = (w * h + 63) / 64
    assert(countImageDescriptors(enc) == expFrames)
    // The decode boundary dispatches on the GIF magic and is lossless:
    // concatenated frame rasters reproduce the padded body exactly.
    val Some((kind, dw, dh, body)) = Multimodal.decodePayload(enc)
    assert(kind == "video")
    assert((dw, dh) == (w, h))
    assert(body.take(data.length).sameElements(data))
    assert(body.drop(data.length).forall(_ == 0))
    // All 256 sample values survive the palette round-trip (the
    // lossless claim, not just on ASCII text).
    val all = Array.tabulate(256)(_.toByte)
    val Some((_, _, _, allBody)) =
      Multimodal.decodePayload(Multimodal.encodeGif(all))
    assert(allBody.take(256).sameElements(all))
    // Corrupt containers degrade to None, never a throw.
    assert(Multimodal.decodePayload(enc.take(enc.length / 2)).isEmpty)
    assert(Multimodal.decodePayload(enc.take(13)).isEmpty)
    assert(Multimodal.decodePayload(
      "GIF89a then garbage that is not a screen descriptor"
        .getBytes("US-ASCII")).isEmpty)
  }

  test("mm_gif_frames: the registry row reads real GIF bytes end to end") {
    val df = Multimodal.gifFrameDims(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // Every video-kind doc appears, each with ≥1 frame and dims
    // consistent with the frame count (frames = ceil(w·h/64)).
    rows.foreach { r =>
      val (n, w, h) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 1 && n == (w * h + 63) / 64, r.toString)
    }
  }

  test("video assets are real AVIs: RIFF container, PNG frames, lossless roundtrip") {
    val data = ("the multimodal video payload needs more than sixty-four " +
      "bytes so the container carries several full frames and one " +
      "partial tail frame").getBytes("UTF-8")
    val enc = Multimodal.encodePayload("video", data)
    // A real RIFF 'AVI ' container, not a synthetic header.
    assert(enc.take(4).sameElements("RIFF".getBytes("US-ASCII")))
    assert(enc.slice(8, 12).sameElements("AVI ".getBytes("US-ASCII")))
    // Full decode is lossless: kind, shared dims formula, exact body.
    val Some((kind, w, h, body)) = Multimodal.decodePayload(enc)
    assert(kind == "video")
    assert((w, h) == Multimodal.dimsFor(data.length))
    assert(body.take(data.length).sameElements(data))
    assert(body.drop(data.length).forall(_ == 0))
    // The movi chunks hold one PNG per 64-byte frame (last frame short),
    // each independently decodable by a plain ImageIO parse.
    val chunks = Multimodal.aviFrameChunks(enc).toSeq
    assert(chunks.length == (w * h + 63) / 64)
    val first = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(chunks.head))
    assert(first.getWidth == 8 && first.getHeight == 8)
    val rem = w * h - 64 * (chunks.length - 1)
    val last = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(chunks.last))
    assert(last.getWidth == rem && last.getHeight == 1)
    // Truncated AVI (valid signature, broken structure) degrades to None.
    assert(Multimodal.decodePayload(enc.take(40)).isEmpty)
    assert(Multimodal.aviFrameChunks(enc.take(40)).isEmpty)
  }

  test("audio assets are real WAVs: RIFF container, independent parse, lossless PCM") {
    val data = "pcm payload for the audio codec".getBytes("UTF-8")
    val enc = Multimodal.encodePayload("audio", data)
    assert(enc.take(4).sameElements("RIFF".getBytes("US-ASCII")))
    assert(enc.slice(8, 12).sameElements("WAVE".getBytes("US-ASCII")))
    // Independent javax.sound parse agrees on format and frame count.
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(enc))
    val (w, h) = Multimodal.dimsFor(data.length)
    assert(ais.getFrameLength == w.toLong * h)
    assert(ais.getFormat.getSampleSizeInBits == 8 &&
      ais.getFormat.getChannels == 1)
    // Decode boundary returns the PCM body losslessly (padding = silence).
    val Some((kind, dw, dh, body)) = Multimodal.decodePayload(enc)
    assert(kind == "audio" && (dw, dh) == (w, h))
    assert(body.take(data.length).sameElements(data))
    assert(body.drop(data.length).forall(_ == 0))
    // Truncated WAV (valid signature, broken stream) degrades to None.
    assert(Multimodal.decodePayload(enc.take(16)).isEmpty)
  }

  test("image assets are real PNGs: signature, independent parse, lossless body") {
    val data = "the quick brown fox".getBytes("UTF-8")
    val enc = Multimodal.encodePayload("image", data)
    // A real PNG container, not a synthetic header.
    assert(enc.take(8).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte,
      'G'.toByte, 0x0D.toByte, 0x0A.toByte, 0x1A.toByte, 0x0A.toByte)))
    // An independent ImageIO parse agrees on the dims formula.
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert((img.getWidth, img.getHeight) == Multimodal.dimsFor(data.length))
    // Grayscale PNG is lossless: the decode boundary returns the raster.
    val Some((kind, w, h, body)) = Multimodal.decodePayload(enc)
    assert(kind == "image" && (w, h) == Multimodal.dimsFor(data.length))
    assert(body.take(data.length).sameElements(data))
    assert(body.drop(data.length).forall(_ == 0))
    // Truncated PNG (valid signature, broken stream) degrades to None.
    assert(Multimodal.decodePayload(enc.take(20)).isEmpty)
  }

  test("malformed payloads decode to None, and the pipeline drops them") {
    import spark.implicits._
    assert(Multimodal.decodePayload(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodePayload("XXXX0000000000000".getBytes).isEmpty)
    val mixed = spark.createDataset(Seq(
      Asset(1L, "image", Multimodal.encodePayload("image", "ok".getBytes)),
      Asset(2L, "image", Array[Byte](9, 9, 9))))
    assert(Multimodal.decoded(mixed).collect().map(_.asset_id).toSeq == Seq(1L))
  }

  test("every document becomes a decodable asset with positive dims") {
    val dec = Multimodal.decoded(Multimodal.assets(spark, dir)).collect()
    assert(dec.length == 500)
    assert(dec.forall(d => d.width > 0 && d.height > 0 &&
      d.n_pixels == d.width.toLong * d.height))
  }

  test("byte histograms are densities (sum to 1) and deterministic") {
    val h1 = Multimodal.byteHistograms(Multimodal.assets(spark, dir))
      .collect().map(h => h.asset_id -> h.histogram.toSeq).toMap
    assert(h1.values.forall(h => math.abs(h.sum - 1.0) < 1e-9))
    val h2 = Multimodal.byteHistograms(Multimodal.assets(spark, dir))
      .collect().map(h => h.asset_id -> h.histogram.toSeq).toMap
    assert(h1 == h2)
  }

  test("resize composes: factor 2 twice ≈ strided factor 4 in size") {
    val once = Multimodal.resized(Multimodal.assets(spark, dir), 4)
    val twice = Multimodal.resized(
      Multimodal.resized(Multimodal.assets(spark, dir), 2), 2)
    val sizes1 = Multimodal.decoded(once).collect()
      .map(d => d.asset_id -> d.n_pixels).toMap
    val sizes2 = Multimodal.decoded(twice).collect()
      .map(d => d.asset_id -> d.n_pixels).toMap
    // both are ~n/4; header padding makes them approximately equal
    assert(sizes1.keySet == sizes2.keySet)
    sizes1.foreach { case (id, n) =>
      assert(math.abs(n - sizes2(id)) <= math.max(8L, n / 4),
        s"asset $id: $n vs ${sizes2(id)}")
    }
  }

  test("frame sampling keeps every 4th 64-byte frame of video assets") {
    val frames = Multimodal.sampledFrames(Multimodal.assets(spark, dir), 4)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_no % 4 == 0))
    // only video assets (doc_id % 3 == 2) appear
    assert(frames.forall(_.asset_id % 3 == 2))
  }

  test("audio energy: codec-path stats match a byte-level replay") {
    import org.apache.spark.sql.functions.col
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Multimodal.audioEnergy(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty && rows.forall(_._1 % 3 == 1))
    rows.foreach { case (id, n, sum, peak, mean) =>
      val bytes = texts(id).getBytes("UTF-8")
      val (w, h) = Multimodal.dimsFor(bytes.length)
      val padded = bytes ++ Array.fill(w * h - bytes.length)(0.toByte)
      val devs = padded.map(b => math.abs((b & 0xFF) - 128).toLong)
      assert(n == padded.length.toLong)
      assert(sum == devs.sum)
      assert(peak == devs.max)
      assert(mean == devs.sum.toDouble / padded.length)
    }
  }
}
