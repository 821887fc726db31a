package graft.multimodal

import graft.Registry

/** Registry + oracles for the multimodal tier. The binary payloads are
  * deterministic functions of `documents.text`, so byte stats and the
  * container dimension arithmetic have exact SQL twins; the opaque-binary
  * paths (histograms, resize, frame fingerprints) are covered by
  * MultimodalSpec instead. */
object MultimodalRegistry {

  /** Twin of Multimodal.dimsFor over the UTF-8 byte length. */
  private val DimsCte =
    """dims AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |      ELSE 'video' END AS kind,
      |    greatest(1, CAST(ceil(sqrt(octet_length(encode(text)))) AS BIGINT)) AS w,
      |    octet_length(encode(text)) AS n
      |  FROM documents)""".stripMargin

  val registry: Registry = Registry(
    queries = Map(
      "mm_payload_stats" -> ((s, d) => Multimodal.payloadStats(s, d)),
      "mm_decode_dims" -> ((s, d) => Multimodal.decodeDims(s, d)),
      "mm_frame_counts" -> ((s, d) => Multimodal.frameSampleCounts(s, d)),
      "mm_resize_dims" -> ((s, d) => Multimodal.resizeDims(s, d)),
      "mm_audio_energy" -> ((s, d) => Multimodal.audioEnergy(s, d)),
      "mm_gif_frames" -> ((s, d) => Multimodal.gifFrameDims(s, d))
    ),
    oracles = Map(
      "mm_payload_stats" ->
        """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
          |  md5(text) AS fp
          |FROM documents ORDER BY doc_id""".stripMargin,
      "mm_decode_dims" ->
        s"""WITH $DimsCte
           |SELECT doc_id, kind, w AS width,
           |  greatest(1, (n + w - 1) // w) AS height
           |FROM dims ORDER BY doc_id""".stripMargin,
      "mm_frame_counts" ->
        s"""WITH $DimsCte,
           |px AS (SELECT doc_id, kind,
           |         w * greatest(1, (n + w - 1) // w) AS n_px FROM dims)
           |SELECT doc_id, ((n_px + 63) // 64 + 3) // 4 AS n_frames
           |FROM px WHERE kind = 'video'
           |ORDER BY doc_id""".stripMargin,
      // resize keeps every 4th byte of the PADDED body (ceil(n_px/4)),
      // then the media re-encode re-derives dims with the same
      // ceil-sqrt arithmetic as mm_decode_dims.
      "mm_resize_dims" ->
        s"""WITH $DimsCte,
           |px AS (SELECT doc_id, kind,
           |         w * greatest(1, (n + w - 1) // w) AS n_px FROM dims),
           |r AS (SELECT doc_id, kind, (n_px + 3) // 4 AS n2 FROM px),
           |d2 AS (SELECT doc_id, kind, n2,
           |  greatest(1, CAST(ceil(sqrt(n2)) AS BIGINT)) AS w2 FROM r)
           |SELECT doc_id, kind, w2 AS width,
           |  greatest(1, (n2 + w2 - 1) // w2) AS height
           |FROM d2 ORDER BY doc_id""".stripMargin,
      // Animated-GIF tier: total frames = ceil(n_px/64) (full 8×8
      // frames + one partial), dims = the shared ceil-sqrt arithmetic —
      // the Spark side derives both from a real ImageIO multi-frame
      // parse of real GIF bytes.
      "mm_gif_frames" ->
        s"""WITH $DimsCte,
           |px AS (SELECT doc_id, kind, w,
           |         greatest(1, (n + w - 1) // w) AS h,
           |         w * greatest(1, (n + w - 1) // w) AS n_px FROM dims)
           |SELECT doc_id, (n_px + 63) // 64 AS n_frames,
           |  w AS width, h AS height
           |FROM px WHERE kind = 'video'
           |ORDER BY doc_id""".stripMargin,
      // The WAV samples are the doc's bytes (ASCII corpus: byte =
      // codepoint) zero-padded to w×h — appended silence contributes a
      // |0−128| = 128 deviation per pad byte, so the real-codec
      // aggregation has an exact per-character integer twin.
      "mm_audio_energy" ->
        """WITH s AS (SELECT doc_id, length(text) AS n,
          |  greatest(1, CAST(ceil(sqrt(length(text))) AS BIGINT)) AS w,
          |  list_transform(range(length(text)),
          |    i -> abs(ord(text[i + 1]) - 128)) AS devs
          |FROM documents WHERE doc_id % 3 = 1),
          |p AS (SELECT doc_id, n, devs,
          |  w * greatest(1, (n + w - 1) // w) AS wh FROM s)
          |SELECT doc_id, CAST(wh AS BIGINT) AS n_samples,
          |  CAST(list_sum(devs) + 128 * (wh - n) AS BIGINT) AS abs_dev_sum,
          |  CAST(CASE WHEN wh > n THEN greatest(128, list_max(devs))
          |       ELSE list_max(devs) END AS BIGINT) AS peak_dev,
          |  CAST(list_sum(devs) + 128 * (wh - n) AS DOUBLE) / wh
          |    AS mean_abs_dev
          |FROM p ORDER BY doc_id""".stripMargin
    )
  )
}
