package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal-column queries. The media table is synthesized
  * deterministically from `documents` (content = utf8 bytes of text) since
  * the driver fixtures carry no real binaries; kinds rotate image/audio/
  * video by doc_id. Byte-level results (lengths, hashes, frame windows) are
  * oracle-checkable because the bytes are ASCII text; the feature-extract
  * query has no SQL oracle (stubbed codec) and takes the driver's
  * rows-only check, with exact-value coverage in MultimodalSpec.
  */
object MultimodalQueries {

  /** Deterministic media table: one row per document. */
  private[graft] def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        lit("fake").as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).cast("long").as("duration_ms")).as("meta"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary column + typed metadata contract: sizes, hashes, kind split.
    "q38_multimodal_meta" -> ((s, d) =>
      media(s, d).select(
        col("media_id"), col("kind"),
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_md5"),
        col("meta.width").as("width"),
        col("meta.duration_ms").as("duration_ms"))),

    // Batched stub decode -> 16-dim features (no SQL oracle: codec stub;
    // driver rows-only + exact values in MultimodalSpec).
    "q39_media_features" -> ((s, d) => {
      val f = Multimodal.extractFeatures(media(s, d))
      f.select(col("media_id"), col("features"))
        .select(col("media_id") +:
          (0 until 16).map(i =>
            round(element_at(col("features"), i + 1).cast("double"), 4)
              .as(s"f$i")): _*)
    }),

    // Frame sampling of video-kind media: 32-byte windows, every 2nd frame.
    "q40_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(media(s, d), 32, 2)
        .select(col("media_id"), col("frame_idx"),
          length(col("frame")).cast("long").as("frame_len"),
          md5(col("frame")).as("frame_md5"))),

    // REAL image codec roundtrip (javax.imageio): synthesize a uniform-fill
    // PNG per document (dims/color derived from table columns), decode the
    // BYTES back, emit dims + channel means. PNG is lossless and the fill
    // uniform, so the oracle recomputes every output arithmetically — a
    // wrong decoder (or a stub) cannot hash-match.
    "q61_image_decode" -> ((s, d) => {
      val spec = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        (col("n_chars") % 48 + 8).cast("int").as("width"),
        (col("n_chars") % 32 + 8).cast("int").as("height"),
        ((col("doc_id") % 256) * 65536 + (col("doc_id") * 7 % 256) * 256
          + col("doc_id") * 13 % 256).cast("int").as("rgb"))
      Multimodal.decodeImages(Multimodal.synthesizePng(spec))
        .select(col("media_id"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    }),

    // REAL resize through the full pipeline: synthesize -> NN-resample to
    // half dims -> PNG re-encode -> decode AGAIN. Solid fill keeps channel
    // means invariant under any correct resample, and the halved dims are
    // integer arithmetic — both oracle-computable. (Pixel-level mapping
    // correctness of the resampler is pinned separately in MultimodalSpec
    // with a non-uniform quadrant image.)
    "q84_image_resize" -> ((s, d) => {
      val spec = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        (col("n_chars") % 48 + 8).cast("int").as("width"),
        (col("n_chars") % 32 + 8).cast("int").as("height"),
        ((col("doc_id") % 256) * 65536 + (col("doc_id") * 7 % 256) * 256
          + col("doc_id") * 13 % 256).cast("int").as("rgb"))
      Multimodal.decodeImages(
          Multimodal.resizeImages(Multimodal.synthesizePng(spec), 1, 2))
        .select(col("media_id"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    }),

    // REAL multi-frame codec roundtrip (animated GIF via javax.imageio's
    // sequence API): synthesize 2-5 solid-fill frames per document with
    // per-frame colors stepped arithmetically, decode the BYTES back to
    // one row per frame. Solid fills are exact under GIF's palette, so
    // the oracle recomputes frame count, dims, and channel means without
    // a codec — a stub or wrong frame extraction cannot hash-match.
    "q107_gif_frames" -> ((s, d) => {
      val spec = Tables.documents(s, d)
        .filter(col("doc_id") % 5 === 0)
        .select(
          col("doc_id").as("media_id"),
          (col("n_chars") % 24 + 4).cast("int").as("width"),
          (col("n_chars") % 16 + 4).cast("int").as("height"),
          (col("doc_id") % 4 + 2).cast("int").as("n_frames"),
          ((col("doc_id") % 256) * 65536 + (col("doc_id") * 7 % 256) * 256
            + col("doc_id") * 13 % 256).cast("int").as("base_rgb"))
      Multimodal.decodeFrames(Multimodal.synthesizeGif(spec))
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    }),

    // REAL audio codec roundtrip (javax.sound.sampled): synthesize a mono
    // 16-bit PCM square wave per document, decode the BYTES back. A ±amp
    // square wave's RMS is exactly |amp| (integer square sums, one sqrt),
    // so the oracle recomputes every output arithmetically.
    "q85_audio_decode" -> ((s, d) => {
      val spec = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        (col("n_chars") % 1000 + 100).cast("int").as("n_samples"),
        lit(8000).cast("int").as("sample_rate"),
        (col("doc_id") % 1000 + 1).cast("int").as("amp"))
      Multimodal.decodeAudio(Multimodal.synthesizeWav(spec))
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_frames"), round(col("rms"), 6).as("rms"))
    }))

  val oracles: Map[String, String] = Map(
    "q38_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |       length(text) AS n_bytes,
        |       md5(text) AS content_md5,
        |       CAST(n_chars % 640 AS INT) AS width,
        |       n_chars * 10 AS duration_ms
        |FROM documents""".stripMargin,

    "q40_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
        |       length(substr(text, i*32 + 1, 32)) AS frame_len,
        |       md5(substr(text, i*32 + 1, 32)) AS frame_md5
        |FROM documents,
        |     UNNEST(range(0, CAST(ceil(length(text)/32.0) AS BIGINT))) u(i)
        |WHERE doc_id % 3 = 2 AND i % 2 = 0""".stripMargin,

    "q61_image_decode" ->
      """SELECT doc_id AS media_id,
        |       CAST(n_chars % 48 + 8 AS INT) AS width,
        |       CAST(n_chars % 32 + 8 AS INT) AS height,
        |       CAST(doc_id % 256 AS DOUBLE) AS mean_r,
        |       CAST(doc_id * 7 % 256 AS DOUBLE) AS mean_g,
        |       CAST(doc_id * 13 % 256 AS DOUBLE) AS mean_b
        |FROM documents""".stripMargin,

    "q107_gif_frames" ->
      """SELECT doc_id AS media_id, i AS frame_idx,
        |       CAST(n_chars % 24 + 4 AS INT) AS width,
        |       CAST(n_chars % 16 + 4 AS INT) AS height,
        |       CAST((doc_id % 256 + 29 * i) % 256 AS DOUBLE) AS mean_r,
        |       CAST((doc_id * 7 % 256 + 31 * i) % 256 AS DOUBLE) AS mean_g,
        |       CAST((doc_id * 13 % 256 + 37 * i) % 256 AS DOUBLE) AS mean_b
        |FROM documents, UNNEST(range(0, doc_id % 4 + 2)) u(i)
        |WHERE doc_id % 5 = 0""".stripMargin,

    "q85_audio_decode" ->
      """SELECT doc_id AS media_id,
        |       CAST(8000 AS INT) AS sample_rate,
        |       CAST(1 AS INT) AS channels,
        |       CAST(n_chars % 1000 + 100 AS BIGINT) AS n_frames,
        |       round(CAST(doc_id % 1000 + 1 AS DOUBLE), 6) AS rms
        |FROM documents""".stripMargin,

    // halved dims via integer division (src dims are >= 8 so the max(1, .)
    // guard in resizeImages never fires); solid fill -> means unchanged
    "q84_image_resize" ->
      """SELECT doc_id AS media_id,
        |       CAST((n_chars % 48 + 8) // 2 AS INT) AS width,
        |       CAST((n_chars % 32 + 8) // 2 AS INT) AS height,
        |       CAST(doc_id % 256 AS DOUBLE) AS mean_r,
        |       CAST(doc_id * 7 % 256 AS DOUBLE) AS mean_g,
        |       CAST(doc_id * 13 % 256 AS DOUBLE) AS mean_b
        |FROM documents""".stripMargin)
}
