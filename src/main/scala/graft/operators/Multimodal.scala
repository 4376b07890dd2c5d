package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing here is REAL and tested — schema contract,
  * partition-parallel batched processing (`mapPartitions` over fixed-size
  * row groups, the JVM analogue of `mapInPandas` batch shape), deterministic
  * output — while the actual codec calls are STUBBED with deterministic
  * byte-level fakes (no image/audio libraries exist in this container). Each
  * stub is a single marked function; swapping in a real decoder changes no
  * pipeline shape, schema, or partitioning.
  *
  * Scale: binary payloads never shuffle in these stages — every stage is
  * row-local mapPartitions, so 100 TB of media partitions flow through
  * executors untouched by exchanges. Only extracted (small) features should
  * ever be joined/aggregated downstream.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("content", BinaryType),
    StructField("meta", MetaType)))

  /** Rows processed per decode call — the `mapInPandas`-style batch size:
    * large enough to amortize per-batch codec setup, small enough to bound
    * executor memory for big payloads. */
  val DecodeBatchSize = 64

  /** The one batched codec-stage shape every decode/encode/resize stage
    * shares: project the needed columns, mapPartitions, hand the codec
    * `DecodeBatchSize` rows at a time (one codec invocation per batch in a
    * real implementation), 0-or-more output rows per input row. Binaries
    * never shuffle — the stage is purely row-local.
    */
  private def batchedStage(df: DataFrame, inCols: Seq[String],
      outSchema: StructType)(f: Row => IterableOnce[Row]): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(inCols.map(col): _*).rdd.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap(_.flatMap(f))
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ------------------------------------------------------- REAL image codec
  // The image kind uses the JDK's javax.imageio (PNG/JPEG/BMP/GIF — no
  // external deps). Audio/video remain stubbed: no codec libraries exist in
  // this container.

  /** REAL image decode: bytes → (width, height, mean R/G/B over all
    * pixels). None when the payload is not a decodable image — callers fall
    * back rather than crash, so a corrupt blob in 100 TB of media is a
    * skipped row, not a dead stage.
    */
  def decodeImageMeta(content: Array[Byte]): Option[(Int, Int, Double, Double, Double)] = {
    if (content == null || content.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val (mr, mg, mb) = meanRgb(img)
        Some((img.getWidth, img.getHeight, mr, mg, mb))
      }
      // NonFatal, not just IOException: imageio readers throw unchecked
      // exceptions (AIOOBE, NegativeArraySize, IllegalArgument) on corrupt
      // containers — any of them must mean "skipped row", not a dead stage
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL PNG encode: a width×height image uniformly filled with `rgb`
    * (0xRRGGBB). PNG is lossless, so decodeImageMeta roundtrips exactly —
    * the basis of the oracle-checked q61 codec proof. */
  def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(solidImage(width, height, rgb), "png", out)
    out.toByteArray
  }

  /** REAL nearest-neighbor image resize: decode (ImageIO), resample with an
    * explicit integer source-index map (sx = x·srcW/dstW), re-encode PNG
    * (lossless). Deliberately NOT Graphics2D/AffineTransform — the AWT
    * rendering pipeline's interpolation is platform-dependent, while the
    * manual integer map is deterministic everywhere (the property every
    * oracle in this repo depends on). None on non-decodable payloads,
    * mirroring decodeImageMeta's skip-not-crash contract.
    */
  private def resampleToPng(img: java.awt.image.BufferedImage,
      dstW: Int, dstH: Int): Array[Byte] = {
    val out = new java.awt.image.BufferedImage(
      dstW, dstH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * img.getHeight / dstH).toInt
      var x = 0
      while (x < dstW) {
        val sx = (x.toLong * img.getWidth / dstW).toInt
        out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Decode→resample→encode core shared by every resize path — one
    * decode, target dims a function of the decoded frame, absent or
    * undecodable content → None. The per-path dims formulas stay at the
    * call sites; the guard/decode/catch plumbing lives once here.
    */
  private def resampleWith(content: Array[Byte])(
      dims: java.awt.image.BufferedImage => (Int, Int)): Option[Array[Byte]] = {
    if (content == null || content.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else { val (w, h) = dims(img); Some(resampleToPng(img, w, h)) }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def resizeImagePng(content: Array[Byte], dstW: Int, dstH: Int): Option[Array[Byte]] = {
    require(dstW > 0 && dstH > 0, s"bad target ${dstW}x$dstH")
    resampleWith(content)(_ => (dstW, dstH))
  }

  /** Ratio resize with ONE decode: target dims come from the already-
    * decoded image (no separate decodeImageMeta pass, whose mean scan
    * would be discarded anyway). */
  private def resizeImageByRatio(content: Array[Byte], num: Int,
      den: Int): Option[Array[Byte]] =
    resampleWith(content)(img => (
      math.max(1, (img.getWidth.toLong * num / den).toInt),
      math.max(1, (img.getHeight.toLong * num / den).toInt)))

  /** Batched REAL resize for image payloads: each image is rescaled to
    * (max(1, w·num/den), max(1, h·num/den)) of its own decoded dimensions —
    * one decode per row. Same mapPartitions/batch shape as decodeImages;
    * non-decodable rows are skipped. Binaries stay row-local — nothing
    * shuffles.
    */
  def resizeImages(media: DataFrame, num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0, s"bad ratio $num/$den")
    batchedStage(media, Seq("media_id", "content"), StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType)))) { r =>
      resizeImageByRatio(r.getAs[Array[Byte]](1), num, den)
        .map(bytes => Row(r.getLong(0), bytes))
    }
  }

  // ------------------------------------------------------- REAL audio codec
  // WAV/PCM via the JDK's javax.sound.sampled — like imageio, no external
  // deps, and header parsing needs no audio device (headless-safe).

  /** REAL WAV decode: bytes → (sample rate, channels, frame count, RMS
    * amplitude). 16-bit little-endian PCM payload; RMS accumulates the
    * SQUARED samples as exact Longs (≤ 2^53 for any realistic clip), so
    * the final sqrt is the only float op — deterministic everywhere. None
    * for undecodable payloads (skip-not-crash, as decodeImageMeta).
    */
  def decodeWavMeta(content: Array[Byte]): Option[(Int, Int, Long, Double)] = {
    if (content == null || content.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
      else {
        val bytes = ais.readAllBytes()
        val frameBytes = 2 * fmt.getChannels
        val n = bytes.length / frameBytes
        var sumSq = 0L
        var i = 0
        while (i + 1 < bytes.length) {
          val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xFF)).toShort.toLong
          sumSq += s * s
          i += 2
        }
        val samples = bytes.length / 2
        val rms = if (samples == 0) 0.0
          else math.sqrt(sumSq.toDouble / samples)
        Some((fmt.getSampleRate.toInt, fmt.getChannels, n.toLong, rms))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL WAV encode: mono 16-bit PCM square wave alternating ±amplitude —
    * RMS is exactly |amplitude|, the arithmetic the q85 oracle recomputes.
    */
  def encodeWavPcm16(nSamples: Int, sampleRate: Int, amplitude: Short): Array[Byte] = {
    require(nSamples > 0 && sampleRate > 0,
      s"bad wav spec: $nSamples samples at $sampleRate Hz")
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v: Int = if (i % 2 == 0) amplitude else -amplitude
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic WAV synthesis: (media_id, n_samples, sample_rate, amp) →
    * (media_id, content BINARY) — the encode side of the q85 roundtrip. */
  def synthesizeWav(spec: DataFrame): DataFrame =
    batchedStage(spec, Seq("media_id", "n_samples", "sample_rate", "amp"),
      StructType(Seq(
        StructField("media_id", LongType),
        StructField("content", BinaryType)))) { r =>
      Some(Row(r.getLong(0),
        encodeWavPcm16(r.getInt(1), r.getInt(2), r.getInt(3).toShort)))
    }

  /** Real-decode stage for audio rows: (media_id, sample_rate, channels,
    * n_frames, rms). Undecodable rows skipped. */
  def decodeAudio(media: DataFrame): DataFrame =
    batchedStage(media, Seq("media_id", "content"), StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_frames", LongType),
      StructField("rms", DoubleType)))) { r =>
      decodeWavMeta(r.getAs[Array[Byte]](1)).map {
        case (rate, ch, n, rms) => Row(r.getLong(0), rate, ch, n, rms)
      }
    }

  // ------------------------------------------------------------------ STUBS
  // A real build links a video codec here (no container demux in the JDK).
  // The fakes are deterministic functions of the bytes so tests and
  // oracles are stable.

  /** STUB decoder (video, and the fallback for non-decodable image/audio
    * bytes): "decodes" to a 16-bin byte histogram normalized to [0,1]. */
  private[operators] def decodeToFeaturesStub(content: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (content != null && content.nonEmpty) {
      content.foreach(b => hist((b & 0xFF) / 16) += 1f)
      val n = content.length.toFloat
      var i = 0
      while (i < 16) { hist(i) /= n; i += 1 }
    }
    hist
  }

  /** STUB resize: real impl re-encodes pixels; the fake truncates bytes
    * proportionally and rewrites meta — preserving the contract that
    * output meta reflects the new geometry. */
  private[operators] def resizeStub(content: Array[Byte], scale: Double): Array[Byte] =
    if (content == null) Array.emptyByteArray
    else content.take(math.max(1, (content.length * scale).toInt))

  // ------------------------------------------------------------ the stages

  /** Batched decode/feature-extract: binary → ARRAY<FLOAT> feature vector.
    * 16 dims for every kind so the schema contract is kind-independent.
    *
    * Image rows decode for REAL (javax.imageio): [w, h, meanR/255,
    * meanG/255, meanB/255, 0...]. Audio rows decode for REAL
    * (javax.sound.sampled): [rate, channels, frames, rms/32768, 0...].
    * Video rows try the REAL multi-frame GIF decoder first
    * ([n_frames, w, h, first/mid/last-frame mean luma/255, 0...]);
    * non-GIF containers and undecodable payloads take the histogram stub.
    */
  def extractFeatures(media: DataFrame): DataFrame =
    batchedStage(media, Seq("media_id", "kind", "content"), StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))) { r =>
      val content = r.getAs[Array[Byte]](2)
      val feats = r.getString(1) match {
        case "image" => decodeImageMeta(content).map {
          case (w, h, mr, mg, mb) =>
            Array[Float](w.toFloat, h.toFloat, (mr / 255.0).toFloat,
              (mg / 255.0).toFloat, (mb / 255.0).toFloat,
              0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
        }.getOrElse(decodeToFeaturesStub(content))
        case "audio" => decodeWavMeta(content).map {
          case (rate, ch, n, rms) =>
            Array[Float](rate.toFloat, ch.toFloat, n.toFloat,
              (rms / 32768.0).toFloat,
              0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
        }.getOrElse(decodeToFeaturesStub(content))
        case "video" => decodeGifSummary(content).map {
          case (n, w, h, l0, lMid, lLast) =>
            Array[Float](n.toFloat, w.toFloat, h.toFloat,
              (l0 / 255.0).toFloat, (lMid / 255.0).toFloat,
              (lLast / 255.0).toFloat,
              0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
        }.getOrElse(decodeToFeaturesStub(content))
        case _ => decodeToFeaturesStub(content)
      }
      Some(Row(r.getLong(0), feats.toSeq))
    }

  /** Real-decode stage: image rows → (media_id, width, height, mean R/G/B).
    * Non-decodable rows are skipped (logged downstream via count deltas).
    */
  def decodeImages(media: DataFrame): DataFrame =
    batchedStage(media, Seq("media_id", "content"), StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))) { r =>
      decodeImageMeta(r.getAs[Array[Byte]](1)).map {
        case (w, h, mr, mg, mb) => Row(r.getLong(0), w, h, mr, mg, mb)
      }
    }

  // --------------------------------------- REAL multi-frame (video-ish) codec
  // Animated GIF via javax.imageio's sequence writer/reader — the JDK's one
  // genuinely multi-frame container. This makes the frame-extraction path
  // REAL end-to-end (encode N frames → decode N frames → per-frame stats);
  // only true video containers (mp4 etc.) remain stubbed, since the JDK has
  // no demuxer for them.

  /** One x/y pixel scan shared by every decoder in this file. */
  private def meanRgb(img: java.awt.image.BufferedImage): (Double, Double, Double) = {
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** One solid-fill constructor shared by every encoder in this file. */
  private def solidImage(width: Int, height: Int,
      rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    img
  }

  /** Cheap container sniff: GIF87a/GIF89a magic. Lets hot paths skip the
    * reader + disk-cache stream setup for payloads that cannot be GIFs. */
  def looksLikeGif(content: Array[Byte]): Boolean =
    content != null && content.length >= 6 &&
      content(0) == 'G' && content(1) == 'I' && content(2) == 'F' &&
      content(3) == '8' &&
      (content(4) == '7' || content(4) == '9') && content(5) == 'a'

  /** REAL animated-GIF encode: one solid-fill frame per color in
    * `frameColors` (0xRRGGBB each). Solid fills are exact under GIF's
    * 256-color palette (one color per frame), so the decode side
    * roundtrips losslessly — the basis of the q107 multi-frame proof.
    */
  def encodeGifAnimation(width: Int, height: Int,
      frameColors: Seq[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(frameColors.nonEmpty, "need at least one frame")
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frameColors.foreach { rgb =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(solidImage(width, height, rgb), null, null),
          null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** REAL multi-frame decode: GIF bytes → one entry per frame
    * (frame_idx, width, height, mean R/G/B). Empty on non-decodable
    * payloads — skip-not-crash, like every codec here.
    */
  def decodeGifFrames(content: Array[Byte]): Seq[(Int, Int, Int, Double, Double, Double)] = {
    if (!looksLikeGif(content)) return Nil
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      (0 until n).map { i =>
        val img = reader.read(i)
        val (mr, mg, mb) = meanRgb(img)
        (i, img.getWidth, img.getHeight, mr, mg, mb)
      }
    } catch { case scala.util.control.NonFatal(_) => Nil }
    finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Summary decode for the feature path: frame count plus stats of ONLY
    * the first/middle/last frames — a 200-frame GIF costs 3 pixel scans
    * here, not 200. None when the payload is not a GIF.
    */
  def decodeGifSummary(content: Array[Byte])
      : Option[(Int, Int, Int, Double, Double, Double)] = {
    if (!looksLikeGif(content)) return None
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      if (n <= 0) None
      else {
        def luma(i: Int): Double = {
          val (mr, mg, mb) = meanRgb(reader.read(i))
          0.299 * mr + 0.587 * mg + 0.114 * mb
        }
        val first = reader.read(0)
        val (fr, fg, fb) = meanRgb(first)
        val l0 = 0.299 * fr + 0.587 * fg + 0.114 * fb
        Some((n, first.getWidth, first.getHeight,
          l0, if (n / 2 == 0) l0 else luma(n / 2),
          if (n - 1 == 0) l0 else luma(n - 1)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Deterministic animated-GIF synthesis stage:
    * (media_id, width, height, n_frames, base_rgb) → (media_id, content).
    * Frame i's color channels are (base_r+29i, base_g+31i, base_b+37i)
    * mod 256 — arithmetic the oracle reproduces without a codec.
    */
  def synthesizeGif(spec: DataFrame): DataFrame =
    batchedStage(spec, Seq("media_id", "width", "height", "n_frames", "base_rgb"),
      StructType(Seq(
        StructField("media_id", LongType),
        StructField("content", BinaryType)))) { r =>
      val base = r.getInt(4)
      val colors = (0 until r.getInt(3)).map { i =>
        val cr = (((base >> 16) & 0xFF) + 29 * i) % 256
        val cg = (((base >> 8) & 0xFF) + 31 * i) % 256
        val cb = ((base & 0xFF) + 37 * i) % 256
        (cr << 16) | (cg << 8) | cb
      }
      Some(Row(r.getLong(0),
        encodeGifAnimation(r.getInt(1), r.getInt(2), colors)))
    }

  /** Batched REAL frame extraction: every GIF frame becomes one output row
    * with its index, dims, and channel means. Exploded output — the
    * multi-frame analogue of decodeImages; binaries stay row-local.
    */
  def decodeFrames(media: DataFrame): DataFrame =
    batchedStage(media, Seq("media_id", "content"), StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))) { r =>
      decodeGifFrames(r.getAs[Array[Byte]](1)).map {
        case (i, w, h, mr, mg, mb) => Row(r.getLong(0), i, w, h, mr, mg, mb)
      }
    }

  /** Deterministic PNG synthesis: (media_id, width, height, rgb) →
    * (media_id, content BINARY). The encode side of the q61 roundtrip proof;
    * also how tests materialize real image bytes without fixture files.
    */
  def synthesizePng(spec: DataFrame): DataFrame =
    batchedStage(spec, Seq("media_id", "width", "height", "rgb"),
      StructType(Seq(
        StructField("media_id", LongType),
        StructField("content", BinaryType)))) { r =>
      Some(Row(r.getLong(0), encodePng(r.getInt(1), r.getInt(2), r.getInt(3))))
    }

  /** Resize stage: content + meta rewritten, schema preserved. */
  /** Decodable image content resamples for REAL (one decode, dims from the
    * decoded frame); everything else — audio/video kinds and undecodable
    * image bytes — keeps the stub truncation, so the stage stays total
    * over any media mix. */
  private def resizeContent(kind: String, content: Array[Byte],
      scale: Double): Array[Byte] = {
    val real =
      if (kind != "image") None
      else resampleWith(content)(img => (
        math.max(1, (img.getWidth * scale).toInt),
        math.max(1, (img.getHeight * scale).toInt)))
    real.getOrElse(resizeStub(content, scale * scale))
  }

  def resize(media: DataFrame, scale: Double): DataFrame =
    batchedStage(media, Seq("media_id", "kind", "content", "meta"),
      MediaSchema) { r =>
      val meta = r.getStruct(3)
      // the same max(1, ...) clamp the content resample applies: a tiny
      // positive dim must not round meta to 0x0 while the payload is a
      // 1x1 PNG (a zero/absent source dim stays as computed — the clamp
      // is for shrinking real geometry, not for inventing it)
      def dim(i: Int): Any = Option(meta.get(i)).map { v =>
        val d = v.asInstanceOf[Int]
        if (d > 0) math.max(1, (d * scale).toInt) else (d * scale).toInt
      }.orNull
      val newMeta =
        if (meta == null) null
        else Row(meta.get(0), dim(1), dim(2), meta.get(3), meta.get(4))
      Some(Row(r.getLong(0), r.getString(1),
        resizeContent(r.getString(1), r.getAs[Array[Byte]](2), scale), newMeta))
    }

  /** Frame sampling for video-kind rows: every `stride`-th fixed-size byte
    * window becomes one frame row (real impl: container demux + keyframe
    * select). Output is exploded — one row per sampled frame.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val rdd = media.filter(col("kind") === "video")
      .select(col("media_id"), col("content")).rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          if (bytes == null) Iterator.empty
          else bytes.grouped(frameBytes).zipWithIndex
            .filter(_._2 % stride == 0)
            .map { case (frame, i) => Row(r.getLong(0), i, frame) }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }
}
