package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Exact-value coverage for the multimodal plumbing (the parts the driver's
  * rows-only check cannot see).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf = Seq(
    (1L, "image", "aaaabbbb".getBytes("UTF-8")),
    (2L, "video", ("x" * 70).getBytes("UTF-8")),
    (3L, "audio", Array.emptyByteArray)
  ).toDF("media_id", "kind", "content")
    .withColumn("meta", struct(lit("fake").as("format"),
      lit(100).as("width"), lit(50).as("height"),
      lit(16000).as("sample_rate"), lit(1000L).as("duration_ms")))

  test("extractFeatures: histogram sums to 1, exact bins, empty-safe") {
    val f = Multimodal.extractFeatures(mediaDf)
      .select("media_id", "features").as[(Long, Seq[Float])]
      .collect().toMap
    // 'a'=97 -> bin 6, 'b'=98 -> bin 6 : all 8 bytes in bin 6
    assert(f(1L)(6) == 1.0f && f(1L).sum == 1.0f)
    // 'x'=120 -> bin 7
    assert(f(2L)(7) == 1.0f)
    // empty content -> all-zero vector, no crash
    assert(f(3L).forall(_ == 0.0f))
    assert(f.values.forall(_.length == 16))
  }

  test("resize rewrites meta geometry and shrinks content") {
    val r = Multimodal.resize(mediaDf, 0.5)
      .select(col("media_id"), length(col("content")),
        col("meta.width"), col("meta.height"))
      .as[(Long, Int, Int, Int)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 2, 50, 25)))   // undecodable image bytes: stub
    assert(r(2L) == ((2L, 17, 50, 25)))  // 70 * 0.25 = 17
    assert(r(3L)._2 == 0)                // empty content stays empty

    // a DECODABLE image resamples for real: content re-decodes to halved
    // dims with the fill intact (not a truncated byte prefix)
    val png = Seq((9L, "image", Multimodal.encodePng(8, 6, 0x112233)))
      .toDF("media_id", "kind", "content")
      .withColumn("meta", struct(lit("png").as("format"), lit(8).as("width"),
        lit(6).as("height"), lit(0).as("sample_rate"), lit(0L).as("duration_ms")))
    val out = Multimodal.resize(png, 0.5)
      .select("content").as[Array[Byte]].head()
    val Some((w, h, mr, mg, mb)) = Multimodal.decodeImageMeta(out)
    assert((w, h) == ((4, 3)), s"real resample dims: ${w}x$h")
    assert((mr, mg, mb) == ((0x11.toDouble, 0x22.toDouble, 0x33.toDouble)))
  }

  test("real image decode: PNG roundtrip recovers dims and exact fill") {
    // encode side: 5x3 solid orange (0xFF8000); decode side must read the
    // REAL pixels back — a histogram stub cannot produce these values
    val png = Multimodal.encodePng(5, 3, 0xFF8000)
    assert(png.length > 8 &&
      (png.take(8).map(_ & 0xFF).toSeq == Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)),
      "not a PNG signature")
    assert(Multimodal.decodeImageMeta(png).contains((5, 3, 255.0, 128.0, 0.0)))
    // non-image bytes refuse politely
    assert(Multimodal.decodeImageMeta("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImageMeta(Array.emptyByteArray).isEmpty)
  }

  test("extractFeatures: image/audio kinds take the real decoders, video the stub") {
    val png = Multimodal.encodePng(4, 2, 0x406080)
    val wav = Multimodal.encodeWavPcm16(12, 16000, 1024)
    val df = Seq(
      (10L, "image", png),              // real image decode
      (11L, "audio", wav),              // real WAV decode
      (12L, "image", "junk".getBytes),  // undecodable image: stub fallback
      (13L, "audio", png),              // non-WAV audio bytes: stub fallback
      (14L, "video", wav)               // video kind: always the stub
    ).toDF("media_id", "kind", "content")
    val f = Multimodal.extractFeatures(df)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(f(10L).take(5) == Seq(4f, 2f, (0x40 / 255.0).toFloat,
      (0x60 / 255.0).toFloat, (0x80 / 255.0).toFloat), s"got ${f(10L)}")
    assert(f(10L).drop(5).forall(_ == 0f))
    assert(f(11L).take(4) == Seq(16000f, 1f, 12f, (1024 / 32768.0).toFloat),
      s"got ${f(11L)}")
    assert(f(12L).sum == 1.0f)                    // fallback histogram
    // histogram (sum ~1 within float rounding), not audio/dim features
    assert(math.abs(f(13L).sum - 1.0f) <= 1e-5f && f(13L)(0) != 16000f)
    assert(math.abs(f(14L).sum - 1.0f) <= 1e-5f && f(14L)(0) != 16000f)
    assert(f.values.forall(_.length == 16))
  }

  test("decodeImages skips undecodable rows, keeps real ones") {
    val df = Seq(
      (1L, Multimodal.encodePng(7, 7, 0x010203)),
      (2L, "garbage".getBytes)
    ).toDF("media_id", "content")
    val out = Multimodal.decodeImages(df)
      .as[(Long, Int, Int, Double, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 7, 7, 1.0, 2.0, 3.0)), s"got $out")
  }

  test("resizeImagePng maps pixels by the exact NN integer map") {
    // non-uniform 2x2 quadrant image: a correct resampler must place each
    // source pixel, not just preserve aggregate stats
    val src = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    src.setRGB(0, 0, 0xFF0000); src.setRGB(1, 0, 0x00FF00)
    src.setRGB(0, 1, 0x0000FF); src.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val bytes = bos.toByteArray

    // upscale 2x2 -> 4x4: sx = x*2/4 = x/2, so quadrants replicate 2x2
    val up = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.resizeImagePng(bytes, 4, 4).get))
    assert((up.getRGB(0, 0) & 0xFFFFFF) == 0xFF0000)
    assert((up.getRGB(1, 1) & 0xFFFFFF) == 0xFF0000) // still top-left quadrant
    assert((up.getRGB(3, 0) & 0xFFFFFF) == 0x00FF00)
    assert((up.getRGB(0, 3) & 0xFFFFFF) == 0x0000FF)
    assert((up.getRGB(3, 3) & 0xFFFFFF) == 0xFFFFFF)

    // downscale 2x2 -> 1x1: sx = 0, sy = 0 -> exactly the top-left pixel
    val down = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.resizeImagePng(bytes, 1, 1).get))
    assert((down.getRGB(0, 0) & 0xFFFFFF) == 0xFF0000)

    // garbage bytes -> None (skip, not crash)
    assert(Multimodal.resizeImagePng("junk".getBytes, 2, 2).isEmpty)
  }

  test("wav roundtrip: square wave decodes to exact rate/frames/rms") {
    val bytes = Multimodal.encodeWavPcm16(10, 8000, 300)
    val Some((rate, ch, n, rms)) = Multimodal.decodeWavMeta(bytes)
    assert((rate, ch, n) == ((8000, 1, 10L)))
    assert(rms == 300.0, s"square wave rms must be exactly amp, got $rms")
    // garbage -> None (skip, not crash)
    assert(Multimodal.decodeWavMeta("not audio".getBytes).isEmpty)
  }

  test("sampleFrames: only video, stride windows, last frame short") {
    val frames = Multimodal.sampleFrames(mediaDf, 32, 2)
      .select(col("media_id"), col("frame_idx"), length(col("frame")))
      .as[(Long, Int, Int)].collect().sortBy(_._2)
    // 70 bytes -> windows [32,32,6], stride 2 keeps idx 0 and 2
    assert(frames.toSeq == Seq((2L, 0, 32), (2L, 2, 6)))
  }

  test("extractFeatures: GIF-payload video rows take the real frame decoder") {
    val gif = Multimodal.encodeGifAnimation(6, 4,
      Seq(0x000000, 0xFFFFFF, 0x000000)) // luma 0, 1, 0
    val rows = Seq(
      (1L, "video", gif),
      (2L, "video", "not a container".getBytes)) // falls back to the stub
      .toDF("media_id", "kind", "content")
    val feats = Multimodal.extractFeatures(rows)
      .as[(Long, Seq[Float])].collect().toMap
    val real = feats(1L)
    assert(real.take(3) == Seq(3f, 6f, 4f), s"n_frames/dims wrong: $real")
    assert(real(3) == 0f && real(5) == 0f, "first/last frame luma must be 0")
    assert(real(4) > 0.99f, "middle frame luma must be ~1")
    assert(feats(2L) != real && feats(2L).size == 16,
      "non-GIF video keeps the 16-dim stub contract")
  }

  test("animated GIF roundtrip: frame count, order, and exact fills") {
    val colors = Seq(0xFF0000, 0x00FF00, 0x0000FF, 0x102030)
    val bytes = Multimodal.encodeGifAnimation(9, 5, colors)
    val frames = Multimodal.decodeGifFrames(bytes)
    assert(frames.size == 4, s"expected 4 frames, got ${frames.size}")
    frames.zip(colors).foreach { case ((i, w, h, mr, mg, mb), rgb) =>
      assert((w, h) == ((9, 5)))
      assert((mr, mg, mb) ==
        (((rgb >> 16) & 0xFF).toDouble, ((rgb >> 8) & 0xFF).toDouble,
          (rgb & 0xFF).toDouble),
        s"frame $i fill drifted: got ($mr,$mg,$mb) for ${rgb.toHexString}")
    }
    assert(frames.map(_._1) == (0 until 4), "frame order must be encode order")
    // garbage -> empty (skip, not crash)
    assert(Multimodal.decodeGifFrames("not a gif".getBytes).isEmpty)
  }
}
