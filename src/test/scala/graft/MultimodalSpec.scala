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
    assert(r(1L) == ((1L, 2, 50, 25)))   // 8 bytes * 0.25 = 2
    assert(r(2L) == ((2L, 17, 50, 25)))  // 70 * 0.25 = 17
    assert(r(3L)._2 == 0)                // empty content stays empty
  }

  test("sampleFrames: only video, stride windows, last frame short") {
    val frames = Multimodal.sampleFrames(mediaDf, 32, 2)
      .select(col("media_id"), col("frame_idx"), length(col("frame")))
      .as[(Long, Int, Int)].collect().sortBy(_._2)
    // 70 bytes -> windows [32,32,6], stride 2 keeps idx 0 and 2
    assert(frames.toSeq == Seq((2L, 0, 32), (2L, 2, 6)))
  }
}
