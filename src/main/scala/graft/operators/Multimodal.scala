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

  // ------------------------------------------------------------------ STUBS
  // A real build links an image/audio codec here. The fakes are
  // deterministic functions of the bytes so tests and oracles are stable.

  /** STUB decoder: real impl would decode image bytes to pixels. The fake
    * "decodes" to a 16-bin byte histogram normalized to [0,1]. */
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
    * mapPartitions + grouped(DecodeBatchSize) gives the codec a batch of
    * payloads per call (the real-world shape for GPU/native decoders).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val rdd = media.select(col("media_id"), col("content")).rdd
      .mapPartitions { rows =>
        rows.grouped(DecodeBatchSize).flatMap { batch =>
          // one codec invocation per batch in a real implementation
          batch.map { r =>
            Row(r.getLong(0), decodeToFeaturesStub(r.getAs[Array[Byte]](1)).toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize stage: content + meta rewritten, schema preserved. */
  def resize(media: DataFrame, scale: Double): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("kind"), col("content"), col("meta"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val meta = r.getStruct(3)
          val newMeta =
            if (meta == null) null
            else Row(meta.get(0),
              Option(meta.get(1)).map(w => (w.asInstanceOf[Int] * scale).toInt).orNull,
              Option(meta.get(2)).map(h => (h.asInstanceOf[Int] * scale).toInt).orNull,
              meta.get(3), meta.get(4))
          Row(r.getLong(0), r.getString(1),
            resizeStub(r.getAs[Array[Byte]](2), scale * scale), newMeta)
        }
      }
    spark.createDataFrame(rdd, MediaSchema)
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
