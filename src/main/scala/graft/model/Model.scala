package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core entity model of the graft ingestion engine.
  *
  * Mirrors the reference's data model (see
  * `/root/reference/src/controllers/ingestController.js:21-27` and
  * `/root/reference/src/services/ingestService.js:174-186`) re-expressed as
  * typed Spark rows: requests, batches, queue jobs, and processed records.
  * Ids are LongType because the reference allows ids up to 1e9+7
  * (`/root/reference/README.md:36`), which exceeds Int32.
  */
final case class IngestRequest(
    ingestion_id: String,
    ids: Seq[Long],
    priority: String,
    created_at: Timestamp)

final case class BatchRow(
    ingestion_id: String,
    batch_id: String,
    batch_idx: Int,
    ids: Seq[Long],
    status: String)

final case class QueueJob(
    ingestion_id: String,
    batch_id: String,
    priority: String,
    created_at: Timestamp)

final case class ProcessedRecord(id: Long, data: String)

object Status {
  val YetToStart = "yet_to_start"
  val Triggered  = "triggered"
  val Completed  = "completed"
  /** Undocumented 4th state, `/root/reference/src/services/ingestService.js:89`. */
  val Failed     = "failed"
  val All: Seq[String] = Seq(YetToStart, Triggered, Completed, Failed)
}

object Priority {
  val High   = "HIGH"
  val Medium = "MEDIUM"
  val Low    = "LOW"
  val Valid: Seq[String] = Seq(High, Medium, Low)

  /** Priority rank expression: HIGH(1) < MEDIUM(2) < LOW(3), lower runs
    * first — mirrors `priorityMap` at
    * `/root/reference/src/utils/priorityQueue.js:7`. Unknown values sink to
    * the bottom (rank 4) rather than erroring, matching filter-at-the-edge
    * semantics. Pure `when` chain → whole-stage codegen, no UDF.
    */
  def rank(priority: Column): Column =
    when(upper(priority) === High, 1)
      .when(upper(priority) === Medium, 2)
      .when(upper(priority) === Low, 3)
      .otherwise(4)
}

object Schemas {
  val ingestRequest: StructType = StructType(Seq(
    StructField("ingestion_id", StringType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("priority", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)))

  val batch: StructType = StructType(Seq(
    StructField("ingestion_id", StringType, nullable = false),
    StructField("batch_id", StringType, nullable = false),
    StructField("batch_idx", IntegerType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("status", StringType, nullable = false)))
}
