package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Schemas

/** Streaming request sources for the ingest pipeline. The reference's only
  * source is its HTTP endpoint (out-of-engine per BASELINE.json — "API layer
  * is external"); in-engine, requests arrive as a stream from whatever the
  * API gateway lands them on: files dropped in a directory (this), a Kafka
  * topic (same shape — swap format("kafka") + from_json), or MemoryStream
  * in tests. Schema is enforced at the source so malformed rows surface as
  * nulls for the O2 validation filter rather than crashing the stream.
  */
object RequestSource {

  /** File-drop source: each JSON line is {ingestion_id, ids, priority,
    * created_at}. maxFilesPerTrigger keeps micro-batches bounded at scale.
    */
  def jsonFileStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(Schemas.ingestRequest)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Batch replay of the same file layout (backfill path). */
  def jsonBatch(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(Schemas.ingestRequest).json(dir)
}
