package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Kafka-wire adapter: parse the `value` JSON bytes of Kafka-shaped rows
    * (the wire schema: `value BINARY` + `topic`/`partition`/`offset`) into
    * request rows `(ingestion_id, ids, priority, created_at)`.
    *
    * Failure containment: `from_json` yields a null struct for an
    * unparseable payload — instead of crashing the stream, such rows get a
    * deterministic dead-letter id `kafka:<topic>:<partition>:<offset>` and
    * null ids, which the O2 validation filter routes to the rejected
    * side-output with full wire-position traceability (the Kafka analogue of
    * the reference's 400 path). Works identically on a real
    * `format("kafka")` stream, a MemoryStream in tests, or a batch replay of
    * archived wire rows.
    */
  def fromKafkaValue(kafka: DataFrame): DataFrame = {
    val parsed = from_json(col("value").cast("string"), Schemas.ingestRequest)
    kafka.select(
      coalesce(parsed.getField("ingestion_id"),
        concat_ws(":", lit("kafka"), col("topic"), col("partition"),
          col("offset"))).as("ingestion_id"),
      parsed.getField("ids").as("ids"),
      parsed.getField("priority").as("priority"),
      parsed.getField("created_at").as("created_at"))
  }

  /** Live Kafka source (BASELINE.json's "REST/Kafka source" shape): the API
    * gateway lands POST bodies on a topic; this subscribes and adapts. The
    * spark-sql-kafka connector is a deploy-time dependency (`--packages
    * org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>`) — not in
    * this container, so the adapter (`fromKafkaValue`) carries the tested
    * logic and this stays a thin wiring function. maxOffsetsPerTrigger
    * bounds micro-batch size at scale, same role as maxFilesPerTrigger.
    */
  def kafkaStream(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Long = 100000): DataFrame =
    fromKafkaValue(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load())
}
