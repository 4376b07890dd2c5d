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

  /** [[fromKafkaValue]] plus the broker-metadata columns of the FULL kafka
    * row shape (key, value, topic, partition, offset, timestamp,
    * timestampType, headers — what `format("kafka")` emits with
    * `includeHeaders=true`):
    * - `created_at` falls back to the broker `timestamp` when the payload
    *   carries none — the standard event-time fallback (log-append time
    *   is the only time a malformed/legacy producer leaves you);
    * - `kafka_timestamp` passes through for latency accounting
    *   (broker-landing vs payload event time);
    * - `kafka_headers` decodes the header array's binary values to UTF-8
    *   strings, KEEPING array<struct<key,value>> form: Kafka allows
    *   duplicate header keys, so a map would either throw
    *   (map_from_entries on duplicates) or silently drop records.
    * All row-local expressions — the adapter adds zero shuffle.
    */
  def fromKafkaValueWithMeta(kafka: DataFrame): DataFrame = {
    val parsed = from_json(col("value").cast("string"), Schemas.ingestRequest)
    kafka.select(
      coalesce(parsed.getField("ingestion_id"),
        concat_ws(":", lit("kafka"), col("topic"), col("partition"),
          col("offset"))).as("ingestion_id"),
      parsed.getField("ids").as("ids"),
      parsed.getField("priority").as("priority"),
      coalesce(parsed.getField("created_at"), col("timestamp")).as("created_at"),
      col("timestamp").as("kafka_timestamp"),
      transform(col("headers"), h => struct(
        h.getField("key").as("key"),
        h.getField("value").cast("string").as("value"))).as("kafka_headers"))
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
