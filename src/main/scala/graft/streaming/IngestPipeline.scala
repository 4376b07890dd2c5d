package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.model.Status
import graft.operators.IngestOps

/** The live ingestion pipeline — the reference's scheduler loop
  * (`/root/reference/src/services/ingestService.js:94-154`) re-expressed on
  * Structured Streaming.
  *
  * Semantics reproduced:
  *  - validation at the edge, invalid requests → rejected side-output (O2)
  *  - fixed-size batching of each request's ids (O5)
  *  - priority admission: per trigger, the top `admitPerTrigger` pending
  *    batches by (priority rank, created_at) — a later HIGH request
  *    overtakes queued LOW batches because the pending set is re-ranked
  *    EVERY trigger (O7/O8, the preemption the reference's heap provides)
  *  - rate limiting: trigger interval == the reference's RATE_LIMIT_MS;
  *    admission count per trigger == one batch (O10)
  *  - stale-skip: only batches still yet_to_start are admissible (O15)
  *  - status machine yet_to_start → triggered → completed/failed, with
  *    `triggered` persisted before enrichment so concurrent status reads
  *    observe it (O13/O14)
  *  - status rollup recomputed from batch state at read time (O17/O20)
  *
  * State lives in versioned parquet snapshots under `stateDir` with an
  * atomically-swapped pointer file — readers always see a complete
  * consistent version (the scale path swaps this for Delta/Iceberg tables;
  * the pipeline shape is identical). Commits are INCREMENTAL: tables are
  * hash-partitioned on their key, a trigger rewrites only partitions with
  * changed rows and hard-links the rest from the previous version —
  * per-trigger write cost is O(changed), not O(state). Every per-trigger step is a
  * distributed DataFrame op: union, anti-join, TakeOrderedAndProject,
  * mapPartitions enrichment — nothing collects per-row data to the driver.
  *
  * Empty triggers still fire (heartbeat union) so the queue keeps draining
  * after input pauses — the reference's `setTimeout` re-entry (O16).
  */
class IngestPipeline(
    spark: SparkSession,
    stateDir: String,
    batchSize: Int = 3,
    admitPerTrigger: Int = 1,
    fetch: Iterator[Long] => Iterator[(Long, String)] =
      ids => ids.map(id => (id, "processed"))) extends Serializable {

  import IngestPipeline._

  Files.createDirectories(Paths.get(stateDir))

  // ------------------------------------------------------------ state I/O

  private def versionPath(v: Long, table: String) = s"$stateDir/v$v/$table"

  private def pointerFile = Paths.get(s"$stateDir/CURRENT")

  /** CURRENT holds "version lastCommittedBatchId" — swapped atomically as
    * one file so version and replay watermark can never disagree.
    */
  private def readPointer: (Long, Long) =
    if (!Files.exists(pointerFile)) (-1L, -1L)
    else Files.readString(pointerFile).trim.split("\\s+") match {
      case Array(v) => (v.toLong, -1L)
      case Array(v, b, _*) => (v.toLong, b.toLong)
    }

  def currentVersion: Long = readPointer._1

  /** Highest micro-batch id whose effects are fully committed. */
  def lastCommittedBatchId: Long = readPointer._2

  private def writePointer(v: Long, batchId: Long): Unit = {
    val tmp = Paths.get(s"$stateDir/CURRENT.tmp")
    Files.writeString(tmp, s"$v $batchId")
    Files.move(tmp, pointerFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def readTable(v: Long, table: String, schema: StructType): DataFrame =
    if (v < 0 || !Files.exists(Paths.get(versionPath(v, table))))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else // select drops the `_part` layout column partition discovery adds
      spark.read.schema(schema).parquet(versionPath(v, table))
        .select(schema.fieldNames.toSeq.map(col): _*)

  /** Latest batch-state table (ingestion_id, batch_id, batch_idx, ids,
    * priority, created_at, status). */
  def batchState: DataFrame = readTable(currentVersion, "batches", BatchStateSchema)

  /** Latest request-state table. */
  def requestState: DataFrame = readTable(currentVersion, "requests", RequestStateSchema)

  /** Rejected side-output (cumulative). */
  def rejectedState: DataFrame = readTable(currentVersion, "rejected", RejectedSchema)

  /** Enriched output records (cumulative). */
  def processedState: DataFrame = readTable(currentVersion, "processed", ProcessedSchema)

  /** Hash-partition key for incremental state commits. */
  private def partOf(key: org.apache.spark.sql.Column) =
    pmod(xxhash64(key), lit(NumStateParts)).cast("int")

  /** One table's write instruction: which key column partitions it, and
    * which partitions this trigger changed (None = full rewrite, the
    * recovery/bootstrap path). */
  private case class TableWrite(df: DataFrame, keyCol: String,
      changed: Option[Set[Int]])

  /** Incremental state commit: each table is laid out as `_part=<hash(key)
    * mod NumStateParts>` partitions. Partitions containing changed rows are
    * rewritten by a Spark job; every other partition is HARD-LINKED from the
    * previous version — byte-identical, no data IO, O(parts) metadata ops.
    * Per-trigger write amplification is O(changed rows), not O(state): the
    * cumulative `processed` table, for example, writes only the ids enriched
    * THIS trigger. This is the local-FS analogue of a Delta/Iceberg MERGE
    * (new files for touched data, manifest reuse for the rest) — the
    * pipeline shape is what carries to the lakehouse deployment.
    */
  private def writeTable(prevV: Long, v: Long, name: String, tw: TableWrite): Unit = {
    val dest = versionPath(v, name)
    val withPart = tw.df.withColumn("_part", partOf(col(tw.keyCol)))
    val prevDir = new java.io.File(versionPath(prevV, name))
    // Hard-linking a previous partition is only sound if the previous
    // version was laid out with the SAME partition count — a deployment
    // that changes NumStateParts would otherwise silently mix old-layout
    // links with new-layout rewrites (duplicated/misplaced rows). The
    // count is recorded per version in a PARTS file; absent or different
    // ⇒ fall back to a full rewrite.
    val prevPartitioned = prevV >= 0 && readPartsMeta(prevV) == NumStateParts &&
      prevDir.isDirectory &&
      Option(prevDir.list()).exists(_.exists(_.startsWith("_part=")))
    tw.changed match {
      case Some(parts) if prevPartitioned =>
        if (parts.nonEmpty)
          withPart.filter(col("_part").isin(parts.toSeq: _*))
            .write.partitionBy("_part").mode("overwrite").parquet(dest)
        else Files.createDirectories(Paths.get(dest))
        (0 until NumStateParts).filterNot(parts).foreach { p =>
          val src = new java.io.File(versionPath(prevV, s"$name/_part=$p"))
          if (src.isDirectory) {
            val dst = Paths.get(s"$dest/_part=$p")
            Files.createDirectories(dst)
            src.listFiles().foreach { f =>
              if (f.isFile && !f.getName.startsWith(".") && f.getName != "_SUCCESS") {
                val target = dst.resolve(f.getName)
                try Files.createLink(target, f.toPath)
                catch { // cross-device or FS without links: plain copy
                  case _: UnsupportedOperationException | _: java.io.IOException =>
                    Files.copy(f.toPath, target, StandardCopyOption.REPLACE_EXISTING)
                }
              }
            }
          }
        }
      case _ =>
        withPart.write.partitionBy("_part").mode("overwrite").parquet(dest)
    }
  }

  /** Partition-count metadata for version `v` (-1 = unrecorded). */
  private def readPartsMeta(v: Long): Int = {
    val p = Paths.get(s"$stateDir/v$v/PARTS")
    if (Files.exists(p)) Files.readString(p).trim.toInt else -1
  }

  private def persist(prevV: Long, v: Long, batchId: Long,
      tables: Map[String, TableWrite]): Unit = {
    tables.foreach { case (name, tw) => writeTable(prevV, v, name, tw) }
    // record the layout BEFORE the pointer swap so a version is never
    // CURRENT without its partition-count metadata
    Files.createDirectories(Paths.get(s"$stateDir/v$v"))
    Files.writeString(Paths.get(s"$stateDir/v$v/PARTS"), NumStateParts.toString)
    writePointer(v, batchId)
  }

  // Crash recovery: `triggered` is transient within one trigger, so any
  // persisted triggered batch at construction time belongs to a trigger
  // that died mid-flight — demote it so the scheduler re-admits it
  // (the reference would leave it stuck; see SURVEY.md O13 note).
  locally {
    val (v, b) = readPointer
    if (v >= 0) {
      val batches = readTable(v, "batches", BatchStateSchema)
      if (!batches.filter(col("status") === Status.Triggered).isEmpty) {
        // recovery is rare: full rewrite (changed = None), no link bookkeeping
        persist(v, v + 1, b, Map(
          "batches" -> TableWrite(batches.withColumn("status",
            when(col("status") === Status.Triggered, Status.YetToStart)
              .otherwise(col("status"))), "batch_id", None),
          "requests" -> TableWrite(
            readTable(v, "requests", RequestStateSchema), "ingestion_id", None),
          "rejected" -> TableWrite(
            readTable(v, "rejected", RejectedSchema), "ingestion_id", None),
          "processed" -> TableWrite(
            readTable(v, "processed", ProcessedSchema), "id", None)))
      }
    }
  }

  // ------------------------------------------------------------ the trigger

  /** One scheduler tick. Public so tests (and batch replays) can drive the
    * exact per-trigger semantics without streaming machinery.
    */
  def processMicroBatch(microBatch: DataFrame, batchId: Long): Unit = {
    // Idempotent replay: Structured Streaming re-delivers the in-flight
    // micro-batch after a restart; a batch whose effects are already
    // committed must be a no-op or requests/admissions would double.
    if (batchId >= 0 && batchId <= lastCommittedBatchId) return
    val prevV = currentVersion
    val prevBatches = readTable(prevV, "batches", BatchStateSchema)
    val prevRequests = readTable(prevV, "requests", RequestStateSchema)
    val prevRejected = readTable(prevV, "rejected", RejectedSchema)
    val prevProcessed = readTable(prevV, "processed", ProcessedSchema)

    val tagged =
      if (microBatch.columns.contains("is_heartbeat")) microBatch
      else microBatch.withColumn("is_heartbeat", lit(false))
    val incoming = tagged
      .filter(col("is_heartbeat").isNull || !col("is_heartbeat"))
      .select(col("ingestion_id"), col("ids"), col("priority"), col("created_at"))

    // O2: validate; side-output rejects with reason.
    val newRejected = IngestOps.rejectedRequests(incoming)
      .select(col("ingestion_id"), col("error"))
    val valid = IngestOps.validRequests(incoming)

    // O5: batch explode with deterministic batch ids.
    val newBatches = IngestOps.explodeBatches(valid, batchSize)
      .select(col("ingestion_id"),
        md5(concat_ws("-", col("ingestion_id"), col("batch_idx"))).as("batch_id"),
        col("batch_idx"), col("ids"), col("priority"), col("created_at"),
        lit(Status.YetToStart).as("status"))
    val newRequests = valid.select(col("ingestion_id"), col("priority"),
      col("created_at"), size(col("ids")).cast("long").as("n_ids"))

    // First-wins merge (anti-join on the key, NOT a blind union): a crash
    // between the triggered persist and the final persist makes Structured
    // Streaming redeliver the same rows — and clients may resubmit an
    // ingestion_id — so already-known keys must keep their existing state.
    val batches = prevBatches.unionByName(
      newBatches.join(prevBatches.select("batch_id"), Seq("batch_id"), "left_anti"))
    val requests = prevRequests.unionByName(
      newRequests.join(prevRequests.select("ingestion_id"), Seq("ingestion_id"),
        "left_anti"))
    val rejected = prevRejected.unionByName(newRejected)
      .dropDuplicates("ingestion_id", "error")

    // O7/O8/O15: re-rank ALL still-pending batches, admit the top k.
    // Evaluated EXACTLY ONCE (k = admitPerTrigger = O(1) rows to the
    // driver); the admission set is then rebuilt as a literal DataFrame so
    // the marks, both persists, and the changed-part bookkeeping all see
    // the same admissions — no reliance on independent re-evaluations of
    // the sort agreeing, and no repeated execution of the admission DAG.
    val admittedRows = IngestOps.dequeue(
      batches.filter(col("status") === Status.YetToStart), admitPerTrigger,
      "priority", "created_at", col("ingestion_id"), col("batch_idx"))
      .select(col("batch_id"), partOf(col("batch_id")).as("_p"))
      .collect()
    val admittedKeys = admittedRows.map(_.getString(0))
    val admittedParts = admittedRows.map(_.getInt(1)).toSet
    val admitted = spark.createDataFrame(
      spark.sparkContext.parallelize(admittedKeys.toSeq.map(Row(_)), 1),
      StructType(Seq(StructField("batch_id", StringType))))
      .withColumn("_admit", lit(true))

    def mark(df: DataFrame, to: String): DataFrame =
      df.join(admitted, Seq("batch_id"), "left")
        .withColumn("status", when(col("_admit"), to).otherwise(col("status")))
        .drop("_admit")

    // O13: persist `triggered` BEFORE enrichment so concurrent readers see it.
    val v = batchId.max(prevV + 1)
    val triggeredBatches = mark(batches, Status.Triggered).cache()
    // Changed-partition sets for the incremental commit, ONE tiny tagged job
    // for the new-row tables (the admission marks' parts are already on the
    // driver). Supersets are fine (an untouched part rewritten is correct,
    // just wasted IO); missing a changed part would corrupt state — every
    // row source that can differ from the previous version is covered here.
    val changed: Map[String, Set[Int]] =
      newBatches.select(lit("batches").as("t"), partOf(col("batch_id")).as("p"))
        .union(newRequests.select(lit("requests"), partOf(col("ingestion_id"))))
        .union(newRejected.select(lit("rejected"), partOf(col("ingestion_id"))))
        .distinct().collect()
        .groupBy(_.getString(0)).map { case (t, rows) =>
          t -> rows.map(_.getInt(1)).toSet
        }.withDefaultValue(Set.empty)
    // triggered snapshot commits under the PREVIOUS batch id: if the
    // process dies before the final persist, the replay re-runs this batch
    // (and the constructor demotes the orphaned `triggered` rows).
    persist(prevV, v, lastCommittedBatchId, Map(
      "batches" -> TableWrite(triggeredBatches, "batch_id",
        Some(changed("batches") ++ admittedParts)),
      "requests" -> TableWrite(requests, "ingestion_id", Some(changed("requests"))),
      "rejected" -> TableWrite(rejected, "ingestion_id", Some(changed("rejected"))),
      "processed" -> TableWrite(prevProcessed, "id", Some(Set.empty))))

    // O11: enrichment of admitted ids (mapPartitions — connector-shaped).
    // One enrichment job PER BATCH so a single connector failure marks only
    // its own batch failed (the reference's semantics) instead of the whole
    // admission set; k = admitPerTrigger is O(1), so the driver loop is too.
    // Only NonFatal errors become `failed` — cancellation/OOM must escape so
    // crash recovery (not a terminal failed state) handles them.
    val results = admittedKeys.map { bid =>
      val ids = triggeredBatches.filter(col("batch_id") === bid)
        .select(explode(col("ids")).as("id"))
      try {
        val p = IngestOps.enrichWith(ids, "id")(fetch).cache()
        p.count() // force the fetches now
        bid -> Some(p)
      } catch {
        case scala.util.control.NonFatal(_) => bid -> None
      }
    }
    val newProcessed = results.flatMap(_._2) match {
      case ps if ps.nonEmpty => ps.reduce(_ unionByName _)
      case _ => spark.createDataFrame(spark.sparkContext.emptyRDD[Row], ProcessedSchema)
    }

    // O14: completed (or failed) per batch after its fetches.
    val statusRows = results.map { case (bid, r) =>
      (bid, if (r.isDefined) Status.Completed else Status.Failed)
    }.toSeq
    val endStatuses =
      if (statusRows.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("batch_id", StringType),
            StructField("_end", StringType))))
      else spark.createDataFrame(statusRows).toDF("batch_id", "_end")
    val finalBatches = triggeredBatches
      .join(endStatuses, Seq("batch_id"), "left")
      .withColumn("status", coalesce(col("_end"), col("status")))
      .drop("_end")
    // final-commit deltas: only admitted batches changed status (their
    // parts are already on the driver), and only this trigger's enriched
    // ids are new in `processed` (cached — one cheap distinct-parts select)
    val processedParts: Set[Int] =
      if (results.forall(_._2.isEmpty)) Set.empty
      else newProcessed.select(partOf(col("id")).as("p")).distinct()
        .collect().map(_.getInt(0)).toSet
    persist(v, v + StatusStep, batchId, Map(
      "batches" -> TableWrite(finalBatches, "batch_id", Some(admittedParts)),
      "requests" -> TableWrite(requests, "ingestion_id", Some(Set.empty)),
      "rejected" -> TableWrite(rejected, "ingestion_id", Some(Set.empty)),
      "processed" -> TableWrite(
        prevProcessed.unionByName(newProcessed.select(col("id"), col("data"))),
        "id", Some(processedParts))))
    triggeredBatches.unpersist()
    results.foreach(_._2.foreach(_.unpersist()))
    pruneVersions(keepFrom = v)
  }

  /** Delete snapshot versions more than `RetainedPairs` trigger-pairs old.
    * The retention window is the grace period for concurrent readers (status
    * polls pin a version lazily, then read); several pairs cover any
    * realistic read latency even under sub-second triggers, while disk stays
    * O(RetainedPairs × state), not O(history).
    */
  private def pruneVersions(keepFrom: Long): Unit = {
    val horizon = keepFrom - RetainedPairs * (1 + StatusStep)
    val dir = new java.io.File(stateDir)
    Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.getName.startsWith("v")) {
        val ver = f.getName.drop(1).toLongOption
        if (ver.exists(_ < horizon)) {
          org.apache.commons.io.FileUtils.deleteQuietly(f)
        }
      }
    }
  }

  // ------------------------------------------------------------ streaming

  /** Wire a streaming request source into the scheduler. `requests` must
    * have columns (ingestion_id, ids, priority, created_at). A rate-source
    * heartbeat keeps triggers firing while the queue drains after input
    * stops.
    */
  def start(requests: DataFrame, trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      heartbeatRowsPerSecond: Int = 1): StreamingQuery = {
    val heartbeat = spark.readStream.format("rate")
      .option("rowsPerSecond", heartbeatRowsPerSecond).load()
      .select(lit(null).cast(StringType).as("ingestion_id"),
        lit(null).cast(ArrayType(LongType)).as("ids"),
        lit(null).cast(StringType).as("priority"),
        lit(null).cast(TimestampType).as("created_at"),
        lit(true).as("is_heartbeat"))
    val tagged = requests.withColumn("is_heartbeat", lit(false))
      .unionByName(heartbeat)
    tagged.writeStream
      .foreachBatch((mb: DataFrame, id: Long) => processMicroBatch(mb, id))
      .option("checkpointLocation", s"$stateDir/checkpoint")
      .trigger(trigger)
      .start()
  }

  // ------------------------------------------------------------ read path

  /** O17/O20: overall status per request, recomputed from live batch state.
    * Both tables are read from ONE pinned version so a concurrent trigger
    * commit can never produce a mixed-version (torn) view.
    */
  def overallStatus: DataFrame = {
    val v = currentVersion
    IngestOps.rollupAgainstRequests(
      readTable(v, "requests", RequestStateSchema),
      readTable(v, "batches", BatchStateSchema))
  }

  /** O18/O19: the status endpoint — overall + per-batch public projection
    * (single pinned version, same torn-read guarantee as overallStatus).
    */
  def statusOf(ingestionId: String): DataFrame = {
    val v = currentVersion
    IngestOps.statusLookup(
      readTable(v, "requests", RequestStateSchema),
      readTable(v, "batches", BatchStateSchema), lit(ingestionId))
  }
}

object IngestPipeline {
  /** Completed-state versions are odd offsets so triggered snapshots and
    * final snapshots never collide. */
  private val StatusStep = 1000000L

  /** Snapshot pairs kept for concurrent readers before pruning. */
  private val RetainedPairs = 8L

  /** Hash partitions per state table for incremental commits. Local tests
    * keep this small; a cluster deployment sizes it so one partition ≈ one
    * comfortable rewrite unit (hundreds of MB), since per-trigger write cost
    * is O(changed partitions × partition size). */
  private[streaming] val NumStateParts = 16

  val RequestStateSchema: StructType = StructType(Seq(
    StructField("ingestion_id", StringType),
    StructField("priority", StringType),
    StructField("created_at", TimestampType),
    StructField("n_ids", LongType)))

  val BatchStateSchema: StructType = StructType(Seq(
    StructField("ingestion_id", StringType),
    StructField("batch_id", StringType),
    StructField("batch_idx", IntegerType),
    StructField("ids", ArrayType(LongType)),
    StructField("priority", StringType),
    StructField("created_at", TimestampType),
    StructField("status", StringType)))

  val RejectedSchema: StructType = StructType(Seq(
    StructField("ingestion_id", StringType),
    StructField("error", StringType)))

  val ProcessedSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("data", StringType)))
}
