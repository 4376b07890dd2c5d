package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{Priority, Status}

/** Core ingestion operators — the reference's computational semantics
  * (SURVEY.md §2, O2–O19) as pure `DataFrame => DataFrame` transforms.
  *
  * Design stance: everything is declarative (`functions._` + window specs) so
  * Catalyst owns pushdown/pruning/codegen; nothing here collects to the
  * driver. Scale notes per operator are in the Scaladoc.
  */
object IngestOps {

  // ---------------------------------------------------------------- O2
  /** Validation predicates from
    * `/root/reference/src/controllers/ingestController.js:10-15`:
    * ids must be a non-null non-empty array, priority ∈ {HIGH, MEDIUM, LOW}
    * case-insensitively. Returns the input with an `error` column (null =
    * valid) so valid rows and the rejected side-output are both one filter
    * away — a single pass, no second scan.
    */
  def withValidation(requests: DataFrame, idsCol: String = "ids",
      priorityCol: String = "priority"): DataFrame = {
    val ids = col(idsCol)
    val pri = col(priorityCol)
    requests.withColumn("error",
      when(ids.isNull || size(ids) === 0,
        "Invalid input: ids array is required and cannot be empty.")
        .when(pri.isNull || !upper(pri).isin(Priority.Valid: _*),
          "Invalid input: priority is required and must be HIGH, MEDIUM, or LOW.")
        .otherwise(lit(null).cast(StringType)))
  }

  /** Valid rows, priority normalized to upper case (reference `:13,24`). */
  def validRequests(requests: DataFrame, idsCol: String = "ids",
      priorityCol: String = "priority"): DataFrame =
    withValidation(requests, idsCol, priorityCol)
      .filter(col("error").isNull)
      .drop("error")
      .withColumn(priorityCol, upper(col(priorityCol)))

  /** Rejected side-output with the error reason (engine analogue of the
    * reference's 400 responses). */
  def rejectedRequests(requests: DataFrame, idsCol: String = "ids",
      priorityCol: String = "priority"): DataFrame =
    withValidation(requests, idsCol, priorityCol).filter(col("error").isNotNull)

  // ---------------------------------------------------------------- O5
  /** Order-preserving fixed-size chunking of an array column — the
    * reference's `slice(i, i+3)` loop
    * (`/root/reference/src/services/ingestService.js:171-179`) as a single
    * array expression. Zero shuffle: evaluated per-row inside whole-stage
    * codegen, so it scales embarrassingly (each of 1000 executors chunks its
    * own rows).
    */
  def chunkArray(ids: Column, batchSize: Int): Column = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val n = floor((size(ids) + lit(batchSize - 1)) / lit(batchSize)).cast(IntegerType)
    when(size(ids) <= 0, array().cast(ArrayType(ArrayType(LongType))))
      .otherwise(transform(sequence(lit(0), n - 1),
        i => slice(ids, i * batchSize + 1, lit(batchSize))))
  }

  /** One row per batch: (input columns minus ids) + batch_idx + ids.
    * `posexplode` keeps the batch ordinal so FIFO-within-request survives.
    */
  def explodeBatches(requests: DataFrame, batchSize: Int,
      idsCol: String = "ids"): DataFrame = {
    val others = requests.columns.filter(_ != idsCol).map(col)
    requests
      .select(others.toSeq :+ posexplode(chunkArray(col(idsCol), batchSize)): _*)
      .withColumnRenamed("pos", "batch_idx")
      .withColumnRenamed("col", idsCol)
  }

  /** Row-form chunking: input is one row per id (key, order, id); output is
    * one row per batch with the ids collected in order. This is the form to
    * use when ids arrive normalized (e.g. a join result): the only shuffle is
    * the per-key window + the groupBy on the SAME key, which Catalyst reuses
    * (one exchange, not two).
    */
  def chunkRows(df: DataFrame, keyCol: String, orderCol: String,
      idCol: String, batchSize: Int): DataFrame =
    chunkRows(df, keyCol, Seq(col(orderCol)), idCol, batchSize)

  /** Multi-column-order form: order within a key by a tuple of columns
    * (compared lexicographically, no lossy numeric composite — a
    * `a*10^7 + b` key silently mis-sorts once b outgrows the multiplier).
    * Struct ordering is exact for any column count/type.
    */
  def chunkRows(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      idCol: String, batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    // idCol joins the ordering as the FINAL tiebreaker: rows tying on all
    // orderCols would otherwise land in different batches run to run
    // (row_number over a non-total order is decided by shuffle arrival),
    // making batch contents irreproducible at the boundary — with the id
    // appended the order is total and membership deterministic
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols :+ col(idCol): _*)
    df.withColumn("_rn", row_number().over(w))
      .withColumn("batch_idx", floor((col("_rn") - 1) / batchSize).cast(IntegerType))
      .groupBy(col(keyCol), col("batch_idx"))
      .agg(array_sort(collect_list(struct(struct(orderCols: _*).as("o"),
        col(idCol).as("i")))).as("_pairs"))
      .withColumn("ids", transform(col("_pairs"), p => p.getField("i")))
      .drop("_pairs")
  }

  // ---------------------------------------------------------------- O7
  /** Composite queue-ordering key (priority rank major, created_at minor,
    * extra tie-breaks last) — `/root/reference/src/utils/priorityQueue.js:12-23`.
    * The reference encodes created_at as `epochMs * 1e-14` folded into one
    * float, which loses millisecond precision for close timestamps; the
    * multi-column sort is exact.
    */
  def queueSortKey(priorityCol: String, createdCol: String,
      tieBreaks: Column*): Seq[Column] =
    Seq(Priority.rank(col(priorityCol)).asc, col(createdCol).asc) ++
      tieBreaks.map(_.asc)

  /** Queue ordered view (highest-priority first). */
  def priorityOrder(jobs: DataFrame, priorityCol: String,
      createdCol: String, tieBreaks: Column*): DataFrame =
    jobs.orderBy(queueSortKey(priorityCol, createdCol, tieBreaks: _*): _*)

  // ---------------------------------------------------------------- O8/O9
  /** Top-k dequeue. `orderBy(...).limit(k)` compiles to
    * `TakeOrderedAndProject`: each partition keeps a k-element heap, the
    * driver merges partition heads — O(n log k) with no global sort, the
    * scalable replacement for the reference's binary heap
    * (`/root/reference/src/utils/priorityQueue.js:30-92`).
    */
  def dequeue(jobs: DataFrame, k: Int, priorityCol: String,
      createdCol: String, tieBreaks: Column*): DataFrame =
    priorityOrder(jobs, priorityCol, createdCol, tieBreaks: _*).limit(k)

  /** O9 peek ≡ dequeue(k=1) without removal; size/isEmpty are `count`/`isEmpty`. */
  def peek(jobs: DataFrame, priorityCol: String,
      createdCol: String, tieBreaks: Column*): DataFrame =
    dequeue(jobs, 1, priorityCol, createdCol, tieBreaks: _*)

  /** Scalable global admission sequence: total order over the sort key as a
    * contiguous 1-based rank. `Window.orderBy` without partitioning would
    * funnel everything through ONE task; instead we range-sort and
    * `zipWithIndex` (one extra count job, fully distributed) — the standard
    * scale-out pattern for global ranks. Sort key must be total (add a unique
    * tie-break) for determinism.
    */
  def globalSequence(df: DataFrame, sortCols: Seq[Column],
      outCol: String = "admission_seq"): DataFrame =
    globalSequenceCleanable(df, sortCols, outCol)._1

  /** [[globalSequence]] plus a cleanup thunk that drops the INTERIM
    * sorted checkpoint's block-manager storage. The interim is an
    * implementation detail (the sort is materialized once so
    * zipWithIndex's count job and the downstream action don't each
    * re-sort), but it is FULL-WIDTH — for iterative callers like the
    * suffix-array builder, one hidden full-width checkpoint per round
    * accumulates until GC gets around to it, a nondeterministic
    * footprint under exactly the memory pressure those callers manage
    * deliberately (round 13). Call the thunk ONLY after the returned
    * frame has been materialized somewhere independent (an eager
    * checkpoint or a parquet write): the frame computes THROUGH the
    * interim, whose lineage is truncated, so a post-cleanup recompute
    * would fail rather than silently redo work.
    */
  private[operators] def globalSequenceCleanable(df: DataFrame,
      sortCols: Seq[Column],
      outCol: String = "admission_seq"): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    // localCheckpoint materializes the sort once: zipWithIndex's internal
    // count job and the downstream action would otherwise each run the full
    // range-sort
    val sorted = df.orderBy(sortCols: _*).localCheckpoint()
    val schema = sorted.schema.add(StructField(outCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    (spark.createDataFrame(rdd, schema),
      () => org.apache.spark.sql.GraftSqlShims.unpersistCheckpoint(sorted))
  }

  // ---------------------------------------------------------------- O11
  /** Per-id enrichment — the simulated external fetch
    * (`/root/reference/src/services/ingestService.js:42-50`) produces
    * `{id, data: "processed"}`. The random delay is simulation, not
    * semantics, so the batch form is a constant projection.
    */
  def enrich(ids: DataFrame, idCol: String = "id"): DataFrame =
    ids.select(col(idCol).cast(LongType).as("id"), lit("processed").as("data"))

  /** Real-connector shape: amortize one client per partition, stream rows
    * through it — the distributed analogue of the reference's per-id await
    * loop. `fetch` runs executor-side; keep it serializable-free by
    * constructing the client inside the closure.
    */
  def enrichWith(ids: DataFrame, idCol: String = "id")(
      fetch: Iterator[Long] => Iterator[(Long, String)]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions(fetch)
      .toDF("id", "data")
  }

  // ---------------------------------------------------------------- O15
  /** Stale-job skip: drop pending jobs whose batch is missing or already
    * started (`/root/reference/src/services/ingestService.js:128-133`).
    * Left-anti join; with a broadcastable started-set Catalyst picks
    * BroadcastHashJoin (verified in plans) — no shuffle of the pending side.
    */
  def staleSkip(pending: DataFrame, started: DataFrame,
      keys: Seq[String]): DataFrame =
    pending.join(started, keys, "left_anti")

  // ---------------------------------------------------------------- O17
  /** Overall-status rollup
    * (`/root/reference/src/services/ingestService.js:15-35`):
    * all yet_to_start → yet_to_start; all completed → completed; otherwise
    * triggered. `bool_and` is a partial-aggregating built-in, so the rollup
    * is map-side combined — one narrow shuffle of (key, 2 booleans) however
    * many batches exist.
    */
  def rollupStatus(batches: DataFrame, keyCol: String = "ingestion_id",
      statusCol: String = "status"): DataFrame = {
    val s = col(statusCol)
    batches.groupBy(col(keyCol))
      .agg(
        bool_and(s === Status.YetToStart).as("_all_yts"),
        bool_and(s === Status.Completed).as("_all_done"))
      .select(col(keyCol),
        when(col("_all_yts"), Status.YetToStart)
          .when(col("_all_done"), Status.Completed)
          .otherwise(Status.Triggered).as("status"))
  }

  /** Rollup including requests with no batches yet (empty ⇒ yet_to_start,
    * reference `:16-18`): left join requests to the batch rollup.
    */
  def rollupAgainstRequests(requests: DataFrame, batches: DataFrame,
      keyCol: String = "ingestion_id", statusCol: String = "status"): DataFrame = {
    val rolled = rollupStatus(batches, keyCol, statusCol)
      .withColumnRenamed("status", "_rolled")
    requests.select(col(keyCol))
      .join(rolled, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("_rolled"), lit(Status.YetToStart)).as("status"))
  }

  // ---------------------------------------------------------------- O18/O19
  /** Point lookup + public projection
    * (`/root/reference/src/controllers/ingestController.js:35-55`): status is
    * recomputed from batches at read time (O20), never trusted from storage.
    * The equality filter pushes down to the parquet scan / state store.
    */
  def statusLookup(requests: DataFrame, batches: DataFrame, ingestionId: Column,
      keyCol: String = "ingestion_id"): DataFrame = {
    val req = requests.filter(col(keyCol) === ingestionId)
    val bat = batches.filter(col(keyCol) === ingestionId)
    val overall = rollupAgainstRequests(req, bat, keyCol)
    val projected = bat.select(col(keyCol), col("batch_id"), col("batch_idx"),
      col("ids"), col("status").as("batch_status"))
    overall.join(projected, Seq(keyCol), "left")
  }
}
