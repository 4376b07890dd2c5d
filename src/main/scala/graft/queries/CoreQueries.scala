package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Priority
import graft.operators.IngestOps
import graft.sources.Tables

/** Core reference-semantics queries (SURVEY.md §2 O2–O19) over the driver's
  * TPC-H-ish tables, each paired with an ANSI-SQL DuckDB oracle.
  *
  * Mapping (FIXTURES.md §B1): `orders` plays the requests table
  * (o_orderkey → ingestion_key, o_orderpriority → priority class,
  * o_orderdate → created_at); an order's `lineitem` rows supply the ids to
  * batch; `l_linestatus` deterministically stands in for batch progress
  * (O = not started, F = finished) so the status rollup is oracle-checkable.
  *
  * All floating aggregates go through DECIMAL so Spark and DuckDB agree
  * bit-for-bit regardless of summation order; timestamps are emitted as
  * formatted strings to sidestep ns/µs precision differences.
  */
object CoreQueries {

  private val Ts = "yyyy-MM-dd HH:mm:ss"
  val BatchSize = 3

  /** Requests view: one row per order with the ordered id list attached.
    * The groupBy and the join share the same key, and the orders side is
    * larger-schema but same-cardinality — at 100 TB this is one shuffle on
    * o_orderkey/l_orderkey (or zero if both tables are bucketed by the key).
    */
  private[graft] def requests(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val ids = li
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(struct(col("l_linenumber").as("o"),
        col("l_partkey").as("i")))).as("_p"))
      .select(col("l_orderkey"),
        transform(col("_p"), p => p.getField("i")).as("ids"))
    val pclass = substring(col("o_orderpriority"), 1, 1)
    Tables.orders(spark, dir)
      .select(col("o_orderkey").as("ingestion_key"),
        when(pclass.isin("1", "2"), Priority.High)
          .when(pclass === "3", Priority.Medium)
          .when(pclass === "5", Priority.Low)
          .as("priority"),
        col("o_orderdate").as("created_at"))
      .join(ids, col("ingestion_key") === col("l_orderkey"), "left")
      .drop("l_orderkey")
      .cache() // shared by q01-q06, q12; signature-table pattern (SCALE.md §4)
  }

  private def valid(spark: SparkSession, dir: String): DataFrame =
    IngestOps.validRequests(requests(spark, dir))

  /** Queue jobs: one row per batch of ≤3 ids (O5 explode over O2-valid rows). */
  private[graft] def jobs(spark: SparkSession, dir: String): DataFrame =
    IngestOps.explodeBatches(valid(spark, dir), BatchSize).cache()

  /** Per-batch progress statuses derived from l_linestatus (row-form O5). */
  private[graft] def batchStatuses(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_linestatus"))
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"))
    li.withColumn("_rn", row_number().over(w))
      .withColumn("batch_idx", floor((col("_rn") - 1) / BatchSize).cast("int"))
      .groupBy(col("l_orderkey").as("ingestion_key"), col("batch_idx"))
      .agg(bool_and(col("l_linestatus") === "O").as("_ao"),
        bool_and(col("l_linestatus") === "F").as("_af"))
      .select(col("ingestion_key"), col("batch_idx"),
        when(col("_ao"), "yet_to_start")
          .when(col("_af"), "completed")
          .otherwise("triggered").as("status"))
      .cache() // shared by q08-q10 and the flagship entry
  }

  // ------------------------------------------------------------ oracle CTEs

  private val RankSql =
    "CASE upper(priority) WHEN 'HIGH' THEN 1 WHEN 'MEDIUM' THEN 2 WHEN 'LOW' THEN 3 ELSE 4 END"

  private val ReqCte =
    """WITH ids AS (
      |  SELECT l_orderkey, list(l_partkey ORDER BY l_linenumber, l_partkey) AS ids
      |  FROM lineitem GROUP BY l_orderkey
      |), req AS (
      |  SELECT o_orderkey AS ingestion_key,
      |         CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2') THEN 'HIGH'
      |              WHEN substr(o_orderpriority, 1, 1) = '3' THEN 'MEDIUM'
      |              WHEN substr(o_orderpriority, 1, 1) = '5' THEN 'LOW'
      |         END AS priority,
      |         o_orderdate AS created_at, ids
      |  FROM orders LEFT JOIN ids ON o_orderkey = l_orderkey
      |), valid AS (
      |  SELECT ingestion_key, upper(priority) AS priority, created_at, ids
      |  FROM req
      |  WHERE ids IS NOT NULL AND len(ids) > 0
      |    AND upper(priority) IN ('HIGH','MEDIUM','LOW')
      |), batches AS (
      |  SELECT ingestion_key, priority, created_at, CAST(i AS INT) AS batch_idx,
      |         list_slice(ids, i*3+1, i*3+3) AS batch_ids
      |  FROM valid, UNNEST(range(0, CAST(ceil(len(ids)/3.0) AS BIGINT))) AS u(i)
      |)""".stripMargin

  private val BatchStatusCte =
    """WITH lb AS (
      |  SELECT l_orderkey,
      |         CAST(floor((row_number() OVER (PARTITION BY l_orderkey
      |               ORDER BY l_linenumber, l_partkey) - 1) / 3) AS INT) AS batch_idx,
      |         l_linestatus
      |  FROM lineitem
      |), bstat AS (
      |  SELECT l_orderkey AS ingestion_key, batch_idx,
      |         CASE WHEN bool_and(l_linestatus = 'O') THEN 'yet_to_start'
      |              WHEN bool_and(l_linestatus = 'F') THEN 'completed'
      |              ELSE 'triggered' END AS status
      |  FROM lb GROUP BY 1, 2
      |)""".stripMargin

  // ---------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O2: validation filter + priority normalization.
    "q01_validate" -> ((s, d) =>
      valid(s, d).select(col("ingestion_key"), col("priority"),
        size(col("ids")).cast("long").as("n_ids"))),

    // O2 side-output: rejected rows with error reason.
    "q02_reject" -> ((s, d) =>
      IngestOps.rejectedRequests(requests(s, d))
        .select(col("ingestion_key"), col("error"))),

    // O5: fixed-size batching, order preserving, last batch short.
    "q03_batch_explode" -> ((s, d) =>
      jobs(s, d).select(col("ingestion_key"), col("batch_idx"),
        concat_ws(",", transform(col("ids"), _.cast("string"))).as("batch_ids"),
        size(col("ids")).cast("long").as("n_ids"))),

    // O5 row-form: chunkRows over normalized (one row per id) input must
    // produce the SAME batches as the array form (q03) — two physical
    // strategies, one logical result, both oracle-checked against the same
    // SQL.
    "q58_chunk_rows" -> ((s, d) =>
      IngestOps.chunkRows(
        Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ingestion_key"),
            col("l_linenumber"), col("l_partkey")),
        "ingestion_key", Seq(col("l_linenumber"), col("l_partkey")),
        "l_partkey", BatchSize)
        .select(col("ingestion_key"), col("batch_idx"),
          concat_ws(",", transform(col("ids"), _.cast("string"))).as("batch_ids"),
          size(col("ids")).cast("long").as("n_ids"))),

    // O7: exact global admission order (rank, created_at, key) as a
    // distributed sequence (sort + zipWithIndex, no single-task window).
    "q04_admission_seq" -> ((s, d) => {
      val v = valid(s, d).select(col("ingestion_key"), col("priority"),
        date_format(col("created_at"), Ts).as("created_at"),
        Priority.rank(col("priority")).as("rank"))
      IngestOps.globalSequence(v,
        Seq(col("rank"), col("created_at"), col("ingestion_key")))
    }),

    // O8: top-1 dequeue (TakeOrderedAndProject, the heap replacement).
    "q05_dequeue_top1" -> ((s, d) =>
      IngestOps.dequeue(jobs(s, d), 1, "priority", "created_at",
          col("ingestion_key"), col("batch_idx"))
        .select(col("ingestion_key"), col("batch_idx"), col("priority"),
          date_format(col("created_at"), Ts).as("created_at"))),

    // O8 generalized: top-k admission with explicit order.
    "q06_topk_admission" -> ((s, d) => {
      val top = IngestOps.dequeue(jobs(s, d), 10, "priority", "created_at",
        col("ingestion_key"), col("batch_idx"))
      val w = Window.orderBy(Priority.rank(col("priority")),
        col("created_at"), col("ingestion_key"), col("batch_idx"))
      top.withColumn("seq", row_number().over(w))
        .select(col("seq").cast("long").as("seq"), col("ingestion_key"),
          col("batch_idx"), col("priority"),
          date_format(col("created_at"), Ts).as("created_at"))
    }),

    // O11: per-id enrichment (constant projection; connector form is
    // IngestOps.enrichWith/mapPartitions).
    "q07_enrich" -> ((s, d) =>
      IngestOps.enrich(
        Tables.lineitem(s, d).select(col("l_partkey").as("id")).distinct())),

    // O17 (+O13/O14 states): two-level rollup — lines → batch status →
    // overall status via bool_and lattice.
    "q08_status_rollup" -> ((s, d) =>
      IngestOps.rollupStatus(batchStatuses(s, d), "ingestion_key", "status")),

    // O18/O19/O20: point lookup, recompute-on-read, public projection.
    "q09_status_lookup" -> ((s, d) => {
      val bs = batchStatuses(s, d)
      val minKey = min(col("ingestion_key"))
      val target = bs.select(minKey.as("k"))
      val overall = IngestOps.rollupStatus(bs, "ingestion_key", "status")
        .withColumnRenamed("status", "overall_status")
      bs.join(broadcast(target), col("ingestion_key") === col("k")).drop("k")
        .join(overall, Seq("ingestion_key"))
        .select(col("ingestion_key"),
          md5(concat_ws("-", col("ingestion_key"), col("batch_idx")))
            .as("batch_id"),
          col("batch_idx"), col("status").as("batch_status"),
          col("overall_status"))
    }),

    // O15: stale-job skip — pending anti-join already-started batches.
    "q10_stale_skip" -> ((s, d) => {
      val bs = batchStatuses(s, d)
      val pending = bs.select(col("ingestion_key"), col("batch_idx"))
      val started = bs.filter(col("status") =!= "yet_to_start")
        .select(col("ingestion_key"), col("batch_idx"))
      IngestOps.staleSkip(pending, started, Seq("ingestion_key", "batch_idx"))
    }),

    // O10 analogue: 5-second tumbling event-time buckets (the rate-limit
    // clock as a window assignment).
    "q11_rate_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "5 seconds").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select(date_format(col("w.start"), Ts).as("window_start"),
          col("event_type"), col("n"), col("sum_value"))),

    // O9: queue introspection — size + head in one row.
    "q12_queue_introspect" -> ((s, d) => {
      val j = jobs(s, d)
      val head = IngestOps.dequeue(j, 1, "priority", "created_at",
          col("ingestion_key"), col("batch_idx"))
        .select(col("ingestion_key").as("head_key"),
          col("batch_idx").as("head_batch_idx"),
          col("priority").as("head_priority"))
      j.agg(count(lit(1)).as("queue_size")).crossJoin(head)
    }),

    // TPC-H Q1-style pricing summary: DECIMAL sums (bit-exact across
    // engines), ROUND'd double averages, full group set.
    "q13_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double")
            .as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
            .cast("double").as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))))

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q01_validate" ->
      s"""$ReqCte SELECT ingestion_key, priority, len(ids) AS n_ids FROM valid""",

    "q02_reject" ->
      s"""$ReqCte
         |SELECT ingestion_key,
         |       CASE WHEN ids IS NULL OR len(ids) = 0
         |              THEN 'Invalid input: ids array is required and cannot be empty.'
         |            WHEN priority IS NULL
         |              OR upper(priority) NOT IN ('HIGH','MEDIUM','LOW')
         |              THEN 'Invalid input: priority is required and must be HIGH, MEDIUM, or LOW.'
         |       END AS error
         |FROM req
         |WHERE ids IS NULL OR len(ids) = 0 OR priority IS NULL
         |   OR upper(priority) NOT IN ('HIGH','MEDIUM','LOW')""".stripMargin,

    "q03_batch_explode" ->
      s"""$ReqCte
         |SELECT ingestion_key, batch_idx,
         |       array_to_string(batch_ids, ',') AS batch_ids,
         |       len(batch_ids) AS n_ids
         |FROM batches""".stripMargin,

    "q58_chunk_rows" ->
      """WITH ids AS (
        |  SELECT l_orderkey AS ingestion_key,
        |         list(l_partkey ORDER BY l_linenumber, l_partkey) AS ids
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT ingestion_key, CAST(i AS INT) AS batch_idx,
        |       array_to_string(list_slice(ids, i*3+1, i*3+3), ',') AS batch_ids,
        |       len(list_slice(ids, i*3+1, i*3+3)) AS n_ids
        |FROM ids, UNNEST(range(0, CAST(ceil(len(ids)/3.0) AS BIGINT))) AS u(i)""".stripMargin,

    "q04_admission_seq" ->
      s"""$ReqCte
         |SELECT ingestion_key, priority,
         |       strftime(created_at, '%Y-%m-%d %H:%M:%S') AS created_at,
         |       $RankSql AS rank,
         |       row_number() OVER (ORDER BY $RankSql, created_at, ingestion_key)
         |         AS admission_seq
         |FROM valid""".stripMargin,

    "q05_dequeue_top1" ->
      s"""$ReqCte
         |SELECT ingestion_key, batch_idx, priority,
         |       strftime(created_at, '%Y-%m-%d %H:%M:%S') AS created_at
         |FROM batches
         |ORDER BY $RankSql, created_at, ingestion_key, batch_idx
         |LIMIT 1""".stripMargin,

    "q06_topk_admission" ->
      s"""$ReqCte
         |SELECT row_number() OVER (ORDER BY $RankSql, created_at,
         |         ingestion_key, batch_idx) AS seq,
         |       ingestion_key, batch_idx, priority,
         |       strftime(created_at, '%Y-%m-%d %H:%M:%S') AS created_at
         |FROM batches
         |ORDER BY 1 LIMIT 10""".stripMargin,

    "q07_enrich" ->
      "SELECT DISTINCT l_partkey AS id, 'processed' AS data FROM lineitem",

    "q08_status_rollup" ->
      s"""$BatchStatusCte
         |SELECT ingestion_key,
         |       CASE WHEN bool_and(status = 'yet_to_start') THEN 'yet_to_start'
         |            WHEN bool_and(status = 'completed') THEN 'completed'
         |            ELSE 'triggered' END AS status
         |FROM bstat GROUP BY ingestion_key""".stripMargin,

    "q09_status_lookup" ->
      s"""$BatchStatusCte, overall AS (
         |  SELECT ingestion_key,
         |         CASE WHEN bool_and(status = 'yet_to_start') THEN 'yet_to_start'
         |              WHEN bool_and(status = 'completed') THEN 'completed'
         |              ELSE 'triggered' END AS overall_status
         |  FROM bstat GROUP BY ingestion_key
         |)
         |SELECT b.ingestion_key,
         |       md5(b.ingestion_key || '-' || b.batch_idx) AS batch_id,
         |       b.batch_idx, b.status AS batch_status, o.overall_status
         |FROM bstat b JOIN overall o USING (ingestion_key)
         |WHERE b.ingestion_key = (SELECT min(ingestion_key) FROM bstat)""".stripMargin,

    "q10_stale_skip" ->
      s"""$BatchStatusCte
         |SELECT p.ingestion_key, p.batch_idx
         |FROM bstat p
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM bstat s
         |  WHERE s.status <> 'yet_to_start'
         |    AND s.ingestion_key = p.ingestion_key
         |    AND s.batch_idx = p.batch_idx)""".stripMargin,

    "q11_rate_window" ->
      """SELECT strftime(time_bucket(INTERVAL '5 seconds', ts),
        |         '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q12_queue_introspect" ->
      s"""$ReqCte
         |SELECT (SELECT count(*) FROM batches) AS queue_size,
         |       ingestion_key AS head_key, batch_idx AS head_batch_idx,
         |       priority AS head_priority
         |FROM batches
         |ORDER BY $RankSql, created_at, ingestion_key, batch_idx
         |LIMIT 1""".stripMargin,

    "q13_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |         AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |         AS DOUBLE) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)
}
