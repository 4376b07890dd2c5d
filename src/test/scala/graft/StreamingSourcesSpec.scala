package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Status
import graft.operators.EventTime
import graft.sources.RequestSource
import graft.streaming.IngestPipeline

/** File-drop source wiring and event-time watermark semantics. */
class StreamingSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("json file-drop source feeds the pipeline end-to-end") {
    val inDir = Files.createTempDirectory("graft-in")
    Files.writeString(inDir.resolve("r1.json"),
      """{"ingestion_id":"F1","ids":[1,2,3],"priority":"HIGH","created_at":"2024-01-01T00:00:00.000Z"}""" + "\n" +
      """{"ingestion_id":"F3","ids":"garbage not an array","priority":7}""" + "\n" +
      """{"ingestion_id":"F2","ids":[4],"priority":"LOW","created_at":"2024-01-01T00:00:01.000Z"}""")
    val p = new IngestPipeline(spark,
      Files.createTempDirectory("graft-state").toString, 3, admitPerTrigger = 2)
    val query = p.start(RequestSource.jsonFileStream(spark, inDir.toString),
      Trigger.ProcessingTime("300 milliseconds"), heartbeatRowsPerSecond = 5)
    try {
      val deadline = System.currentTimeMillis() + 90000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        val m = p.overallStatus.as[(String, String)].collect().toMap
        done = m.get("F1").contains(Status.Completed) &&
          m.get("F2").contains(Status.Completed)
      }
      assert(done, s"file-sourced requests did not complete: ${p.overallStatus.collect().toSeq}")
      assert(p.processedState.count() == 4)
      // malformed line: schema mismatch -> nulls -> O2 rejected side-output
      val rejected = p.rejectedState.select("ingestion_id").as[String].collect()
      assert(rejected.length == 1, s"expected 1 rejected row, got ${rejected.toSeq}")
    } finally query.stop()
  }

  test("kafka-shaped value bytes drive the pipeline like the file source") {
    implicit val sqlCtx = spark.sqlContext
    // Kafka wire shape: (topic, partition, offset, value BINARY) — the same
    // columns format("kafka") emits, fed from MemoryStream for determinism.
    val input = MemoryStream[(String, Int, Long, String)]
    val kafkaShaped = input.toDF()
      .toDF("topic", "partition", "offset", "json")
      .select(col("topic"), col("partition"), col("offset"),
        col("json").cast("binary").as("value"))
    val p = new IngestPipeline(spark,
      Files.createTempDirectory("graft-state").toString, 3, admitPerTrigger = 2)
    val query = p.start(RequestSource.fromKafkaValue(kafkaShaped),
      Trigger.ProcessingTime("300 milliseconds"), heartbeatRowsPerSecond = 5)
    try {
      input.addData(
        ("ingest", 0, 0L,
          """{"ingestion_id":"K1","ids":[1,2,3],"priority":"HIGH","created_at":"2024-01-01T00:00:00.000Z"}"""),
        ("ingest", 0, 1L, """not json at all {{{"""),
        ("ingest", 0, 2L,
          """{"ingestion_id":"K2","ids":[4],"priority":"LOW","created_at":"2024-01-01T00:00:01.000Z"}"""))
      val deadline = System.currentTimeMillis() + 90000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        val m = p.overallStatus.as[(String, String)].collect().toMap
        done = m.get("K1").contains(Status.Completed) &&
          m.get("K2").contains(Status.Completed)
      }
      assert(done, s"kafka-sourced requests did not complete: ${p.overallStatus.collect().toSeq}")
      assert(p.processedState.count() == 4)
      // corrupt payload -> dead-letter id from wire position, O2-rejected
      val rejected = p.rejectedState.select("ingestion_id").as[String].collect()
      assert(rejected.toSeq == Seq("kafka:ingest:0:1"),
        s"expected the corrupt offset dead-lettered, got ${rejected.toSeq}")
    } finally query.stop()
  }

  // The FULL kafka row shape — every column format("kafka") emits with
  // includeHeaders=true, exact names and types. The adapter must (a) be
  // indifferent to the extra columns (parity with the 4-column shape),
  // (b) fall back to broker timestamp for payloads without created_at,
  // (c) decode headers preserving duplicate keys, (d) keep the
  // dead-letter id rule.
  test("full kafka row shape: adapter parity, timestamp fallback, headers") {
    val ts0 = java.sql.Timestamp.from(java.time.Instant.parse("2024-02-02T10:00:00Z"))
    val base = Seq(
      ("""{"ingestion_id":"F1","ids":[1],"priority":"HIGH","created_at":"2024-01-01T00:00:00.000Z"}""",
        "ingest", 0, 0L, ts0),
      ("""{"ingestion_id":"F2","ids":[2],"priority":"LOW"}""",
        "ingest", 0, 1L, ts0),
      ("""corrupt {{ payload""", "ingest", 0, 2L, ts0))
      .toDF("json", "topic", "partition", "offset", "timestamp")
    val full = base.select(
      lit("k".getBytes).as("key"),
      col("json").cast("binary").as("value"),
      col("topic"), col("partition"), col("offset"), col("timestamp"),
      lit(0).as("timestampType"),
      when(col("offset") === 0L, array(
        struct(lit("trace").as("key"), lit("abc".getBytes).as("value")),
        struct(lit("trace").as("key"), lit("def".getBytes).as("value"))))
        .otherwise(lit(null)).as("headers"))

    // (a) extra columns change nothing for the narrow adapter
    val narrow = full.select("value", "topic", "partition", "offset")
    assert(RequestSource.fromKafkaValue(full).collect().map(_.toSeq).toSeq ==
      RequestSource.fromKafkaValue(narrow).collect().map(_.toSeq).toSeq)

    val meta = RequestSource.fromKafkaValueWithMeta(full)
      .orderBy("ingestion_id").collect()
    assert(meta.map(_.getString(0)).toSeq ==
      Seq("F1", "F2", "kafka:ingest:0:2")) // (d) dead-letter id intact
    // (b) F1 keeps payload event time; F2 falls back to broker time
    assert(meta(0).getTimestamp(3) ==
      java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")))
    assert(meta(1).getTimestamp(3) == ts0)
    assert(meta.forall(_.getTimestamp(4) == ts0)) // kafka_timestamp passthrough
    // (c) duplicate header keys survive, binary values decode to UTF-8
    val hdrs = meta(0).getSeq[org.apache.spark.sql.Row](5)
      .map(h => (h.getString(0), h.getString(1)))
    assert(hdrs == Seq(("trace", "abc"), ("trace", "def")), s"got $hdrs")
    assert(meta(1).isNullAt(5))
  }

  test("stream-static dimension join enriches map-side in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val dims = Seq((1L, "gold"), (2L, "silver")).toDF("cust", "tier")
    val input = MemoryStream[(Long, Long)]
    val joined = input.toDF().toDF("order_id", "cust")
      .join(broadcast(dims), Seq("cust"), "left")
    val query = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      input.addData((100L, 1L), (101L, 2L), (102L, 9L))
      query.processAllAvailable()
      val rows = spark.table("ss_join")
        .select("order_id", "tier").as[(Long, Option[String])]
        .collect().sortBy(_._1).toSeq
      // static dim enriches every micro-batch; an unknown key survives
      // the left join with a null tier (no row loss)
      assert(rows == Seq((100L, Some("gold")), (101L, Some("silver")),
        (102L, None)), s"got $rows")
    } finally query.stop()
  }

  test("streaming incremental dedup: arriving docs band-join the static signature table") {
    implicit val sqlCtx = spark.sqlContext
    // persisted historical signature table: doc -> exploded (band, hash)
    val corpus = Seq((10L, 0, "ha"), (11L, 0, "hb"), (12L, 1, "hc"))
      .toDF("doc_id", "band", "bh")
    val input = MemoryStream[(Long, Int, String)]
    // the q135 incremental join, streaming form: stream-static inner join
    // on (band, bh) — only NEW docs probe; the corpus never self-joins
    val cand = input.toDF().toDF("new_id", "band", "bh")
      .join(broadcast(corpus), Seq("band", "bh"))
      .select(col("new_id"), col("doc_id").as("dup_of"))
    val query = cand.writeStream.format("memory").queryName("inc_dedup")
      .outputMode("append").start()
    try {
      input.addData((100L, 0, "ha"), (101L, 0, "hz"), (102L, 1, "hc"))
      query.processAllAvailable()
      val got = spark.table("inc_dedup").as[(Long, Long)].collect().toSet
      // 100 collides with historical 10, 102 with 12; 101 is novel
      assert(got == Set((100L, 10L), (102L, 12L)), s"got $got")
    } finally query.stop()
  }

  test("streaming dedup suppresses duplicate ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = input.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "1 minute")
      .dropDuplicatesWithinWatermark("event_id")
    val query = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:01")))
      query.processAllAvailable()
      // same ids redelivered in a LATER micro-batch, still inside watermark
      input.addData((1L, ts("2024-01-01 00:00:05")), (3L, ts("2024-01-01 00:00:06")))
      query.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L), s"duplicate suppressed once, got $ids")
    } finally query.stop()
  }

  test("streaming content dedup: formatting variants collapse by fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val deduped = input.toDF().toDF("doc_id", "text", "ts")
      .withColumn("fp", graft.operators.TextAnalysis.fingerprint(col("text")))
      .withWatermark("ts", "1 minute")
      .dropDuplicatesWithinWatermark("fp")
    val query = deduped.writeStream.format("memory").queryName("content_dedup")
      .outputMode("append").start()
    try {
      input.addData((1L, "Hello, World!", ts("2024-01-01 00:00:00")))
      query.processAllAvailable()
      // same canonical form in a LATER micro-batch + a genuinely new doc
      input.addData((2L, "hello   world", ts("2024-01-01 00:00:05")),
        (3L, "different text", ts("2024-01-01 00:00:06")))
      query.processAllAvailable()
      val ids = spark.table("content_dedup").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 3L), s"formatting variant must dedup, got $ids")
    } finally query.stop()
  }

  test("interval join: inner matches in-window; outer null after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val reqs = MemoryStream[(Long, String, Timestamp)]
    val enrich = MemoryStream[(String, Timestamp, Long)]
    val joined = EventTime.intervalJoin(
      reqs.toDF().toDF("req_id", "k", "lts"),
      enrich.toDF().toDF("k", "rts", "v"),
      "k", "lts", "rts", 0L, 10L, "10 seconds", "leftOuter")
      // selecting the bare join key must NOT be ambiguous (one key column
      // survives the join); proves the r-side duplicate is dropped
      .select(col("k"), col("req_id"), col("v"))
      .select(col("req_id"), col("v"))
    val query = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      reqs.addData((1L, "k1", ts("2024-01-01 00:00:00")),
        (2L, "k2", ts("2024-01-01 00:00:00")))
      enrich.addData(("k1", ts("2024-01-01 00:00:05"), 42L), // in [lts, lts+10s]
        ("k1", ts("2024-01-01 00:00:20"), 99L))              // outside window
      query.processAllAvailable()
      val inner = spark.table("ivj").as[(Long, Option[Long])].collect().toSet
      assert(inner == Set((1L, Some(42L))), s"inner got $inner")
      // outer results are DELAYED, not lost: req 2 emits (2, null) only
      // once BOTH watermarks pass lts + upper. Advance via dummy keys.
      reqs.addData((90L, "wmL", ts("2024-01-01 00:05:00")))
      enrich.addData(("wmR", ts("2024-01-01 00:05:00"), 0L))
      query.processAllAvailable()
      reqs.addData((91L, "wmL", ts("2024-01-01 00:10:00")))
      enrich.addData(("wmR", ts("2024-01-01 00:10:00"), 0L))
      query.processAllAvailable()
      val rows = spark.table("ivj").as[(Long, Option[Long])].collect().toSet
      assert(rows.contains((2L, None)), s"outer row missing: $rows")
      // the out-of-window enrichment never joined anything
      assert(!rows.exists(_._2.contains(99L)), s"out-of-window joined: $rows")
    } finally query.stop()
  }

  test("streaming session windows merge across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val sessions = EventTime.sessionize(
      input.toDF().toDF("ts", "user_id").withWatermark("ts", "10 seconds"),
      "ts", "30 seconds", Seq(col("user_id")),
      Seq(count(lit(1)).as("n")))
      .select(col("user_id"), date_format(col("session_start"), "HH:mm:ss").as("s"),
        date_format(col("session_end"), "HH:mm:ss").as("e"), col("n"))
    val query = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // two events 20s apart (same 30s-gap session) across separate batches
      input.addData((ts("2024-01-01 00:00:00"), 7L))
      query.processAllAvailable()
      input.addData((ts("2024-01-01 00:00:20"), 7L))
      query.processAllAvailable()
      // advance watermark far past the session end to finalize it
      input.addData((ts("2024-01-01 00:05:00"), 8L))
      query.processAllAvailable()
      input.addData((ts("2024-01-01 00:10:00"), 8L))
      query.processAllAvailable()
      val rows = spark.table("sess").as[(Long, String, String, Long)].collect().toSet
      // the two user-7 events merged into ONE session [00:00:00, 00:00:50)
      assert(rows.contains((7L, "00:00:00", "00:00:50", 2L)), s"got $rows")
    } finally query.stop()
  }

  test("watermark finalizes windows and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val windowed = EventTime.windowedAgg(
      input.toDF().toDF("ts", "value").withWatermark("ts", "10 seconds"),
      "ts", "5 seconds", "5 seconds", Seq.empty,
      Seq(count(lit(1)).as("n")))
      .select(date_format(col("window_start"), "HH:mm:ss").as("ws"), col("n"))
    val query = windowed.writeStream.format("memory").queryName("wm")
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 00:00:01"), 1.0), (ts("2024-01-01 00:00:02"), 2.0))
      query.processAllAvailable()
      // watermark still at epoch: nothing finalized yet
      assert(spark.table("wm").count() == 0)
      // advance event time far enough to close the first window
      input.addData((ts("2024-01-01 00:00:30"), 3.0))
      query.processAllAvailable()
      val afterAdvance = spark.table("wm").as[(String, Long)].collect().toMap
      assert(afterAdvance == Map("00:00:00" -> 2L))
      // late event inside the already-finalized window: dropped
      input.addData((ts("2024-01-01 00:00:03"), 9.0))
      query.processAllAvailable()
      assert(spark.table("wm").as[(String, Long)].collect().toMap ==
        Map("00:00:00" -> 2L))
    } finally query.stop()
  }
}
