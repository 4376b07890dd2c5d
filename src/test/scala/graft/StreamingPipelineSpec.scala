package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.{IngestRequest, Status}
import graft.streaming.{BatchEvent, IngestPipeline, StatusStateMachine}

/** End-to-end scheduler semantics, ported from the reference's E2E suite
  * (`/root/reference/tests/api.test.js`) onto deterministic manual triggers
  * plus a real MemoryStream wiring test.
  */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def newPipeline(admit: Int = 1,
      fetch: Iterator[Long] => Iterator[(Long, String)] =
        ids => ids.map(id => (id, "processed"))) =
    new IngestPipeline(spark,
      Files.createTempDirectory("graft-state").toString, 3, admit, fetch)

  private def reqs(rows: (String, Seq[Long], String, String)*): DataFrame =
    rows.toSeq.map { case (id, ids, p, c) => (id, ids, p, ts(c)) }
      .toDF("ingestion_id", "ids", "priority", "created_at")

  private def emptyTick: DataFrame = reqs().limit(0)

  private def statuses(p: IngestPipeline): Map[(String, Int), String] =
    p.batchState.select("ingestion_id", "batch_idx", "status")
      .as[(String, Int, String)].collect()
      .map { case (i, b, s) => (i, b) -> s }.toMap

  test("ingest -> batch -> admit one per trigger -> complete; status rollup") {
    val p = newPipeline()
    // 6 ids => 2 batches (tests/api.test.js:149-191 shape)
    p.processMicroBatch(reqs(("A", 1L to 6L, "MEDIUM", "2024-01-01 00:00:00")), 0)
    assert(statuses(p) == Map(("A", 0) -> Status.Completed, ("A", 1) -> Status.YetToStart))
    assert(p.overallStatus.as[(String, String)].collect().toMap == Map("A" -> Status.Triggered))
    p.processMicroBatch(emptyTick, 1)
    assert(statuses(p) == Map(("A", 0) -> Status.Completed, ("A", 1) -> Status.Completed))
    assert(p.overallStatus.as[(String, String)].collect().toMap == Map("A" -> Status.Completed))
    assert(p.processedState.count() == 6)
    assert(p.processedState.select("data").distinct().as[String].collect().toSeq == Seq("processed"))
  }

  test("priority preemption: late HIGH overtakes queued LOW/MEDIUM") {
    val p = newPipeline()
    p.processMicroBatch(reqs(
      ("low", Seq(101L, 102L, 103L), "LOW", "2024-01-01 00:00:00"),
      ("med", Seq(201L, 202L, 203L), "MEDIUM", "2024-01-01 00:00:01")), 0)
    // first trigger admits MEDIUM (highest rank present)
    assert(statuses(p)(("med", 0)) == Status.Completed)
    assert(statuses(p)(("low", 0)) == Status.YetToStart)
    // HIGH arrives after LOW was queued — must run before LOW
    p.processMicroBatch(reqs(("high", Seq(301L, 302L, 303L), "HIGH",
      "2024-01-01 00:00:02")), 1)
    assert(statuses(p)(("high", 0)) == Status.Completed)
    assert(statuses(p)(("low", 0)) == Status.YetToStart)
    p.processMicroBatch(emptyTick, 2)
    assert(statuses(p)(("low", 0)) == Status.Completed)
  }

  test("FIFO tie-break within same priority (created_at order)") {
    val p = newPipeline()
    p.processMicroBatch(reqs(
      ("m2", Seq(21L, 22L, 23L), "MEDIUM", "2024-01-01 00:00:01"),
      ("m1", Seq(11L, 12L, 13L), "MEDIUM", "2024-01-01 00:00:00")), 0)
    assert(statuses(p)(("m1", 0)) == Status.Completed)
    assert(statuses(p)(("m2", 0)) == Status.YetToStart)
  }

  test("invalid requests land in rejected side-output, not the queue") {
    val p = newPipeline()
    p.processMicroBatch(reqs(
      ("good", Seq(1L), "HIGH", "2024-01-01 00:00:00"),
      ("bad", Seq(), "HIGH", "2024-01-01 00:00:00"),
      ("worse", Seq(1L), "URGENT", "2024-01-01 00:00:00")), 0)
    val rej = p.rejectedState.select("ingestion_id").as[String].collect().toSet
    assert(rej == Set("bad", "worse"))
    assert(p.batchState.select("ingestion_id").distinct().as[String].collect().toSeq == Seq("good"))
  }

  test("connector failure marks the batch failed; rollup says triggered") {
    val p = newPipeline(fetch = _ => throw new RuntimeException("connector down"))
    p.processMicroBatch(reqs(("A", 1L to 6L, "HIGH", "2024-01-01 00:00:00")), 0)
    assert(statuses(p)(("A", 0)) == Status.Failed)
    assert(p.overallStatus.as[(String, String)].collect().toMap == Map("A" -> Status.Triggered))
    assert(p.processedState.count() == 0)
  }

  test("statusOf projects per-batch rows with overall status") {
    val p = newPipeline()
    p.processMicroBatch(reqs(("A", 1L to 4L, "LOW", "2024-01-01 00:00:00")), 0)
    val rows = p.statusOf("A")
      .select("ingestion_id", "status", "batch_idx", "batch_status")
      .as[(String, String, Int, String)].collect().sortBy(_._3)
    assert(rows.length == 2)
    assert(rows.forall(r => r._1 == "A" && r._2 == Status.Triggered))
    assert(rows.map(r => r._3 -> r._4).toSeq ==
      Seq(0 -> Status.Completed, 1 -> Status.YetToStart))
  }

  test("replayed micro-batch is a no-op (idempotent commit)") {
    val p = newPipeline()
    val r = reqs(("A", 1L to 6L, "MEDIUM", "2024-01-01 00:00:00"))
    p.processMicroBatch(r, 0)
    val before = (statuses(p), p.requestState.count(), p.processedState.count(),
      p.currentVersion)
    p.processMicroBatch(r, 0) // Structured Streaming redelivery after restart
    val after = (statuses(p), p.requestState.count(), p.processedState.count(),
      p.currentVersion)
    assert(after == before)
  }

  test("crashed trigger: redelivered DATA does not duplicate state") {
    val stateDir = Files.createTempDirectory("graft-state").toString
    val r = reqs(("A", 1L to 6L, "MEDIUM", "2024-01-01 00:00:00"))
    val p1 = new IngestPipeline(spark, stateDir)
    p1.processMicroBatch(r, 0)
    // simulate dying between the triggered persist and the final persist:
    // rewind CURRENT to the triggered snapshot (version 0, nothing committed)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$stateDir/CURRENT"), "0 -1")
    val p2 = new IngestPipeline(spark, stateDir) // recovery sweep runs here
    assert(statuses(p2) ==
      Map(("A", 0) -> Status.YetToStart, ("A", 1) -> Status.YetToStart))
    // Structured Streaming redelivers the SAME rows under the same trigger id
    p2.processMicroBatch(r, 0)
    assert(statuses(p2) ==
      Map(("A", 0) -> Status.Completed, ("A", 1) -> Status.YetToStart))
    assert(p2.requestState.count() == 1, "request must not duplicate on replay")
    assert(p2.batchState.count() == 2, "batches must not duplicate on replay")
    p2.processMicroBatch(reqs(), 1)
    assert(statuses(p2) ==
      Map(("A", 0) -> Status.Completed, ("A", 1) -> Status.Completed))
    assert(p2.processedState.count() == 6, "no double enrichment")
  }

  test("resubmitted ingestion_id keeps the first request (no duplication)") {
    val p = newPipeline()
    p.processMicroBatch(reqs(("A", Seq(1L, 2L, 3L), "HIGH", "2024-01-01 00:00:00")), 0)
    p.processMicroBatch(reqs(("A", Seq(9L, 9L, 9L), "LOW", "2024-01-02 00:00:00")), 1)
    assert(p.requestState.count() == 1)
    assert(statuses(p) == Map(("A", 0) -> Status.Completed))
    assert(p.processedState.count() == 3) // first submission's ids only
  }

  test("admitPerTrigger>1: one batch's connector failure does not fail the others") {
    val p = newPipeline(admit = 2,
      fetch = ids => ids.map { id =>
        if (id >= 100L) throw new RuntimeException("connector down for id " + id)
        (id, "processed")
      })
    p.processMicroBatch(reqs(
      ("ok", Seq(1L, 2L, 3L), "HIGH", "2024-01-01 00:00:00"),
      ("boom", Seq(100L, 101L), "HIGH", "2024-01-01 00:00:01")), 0)
    assert(statuses(p) ==
      Map(("ok", 0) -> Status.Completed, ("boom", 0) -> Status.Failed))
    assert(p.processedState.count() == 3, "successful batch's records kept")
  }

  test("version pruning bounds state-dir growth past the retention window") {
    val stateDir = Files.createTempDirectory("graft-state").toString
    val p = new IngestPipeline(spark, stateDir)
    p.processMicroBatch(reqs(("A", Seq(1L), "HIGH", "2024-01-01 00:00:00")), 0)
    (1 to 11).foreach(i => p.processMicroBatch(reqs(), i))
    val dirs = new java.io.File(stateDir).list().count(_.startsWith("v"))
    // 12 pairs written; retention keeps 8 pairs (16 dirs) + the current pair
    assert(dirs <= 20, s"expected pruning to bound versions, got $dirs dirs")
    assert(dirs < 24, "all 24 snapshot dirs still present - pruning inert")
    // state still fully readable after pruning
    assert(p.overallStatus.as[(String, String)].collect().toMap ==
      Map("A" -> Status.Completed))
  }

  test("streaming wiring: MemoryStream + heartbeat drains the queue") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngestRequest]
    val p = newPipeline()
    val query = p.start(input.toDF(), Trigger.ProcessingTime("300 milliseconds"),
      heartbeatRowsPerSecond = 5)
    try {
      input.addData(
        IngestRequest("S1", 1L to 6L, "MEDIUM", ts("2024-01-01 00:00:00")),
        IngestRequest("S2", Seq(7L, 8L), "HIGH", ts("2024-01-01 00:00:01")))
      val deadline = System.currentTimeMillis() + 90000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        val m = p.overallStatus.as[(String, String)].collect().toMap
        done = m.get("S1").contains(Status.Completed) &&
          m.get("S2").contains(Status.Completed)
      }
      assert(done, s"queue did not drain; state=${p.overallStatus.collect().toSeq}")
      assert(p.processedState.count() == 8)
    } finally query.stop()
  }

  test("transformWithState (StatefulProcessor) tracks the lattice on RocksDB") {
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[BatchEvent]
    val query = graft.streaming.StatusProcessorV2.track(input.toDS())
      .writeStream.format("memory").queryName("ssm2")
      .outputMode("update").start()
    try {
      input.addData(
        BatchEvent("A", "b0", Status.YetToStart, ts("2024-01-01 00:00:00")),
        BatchEvent("A", "b1", Status.YetToStart, ts("2024-01-01 00:00:00")))
      query.processAllAvailable()
      input.addData(BatchEvent("A", "b0", Status.Completed, ts("2024-01-01 00:00:05")))
      query.processAllAvailable()
      input.addData(BatchEvent("A", "b1", Status.Completed, ts("2024-01-01 00:00:10")))
      query.processAllAvailable()
      // late older event must not regress (same protection as v1)
      input.addData(BatchEvent("A", "b0", Status.Triggered, ts("2024-01-01 00:00:01")))
      query.processAllAvailable()
      val hist = spark.table("ssm2").as[(String, Long, Long, String)].collect().toSeq
      assert(hist.map(_._4) == Seq(Status.YetToStart, Status.Triggered,
        Status.Completed, Status.Completed))
      assert(hist.last == (("A", 2L, 2L, Status.Completed)))
    } finally {
      query.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("event-time eviction drops idle keys; a revival starts fresh (v1)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BatchEvent]
    val out = StatusStateMachine.trackWithEviction(input.toDS(),
      watermarkDelay = "0 seconds", retentionMs = 10000)
    val query = out.writeStream.format("memory").queryName("ssm_evict")
      .outputMode("update").start()
    try {
      input.addData(
        BatchEvent("A", "b0", Status.Completed, ts("2024-01-01 00:00:00")),
        BatchEvent("A", "b1", Status.YetToStart, ts("2024-01-01 00:00:00")))
      query.processAllAvailable() // A=(2,1,triggered); watermark -> 00:00:00
      input.addData(BatchEvent("B", "b0", Status.YetToStart, ts("2024-01-01 00:01:00")))
      query.processAllAvailable() // watermark -> 00:01:00 after this batch
      // next batch runs with watermark 00:01:00 > A's timeout (00:00:10):
      // A is evicted (state removed, no tombstone row)
      input.addData(BatchEvent("B", "b0", Status.Triggered, ts("2024-01-01 00:01:30")))
      query.processAllAvailable()
      // revival AFTER eviction: must start fresh — were stale state
      // resurrected, this would read (A, 3, 1, triggered)
      input.addData(BatchEvent("A", "b9", Status.YetToStart, ts("2024-01-01 00:02:00")))
      query.processAllAvailable()
      val aRows = spark.table("ssm_evict").as[(String, Long, Long, String)]
        .collect().toSeq.filter(_._1 == "A")
      assert(aRows.head == (("A", 2L, 1L, Status.Triggered)), s"got $aRows")
      assert(aRows.last == (("A", 1L, 0L, Status.YetToStart)),
        s"evicted state resurrected: $aRows")
    } finally query.stop()
  }

  test("TTL evicts idle keys; a revival starts fresh (transformWithState)") {
    implicit val sqlCtx = spark.sqlContext
    val priorStore = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val priorParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // TimeMode.ProcessingTime keeps the engine running micro-batches on the
    // clock (TTL sweep), so processAllAvailable never settles — this test
    // POLLS the sink under a deadline instead, and trims state partitions
    // so each continuous batch commits 2 RocksDB stores, not 32.
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val input = MemoryStream[BatchEvent]
    val query = graft.streaming.StatusProcessorV2
      .trackWithTtl(input.toDS(), java.time.Duration.ofMillis(1000))
      .writeStream.format("memory").queryName("ssm2_ttl")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    def aRows: Seq[(String, Long, Long, String)] =
      spark.table("ssm2_ttl").as[(String, Long, Long, String)]
        .collect().toSeq.filter(_._1 == "A")
    def awaitRow(expect: (String, Long, Long, String)): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!aRows.lastOption.contains(expect) &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    }
    try {
      input.addData(
        BatchEvent("A", "b0", Status.Completed, ts("2024-01-01 00:00:00")),
        BatchEvent("A", "b1", Status.YetToStart, ts("2024-01-01 00:00:00")))
      awaitRow(("A", 2L, 1L, Status.Triggered))
      assert(aRows.last == (("A", 2L, 1L, Status.Triggered)), s"got $aRows")
      Thread.sleep(3000) // processing-time TTL (1 s) expires A's state
      input.addData(BatchEvent("A", "b9", Status.YetToStart, ts("2024-01-01 00:00:10")))
      awaitRow(("A", 1L, 0L, Status.YetToStart))
      assert(aRows.last == (("A", 1L, 0L, Status.YetToStart)),
        s"expired state resurrected: $aRows")
    } finally {
      query.stop()
      spark.conf.set("spark.sql.shuffle.partitions", priorParts)
      priorStore match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("drift monitor V2 TTL: an idle metric's CUSUM evicts; revival " +
      "restarts the fold at S = 0 (transformWithState)") {
    import graft.streaming.DriftMonitor
    import graft.streaming.DriftMonitor.{Alarm, Obs}
    implicit val sqlCtx = spark.sqlContext
    val priorStore = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val priorParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val input = MemoryStream[Obs]
    val query = DriftMonitor
      .monitorV2WithTtl(input.toDS(), mu = 1L, k = 1L, h = 100L,
        java.time.Duration.ofMillis(1000))
      .writeStream.format("memory").queryName("drift2_ttl")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    def rows: Seq[Alarm] = spark.table("drift2_ttl").as[Alarm].collect().toSeq
    def await(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (rows.size < n && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
    }
    try {
      input.addData(Obs("A", 1L, 10L), Obs("A", 2L, 10L))
      await(2)
      // S folds 10-2 twice: 8, then 16
      assert(rows.sortBy(_.t).map(_.s) == Seq(8L, 16L), s"got $rows")
      Thread.sleep(3000) // processing-time TTL (1 s) expires A's state
      input.addData(Obs("A", 3L, 10L))
      await(3)
      // evicted fold restarts at 0: 0 + 10 - 2 = 8, NOT 24
      assert(rows.sortBy(_.t).last.s == 8L,
        s"expired CUSUM state resurrected: $rows")
    } finally {
      query.stop()
      spark.conf.set("spark.sql.shuffle.partitions", priorParts)
      priorStore match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("timeout watchdog (transformWithState TIMERS): a stuck job alerts " +
      "once after its deadline; terminal and re-armed jobs never do") {
    import graft.streaming.TimeoutMonitor
    import graft.streaming.TimeoutMonitor.{Alert, WatchEvent}
    implicit val sqlCtx = spark.sqlContext
    val priorStore = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val priorParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val input = MemoryStream[WatchEvent]
    val query = TimeoutMonitor.watch(input.toDS(), timeoutMs = 1500)
      .writeStream.format("memory").queryName("watchdog")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    def alerts: Seq[Alert] = spark.table("watchdog").as[Alert].collect().toSeq
    try {
      // A: activity then silence -> must alert; B: terminal before the
      // deadline -> never; C: re-armed twice then terminal -> never;
      // D: finishes AND re-triggers inside one micro-batch (terminal at
      // t=1, later non-terminal at t=2) then silence -> the revived job
      // must stay watched and alert (the round-9 advisor finding: an
      // exists(terminal) would drop D's watch and let it hang silently)
      // E: finishes in batch 1, then an OLDER non-terminal event is
      // REDELIVERED in batch 2 (at-least-once source) -> the terminal
      // tombstone must hold and E never alerts (before the tombstone, a
      // redelivery after clear-on-terminal re-armed a watch and fired a
      // false alert for a completed job); F: terminal and non-terminal
      // share t=1 in ONE batch -> the terminal event wins the tie
      // DETERMINISTICALLY (a revival must carry a strictly newer t), so
      // F never alerts regardless of shuffle arrival order;
      // G: a COARSE CLOCK stamps every heartbeat t=1 — genuinely new
      // liveness signals indistinguishable from redeliveries. The
      // equal-t heartbeats must EXTEND the live deadline (round-14
      // advisor: ignoring them fired a false alert on an active job,
      // whose state-clear then let the next heartbeat re-arm and alert
      // AGAIN); G finishes after the original deadline would have
      // passed, so G never alerts
      input.addData(WatchEvent("A", 1L, terminal = false),
        WatchEvent("B", 1L, terminal = false),
        WatchEvent("C", 1L, terminal = false),
        WatchEvent("D", 2L, terminal = false),
        WatchEvent("D", 1L, terminal = true),
        WatchEvent("E", 2L, terminal = true),
        WatchEvent("F", 1L, terminal = false),
        WatchEvent("F", 1L, terminal = true),
        WatchEvent("G", 1L, terminal = false))
      Thread.sleep(600)
      input.addData(WatchEvent("B", 2L, terminal = true),
        WatchEvent("C", 2L, terminal = false), // C re-arms
        WatchEvent("E", 1L, terminal = false), // E: stale redelivery
        WatchEvent("G", 1L, terminal = false)) // G: equal-t heartbeat
      Thread.sleep(600)
      input.addData(WatchEvent("C", 3L, terminal = true), // C finishes
        WatchEvent("G", 1L, terminal = false)) // G: still heartbeating
      Thread.sleep(600)
      input.addData(WatchEvent("G", 2L, terminal = true)) // G finishes
      // G's original (unextended) deadline passed at ~1.5 s while its
      // equal-t heartbeats were still flowing — only the extension
      // keeps it silent
      val deadline = System.currentTimeMillis() + 60000
      while (alerts.map(_.key).toSet != Set("A", "D") &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      // give stragglers a chance to (wrongly) fire before asserting
      Thread.sleep(2500)
      val byKey = alerts.groupBy(_.key)
      assert(byKey.keySet == Set("A", "D"),
        s"expected exactly A and D to time out (E's redelivery and F's " +
          s"equal-t tie must both stay silent): $alerts")
      assert(byKey("A").size == 1, s"A must alert exactly once: $alerts")
      assert(byKey("A").head.last_t == 1L)
      assert(byKey("D").size == 1, s"D must alert exactly once: $alerts")
      assert(byKey("D").head.last_t == 2L,
        s"D's alert must carry the revival event's time: $alerts")

      // ---- replay storm (round-15 advisor): H is a HUNG job whose last
      // heartbeat (key, t=1) is redelivered perpetually by an
      // at-least-once source. Unbounded tie extension would re-arm H's
      // deadline on every redelivery and the alert would never fire
      // while the storm flows; the armAt + 2·timeoutMs cap guarantees it
      // fires at most one extra timeout window past the first arm. Keep
      // redelivering until the alert appears — the loop condition itself
      // is the proof that the alert fired WHILE replays were flowing.
      input.addData(WatchEvent("H", 1L, terminal = false))
      val stormDeadline = System.currentTimeMillis() + 60000
      while (!alerts.exists(_.key == "H") &&
          System.currentTimeMillis() < stormDeadline) {
        input.addData(WatchEvent("H", 1L, terminal = false))
        Thread.sleep(300)
      }
      val hAlerts = alerts.filter(_.key == "H")
      assert(hAlerts.nonEmpty,
        s"perpetual equal-t replay suppressed H's alert forever: $alerts")
      assert(hAlerts.head.last_t == 1L)
      // quiesce H: a post-alert redelivery arms a FRESH watch (state was
      // cleared by the alert) — tombstone it so it can't fire during
      // other suites
      input.addData(WatchEvent("H", 2L, terminal = true))
      Thread.sleep(600)
    } finally {
      query.stop()
      spark.conf.set("spark.sql.shuffle.partitions", priorParts)
      priorStore match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("status merge: equal-timestamp transitions advance by lattice rank, " +
      "regressions drop, and the fold is arrival-order independent") {
    import graft.streaming.StatusStateMachine.merge
    def ev(b: String, st: String, t: Long) =
      BatchEvent("A", b, st, new java.sql.Timestamp(t))
    // a coarse scheduler clock stamps triggered and completed with the
    // SAME millisecond: the forward transition must still land (the old
    // strictly-newer rule dropped it forever)
    val sameTs = Seq(ev("b0", Status.Triggered, 1000L),
      ev("b0", Status.Completed, 1000L))
    assert(merge(Map.empty, sameTs)("b0")._1 == Status.Completed,
      "equal-ts forward transition must advance")
    // ...but a redelivered equal-ts OLDER status cannot regress it
    assert(merge(Map("b0" -> (Status.Completed, 1000L)),
      Seq(ev("b0", Status.Triggered, 1000L)))("b0")._1 == Status.Completed,
      "equal-ts regression must drop")
    // and a strictly older event never wins, whatever its status
    assert(merge(Map("b0" -> (Status.Triggered, 2000L)),
      Seq(ev("b0", Status.Completed, 1000L)))("b0")._1 == Status.Triggered,
      "older event must not regress newer state")
    // arrival-order independence: the winner is the (ts, rank)-lex max,
    // so every permutation of a batch converges to the same state —
    // what kill-and-resume replay parity rests on
    val evs = Seq(ev("b0", Status.YetToStart, 1000L),
      ev("b0", Status.Completed, 2000L),
      ev("b0", Status.Triggered, 2000L),
      ev("b1", Status.Failed, 1000L),
      ev("b1", Status.Completed, 1000L))
    val states = evs.permutations.take(60).map(p => merge(Map.empty, p)).toSeq
    assert(states.distinct.size == 1,
      s"merge must be arrival-order independent: ${states.distinct}")
    assert(states.head == Map("b0" -> (Status.Completed, 2000L),
      "b1" -> (Status.Failed, 1000L)))
  }

  test("mapGroupsWithState status machine tracks the rollup lattice") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BatchEvent]
    val out = StatusStateMachine.track(input.toDS())
    val query = out.writeStream.format("memory").queryName("ssm")
      .outputMode("update").start()
    try {
      input.addData(
        BatchEvent("A", "b0", Status.YetToStart, ts("2024-01-01 00:00:00")),
        BatchEvent("A", "b1", Status.YetToStart, ts("2024-01-01 00:00:00")))
      query.processAllAvailable()
      input.addData(BatchEvent("A", "b0", Status.Completed, ts("2024-01-01 00:00:05")))
      query.processAllAvailable()
      input.addData(BatchEvent("A", "b1", Status.Completed, ts("2024-01-01 00:00:10")))
      query.processAllAvailable()
      val hist = spark.table("ssm").as[(String, Long, Long, String)].collect().toSeq
      assert(hist.map(_._4) == Seq(Status.YetToStart, Status.Triggered, Status.Completed))
      assert(hist.last == (("A", 2L, 2L, Status.Completed)))
      // late redelivery of an OLDER event must not regress the status
      input.addData(BatchEvent("A", "b0", Status.Triggered, ts("2024-01-01 00:00:01")))
      query.processAllAvailable()
      val afterLate = spark.table("ssm").as[(String, Long, Long, String)]
        .collect().toSeq
      assert(afterLate.last == (("A", 2L, 2L, Status.Completed)),
        s"late event regressed status: $afterLate")
    } finally query.stop()
  }
}
