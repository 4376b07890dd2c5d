package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.Status
import graft.operators.Relational
import graft.streaming.IngestPipeline

/** Scale-mechanism tests: skew salting, bucketed co-located joins, and
  * pipeline state recovery — the behaviors that matter at 100 TB but need
  * deliberate fixtures to observe locally.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("coOccurrence equals the self-join form, incl. duplicate items in a group") {
    // group 10 holds {1,2,3} with item 2 listed TWICE — the pair counts
    // must still credit group 10 once (set semantics = count DISTINCT group)
    val rows = Seq((10L, 1L), (10L, 2L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (30L, 2L), (30L, 3L), (40L, 5L))
      .toDF("g", "item")
    val fast = Relational.coOccurrence(rows, "g", "item")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val a = rows.select(col("g"), col("item").as("ia"))
    val b = rows.select(col("g"), col("item").as("ib"))
    val joined = a.join(b, Seq("g")).filter(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count_distinct(col("g")).as("n"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(fast == joined, s"coOccurrence $fast != join form $joined")
    assert(fast.contains((1L, 2L, 2L)), "pair (1,2) seen in groups 10 and 20")
    assert(fast.contains((2L, 3L, 2L)), "dup item must not double-count group 10")
  }

  test("globalRunningSum (distributed prefix-sum) equals the one-partition window") {
    import org.apache.spark.sql.expressions.Window
    // unique order keys, positive and negative values, enough rows to span
    // several range partitions
    val rows = (1 to 5000).map(i => ((i * 37) % 15017, (i % 13) - 6L))
      .distinctBy(_._1).toDF("t", "v")
    val fast = graft.operators.EventTime.globalRunningSum(rows, "t", "v")
      .select("t", "running_sum").as[(Int, Long)].collect().sorted.toSeq
    val slow = rows
      .withColumn("running_sum", sum(col("v"))
        .over(Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("t", "running_sum").as[(Int, Long)].collect().sorted.toSeq
    assert(fast == slow, "segmented scan must equal the global window")
    // multi-column form: k sums in the same two passes
    val two = (1 to 4000).map(i => ((i * 41) % 9103, (i % 7).toLong, (i % 5).toLong))
      .distinctBy(_._1).toDF("t", "a", "b")
    val multi = graft.operators.EventTime.globalRunningSums(two, "t", Seq("a", "b"))
      .select("t", "running_a", "running_b").as[(Int, Long, Long)]
      .collect().sorted.toSeq
    val ref = two
      .withColumn("ra", sum(col("a")).over(Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rb", sum(col("b")).over(Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("t", "ra", "rb").as[(Int, Long, Long)].collect().sorted.toSeq
    assert(multi == ref, "multi-column scan must equal two global windows")
  }

  test("globalPeakConcurrency sweeps one timeline without a grouping key") {
    val iv = Seq((0L, 10L), (5L, 15L), (9L, 12L), (20L, 21L))
      .toDF("s", "e")
    val out = graft.operators.EventTime.globalPeakConcurrency(iv, "s", "e")
      .collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1)) == ((3L, 9L)),
      s"expected peak 3 first at t=9, got ${out(0)}")
  }

  test("saltedJoin is row-identical to the plain join under heavy skew") {
    // one hot key (90% of rows) + a long tail
    val left = ((1 to 900).map(i => (1L, s"row$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"tail$i"))).toDF("k", "payload")
    val right = (1 to 50).map(i => (i.toLong, s"dim$i")).toDF("k", "dim")
    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "dim").as[(Long, String, String)].collect().sorted
    val salted = Relational.saltedJoin(left, right, Seq("k"), 8)
      .select("k", "payload", "dim").as[(Long, String, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.count(_._1 == 1L) == 900)
  }

  test("hotColdJoin is row-identical to the plain lookup join under Zipf skew") {
    // Zipf-ish: key 1 dominates the big side; weights mirror that skew
    val big = ((1 to 800).map(i => (1L, s"row$i")) ++
      (1 to 200).map(i => ((i % 40).toLong + 2, s"tail$i"))).toDF("k", "payload")
    val lookup = (1 to 60).map(i => (i.toLong, 1000L / i, s"val$i"))
      .toDF("k", "w", "v")
    val plain = big.join(lookup, Seq("k"))
      .select("k", "payload", "v").as[(Long, String, String)].collect().sorted
    // hotCount both below and above the distinct-key count (boundary cases)
    for (hot <- Seq(1, 5, 100)) {
      val hc = Relational.hotColdJoin(big, lookup, "k", "w", hot)
        .select("k", "payload", "v").as[(Long, String, String)].collect().sorted
      assert(hc.toSeq == plain.toSeq, s"hotCount=$hot diverged")
    }
    assert(plain.count(_._1 == 1L) == 800)

    // duplicate lookup keys straddling the hot boundary: hotness is per
    // KEY, so hotCount=1 must keep BOTH rows of the hottest key
    val dup = Seq((1L, 5L, "a"), (1L, 3L, "b"), (2L, 4L, "c"))
      .toDF("k", "w", "v")
    val dupPlain = big.join(dup, Seq("k"))
      .select("k", "payload", "v").as[(Long, String, String)].collect().sorted
    val dupHc = Relational.hotColdJoin(big, dup, "k", "w", 1)
      .select("k", "payload", "v").as[(Long, String, String)].collect().sorted
    assert(dupHc.toSeq == dupPlain.toSeq,
      s"duplicate-key rows lost: ${dupHc.size} vs ${dupPlain.size}")
  }

  test("bucketed tables sort-merge join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // DROP TABLE on the in-memory catalog leaves orphan dirs behind if a
    // previous JVM died mid-test — clear the locations too
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, t))
    }
    graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be exchange-free, got:\n$plan")
      assert(joined.count() == 6000)
      // AQE pin: with adaptive on (session default), an exchange-free
      // plan must STAY exchange-free after execution — AQE only re-plans
      // at exchange boundaries, so the co-located join must not acquire
      // one. collect() finalizes this Dataset's own QueryExecution.
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(!finalPlan.contains("Exchange"),
        s"bucketed join acquired an exchange under AQE:\n$finalPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned writes prune partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .write.partitionBy("lang").mode("overwrite").parquet(dir)
    val langs = new java.io.File(dir).list().filter(_.startsWith("lang=")).sorted
    assert(langs.length == 5, s"expected 5 lang partitions, got ${langs.toSeq}")
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter should prune partitions:\n$plan")
    val total = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en").count()
    assert(q.count() == total)
  }

  test("incremental commit: unchanged state partitions are hard-linked byte-identical") {
    val stateDir = Files.createTempDirectory("graft-state").toString
    val p = new IngestPipeline(spark, stateDir)
    // 8 single-batch requests spread across several _part hash partitions
    p.processMicroBatch((1 to 8).map(i =>
      (s"R$i", Seq(i * 10L, i * 10L + 1), "MEDIUM", ts("2024-01-01 00:00:00")))
      .toDF("ingestion_id", "ids", "priority", "created_at"), 0)
    val v1 = p.currentVersion
    // empty tick: no new rows; exactly one batch admitted + completed, so
    // exactly its partition may change in `batches`
    p.processMicroBatch((1 to 0).map(i => ("", Seq.empty[Long], "", ts("2024-01-01 00:00:00")))
      .toDF("ingestion_id", "ids", "priority", "created_at"), 1)
    val v2 = p.currentVersion
    assert(v2 > v1)

    def partDirs(v: Long, table: String): Set[String] =
      Option(new java.io.File(s"$stateDir/v$v/$table").list())
        .getOrElse(Array.empty[String]).filter(_.startsWith("_part=")).toSet
    def comparePart(table: String, part: String): Boolean = {
      def files(v: Long) = Option(new java.io.File(s"$stateDir/v$v/$table/$part")
        .listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f).toMap
      val (f1, f2) = (files(v1), files(v2))
      f1.keySet == f2.keySet &&
        f1.forall { case (n, f) => Files.isSameFile(f.toPath, f2(n).toPath) }
    }

    // batches: the admitted batch's partition rewritten, the rest linked
    val shared = partDirs(v1, "batches") & partDirs(v2, "batches")
    assert(shared.size >= 2, s"want several shared partitions, got $shared")
    val (identical, rewritten) = shared.partition(comparePart("batches", _))
    assert(identical.nonEmpty, "no batches partition carried over as a hard link")
    assert(rewritten.nonEmpty, "the admitted batch's partition must be rewritten")
    // requests saw no new rows in trigger 2: every partition linked
    val reqShared = partDirs(v1, "requests") & partDirs(v2, "requests")
    assert(reqShared.nonEmpty && reqShared.forall(comparePart("requests", _)),
      "requests table should be fully link-carried on a no-input trigger")
    // and the state itself still reads correctly through the links
    // (one batch admitted+completed per trigger, two ids each)
    assert(p.batchState.filter(col("status") === Status.Completed).count() == 2)
    assert(p.processedState.count() == 4)
  }

  // The round-7 capstone: ONE live IngestPipeline run over sf0.1 content —
  // file-drop source → validate (O2) → chunk (O5) → priority admission
  // (O7/O8) → enrichment with the real document texts (O11) → rollup
  // (O17) — KILLED mid-stream and resumed from the checkpoint + versioned
  // state, with the second request wave arriving while the pipeline is
  // down. Exactly-once is then asserted three ways: the pipeline's own
  // versioned rollup, BOTH keyed state APIs (mapGroupsWithState and
  // transformWithState) replaying the final batch events, and the q135
  // incremental-dedup join over the enriched output matching a full batch
  // recompute.
  test("capstone: sf0.1 e2e with kill-and-resume, exactly-once on both state APIs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Dedup
    import graft.sources.{RequestSource, Tables}
    import graft.streaming.{BatchEvent, StatusStateMachine, StatusProcessorV2}

    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    def withBands(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), Dedup.tokens(col("text")).as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingles(col("tok"), 3), 8).as("sig"))
      .withColumn("bands", Dedup.lshBands(col("sig"), 4, 2))
    val allBands = withBands(docs).cache()
    // seed the request set with one KNOWN near-dup candidate pair so the
    // dedup stage below can't pass vacuously
    val pair = Dedup.candidatePairs(allBands, "doc_id", "bands")
      .orderBy("doc_a", "doc_b").head()
    val (pa, pb) = (pair.getLong(0), pair.getLong(1))
    val allIds = docs.select("doc_id").as[Long].collect().sorted
    val reqIds = (Seq(pa, pb) ++ allIds.filterNot(i => i == pa || i == pb))
      .take(48)
    val fetchMap = docs.filter(col("doc_id").isin(reqIds: _*))
      .as[(Long, String)].collect().toMap
    val groups = reqIds.grouped(4).toSeq // 12 requests x 4 ids
    def reqJson(name: String, ids: Seq[Long], prio: String): String =
      s"""{"ingestion_id":"$name","ids":[${ids.mkString(",")}],""" +
        s""""priority":"$prio","created_at":"2024-01-01T00:00:00.000Z"}"""
    val names = groups.indices.map(i => f"C$i%02d")

    val inDir = Files.createTempDirectory("graft-capstone-in")
    // wave 1: 6 requests, plus an invalid-priority request and a corrupt
    // line for the rejected side-output
    Files.writeString(inDir.resolve("w1.json"),
      (groups.take(6).zipWithIndex.map { case (g, i) => reqJson(names(i), g, "HIGH") } :+
        """{"ingestion_id":"BAD","ids":[1],"priority":7}""" :+
        "corrupt {{ not json").mkString("\n"))

    val stateDir = Files.createTempDirectory("graft-capstone-state").toString
    def mkPipeline() = new IngestPipeline(spark, stateDir, batchSize = 2,
      admitPerTrigger = 4, fetch = ids => ids.map(id => (id, fetchMap(id))))

    // ---- phase 1: run until real progress, then KILL mid-stream
    val p1 = mkPipeline()
    val q1 = p1.start(RequestSource.jsonFileStream(spark, inDir.toString),
      Trigger.ProcessingTime("300 milliseconds"), heartbeatRowsPerSecond = 5)
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (p1.processedState.count() < 8 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(p1.processedState.count() >= 8,
        "pipeline made no progress before the kill")
    } finally q1.stop() // kill: in-flight trigger may orphan `triggered` rows
    assert(p1.processedState.count() <= 24, "kill landed after wave 1 finished")

    // wave 2 arrives while the pipeline is DOWN — 6 more requests plus a
    // RESUBMISSION of C00 with different ids (first-wins must ignore it)
    Files.writeString(inDir.resolve("w2.json"),
      (groups.drop(6).zipWithIndex.map { case (g, i) =>
        reqJson(names(i + 6), g, "LOW") } :+
        reqJson(names(0), Seq(999999L), "LOW")).mkString("\n"))

    // ---- phase 2: RESUME from checkpoint + versioned state
    val p2 = mkPipeline() // constructor demotes orphaned `triggered` rows
    val q2 = p2.start(RequestSource.jsonFileStream(spark, inDir.toString),
      Trigger.ProcessingTime("300 milliseconds"), heartbeatRowsPerSecond = 5)
    try {
      val deadline = System.currentTimeMillis() + 180000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        val m = p2.overallStatus.as[(String, String)].collect().toMap
        done = names.forall(n => m.get(n).contains(Status.Completed))
      }
      assert(done, s"not all completed: ${p2.overallStatus.collect().toSeq}")
    } finally q2.stop()

    // ---- exactly-once, API 0: the pipeline's own versioned state
    val processed = p2.processedState.select("id", "data")
      .as[(Long, String)].collect()
    assert(processed.length == 48, s"enriched ${processed.length} ids, want 48")
    assert(processed.map(_._1).toSet == reqIds.toSet,
      "enriched id set != requested id set (resubmitted ids must not appear)")
    assert(processed.toMap == fetchMap, "enriched payloads != source documents")
    val rejected = p2.rejectedState.collect()
    assert(rejected.length == 2, s"want 2 rejected rows, got ${rejected.toSeq}")

    // ---- exactly-once, APIs 1+2: both keyed state machines replay the
    // final batch events and must agree: 2 batches per request, all done
    val events = p2.batchState.select(col("ingestion_id"), col("batch_id"),
      col("status"), col("created_at").as("ts")).as[BatchEvent].collect()
    implicit val sqlCtx = spark.sqlContext
    def finalRollup(table: String): Map[String, (Long, Long, String)] =
      spark.table(table).as[(String, Long, Long, String)].collect()
        .map { case (k, nb, nc, st) => k -> ((nb, nc, st)) }.toMap
    val in1 = MemoryStream[BatchEvent]
    val s1 = StatusStateMachine.track(in1.toDS())
      .writeStream.format("memory").queryName("cap_ssm1")
      .outputMode("update").start()
    val v1 = try {
      in1.addData(events.toIndexedSeq: _*); s1.processAllAvailable()
      finalRollup("cap_ssm1")
    } finally s1.stop()
    val priorStore = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in2 = MemoryStream[BatchEvent]
    val s2 = StatusProcessorV2.track(in2.toDS())
      .writeStream.format("memory").queryName("cap_ssm2")
      .outputMode("update").start()
    val v2 = try {
      in2.addData(events.toIndexedSeq: _*); s2.processAllAvailable()
      finalRollup("cap_ssm2")
    } finally {
      s2.stop()
      priorStore match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    val expected = names.map(n => n -> ((2L, 2L, Status.Completed))).toMap
    assert(v1 == expected, s"mapGroupsWithState rollup diverged: $v1")
    assert(v2 == expected, s"transformWithState rollup diverged: $v2")

    // ---- exactly-once, stage 3: q135 incremental dedup over the ENRICHED
    // output vs a full batch recompute — identical pairs, seeded non-empty
    val newDocs = p2.processedState.toDF("doc_id", "text")
    val hist = docs.join(newDocs.select("doc_id"), Seq("doc_id"), "left_anti")
    val inc = Dedup.incrementalCandidatePairs(
      withBands(hist), withBands(newDocs), "doc_id", "bands")
      .as[(Long, Long)].collect().toSet
    val newIdSet = reqIds.toSet
    val truth = Dedup.candidatePairs(allBands, "doc_id", "bands")
      .as[(Long, Long)].collect().toSet
      .filter(p => newIdSet(p._1) || newIdSet(p._2))
    assert(inc == truth, s"incremental dedup != batch recompute " +
      s"(${inc.size} vs ${truth.size} pairs)")
    assert(inc((math.min(pa, pb), math.max(pa, pb))),
      "seeded near-dup pair missing - dedup stage vacuous")
  }

  // The round-8 streaming-ANN capstone: arriving vectors PROBE the
  // persisted IVF index (stream-static, pre-batch state) and then FOLD in
  // via the frozen-centroid delta (q142's applyIndexDelta economics),
  // with a KILL mid-stream and a resume from the checkpoint + commit
  // markers, and a wave arriving while the stream is down. Final index
  // must equal the from-scratch batch rebuild exactly; the first wave's
  // probe results must equal a batch IVF search against the base index.
  test("streaming ANN capstone: stream-probed, delta-folded IVF index " +
      "survives kill-and-resume and equals the batch rebuild") {
    import graft.operators.Similarity
    import graft.streaming.StreamingIvf
    import org.apache.spark.sql.streaming.Trigger

    val raw = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    def prep(df: org.apache.spark.sql.DataFrame) =
      Similarity.prepared(df, "embedding")
        .select(col("vec_id"), col("vec"), col("nrm"))
    val corpus = prep(raw)
    val base = corpus.filter(col("vec_id") % 10 < 7)
    val cents = base.filter(col("vec_id") % 40 === 0) // q142's every-40th
    val dir = Files.createTempDirectory("graft-sivf-idx").toString
    StreamingIvf.init(spark, dir, base, cents)
    assert(StreamingIvf.committedDeltas(dir) == Seq("base"))

    // arriving waves land as single parquet files in a watched directory —
    // the file source replays uncommitted files across the restart
    val streamDir = Files.createTempDirectory("graft-sivf-in")
    def dropWave(tag: Int): Unit = {
      val tmp = Files.createTempDirectory(s"graft-sivf-w$tag").toString
      raw.filter(col("vec_id") % 10 === tag).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, streamDir.resolve(s"wave$tag.parquet"))
    }
    val outDir = Files.createTempDirectory("graft-sivf-out").toString
    val ckpt = Files.createTempDirectory("graft-sivf-ckpt").toString
    def startStream() = StreamingIvf.start(spark, dir,
      prep(spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)),
      outDir, ckpt, k = 4, nprobe = 2,
      Trigger.ProcessingTime("200 milliseconds"))

    // ---- phase 1: wave 7 arrives, gets probed + folded; then KILL
    dropWave(7)
    val q1 = startStream()
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (!StreamingIvf.committedDeltas(dir).contains("b0") &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q1.stop()
    assert(StreamingIvf.committedDeltas(dir).contains("b0"),
      "wave 7 never folded before the kill")
    val midCount = StreamingIvf.loadIndex(spark, dir).assignments.count()
    assert(midCount == base.count() + raw.filter(col("vec_id") % 10 === 7).count(),
      s"mid-stream index holds $midCount rows")

    // wave 8 arrives while the stream is DOWN; wave 9 after the resume
    dropWave(8)
    val q2 = startStream()
    try {
      dropWave(9)
      val total = corpus.count()
      val deadline = System.currentTimeMillis() + 180000
      while (StreamingIvf.loadIndex(spark, dir).assignments.count() < total &&
        System.currentTimeMillis() < deadline) Thread.sleep(300)
      assert(StreamingIvf.loadIndex(spark, dir).assignments.count() == total,
        "index never reached the full corpus after resume")
    } finally q2.stop()

    // ---- the capstone equality: delta-maintained index == batch rebuild
    val got = StreamingIvf.loadIndex(spark, dir).assignments
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toSet
    val want = Similarity.buildIvfIndex(corpus, cents).assignments
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toSet
    assert(got == want,
      s"streamed index != batch rebuild (${got.size} vs ${want.size} rows)")
    assert(got.size == 500, s"every corpus vector indexed once, got ${got.size}")

    // ---- probe outputs: wave 7 (batch 0, pre-kill) must equal a batch
    // IVF search against the BASE index — the stream-static serve path
    val p0 = spark.read.parquet(s"$outDir/d=b0")
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val w0 = Similarity.ivfTopKFromIndex(
        Similarity.buildIvfIndex(base, cents),
        prep(raw.filter(col("vec_id") % 10 === 7)), 4, 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(p0 == w0, s"wave-7 probe diverged from the batch IVF search " +
      s"(${p0.size} vs ${w0.size} rows)")
    // every arriving vector was served k results, never itself
    val served = StreamingIvf.committedDeltas(outDir)
      .map(n => spark.read.parquet(s"$outDir/d=$n"))
      .reduce(_ unionByName _)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(served.forall { case (q, n) => q != n }, "a vector matched itself")
    val perQuery = served.groupBy(_._1).map { case (_, v) => v.length }.toSet
    assert(perQuery == Set(4), s"expected 4 neighbors per query: $perQuery")
    assert(served.map(_._1).toSet ==
      corpus.filter(col("vec_id") % 10 >= 7).select("vec_id")
        .as[Long].collect().toSet,
      "served query set != arriving vector set")

    // ---- LSM compaction: rewrite the 4-delta index (base + 3 waves) as
    // a single fresh base, with a KILL MID-COMPACTION first. Simulate the
    // kill state exactly: data written, commit marker NOT yet placed, one
    // parquet file truncated mid-flight.
    val cdir = Files.createTempDirectory("graft-sivf-compact").toString
    StreamingIvf.compact(spark, dir, cdir)
    val marker = java.nio.file.Paths.get(s"$cdir/commits/base")
    Files.delete(marker) // roll back to the pre-commit instant...
    val dataFile = new java.io.File(s"$cdir/assign/d=base").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.write(dataFile.toPath,
      Array[Byte](1, 2, 3)) // ...with a half-written file
    // the half-written target must refuse to serve
    intercept[IllegalArgumentException] {
      StreamingIvf.loadIndex(spark, cdir)
    }
    // resume: re-run compact — deterministic overwrite, then marker
    StreamingIvf.compact(spark, dir, cdir)
    assert(StreamingIvf.committedDeltas(cdir) == Seq("base"))
    val compacted = StreamingIvf.loadIndex(spark, cdir).assignments
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toSet
    assert(compacted == want, "compacted index != batch rebuild")
    // in-place compaction is refused (it would read what it overwrites)
    intercept[IllegalArgumentException] {
      StreamingIvf.compact(spark, dir, dir)
    }

    // ---- LSM tombstones (round 9): takedown ids leave the inverted
    // lists on read; the maintained view equals the batch rebuild over
    // (corpus ∖ takedown); compaction materializes and clears
    def assignSet(ix: Similarity.IvfIndex): Set[(Long, Long)] =
      ix.assignments.select("vec_id", "centroid_id")
        .as[(Long, Long)].collect().toSet
    StreamingIvf.tombstoneVectors(spark, dir,
      corpus.filter(col("vec_id") % 10 === 4).select("vec_id"), "t0")
    val keptWant = assignSet(Similarity.buildIvfIndex(
      corpus.filter(col("vec_id") % 10 =!= 4), cents))
    assert(assignSet(StreamingIvf.loadIndex(spark, dir)) == keptWant,
      "tombstoned IVF view != rebuild over kept vectors")
    // marker-last: an uncommitted tombstone batch is invisible
    corpus.filter(col("vec_id") % 10 === 5).select("vec_id")
      .write.mode("overwrite").parquet(s"$dir/tombstones/d=t9")
    assert(assignSet(StreamingIvf.loadIndex(spark, dir)) == keptWant,
      "uncommitted tombstones leaked into the IVF view")
    val cdir3 = Files.createTempDirectory("graft-sivf-compact3").toString
    StreamingIvf.compact(spark, dir, cdir3)
    assert(StreamingIvf.committedTombstones(cdir3).isEmpty,
      "IVF compaction must clear tombstone markers")
    assert(assignSet(StreamingIvf.loadIndex(spark, cdir3)) == keptWant,
      "compacted tombstoned IVF index != rebuild")

    // ---- LSM UPSERT (round 10): %10==6 re-ingests with reversed
    // embeddings in ONE batch — tombstone + re-fold under one name
    // ("u5" sorts after every committed op, and its tombstone applies
    // before its own segment). View must equal the rebuild over
    // ((corpus ∖ t0-takedown) ∖ upsert-ids) ∪ updated, with no compact
    // in between — the ordered-LSM rule at work.
    val updatedVecs = prep(raw.filter(col("vec_id") % 10 === 6)
      .withColumn("embedding", reverse(col("embedding"))))
    StreamingIvf.upsertBatch(spark, dir, updatedVecs, "u5")
    val upsertWant = assignSet(Similarity.buildIvfIndex(
      prep(raw.filter(col("vec_id") % 10 =!= 4)
        .withColumn("embedding", when(col("vec_id") % 10 === 6,
          reverse(col("embedding"))).otherwise(col("embedding")))), cents))
    assert(assignSet(StreamingIvf.loadIndex(spark, dir)) == upsertWant,
      "one-batch LSM upsert != rebuild over (corpus ∖ deleted) ∪ updated")
    // idempotent under replay: re-applying the same upsert changes nothing
    StreamingIvf.upsertBatch(spark, dir, updatedVecs, "u5")
    assert(assignSet(StreamingIvf.loadIndex(spark, dir)) == upsertWant,
      "upsert replay must be a no-op")
    // kill MID-upsert (tombstone committed, fold not): the view serves
    // the retraction-only intermediate; resuming the batch converges
    val udir = Files.createTempDirectory("graft-sivf-upsert").toString
    StreamingIvf.compact(spark, dir, udir) // fresh single-segment copy
    StreamingIvf.tombstoneVectors(spark, udir,
      updatedVecs.select("vec_id"), "u7")
    assert(assignSet(StreamingIvf.loadIndex(spark, udir)) ==
      upsertWant.filterNot(_._1 % 10 == 6),
      "mid-upsert view must serve the retraction-only intermediate")
    StreamingIvf.upsertBatch(spark, udir, updatedVecs, "u7")
    assert(assignSet(StreamingIvf.loadIndex(spark, udir)) == upsertWant,
      "resumed upsert did not converge to the rebuild")
  }

  // The round-8 streaming-retrieval capstone: the q213/q214 delta-
  // maintained inverted index wired into Structured Streaming with the
  // StreamingIvf probe-then-fold contract — arriving docs are BM25-probed
  // against the pre-batch index (lexical arrival-novelty serve path),
  // then folded in as log-structured segments; KILLED between waves and
  // resumed from the checkpoint; finally COMPACTED. Equality asserted
  // against the monolithic batch rebuild at every observable: postings
  // surface, BM25 scores, and the pre-kill probe output.
  test("streaming retrieval capstone: stream-probed, segment-folded inverted " +
      "index survives kill-and-resume, equals the batch rebuild, compacts") {
    import graft.operators.{Dedup, Retrieval}
    import graft.streaming.StreamingIndex
    import org.apache.spark.sql.streaming.Trigger

    val raw = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    def toks(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), Dedup.tokens(col("text")).as("tok"))
    val all = toks(raw)
    val base = all.filter(col("doc_id") % 10 < 7)
    val dir = Files.createTempDirectory("graft-sidx").toString
    StreamingIndex.init(spark, dir, base, "doc_id", "tok")
    assert(StreamingIndex.committedDeltas(dir) == Seq("base"))

    val streamDir = Files.createTempDirectory("graft-sidx-in")
    def dropWave(tag: Int): Unit = {
      val tmp = Files.createTempDirectory(s"graft-sidx-w$tag").toString
      raw.filter(col("doc_id") % 10 === tag).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, streamDir.resolve(s"wave$tag.parquet"))
    }
    val outDir = Files.createTempDirectory("graft-sidx-out").toString
    val ckpt = Files.createTempDirectory("graft-sidx-ckpt").toString
    def startStream() = StreamingIndex.start(spark, dir,
      toks(spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)),
      "doc_id", "tok", outDir, ckpt, k = 5,
      Trigger.ProcessingTime("200 milliseconds"))

    // ---- phase 1: wave 7 arrives, gets probed + folded; then KILL
    dropWave(7)
    val q1 = startStream()
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (!StreamingIndex.committedDeltas(dir).contains("b0") &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q1.stop()
    assert(StreamingIndex.committedDeltas(dir).contains("b0"),
      "wave 7 never folded before the kill")
    val midDocs = StreamingIndex.loadIndex(spark, dir).docs.count()
    assert(midDocs == base.count() +
      all.filter(col("doc_id") % 10 === 7).count(),
      s"mid-stream index holds $midDocs doc rows")

    // wave 8 arrives while the stream is DOWN; wave 9 after the resume
    dropWave(8)
    val q2 = startStream()
    try {
      dropWave(9)
      val total = all.count()
      val deadline = System.currentTimeMillis() + 180000
      while (StreamingIndex.loadIndex(spark, dir).docs.count() < total &&
        System.currentTimeMillis() < deadline) Thread.sleep(300)
      assert(StreamingIndex.loadIndex(spark, dir).docs.count() == total,
        "index never reached the full corpus after resume")
    } finally q2.stop()

    // ---- capstone equality 1: the postings SURFACE of the maintained
    // index equals the monolithic rebuild (token, df, n_postings,
    // serialized postings string — every field, every term)
    val maintained = StreamingIndex.loadIndex(spark, dir)
    val rebuilt = Retrieval.buildIndex(all, "doc_id", "tok")
    def surface(ix: Retrieval.RetrievalIndex) =
      Retrieval.invertedIndexFromIndex(ix)
        .as[(String, Long, Long, String)].collect().toSet
    assert(surface(maintained) == surface(rebuilt),
      "maintained postings surface != batch rebuild")

    // ---- capstone equality 2: BM25 scores served from the maintained
    // tables equal the rebuild's (df/dl/stats maintenance is exact)
    val queryTerms = Retrieval.topTermsFromIndex(rebuilt, 8)
    def scores(ix: Retrieval.RetrievalIndex) =
      Retrieval.bm25FromIndex(ix, queryTerms, k = 10)
        .as[(String, Long, Long, Double)].collect().toSet
    assert(scores(maintained) == scores(rebuilt),
      "maintained BM25 != rebuild BM25")

    // ---- probe output: wave 7 (batch 0, pre-kill) must equal the batch
    // BM25 search of those docs against the BASE index
    val p0 = spark.read.parquet(s"$outDir/d=b0")
      .select("query_doc", "doc_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val w7 = all.filter(col("doc_id") % 10 === 7)
    val want0 = Retrieval.bm25QueriesFromIndex(
        Retrieval.buildIndex(base, "doc_id", "tok"),
        w7.select(col("doc_id").as("query_doc"),
          explode(col("tok")).as("term")),
        "query_doc", k = 5)
      .select("query_doc", "doc_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(p0 == want0, s"wave-7 probe diverged from the batch BM25 " +
      s"search (${p0.size} vs ${want0.size} rows)")
    // a document never probes into itself (disjoint-ids contract)
    assert(p0.forall { case (q, d, _) => q != d })

    // ---- compaction: rewrite the 4-segment index as one base segment;
    // the compacted view must stay bit-identical on both observables
    val cdir = Files.createTempDirectory("graft-sidx-compact").toString
    StreamingIndex.compact(spark, dir, cdir)
    assert(StreamingIndex.committedDeltas(cdir) == Seq("base"))
    val compacted = StreamingIndex.loadIndex(spark, cdir)
    assert(surface(compacted) == surface(rebuilt), "compaction changed postings")
    assert(scores(compacted) == scores(rebuilt), "compaction changed BM25")

    // in-place compaction would read the very parquet dirs it overwrites
    // (lazy loadIndex) — the guard must refuse, including the dot-relative
    // spelling of the same path
    intercept[IllegalArgumentException] {
      StreamingIndex.compact(spark, dir, dir)
    }
    intercept[IllegalArgumentException] {
      StreamingIndex.compact(spark, dir, dir + "/./")
    }

    // ---- LSM tombstones (round 9): a takedown batch lands as an
    // O(|batch|) delete-marker segment; loadIndex applies the exact
    // retraction algebra on read — the maintained view must equal the
    // batch rebuild over (corpus ∖ takedown) on BOTH observables
    val takedown = all.filter(col("doc_id") % 10 === 2).select("doc_id")
    StreamingIndex.tombstoneDocs(spark, dir, takedown, "t0")
    val kept = all.filter(col("doc_id") % 10 =!= 2)
    val rebuiltKept = Retrieval.buildIndex(kept, "doc_id", "tok")
    assert(surface(StreamingIndex.loadIndex(spark, dir)) ==
      surface(rebuiltKept), "tombstoned view != rebuild over kept docs")
    val qtKept = Retrieval.topTermsFromIndex(rebuiltKept, 8)
    def keptScores(ix: Retrieval.RetrievalIndex) =
      Retrieval.bm25FromIndex(ix, qtKept, k = 10)
        .as[(String, Long, Long, Double)].collect().toSet
    assert(keptScores(StreamingIndex.loadIndex(spark, dir)) ==
      keptScores(rebuiltKept), "tombstoned BM25 != rebuild over kept docs")
    // idempotent: the same takedown tombstoned twice subtracts nothing new
    StreamingIndex.tombstoneDocs(spark, dir, takedown, "t1")
    assert(surface(StreamingIndex.loadIndex(spark, dir)) ==
      surface(rebuiltKept), "re-tombstoning the same ids changed the view")
    // marker-last: an UNCOMMITTED tombstone batch is invisible
    all.filter(col("doc_id") % 10 === 4).select("doc_id")
      .write.mode("overwrite").parquet(s"$dir/tombstones/d=t9")
    assert(surface(StreamingIndex.loadIndex(spark, dir)) ==
      surface(rebuiltKept), "uncommitted tombstones leaked into the view")
    // compaction MATERIALIZES the deletion and clears the markers
    val cdir2 = Files.createTempDirectory("graft-sidx-compact2").toString
    StreamingIndex.compact(spark, dir, cdir2)
    assert(StreamingIndex.committedTombstones(cdir2).isEmpty,
      "compaction must clear tombstone markers")
    assert(surface(StreamingIndex.loadIndex(spark, cdir2)) ==
      surface(rebuiltKept), "compacted tombstoned index != rebuild")

    // ---- LSM UPSERT (round 10): %10==6 re-ingests with CHANGED tokens
    // in ONE batch — tombstone + re-fold under one name, no compact in
    // between (the ordered-LSM rule: the tombstone suppresses every
    // earlier copy, its own same-named segment lands after). Postings,
    // df, doc lengths, and the corpus stats must all equal the batch
    // rebuild over (kept ∖ upsert-ids) ∪ updated.
    val updated = all.filter(col("doc_id") % 10 === 6)
      .withColumn("tok", concat(col("tok"), array(lit("upserted"))))
    StreamingIndex.upsertBatch(spark, dir, updated, "doc_id", "tok", "u5")
    val upWant = Retrieval.buildIndex(
      kept.filter(col("doc_id") % 10 =!= 6).unionByName(updated),
      "doc_id", "tok")
    assert(surface(StreamingIndex.loadIndex(spark, dir)) == surface(upWant),
      "one-batch LSM upsert != rebuild over (kept ∖ upserted) ∪ updated")
    val qtUp = Retrieval.topTermsFromIndex(upWant, 8)
    def upScores(ix: Retrieval.RetrievalIndex) =
      Retrieval.bm25FromIndex(ix, qtUp, k = 10)
        .as[(String, Long, Long, Double)].collect().toSet
    assert(upScores(StreamingIndex.loadIndex(spark, dir)) == upScores(upWant),
      "upserted BM25 != rebuild (df/dl/stats maintenance broke)")
    // idempotent under replay: the same upsert re-applied changes nothing
    StreamingIndex.upsertBatch(spark, dir, updated, "doc_id", "tok", "u5")
    assert(surface(StreamingIndex.loadIndex(spark, dir)) == surface(upWant),
      "upsert replay changed the view")
  }

  // Streaming CUSUM: the q225 recurrence as live keyed state — killed
  // between waves, resumed from the checkpoint, and the full emitted
  // series must equal the in-memory sequential recurrence over the
  // concatenated waves (state really survived; nothing double-counted).
  test("streaming Misra-Gries heavy hitters: bounded keyed state survives " +
      "kill-and-resume; sketch equals the sequential fold and keeps the " +
      "MG guarantee") {
    import graft.streaming.StreamingHeavyHitters
    import graft.streaming.StreamingHeavyHitters.{Estimate, ItemEvent}
    import org.apache.spark.sql.streaming.Trigger
    val priorStore =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val capacity = 4
      // group A: one genuine heavy hitter over a churning tail — "hot"
      // (30 of 54 = well past N/(cap+1) = 10.8) must survive; group B:
      // uniform churn, nothing must dominate
      val w1 = Seq.fill(18)(ItemEvent("A", "hot")) ++
        (1 to 6).flatMap(i => Seq.fill(2)(ItemEvent("A", s"t$i"))) ++
        (1 to 8).map(i => ItemEvent("B", s"b$i"))
      val w2 = Seq.fill(12)(ItemEvent("A", "hot")) ++
        (7 to 12).flatMap(i => Seq.fill(2)(ItemEvent("A", s"t$i"))) ++
        (1 to 8).map(i => ItemEvent("B", s"b$i"))
      val streamDir = Files.createTempDirectory("graft-mg-in")
      def drop(tag: String, evs: Seq[ItemEvent]): Unit = {
        val tmp = Files.createTempDirectory(s"graft-mg-$tag").toString
        evs.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, streamDir.resolve(s"$tag.parquet"))
      }
      val outDir = Files.createTempDirectory("graft-mg-out").toString
      val ckpt = Files.createTempDirectory("graft-mg-ckpt").toString
      val schema = Seq.empty[ItemEvent].toDF().schema
      def startStream() = StreamingHeavyHitters.track(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
            .as[ItemEvent], capacity)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("200 milliseconds"))
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Estimate],
            id: Long) =>
          // replayed/empty triggers emit nothing - don't leave
          // schema-less parquet dirs behind
          if (!df.isEmpty)
            df.write.mode("overwrite").parquet(s"$outDir/d=b$id")
        }
        .start()
      drop("w1", w1)
      val q1 = startStream()
      try {
        val deadline = System.currentTimeMillis() + 120000
        while (!new java.io.File(s"$outDir/d=b0").exists() &&
          System.currentTimeMillis() < deadline) Thread.sleep(200)
        Thread.sleep(500)
      } finally q1.stop() // KILL between waves
      drop("w2", w2) // arrives while the sketch is down
      def dataDirs(): Seq[String] =
        Option(new java.io.File(outDir).list()).map(_.toSeq)
          .getOrElse(Seq.empty).filter(_.startsWith("d=b")).sorted
      val q2 = startStream()
      try {
        val deadline = System.currentTimeMillis() + 180000
        while (dataDirs().size < 2 &&
          System.currentTimeMillis() < deadline) Thread.sleep(200)
        Thread.sleep(500)
      } finally q2.stop()
      // the LAST written batch's emission per group is the final sketch
      val lastDir = dataDirs().maxBy(n => n.stripPrefix("d=b").toInt)
      val all = spark.read.parquet(s"$outDir/$lastDir").as[Estimate]
        .collect()
      // live sketch rows only — est=0 rows are the batch's eviction
      // RETRACTIONS (asserted below), not sketch content
      val got = all.filter(_.est > 0)
        .groupBy(_.group)
        .map { case (g, es) => g -> es.map(e => e.item -> e.est).toMap }
      // reference: the shared sequential fold, wave by wave, sorted
      // within each wave exactly as the processor folds each batch
      val ref = (w1 ++ Nil).groupBy(_.group).keySet.map { g =>
        val s1 = w1.filter(_.group == g).map(_.item).sorted
          .foldLeft(Map.empty[String, Long])(
            (m, it) => StreamingHeavyHitters.mgFold(m, it, capacity))
        val s2 = w2.filter(_.group == g).map(_.item).sorted
          .foldLeft(s1)(
            (m, it) => StreamingHeavyHitters.mgFold(m, it, capacity))
        g -> s2
      }.toMap
      assert(got == ref,
        s"streamed MG sketch != sequential fold: got $got want $ref")
      // the MG guarantee on the full stream: true(hot)=30, N=54 for A,
      // error <= N/(cap+1) = 10.8
      val hotEst = got("A").getOrElse("hot", 0L)
      assert(hotEst >= 30L - 54L / (capacity + 1) - 1,
        s"heavy hitter undercounted past the MG bound: $hotEst")
      assert(got("A").size <= capacity && got("B").size <= capacity,
        "sketch exceeded its capacity bound")
      // eviction retractions: every item the last batch's decrements
      // dropped from the carried-over sketch must emit an est=0 row, so
      // an upsert sink keyed (group, item) cannot pin stale estimates —
      // and no item may be both live and retracted in one emission
      val zeros = all.filter(_.est == 0L)
        .groupBy(_.group)
        .map { case (g, es) => g -> es.map(_.item).toSet }
      val prevRef = (w1 ++ Nil).groupBy(_.group).keySet.map { g =>
        g -> w1.filter(_.group == g).map(_.item).sorted
          .foldLeft(Map.empty[String, Long])(
            (m, it) => StreamingHeavyHitters.mgFold(m, it, capacity))
      }.toMap
      val wantZeros = prevRef.map { case (g, before) =>
        g -> (before.keySet -- ref(g).keySet)
      }.filter(_._2.nonEmpty)
      assert(zeros == wantZeros,
        s"eviction retractions mismatch: got $zeros want $wantZeros")
      zeros.foreach { case (g, its) =>
        assert(its.intersect(got.getOrElse(g, Map.empty).keySet).isEmpty,
          s"item both live and retracted in one emission: $g $its")
      }
    } finally {
      priorStore match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("Misra-Gries parity: flatMapGroupsWithState twin == " +
      "transformWithState == the sequential fold") {
    import graft.streaming.StreamingHeavyHitters
    import graft.streaming.StreamingHeavyHitters.{Estimate, ItemEvent}
    import org.apache.spark.sql.streaming.Trigger
    val capacity = 3
    val wave = Seq.fill(9)(ItemEvent("A", "hot")) ++
      (1 to 5).flatMap(i => Seq.fill(2)(ItemEvent("A", s"t$i"))) ++
      (1 to 6).map(i => ItemEvent("B", s"b$i"))
    val ref = wave.groupBy(_.group).map { case (g, evs) =>
      g -> evs.map(_.item).sorted.foldLeft(Map.empty[String, Long])(
        (m, it) => StreamingHeavyHitters.mgFold(m, it, capacity))
    }
    def run(api: String): Map[String, Map[String, Long]] = {
      val inDir = Files.createTempDirectory(s"graft-mgp-in-$api")
      wave.toDF().coalesce(1).write.mode("overwrite")
        .parquet(inDir.resolve("w.parquet").toString)
      val outDir = Files.createTempDirectory(s"graft-mgp-out-$api").toString
      val ckpt = Files.createTempDirectory(s"graft-mgp-ck-$api").toString
      val schema = Seq.empty[ItemEvent].toDF().schema
      val src = spark.readStream.schema(schema)
        .parquet(inDir.resolve("w.parquet").toString).as[ItemEvent]
      val sk =
        if (api == "legacy") StreamingHeavyHitters.trackLegacy(src, capacity)
        else StreamingHeavyHitters.track(src, capacity)
      val q = sk.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Estimate],
            id: Long) =>
          if (!df.isEmpty)
            df.write.mode("overwrite").parquet(s"$outDir/d=b$id")
        }
        .start()
      q.awaitTermination(120000)
      // first batch starts from empty state: nothing can be evicted-
      // with-retraction below a positive estimate, but filter anyway so
      // the comparison reads sketch content only
      spark.read.parquet(s"$outDir/d=b0").as[Estimate].collect()
        .filter(_.est > 0)
        .groupBy(_.group)
        .map { case (g, es) => g -> es.map(e => e.item -> e.est).toMap }
    }
    // legacy runs on the default HDFS-backed store (its own parity
    // point); transformWithState requires RocksDB (column families)
    val legacy = run("legacy")
    val priorStore =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val tws =
      try run("tws")
      finally priorStore match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    assert(legacy == ref, s"legacy twin != fold: $legacy vs $ref")
    assert(tws == ref, s"transformWithState != fold: $tws vs $ref")
  }

  test("streaming drift monitor continues the CUSUM fold across " +
      "kill-and-resume, equal to the batch recurrence") {
    import graft.streaming.DriftMonitor
    import graft.streaming.DriftMonitor.{Alarm, Obs}
    import org.apache.spark.sql.streaming.Trigger

    val rnd = new scala.util.Random(23)
    // level shift at t > 30 on key A only
    val series = (1L to 45L).map(t => Obs("A", t,
      rnd.nextInt(4).toLong + (if (t > 30) 5L else 0L))) ++
      (1L to 45L).map(t => Obs("B", t, rnd.nextInt(4).toLong))
    val (w1, w2) = series.partition(_.t <= 25)

    val streamDir = Files.createTempDirectory("graft-drift-in")
    def drop(tag: String, obs: Seq[Obs]): Unit = {
      val tmp = Files.createTempDirectory(s"graft-drift-$tag").toString
      obs.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, streamDir.resolve(s"$tag.parquet"))
    }
    val outDir = Files.createTempDirectory("graft-drift-out").toString
    val ckpt = Files.createTempDirectory("graft-drift-ckpt").toString
    val schema = Seq.empty[Obs].toDF().schema
    def startStream() = DriftMonitor.monitor(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
          .as[Obs],
        mu = 1L, k = 1L, h = 8L)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()

    drop("w1", w1)
    val q1 = startStream()
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (spark.read.schema(Seq.empty[Alarm].toDF().schema)
        .parquet(outDir).count() < w1.size &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q1.stop() // KILL between waves
    drop("w2", w2) // arrives while the monitor is down
    val q2 = startStream()
    try {
      val deadline = System.currentTimeMillis() + 180000
      while (spark.read.parquet(outDir).count() < series.size &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q2.stop()

    val got = spark.read.parquet(outDir).as[Alarm].collect()
      .map(a => (a.key, a.t) -> (a.s, a.alarm)).toMap
    assert(got.size == series.size, s"expected ${series.size} rows, got ${got.size}")
    // in-memory sequential reference over each key's full ordered series
    val ref = series.groupBy(_.key).flatMap { case (key, obs) =>
      var s = 0L
      obs.sortBy(_.t).map { e =>
        s = math.max(0L, s + e.x - 1L - 1L)
        (key, e.t) -> (s, s >= 8L)
      }
    }.toMap
    assert(got == ref, "streamed CUSUM diverged from the batch recurrence")
    // the level shift must alarm on A after the kill boundary, never on B
    assert(got.exists { case ((k, t), (_, a)) => k == "A" && t > 30 && a })
    assert(!got.exists { case ((k, _), (_, a)) => k == "B" && a })
  }

  // The transformWithState twin of the test above (round-9): same waves,
  // same kill boundary, RocksDB state store — the V2 API must continue
  // the identical fold and match the same batch recurrence, so BOTH
  // keyed-state APIs are asserted equal to the reference.
  test("streaming drift monitor V2 (transformWithState, RocksDB) survives " +
      "kill-and-resume, equal to the batch recurrence") {
    import graft.streaming.DriftMonitor
    import graft.streaming.DriftMonitor.{Alarm, Obs}
    import org.apache.spark.sql.streaming.Trigger

    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(23)
      val series = (1L to 45L).map(t => Obs("A", t,
        rnd.nextInt(4).toLong + (if (t > 30) 5L else 0L))) ++
        (1L to 45L).map(t => Obs("B", t, rnd.nextInt(4).toLong))
      val (w1, w2) = series.partition(_.t <= 25)

      val streamDir = Files.createTempDirectory("graft-drift2-in")
      def drop(tag: String, obs: Seq[Obs]): Unit = {
        val tmp = Files.createTempDirectory(s"graft-drift2-$tag").toString
        obs.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, streamDir.resolve(s"$tag.parquet"))
      }
      val outDir = Files.createTempDirectory("graft-drift2-out").toString
      val ckpt = Files.createTempDirectory("graft-drift2-ckpt").toString
      val schema = Seq.empty[Obs].toDF().schema
      def startStream() = DriftMonitor.monitorV2(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
            .as[Obs],
          mu = 1L, k = 1L, h = 8L)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("200 milliseconds"))
        .start()

      drop("w1", w1)
      val q1 = startStream()
      try {
        val deadline = System.currentTimeMillis() + 120000
        while (spark.read.schema(Seq.empty[Alarm].toDF().schema)
          .parquet(outDir).count() < w1.size &&
          System.currentTimeMillis() < deadline) Thread.sleep(200)
      } finally q1.stop() // KILL between waves
      drop("w2", w2)
      val q2 = startStream()
      try {
        val deadline = System.currentTimeMillis() + 180000
        while (spark.read.parquet(outDir).count() < series.size &&
          System.currentTimeMillis() < deadline) Thread.sleep(200)
      } finally q2.stop()

      val got = spark.read.parquet(outDir).as[Alarm].collect()
        .map(a => (a.key, a.t) -> (a.s, a.alarm)).toMap
      assert(got.size == series.size,
        s"expected ${series.size} rows, got ${got.size}")
      val ref = series.groupBy(_.key).flatMap { case (key, obs) =>
        var s = 0L
        obs.sortBy(_.t).map { e =>
          s = math.max(0L, s + e.x - 1L - 1L)
          (key, e.t) -> (s, s >= 8L)
        }
      }.toMap
      assert(got == ref, "V2 streamed CUSUM diverged from the batch recurrence")
      assert(got.exists { case ((k, t), (_, a)) => k == "A" && t > 30 && a })
      assert(!got.exists { case ((k, _), (_, a)) => k == "B" && a })
    } finally prior match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("pipeline state survives restart (versioned pointer recovery)") {
    val stateDir = Files.createTempDirectory("graft-state").toString
    val p1 = new IngestPipeline(spark, stateDir)
    p1.processMicroBatch(Seq(("R", Seq(1L, 2L, 3L, 4L), "HIGH",
      ts("2024-01-01 00:00:00"))).toDF("ingestion_id", "ids", "priority", "created_at"), 0)
    assert(p1.overallStatus.as[(String, String)].collect().toMap ==
      Map("R" -> Status.Triggered))
    // fresh instance over the same state dir = process restart
    val p2 = new IngestPipeline(spark, stateDir)
    assert(p2.currentVersion == p1.currentVersion)
    p2.processMicroBatch(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      p1.batchState.schema).limit(0).select(
      col("ingestion_id"), col("ids"), col("priority"), col("created_at")), 1)
    assert(p2.overallStatus.as[(String, String)].collect().toMap ==
      Map("R" -> Status.Completed))
    assert(p2.processedState.count() == 4)
  }

  // The LCP descent's parquet spill path (round 13) must be covered by
  // the suite, not only by bench-scale runs: force the char-row bar to
  // 0 so a small fixture takes the disk-backed branch (levels, pruned
  // pairs, and per-round tables all via scratch parquet), and assert
  // the result is row-identical to the below-bar checkpoint branch —
  // the two paths claim to differ only in where a level's rows live.
  // Round 16 made the DIRECT dup-gram form the query path
  // (lcpAdjacentPairs) and kept the doubling form for the adversarial
  // all-duplicate regime: the same run now also pins direct == doubling
  // pair for pair, the equivalence the rewrite's scaladoc argues.
  test("lcpAdjacentPairs: direct == doubling, spill == checkpoint, " +
      "row for row") {
    import graft.operators.Dedup
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    def run() = Dedup.lcpAdjacentPairsByDoubling(docs, "doc_id", "text",
        minLcp = 20)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val viaCkpt = run()
    assert(viaCkpt.nonEmpty, "fixture has no qualifying pairs — vacuous")
    val direct = Dedup.lcpAdjacentPairs(docs, "doc_id", "text", minLcp = 20)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(direct == viaCkpt,
      "direct dup-gram LCP pairs != prefix-doubling LCP pairs")
    val key = "graft.lcp.spillCharBar"
    sys.props(key) = "0"
    try assert(run() == viaCkpt,
      "spill-path LCP pairs != checkpoint-path LCP pairs")
    finally { sys.props.remove(key); () }
  }

  // The streaming twin of the maintained gram prefilter (round-12
  // verdict #6): arriving docs are gated against the committed count
  // table, their counts fold in as additive segments, the stream is
  // KILLED between waves and resumed from the checkpoint — and every
  // observable equals the batch q314 serve: the maintained table equals
  // dupGramCounts over everything ingested, the served flags equal the
  // batch dupGramStats, the pre-kill gate output equals the batch serve
  // against the base-only table, and a negated-count retraction segment
  // equals the rebuild over the remaining docs.
  test("streaming dedup gate: gram-count prefilter survives kill-and-resume " +
      "and equals the batch dupGramStats") {
    import graft.operators.Dedup
    import graft.streaming.StreamingDedupGate
    import org.apache.spark.sql.streaming.Trigger

    val raw = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    val base = raw.filter(col("doc_id") % 10 < 7)
    val dir = Files.createTempDirectory("graft-sgate").toString
    StreamingDedupGate.init(spark, dir, base, "doc_id", "text", 30)
    assert(StreamingDedupGate.committedSegments(dir) == Seq("base"))

    val streamDir = Files.createTempDirectory("graft-sgate-in")
    def dropWave(tag: Int): Unit = {
      val tmp = Files.createTempDirectory(s"graft-sgate-w$tag").toString
      raw.filter(col("doc_id") % 10 === tag).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, streamDir.resolve(s"wave$tag.parquet"))
    }
    val outDir = Files.createTempDirectory("graft-sgate-out").toString
    val ckpt = Files.createTempDirectory("graft-sgate-ckpt").toString
    def startStream() = StreamingDedupGate.start(spark, dir,
      spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir.toString),
      "doc_id", "text", 30, outDir, ckpt,
      Trigger.ProcessingTime("200 milliseconds"))

    // ---- phase 1: wave 7 arrives, gets gated + folded; then KILL
    dropWave(7)
    val q1 = startStream()
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (!StreamingDedupGate.committedSegments(dir).contains("b0") &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q1.stop()
    assert(StreamingDedupGate.committedSegments(dir).contains("b0"),
      "wave 7 never folded before the kill")

    // wave 8 arrives while the stream is DOWN; wave 9 after the resume
    dropWave(8)
    val q2 = startStream()
    try {
      dropWave(9)
      val deadline = System.currentTimeMillis() + 180000
      while (StreamingDedupGate.committedSegments(dir).size < 4 &&
        System.currentTimeMillis() < deadline) Thread.sleep(300)
      assert(StreamingDedupGate.committedSegments(dir).size == 4,
        "waves 8/9 never folded after resume: " +
          StreamingDedupGate.committedSegments(dir))
    } finally q2.stop()

    def cset(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long)].collect().toSet

    // ---- equality 1: the maintained table == the batch rebuild
    val maintained = StreamingDedupGate.loadCounts(spark, dir)
    assert(cset(maintained) ==
      cset(Dedup.dupGramCounts(raw, "doc_id", "text", 30)),
      "maintained gram counts != batch dupGramCounts over everything")

    // ---- equality 2: the SERVED flags == the batch q314 serve
    assert(cset(Dedup.dupGramStats(raw, "doc_id", "text", 30, maintained)
        .select(col("id"), col("n_dup_gram_positions"))) ==
      cset(Dedup.dupGramStats(raw, "doc_id", "text", 30,
          Dedup.dupGramCounts(raw, "doc_id", "text", 30))
        .select(col("id"), col("n_dup_gram_positions"))),
      "served flags from the maintained table != batch serve")

    // ---- pre-kill gate output: wave 7 (batch 0) must equal the batch
    // serve of those docs against the BASE-only table
    val g0 = spark.read.parquet(s"$outDir/d=b0")
      .select(col("id"), col("n_dup_gram_positions"))
    val w7 = raw.filter(col("doc_id") % 10 === 7)
    assert(cset(g0) == cset(
      Dedup.dupGramStats(w7, "doc_id", "text", 30,
          Dedup.dupGramCounts(base, "doc_id", "text", 30))
        .select(col("id"), col("n_dup_gram_positions"))),
      "wave-7 gate output != batch serve against the pre-batch table")

    // ---- retraction: wave 9 takes down as one negated-count segment;
    // the view must equal the rebuild over base + waves 7/8
    StreamingDedupGate.retractBatch(spark, dir,
      raw.filter(col("doc_id") % 10 === 9), "doc_id", "text", 30, "t0")
    assert(cset(StreamingDedupGate.loadCounts(spark, dir)) ==
      cset(Dedup.dupGramCounts(raw.filter(col("doc_id") % 10 =!= 9),
        "doc_id", "text", 30)),
      "negated-segment retraction != rebuild over remaining docs")
  }

  test("generation-flip: kill mid-save leaves the previous generation serving (gram postings)") {
    import graft.operators.Dedup
    import graft.sources.Generations
    val dir = Files.createTempDirectory("graft-genflip-post").toString
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight again"),
      (2L, "the quick brown fox jumps over the lazy dog tonight again"),
      (3L, "a completely different document body with no shared gram runs"))
      .toDF("doc_id", "text")
    def pset(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    // generation 1: the day-N artifact
    Dedup.saveGramPostings(Dedup.gramPostings(docs, "doc_id", "text", 20), dir)
    val gen1 = pset(Dedup.loadGramPostings(spark, dir))
    assert(gen1.nonEmpty, "gen1 postings must be non-empty")

    // CRASH mid-save: the payload writer dies after part of the payload
    // is on disk. A failing WRITER (exception) cleans its own staging
    // dir; the loader keeps serving generation 1 either way.
    val crash = intercept[RuntimeException] {
      Generations.save(dir) { g =>
        Dedup.gramPostings(docs.limit(1), "doc_id", "text", 20)
          .write.parquet(s"$g/partial")
        throw new RuntimeException("simulated crash before commit")
      }
    }
    assert(crash.getMessage.contains("simulated crash"))
    // the loader still serves generation 1, bit-identically
    assert(pset(Dedup.loadGramPostings(spark, dir)) == gen1,
      "previous generation must keep serving after a crashed save")
    val genDirs = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!genDirs.exists(_.startsWith("_tmp_")),
      "exception-path save must clean its own staging dir")
    assert(Generations.latestCommitted(dir).exists(_.endsWith("gen_1")))
    // an unmarked claimed generation — impossible for a LIVE saver now
    // that the marker travels inside the stage (publish == the atomic
    // rename), but still reachable as debris (legacy protocol, a reap
    // that deleted the marker before the dir): loaders must refuse it
    new java.io.File(s"$dir/gen_5").mkdirs()
    assert(Generations.latestCommitted(dir).exists(_.endsWith("gen_1")),
      "an unmarked (killed) generation must never serve")

    // a successful save claims the next slot ABOVE the kill debris
    // (gen_6), the loader flips to it, the debris is reaped, and the
    // immediate committed predecessor is retained
    val docs2 = docs.unionByName(Seq((4L,
      "the quick brown fox jumps over the lazy dog tonight again"))
      .toDF("doc_id", "text"))
    Dedup.saveGramPostings(
      Dedup.gramPostings(docs2, "doc_id", "text", 20), dir)
    assert(pset(Dedup.loadGramPostings(spark, dir)) ==
      pset(Dedup.gramPostings(docs2, "doc_id", "text", 20)),
      "post-flip load must serve the new generation")
    val after = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(after.contains("gen_6"), "new save claims the next free slot")
    assert(after.contains("gen_1"), "one committed predecessor retained")
    assert(!after.contains("gen_5"), "uncommitted kill debris reaped")

    // a directory holding ONLY uncommitted generations refuses to load
    val empty = Files.createTempDirectory("graft-genflip-none").toString
    new java.io.File(s"$empty/gen_1").mkdirs()
    val refuse = intercept[IllegalStateException] {
      Dedup.loadGramPostings(spark, empty)
    }
    assert(refuse.getMessage.contains("no committed generation"))
  }

  // Round-15 advisor (medium): the 32→60-bit gram-key widening changed
  // the on-disk keyspace of every persisted gram store with no version
  // marker — a pre-widening store folded with new-width batch grams
  // yields DISJOINT key spaces, the witness/changed-set joins silently
  // under-include, and the incremental removal stops matching the full
  // rerun with NO error raised. Every gram surface now stamps its format
  // and every load/fold fails fast on mismatch (absent == unknown width
  // == rebuild).
  test("gram-key format stamp: mismatched or unstamped gram stores are " +
      "refused on load AND on fold, across all three persisted surfaces") {
    import graft.operators.Dedup
    import graft.streaming.{StreamingDedupGate, StreamingGramPostings}
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight again"),
      (2L, "the quick brown fox jumps over the lazy dog tonight again"),
      (3L, "a completely different document body with no shared gram runs"))
      .toDF("doc_id", "text")

    // ---- generation artifact: save stamps, load verifies
    val gdir = Files.createTempDirectory("graft-gramfmt-gen").toString
    Dedup.saveGramPostings(
      Dedup.gramPostings(docs, "doc_id", "text", 20), gdir)
    assert(Dedup.loadGramPostings(spark, gdir).count() > 0)
    // a FOREIGN-width stamp (a store written by a different build) must
    // refuse to load, naming both formats
    val genPath = graft.sources.Generations.loadPath(gdir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(genPath, "_GRAM_KEY_FORMAT"),
      "md5prefix32".getBytes("UTF-8"))
    val badLoad = intercept[IllegalArgumentException] {
      Dedup.loadGramPostings(spark, gdir)
    }
    assert(badLoad.getMessage.contains("md5prefix32") &&
      badLoad.getMessage.contains("md5prefix60"), badLoad.getMessage)
    // an UNSTAMPED generation (anything persisted before the stamp
    // existed — width unknown) is refused the same way
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(genPath, "_GRAM_KEY_FORMAT"))
    val absent = intercept[IllegalArgumentException] {
      Dedup.loadGramCounts(spark, gdir)
    }
    assert(absent.getMessage.contains("<absent>"), absent.getMessage)

    // ---- streaming postings store: a fold INTO a foreign-width store
    // is as fatal as a read from one
    val sdir = Files.createTempDirectory("graft-gramfmt-post").toString
    StreamingGramPostings.init(spark, sdir, docs, "doc_id", "text", 20)
    assert(StreamingGramPostings.loadPostings(spark, sdir).count() > 0)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sdir, "_GRAM_KEY_FORMAT"),
      "md5prefix32".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      StreamingGramPostings.loadPostings(spark, sdir)
    }
    intercept[IllegalArgumentException] {
      StreamingGramPostings.foldBatch(sdir, docs, "doc_id", "text", 20, "b0")
    }
    // restore the true stamp: everything serves again (the refusal is
    // the marker, not store damage)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sdir, "_GRAM_KEY_FORMAT"),
      Dedup.GramKeyFormatId.getBytes("UTF-8"))
    assert(StreamingGramPostings.loadPostings(spark, sdir).count() > 0)

    // ---- streaming count store (the gate): same contract
    val cdir = Files.createTempDirectory("graft-gramfmt-cnt").toString
    StreamingDedupGate.init(spark, cdir, docs, "doc_id", "text", 20)
    assert(StreamingDedupGate.loadCounts(spark, cdir).count() > 0)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(cdir, "_GRAM_KEY_FORMAT"))
    intercept[IllegalArgumentException] {
      StreamingDedupGate.loadCounts(spark, cdir)
    }
  }

  test("generation-flip: kill mid-save on the multi-table IVF artifact") {
    import graft.operators.Similarity
    import graft.sources.Generations
    val dir = Files.createTempDirectory("graft-genflip-ivf").toString
    val vecs = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat))
    }.toDF("vec_id", "embedding")
    val prep = Similarity.prepared(vecs, "embedding")
      .select(col("vec_id"), col("vec"), col("nrm"))
    val cents = prep.filter(col("vec_id") % 16 === 0)
    def iset(i: Similarity.IvfIndex) =
      (i.centroids.count(), i.assignments
        .select(col("vec_id"), col("centroid_id"))
        .as[(Long, Long)].collect().toSet)
    Similarity.saveIvfIndex(Similarity.buildIvfIndex(prep, cents), dir)
    val gen1 = iset(Similarity.loadIvfIndex(spark, dir))

    // crash AFTER the centroids table is durable but BEFORE the
    // assignments table — in-place overwrite would have left a torn
    // two-table artifact (new centroids, old/absent assignments); the
    // generation flip makes the multi-table write atomic
    intercept[RuntimeException] {
      Generations.save(dir) { g =>
        cents.limit(1).write.parquet(s"$g/centroids")
        throw new RuntimeException("crash between tables")
      }
    }
    assert(iset(Similarity.loadIvfIndex(spark, dir)) == gen1,
      "IVF loader must keep serving the committed generation")
    assert(Generations.latestCommitted(dir).exists(_.endsWith("gen_1")))
  }

  // Round-14 advisor (medium): publish must be the ONE atomic rename,
  // marker already inside — a claimed-but-unmarked gen_<N> window would
  // let a faster concurrent saver's reap destroy an in-flight racer's
  // payload. Invariant checked directly: a poller that races a slow
  // saver may never observe an unmarked generation (fresh dir, single
  // saver, so no reap can be mid-delete).
  test("generation-flip: a visible generation is committed from birth") {
    import graft.sources.Generations
    val dir = Files.createTempDirectory("graft-genflip-atomic").toString
    @volatile var stop = false
    @volatile var violation: Option[String] = None
    val poller = new Thread(() => {
      while (!stop) {
        // only the MAX-numbered generation is checked: an OLDER gen may
        // legitimately appear unmarked mid-reap (deleteRecursively can
        // remove the marker before the dir), but reaps run strictly
        // after a newer committed gen exists, so the newest visible gen
        // being unmarked is exactly the raced window this guards
        val gens = Option(new java.io.File(dir).listFiles())
          .getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("gen_"))
          .flatMap(f => f.getName.stripPrefix("gen_").toLongOption
            .map(n => (n, f)))
        if (gens.nonEmpty) {
          val (_, newest) = gens.maxBy(_._1)
          if (!new java.io.File(newest, "_COMMITTED").isFile)
            violation = Some(newest.getName)
        }
      }
    })
    poller.start()
    (1 to 5).foreach { i =>
      Generations.save(dir) { g =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$g/payload"), s"v$i".getBytes)
        Thread.sleep(20)
      }
    }
    stop = true
    poller.join(10000)
    assert(violation.isEmpty,
      s"observed an unmarked live generation: ${violation.getOrElse("")}")
    assert(Generations.loadPath(dir).endsWith("gen_5"))
  }

  // Two savers racing the same artifact dir must never interleave
  // writes into one generation: each stages in its own pid+nanos temp
  // dir and an ATOMIC rename claims a slot, so the loser re-claims the
  // next number — every committed generation is exactly one saver's
  // complete payload. (In-repo callers are single-writer per dir via
  // Tables.artifactDir's pid keying; Generations is the general layer
  // and must hold without that.)
  test("generation-flip: concurrent savers each commit a complete generation") {
    import graft.sources.Generations
    val dir = Files.createTempDirectory("graft-genflip-race").toString
    val n = 8
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val done = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until n).map { i =>
      new Thread(() => {
        barrier.await()
        val p = Generations.save(dir) { g =>
          // multi-file payload with a window between the files, the
          // shape whose interleaving a shared gen dir could tear
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$g/who"), s"saver$i".getBytes)
          Thread.sleep(5)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$g/who2"), s"saver$i".getBytes)
        }
        done.add(p): Unit
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    val paths = {
      import scala.jdk.CollectionConverters._
      done.asScala.toSeq
    }
    assert(paths.size == n, s"all $n savers must commit (got ${paths.size})")
    assert(paths.toSet.size == n,
      "each saver must claim a DISTINCT generation slot")
    // slots are claimed monotonically (reaps only ever remove gens BELOW
    // the reaper's own), so the n racers land exactly on gen_1..gen_n
    assert(paths.map(_.split("gen_").last.toInt).sorted == (1 to n),
      s"slots must be gen_1..gen_$n: $paths")
    // every SURVIVING generation is internally consistent — one saver's
    // complete payload, both files from the same writer (earlier gens
    // were legitimately reaped by later commits)
    val surviving = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("gen_"))
    assert(surviving.nonEmpty)
    surviving.foreach { g =>
      val a = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$g/who")))
      val b = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$g/who2")))
      assert(a == b, s"torn generation at $g: $a vs $b")
    }
    // the loader resolves the highest committed slot
    val latest = Generations.loadPath(dir)
    assert(latest.endsWith(s"gen_$n"), s"highest slot must be gen_$n: $latest")
  }

  // The streaming twin of the INCREMENTAL removal (round-13 verdict #3):
  // StreamingDedupGate maintains counts; q315 needs POSTINGS. Arriving
  // batches serve exactSubstrRemoveIncremental at ingest time, then fold
  // their postings + docs in as additive segments; the stream is KILLED
  // between waves and resumed — and every observable equals the batch
  // q315 shape: the maintained postings equal gramPostings over
  // everything ingested, the pre-kill served removal equals the batch
  // incremental serve on the identical state, and a negated-postings
  // retraction equals the rebuild over the remaining docs.
  test("streaming gram postings: incremental removal survives kill-and-resume " +
      "and equals the batch q315 serve") {
    import graft.operators.Dedup
    import graft.streaming.StreamingGramPostings
    import org.apache.spark.sql.streaming.Trigger

    val raw = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    val base = raw.filter(col("doc_id") % 10 < 7)
    val dir = Files.createTempDirectory("graft-spost").toString
    StreamingGramPostings.init(spark, dir, base, "doc_id", "text", 30)
    assert(StreamingGramPostings.committedSegments(dir) == Seq("base"))

    val streamDir = Files.createTempDirectory("graft-spost-in")
    def dropWave(tag: Int): Unit = {
      val tmp = Files.createTempDirectory(s"graft-spost-w$tag").toString
      raw.filter(col("doc_id") % 10 === tag).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, streamDir.resolve(s"wave$tag.parquet"))
    }
    val outDir = Files.createTempDirectory("graft-spost-out").toString
    val ckpt = Files.createTempDirectory("graft-spost-ckpt").toString
    def startStream() = StreamingGramPostings.start(spark, dir,
      spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir.toString),
      "doc_id", "text", 30, outDir, ckpt,
      Trigger.ProcessingTime("200 milliseconds"))

    // ---- phase 1: wave 7 arrives, gets served + folded; then KILL
    dropWave(7)
    val q1 = startStream()
    try {
      val deadline = System.currentTimeMillis() + 180000
      while (!StreamingGramPostings.committedSegments(dir).contains("b0") &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q1.stop()
    assert(StreamingGramPostings.committedSegments(dir).contains("b0"),
      "wave 7 never folded before the kill")

    // wave 8 arrives while the stream is DOWN; resume folds it
    dropWave(8)
    val q2 = startStream()
    try {
      val deadline = System.currentTimeMillis() + 180000
      while (StreamingGramPostings.committedSegments(dir).size < 3 &&
        System.currentTimeMillis() < deadline) Thread.sleep(300)
      assert(StreamingGramPostings.committedSegments(dir).size == 3,
        "wave 8 never folded after resume: " +
          StreamingGramPostings.committedSegments(dir))
    } finally q2.stop()

    def pset(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Long)].collect().toSet
    def rset(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("clean_text"), col("removed_chars"))
        .as[(Long, String, Long)].collect().toSet

    val ingested = raw.filter(col("doc_id") % 10 <= 8)

    // ---- equality 1: maintained postings == the batch rebuild
    assert(pset(StreamingGramPostings.loadPostings(spark, dir)) ==
      pset(Dedup.gramPostings(ingested, "doc_id", "text", 30)),
      "maintained postings != batch gramPostings over everything ingested")

    // ---- equality 2: the doc store == everything ingested
    assert(StreamingGramPostings.loadDocs(spark, dir)
        .as[(Long, String)].collect().toSet ==
      ingested.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toSet,
      "doc store != ingested docs")

    // ---- equality 3: the PRE-KILL served removal (wave 7, batch 0)
    // equals the batch q315 serve on the identical state: corpus =
    // base + wave 7, postings = that corpus's own table, ids = wave 7
    val w7 = raw.filter(col("doc_id") % 10 === 7)
    val c7 = base.unionByName(w7)
    assert(rset(spark.read.parquet(s"$outDir/d=b0")) ==
      rset(Dedup.exactSubstrRemoveIncremental(c7, "doc_id", "text", 30,
        Dedup.gramPostings(c7, "doc_id", "text", 30),
        w7.select(col("doc_id")))),
      "wave-7 served removal != batch incremental serve on the same state")

    // ---- retraction: wave 8 takes down as one negated-postings
    // segment; postings and doc store must equal the rebuild over the
    // remaining docs
    StreamingGramPostings.retractBatch(spark, dir,
      raw.filter(col("doc_id") % 10 === 8), "doc_id", "text", 30, "t0")
    val remaining = raw.filter(col("doc_id") % 10 <= 7)
    assert(pset(StreamingGramPostings.loadPostings(spark, dir)) ==
      pset(Dedup.gramPostings(remaining, "doc_id", "text", 30)),
      "negated-postings retraction != rebuild over remaining docs")
    assert(StreamingGramPostings.loadDocs(spark, dir)
        .as[(Long, String)].collect().toSet ==
      remaining.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toSet,
      "doc store after retraction != remaining docs")
  }

  // Compaction for the postings store (round 14): the scaladoc's claim —
  // "the merged table IS a valid single segment" — executed. A
  // multi-segment store with a retraction compacts into ONE base segment
  // that serves bit-identically (postings, docs, AND the incremental
  // removal built on them), and the crash protocol is the folds':
  // payload-without-marker cannot serve, re-running compact recovers.
  test("streaming gram postings: compaction preserves every serve; " +
      "kill-mid-compaction cannot serve and re-compacting recovers") {
    import graft.operators.Dedup
    import graft.streaming.StreamingGramPostings

    val raw = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    val dir = Files.createTempDirectory("graft-spost-csrc").toString
    StreamingGramPostings.init(spark, dir,
      raw.filter(col("doc_id") % 10 < 6), "doc_id", "text", 30)
    StreamingGramPostings.foldBatch(dir,
      raw.filter(col("doc_id") % 10 === 6), "doc_id", "text", 30, "b0")
    StreamingGramPostings.foldBatch(dir,
      raw.filter(col("doc_id") % 10 === 7), "doc_id", "text", 30, "b1")
    StreamingGramPostings.retractBatch(spark, dir,
      raw.filter(col("doc_id") % 10 === 6), "doc_id", "text", 30, "t0")
    assert(StreamingGramPostings.committedSegments(dir).size == 4)

    def pset(d: org.apache.spark.sql.DataFrame) =
      d.select(col("g"), col("id"), col("n"))
        .as[(Long, Long, Long)].collect().toSet
    def dset(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("text")).as[(Long, String)].collect().toSet
    def serve(store: String) = {
      val docs = StreamingGramPostings.loadDocs(spark, store)
        .select(col("id").as("doc_id"), col("text"))
      Dedup.exactSubstrRemoveIncremental(docs, "doc_id", "text", 30,
          StreamingGramPostings.loadPostings(spark, store)
            .select(col("g"), col("id"), col("n")),
          raw.filter(col("doc_id") % 10 === 7).select(col("doc_id")))
        .select(col("id"), col("clean_text"), col("removed_chars"))
        .as[(Long, String, Long)].collect().toSet
    }
    val srcPostings = pset(StreamingGramPostings.loadPostings(spark, dir))
    val srcDocs = dset(StreamingGramPostings.loadDocs(spark, dir))
    val srcServe = serve(dir)

    // in-place compaction would consume its own inputs — refused
    intercept[IllegalArgumentException] {
      StreamingGramPostings.compact(spark, dir, dir)
    }

    val dir2 = Files.createTempDirectory("graft-spost-cdst").toString
    StreamingGramPostings.compact(spark, dir, dir2)
    assert(StreamingGramPostings.committedSegments(dir2) == Seq("base"),
      "compacted store must hold exactly one committed segment")
    assert(pset(StreamingGramPostings.loadPostings(spark, dir2)) ==
      srcPostings, "compacted postings != source postings")
    assert(dset(StreamingGramPostings.loadDocs(spark, dir2)) == srcDocs,
      "compacted doc store != source doc store")
    assert(serve(dir2) == srcServe,
      "incremental removal over the compacted store != over the source")

    // kill-mid-compaction: payload lands, the marker does not — the
    // target REFUSES to serve (both loaders), while the source is intact
    val dir3 = Files.createTempDirectory("graft-spost-ckill").toString
    StreamingGramPostings.loadPostings(spark, dir)
      .write.parquet(s"$dir3/postings/d=base")
    intercept[IllegalArgumentException] {
      StreamingGramPostings.loadPostings(spark, dir3)
    }
    intercept[IllegalArgumentException] {
      StreamingGramPostings.loadDocs(spark, dir3)
    }
    assert(pset(StreamingGramPostings.loadPostings(spark, dir)) ==
      srcPostings, "source store must be untouched by the dead compaction")

    // recovery = re-running compact over the debris
    StreamingGramPostings.compact(spark, dir, dir3)
    assert(pset(StreamingGramPostings.loadPostings(spark, dir3)) ==
      srcPostings, "re-compaction over debris must serve identically")
    assert(serve(dir3) == srcServe)
  }

  // Round-15 verdict #4: STREAM_AMP.json derived policy_max_segments=65
  // but nothing enforced it — a long-running pipeline had to remember to
  // call compact, and compact's target-must-differ contract collides
  // with a stream whose store path is fixed. compactInPlace adds epoch
  // indirection (one atomic CURRENT rename per compaction) and start()
  // auto-compacts at the policy. This pins the whole protocol: flip
  // atomicity, the carried fold-name gate (a replayed batch merged into
  // the compacted base must NOT double-fold), kill-mid-compaction
  // recovery with debris reaping, and the auto path end-to-end through
  // a kill-and-resume.
  test("streaming gram postings: in-place auto-compaction — atomic flip, " +
      "replay cannot double-fold across it, kill-mid-compaction recovers") {
    import graft.operators.Dedup
    import graft.streaming.StreamingGramPostings
    import org.apache.spark.sql.streaming.Trigger

    val raw = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    def pset(d: org.apache.spark.sql.DataFrame) =
      d.select(col("g"), col("id"), col("n"))
        .as[(Long, Long, Long)].collect().toSet
    def dset(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("text")).as[(Long, String)].collect().toSet

    val dir = Files.createTempDirectory("graft-spost-auto").toString
    StreamingGramPostings.init(spark, dir,
      raw.filter(col("doc_id") % 10 < 6), "doc_id", "text", 30)
    StreamingGramPostings.foldBatch(dir,
      raw.filter(col("doc_id") % 10 === 6), "doc_id", "text", 30, "b0")
    StreamingGramPostings.foldBatch(dir,
      raw.filter(col("doc_id") % 10 === 7), "doc_id", "text", 30, "b1")
    StreamingGramPostings.retractBatch(spark, dir,
      raw.filter(col("doc_id") % 10 === 6), "doc_id", "text", 30, "t0")
    val srcP = pset(StreamingGramPostings.loadPostings(spark, dir))
    val srcD = dset(StreamingGramPostings.loadDocs(spark, dir))

    // ---- first in-place compaction: same path, one committed segment,
    // bit-identical serves, CURRENT published, predecessor retained
    StreamingGramPostings.compactInPlace(spark, dir)
    assert(Files.isRegularFile(Paths.get(dir, "CURRENT")))
    assert(StreamingGramPostings.committedSegments(dir) == Seq("base"),
      "in-place compaction must leave exactly one committed segment")
    assert(pset(StreamingGramPostings.loadPostings(spark, dir)) == srcP)
    assert(dset(StreamingGramPostings.loadDocs(spark, dir)) == srcD)
    assert(Files.exists(Paths.get(dir, "commits")),
      "predecessor (root-layout) epoch must be retained for in-flight readers")

    // ---- the carried fold-name gate: b1's rows were MERGED into the
    // compacted base; a post-compaction replay of the same segment name
    // (the crash window between the flip and the stream's own checkpoint
    // commit) must be a no-op, not a double fold
    StreamingGramPostings.foldBatch(dir,
      raw.filter(col("doc_id") % 10 === 7), "doc_id", "text", 30, "b1")
    assert(StreamingGramPostings.committedSegments(dir) == Seq("base"),
      "replayed fold after compaction must be skipped by the folded gate")
    assert(pset(StreamingGramPostings.loadPostings(spark, dir)) == srcP,
      "replayed fold after compaction double-folded")

    // ---- kill mid in-place compaction: torn target epoch (payload, no
    // marker, CURRENT unflipped) is invisible; the next compaction picks
    // a FRESH epoch number, publishes, and reaps the debris
    StreamingGramPostings.loadPostings(spark, dir)
      .write.parquet(s"$dir/epoch_99/postings/d=base")
    assert(pset(StreamingGramPostings.loadPostings(spark, dir)) == srcP,
      "torn epoch must not serve (CURRENT never flipped)")
    StreamingGramPostings.foldBatch(dir,
      raw.filter(col("doc_id") % 10 === 8), "doc_id", "text", 30, "b2")
    StreamingGramPostings.compactInPlace(spark, dir)
    val want = pset(Dedup.gramPostings(
      raw.filter(col("doc_id") % 10 < 6 || col("doc_id") % 10 === 7 ||
        col("doc_id") % 10 === 8),
      "doc_id", "text", 30))
    assert(pset(StreamingGramPostings.loadPostings(spark, dir)) == want,
      "post-recovery compacted store != batch rebuild over remaining docs")
    assert(!Files.exists(Paths.get(dir, "epoch_99")),
      "crash debris epoch must be reaped by the next successful compaction")
    assert(!Files.exists(Paths.get(dir, "postings")),
      "root-layout payload must be reaped once it is no longer the predecessor")

    // ---- the AUTO path end-to-end: maxSegments=2 compacts after every
    // fold; kill the stream between waves and resume ACROSS a compaction
    val dir2 = Files.createTempDirectory("graft-spost-auto2").toString
    StreamingGramPostings.init(spark, dir2,
      raw.filter(col("doc_id") % 10 < 7), "doc_id", "text", 30)
    val streamDir = Files.createTempDirectory("graft-spost-auto-in")
    def dropWave(tag: Int): Unit = {
      val tmp = Files.createTempDirectory(s"graft-spost-aw$tag").toString
      raw.filter(col("doc_id") % 10 === tag).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, streamDir.resolve(s"wave$tag.parquet"))
    }
    val outDir = Files.createTempDirectory("graft-spost-auto-out").toString
    val ckpt = Files.createTempDirectory("graft-spost-auto-ck").toString
    def startStream() = StreamingGramPostings.start(spark, dir2,
      spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir.toString),
      "doc_id", "text", 30, outDir, ckpt,
      Trigger.ProcessingTime("200 milliseconds"), maxSegments = 2)
    // resolve through CURRENT like the store does: the fold marker for a
    // batch lands in whichever epoch is live when it folds
    def root2() = {
      val cur = Paths.get(dir2, "CURRENT")
      if (Files.isRegularFile(cur))
        s"$dir2/${new String(Files.readAllBytes(cur), "UTF-8").trim}"
      else dir2
    }
    def folded(name: String) =
      Files.exists(Paths.get(root2(), "folded", name))
    dropWave(7)
    val q1 = startStream()
    try {
      val deadline = System.currentTimeMillis() + 180000
      while (!Files.isRegularFile(Paths.get(dir2, "CURRENT")) &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q1.stop()
    assert(Files.isRegularFile(Paths.get(dir2, "CURRENT")),
      "auto-compaction never fired at maxSegments=2")
    dropWave(8) // arrives while the stream is DOWN; resume folds + compacts
    val q2 = startStream()
    try {
      // wait for b1's FOLD (its marker is written after the segment
      // commits), not just its serve output — stopping on the serve
      // commit raced the fold and asserted against a store missing wave 8
      val deadline = System.currentTimeMillis() + 180000
      while (!folded("b1") &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q2.stop()
    assert(pset(StreamingGramPostings.loadPostings(spark, dir2)) ==
      pset(Dedup.gramPostings(raw.filter(col("doc_id") % 10 <= 8),
        "doc_id", "text", 30)),
      "auto-compacted store != batch rebuild over everything ingested")
    assert(StreamingGramPostings.committedSegments(dir2).size <= 2,
      "segment count must stay at the policy bound")
  }

  // Round-14 verdict #2: the early release of the corpus-postings
  // checkpoint inside exactSubstrRemoveIncremental must leave the
  // RETURNED plan fully re-evaluable — repeated actions, including
  // derivatives that replan the frame (filter + aggregate), may never
  // reach the released blocks (which would abort with
  // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). The safety argument lives at
  // the release site in Dedup.scala; this pins it behaviorally.
  test("incremental removal: returned plan survives repeated evaluation " +
      "after the postings-checkpoint release") {
    import graft.operators.Dedup
    val raw = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val newIds = raw.filter(col("doc_id") % 5 === 0).select(col("doc_id"))
    val postings = Dedup.combineGramPostings(
      Dedup.gramPostings(raw.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", 30),
      Dedup.gramPostings(raw.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", 30))
    val out = Dedup.exactSubstrRemoveIncremental(raw, "doc_id", "text", 30,
      postings, newIds)
    def rset(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("clean_text"), col("removed_chars"))
        .as[(Long, String, Long)].collect().toSet
    // by the time the first action runs, the postings checkpoint has
    // been released (release happens inside the builder, pre-return)
    val first = rset(out)
    assert(first.nonEmpty, "fixture must produce changed docs")
    // second full evaluation of the SAME plan object
    assert(rset(out) == first,
      "re-evaluating the returned plan after release must be identical")
    // derivatives force a fresh analysis/planning pass over the same
    // checkpointed leaves — the shapes an AQE re-plan or a caller-side
    // second read would take
    val removedDocs = out.filter(col("removed_chars") > 0)
      .agg(count(lit(1))).as[Long].head()
    assert(removedDocs == first.count(_._3 > 0).toLong)
    val totalRemoved = out.agg(sum(col("removed_chars"))).as[Long].head()
    assert(totalRemoved == first.toSeq.map(_._3).sum)
  }

  // Round-15 verdict #3: the pre-release drain used to poll
  // getActiveJobIds() GLOBALLY, so in a session with a concurrent
  // stream (the streaming-twin deployment) every checkpoint release sat
  // out the full 2 s bound — ~2 s of hidden latency per micro-batch in
  // StreamingGramPostings.start's serve. The drain is now scoped to the
  // caller's own job group: with a foreign long-running job active, a
  // scoped release must return in milliseconds, the full serve must stay
  // correct, and no job anywhere may abort on released checkpoint blocks.
  test("scoped checkpoint release: a concurrent busy job does not stall " +
      "the drain; the serve stays correct with zero checkpoint-block events") {
    import graft.operators.Dedup
    import org.apache.spark.sql.GraftSqlShims
    import scala.jdk.CollectionConverters._

    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        e.jobResult match {
          case org.apache.spark.scheduler.JobFailed(ex) =>
            failures.add(String.valueOf(ex))
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val raw = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val newIds = raw.filter(col("doc_id") % 5 === 0).select(col("doc_id"))
    def serve() = Dedup.exactSubstrRemoveIncremental(raw, "doc_id", "text",
        30, Dedup.gramPostings(raw, "doc_id", "text", 30), newIds)
      .select(col("id"), col("clean_text"), col("removed_chars"))
      .as[(Long, String, Long)].collect().toSet
    val solo = serve()
    assert(solo.nonEmpty)

    // the foreign workload: an UNGROUPED driver thread that keeps a job
    // running continuously (the shape of a concurrent streaming query's
    // micro-batches in the same session)
    val busyStop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val busy = new Thread(() => {
      // ONE single-partition job that stays RUNNING for the whole test:
      // the global-drain poll sees it continuously (no between-jobs gap
      // to race) while it occupies only one of local[4]'s task slots —
      // a busy fixture that hogged every slot starved the serve under
      // test outright (FIFO gives the earlier job's tasks priority)
      while (!busyStop.get()) {
        try spark.range(1).repartition(1)
          .foreachPartition { (_: Iterator[java.lang.Long]) =>
            var slept = 0
            while (!busyStop.get() && slept < 300000) {
              Thread.sleep(100); slept += 100
            }
          }
        catch { case _: Throwable => () } // stop() mid-job is fine
      }
    }, "graft-busy-foreign")
    busy.setDaemon(true)
    try {
      busy.start()
      val tracker = spark.sparkContext.statusTracker
      def awaitBusy(): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (tracker.getActiveJobIds().isEmpty &&
            System.currentTimeMillis() < deadline) Thread.sleep(20)
        assert(tracker.getActiveJobIds().nonEmpty,
          "busy fixture has no running job")
      }
      awaitBusy()

      // direct release-latency claim: a checkpoint whose OWN group is
      // drained releases immediately even though foreign jobs are active
      val ck = GraftSqlShims.withJobGroup(spark, "graft-own-release") {
        GraftSqlShims.statsTruncatedLocalCheckpoint(
          raw.limit(100).select(col("doc_id")))
      }
      awaitBusy()
      val t0 = System.nanoTime()
      GraftSqlShims.unpersistCheckpoint(ck, Some("graft-own-release"))
      val releaseMs = (System.nanoTime() - t0) / 1e6
      assert(releaseMs < 1000.0,
        f"scoped release stalled $releaseMs%.0f ms under a foreign job " +
          "(the global-drain behavior this test pins out)")

      // the real serve under the same contention: bit-identical output
      // (its internal releases are scoped per invocation)
      assert(serve() == solo,
        "serve under a concurrent busy job must match the solo serve")
    } finally {
      busyStop.set(true)
      busy.join(15000)
      spark.sparkContext.removeSparkListener(listener)
    }
    val ckptNoise = failures.asScala.filter(_.contains("CHECKPOINT"))
    assert(ckptNoise.isEmpty,
      s"released checkpoint blocks were read by a live job: $ckptNoise")
  }
}
