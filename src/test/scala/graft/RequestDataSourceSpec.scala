package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The V2 request source: parity with schema-enforced JSON, pruning and
  * pushdown visible in the physical plan, malformed-line containment.
  */
class RequestDataSourceSpec extends SparkSpec {

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("graft-dsv2").toFile
    Files.writeString(new java.io.File(dir, "a.jsonl").toPath,
      """{"ingestion_id":"A1","ids":[1,2,3],"priority":"HIGH","created_at":"2024-01-01T00:00:00.000Z"}""" + "\n" +
      """{"ingestion_id":"A2","ids":[4],"priority":"LOW","created_at":"2024-01-01T00:00:01.000Z"}""" + "\n" +
      "this line is not json\n")
    Files.writeString(new java.io.File(dir, "b.jsonl").toPath,
      """{"ingestion_id":"B1","ids":[5,6],"priority":"HIGH","created_at":"2024-01-01T00:00:02.000Z"}""" + "\n" +
      """{"ingestion_id":"B2","ids":[7],"created_at":"2024-01-01T00:00:03.000Z"}""" + "\n")
    dir.getAbsolutePath
  }

  test("reads the wire format with full parity to the schema-enforced json path") {
    val dir = writeFixture()
    // both paths surface the malformed line as an all-null row (PERMISSIVE
    // containment); the O2-style not-null filter drops it identically
    val v2 = spark.read.format("graft-requests").load(dir)
      .filter(col("ingestion_id").isNotNull)
      .orderBy("ingestion_id")
    val v1 = graft.sources.RequestSource.jsonBatch(spark, dir)
      .filter(col("ingestion_id").isNotNull)
      .orderBy("ingestion_id")
    val a = v2.collect().map(_.toSeq)
    val b = v1.collect().map(_.toSeq)
    assert(a.length == 4)
    assert(a.toSeq == b.toSeq,
      s"V2 rows ${a.toSeq} differ from JSON-source rows ${b.toSeq}")
  }

  test("a null ids ELEMENT keeps V1 parity ([1,null,2] stays an array) " +
      "and a non-UTF-8 byte is contained to its own line") {
    val dir = Files.createTempDirectory("graft-dsv2-nul").toFile
    Files.writeString(new java.io.File(dir, "a.jsonl").toPath,
      """{"ingestion_id":"N1","ids":[1,null,2],"priority":"HIGH","created_at":"2024-01-01T00:00:00.000Z"}""" + "\n" +
      """{"ingestion_id":"N2","ids":[7],"priority":"LOW","created_at":"2024-01-01T00:00:01.000Z"}""" + "\n")
    // one line carrying a raw Latin-1 byte (0xE9): Files.lines' strict
    // decoder would throw out of the iterator and kill the whole scan;
    // the lenient reader must contain it as that line's null-field row
    val latin1 = ("""{"ingestion_id":"caf""" + "é" +
      """","ids":[9],"priority":"LOW","created_at":"2024-01-01T00:00:02.000Z"}""" + "\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    Files.write(new java.io.File(dir, "b.jsonl").toPath, latin1)
    val path = dir.getAbsolutePath
    val v2 = spark.read.format("graft-requests").load(path)
    val v1 = graft.sources.RequestSource.jsonBatch(spark, path)
    // the whole scan survives; N1's array keeps its null ELEMENT — the
    // V1 file-source scan forces the schema asNullable (containsNull
    // true), so [1,null,2] materializes verbatim there, and whole-field
    // nulling here would let a pushed IsNotNull(ids) drop a row V1 keeps
    val n1 = v2.filter(col("ingestion_id") === "N1")
      .select(col("ids")).collect()
    assert(n1.length == 1)
    assert(n1.head.getSeq[Any](0) == Seq(1L, null, 2L),
      s"null element must survive: ${n1.head.getSeq[Any](0)}")
    val v1n1 = v1.filter(col("ingestion_id") === "N1")
      .select(col("ids")).collect()
    assert(v1n1.head.getSeq[Any](0) == n1.head.getSeq[Any](0),
      "V1/V2 must agree on the null-element array")
    // IsNotNull(ids) (pushed) keeps the row, like V1's post-filter would
    assert(v2.filter(col("ids").isNotNull)
      .filter(col("ingestion_id") === "N1").count() == 1)
    // the malformed-byte line is a null-field row on BOTH paths, and the
    // other rows are unaffected
    assert(v2.filter(col("ingestion_id").isNotNull).count() == 2)
    assert(v1.filter(col("ingestion_id").isNotNull).count() == 2)
  }

  test("CR and CRLF line terminators keep V1 parity (round-14 advisor)") {
    // Files.lines / Hadoop's LineReader treat \n, \r\n AND a bare \r as
    // line breaks; an LF-only reader collapses a CR-terminated file into
    // one giant malformed line where V1 yields per-line rows
    val dir = Files.createTempDirectory("graft-dsv2-cr").toFile
    val l1 = """{"ingestion_id":"C1","ids":[1],"priority":"HIGH","created_at":"2024-01-01T00:00:00.000Z"}"""
    val l2 = """{"ingestion_id":"C2","ids":[2],"priority":"LOW","created_at":"2024-01-01T00:00:01.000Z"}"""
    val l3 = """{"ingestion_id":"C3","ids":[3],"priority":"LOW","created_at":"2024-01-01T00:00:02.000Z"}"""
    // mixed terminators in one file: CR, CRLF, LF (and no trailing break)
    Files.writeString(new java.io.File(dir, "a.jsonl").toPath,
      l1 + "\r" + l2 + "\r\n" + l3)
    val path = dir.getAbsolutePath
    val v2 = spark.read.format("graft-requests").load(path)
      .orderBy("ingestion_id").collect().map(_.toSeq)
    val v1 = graft.sources.RequestSource.jsonBatch(spark, path)
      .orderBy("ingestion_id").collect().map(_.toSeq)
    assert(v2.length == 3, s"CR/CRLF/LF must each end a line: ${v2.toSeq}")
    assert(v2.toSeq == v1.toSeq,
      s"V2 rows ${v2.toSeq} differ from JSON-source rows ${v1.toSeq}")
  }

  test("string-equality filter is pushed into the scan and answers correctly") {
    val dir = writeFixture()
    val q = spark.read.format("graft-requests").load(dir)
      .filter(col("priority") === "HIGH")
      .select(col("ingestion_id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [EqualTo(priority,HIGH)") ||
      plan.contains("PushedFilters: [IsNotNull(priority), EqualTo(priority,HIGH)"),
      s"pushdown missing from plan:\n$plan")
    assert(q.collect().map(_.getString(0)).sorted.toSeq == Seq("A1", "B1"))
  }

  test("IN-list filter is pushed into the scan and matches the unpushed result") {
    val dir = writeFixture()
    val pushed = spark.read.format("graft-requests").load(dir)
      .filter(col("priority").isin("HIGH", "LOW"))
      .select(col("ingestion_id"))
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("In(priority"),
      s"IN pushdown missing from plan:\n$plan")
    // parity: the V1 json path evaluates the same predicate post-scan
    val unpushed = graft.sources.RequestSource.jsonBatch(spark, dir)
      .filter(col("priority").isin("HIGH", "LOW"))
      .select(col("ingestion_id"))
    assert(pushed.collect().map(_.getString(0)).sorted.toSeq ==
      unpushed.collect().map(_.getString(0)).sorted.toSeq)
    assert(pushed.count() == 3) // A1, A2, B1; B2 has no priority at all
    // IN on the other string field pushes too
    val byId = spark.read.format("graft-requests").load(dir)
      .filter(col("ingestion_id").isin("A1", "B2"))
    assert(byId.queryExecution.executedPlan.toString.contains("In(ingestion_id"))
    assert(byId.collect().map(_.getString(0)).sorted.toSeq == Seq("A1", "B2"))
  }

  test("IN list with a null element: matches non-null hits, never null rows (3VL)") {
    val dir = writeFixture()
    val q = spark.read.format("graft-requests").load(dir)
      .filter(col("priority").isin("HIGH", null))
      .select(col("ingestion_id"))
    // SQL: priority IN ('HIGH', NULL) is true only for HIGH rows —
    // the missing-priority row (B2) and LOW rows are unknown/false
    assert(q.collect().map(_.getString(0)).sorted.toSeq == Seq("A1", "B1"))
  }

  test("column pruning reaches the scan (ReadSchema excludes unselected fields)") {
    val dir = writeFixture()
    val q = spark.read.format("graft-requests").load(dir)
      .select(col("ingestion_id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<ingestion_id:string>"),
      s"pruned schema missing from plan:\n$plan")
    // 4 parseable lines + the malformed line's all-null row
    assert(q.count() == 5)
  }

  test("pushed IsNotNull on created_at/ids matches materialized nullness") {
    val dir = Files.createTempDirectory("graft-dsv2-nn").toFile
    Files.writeString(new java.io.File(dir, "a.jsonl").toPath,
      // node PRESENT but materializes null: unparseable timestamp / non-integral id
      """{"ingestion_id":"N1","ids":[1],"priority":"LOW","created_at":"not-a-time"}""" + "\n" +
      """{"ingestion_id":"N2","ids":[1,"x"],"priority":"LOW","created_at":"2024-01-01T00:00:00Z"}""" + "\n" +
      """{"ingestion_id":"N3","ids":[2],"priority":"LOW","created_at":"2024-01-01T00:00:01Z"}""" + "\n")
    val base = spark.read.format("graft-requests").load(dir.getAbsolutePath)
    val ts = base.filter(col("created_at").isNotNull)
      .select("ingestion_id").collect().map(_.getString(0)).sorted.toSeq
    assert(ts == Seq("N2", "N3"),
      s"IsNotNull(created_at) must drop the unparseable row, got $ts")
    val ids = base.filter(col("ids").isNotNull)
      .select("ingestion_id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids == Seq("N1", "N3"),
      s"IsNotNull(ids) must drop the non-integral-element row, got $ids")
  }

  test("offset-less timestamps parse in the session timezone like spark.read.json") {
    val dir = Files.createTempDirectory("graft-dsv2-ts").toFile
    Files.writeString(new java.io.File(dir, "a.jsonl").toPath,
      """{"ingestion_id":"T1","ids":[1],"priority":"LOW","created_at":"2024-03-05T06:07:08"}""" + "\n" +
      """{"ingestion_id":"T2","ids":[2],"priority":"LOW","created_at":"2024-03-05T06:07:08+05:30"}""" + "\n" +
      """{"ingestion_id":"T3","ids":[3],"priority":"LOW","created_at":"2024-03-05 06:07:08"}""" + "\n" +
      """{"ingestion_id":"T4","ids":[4],"priority":"LOW","created_at":"2024-03-05"}""" + "\n")
    val v2 = spark.read.format("graft-requests").load(dir.getAbsolutePath)
      .orderBy("ingestion_id").select("created_at").collect().map(_.get(0))
    val v1 = graft.sources.RequestSource.jsonBatch(spark, dir.getAbsolutePath)
      .orderBy("ingestion_id").select("created_at").collect().map(_.get(0))
    assert(v2.toSeq == v1.toSeq,
      s"timestamp parity broke: v2=${v2.toSeq} json=${v1.toSeq}")
    assert(!v2.contains(null), "both timestamp forms must parse")
  }

  test("extensions option controls the file filter (default skips stray files)") {
    val dir = Files.createTempDirectory("graft-dsv2-ext").toFile
    Files.writeString(new java.io.File(dir, "a.jsonl").toPath,
      """{"ingestion_id":"E1","ids":[1],"priority":"LOW","created_at":"2024-01-01T00:00:00Z"}""" + "\n")
    Files.writeString(new java.io.File(dir, "requests.log").toPath,
      """{"ingestion_id":"E2","ids":[2],"priority":"LOW","created_at":"2024-01-01T00:00:00Z"}""" + "\n")
    Files.writeString(new java.io.File(dir, "_SUCCESS").toPath, "")
    val deflt = spark.read.format("graft-requests").load(dir.getAbsolutePath)
      .select("ingestion_id").collect().map(_.getString(0)).toSeq
    assert(deflt == Seq("E1"), s"default must skip .log/_SUCCESS, got $deflt")
    val all = spark.read.format("graft-requests")
      .option("extensions", "").load(dir.getAbsolutePath)
      .filter(col("ingestion_id").isNotNull)
      .select("ingestion_id").collect().map(_.getString(0)).sorted.toSeq
    assert(all == Seq("E1", "E2"), s"extensions='' must read every file, got $all")
  }

  test("a row with a missing filtered field is excluded at the parser (SQL 3VL)") {
    val dir = writeFixture()
    // B2 has no priority field: EqualTo must not match it, IsNotNull must drop it
    val n = spark.read.format("graft-requests").load(dir)
      .filter(col("priority").isNotNull).count()
    assert(n == 3)
  }
}
