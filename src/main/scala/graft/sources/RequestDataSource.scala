package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The wire schema as this source reports it: same fields as
  * `Schemas.ingestRequest` but NULLABLE — a wire format can always carry a
  * malformed or partial line, and those surface as null fields for the O2
  * validation filter. Reporting non-nullable here would be a lie with
  * teeth: Catalyst constant-folds `IsNotNull` on non-nullable columns to
  * true (the filter silently vanishes) and whole-stage codegen NPEs on the
  * first null it was promised could never happen.
  */
private[sources] object RequestWire {
  val schema: StructType = StructType(Seq(
    StructField("ingestion_id", StringType),
    StructField("ids", ArrayType(LongType)),
    StructField("priority", StringType),
    StructField("created_at", TimestampType)))
}

/** DataSource V2 provider for the request wire format (JSONL files of
  * `{ingestion_id, ids, priority, created_at}` — the same layout
  * `RequestSource.jsonFileStream` tails): `spark.read.format
  * ("graft-requests").load(dir)`.
  *
  * What V2 buys over a plain `spark.read.json`:
  * - **Column pruning reaches the parser** ([[SupportsPushDownRequiredColumns]]):
  *   a `select(ingestion_id)` never materializes the ids array — pruned
  *   fields are skipped at the JSON-node level, not dropped after the fact.
  * - **Filter pushdown reaches the parser** ([[SupportsPushDownFilters]]):
  *   `priority = 'HIGH'`, `priority IN ('HIGH','MEDIUM')` and IsNotNull
  *   predicates are evaluated on the raw node BEFORE row materialization;
  *   non-matching lines never allocate a row. The scan's `description()`
  *   advertises the pushed set, so `.explain` shows `PushedFilters`
  *   exactly like parquet.
  * - **Partition-per-file parallelism**: one [[InputPartition]] per file —
  *   the same unit of work a multi-executor cluster schedules; locality is
  *   the file's (local FS here, so none claimed).
  *
  * Scale honesty: file listing happens once on the driver (as in Spark's own
  * FileIndex); a production deployment would page very large directories.
  * Malformed JSON lines yield null fields (not exceptions) — the O2
  * validation filter downstream owns rejection, same contract as the
  * schema-enforced `spark.read.json` path.
  *
  * Reference analogue: the Express ingest edge
  * (`/root/reference/src/app.js:7-9`) — the wire format this reads is what
  * that edge would land on storage.
  */
class RequestDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-requests"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RequestWire.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new RequestTable(properties.get("path"))
}

private[sources] class RequestTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-requests($path)"
  override def schema(): StructType = RequestWire.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RequestScanBuilder(Option(path).getOrElse(options.get("path")),
      Option(options.get("extensions")).getOrElse("jsonl,json"))
}

private[sources] class RequestScanBuilder(path: String, extensions: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = RequestWire.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept string-equality, string-IN and IsNotNull predicates on
    * top-level fields — the ones the line parser can evaluate before
    * materializing a row. IN lists may carry nulls (Catalyst forwards
    * them); a null element can never equal a non-null field, so it only
    * matters for the SQL-3VL non-match case the reader already gets
    * right. Everything else is returned to Spark for post-scan
    * evaluation.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo(attr, _: String) => SchemaFields.contains(attr)
      case In(attr, vs) => SchemaFields.contains(attr) &&
        vs.forall(v => v == null || v.isInstanceOf[String])
      case IsNotNull(attr) => SchemaFields.contains(attr)
      case _ => false
    }
    pushed = accepted
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new RequestScan(path, required, pushed, extensions)

  private val SchemaFields =
    RequestWire.schema.fieldNames.toSet
}

private[sources] class RequestScan(path: String, required: StructType,
    pushed: Array[Filter], extensions: String) extends Scan with Batch {

  // wire-contract file filter: *.jsonl/*.json by default so stray files
  // (checksums, editor swap, _SUCCESS) don't parse as all-null rows.
  // `.option("extensions", "")` disables it (read every non-hidden file —
  // the spark.read.json parity mode); any comma list narrows it.
  // tolerate a spelled leading dot (".jsonl") and match case-insensitively
  private val allowedSuffixes: Seq[String] =
    extensions.split(",").map(_.trim).filter(_.nonEmpty)
      .map(e => "." + e.stripPrefix(".").toLowerCase(java.util.Locale.ROOT))
      .toSeq

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-requests $path, ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files =
      if (dir.isDirectory) {
        val listed = dir.listFiles()
        if (listed == null)
          throw new java.io.IOException(
            s"graft-requests: cannot list directory $path (IO/permission error)")
        listed.filter { f =>
          val lower = f.getName.toLowerCase(java.util.Locale.ROOT)
          f.isFile && !f.getName.startsWith(".") &&
            (allowedSuffixes.isEmpty || allowedSuffixes.exists(lower.endsWith))
        }.map(_.getAbsolutePath).sorted
      } else Array(path)
    files.map(f => RequestFilePartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RequestReaderFactory(required.fieldNames, pushed,
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
}

private[sources] case class RequestFilePartition(file: String) extends InputPartition

private[sources] class RequestReaderFactory(fields: Array[String],
    pushed: Array[Filter], sessionTz: String) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RequestFileReader(p.asInstanceOf[RequestFilePartition].file, fields,
      pushed, sessionTz)
}

/** Line-at-a-time JSONL reader: pushed filters gate BEFORE row
  * materialization; only `fields` are converted to Catalyst form.
  *
  * Pushed `IsNotNull` is evaluated against the MATERIALIZED value of the
  * field, not raw JSON-node presence — for `created_at` (unparseable
  * string → null) and `ids` (non-array or non-integral element → null) the
  * node can be present while the column is null, and an accepted pushed
  * filter is never re-checked by Spark after the scan.
  */
private[sources] class RequestFileReader(file: String, fields: Array[String],
    pushed: Array[Filter], sessionTz: String) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val zone = java.time.ZoneId.of(sessionTz)
  // PER-LINE strict decoding: Files.lines' stream-wide strict decoder
  // throws UncheckedIOException out of hasNext/next on the first
  // malformed byte and kills the whole scan, while a REPLACE decoder
  // would turn a bad byte into U+FFFD — which inside a string literal is
  // still VALID JSON, so the damaged row would materialize as data
  // where the V1 path (Jackson decoding bytes itself) nulls the record.
  // Reading byte-lines and decoding each one strictly contains the
  // failure to exactly its line AND keeps V1 parity: a coding error is
  // that line's malformed-JSON null-field row.
  private val in = new java.io.BufferedInputStream(
    java.nio.file.Files.newInputStream(java.nio.file.Paths.get(file)))
  private val decoder = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
  private var row: InternalRow = _

  /** Next line's raw bytes, or null at EOF. Terminators match
    * Files.lines / BufferedReader.readLine AND Hadoop's LineReader (the
    * V1 `spark.read.json` scanner): `\n`, bare `\r`, and `\r\n` (as ONE
    * terminator) all end a line — an LF-only rule would collapse a
    * CR-terminated file into one giant malformed line where V1 yields
    * per-line rows (round-14 advisor). */
  private def nextLineBytes(): Array[Byte] = {
    var b = in.read()
    if (b == -1) return null
    val buf = new java.io.ByteArrayOutputStream()
    while (b != -1 && b != '\n' && b != '\r') { buf.write(b); b = in.read() }
    if (b == '\r') {
      // CRLF is one terminator: swallow the LF half if it follows
      in.mark(1)
      if (in.read() != '\n') in.reset()
    }
    buf.toByteArray
  }

  override def next(): Boolean = {
    row = null
    var bytes = nextLineBytes()
    while (row == null && bytes != null) {
      val line =
        try decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString
        catch { case _: java.nio.charset.CharacterCodingException => null }
      if (line == null) {
        // undecodable bytes: the line's null-field row (V1 parity)
        if (passes(null)) row = materialize(null)
      } else if (line.trim.nonEmpty) {
        val node = try mapper.readTree(line) catch { case _: Exception => null }
        if (passes(node)) row = materialize(node)
      }
      if (row == null) bytes = nextLineBytes()
    }
    row != null
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()

  private def text(node: JsonNode, field: String): String = {
    if (node == null) return null
    val v = node.get(field)
    if (v == null || v.isNull || !v.isTextual) null else v.asText()
  }

  /** ids as a long array, or null — whole-field null on a non-array value
    * or any non-integral NON-NULL element (matching the PERMISSIVE
    * schema-enforced `spark.read.json` path, which nulls the field rather
    * than coercing `"x"`/`true`/`1.5` to a long). A NULL element is KEPT
    * as a null element: file sources force the user schema `asNullable`
    * (containsNull=true at the scan), so the V1 path materializes
    * `[1,null,2]` verbatim — measured — and whole-field nulling here
    * would let a pushed `IsNotNull(ids)` silently drop a row V1 keeps.
    */
  private def idsValue(node: JsonNode): Array[Any] = {
    if (node == null) return null
    val v = node.get("ids")
    if (v == null || !v.isArray) return null
    val out = new Array[Any](v.size())
    var i = 0
    val elems = v.elements()
    while (elems.hasNext) {
      val e = elems.next()
      if (e.isNull) out(i) = null
      else if (!e.isIntegralNumber || !e.canConvertToLong) return null
      else out(i) = java.lang.Long.valueOf(e.asLong())
      i += 1
    }
    out
  }

  /** created_at as epoch micros, or null. Delegates to Spark's OWN lenient
    * timestamp parser (`DateTimeUtils.stringToTimestamp` — the fallback
    * behind the JSON reader's default), so every form that parser accepts
    * (offsets, `T` or space separator, non-padded segments like
    * `2024-1-5 6:7:8`, bare dates) parses identically here: the V1/V2
    * parity is by construction, not by re-implementation.
    */
  private def tsValue(node: JsonNode): java.lang.Long = {
    val raw = text(node, "created_at")
    if (raw == null) return null
    org.apache.spark.sql.catalyst.util.DateTimeUtils
      .stringToTimestamp(UTF8String.fromString(raw), zone)
      .map(java.lang.Long.valueOf)
      .orNull
  }

  private def isNullField(node: JsonNode, field: String): Boolean = field match {
    case "ingestion_id" | "priority" => text(node, field) == null
    case "ids" => idsValue(node) == null
    case "created_at" => tsValue(node) == null
    case _ => true
  }

  /** Evaluate the pushed predicates on the materialized field values. Null
    * field + EqualTo is SQL-false (3VL: unknown rows can't satisfy a pushed
    * conjunct), matching what Spark's own post-filter would do.
    */
  private def passes(node: JsonNode): Boolean = pushed.forall {
    case EqualTo(attr, v: String) => v == text(node, attr)
    // null field never matches (3VL); null list elements match nothing
    case In(attr, vs) =>
      val t = text(node, attr)
      t != null && vs.contains(t)
    case IsNotNull(attr) => !isNullField(node, attr)
    case _ => true
  }

  private def materialize(node: JsonNode): InternalRow =
    InternalRow.fromSeq(fields.toSeq.map {
      case "ingestion_id" => UTF8String.fromString(text(node, "ingestion_id"))
      case "priority" => UTF8String.fromString(text(node, "priority"))
      case "ids" =>
        val v = idsValue(node)
        if (v == null) null else new GenericArrayData(v)
      case "created_at" => tsValue(node)
      case other =>
        throw new IllegalArgumentException(s"unknown field $other")
    })
}
