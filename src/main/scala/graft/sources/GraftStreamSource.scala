package graft.sources

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.GraftTable

/** STREAMING READ of a GraftTable's commit log — the read-side half of
  * the exactly-once streaming story ([[graft.streaming.Streams.graftTableSink]]
  * is the write side). A DataSource V2 micro-batch source registered as
  * `format("graft")`:
  *
  * {{{
  *   spark.readStream.format("graft")
  *     .option("startingVersion", 0)        // default 0 = full history; "latest" = new commits only
  *     .option("maxVersionsPerTrigger", 1)  // admission control: versions per micro-batch
  *     .option("maxBytesPerTrigger", 128 << 20) // admission control: data bytes per micro-batch
  *     .option("ignoreChanges", "true")     // accept COW rewrites/overwrites (re-emits rewritten rows)
  *     .load(tablePath)
  * }}}
  *
  * This is Delta's streaming source re-derived on the GraftTable change
  * log (the reference's CHANGES-consumption loop —
  * `models/intermediate/stg_dim_customer.sql:71-72` — made continuous):
  *
  *  - **Offsets are table versions.** A micro-batch (start, end] reads
  *    exactly the files the [[graft.core.GraftTable.ChangeLog]] of each
  *    version in the span ADDED — O(changed files) planning from the
  *    manifest chain alone, never a snapshot listing, never a leaf
  *    parse. Spark's checkpoint persists the offset; replays re-plan
  *    the identical file set (manifests and data files are immutable),
  *    so downstream [[graft.core.GraftTable.appendStream]] delivers
  *    end-to-end exactly-once.
  *  - **Append-only by default.** A version that REMOVED files (COW
  *    upsert/delete/update, compaction, overwrite) fails the stream
  *    loudly unless `ignoreChanges=true`, which emits the commit's
  *    added files only — rewritten rows re-emit (kept rows included),
  *    Delta's documented `ignoreChanges` contract. Metadata-only
  *    commits (renames, marks, schema ops) emit nothing.
  *  - **Schema is pinned at stream start** (the head manifest's).
  *    Later-widened columns simply don't appear until a restart; a
  *    rename/drop of a column the scan carries fails the batch loudly
  *    (restart picks up the new schema) — never silent NULLs. Old
  *    files read through their entries' rename maps exactly like the
  *    batch path ([[graft.core.GraftTable.readFileSubset]] semantics).
  *  - **One partition per changed file**, rows decoded by a plain
  *    parquet-java [[GroupReadSupport]] reader that requests only the
  *    scan schema's physical fields from each file (`parquet.read.schema`
  *    projection — also how pre-rename and pre-widening files map to the
  *    pinned schema, absent fields as NULL). Spark's streaming planner
  *    applies no operator pushdown to micro-batch scans (the built-in
  *    sources behave the same), so the scan delivers full-schema rows
  *    and query filters evaluate post-scan. Deltas are small by
  *    construction (that's why they're streamed) — a row-grain reader
  *    is the right cost shape; the big-snapshot paths stay on Spark's
  *    vectorized batch scan, where Catalyst pushdown and GraftPrune
  *    file-skipping do their work.
  *
  * At 100 TB the shape holds: batch planning is O(files added in the
  * span); admission control (`maxVersionsPerTrigger`) bounds any one
  * micro-batch; a replica consumer processes commit N+1's files and
  * nothing else, forever. Flat schemas only (the warehouse/CDC grain);
  * nested columns refuse loudly. */
class GraftStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft source needs .load(<table path>)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = pathOf(options)
    val m = GraftTable.currentManifest(path).getOrElse(
      throw new IllegalArgumentException(s"'$path' is not a GraftTable"))
    StructType.fromDDL(m.schemaDdl)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftStreamTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = false
}

private[sources] class GraftStreamTable(path: String, schema0: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft.`$path`"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, schema0, options)
}

private[sources] class GraftScanBuilder(path: String, schema: StructType,
    options: CaseInsensitiveStringMap) extends ScanBuilder {
  // NOTE: Spark's micro-batch planner builds this scan ONCE at query
  // start and applies NO operator pushdown to streaming DSv2 relations
  // (verified empirically: neither SupportsPushDownRequiredColumns nor
  // SupportsPushDownFilters hooks fire on this path, matching the
  // built-in Kafka source's behavior) — so the scan always delivers
  // full-schema rows and filters evaluate post-scan. Deltas are small
  // by construction; the big-snapshot paths stay on the batch API,
  // where GraftPrune and Catalyst pushdown do their work.
  override def build(): Scan = new GraftScan(path, schema, schema, options)
}

private[sources] class GraftScan(path: String, tableSchema: StructType,
    required: StructType, options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = required
  override def description(): String = s"GraftStream $path"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(path, tableSchema, required,
      Option(options.get("startingVersion")),
      Option(options.get("maxVersionsPerTrigger")).map(_.toLong),
      Option(options.get("maxBytesPerTrigger")).map(_.toLong),
      options.getBoolean("ignoreChanges", false))
}

/** Version-numbered stream offset: the LAST version already consumed. */
private[graft] case class GraftVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

private[graft] class GraftMicroBatchStream(path: String, tableSchema: StructType,
    required: StructType, startingVersion: Option[String],
    maxVersionsPerTrigger: Option[Long], maxBytesPerTrigger: Option[Long],
    ignoreChanges: Boolean)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  require(maxVersionsPerTrigger.forall(_ > 0), "maxVersionsPerTrigger must be positive")
  require(maxBytesPerTrigger.forall(_ > 0), "maxBytesPerTrigger must be positive")
  // Trigger.AvailableNow pins the end of the run at prepare time so the
  // query drains to a fixed point even while writers keep committing
  @volatile private var availableTarget: Option[Long] = None

  private def headVersion: Long = GraftTable.currentVersion(path).getOrElse(0L)

  override def initialOffset(): Offset = GraftVersionOffset(startingVersion match {
    case Some("latest") => headVersion
    case Some(v) => v.toLong - 1 // "start at version v" = v is the first consumed
    case None => 0L
  })

  override def deserializeOffset(json: String): Offset = GraftVersionOffset(json.toLong)

  override def prepareForTriggerAvailableNow(): Unit = availableTarget = Some(headVersion)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-control latestOffset is used")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftVersionOffset].version
    val head = availableTarget.getOrElse(headVersion)
    var end = maxVersionsPerTrigger.map(c => math.min(head, s + c)).getOrElse(head)
    // bytes-grain admission: at 100 TB a single commit can be arbitrarily
    // wide, so the real batch bound is bytes, not versions — walk the
    // change-log byte counts (manifest metadata only) and stop once the
    // cap is crossed, always admitting at least one version so the
    // stream can't stall on an oversized commit
    maxBytesPerTrigger.foreach { cap =>
      var (v, bytes) = (s + 1, 0L)
      while (v <= end) {
        bytes += GraftTable.manifestAt(path, v).changes
          .map(_.added.map(_.bytes).sum).getOrElse(0L)
        if (bytes >= cap) { end = v; v = Long.MaxValue } else v += 1
      }
    }
    GraftVersionOffset(math.max(end, s))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].version
    val e = end.asInstanceOf[GraftVersionOffset].version
    if (e <= s) return Array.empty
    // head entries carry maintained rename maps — the correct projection
    // for files that predate later renames (the logged entry's names are
    // frozen at its commit)
    val headM = GraftTable.currentManifest(path).getOrElse(
      throw new IllegalStateException(s"'$path' vanished mid-stream"))
    val headEntries = GraftTable.filesOf(path, headM).map(fe => fe.path -> fe).toMap
    val headNames = StructType.fromDDL(headM.schemaDdl).fieldNames.toSet
    val parts = Seq.newBuilder[InputPartition]
    var v = s + 1
    while (v <= e) {
      val m = GraftTable.manifestAt(path, v)
      val added: Seq[GraftTable.FileEntry] = m.changes match {
        case Some(ch) =>
          // the table-creating commit is an "overwrite" of nothing — an
          // initial load, not a replace
          val initialLoad = v == 1 && ch.removed.isEmpty
          if ((ch.removed.nonEmpty || (ch.truncate && !initialLoad)) && !ignoreChanges)
            throw new IllegalStateException(
              s"version $v of '$path' (op ${m.op}) removed or replaced files — a " +
                "streaming read is append-only; set ignoreChanges=true to re-emit " +
                "rewritten rows, or stream a table that only receives appends")
          ch.added
        case None => // pre-change-log manifest: fall back to the parent set difference
          val prev = if (v == 1) Set.empty[String]
            else GraftTable.filesOf(path, GraftTable.manifestAt(path, v - 1)).map(_.path).toSet
          GraftTable.filesOf(path, m).filterNot(fe => prev.contains(fe.path))
      }
      val vNames = StructType.fromDDL(m.schemaDdl).fieldNames.toSet
      added.foreach { logged =>
        val entry = headEntries.getOrElse(logged.path, logged)
        val fromHead = headEntries.contains(logged.path)
        val ren = entry.renames.getOrElse(Map.empty)
        val phys = required.fields.map { f =>
          // resolvable = the logical name still exists where this entry's
          // rename map is maintained; otherwise a later rename/drop made
          // the pinned scan schema unreadable — fail loudly, not NULLs
          val live = if (fromHead) headNames else vNames
          require(live.contains(f.name) || ren.contains(f.name),
            s"column '${f.name}' of the pinned stream schema no longer exists at " +
              s"version $v of '$path' (schema changed mid-stream) — restart the " +
              "stream to adopt the new schema")
          ren.getOrElse(f.name, f.name)
        }
        parts += GraftFilePartition(GraftTable.resolveData(path, entry),
          entry.rows, required.toDDL, phys)
      }
      v += 1
    }
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new GraftGroupReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One changed data file: absolute path, manifest row count (serves
  * zero-column projections without opening the file), the projected
  * logical schema as DDL, and the per-field PHYSICAL in-file names
  * (rename indirection resolved at planning). */
private[graft] case class GraftFilePartition(file: String, rows: Long,
    requiredDdl: String, physNames: Array[String]) extends InputPartition

private[sources] class GraftGroupReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    new GraftGroupReader(p, StructType.fromDDL(p.requiredDdl))
  }
}

/** Row-grain parquet reader over one file: parquet-java [[Group]]
  * records converted to [[InternalRow]] under the projected logical
  * schema. Physically-absent columns (added after this file was
  * written — the guaranteed-absent indirection) read as NULL; flat
  * primitive schemas only. */
private[sources] class GraftGroupReader(p: GraftFilePartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  private val hPath = new org.apache.hadoop.fs.Path(p.file)

  private val fileSchema: MessageType = {
    val fr = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
    try fr.getFooter.getFileMetaData.getSchema finally fr.close()
  }

  // projection: the physical names present in this file, in required order
  private val presentIdx: Array[Int] = { // required-field -> requested-schema index, -1 if absent
    var n = 0
    required.fields.indices.map { i =>
      if (fileSchema.containsField(p.physNames(i))) { n += 1; n - 1 } else -1
    }.toArray
  }
  private val requestedTypes: Seq[org.apache.parquet.schema.Type] =
    required.fields.indices.filter(presentIdx(_) >= 0)
      .map(i => fileSchema.getType(fileSchema.getFieldIndex(p.physNames(i))))
  private val requested = new MessageType(fileSchema.getName, requestedTypes: _*)

  private val reader: ParquetReader[Group] =
    if (requestedTypes.isEmpty) null
    else {
      conf.set(ReadSupport.PARQUET_READ_SCHEMA, requested.toString)
      ParquetReader.builder(new GroupReadSupport(), hPath).withConf(conf).build()
    }

  private var row: InternalRow = _
  private var emptyRemaining = if (requestedTypes.isEmpty) p.rows else 0L

  override def next(): Boolean = {
    if (reader == null) { emptyRemaining -= 1; return emptyRemaining >= 0 }
    val g = reader.read()
    if (g == null) return false
    val vals = new Array[Any](required.size)
    var i = 0
    while (i < required.size) {
      val ri = presentIdx(i)
      if (ri >= 0 && g.getFieldRepetitionCount(ri) > 0)
        vals(i) = GraftGroupReader.convert(g, ri, required.fields(i).dataType,
          requested.getType(ri).asPrimitiveType())
      i += 1
    }
    row = new GenericInternalRow(vals)
    true
  }

  override def get(): InternalRow =
    if (reader == null) GraftGroupReader.EmptyRow else row
  override def close(): Unit = if (reader != null) reader.close()
}

private[sources] object GraftGroupReader {
  val EmptyRow = new GenericInternalRow(0)
  private val JulianEpochDay = 2440588L

  /** One parquet primitive value → Spark internal representation. */
  def convert(g: Group, i: Int, dt: DataType, prim: PrimitiveType): Any = dt match {
    case LongType => prim.getPrimitiveTypeName match {
      case PrimitiveTypeName.INT64 => g.getLong(i, 0)
      case PrimitiveTypeName.INT32 => g.getInteger(i, 0).toLong
      case other => unsupported(dt, other)
    }
    case IntegerType | ShortType | ByteType => g.getInteger(i, 0)
    case DoubleType => g.getDouble(i, 0)
    case FloatType => g.getFloat(i, 0)
    case BooleanType => g.getBoolean(i, 0)
    case StringType => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
    case BinaryType => g.getBinary(i, 0).getBytes
    case DateType => g.getInteger(i, 0)
    case TimestampType | TimestampNTZType => prim.getPrimitiveTypeName match {
      case PrimitiveTypeName.INT96 =>
        val bb = java.nio.ByteBuffer.wrap(g.getInt96(i, 0).getBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nanosOfDay = bb.getLong
        val julianDay = bb.getInt
        (julianDay - JulianEpochDay) * 86400L * 1000000L + nanosOfDay / 1000L
      case PrimitiveTypeName.INT64 =>
        val micros = g.getLong(i, 0)
        prim.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => t.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MILLIS => micros * 1000L
            case LogicalTypeAnnotation.TimeUnit.NANOS => micros / 1000L
            case _ => micros
          }
          case _ => micros
        }
      case other => unsupported(dt, other)
    }
    case other => throw new UnsupportedOperationException(
      s"graft streaming source reads flat primitive schemas; column type $other is " +
        "not supported — project it away or consume via the batch API")
  }

  private def unsupported(dt: DataType, prim: PrimitiveTypeName): Nothing =
    throw new UnsupportedOperationException(
      s"cannot decode parquet $prim as Spark $dt in the graft streaming source")
}
