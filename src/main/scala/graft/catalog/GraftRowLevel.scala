package graft.catalog

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.graftbridge.ClassicBridge
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.GraftTable
import graft.core.GraftTable.{FileEntry, Manifest}
import graft.sources.{GraftBatch, GraftBatchRead, GraftWrittenFile}

/** STOCK-SESSION row-level SQL on catalog names — `UPDATE graft.ns.t
  * SET …`, `MERGE INTO graft.ns.t …`, and `DELETE` shapes
  * [[GraftNamedTable.canDeleteWhere]] refuses (subqueries) — via DSv2
  * [[org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations]].
  * No extension parser required: Spark's own
  * `RewriteUpdateTable`/`RewriteMergeIntoTable`/`RewriteDeleteFromTable`
  * plan the GROUP-BASED (copy-on-write) protocol against this
  * operation's scan + write pair.
  *
  * Shape and scale contract:
  *  - the SCAN is the same manifest-planned vectorized
  *    [[graft.sources.GraftBatch]] as every named read, and the pushed
  *    command condition prunes FILES through the per-file stats/blooms
  *    — pushed filters on a row-level scan are group-granularity hints
  *    (a kept file returns ALL its live rows; a pruned file provably
  *    holds no matching row and is never rewritten). On a clustered
  *    layout an `UPDATE … WHERE date = X` rewrites the boundary files,
  *    not the table — the same blast radius as the Scala-API
  *    [[GraftTable.updateWhere]].
  *  - the WRITE is distributed (each task streams its partition into a
  *    staged parquet file — zero row traffic through the driver) and
  *    the commit is ONE manifest CAS replacing exactly the scanned
  *    files ([[GraftTable.replaceFilesCommit]]): concurrent appends
  *    rebase and survive; a concurrent rewrite of a scanned file
  *    refuses loudly.
  *  - MERGE pushes no usable condition (matching depends on the source
  *    join), so its scan keeps every candidate file — correct, with
  *    COW write amplification; `graft.deletionVectors` tables keep the
  *    O(changed rows) MOR path through the extension dialect.
  *
  * Reference analogue: the incremental models' merge semantics
  * (`models/dwh/fact_order.sql:1-7` — `unique_key` upsert) expressed
  * through the engine's own SQL front door. */
private[graft] class GraftRowLevelBuilder(path: String,
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftGroupOperation(path, info.command)
}

/** One statement's operation instance: the scan records the snapshot it
  * pinned and the files it planned (driver-side), the write's commit
  * replaces exactly those files. */
private[graft] class GraftGroupOperation(val path: String, cmd: Command)
    extends RowLevelOperation {

  @volatile private[catalog] var pinned: Manifest = _
  @volatile private[catalog] var scanned: Seq[FileEntry] = _

  override def command(): Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRowLevelScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftReplaceDataWrite(GraftGroupOperation.this, info.schema)
      }
    }

  /** At least one metadata attribute makes Spark build the write-side
    * row projections (`DataAndMetadataWritingSparkTask`) — without one,
    * the raw rewrite rows (leading `__row_operation` marker) would
    * reach the writer unprojected. `_graft_file` also gives the
    * replace rows their provenance for free. */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      graft.sources.GraftBatch.FileMetaCol))

  override def description(): String = s"GraftRowLevel($cmd, $path)"
}

private[graft] class GraftRowLevelScanBuilder(op: GraftGroupOperation)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private val tableSchema: StructType = {
    val m = GraftTable.currentManifest(op.path).getOrElse(
      throw new IllegalArgumentException(s"'${op.path}' is not a GraftTable"))
    StructType.fromDDL(m.schemaDdl)
  }
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tableSchema

  /** Group-granularity hints: accepted for the file-level stats prune,
    * all reported residual. The rewritten plan re-evaluates the full
    * condition itself — a kept file must (and does) return every live
    * row, matched or not. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters; filters
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftRowLevelScan(op, required, pushed)
}

private[graft] class GraftRowLevelScan(op: GraftGroupOperation,
    required: StructType, pushed: Array[Filter]) extends Scan {

  // pin the snapshot and record the planned file set NOW (scan build):
  // the write's commit replaces exactly these files
  private val m: Manifest = GraftTable.currentManifest(op.path).getOrElse(
    throw new IllegalStateException(s"graft table '${op.path}' vanished"))
  private val logical = StructType.fromDDL(m.schemaDdl)
  private val kept: Seq[FileEntry] = GraftBatchRead.keepByV1Filters(
    SparkSession.active, logical, GraftTable.filesOf(op.path, m), pushed)
  op.pinned = m
  op.scanned = kept

  override def readSchema(): StructType = required
  override def description(): String = s"GraftRowLevelScan ${op.path} v${m.version}"

  override def toBatch: Batch =
    new GraftBatch(SparkSession.active, op.path, m, logical, required, pushed)
}

/** Distributed replace-data write: per-task staged parquet (the same
  * executor writer as the streaming sink), one CAS commit swapping the
  * operation's scanned files for the staged output. */
private[graft] class GraftReplaceDataWrite(op: GraftGroupOperation,
    schema: StructType) extends BatchWrite {

  private val stageDir = {
    val d = new File(op.path, ".stage-rlo"); d.mkdirs(); d.getAbsolutePath
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftReplaceWriterFactory(stageDir,
      ClassicBridge.parquetWriteConf(SparkSession.active, schema))

  override def useCommitCoordinator(): Boolean = true

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    require(op.scanned != null,
      s"row-level ${op.command} on '${op.path}': write committed before its scan planned")
    val spark = SparkSession.active
    val staged = messages.collect {
      case GraftWrittenFile(f) if f.nonEmpty => new File(f)
    }.toSeq
    GraftTable.replaceFilesCommit(spark, op.path, op.scanned, staged, schema,
      op.command.toString.toLowerCase + "_rowlevel"): Unit
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftWrittenFile(f) if f.nonEmpty => new File(f).delete(): Unit
      case _ => ()
    }

  override def toString: String = s"GraftReplaceDataWrite[${op.path}]"
}

private[graft] class GraftReplaceWriterFactory(stageDir: String,
    conf: org.apache.spark.util.SerializableConfiguration) extends DataWriterFactory {
  private val runId = java.util.UUID.randomUUID.toString.take(8)
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new graft.sources.GraftStreamRowWriter(stageDir, runId, partitionId, taskId,
      epochId = 0L, conf)
}
