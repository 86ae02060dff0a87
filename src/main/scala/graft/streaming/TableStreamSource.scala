package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.TableStore

/** DataSource V2 streaming source over the snapshot store's incremental
  * read: `spark.readStream.format("graft-table")` turns a snapshot table
  * into a first-class Structured Streaming source, the way Iceberg's
  * `spark.readStream.table` serves the reference's append workflow
  * (`append_iceberg.py:182-215` appends, consumers follow the table).
  *
  * Offsets ARE snapshot ids: `latestOffset` is one tiny metadata read of
  * the log tail, and each micro-batch plans exactly the files added in
  * `(startOffset, endOffset]` via [[TableStore.incrementalFiles]] — a
  * pure metadata file-set diff, one [[InputPartition]] per added file.
  * A consumer keeping up with appends on a 100 TB table therefore
  * streams deltas and never re-reads the base, and the engine's own
  * checkpointed offset log gives exactly-once across restarts for free.
  *
  * A rewrite snapshot (delete/update/replace/merge) inside a planned
  * range makes `incrementalFiles` raise and FAILS the query — mirroring
  * Iceberg's streaming-read default for overwrite snapshots, because a
  * file diff across a rewrite no longer means "added rows". The operator
  * decides whether to resume past it with a fresh
  * `startAfterSnapshotId`.
  *
  * Options: `warehouse` (required), `table` (required), `database`
  * (default `default`), `startAfterSnapshotId` (default 0 = from the
  * beginning; only consulted when the checkpoint has no offset yet),
  * `maxFilesPerTrigger` (admission control: a micro-batch ends at the
  * last snapshot that keeps its added-file count within the cap — the
  * first start against a deep backlog chunks into bounded batches
  * instead of planning one giant catch-up batch; at least one snapshot
  * always admits, so progress is guaranteed). `Trigger.AvailableNow`
  * is supported: the stream drains everything committed at start-up —
  * still rate-limited — then stops.
  *
  * Executor side, each partition is read with Spark's own
  * [[VectorizedParquetRecordReader]] (columnar, off-heap-capable), with
  * per-file schema reconciliation: a file written before an `ALTER TABLE
  * ADD COLUMN` simply null-fills the new column, so a long-running
  * stream survives schema evolution mid-flight.
  */
final class GraftTableSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val o = GraftStreamOptions(options.asCaseSensitiveMap())
    o.store(SparkSession.active).schema(o.table)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftStreamTable(schema, GraftStreamOptions(properties))
}

private[streaming] final case class GraftStreamOptions(
    warehouse: String, database: String, table: String, startAfter: Long,
    maxFilesPerTrigger: Option[Int], maxRowsPerTrigger: Option[Long]) {
  def store(spark: SparkSession): TableStore =
    new TableStore(new HPath(new HPath(warehouse), database), spark)
}

private[streaming] object GraftStreamOptions {
  def apply(props: util.Map[String, String]): GraftStreamOptions = {
    val m = props.asScala.map { case (k, v) => k.toLowerCase -> v }
    def req(k: String): String = m.getOrElse(k,
      throw new IllegalArgumentException(s"graft-table source requires option '$k'"))
    val maxFiles = m.get("maxfilespertrigger").map(_.toInt)
    maxFiles.foreach(n => require(n >= 1,
      s"maxFilesPerTrigger must be >= 1 (got $n)"))
    val maxRows = m.get("maxrowspertrigger").map(_.toLong)
    maxRows.foreach(n => require(n >= 1,
      s"maxRowsPerTrigger must be >= 1 (got $n)"))
    GraftStreamOptions(req("warehouse"), m.getOrElse("database", "default"),
      req("table"), m.get("startaftersnapshotid").map(_.toLong).getOrElse(0L),
      maxFiles, maxRows)
  }
}

private[streaming] final class GraftStreamTable(
    tableSchema: StructType, opts: GraftStreamOptions)
    extends Table with SupportsRead {
  override def name(): String = s"graft:${opts.database}.${opts.table}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      // Column pruning reaches the vectorized reader: a consumer
      // projecting two columns of a wide 100 TB table must decode two
      // column chunks per file, not the row. The reader null-fills a
      // requested column absent from an old file, so pruning composes
      // with schema evolution.
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = required
        override def description(): String = s"GraftTableScan(${name()})"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftMicroBatchStream(required, opts)
      }
    }
}

/** Offsets are snapshot ids — monotonic per table, so offset ordering is
  * commit ordering and a range `(a, b]` names an exact set of appends. */
private[streaming] final case class GraftOffset(snapshotId: Long) extends Offset {
  override def json(): String = s"""{"snapshotId":$snapshotId}"""
}

private[streaming] object GraftOffset {
  private val Re = """\{\s*"snapshotId"\s*:\s*(\d+)\s*\}""".r
  def fromJson(json: String): GraftOffset = json.trim match {
    case Re(id) => GraftOffset(id.toLong)
    case other => throw new IllegalArgumentException(s"bad graft offset: $other")
  }
  def of(o: Offset): GraftOffset = o match {
    case g: GraftOffset => g
    case other => fromJson(other.json())
  }
}

private[streaming] final class GraftMicroBatchStream(
    tableSchema: StructType, opts: GraftStreamOptions)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Driver-side only: re-resolved per call so a restarted driver (new
  // session) still plans correctly.
  private def store: TableStore = opts.store(SparkSession.active)

  // Monotonic guard: a log read that races a commit's atomic rename can
  // transiently see no log at all. Snapshot ids only grow, so the offset
  // must too — a regressed end offset would poison the engine's cursor
  // and re-deliver the base on the next batch.
  @volatile private var maxSeen: Long = opts.startAfter

  // Trigger.AvailableNow: everything committed at prepare time is the
  // drain target; later commits wait for the next run.
  @volatile private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = GraftOffset(opts.startAfter)

  override def latestOffset(): Offset = {
    val cur = store.currentSnapshotId(opts.table).getOrElse(maxSeen)
    if (cur > maxSeen) maxSeen = cur
    GraftOffset(maxSeen)
  }

  override def getDefaultReadLimit: ReadLimit = {
    val limits = opts.maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      opts.maxRowsPerTrigger.map(ReadLimit.maxRows).toSeq
    limits match {
      case Seq()  => ReadLimit.allAvailable()
      case Seq(l) => l
      case many   => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget =
      Some(store.currentSnapshotId(opts.table).getOrElse(opts.startAfter))

  override def reportLatestOffset(): Offset = latestOffset()

  /** Admission control: the batch ends at the last snapshot whose
    * cumulative added-file AND added-row counts stay within the limits —
    * so a deep backlog (first start against years of appends) chunks
    * into bounded micro-batches instead of one giant catch-up plan. The
    * first snapshot always admits (a single snapshot larger than the cap
    * must still go through, or the stream stalls forever), matching the
    * file source's maxFilesPerTrigger soft-cap semantics. Both budgets
    * come from the log's cumulative counts — no manifest hydration. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = GraftOffset.of(start).snapshotId
    val unbounded = {
      val cur = store.currentSnapshotId(opts.table).getOrElse(maxSeen)
      if (cur > maxSeen) maxSeen = cur
      availableNowTarget.fold(maxSeen)(math.min(maxSeen, _))
    }
    def caps(l: ReadLimit): (Option[Long], Option[Long]) = l match {
      case c: CompositeReadLimit =>
        c.getReadLimits.map(caps).foldLeft(
          (Option.empty[Long], Option.empty[Long])) { case ((f1, r1), (f2, r2)) =>
          (Seq(f1, f2).flatten.minOption, Seq(r1, r2).flatten.minOption)
        }
      case f: ReadMaxFiles => (Some(f.maxFiles().toLong), None)
      case r: ReadMaxRows  => (None, Some(r.maxRows()))
      case _               => (None, None) // allAvailable / unrecognised
    }
    caps(limit) match {
      case (None, None) => GraftOffset(unbounded)
      case (fileCap, rowCap) =>
        var end = from
        var fileBudget = fileCap.getOrElse(Long.MaxValue)
        var rowBudget = rowCap.getOrElse(Long.MaxValue)
        var admitting = true
        for ((id, _, files, rows) <- store.snapshotSizesAfter(opts.table, from)
             if admitting && id <= unbounded) {
          // offsets are contiguous snapshot ranges: stop at the FIRST
          // snapshot that busts a budget (skipping one would silently
          // re-admit it via the range diff anyway)
          if (end == from || (files <= fileBudget && rows <= rowBudget)) {
            end = id; fileBudget -= files; rowBudget -= rows
          } else admitting = false
        }
        GraftOffset(math.max(end, from))
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = GraftOffset.of(start).snapshotId
    val to = GraftOffset.of(end).snapshotId
    if (to <= from) Array.empty
    else {
      val st = store
      val (added, _) = st.incrementalFiles(opts.table, from, Some(to))
      added.map(f => GraftFilePartition(
        new HPath(st.tableDir(opts.table), f.path).toString): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftReaderFactory(tableSchema.json)

  // Snapshot history IS the source's replay log and is retained by the
  // table's own vacuum policy — nothing extra to clean up per batch.
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def deserializeOffset(json: String): Offset = GraftOffset.fromJson(json)
}

private[streaming] final case class GraftFilePartition(path: String) extends InputPartition

private[streaming] final case class GraftReaderFactory(schemaJson: String)
    extends PartitionReaderFactory {
  @transient private lazy val schema =
    DataType.fromJson(schemaJson).asInstanceOf[StructType]
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(
      partition.asInstanceOf[GraftFilePartition].path, schema)
}

/** Reads one data file with Spark's vectorized parquet reader and
  * reconciles the file's columns onto the scan schema (null-filling
  * columns added after the file was written, dropping columns since
  * removed) — the same late-binding Iceberg does per data file.
  */
private[streaming] final class GraftPartitionReader(
    path: String, requested: StructType) extends PartitionReader[InternalRow] {

  private val hconf = new Configuration()

  // Footer-first: which of the requested columns exist in this file
  // (the vectorized reader raises on absent columns, so request only
  // the intersection and null-fill the rest row-side), plus the file's
  // row count — when NO requested column exists (a pruned projection of
  // columns all newer than the file), the reader must still emit one
  // null-filled row per data row, not zero rows.
  private val (present: Array[StructField], fileRows: Long) = {
    val pf = ParquetFileReader.open(HadoopInputFile.fromPath(new HPath(path), hconf))
    try {
      val names =
        pf.getFooter.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSet
      (requested.fields.filter(f => names.contains(f.name)),
        pf.getFooter.getBlocks.asScala.map(_.getRowCount.toLong).sum)
    } finally pf.close()
  }

  // column-less path: one null row per data row
  private var emitted: Long = 0L

  private val reader: VectorizedParquetRecordReader =
    if (present.isEmpty) null
    else {
      // Files are always written by this engine (Spark 4, int64-micros
      // timestamps), so proleptic-Gregorian rebase is a no-op: CORRECTED.
      val r = new VectorizedParquetRecordReader(
        null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
      r.initialize(path, present.map(_.name).toList.asJava)
      r
    }

  private val srcIdx: Array[Int] =
    requested.fields.map(f => present.indexWhere(_.name == f.name))
  private val aligned =
    present.length == requested.length && srcIdx.zipWithIndex.forall(p => p._1 == p._2)
  private val toUnsafe = UnsafeProjection.create(requested)

  override def next(): Boolean =
    if (reader != null) reader.nextKeyValue()
    else if (emitted < fileRows) { emitted += 1; true }
    else false

  override def get(): InternalRow = {
    if (reader == null)
      return toUnsafe(new GenericInternalRow(new Array[Any](requested.length)))
    val src = reader.getCurrentValue.asInstanceOf[InternalRow]
    if (aligned) toUnsafe(src)
    else {
      val vals = new Array[Any](requested.length)
      var j = 0
      while (j < requested.length) {
        val s = srcIdx(j)
        vals(j) =
          if (s < 0 || src.isNullAt(s)) null
          else src.get(s, requested.fields(j).dataType)
        j += 1
      }
      toUnsafe(new GenericInternalRow(vals))
    }
  }

  override def close(): Unit = if (reader != null) reader.close()
}
