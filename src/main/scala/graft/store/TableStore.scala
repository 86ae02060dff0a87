package graft.store

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Versioned-Parquet table with Iceberg-style snapshot semantics.
  *
  * Layout: `<root>/<table>/data/part-*.parquet` + `<root>/<table>/snapshots.json`.
  *
  * Maps the reference's observable table semantics
  * (`telco_spark/append_telco_spark_iceberg.py:67` `writeTo().append()`;
  * time travel `app-gradio.py:138`; history `README.md:94-98`) onto plain
  * Parquet + a commit log. All filesystem access goes through Hadoop
  * [[FileSystem]], so `root` may be `file:`, `hdfs:`, or any object store
  * with a Hadoop connector. At cluster scale each append is a distributed
  * Parquet write; only the (tiny) file list and footers touch the driver,
  * so the design holds at 100 TB — data bytes never funnel through one
  * node.
  */
final class TableStore(val root: HPath, spark: SparkSession) {

  private val fs: FileSystem =
    root.getFileSystem(spark.sessionState.newHadoopConf())

  def tableDir(table: String): HPath = new HPath(root, table)
  private def dataDir(table: String): HPath = new HPath(tableDir(table), "data")

  def exists(table: String): Boolean =
    fs.exists(SnapshotLog.logPath(tableDir(table)))

  def create(table: String, schema: StructType): Unit = {
    fs.mkdirs(dataDir(table))
    // Persist the schema so an empty table is still readable.
    writeString(new HPath(tableDir(table), "schema.json"), schema.json)
    if (SnapshotLog.read(fs, tableDir(table)).isEmpty)
      SnapshotLog.write(fs, tableDir(table), Seq.empty)
  }

  def drop(table: String): Unit = {
    val dir = tableDir(table)
    if (fs.exists(dir)) fs.delete(dir, true)
  }

  def schema(table: String): StructType = {
    val p = new HPath(tableDir(table), "schema.json")
    if (fs.exists(p))
      DataType.fromJson(readString(p)).asInstanceOf[StructType]
    else spark.read.parquet(currentFiles(table): _*).schema
  }

  /** ACID-ish append: write new Parquet files into data/, then commit their
    * names to the log. Readers only see files listed in a committed
    * snapshot, so a failed write leaves orphans, never partial reads —
    * the same visibility rule Iceberg gives `writeTo().append()`.
    * Row counts come from the Parquet footers of the freshly written
    * files (driver-side metadata reads, bytes never re-scanned).
    */
  def append(table: String, df: DataFrame,
      timestampMs: Long = System.currentTimeMillis()): Snapshot = {
    val (moved, n) = writeAndPromote(table, df)
    // Only the DELTA row count goes in: the cumulative recordCount is
    // computed inside the commit lock from the predecessor snapshot, so
    // two concurrent appends cannot both base their total on the same
    // stale prior count.
    SnapshotLog.commit(fs, tableDir(table), "append", moved,
      n, timestampMs, replaceAll = false,
      summary = Map("added-files" -> moved.size.toString, "added-records" -> n.toString))
  }

  /** Replace table contents (used by compaction and overwrite loads). */
  def overwrite(table: String, df: DataFrame,
      timestampMs: Long = System.currentTimeMillis(),
      operation: String = "replace"): Snapshot = {
    val (moved, n) = writeAndPromote(table, df)
    SnapshotLog.commit(fs, tableDir(table), operation, moved, n, timestampMs,
      replaceAll = true,
      summary = Map("added-files" -> moved.size.toString, "total-records" -> n.toString))
  }

  /** Distributed Parquet write into a staging dir, promote the part files
    * into data/, return (relative paths, row count from footers). */
  private def writeAndPromote(table: String, df: DataFrame): (Seq[String], Long) = {
    val staging = new HPath(tableDir(table), s"stage-${UUID.randomUUID()}")
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val moved = promoteStaged(table, staging)
    val n = moved.map(f => parquetRowCount(new HPath(tableDir(table), f))).sum
    (moved, n)
  }

  /** Total record count from a Parquet file's footer — metadata only. */
  private def parquetRowCount(file: HPath): Long = {
    val in = HadoopInputFile.fromPath(file, fs.getConf)
    val reader = ParquetFileReader.open(in)
    try reader.getRecordCount
    finally reader.close()
  }

  private def promoteStaged(table: String, staging: HPath): Seq[String] = {
    fs.mkdirs(dataDir(table))
    val parts = fs.listStatus(staging).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.toString)
    val moved = parts.map { p =>
      val name = s"${UUID.randomUUID()}-${p.getName}"
      val target = new HPath(dataDir(table), name)
      if (!fs.rename(p, target))
        throw new java.io.IOException(s"rename failed: $p -> $target")
      s"data/$name"
    }
    // clean staging remnants (_SUCCESS, .crc)
    fs.delete(staging, true)
    moved
  }

  def currentFiles(table: String): Seq[String] =
    filesAsOf(table, None)

  def filesAsOf(table: String, asOfMs: Option[Long]): Seq[String] = {
    val snap = SnapshotLog.resolve(fs, tableDir(table), asOfMs)
    snap.map(_.files.map(f => new HPath(tableDir(table), f).toString))
      .getOrElse(Seq.empty)
  }

  /** Snapshot-id read (`FOR SYSTEM_VERSION AS OF`). Unknown ids raise —
    * silently returning empty would read as "no data at that version". */
  def readVersion(table: String, snapshotId: Long): DataFrame = {
    val snap = SnapshotLog.resolveVersion(fs, tableDir(table), snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"table $table has no snapshot id $snapshotId"))
    val files = snap.files.map(f => new HPath(tableDir(table), f).toString)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema(table))
    else spark.read.schema(schema(table)).parquet(files: _*)
  }

  /** Latest-snapshot read; `asOfMs` = time travel. Snapshot resolution →
    * exact file list is the manifest-pruning analogue: Spark scans only the
    * files of that version (no directory listing, no stale files).
    */
  def read(table: String, asOfMs: Option[Long] = None): DataFrame = {
    val files = filesAsOf(table, asOfMs)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema(table))
    else spark.read.schema(schema(table)).parquet(files: _*)
  }

  /** `tbl$history`-style metadata DataFrame (`README.md:94-98`). */
  def history(table: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val snaps = SnapshotLog.read(fs, tableDir(table))
    val rows = snaps.map(s => Row(s.id, new java.sql.Timestamp(s.timestampMs),
      s.operation, s.files.size, s.recordCount))
    val sch = StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("data_files", IntegerType, nullable = false),
      StructField("record_count", LongType, nullable = false)))
    spark.createDataFrame(rows.asJava, sch)
  }

  /** Copy-on-write upsert (the MERGE INTO analogue): rows of `updates`
    * replace current rows with the same key; unmatched rows insert. One
    * `overwrite` snapshot; prior snapshots keep the old rows for time
    * travel. Table-level copy-on-write — an optimization to file-level
    * COW (rewrite only files containing matched keys, as Iceberg does)
    * swaps in here without changing the commit semantics.
    */
  def upsert(table: String, updates: DataFrame, keyCols: Seq[String],
      timestampMs: Long = System.currentTimeMillis()): Snapshot = {
    val remaining = read(table).join(
      updates.select(keyCols.map(org.apache.spark.sql.functions.col): _*).distinct(),
      keyCols, "left_anti")
    overwrite(table, remaining.unionByName(updates), timestampMs,
      operation = "overwrite")
  }

  /** Copy-on-write row deletion: keep rows NOT matching `predicate`,
    * commit a `delete` snapshot. SQL DELETE removes only rows where the
    * predicate is TRUE — a NULL predicate (e.g. `balance = 0` on a NULL
    * balance) must keep the row, so the kept-set filter coalesces NULL
    * to false before negating. */
  def deleteWhere(table: String, predicate: org.apache.spark.sql.Column,
      timestampMs: Long = System.currentTimeMillis()): Snapshot = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    overwrite(table, read(table).filter(not(coalesce(predicate, lit(false)))),
      timestampMs, operation = "delete")
  }

  /** Bin-pack small files into ~targetBytes files; commit a `replace`
    * snapshot. Old files stay referenced by old snapshots (time travel
    * keeps working) until `expire`.
    */
  def compact(table: String, targetBytes: Long = 128L * 1024 * 1024): Snapshot = {
    val files = currentFiles(table)
    val totalBytes = files.map(f => fs.getFileStatus(new HPath(f)).getLen).sum
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // coalesce, not repartition: merging small files needs no shuffle —
    // at 100 TB a full shuffle to rewrite a table is the difference
    // between an I/O-bound rewrite and doubling cluster network traffic
    val df = read(table).coalesce(numFiles)
    overwrite(table, df, operation = "replace")
  }

  /** Drop snapshots older than `olderThanMs` (keeping the latest) and
    * delete data files no surviving snapshot references.
    */
  def expire(table: String, olderThanMs: Long): Unit = {
    val dir = tableDir(table)
    val all = SnapshotLog.read(fs, dir)
    if (all.size <= 1) return
    val keep = all.filter(s => s.timestampMs >= olderThanMs) match {
      case Seq() => Seq(all.last)
      case ks if ks.contains(all.last) => ks
      case ks => ks :+ all.last
    }
    val live = keep.flatMap(_.files).toSet
    all.flatMap(_.files).distinct.filterNot(live.contains).foreach { f =>
      fs.delete(new HPath(dir, f), false)
    }
    SnapshotLog.write(fs, dir, keep)
  }

  private def readString(p: HPath): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  private def writeString(p: HPath, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
