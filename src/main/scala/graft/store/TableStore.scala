package graft.store

import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Versioned-Parquet table with Iceberg-style snapshot semantics.
  *
  * Layout: `<root>/<table>/data/part-*.parquet` + `<root>/<table>/snapshots.json`.
  *
  * Maps the reference's observable table semantics
  * (`telco_spark/append_telco_spark_iceberg.py:67` `writeTo().append()`;
  * time travel `app-gradio.py:138`; history `README.md:94-98`) onto plain
  * Parquet + a commit log. At cluster scale each append is a distributed
  * Parquet write; only the (tiny) file list touches the driver, so the
  * design holds at 100 TB — data files never funnel through one node.
  */
final class TableStore(val root: Path, spark: SparkSession) {

  def tableDir(table: String): Path = root.resolve(table)
  private def dataDir(table: String): Path = tableDir(table).resolve("data")

  def exists(table: String): Boolean =
    Files.exists(SnapshotLog.logPath(tableDir(table)))

  def create(table: String, schema: StructType): Unit = {
    Files.createDirectories(dataDir(table))
    // Persist the schema so an empty table is still readable.
    Files.writeString(tableDir(table).resolve("schema.json"), schema.json)
    if (SnapshotLog.read(tableDir(table)).isEmpty)
      SnapshotLog.write(tableDir(table), Seq.empty)
  }

  def drop(table: String): Unit = {
    val dir = tableDir(table)
    if (Files.exists(dir)) {
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  def schema(table: String): StructType = {
    val p = tableDir(table).resolve("schema.json")
    if (Files.exists(p))
      DataType.fromJson(Files.readString(p)).asInstanceOf[StructType]
    else spark.read.parquet(currentFiles(table): _*).schema
  }

  /** ACID-ish append: write new Parquet files into data/, then commit their
    * names to the log. Readers only see files listed in a committed
    * snapshot, so a failed write leaves orphans, never partial reads —
    * the same visibility rule Iceberg gives `writeTo().append()`.
    */
  def append(table: String, df: DataFrame,
      timestampMs: Long = System.currentTimeMillis()): Snapshot = {
    val staging = tableDir(table).resolve(s"stage-${UUID.randomUUID()}")
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val moved = promoteStaged(table, staging)
    val n = spark.read.parquet(
      moved.map(f => tableDir(table).resolve(f).toString): _*).count()
    SnapshotLog.commit(tableDir(table), "append", moved, rowCountAfter(table, moved, n),
      timestampMs, replaceAll = false,
      summary = Map("added-files" -> moved.size.toString, "added-records" -> n.toString))
  }

  /** Replace table contents (used by compaction and overwrite loads). */
  def overwrite(table: String, df: DataFrame,
      timestampMs: Long = System.currentTimeMillis(),
      operation: String = "replace"): Snapshot = {
    val staging = tableDir(table).resolve(s"stage-${UUID.randomUUID()}")
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val moved = promoteStaged(table, staging)
    val n = spark.read.parquet(
      moved.map(f => tableDir(table).resolve(f).toString): _*).count()
    SnapshotLog.commit(tableDir(table), operation, moved, n, timestampMs,
      replaceAll = true,
      summary = Map("added-files" -> moved.size.toString, "total-records" -> n.toString))
  }

  private def promoteStaged(table: String, staging: Path): Seq[String] = {
    Files.createDirectories(dataDir(table))
    val parts = Files.list(staging).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    val moved = parts.map { p =>
      val target = dataDir(table).resolve(s"${UUID.randomUUID()}-${p.getFileName}")
      Files.move(p, target)
      root.relativize(target).toString.stripPrefix(s"$table/")
    }
    // clean staging remnants (_SUCCESS, .crc)
    Files.walk(staging).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    moved
  }

  private def rowCountAfter(table: String, added: Seq[String], addedRows: Long): Long =
    SnapshotLog.read(tableDir(table)).lastOption.map(_.recordCount).getOrElse(0L) + addedRows

  def currentFiles(table: String): Seq[String] =
    filesAsOf(table, None)

  def filesAsOf(table: String, asOfMs: Option[Long]): Seq[String] = {
    val snap = SnapshotLog.resolve(tableDir(table), asOfMs)
    snap.map(_.files.map(f => tableDir(table).resolve(f).toString)).getOrElse(Seq.empty)
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
    val snaps = SnapshotLog.read(tableDir(table))
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

  /** Bin-pack small files into ~targetBytes files; commit a `replace`
    * snapshot. Old files stay referenced by old snapshots (time travel
    * keeps working) until `expire`.
    */
  def compact(table: String, targetBytes: Long = 128L * 1024 * 1024): Snapshot = {
    val files = currentFiles(table)
    val totalBytes = files.map(f => Files.size(Paths.get(f))).sum
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = read(table).repartition(numFiles)
    overwrite(table, df, operation = "replace")
  }

  /** Drop snapshots older than `olderThanMs` (keeping the latest) and
    * delete data files no surviving snapshot references.
    */
  def expire(table: String, olderThanMs: Long): Unit = {
    val dir = tableDir(table)
    val all = SnapshotLog.read(dir)
    if (all.size <= 1) return
    val keep = all.filter(s => s.timestampMs >= olderThanMs) match {
      case Seq() => Seq(all.last)
      case ks if ks.contains(all.last) => ks
      case ks => ks :+ all.last
    }
    val live = keep.flatMap(_.files).toSet
    all.flatMap(_.files).distinct.filterNot(live.contains).foreach { f =>
      Files.deleteIfExists(dir.resolve(f))
    }
    SnapshotLog.write(dir, keep)
  }
}
