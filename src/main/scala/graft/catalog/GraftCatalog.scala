package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.store.{PartitionSpec, Snapshot, SnapshotLog, TableStore}

/** Database/table registry over [[graft.store.TableStore]].
  *
  * Re-expresses the reference's warehouse DDL surface
  * (`CREATE DATABASE / USE / DROP TABLE / CREATE TABLE STORED AS ICEBERG`,
  * `create_iceberg.py:106-155`) and registers each table's latest snapshot
  * as a temp view so plain `spark.sql` sees the warehouse, like the
  * reference's Impala connection sees its Iceberg catalog.
  *
  * The warehouse root is a Hadoop path (`file:`, `hdfs:`, object store),
  * so the same catalog code serves the local test layout and a cluster
  * deployment.
  *
  * Layout: `<warehouse>/<database>/<table>/{data/, snapshots.json, schema.json}`.
  */
final class GraftCatalog(val warehouse: HPath, val spark: SparkSession) {

  def this(warehouse: java.nio.file.Path, spark: SparkSession) =
    this(new HPath(warehouse.toUri), spark)

  def this(warehouse: String, spark: SparkSession) =
    this(new HPath(warehouse), spark)

  private val fs: FileSystem =
    warehouse.getFileSystem(spark.sessionState.newHadoopConf())

  @volatile private var currentDb: String = "default"

  // forDatabase views skip temp-view registration: a bare-name view for
  // a FOREIGN table would shadow the current database's table of the
  // same name for every other query in the session
  private var viewless: Boolean = false

  def store(db: String = currentDb): TableStore =
    new TableStore(new HPath(warehouse, db), spark)

  /** A catalog view pinned to `db` for one statement's table operations
    * (`INSERT INTO db.t …` without a `USE`). Shares the warehouse; does
    * NOT touch this catalog's current database or the session's temp
    * views. */
  def forDatabase(db: String): GraftCatalog = {
    require(databaseExists(db), s"database not found: $db")
    val c = new GraftCatalog(warehouse, spark)
    c.currentDb = db
    c.viewless = true
    c
  }

  def createDatabase(name: String): Unit = {
    fs.mkdirs(new HPath(warehouse, name))
  }

  def use(name: String): Unit = {
    require(fs.exists(new HPath(warehouse, name)), s"database not found: $name")
    currentDb = name
    // refresh views for the now-current database
    listTables().foreach(registerView)
  }

  def database: String = currentDb

  def listDatabases(): Seq[String] =
    if (!fs.exists(warehouse)) Seq.empty
    else fs.listStatus(warehouse).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted

  def listTables(): Seq[String] = listTablesIn(currentDb)

  /** Tables of an arbitrary database — the catalog is keyed by
    * (database, table), so a `db.table` reference never needs a `USE`
    * (the reference keeps its PC-variant schema in its own database,
    * `/root/reference/iceberg-PC.py:97`). */
  def listTablesIn(db: String): Seq[String] = {
    val dbDir = new HPath(warehouse, db)
    if (!fs.exists(dbDir)) Seq.empty
    else fs.listStatus(dbDir).toSeq.map(_.getPath)
      .filter(d => fs.exists(SnapshotLog.logPath(d)))
      .map(_.getName).sorted
  }

  def databaseExists(name: String): Boolean =
    fs.exists(new HPath(warehouse, name))

  def createTable(name: String, schema: StructType,
      partition: Option[PartitionSpec] = None,
      sortBy: Seq[String] = Seq.empty,
      bucketBy: Option[(String, Int)] = None): Unit = {
    bucketBy match {
      case None =>
        store().create(name, schema, partition, sortBy)
      case Some((key, n)) =>
        // CLUSTERED BY: storage delegates to a session-catalog bucketed
        // parquet table at the store's data/ dir — the only write path
        // that stamps bucket-file metadata, which is what lets two
        // same-bucketed tables sort-merge join with NO exchange.
        require(partition.isEmpty && sortBy.isEmpty,
          s"CLUSTERED BY cannot combine with PARTITIONED BY / SORT BY on $name")
        store().create(name, schema)
        store().setBucketSpec(name, key, n)
        val cn = bucketTableName(name)
        spark.sql(s"DROP TABLE IF EXISTS `$cn`")
        val cols = schema.fields
          .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        val loc = new HPath(store().tableDir(name), "data")
        spark.sql(s"CREATE TABLE `$cn` ($cols) USING PARQUET " +
          s"CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $n BUCKETS " +
          s"LOCATION '$loc'")
    }
    registerView(name)
  }

  /** Session-catalog identifier backing a bucketed table — keyed by
    * warehouse+database so distinct warehouses never collide. */
  private def bucketTableName(name: String): String = {
    val h = Integer.toHexString((warehouse.toString + "/" + currentDb).hashCode)
    s"graft_bkt_${h}_${currentDb}_$name"
  }

  /** The backing catalog entry, re-created on demand: the session
    * catalog is in-memory, so a NEW session opening an existing
    * warehouse finds bucket.json but no catalog table — rebuilding it
    * from the store's metadata makes bucketed tables durable across
    * sessions (the data files carry the bucket ids; only the catalog
    * row was session-scoped). */
  private def ensureBucketTable(name: String, key: String, n: Int): String = {
    val cn = bucketTableName(name)
    if (!spark.catalog.tableExists(cn)) {
      val cols = store().schema(name).fields
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      val loc = new HPath(store().tableDir(name), "data")
      spark.sql(s"CREATE TABLE IF NOT EXISTS `$cn` ($cols) USING PARQUET " +
        s"CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $n BUCKETS " +
        s"LOCATION '$loc'")
    }
    cn
  }

  def bucketSpec(name: String): Option[(String, Int)] = store().bucketSpec(name)

  def dropTable(name: String): Unit = {
    if (store().bucketSpec(name).isDefined)
      spark.sql(s"DROP TABLE IF EXISTS `${bucketTableName(name)}`")
    store().drop(name)
    // a foreign-db drop must not remove the current db's same-named view
    if (!viewless) spark.catalog.dropTempView(name)
  }

  def append(name: String, df: DataFrame,
      timestampMs: Long = System.currentTimeMillis(),
      extraSummary: Map[String, String] = Map.empty): Snapshot = {
    val snap = store().bucketSpec(name) match {
      case Some((key, n)) =>
        store().appendBucketed(name, df, ensureBucketTable(name, key, n),
          timestampMs)
      case None => store().append(name, df, timestampMs, extraSummary)
    }
    registerView(name)
    snap
  }

  def overwrite(name: String, df: DataFrame,
      timestampMs: Long = System.currentTimeMillis()): Snapshot = {
    val snap = store().overwrite(name, df, timestampMs)
    registerView(name)
    snap
  }

  /** Latest view (default) or snapshot-pinned time travel. A bucketed
    * table's latest read goes through the session catalog (bucket-aware
    * scan → no-exchange joins); time-travel reads fall back to the
    * snapshot log's plain file-list scan — correct, just unbucketed. */
  def table(name: String, asOfMs: Option[Long] = None): DataFrame =
    (if (asOfMs.isEmpty) store().bucketSpec(name) else None) match {
      case Some((key, n)) => spark.table(ensureBucketTable(name, key, n))
      case None           => store().read(name, asOfMs)
    }

  /** Snapshot-id pinned read (`FOR SYSTEM_VERSION AS OF`). */
  def tableVersion(name: String, snapshotId: Long): DataFrame =
    store().readVersion(name, snapshotId)

  def history(name: String): DataFrame = store().history(name)

  /** Remove crash debris (stale staging dirs, uncommitted data files,
    * unlogged manifests) older than `olderThanMs`. Committed data is
    * never touched. See [[TableStore.vacuum]]. */
  def vacuum(name: String, olderThanMs: Long): Unit =
    store().vacuum(name, olderThanMs)

  /** Drop snapshots older than `olderThanMs` (the latest always
    * survives) and delete files only they referenced. See
    * [[TableStore.expire]]. */
  def expireSnapshots(name: String, olderThanMs: Long): Unit =
    store().expire(name, olderThanMs)

  /** CALL rollback_to_snapshot: see [[TableStore.rollback]]. */
  def rollback(name: String, snapshotId: Long,
      timestampMs: Long = System.currentTimeMillis()): Snapshot = {
    val snap = store().rollback(name, snapshotId, timestampMs)
    registerView(name)
    snap
  }

  /** CALL rollback_to_timestamp: see [[TableStore.rollbackToTime]]. */
  def rollbackToTime(name: String, asOfMs: Long,
      timestampMs: Long = System.currentTimeMillis()): Snapshot = {
    val snap = store().rollbackToTime(name, asOfMs, timestampMs)
    registerView(name)
    snap
  }

  /** Incremental append scan: rows added after snapshot `fromId` up to
    * `toId` (None = current). See [[TableStore.readIncremental]]. */
  def readIncremental(name: String, fromId: Long,
      toId: Option[Long] = None): DataFrame =
    store().readIncremental(name, fromId, toId)

  /** Copy-on-write MERGE-INTO analogue: see [[TableStore.upsert]]. */
  def upsert(name: String, updates: DataFrame, keyCols: Seq[String],
      timestampMs: Long = System.currentTimeMillis()): Snapshot = {
    val snap = store().upsert(name, updates, keyCols, timestampMs)
    registerView(name)
    snap
  }

  /** Copy-on-write row deletion: see [[TableStore.deleteWhere]]. */
  def deleteWhere(name: String, predicate: org.apache.spark.sql.Column,
      timestampMs: Long = System.currentTimeMillis()): Snapshot = {
    val snap = store().deleteWhere(name, predicate, timestampMs)
    registerView(name)
    snap
  }

  /** Copy-on-write UPDATE: see [[TableStore.updateWhere]]. */
  def updateWhere(name: String,
      assignments: Seq[(String, org.apache.spark.sql.Column)],
      cond: Option[org.apache.spark.sql.Column],
      timestampMs: Long = System.currentTimeMillis()): Snapshot = {
    val snap = store().updateWhere(name, assignments, cond, timestampMs)
    registerView(name)
    snap
  }

  /** MERGE INTO core: see [[TableStore.merge]]. */
  def merge(name: String, sourceKeys: DataFrame, keyCols: Seq[String],
      replace: DataFrame => DataFrame,
      timestampMs: Long = System.currentTimeMillis(),
      rewriteAll: Boolean = false): Snapshot = {
    val snap = store().merge(name, sourceKeys, keyCols, replace, timestampMs,
      rewriteAll)
    registerView(name)
    snap
  }

  /** Partition-pruned read: see [[TableStore.readWhere]]. */
  def tableWhere(name: String, predicate: org.apache.spark.sql.Column,
      asOfMs: Option[Long] = None): DataFrame =
    store().readWhere(name, predicate, asOfMs)

  /** ALTER TABLE ADD COLUMNS: see [[TableStore.addColumns]]. */
  def addColumns(name: String, cols: StructType): Unit = {
    store().addColumns(name, cols)
    registerView(name)
  }

  /** ALTER TABLE DROP COLUMN: see [[TableStore.dropColumn]]. */
  def dropColumn(name: String, column: String): Unit = {
    store().dropColumn(name, column)
    registerView(name)
  }

  /** ALTER TABLE RENAME COLUMN: see [[TableStore.renameColumn]]. */
  def renameColumn(name: String, from: String, to: String): Unit = {
    store().renameColumn(name, from, to)
    registerView(name)
  }

  /** ALTER TABLE ALTER COLUMN TYPE (widening): see
    * [[TableStore.widenColumn]]. */
  def widenColumn(name: String, column: String,
      to: org.apache.spark.sql.types.DataType): Unit = {
    store().widenColumn(name, column, to)
    registerView(name)
  }

  /** ALTER TABLE SET PARTITION SPEC: see [[TableStore.setPartitionSpec]]. */
  def setPartitionSpec(name: String, spec: graft.store.PartitionSpec): Unit =
    store().setPartitionSpec(name, spec)

  /** TRUNCATE TABLE: see [[TableStore.truncate]]. */
  def truncate(name: String,
      timestampMs: Long = System.currentTimeMillis()): Snapshot = {
    val snap = store().truncate(name, timestampMs)
    registerView(name)
    snap
  }

  def compact(name: String, targetBytes: Long = 128L * 1024 * 1024): Snapshot = {
    val snap = store().compact(name, targetBytes)
    registerView(name)
    snap
  }

  /** Make `spark.sql("SELECT ... FROM <name>")` resolve to the latest
    * snapshot (the reference's default read, `README.md:75-79`).
    */
  def registerView(name: String): Unit =
    if (!viewless) table(name).createOrReplaceTempView(name)
}
