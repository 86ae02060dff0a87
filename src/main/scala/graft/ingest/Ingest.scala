package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog

/** CSV→cast→append ingest pipeline.
  *
  * Port of the shape of `telco_spark/append_telco_spark_iceberg.py:40-67`:
  * header+inferSchema read, explicit corrective `to_date`/`to_timestamp`
  * casts per table (inference gets dates wrong), count, append, verify.
  * The cast map is data-driven rather than hard-coded per telco table so
  * the pipeline stays schema-agnostic (SURVEY.md §1.2).
  */
object Ingest {

  final case class Cast(column: String, kind: String, format: String)
  object Cast {
    def date(col: String, fmt: String = "yyyy-MM-dd"): Cast = Cast(col, "date", fmt)
    def timestamp(col: String, fmt: String = "yyyy-MM-dd HH:mm:ss"): Cast =
      Cast(col, "timestamp", fmt)
  }

  def readCsv(spark: SparkSession, path: String, casts: Seq[Cast] = Seq.empty): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)
    casts.foldLeft(raw) { (df, c) =>
      c.kind match {
        case "date" => df.withColumn(c.column, to_date(col(c.column), c.format))
        case "timestamp" => df.withColumn(c.column, to_timestamp(col(c.column), c.format))
        case other => throw new IllegalArgumentException(s"unknown cast kind: $other")
      }
    }
  }

  /** CSV → typed DF → snapshot append; returns (rowsIngested, totalAfter)
    * mirroring the count-then-verify flow
    * (`telco_spark/append_telco_spark_iceberg.py:64-72`). */
  def appendCsv(catalog: GraftCatalog, table: String, csvPath: String,
      casts: Seq[Cast] = Seq.empty,
      timestampMs: Long = System.currentTimeMillis()): (Long, Long) = {
    val df = readCsv(catalog.spark, csvPath, casts)
    val n = df.count()
    catalog.append(table, df, timestampMs)
    (n, catalog.table(table).count())
  }

  /** MAX-id continuation for incremental appends
    * (`append_iceberg.py:104-123`): next id = MAX(idCol)+1, or 1 on empty.
    */
  def nextId(catalog: GraftCatalog, table: String, idCol: String): Long = {
    catalog.table(table).agg(max(col(idCol))).head().get(0) match {
      case null => 1L
      case i: Int => i + 1L
      case l: Long => l + 1L
      case other => throw new IllegalArgumentException(s"non-integral id column $idCol: $other")
    }
  }
}
