package graft.store

import java.time.{LocalDate, ZoneId}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, date_format}
import org.apache.spark.sql.types._

import graft.store.Pruning.ColRange

/** Table partition spec: one source column + a transform, Iceberg's hidden
  * partitioning re-expressed for the snapshot store. The reference's
  * production tables would carry `PARTITIONED BY SPEC (day(ts))` on their
  * Iceberg DDL (`/root/reference/create_iceberg.py:119-148` creates them
  * unpartitioned at demo scale); at 100 TB the spec is what bounds a
  * day-scoped query to a day's files.
  *
  * Transforms: `identity`, `day`, `month`, `year`. Partition values are
  * STRINGS as rendered into the write path's directory names
  * (`yyyy-MM-dd` / `yyyy-MM` / `yyyy`), zero-padded so lexicographic order
  * is chronological. [[sourceRange]] maps a value back to an inclusive
  * min/max range of the SOURCE column, so partition pruning reuses the
  * same conservative evaluator as footer-stats pruning
  * ([[Pruning.mightMatch]]) — predicates stay on the source column, the
  * transform stays hidden, which is exactly Iceberg's contract.
  */
final case class PartitionSpec(column: String, transform: String) {
  require(PartitionSpec.Transforms.contains(transform),
    s"unsupported partition transform: $transform " +
      s"(supported: ${PartitionSpec.Transforms.mkString(", ")})")

  /** Column expression computing the partition value at write time.
    * `date_format` uses the session time zone — [[sourceRange]] parses
    * with the same zone, so write-side values and read-side ranges agree. */
  def valueColumn: Column = transform match {
    case "identity" => col(column).cast(StringType)
    case "day"      => date_format(col(column), "yyyy-MM-dd")
    case "month"    => date_format(col(column), "yyyy-MM")
    case "year"     => date_format(col(column), "yyyy")
  }

  /** Inclusive source-column range covered by one partition value, in
    * [[Pruning]]'s normalised value space. `sourceType` is the column's
    * Spark type; `zone` the session time zone. Null partitions
    * (`__HIVE_DEFAULT_PARTITION__`) → all-null range. */
  def sourceRange(value: String, sourceType: DataType, zone: ZoneId): ColRange = {
    if (value == PartitionSpec.NullPartition)
      return ColRange(None, None, hasNulls = true, allNulls = true)
    def dateSpan: Option[(LocalDate, LocalDate)] = transform match {
      case "day" =>
        val d = LocalDate.parse(value); Some((d, d.plusDays(1)))
      case "month" =>
        val d = LocalDate.parse(value + "-01"); Some((d, d.plusMonths(1)))
      case "year" =>
        val d = LocalDate.parse(value + "-01-01"); Some((d, d.plusYears(1)))
      case _ => None
    }
    try {
      (transform, sourceType) match {
        case ("identity", _) =>
          val v = PartitionSpec.parseIdentity(value, sourceType)
          ColRange(v, v, hasNulls = false)
        case (_, DateType) =>
          dateSpan.map { case (lo, hi) =>
            ColRange(Some(lo.toEpochDay), Some(hi.toEpochDay - 1), hasNulls = false)
          }.getOrElse(ColRange(None, None))
        case (_, TimestampType) =>
          dateSpan.map { case (lo, hi) =>
            val loUs = lo.atStartOfDay(zone).toInstant.toEpochMilli * 1000L
            val hiUs = hi.atStartOfDay(zone).toInstant.toEpochMilli * 1000L
            ColRange(Some(loUs), Some(hiUs - 1), hasNulls = false)
          }.getOrElse(ColRange(None, None))
        case (_, TimestampNTZType) =>
          // NTZ is a zone-FREE wall time: its internal micros are the
          // local datetime read as UTC, and date_format renders the wall
          // time unchanged — so the range must not shift by any zone
          dateSpan.map { case (lo, hi) =>
            val loUs = lo.atStartOfDay(java.time.ZoneOffset.UTC)
              .toInstant.toEpochMilli * 1000L
            val hiUs = hi.atStartOfDay(java.time.ZoneOffset.UTC)
              .toInstant.toEpochMilli * 1000L
            ColRange(Some(loUs), Some(hiUs - 1), hasNulls = false)
          }.getOrElse(ColRange(None, None))
        case _ => ColRange(None, None)
      }
    } catch { case _: Exception => ColRange(None, None) } // unparseable: keep
  }
}

object PartitionSpec {
  val Transforms: Set[String] = Set("identity", "day", "month", "year")

  /** Hive's null-partition directory marker, reused as the stored value. */
  val NullPartition = "__HIVE_DEFAULT_PARTITION__"

  private[store] def parseIdentity(value: String, dt: DataType): Option[Any] =
    try dt match {
      case ByteType | ShortType | IntegerType | LongType => Some(value.toLong)
      case FloatType | DoubleType => Some(value.toDouble)
      case StringType             => Some(value)
      case BooleanType            => Some(value.toBoolean)
      case DateType               => Some(LocalDate.parse(value).toEpochDay)
      case _                      => None
    } catch { case _: Exception => None }

  /** `PARTITIONED BY (day(ts))` / `(ts)` DDL fragment → spec. */
  def parse(fragment: String): PartitionSpec = {
    val F = "(?i)^\\s*(?:(identity|day|month|year)\\s*\\(\\s*)?`?([A-Za-z_]\\w*)`?\\s*\\)?\\s*$".r
    fragment.trim match {
      case F(null, c)  => PartitionSpec(c, "identity")
      case F(tr, c)    => PartitionSpec(c, tr.toLowerCase)
      case other => throw new IllegalArgumentException(
        s"cannot parse partition spec: '$other'")
    }
  }
}
