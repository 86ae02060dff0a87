package graft.store

import java.time.{LocalDate, ZoneId}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, date_format, hash, lit, pmod, substring}
import org.apache.spark.sql.types._

import graft.store.Pruning.ColRange

/** Table partition spec: one source column + a transform, Iceberg's hidden
  * partitioning re-expressed for the snapshot store. The reference's
  * production tables would carry `PARTITIONED BY SPEC (day(ts))` on their
  * Iceberg DDL (`/root/reference/create_iceberg.py:119-148` creates them
  * unpartitioned at demo scale); at 100 TB the spec is what bounds a
  * day-scoped query to a day's files.
  *
  * Transforms: `identity`, `hour`, `day`, `month`, `year`, plus Iceberg's
  * two parameterized transforms `bucket(n, col)` and `truncate(w, col)`.
  * Partition values are STRINGS as rendered into the write path's
  * directory names (`yyyy-MM-dd` / `yyyy-MM` / `yyyy`, a bucket id,
  * a floored multiple / string prefix), zero-padded where lexicographic
  * order should be chronological. [[sourceRange]] maps a value back to an
  * inclusive min/max range of the SOURCE column, so partition pruning
  * reuses the same conservative evaluator as footer-stats pruning
  * ([[Pruning.mightMatch]]) — predicates stay on the source column, the
  * transform stays hidden, which is exactly Iceberg's contract. `bucket`
  * is the one transform a range cannot express; its point-lookup pruning
  * goes through [[Pruning.mightMatchBucket]] instead (equality/IN
  * predicates hash the literal with the same Murmur3 Spark's
  * `HashPartitioning` uses at write time).
  */
final case class PartitionSpec(column: String, transform: String,
    param: Option[Int] = None) {
  require(PartitionSpec.Transforms.contains(transform),
    s"unsupported partition transform: $transform " +
      s"(supported: ${PartitionSpec.Transforms.mkString(", ")})")
  require(PartitionSpec.Parameterized.contains(transform) == param.isDefined,
    s"transform $transform " +
      (if (param.isDefined) "takes no parameter" else "needs a parameter"))
  param.foreach(p => require(p >= 1,
    s"$transform parameter must be >= 1 (got $p)"))

  /** Key the partition value is recorded under in each [[DataFile]].
    * Parameterized transforms qualify the key with transform+param so a
    * later spec (different transform or width) can NEVER misread an old
    * file's value — a `bucket(8)`-era value interpreted as a `bucket(16)`
    * id would prune wrongly; a missing key just degrades to "keep". */
  def partitionKey: String = param match {
    case Some(p) => s"$column#$transform$p"
    case None    => column
  }

  /** Column expression computing the partition value at write time.
    * `date_format` uses the session time zone — [[sourceRange]] parses
    * with the same zone, so write-side values and read-side ranges agree.
    * `bucket` reuses Spark's own bucket-id definition
    * (`HashPartitioning.partitionIdExpression` = pmod(murmur3, n)) so the
    * recorded value, the shuffle placement and the prune-side literal
    * hash all agree; `truncate` needs the source type (int floor vs
    * string prefix). The bucket hash is taken over the column CAST TO THE
    * TABLE SCHEMA TYPE: Murmur3 is width-sensitive (hash(5: Int) !=
    * hash(5L)), and the store accepts narrower-typed appends into widened
    * columns ([[TableStore.widenColumn]]) — hashing the frame's own type
    * would tag such rows with bucket ids the prune side
    * ([[Pruning.mightMatchBucket]], which hashes literals at the schema
    * type) provably skips, silently dropping them from point lookups. */
  def valueColumn(sourceType: DataType): Column = transform match {
    case "identity" => col(column).cast(StringType)
    case "hour"     => date_format(col(column), "yyyy-MM-dd-HH")
    case "day"      => date_format(col(column), "yyyy-MM-dd")
    case "month"    => date_format(col(column), "yyyy-MM")
    case "year"     => date_format(col(column), "yyyy")
    case "bucket"   =>
      pmod(hash(col(column).cast(sourceType)), lit(param.get)).cast(StringType)
    case "truncate" => sourceType match {
      case StringType => substring(col(column), 1, param.get)
      case _ => // integral floor-to-multiple (Iceberg: v - (v mod w), positive mod)
        (col(column) - pmod(col(column), lit(param.get))).cast(StringType)
    }
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
        case ("bucket", _) =>
          // a bucket id bounds nothing in source space; point lookups
          // prune via Pruning.mightMatchBucket instead
          ColRange(None, None)
        case ("truncate", StringType) =>
          val w = param.get
          if (value.length < w) ColRange(Some(value), Some(value), hasNulls = false)
          else // all strings with this prefix: [v, successor-of-last-char)
            ColRange(Some(value), PartitionSpec.prefixUpperBound(value),
              hasNulls = false)
        case ("truncate", ByteType | ShortType | IntegerType | LongType) =>
          // floored multiple of w: the file holds [v, v + w - 1]
          val v = value.toLong
          ColRange(Some(v), Some(v + param.get - 1), hasNulls = false)
        case ("hour", TimestampType) =>
          // one wall-clock hour in the table's pinned zone; atZone
          // resolves DST gaps/overlaps the same way date_format's
          // rendering zone does, so write values and ranges agree
          val lo = java.time.LocalDateTime
            .parse(value, PartitionSpec.HourFormat)
          val loUs = lo.atZone(zone).toInstant.toEpochMilli * 1000L
          val hiUs = lo.plusHours(1).atZone(zone).toInstant.toEpochMilli * 1000L
          ColRange(Some(loUs), Some(hiUs - 1), hasNulls = false)
        case ("hour", TimestampNTZType) =>
          val lo = java.time.LocalDateTime
            .parse(value, PartitionSpec.HourFormat)
          val loUs = lo.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
          val hiUs = lo.plusHours(1)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
          ColRange(Some(loUs), Some(hiUs - 1), hasNulls = false)
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
  val Transforms: Set[String] =
    Set("identity", "hour", "day", "month", "year", "bucket", "truncate")

  /** Rendered `hour` partition value (`2024-03-09-23`); hour-granular, so
    * unlike day/month/year it parses as a LocalDateTime, not a date. */
  private[store] val HourFormat =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH")
  val Parameterized: Set[String] = Set("bucket", "truncate")

  /** Hive's null-partition directory marker, reused as the stored value. */
  val NullPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Inclusive-safe upper bound covering every string with prefix `p`:
    * the prefix with its last char incremented is strictly above any
    * p-prefixed string. None when the last char is at or above the
    * surrogate range (U+D800): beyond it UTF-16 code-unit order (this
    * bound) and the UTF-8/codepoint order of Parquet footer string stats
    * diverge, so an incremented-char bound could tighten wrongly against
    * footer min/max on supplementary characters (ADVICE r12). Callers
    * treat None as an unbounded max, which only loosens. */
  private[store] def prefixUpperBound(p: String): Option[String] = {
    if (p.isEmpty || p.last >= '\ud800') None
    else Some(p.init + (p.last + 1).toChar)
  }

  private[store] def parseIdentity(value: String, dt: DataType): Option[Any] =
    try dt match {
      case ByteType | ShortType | IntegerType | LongType => Some(value.toLong)
      case FloatType | DoubleType => Some(value.toDouble)
      case StringType             => Some(value)
      case BooleanType            => Some(value.toBoolean)
      case DateType               => Some(LocalDate.parse(value).toEpochDay)
      case _                      => None
    } catch { case _: Exception => None }

  /** `PARTITIONED BY (day(ts))` / `(ts)` / `(bucket(16, k))` /
    * `(truncate(4, s))` DDL fragment → spec. Parameterized transforms
    * use Iceberg's argument order: (n, column). */
  def parse(fragment: String): PartitionSpec = {
    val F = "(?i)^\\s*(?:(identity|hour|day|month|year)\\s*\\(\\s*)?`?([A-Za-z_]\\w*)`?\\s*\\)?\\s*$".r
    val P = "(?i)^\\s*(bucket|truncate)\\s*\\(\\s*(\\d+)\\s*,\\s*`?([A-Za-z_]\\w*)`?\\s*\\)\\s*$".r
    fragment.trim match {
      case P(tr, n, c) => PartitionSpec(c, tr.toLowerCase, Some(n.toInt))
      case F(null, c)  => PartitionSpec(c, "identity")
      case F(tr, c)    => PartitionSpec(c, tr.toLowerCase)
      case other => throw new IllegalArgumentException(
        s"cannot parse partition spec: '$other'")
    }
  }

  /** Column types a `bucket` transform accepts: exactly the types whose
    * Murmur3 hash is stable and well-defined across writes (Iceberg
    * likewise excludes float/double — NaN/-0.0 make hashing a trap). */
  def bucketableType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         DateType | TimestampType | BooleanType => true
    case _ => false
  }

  /** Column types `truncate` accepts (integral floor or string prefix). */
  def truncatableType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  /** Validate a spec against the table schema (column exists + type is
    * legal for the transform); returns the matched source type. */
  def validateFor(spec: PartitionSpec, schema: StructType,
      table: String): DataType = {
    val f = schema.fields.find(_.name.equalsIgnoreCase(spec.column))
      .getOrElse(throw new IllegalArgumentException(
        s"partition column '${spec.column}' not in schema of $table"))
    spec.transform match {
      case "bucket" => require(bucketableType(f.dataType),
        s"bucket transform unsupported for ${f.dataType.sql} column " +
          s"'${spec.column}' of $table")
      case "truncate" => require(truncatableType(f.dataType),
        s"truncate transform unsupported for ${f.dataType.sql} column " +
          s"'${spec.column}' of $table")
      case "hour" => require(
        f.dataType == TimestampType || f.dataType == TimestampNTZType,
        s"hour transform needs a timestamp column; " +
          s"'${spec.column}' of $table is ${f.dataType.sql}")
      case _ =>
    }
    f.dataType
  }
}
