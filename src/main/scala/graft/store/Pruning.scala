package graft.store

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, IntLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Min/max-based file skipping — the metadata layer that makes row-level
  * copy-on-write and partitioned reads scale.
  *
  * A file is described by per-column [[Pruning.ColRange]]s (from Parquet
  * footer statistics, or derived from a partition value); a predicate is
  * walked conservatively: [[Pruning.mightMatch]] returns `false` only when
  * NO row in the file can satisfy it. Anything unrecognised — casts,
  * functions, non-literal comparands — degrades to `true` (keep the file),
  * never to a wrong prune.
  *
  * Values are normalised to one of Long / Double / BigDecimal / String /
  * Boolean (dates → epoch days, timestamps → micros) so footer stats,
  * partition values and Catalyst literals compare in one domain. This is
  * the same contract Iceberg's manifest stats + evaluators provide for the
  * reference's tables (`/root/reference/create_iceberg.py:119-148`); at
  * 100 TB it is what turns `DELETE WHERE id = 1` from a full-table rewrite
  * into a one-file rewrite.
  */
object Pruning {

  /** Inclusive min/max of a column within one file, in normalised-value
    * space. `None` bounds = unknown (never prune on them). */
  final case class ColRange(
      min: Option[Any],
      max: Option[Any],
      hasNulls: Boolean = true,
      allNulls: Boolean = false)

  /** `false` only when the ranges prove no row of the file matches. */
  def mightMatch(pred: Expression, ranges: Map[String, ColRange]): Boolean =
    pred match {
      case And(l, r) => mightMatch(l, ranges) && mightMatch(r, ranges)
      case Or(l, r)  => mightMatch(l, ranges) || mightMatch(r, ranges)
      case cmp: BinaryComparison =>
        comparison(cmp, ranges).getOrElse(true)
      case In(a, list) if list.forall(_.foldable) =>
        attrRange(a, ranges) match {
          case Some(r) =>
            list.exists(e => constValue(e).forall(v => rangeContains(r, v)))
          case None => true
        }
      case InSet(a, set) =>
        attrRange(a, ranges) match {
          case Some(r) =>
            // InSet holds internal values typed like the child expression
            set.exists { v =>
              normalise(v, a.dataType).forall(nv => rangeContains(r, nv))
            }
          case None => true
        }
      case IsNull(a) =>
        attrRange(a, ranges).forall(_.hasNulls)
      case IsNotNull(a) =>
        attrRange(a, ranges).forall(!_.allNulls)
      case StartsWith(a, Literal(prefix, StringType)) if prefix != null =>
        attrRange(a, ranges) match {
          case Some(ColRange(Some(min: String), Some(max: String), _, all)) =>
            !all && {
              val p = prefix.toString
              // file overlaps [p, p+∞): max >= p and min's prefix <= p
              max >= p && min.take(p.length) <= p
            }
          case _ => true
        }
      case Not(IsNull(a)) =>
        attrRange(a, ranges).forall(!_.allNulls)
      case Not(IsNotNull(a)) =>
        attrRange(a, ranges).forall(_.hasNulls)
      case _ => true // unknown shape: keep the file
    }

  /** Conservative bucket-transform pruning: `false` only when the
    * predicate pins `column` to literal(s) whose bucket id provably
    * differs from `fileBucket`. The id is computed with the SAME
    * Catalyst expression the write path shuffles by
    * (`pmod(Murmur3Hash(col), n)` — `HashPartitioning
    * .partitionIdExpression`), evaluated over a literal cast to the
    * column's type, so write placement and prune verdict cannot drift.
    * Anything non-equality (ranges, IS NULL, unknown shapes) keeps the
    * file. At 100 TB with `bucket(256, key)` this turns a point-key
    * lookup into a 1/256th-of-the-files scan from log metadata alone. */
  def mightMatchBucket(pred: Expression, column: String, srcType: DataType,
      n: Int, fileBucket: Int): Boolean = {
    def attrIs(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name.equalsIgnoreCase(column)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        u.nameParts.size == 1 && u.nameParts.head.equalsIgnoreCase(column)
      // numeric-widening casts preserve the VALUE but not the hash —
      // hashing happens on the source type, so only the bare attr counts
      case _ => false
    }
    def litMatches(e: Expression): Boolean =
      bucketIdOf(e, srcType, n).forall(_ == fileBucket)
    pred match {
      case And(l, r) =>
        mightMatchBucket(l, column, srcType, n, fileBucket) &&
          mightMatchBucket(r, column, srcType, n, fileBucket)
      case Or(l, r) =>
        mightMatchBucket(l, column, srcType, n, fileBucket) ||
          mightMatchBucket(r, column, srcType, n, fileBucket)
      case EqualTo(a, c) if attrIs(a) && c.foldable => litMatches(c)
      case EqualTo(c, a) if attrIs(a) && c.foldable => litMatches(c)
      case EqualNullSafe(a, c) if attrIs(a) && c.foldable => litMatches(c)
      case EqualNullSafe(c, a) if attrIs(a) && c.foldable => litMatches(c)
      case In(a, list) if attrIs(a) && list.forall(_.foldable) =>
        list.exists(litMatches)
      // resolved attr only: `a.dataType` on an UnresolvedAttribute throws
      // outside bucketIdOf's catch — an unresolved InSet (possible, since
      // attrIs accepts unresolved inputs by design) must degrade to keep
      case InSet(a: AttributeReference, set) if attrIs(a) =>
        set.exists(v => v == null ||
          bucketIdOf(Literal(v, a.dataType), srcType, n).forall(_ == fileBucket))
      case _ => true
    }
  }

  /** Bucket id of a foldable expression under `bucket(n, col: srcType)`:
    * cast to the source type (hash is type-sensitive — Murmur3 of int 5
    * ≠ long 5), then pmod(murmur3(seed 42), n), Spark's write-side
    * placement. None = NULL / non-castable / eval failure (caller keeps
    * the file). */
  private[store] def bucketIdOf(e: Expression, srcType: DataType,
      n: Int): Option[Int] =
    try {
      def zoneSensitive(dt: DataType): Boolean =
        dt == TimestampType || dt == TimestampNTZType
      val casted =
        if (e.dataType == srcType) e
        // a timestamp cast renders in SOME zone; guessing wrong here
        // would mis-hash and prune a matching file — decline instead
        else if (zoneSensitive(e.dataType) || zoneSensitive(srcType)) return None
        else Cast(e, srcType, Some(java.time.ZoneOffset.UTC.getId))
      if (!casted.foldable) return None
      val v = casted.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      if (v == null) return None
      val h = new Murmur3Hash(Seq(Literal(v, srcType)))
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[Int]
      Some(((h % n) + n) % n)
    } catch { case _: Exception => None }

  /** `true` only when the ranges PROVE every row of the file satisfies
    * the predicate — the dual of [[mightMatch]], and deliberately
    * asymmetric with it: anything unrecognised degrades to `false`
    * ("cannot prove"), never to a wrong all-match claim. Together the two
    * sides classify a file as all-match / no-match / partial, which is
    * what lets a partition-aligned `COUNT(*) WHERE …` be answered from
    * per-file record counts with no scan: a file whose partition range
    * lies entirely inside the predicate contributes its whole count,
    * entirely outside contributes nothing, and any partial file declines
    * the metadata answer. Null handling matters here where it did not in
    * [[mightMatch]]: a row with a NULL operand fails a WHERE clause, so a
    * file that may contain nulls can never be all-match for a comparison.
    */
  def mustMatchAll(pred: Expression, ranges: Map[String, ColRange]): Boolean =
    pred match {
      case Literal(true, BooleanType) => true
      case And(l, r) => mustMatchAll(l, ranges) && mustMatchAll(r, ranges)
      case Or(l, r)  => mustMatchAll(l, ranges) || mustMatchAll(r, ranges)
      case cmp: BinaryComparison =>
        comparisonAll(cmp, ranges)
      case In(a, list) if list.forall(_.foldable) =>
        // provable only for a constant file: min == max == a listed value
        attrRange(a, ranges).exists(r => !r.hasNulls &&
          list.exists(e => constValue(e).exists(v => pointRangeEq(r, v))))
      case IsNull(a)      => attrRange(a, ranges).exists(_.allNulls)
      case IsNotNull(a)   => attrRange(a, ranges).exists(r => !r.hasNulls)
      case Not(IsNull(a)) => attrRange(a, ranges).exists(r => !r.hasNulls)
      case Not(IsNotNull(a)) => attrRange(a, ranges).exists(_.allNulls)
      case _ => false // unknown shape: cannot prove
    }

  private def comparisonAll(cmp: BinaryComparison,
      ranges: Map[String, ColRange]): Boolean = {
    val canon: Option[(Expression, Expression, String)] = (cmp.left, cmp.right) match {
      case (a, c) if c.foldable && !a.foldable =>
        Some((a, c, opName(cmp, flipped = false)))
      case (c, a) if c.foldable && !a.foldable =>
        Some((a, c, opName(cmp, flipped = true)))
      case _ => None
    }
    canon.exists { case (attr, const, op) =>
      (attrRange(attr, ranges), constValue(const)) match {
        case (Some(r), Some(v)) => evalOpAll(op, r, v)
        case _ => false
      }
    }
  }

  private def evalOpAll(op: String, r: ColRange, v: Any): Boolean = {
    if (r.hasNulls) return false // null rows fail every comparison
    def cmpMin = r.min.flatMap(m => compare(m, v))
    def cmpMax = r.max.flatMap(m => compare(m, v))
    op match {
      case "=" | "<=>" => pointRangeEq(r, v)
      case "<"  => cmpMax.exists(_ < 0)  // every value below v iff max < v
      case "<=" => cmpMax.exists(_ <= 0)
      case ">"  => cmpMin.exists(_ > 0)
      case ">=" => cmpMin.exists(_ >= 0)
      case _    => false
    }
  }

  /** Both bounds known and equal to `v` (the file is constant at `v`). */
  private def pointRangeEq(r: ColRange, v: Any): Boolean =
    !r.hasNulls &&
      r.min.exists(m => compare(m, v).contains(0)) &&
      r.max.exists(m => compare(m, v).contains(0))

  /** Some(false) = provably no match; Some(true)/None = keep. */
  private def comparison(cmp: BinaryComparison,
      ranges: Map[String, ColRange]): Option[Boolean] = {
    // canonicalise to <attr> <op> <constant>
    val canon: Option[(Expression, Expression, String)] = (cmp.left, cmp.right) match {
      case (a, c) if c.foldable && !a.foldable =>
        Some((a, c, opName(cmp, flipped = false)))
      case (c, a) if c.foldable && !a.foldable =>
        Some((a, c, opName(cmp, flipped = true)))
      case _ => None
    }
    canon.flatMap { case (attr, const, op) =>
      for {
        r <- attrRange(attr, ranges)
        v <- constValue(const)
      } yield evalOp(op, r, v)
    }
  }

  private def opName(cmp: BinaryComparison, flipped: Boolean): String = {
    val base = cmp match {
      case _: EqualTo            => "="
      case _: EqualNullSafe      => "<=>"
      case _: LessThan           => "<"
      case _: LessThanOrEqual    => "<="
      case _: GreaterThan        => ">"
      case _: GreaterThanOrEqual => ">="
    }
    if (!flipped) base
    else base match {
      case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
      case other => other
    }
  }

  private def evalOp(op: String, r: ColRange, v: Any): Boolean = {
    if (r.allNulls) return false // a non-null comparand never matches null rows
    def cmpMin = r.min.flatMap(m => compare(m, v))
    def cmpMax = r.max.flatMap(m => compare(m, v))
    op match {
      case "=" | "<=>" => rangeContains(r, v)
      case "<"  => cmpMin.forall(_ < 0)  // some value below v exists iff min < v
      case "<=" => cmpMin.forall(_ <= 0)
      case ">"  => cmpMax.forall(_ > 0)
      case ">=" => cmpMax.forall(_ >= 0)
      case _    => true
    }
  }

  private def rangeContains(r: ColRange, v: Any): Boolean = {
    if (r.allNulls) return false
    val aboveMin = r.min.flatMap(m => compare(v, m)).forall(_ >= 0)
    val belowMax = r.max.flatMap(m => compare(v, m)).forall(_ <= 0)
    aboveMin && belowMax
  }

  /** Range for a column reference. Type-coercion casts the analyzer
    * wraps around the column are looked through when numeric-widening
    * (order-preserving, and [[compare]] already bridges widths); any
    * other wrapper is unprunable. Lookup is case-insensitive, matching
    * Spark's default resolution. */
  private def attrRange(e: Expression, ranges: Map[String, ColRange]): Option[ColRange] =
    e match {
      case a: AttributeReference =>
        ranges.get(a.name.toLowerCase)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if u.nameParts.size == 1 =>
        ranges.get(u.nameParts.head.toLowerCase)
      case c: Cast if numericWidening(c.child.dataType, c.dataType) =>
        attrRange(c.child, ranges)
      // the analyzer bridges a zoned literal and an NTZ column (the
      // testdata parquet's own timestamp shape) with an NTZ↔LTZ cast on
      // the ATTRIBUTE — under a UTC zone that cast is identity on the
      // stored micros, so the file bounds still apply. Any other zone
      // shifts values (offset/DST) and must decline: unpruned is safe,
      // wrongly pruned is a wrong answer.
      case c: Cast if tsNtzBridge(c.child.dataType, c.dataType) &&
          c.timeZoneId.exists(utcZone) =>
        attrRange(c.child, ranges)
      case _ => None
    }

  private def tsNtzBridge(from: DataType, to: DataType): Boolean =
    (from == TimestampNTZType && to == TimestampType) ||
      (from == TimestampType && to == TimestampNTZType)

  private def utcZone(id: String): Boolean =
    try java.time.ZoneId.of(id).normalized() == java.time.ZoneOffset.UTC
    catch { case _: Exception => false }

  private val numericRank: Map[DataType, Int] = Map(
    ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4,
    FloatType -> 5, DoubleType -> 6)

  private def numericWidening(from: DataType, to: DataType): Boolean =
    (numericRank.get(from), to) match {
      case (Some(_), _: DecimalType) => true
      case (Some(f), _) => numericRank.get(to).exists(_ >= f)
      case _ => false
    }

  /** Foldable expression (literal, or a literal under coercion casts) →
    * normalised value. None = null or unprunable. */
  private def constValue(e: Expression): Option[Any] = e match {
    case l: Literal => if (l.value == null) None else normalise(l.value, l.dataType)
    case _ if e.foldable =>
      try {
        val v = e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        if (v == null) None else normalise(v, e.dataType)
      } catch { case _: Exception => None }
    case _ => None
  }

  /** Internal Catalyst value of `dt` → normalised comparison value. */
  private[store] def normalise(v: Any, dt: DataType): Option[Any] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some(v.asInstanceOf[Number].longValue())
    case DateType => Some(v.asInstanceOf[Number].longValue()) // epoch days
    case TimestampType | TimestampNTZType =>
      Some(v.asInstanceOf[Number].longValue()) // micros
    case FloatType | DoubleType => Some(v.asInstanceOf[Number].doubleValue())
    case _: DecimalType =>
      Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal)
    case StringType => Some(v.toString)
    case BooleanType => Some(v.asInstanceOf[Boolean])
    case _ => None
  }

  /** Cross-width comparison in normalised space. None = incomparable. */
  private[store] def compare(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long)       => Some(java.lang.Long.compare(x, y))
    case (x: Double, y: Double)   => Some(java.lang.Double.compare(x, y))
    case (x: String, y: String)   => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case (x: Number, y: Number) => // mixed widths (incl. BigDecimal)
      Some(new java.math.BigDecimal(x.toString)
        .compareTo(new java.math.BigDecimal(y.toString)))
    case _ => None
  }

  // -------------------------------------------------------------------
  // ColRange ↔ serialized ColBounds (snapshot-log column metrics)
  // -------------------------------------------------------------------

  /** Longest string bound worth storing in the log; longer bounds are
    * dropped (storing a truncated UPPER bound would be unsound). */
  val MaxStoredStringBound = 64

  /** Intersection of two sound descriptions of the SAME file's column:
    * tightest bounds win per side, null-freedom from either side holds.
    * Unbounded sides never loosen the other description — the reason
    * merging stats with partition-derived ranges must intersect, not
    * override. */
  def intersect(a: ColRange, b: ColRange): ColRange = {
    def tighter(x: Option[Any], y: Option[Any], keepGreater: Boolean): Option[Any] =
      (x, y) match {
        case (Some(p), Some(q)) =>
          compare(p, q) match {
            case Some(c) => if ((c >= 0) == keepGreater) Some(p) else Some(q)
            case None    => Some(p)
          }
        case (Some(p), None) => Some(p)
        case (None, q)       => q
      }
    ColRange(
      min = tighter(a.min, b.min, keepGreater = true),
      max = tighter(a.max, b.max, keepGreater = false),
      hasNulls = a.hasNulls && b.hasNulls,
      allNulls = a.allNulls || b.allNulls)
  }

  /** Range → log-serializable bounds. None = not worth storing (only the
    * fully-unknown range with default null info). */
  def toBounds(r: ColRange): Option[ColBounds] = {
    def tagOf(v: Any): Option[String] = v match {
      case _: Long    => Some("long")
      case _: Double  => Some("double")
      case s: String  => if (s.length <= MaxStoredStringBound) Some("string") else None
      case _: Boolean => Some("boolean")
      case _          => None
    }
    (r.min, r.max) match {
      case (Some(mn), Some(mx)) =>
        (tagOf(mn), tagOf(mx)) match {
          case (Some(t1), Some(t2)) if t1 == t2 =>
            Some(ColBounds(t1, Some(mn.toString), Some(mx.toString),
              r.hasNulls, r.allNulls))
          case _ => // unserializable bounds: keep the null info only
            Some(ColBounds("none", None, None, r.hasNulls, r.allNulls))
        }
      case _ if r.allNulls || !r.hasNulls =>
        Some(ColBounds("none", None, None, r.hasNulls, r.allNulls))
      case _ => None
    }
  }

  /** Serialized bounds → evaluator range (inverse of [[toBounds]]). */
  def fromBounds(b: ColBounds): ColRange = {
    def parse(s: String): Option[Any] = b.t match {
      case "long"    => s.toLongOption
      case "double"  => s.toDoubleOption
      case "string"  => Some(s)
      case "boolean" => s.toBooleanOption
      case _         => None
    }
    ColRange(b.min.flatMap(parse), b.max.flatMap(parse), b.hasNulls, b.allNulls)
  }

  // -------------------------------------------------------------------
  // Parquet footer statistics → ColRanges
  // -------------------------------------------------------------------

  /** Per-column ranges of one Parquet file from its footer (metadata-only
    * read — no data pages). Row-group stats are merged to file granularity.
    * Only top-level primitive columns with prunable types are returned;
    * string ranges assume Java-lexicographic ≈ byte-lexicographic order
    * (exact for ASCII, the only string data the engine writes).
    */
  def footerRanges(fs: FileSystem, file: HPath): Map[String, ColRange] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, fs.getConf))
    try rangesFromReader(reader)
    finally reader.close()
  }

  /** Ranges from an already-open reader (lets promote-time callers reuse
    * the same footer read that supplies the row count). */
  def rangesFromReader(reader: ParquetFileReader): Map[String, ColRange] = {
    import scala.jdk.CollectionConverters._
    import scala.language.existentials
    {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val schema = reader.getFooter.getFileMetaData.getSchema
      val acc = scala.collection.mutable.HashMap.empty[String, ColRange]
      for (block <- blocks; chunk <- block.getColumns.asScala) {
        val pathParts = chunk.getPath.toArray
        if (pathParts.length == 1) {
          val name = pathParts(0).toLowerCase
          val prim = schema.getType(Seq(pathParts(0)): _*)
          if (prim.isPrimitive) {
            val stats = chunk.getStatistics
            val nRows = block.getRowCount
            val next: ColRange =
              if (stats == null) ColRange(None, None)
              else {
                val nulls = if (stats.isNumNullsSet) stats.getNumNulls else -1L
                val hasNulls = nulls != 0L
                val allNulls = nulls >= 0 && nulls == nRows
                if (!stats.hasNonNullValue) ColRange(None, None, hasNulls, allNulls)
                else {
                  val mn = statValue(stats.genericGetMin, prim.asPrimitiveType())
                  val mx = statValue(stats.genericGetMax, prim.asPrimitiveType())
                  ColRange(mn, mx, hasNulls, allNulls)
                }
              }
            acc(name) = acc.get(name).map(mergeRanges(_, next)).getOrElse(next)
          }
        }
      }
      acc.toMap
    }
  }

  private def mergeRanges(a: ColRange, b: ColRange): ColRange = {
    def pick(x: Option[Any], y: Option[Any], keepLess: Boolean): Option[Any] =
      (x, y) match {
        case (Some(p), Some(q)) =>
          compare(p, q) match {
            case Some(c) => if ((c <= 0) == keepLess) Some(p) else Some(q)
            case None => None
          }
        case _ => None // one side unknown → whole bound unknown
      }
    ColRange(
      min = pick(a.min, b.min, keepLess = true),
      max = pick(a.max, b.max, keepLess = false),
      hasNulls = a.hasNulls || b.hasNulls,
      allNulls = a.allNulls && b.allNulls)
  }

  /** Parquet statistics value → normalised value, by physical+logical type. */
  private def statValue(v: Any,
      prim: org.apache.parquet.schema.PrimitiveType): Option[Any] = {
    val logical = prim.getLogicalTypeAnnotation
    // decimal-annotated ints store UNSCALED values — never prunable here
    if (logical.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation])
      return None
    (prim.getPrimitiveTypeName, logical) match {
      case (PrimitiveTypeName.INT32, _: DateLogicalTypeAnnotation) =>
        Some(v.asInstanceOf[Number].longValue())
      case (PrimitiveTypeName.INT32, _) | (PrimitiveTypeName.INT64, null) =>
        Some(v.asInstanceOf[Number].longValue())
      case (PrimitiveTypeName.INT64, ts: TimestampLogicalTypeAnnotation) =>
        val raw = v.asInstanceOf[Number].longValue()
        import LogicalTypeAnnotation.TimeUnit._
        ts.getUnit match {
          case MILLIS => Some(raw * 1000L)
          case MICROS => Some(raw)
          case NANOS  => Some(raw / 1000L)
        }
      case (PrimitiveTypeName.INT64, _: IntLogicalTypeAnnotation) =>
        Some(v.asInstanceOf[Number].longValue())
      case (PrimitiveTypeName.FLOAT, _) | (PrimitiveTypeName.DOUBLE, _) =>
        Some(v.asInstanceOf[Number].doubleValue())
      case (PrimitiveTypeName.BINARY, _: StringLogicalTypeAnnotation) =>
        Some(v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
      case (PrimitiveTypeName.BOOLEAN, _) =>
        Some(v.asInstanceOf[Boolean])
      case _ => None // decimals/fixed/int96: skip (conservative)
    }
  }
}
