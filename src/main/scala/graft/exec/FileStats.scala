package graft.exec

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.FileStatus
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-column min/max/null-count of ONE data file — the store's
  * data-skipping metadata (the role Delta's per-file `stats` JSON and
  * Iceberg's manifest `lower_bounds`/`upper_bounds` play).
  *
  * `min`/`max` are Catalyst INTERNAL values typed per the table schema
  * (UTF8String for strings, Int days for dates, Long micros for
  * timestamps). A `None` bound means "unknown" and always passes —
  * every consumer must treat absent stats as non-skippable.
  * `nullCount` is -1 when unknown.
  */
final case class ColumnStats(min: Option[Any], max: Option[Any], nullCount: Long)

/** Stats of one data file: row count + per-column bounds (only the
  * columns whose parquet footers carried usable statistics).
  */
final case class FileStats(rows: Long, cols: Map[String, ColumnStats])

object FileStats {

  /** Max characters kept for string bounds. A truncated MIN stays a
    * valid lower bound (a char-prefix is a UTF-8 byte-prefix, ≤ the
    * original in unsigned-byte order); a max that would need truncation
    * is DROPPED instead — a prefix is smaller than the original, so it
    * cannot serve as an upper bound.
    */
  private val MaxStringLen = 96

  /** Stats are collected for at most this many eligible columns, in
    * schema order (Delta's dataSkippingNumIndexedCols convention) —
    * bounds manifest size on very wide tables.
    */
  private val MaxIndexedCols = 32

  /** Types the skipper both collects and evaluates. Float/Double are
    * deliberately EXCLUDED: Spark orders NaN greater than any value and
    * NaN = NaN is true, while parquet footers omit NaN from min/max —
    * a file holding {1.0, NaN} has max=1.0, so `x > 5` would wrongly
    * skip the NaN row. Integer-family, DECIMAL (the warehouse measure
    * type — TPC-H's quantities and prices; exact unscaled bounds, no
    * NaN hazard), date/timestamp-micros, string and boolean bounds
    * have no such semantic gap.
    */
  def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
         DateType | TimestampType | TimestampNTZType => true
    case _: StringType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Test/observability hook: parquet footer opens performed by
    * [[collect]]. Lets specs pin that read/fold paths do ZERO footer
    * I/O (delta stats come from the landing-time sidecar; manifest
    * stats from the manifest itself).
    */
  val footerReads = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Columns of `schema` the collector indexes, in schema order. */
  def indexedColumns(schema: StructType): Seq[StructField] =
    schema.fields.toSeq
      .filter(f => eligible(f.dataType) && !f.name.contains('.'))
      .take(MaxIndexedCols)

  // ---- collection (parquet footer read — metadata I/O only) ----

  /** Read one file's footer and aggregate row-group statistics per
    * indexed column. Returns None when the footer is unreadable — the
    * caller records "no stats" and the file is never skipped. Zero
    * data bytes are read: this is the same footer fetch the scan's
    * schema probe performs.
    */
  def collect(status: FileStatus, schema: StructType, conf: Configuration): Option[FileStats] =
    Try {
      footerReads.incrementAndGet()
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(status, conf))
      try {
        val footer = reader.getFooter
        val blocks = footer.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        val wanted = indexedColumns(schema).map(f => f.name -> f.dataType).toMap
        // one column-chunk list per row group; group chunks by dot-path
        val chunksByCol = blocks.flatMap(_.getColumns.asScala)
          .groupBy(_.getPath.toDotString)
        val cols = wanted.flatMap { case (name, dt) =>
          chunksByCol.get(name).flatMap { chunks =>
            aggregateColumn(dt, chunks.map(c => (c.getPrimitiveType, c.getStatistics)))
          }.map(name -> _)
        }
        if (cols.isEmpty && rows == 0) None else Some(FileStats(rows, cols))
      } finally reader.close()
    }.toOption.flatten

  /** Fold one column's row-group statistics into file-level bounds.
    * ANY row group with unusable stats poisons the column (conservative
    * None) — a partial bound would be unsound.
    */
  private def aggregateColumn(
      dt: DataType,
      chunks: Seq[(PrimitiveType, org.apache.parquet.column.statistics.Statistics[_])])
      : Option[ColumnStats] = {
    val ord = TypeUtils.getInterpretedOrdering(dt)
    var min: Option[Any] = None
    var max: Option[Any] = None
    var nulls = 0L
    for ((ptype, st) <- chunks) {
      if (st == null || st.isEmpty) return None
      nulls = if (nulls < 0 || !st.isNumNullsSet) -1L else nulls + st.getNumNulls
      if (st.hasNonNullValue) {
        val lo = decode(dt, ptype, st.genericGetMin())
        val hi = decode(dt, ptype, st.genericGetMax())
        if (lo.isEmpty || hi.isEmpty) return None
        min = Some(min.fold(lo.get)(m => if (ord.lt(lo.get, m)) lo.get else m))
        max = Some(max.fold(hi.get)(m => if (ord.gt(hi.get, m)) hi.get else m))
      }
    }
    val (tmin, tmax) = (dt, min, max) match {
      case (_: StringType, _, _) => (truncateMin(min), dropIfLong(max))
      case _ => (min, max)
    }
    Some(ColumnStats(tmin, tmax, nulls))
  }

  /** Parquet chunk value → Catalyst internal value for `dt`, or None
    * when the physical/logical encoding isn't the one Spark writes for
    * that type (INT96 timestamps, unexpected annotations, …).
    */
  private def decode(dt: DataType, ptype: PrimitiveType, v: Any): Option[Any] = {
    import PrimitiveType.PrimitiveTypeName._
    val prim = ptype.getPrimitiveTypeName
    val ann = ptype.getLogicalTypeAnnotation
    def signedInt: Boolean = ann match {
      case null => true
      case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
      case _ => false
    }
    dt match {
      case ByteType if prim == INT32 && signedInt =>
        Some(v.asInstanceOf[Number].intValue().toByte)
      case ShortType if prim == INT32 && signedInt =>
        Some(v.asInstanceOf[Number].intValue().toShort)
      case IntegerType if prim == INT32 && signedInt =>
        Some(v.asInstanceOf[Number].intValue())
      case LongType if prim == INT64 && signedInt =>
        Some(v.asInstanceOf[Number].longValue())
      case BooleanType if prim == BOOLEAN =>
        Some(v.asInstanceOf[Boolean])
      case DateType if prim == INT32 &&
          ann.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation] =>
        Some(v.asInstanceOf[Number].intValue())
      case (TimestampType | TimestampNTZType) if prim == INT64 => ann match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
            if t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS =>
          Some(v.asInstanceOf[Number].longValue())
        case _ => None
      }
      case _: StringType if prim == BINARY &&
          ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        Some(UTF8String.fromString(
          v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8))
      case d: DecimalType => ann match {
        // parquet decimal bounds are exact unscaled values (INT32 for
        // precision ≤ 9, INT64 ≤ 18, fixed/binary two's-complement
        // beyond — the encodings Spark's writer emits). The file's
        // scale must equal the table's for the unscaled interpretation;
        // a lower file precision is fine (the value still fits).
        case dec: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation
            if dec.getScale == d.scale && dec.getPrecision <= d.precision =>
          prim match {
            case INT32 | INT64 =>
              Some(Decimal(v.asInstanceOf[Number].longValue(), d.precision, d.scale))
            case FIXED_LEN_BYTE_ARRAY | BINARY =>
              val unscaled = new java.math.BigInteger(
                v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes)
              Some(Decimal(
                BigDecimal(new java.math.BigDecimal(unscaled, d.scale)),
                d.precision, d.scale))
            case _ => None
          }
        case _ => None
      }
      case _ => None
    }
  }

  private def truncateMin(v: Option[Any]): Option[Any] = v.map { m =>
    val s = m.asInstanceOf[UTF8String]
    if (s.numChars() <= MaxStringLen) s
    else {
      // cut at a char boundary, never splitting a surrogate pair (an
      // unpaired high surrogate would re-encode differently and break
      // the byte-prefix ⇒ lower-bound argument)
      val t = s.toString
      var cut = MaxStringLen
      if (Character.isHighSurrogate(t.charAt(cut - 1))) cut -= 1
      UTF8String.fromString(t.substring(0, cut))
    }
  }

  private def dropIfLong(v: Option[Any]): Option[Any] =
    v.filter(_.asInstanceOf[UTF8String].numChars() <= MaxStringLen)

  // ---- manifest (de)serialization ----

  /** JSON-friendly value: all bounds as strings (exact round-trips for
    * every eligible type; the reader re-types against the table
    * schema).
    */
  def toJsonValue(fs: FileStats): Any = Map(
    "rows" -> fs.rows.toString,
    "cols" -> fs.cols.map { case (n, cs) =>
      n -> (Map("nc" -> cs.nullCount.toString) ++
        cs.min.map(v => "mn" -> internalToString(v)) ++
        cs.max.map(v => "mx" -> internalToString(v)))
    })

  private def internalToString(v: Any): String = v match {
    case s: UTF8String => s.toString
    case d: Decimal => d.toJavaBigDecimal.toPlainString // exact round-trip
    case other => String.valueOf(other)
  }

  private def stringToInternal(s: String, dt: DataType): Any = dt match {
    case ByteType => s.toByte
    case ShortType => s.toShort
    case IntegerType | DateType => s.toInt
    case LongType | TimestampType | TimestampNTZType => s.toLong
    case BooleanType => s.toBoolean
    case _: StringType => UTF8String.fromString(s)
    case d: DecimalType => Decimal(BigDecimal(s), d.precision, d.scale)
    case other => throw new IllegalStateException(s"non-indexable stats type $other")
  }

  def fromJsonValue(v: Any, schema: StructType): Option[FileStats] = v match {
    case m: Map[String @unchecked, Any @unchecked] =>
      Try {
        val rows = m("rows").toString.toLong
        val types = schema.fields.map(f => f.name -> f.dataType).toMap
        val cols = m.get("cols") match {
          case Some(cm: Map[String @unchecked, Any @unchecked]) =>
            cm.flatMap { case (name, cv) =>
              val c = cv.asInstanceOf[Map[String, Any]]
              types.get(name).map { dt =>
                name -> ColumnStats(
                  c.get("mn").map(x => stringToInternal(x.toString, dt)),
                  c.get("mx").map(x => stringToInternal(x.toString, dt)),
                  c.get("nc").map(_.toString.toLong).getOrElse(-1L))
              }
            }
          case _ => Map.empty[String, ColumnStats]
        }
        FileStats(rows, cols)
      }.toOption
    case _ => None
  }

  // ---- skipping evaluator ----

  /** Whether a file with `stats` MAY contain rows satisfying `filter`.
    * Strictly conservative: every unrecognized shape, missing bound, or
    * type mismatch answers true. `lookup` resolves an attribute name to
    * its column stats (the caller owns case sensitivity).
    */
  def mayMatch(filter: Expression, stats: FileStats,
      lookup: String => Option[ColumnStats]): Boolean = {
    def ord(dt: DataType): Ordering[Any] = TypeUtils.getInterpretedOrdering(dt)
    // evaluate `test` over the column's stats; missing stats pass
    def withStats(a: AttributeReference)(test: (ColumnStats, Ordering[Any]) => Boolean): Boolean =
      lookup(a.name) match {
        case Some(cs) => Try(test(cs, ord(a.dataType))).getOrElse(true)
        case None => true
      }
    // like withStats, but for NULL-REJECTING predicates (comparisons,
    // IN, prefixes, !=): a column that is entirely null in this file
    // (nullCount == rows, exactly known) cannot satisfy any of them —
    // the null-count completeness of the skipper
    def withValues(a: AttributeReference)(test: (ColumnStats, Ordering[Any]) => Boolean): Boolean =
      withStats(a) { (cs, o) =>
        if (stats.rows > 0 && cs.nullCount == stats.rows) false else test(cs, o)
      }
    def overlapsEq(a: AttributeReference, v: Any): Boolean =
      if (v == null) true
      else withValues(a) { (cs, o) =>
        cs.min.forall(m => o.lteq(m, v)) && cs.max.forall(x => o.gteq(x, v))
      }
    // a file CONSTANT at value v with no nulls — the only layout where
    // `a != v` (or `a NOT IN (…, v, …)`) has no satisfying row
    def constantAt(cs: ColumnStats, o: Ordering[Any], v: Any): Boolean =
      cs.nullCount == 0L &&
        cs.min.exists(m => o.equiv(m, v)) && cs.max.exists(x => o.equiv(x, v))
    filter match {
      case And(l, r) => mayMatch(l, stats, lookup) && mayMatch(r, stats, lookup)
      case Or(l, r) => mayMatch(l, stats, lookup) || mayMatch(r, stats, lookup)

      case EqualTo(a: AttributeReference, Literal(v, t)) if t == a.dataType => overlapsEq(a, v)
      case EqualTo(Literal(v, t), a: AttributeReference) if t == a.dataType => overlapsEq(a, v)
      case EqualNullSafe(a: AttributeReference, Literal(v, t)) if t == a.dataType =>
        if (v == null) withStats(a)((cs, _) => cs.nullCount != 0L)
        else overlapsEq(a, v)

      case LessThan(a: AttributeReference, Literal(v, t)) if v != null && t == a.dataType =>
        withValues(a)((cs, o) => cs.min.forall(m => o.lt(m, v)))
      case LessThan(Literal(v, t), a: AttributeReference) if v != null && t == a.dataType =>
        withValues(a)((cs, o) => cs.max.forall(x => o.gt(x, v)))
      case LessThanOrEqual(a: AttributeReference, Literal(v, t)) if v != null && t == a.dataType =>
        withValues(a)((cs, o) => cs.min.forall(m => o.lteq(m, v)))
      case LessThanOrEqual(Literal(v, t), a: AttributeReference) if v != null && t == a.dataType =>
        withValues(a)((cs, o) => cs.max.forall(x => o.gteq(x, v)))
      case GreaterThan(a: AttributeReference, Literal(v, t)) if v != null && t == a.dataType =>
        withValues(a)((cs, o) => cs.max.forall(x => o.gt(x, v)))
      case GreaterThan(Literal(v, t), a: AttributeReference) if v != null && t == a.dataType =>
        withValues(a)((cs, o) => cs.min.forall(m => o.lt(m, v)))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, t))
          if v != null && t == a.dataType =>
        withValues(a)((cs, o) => cs.max.forall(x => o.gteq(x, v)))
      case GreaterThanOrEqual(Literal(v, t), a: AttributeReference)
          if v != null && t == a.dataType =>
        withValues(a)((cs, o) => cs.min.forall(m => o.lteq(m, v)))

      case In(a: AttributeReference, values) if values.forall(_.isInstanceOf[Literal]) =>
        values.exists(v => overlapsEq(a, v.asInstanceOf[Literal].value))
      case InSet(a: AttributeReference, hset) =>
        hset.exists(v => overlapsEq(a, v))

      case IsNull(a: AttributeReference) =>
        withStats(a)((cs, _) => cs.nullCount != 0L)
      case IsNotNull(a: AttributeReference) =>
        withStats(a)((cs, _) => cs.nullCount == -1L || cs.nullCount < stats.rows)

      case StartsWith(a: AttributeReference, Literal(p: UTF8String, _)) if p != null =>
        withValues(a) { (cs, o) =>
          cs.max.forall(x => o.gteq(x, p)) &&
            cs.min.forall(m =>
              o.lteq(m.asInstanceOf[UTF8String].substring(0, p.numChars()), p))
        }

      case Not(EqualTo(a: AttributeReference, Literal(v, t))) if v != null && t == a.dataType =>
        withValues(a)((cs, o) => !constantAt(cs, o, v))
      // NOT IN is null-rejecting AND excludes each listed value: only a
      // no-null file constant at one of the values has no matching row.
      // (A null anywhere in the list makes the whole predicate never
      // true, but Catalyst folds that case to null/false before
      // pushdown — the guard below just declines to reason about it.)
      case Not(In(a: AttributeReference, values))
          if values.forall(e => e.isInstanceOf[Literal] &&
            e.asInstanceOf[Literal].value != null) =>
        withValues(a) { (cs, o) =>
          !values.exists(e => constantAt(cs, o, e.asInstanceOf[Literal].value))
        }
      case Not(InSet(a: AttributeReference, hset)) if !hset.contains(null) =>
        withValues(a)((cs, o) => !hset.exists(v => constantAt(cs, o, v)))

      case _ => true
    }
  }
}
