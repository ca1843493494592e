package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, Cast, EqualTo, Expression => CExpr,
  GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan,
  LessThanOrEqual, Literal, Murmur3Hash, Pmod}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/**
 * Hidden-partitioning spec (Iceberg partition transforms, re-expressed for
 * the graft snapshot log). A partition entry in `TableMetadata.partitionCols`
 * is either a bare column name (identity — hive-style, the column lives in
 * the directory name and NOT in the data file) or a transform over a source
 * column:
 *
 *   years(ts) months(ts) days(ts) hours(ts)   — temporal buckets (UTC)
 *   bucket(16, id)                            — murmur3 hash bucket
 *   truncate(4, name)                         — int floor / string prefix
 *
 * Transform fields are Iceberg's HIDDEN partitioning: the SOURCE column
 * stays in the data file untouched; only the DERIVED value becomes a
 * directory (`ts_day=2024-01-15`). Queries keep filtering on the source
 * column — `scanWhere` maps source-column predicates through the transform
 * and prunes whole files before Spark's file index ever sees them, which is
 * the difference between scanning a day and scanning 100 TB.
 *
 * Everything is stored as the plain entry string, so the snapshot-log JSON
 * format is unchanged and pre-transform tables parse as all-identity specs.
 *
 * Determinism contracts (they make pruning sound across sessions/machines):
 *  - temporal transforms evaluate in UTC, never the session time zone;
 *  - bucket(n, col) = pmod(murmur3(col, seed 42), n) — exactly Spark's
 *    `functions.hash`, evaluated identically at write time (codegen'd
 *    expression) and prune time (driver-side `eval()` on the literal);
 *  - truncate floors toward negative infinity for ints (floorMod) and is a
 *    codepoint prefix for strings.
 */
object PartitionSpec {

  sealed trait Transform { def name: String }
  case object Identity extends Transform { val name = "identity" }
  case object Years extends Transform { val name = "years" }
  case object Months extends Transform { val name = "months" }
  case object Days extends Transform { val name = "days" }
  case object Hours extends Transform { val name = "hours" }
  final case class Bucket(n: Int) extends Transform { val name = "bucket" }
  final case class Truncate(w: Int) extends Transform { val name = "truncate" }

  /** One partition field: `source` is the schema column, `dirName` the
    * directory key the derived value is written under. Identity fields keep
    * dirName == source (hive layout, column pulled out of the file). */
  final case class Field(source: String, transform: Transform) {
    def isIdentity: Boolean = transform == Identity
    /** Directory key for the derived value. Parameterized transforms embed
      * their parameter (`id_bucket_16`) so a spec evolution that re-buckets
      * (bucket(4,…) → bucket(8,…)) can never alias old directories into the
      * new spec's prune domain — same-name aliasing would prune soundly-
      * looking but WRONG. Temporal transforms are mutually distinct by
      * name already. */
    def dirName: String = transform match {
      case Identity => source
      case Years => s"${source}_year"
      case Months => s"${source}_month"
      case Days => s"${source}_day"
      case Hours => s"${source}_hour"
      case Bucket(n) => s"${source}_bucket_$n"
      case Truncate(w) => s"${source}_trunc_$w"
    }
    def entry: String = transform match {
      case Identity => source
      case Years => s"years($source)"
      case Months => s"months($source)"
      case Days => s"days($source)"
      case Hours => s"hours($source)"
      case Bucket(n) => s"bucket($n,$source)"
      case Truncate(w) => s"truncate($w,$source)"
    }

    /** The derived-directory column for the write path. Must agree exactly
      * with [[applyToLiteral]] — pruning compares the two. */
    def writeExpr(schema: StructType): Column = {
      val src = col(source)
      val dt = schema(schema.fieldIndex(source)).dataType
      transform match {
        case Identity => src
        case Years | Months | Days | Hours =>
          val fmt = temporalPattern(transform)
          dt match {
            case DateType => date_format(src, fmt) // no TZ ambiguity on dates
            case TimestampType =>
              // UTC-pinned: date_format without an explicit zone renders in
              // the session TZ, which would make the layout (and pruning)
              // depend on who wrote the data
              bridge.column(
                org.apache.spark.sql.catalyst.expressions.DateFormatClass(
                  bridge.expression(src), Literal(fmt), Some("UTC")))
            case TimestampNTZType =>
              // NTZ is wall-clock time with no instant semantics: the date
              // part extracts zone-free via the ntz->date cast, and the
              // hour via field extraction — never through date_format,
              // whose ntz->ltz input cast would drag the session TZ into
              // the directory layout
              transform match {
                case Hours => concat(
                  date_format(src.cast(DateType), "yyyy-MM-dd"), lit("-"),
                  lpad(hour(src).cast(StringType), 2, "0"))
                case _ => date_format(src.cast(DateType), fmt)
              }
            case other => throw new IllegalArgumentException(
              s"${transform.name}($source): needs date/timestamp, got ${other.simpleString}")
          }
        // null guard: Spark's murmur3 of NULL returns the SEED (42), which
        // would silently file null-source rows under pmod(42, n) — a
        // regular bucket dir — while IsNull pruning (correctly) looks only
        // at the null dir. Mapping null -> null keeps every transform
        // null-preserving, like Iceberg's bucket
        case Bucket(n) => when(src.isNotNull, pmod(hash(src), lit(n)))
        case Truncate(w) => dt match {
          case StringType => substring(src, 1, w)
          case ByteType | ShortType | IntegerType | LongType =>
            // compute in Long: 32-bit `src - pmod(src, w)` wraps near
            // Int.MinValue under non-ANSI eval while the prune-side
            // applyToLiteral floors in Long — write and prune must share
            // one arithmetic domain or boundary files mis-prune
            src.cast("long") - pmod(src.cast("long"), lit(w.toLong))
          case other => throw new IllegalArgumentException(
            s"truncate($w,$source): needs string/integral, got ${other.simpleString}")
        }
      }
    }

    /** Transform a driver-side literal into the directory-value string
      * domain — the prune-time twin of [[writeExpr]]. None = can't map
      * soundly (type mismatch), caller must not prune. */
    def applyToLiteral(v: Any, dt: DataType): Option[String] = transform match {
      case Identity => None // identity pruning stays on the existing path
      case Years | Months | Days | Hours =>
        val fmt = java.time.format.DateTimeFormatter
          .ofPattern(temporalPattern(transform))
        dt match {
          case DateType =>
            Some(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).format(fmt))
          case TimestampType =>
            val micros = v.asInstanceOf[Long]
            val inst = java.time.Instant.ofEpochSecond(
              Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
            Some(java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC).format(fmt))
          case TimestampNTZType =>
            // ntz micros encode the WALL-CLOCK datetime against the UTC
            // epoch (Spark's localDateTimeToMicros) — decode the same way
            val micros = v.asInstanceOf[Long]
            Some(java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(micros, 1000000L),
              (Math.floorMod(micros, 1000000L) * 1000L).toInt,
              java.time.ZoneOffset.UTC).format(fmt))
          case _ => None
        }
      case Bucket(n) =>
        // evaluate the EXACT write-side expression on the literal (null
        // maps to the null dir on the write side, never to pmod(seed, n))
        if (v == null) None
        else {
          val h = Pmod(Murmur3Hash(Seq(Literal.create(v, dt)), 42), Literal(n)).eval()
          Option(h).map(_.toString)
        }
      case Truncate(w) => dt match {
        case StringType =>
          // code-point truncation — matches Spark's substring (UTF8String
          // counts characters, not UTF-16 code units)
          val s = v.toString
          val cp = s.codePointCount(0, s.length)
          Some(if (cp <= w) s else s.substring(0, s.offsetByCodePoints(0, w)))
        case ByteType => Some((v.asInstanceOf[Byte] - Math.floorMod(v.asInstanceOf[Byte].toInt, w)).toString)
        case ShortType => Some((v.asInstanceOf[Short] - Math.floorMod(v.asInstanceOf[Short].toInt, w)).toString)
        case IntegerType => Some((v.asInstanceOf[Int].toLong - Math.floorMod(v.asInstanceOf[Int].toLong, w.toLong)).toString)
        case LongType => Some((v.asInstanceOf[Long] - Math.floorMod(v.asInstanceOf[Long], w.toLong)).toString)
        case _ => None
      }
    }

    /** Does the transform preserve the source ordering (so range predicates
      * prune)? Bucket scatters; everything else is monotonic. */
    def isMonotonic: Boolean = transform match {
      case Bucket(_) => false
      case _ => true
    }

    /** Compare two directory-value strings in the transform's output
      * domain: numerically for int-truncate/bucket dirs, lexically for
      * fixed-width ISO temporal strings and string prefixes. */
    def dirLt(schema: StructType, a: String, b: String): Boolean = transform match {
      case Truncate(_) if isIntegral(schema(schema.fieldIndex(source)).dataType) =>
        a.toLong < b.toLong
      case Bucket(_) => a.toLong < b.toLong
      // temporal dirs are fixed-width ASCII; string-truncate prefixes must
      // order the way SPARK orders strings (unsigned UTF-8 bytes), not the
      // way Java orders UTF-16 code units — they disagree above the BMP
      case _ => utf8Lt(a, b)
    }
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Unsigned UTF-8 byte-order comparison — Spark's binary string order. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(ab.length, bb.length)
    while (i < n) {
      val x = ab(i) & 0xff
      val y = bb(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    ab.length < bb.length
  }

  private def temporalPattern(t: Transform): String = t match {
    case Years => "yyyy"
    case Months => "yyyy-MM"
    case Days => "yyyy-MM-dd"
    case Hours => "yyyy-MM-dd-HH"
    case other => throw new IllegalStateException(s"not temporal: $other")
  }

  private val TemporalRe = """(years|months|days|hours)\s*\(\s*([\w.]+)\s*\)""".r
  private val BucketRe = """bucket\s*\(\s*(\d+)\s*,\s*([\w.]+)\s*\)""".r
  private val BucketRevRe = """bucket\s*\(\s*([\w.]+)\s*,\s*(\d+)\s*\)""".r
  private val TruncRe = """truncate\s*\(\s*(\d+)\s*,\s*([\w.]+)\s*\)""".r
  private val TruncRevRe = """truncate\s*\(\s*([\w.]+)\s*,\s*(\d+)\s*\)""".r

  def parseField(entry: String): Field = entry.trim match {
    case TemporalRe(kind, src) => Field(src, kind match {
      case "years" => Years
      case "months" => Months
      case "days" => Days
      case "hours" => Hours
    })
    case BucketRe(n, src) => Field(src, Bucket(n.toInt))
    case BucketRevRe(src, n) => Field(src, Bucket(n.toInt))
    case TruncRe(w, src) => Field(src, Truncate(w.toInt))
    case TruncRevRe(src, w) => Field(src, Truncate(w.toInt))
    case bare if bare.nonEmpty && !bare.contains("(") => Field(bare, Identity)
    case other => throw new IllegalArgumentException(
      s"Unsupported partition transform '$other' — supported: identity, " +
        "years(c), months(c), days(c), hours(c), bucket(n,c), truncate(w,c)")
  }

  def parse(entries: Seq[String]): Seq[Field] = entries.map(parseField)

  /** Parse + validate against a schema: sources must exist, transform/type
    * combinations must be legal, derived dir names must not shadow columns
    * or collide with each other. */
  def validated(entries: Seq[String], schema: StructType): Seq[Field] = {
    val fields = parse(entries)
    fields.foreach { f =>
      require(schema.fieldNames.contains(f.source),
        s"Partition source column ${f.source} not in schema")
      val dt = schema(schema.fieldIndex(f.source)).dataType
      f.transform match {
        case Years | Months | Days | Hours =>
          require(dt == DateType || dt == TimestampType || dt == TimestampNTZType,
            s"${f.entry}: temporal transform needs date/timestamp, got ${dt.simpleString}")
          // a DATE has no hour component: Iceberg rejects hours(date) too.
          // Accepting it would create the table fine and then crash every
          // pruned scan (applyToLiteral formats LocalDate with an HH
          // pattern -> UnsupportedTemporalTypeException)
          require(!(f.transform == Hours && dt == DateType),
            s"${f.entry}: hours() needs a timestamp source, got date")
        case Bucket(n) =>
          require(n > 0, s"${f.entry}: bucket count must be positive")
          require(isIntegral(dt) || dt == StringType ||
            dt == DateType || dt == TimestampType || dt == TimestampNTZType,
            s"${f.entry}: bucket needs integral/string/date/timestamp, got ${dt.simpleString}")
        case Truncate(w) =>
          require(w > 0, s"${f.entry}: truncate width must be positive")
          require(isIntegral(dt) || dt == StringType,
            s"${f.entry}: truncate needs string/integral, got ${dt.simpleString}")
        case Identity =>
      }
      require(f.isIdentity || !schema.fieldNames.contains(f.dirName),
        s"${f.entry}: derived partition dir '${f.dirName}' shadows a schema column")
    }
    val dirs = fields.map(_.dirName)
    require(dirs.distinct.size == dirs.size,
      s"Partition spec has colliding directory names: ${dirs.mkString(", ")}")
    fields
  }

  // ---------------------------------------------------------------------
  // Prune-time evaluation
  // ---------------------------------------------------------------------

  private def bareAttr(e: CExpr): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case _ => None
  }

  private def typedLit(e: CExpr): Option[(Any, DataType)] = e match {
    case Literal(v, dt) if v != null => Some((v, dt))
    case _ => None
  }

  /**
   * Conservative may-match of one resolved conjunct against one file's
   * TRANSFORM partition evidence. Returns false only when the directory
   * value PROVES no row in the file satisfies the conjunct. Identity
   * fields are handled by the caller's existing stat/partition check.
   *
   * Soundness guards: the attribute must be a bare reference (a cast could
   * change the value domain the transform was computed over) and the
   * literal's type must equal the source column's type exactly.
   */
  def fileMayMatch(c: CExpr, f: Field, schema: StructType,
      partitionValues: Map[String, String]): Boolean = {
    if (f.isIdentity) return true
    val pvOpt = partitionValues.get(f.dirName)
    if (pvOpt.isEmpty) return true // written under another spec
    val pv = pvOpt.get
    val srcType = schema(schema.fieldIndex(f.source)).dataType

    def isNullDir = pv == "__HIVE_DEFAULT_PARTITION__"
    def lt(a: String, b: String) = f.dirLt(schema, a, b)
    def tlit(l: CExpr): Option[String] =
      typedLit(l).filter(_._2 == srcType).flatMap { case (v, dt) => f.applyToLiteral(v, dt) }
    def onSource(a: CExpr): Boolean = bareAttr(a).exists(_.name == f.source)

    c match {
      case EqualTo(a, l) if onSource(a) =>
        if (isNullDir) true
        else tlit(l).forall(t => pv == t)
      case EqualTo(l, a) if onSource(a) => fileMayMatch(EqualTo(a, l), f, schema, partitionValues)
      case GreaterThan(a, l) if onSource(a) && f.isMonotonic =>
        if (isNullDir) true else tlit(l).forall(t => !lt(pv, t)) // prune iff pv < T(lit)
      case GreaterThanOrEqual(a, l) if onSource(a) && f.isMonotonic =>
        if (isNullDir) true else tlit(l).forall(t => !lt(pv, t))
      case LessThan(a, l) if onSource(a) && f.isMonotonic =>
        if (isNullDir) true else tlit(l).forall(t => !lt(t, pv)) // prune iff pv > T(lit)
      case LessThanOrEqual(a, l) if onSource(a) && f.isMonotonic =>
        if (isNullDir) true else tlit(l).forall(t => !lt(t, pv))
      // literal-on-the-left comparisons arrive normalized by the optimizer,
      // but handle them anyway
      case GreaterThan(l, a) if onSource(a) && f.isMonotonic =>
        fileMayMatch(LessThan(a, l), f, schema, partitionValues)
      case GreaterThanOrEqual(l, a) if onSource(a) && f.isMonotonic =>
        fileMayMatch(LessThanOrEqual(a, l), f, schema, partitionValues)
      case LessThan(l, a) if onSource(a) && f.isMonotonic =>
        fileMayMatch(GreaterThan(a, l), f, schema, partitionValues)
      case LessThanOrEqual(l, a) if onSource(a) && f.isMonotonic =>
        fileMayMatch(GreaterThanOrEqual(a, l), f, schema, partitionValues)
      case IsNull(a) if onSource(a) =>
        isNullDir // transforms are null-preserving: null rows land in the null dir
      case IsNotNull(a) if onSource(a) =>
        !isNullDir
      case _ => true
    }
  }
}
