package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hidden partitioning (X77) — Iceberg-style partition TRANSFORMS:
  * `PARTITIONED BY (days(ts), bucket(8, user_id), truncate(4, s))`.
  *
  * The partition column is DERIVED: it never appears in the table's
  * logical schema, queries never name it, and its value is computed
  * from the base column at every write (`expr`, rendered as the hive
  * dir token) — so a predicate on the BASE column prunes partition
  * directories without the user knowing the layout exists
  * (`infer`: base-column bounds → dir-token bounds). This is the
  * design Iceberg calls hidden partitioning and Delta approximates
  * with generated columns; at 100 TB it is the difference between a
  * full scan and opening one day × one bucket, with zero schema
  * pollution and zero queries rewritten.
  *
  * Reference analog: the reference's IO manager derives
  * (year, month, day) partition literals from the partition key
  * (`delta_io.py:63-67,108-110`) — the same "partition values are a
  * FUNCTION of the data's time attribute" contract, hard-coded there,
  * declarative here.
  *
  * Soundness rules, in one place:
  *   - Every inference is over the SAME rendering the write path
  *     commits (probed: Murmur3HashFunction == `hash()`; DATE→STRING
  *     cast == `LocalDate.toString`; fixed-width day tokens make
  *     lexicographic == chronological), and [[TokenBound.keeps]] is
  *     conservative everywhere it cannot decide: missing segment,
  *     odd-shaped token (sign-prefixed years), escaped characters,
  *     unparseable numbers all KEEP the file. The full predicate
  *     still runs over survivors, so results stay exact.
  *   - Time transforms bucket instants by UTC (session-timezone-free
  *     arithmetic on `unix_micros`); NTZ/date by their wall values.
  *     A cluster whose sessions disagree on timezone still writes and
  *     prunes identically.
  *   - Strict base bounds stay strict in the BASE domain only; at the
  *     partition level every comparison is inclusive (the boundary
  *     token can still hold in-range rows). */
sealed abstract class PartitionTransform {
  /** Base (logical) column the partition value derives from. */
  def base: String
  /** Canonical committed spec rendering, e.g. `days(ts)`. */
  def spec: String
  /** The partition VALUE as a string column (null → default
    * partition), computed from the base column — the write path
    * appends this as the routing column. */
  def expr(c: Column): Column
  /** JVM twin of [[expr]] for ONE raw Catalyst value (micros for
    * timestamp/NTZ, days for date, primitives, UTF8String/String) —
    * the executor-side streaming writer routes rows with this; parity
    * with [[expr]] is spec-pinned. null → null (default partition). */
  def eval(v: Any): String
  /** Dir-token prune implied by the base column's predicate bounds
    * (None = nothing inferable — no pruning on this column). */
  def infer(b: DataSkipping.Bounds): Option[TokenBound]

  /** reqNull with no value bound keeps ONLY null-partition dirs (all
    * transforms route null base values to the hive default token);
    * any value bound or reqNotNull drops them. Shared by every
    * subclass's [[infer]]. */
  protected def shell(b: DataSkipping.Bounds): Option[TokenBound] =
    if (b.reqNull && !b.hasValueBound)
      Some(TokenBound(nullsOnly = true, dropNulls = false))
    else if (b.reqNotNull || b.hasValueBound)
      Some(TokenBound(nullsOnly = false, dropNulls = true))
    else None
}

/** Prune decision for one derived partition column, in the rendered
  * dir-token domain. All checks conservative: undecidable → keep. */
final case class TokenBound(
    nullsOnly: Boolean, dropNulls: Boolean,
    eq: Option[Set[String]] = None,
    lo: Option[String] = None, hi: Option[String] = None,
    /** compare tokens as parsed longs (truncate over integrals) */
    numeric: Boolean = false,
    /** tokens containing '%' escapes conservatively kept (string
      * ranges: escaped order ≠ value order) */
    escapeGuard: Boolean = false,
    /** value tokens must look like `dddd…` (4-digit year) for the
      * range to apply — sign-prefixed years sort wrong */
    shapeGuard: Boolean = false) {

  private def valueOk(token: String): Boolean = {
    if (nullsOnly) return false
    if (escapeGuard && token.contains('%')) return true
    if (shapeGuard && !(token.length >= 4 && token.take(4).forall(_.isDigit)))
      return true
    eq match {
      case Some(set) => set.contains(token)
      case None =>
        if (numeric) token.toLongOption match {
          case None => true // unexpected token: keep
          case Some(v) =>
            lo.forall(l => v >= l.toLong) && hi.forall(h => v <= h.toLong)
        } else
          lo.forall(token >= _) && hi.forall(token <= _)
    }
  }

  /** Driver-side test over the file's (escaped) dir token; None =
    * no such segment (conservatively kept). */
  def keeps(token: Option[String]): Boolean = token match {
    case None => true
    case Some(PartitionTransform.DefaultPartition) => !dropNulls
    case Some(t) => valueOk(t)
  }

  /** The same test as a Column over a `file` rel-path column — the
    * columnar-checkpoint twin of [[keeps]] (literals fold driver-side,
    * the comparison codegens in the prune job). */
  def keepsExpr(pcol: String): Column = {
    val token = regexp_extract(col("file"),
      "(?:^|/)" + java.util.regex.Pattern.quote(pcol) + "=([^/]+)/", 1)
    val value: Column =
      if (nullsOnly) lit(false)
      else {
        val ranged = eq match {
          case Some(set) => token.isInCollection(set.toSeq)
          case None =>
            if (numeric) {
              val n = token.cast(LongType)
              when(n.isNull, lit(true)).otherwise(
                lo.map(l => n >= lit(l.toLong)).getOrElse(lit(true)) &&
                  hi.map(h => n <= lit(h.toLong)).getOrElse(lit(true)))
            } else
              lo.map(l => token >= lit(l)).getOrElse(lit(true)) &&
                hi.map(h => token <= lit(h)).getOrElse(lit(true))
        }
        val guarded =
          if (shapeGuard) when(!token.rlike("^[0-9]{4}"), lit(true)).otherwise(ranged)
          else ranged
        if (escapeGuard) when(token.contains("%"), lit(true)).otherwise(guarded)
        else guarded
      }
    when(token === lit(""), lit(true))
      .when(token === lit(PartitionTransform.DefaultPartition), lit(!dropNulls))
      .otherwise(value)
  }
}

object PartitionTransform {

  val DefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** `days`/`months`/`years` (timestamp, NTZ, or date base) and
    * `hours` (timestamp/NTZ): fixed-width tokens `yyyy-MM-dd`,
    * `yyyy-MM`, `yyyy`, `yyyy-MM-dd-HH` — zero-padded, so
    * lexicographic order IS chronological inside the 4-digit-year
    * shape the guard pins. */
  final case class TimeTransform(unit: String, base: String,
      baseType: DataType) extends PartitionTransform {
    def spec: String = s"$unit($base)"

    private def width = unit match {
      case "years" => 4
      case "months" => 7
      case "days" => 10
      case "hours" => 13
    }

    def expr(c: Column): Column = {
      // day rendering, timezone-free: TIMESTAMP via UTC epoch-day
      // arithmetic (exact integer floor-div; DATE-typed cast-to-string
      // rendering matches LocalDate.toString — probed), NTZ/DATE via
      // their wall rendering (cast-to-string never zone-converts)
      val dayAndHour: (Column, Column) = baseType match {
        case TimestampType =>
          val um = unix_micros(c)
          // integral `div`, not Column `/` (double): at |micros| > 2^53
          // the double numerator is inexact and the written dir token
          // could diverge from eval/infer's Math.floorDiv (ADVICE r8).
          // The numerator is an exact multiple of the divisor, so
          // truncating div == floorDiv even pre-epoch.
          val ed = call_function("div", um - pmod(um, lit(MicrosPerDay)),
            lit(MicrosPerDay)).cast(IntegerType)
          val hod = call_function("div",
            pmod(um, lit(MicrosPerDay)) - pmod(um, lit(MicrosPerHour)),
            lit(MicrosPerHour)).cast(IntegerType)
          (date_add(lit(java.sql.Date.valueOf("1970-01-01")), ed)
            .cast(StringType),
            lpad(hod.cast(StringType), 2, "0"))
        case TimestampNTZType =>
          val s = c.cast(StringType)
          (substring(s, 1, 10), substring(s, 12, 2))
        case DateType =>
          (c.cast(StringType), lit(null).cast(StringType))
      }
      val token = unit match {
        case "days" => dayAndHour._1
        case "months" => substring(dayAndHour._1, 1, 7)
        case "years" => substring(dayAndHour._1, 1, 4)
        case "hours" => concat(dayAndHour._1, lit("-"), dayAndHour._2)
      }
      when(c.isNull, lit(null).cast(StringType)).otherwise(token)
    }

    private def render(epochDay: Long, hourOfDay: Int): String = {
      val day = java.time.LocalDate.ofEpochDay(epochDay).toString
      unit match {
        case "days" => day
        case "months" => day.take(7)
        case "years" => day.take(4)
        case "hours" => day + "-" + f"$hourOfDay%02d"
      }
    }

    def eval(v: Any): String = v match {
      case null => null
      case _ =>
        val (ed, hod) = baseType match {
          case TimestampType | TimestampNTZType =>
            val um = v.asInstanceOf[Long]
            (Math.floorDiv(um, MicrosPerDay),
              Math.floorDiv(Math.floorMod(um, MicrosPerDay), MicrosPerHour).toInt)
          case DateType => (v.asInstanceOf[Int].toLong, 0)
        }
        render(ed, hod)
    }

    def infer(b: DataSkipping.Bounds): Option[TokenBound] = {
      val (loT, hiT) = baseType match {
        case TimestampType | TimestampNTZType =>
          (b.lower.map(um => render(Math.floorDiv(um, MicrosPerDay),
            Math.floorDiv(Math.floorMod(um, MicrosPerDay), MicrosPerHour).toInt)),
            b.upper.map(um => render(Math.floorDiv(um, MicrosPerDay),
              Math.floorDiv(Math.floorMod(um, MicrosPerDay), MicrosPerHour).toInt)))
        case DateType =>
          (b.lower.map(d => render(d, 0)), b.upper.map(d => render(d, 0)))
      }
      // a bound whose own rendering escapes the fixed-width shape
      // cannot order tokens and is dropped (that side stays unbounded)
      def shaped(t: Option[String]) = t.filter(_.length == width)
        .filter(_.take(4).forall(_.isDigit))
      shell(b).map(_.copy(lo = shaped(loT), hi = shaped(hiT),
        shapeGuard = true))
    }
  }

  /** `bucket(n, c)`: `pmod(hash(c), n)` — Spark's Murmur3 (seed 42),
    * identical across the SQL write path, the executor-side streaming
    * writer, and inference (probed equal). Point predicates on the
    * base column prune to ONE bucket dir; nulls route to the default
    * partition (the bare `hash()` would fold null into seed 42 —
    * guarded with an explicit null branch so IS NULL pruning stays
    * uniform across transforms). */
  final case class Bucket(n: Int, base: String, baseType: DataType)
      extends PartitionTransform {
    def spec: String = s"bucket($n,$base)"

    def expr(c: Column): Column =
      when(c.isNull, lit(null).cast(StringType))
        .otherwise(pmod(hash(c), lit(n)).cast(StringType))

    private def bucketOf(catalystValue: Any): String = {
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(catalystValue, baseType, 42L).toInt
      Math.floorMod(h, n).toString
    }

    def eval(v: Any): String = v match {
      case null => null
      case s: String => bucketOf(UTF8String.fromString(s))
      case other => bucketOf(other)
    }

    /** Equality only (lower == upper both-sides-inclusive is the
      * analyzer's rendering of `c = v`): hash the typed value. Ranges
      * scatter across buckets and never prune. */
    def infer(b: DataSkipping.Bounds): Option[TokenBound] = {
      val point: Option[Any] = baseType match {
        case StringType =>
          (b.lowerS, b.upperS) match {
            case (Some(lo), Some(hi))
                if lo == hi && !b.lowerSStrict && !b.upperSStrict =>
              Some(UTF8String.fromString(lo))
            case _ => None
          }
        case ByteType => pointLong(b).map(v => java.lang.Byte.valueOf(v.toByte))
        case ShortType => pointLong(b).map(v => java.lang.Short.valueOf(v.toShort))
        case IntegerType => pointLong(b).map(v => java.lang.Integer.valueOf(v.toInt))
        case LongType => pointLong(b).map(java.lang.Long.valueOf)
        case TimestampType | TimestampNTZType => pointLong(b).map(java.lang.Long.valueOf)
        case DateType => pointLong(b).map(v => java.lang.Integer.valueOf(v.toInt))
        case _ => None
      }
      shell(b).map(tb => point match {
        case Some(v) => tb.copy(eq = Some(Set(bucketOf(v))))
        case None => tb
      })
    }

    private def pointLong(b: DataSkipping.Bounds): Option[Long] =
      (b.lower, b.upper) match {
        case (Some(lo), Some(hi)) if lo == hi => Some(lo)
        case _ => None
      }
  }

  /** `truncate(w, c)`: integral base → floor-truncate to multiples of
    * `w` (negative values round toward −∞, the Iceberg contract);
    * string base → first `w` CODE POINTS (matches Spark `substring`).
    * Integral tokens compare as parsed longs (dir tokens are decimal
    * renderings — lexicographic would put "10" < "9"); string tokens
    * compare lexicographically under the ASCII-bound + '%'-escape
    * guards. */
  final case class Truncate(w: Int, base: String, baseType: DataType)
      extends PartitionTransform {
    def spec: String = s"truncate($w,$base)"

    def expr(c: Column): Column = baseType match {
      case StringType => substring(c, 1, w)
      case _ =>
        when(c.isNull, lit(null).cast(StringType))
          .otherwise((c.cast(LongType) - pmod(c.cast(LongType), lit(w.toLong)))
            .cast(StringType))
    }

    private def truncLong(v: Long): Long = v - Math.floorMod(v, w.toLong)

    private def truncStr(s: String): String = {
      val it = s.codePoints().iterator()
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < w && it.hasNext) { sb.appendCodePoint(it.next()); i += 1 }
      sb.toString
    }

    def eval(v: Any): String = v match {
      case null => null
      case u: UTF8String => truncStr(u.toString)
      case s: String => truncStr(s)
      case b: Byte => truncLong(b.toLong).toString
      case s: Short => truncLong(s.toLong).toString
      case i: Int => truncLong(i.toLong).toString
      case l: Long => truncLong(l).toString
      case other => truncStr(other.toString)
    }

    def infer(b: DataSkipping.Bounds): Option[TokenBound] = baseType match {
      case StringType =>
        // bounds come from predicate literals (ASCII by extraction
        // contract); strictness collapses to inclusive at the
        // partition level — the boundary prefix can hold in-range rows.
        // dropNulls stays FALSE (ADVICE r8): an empty base string
        // yields token "", which both write paths render as the hive
        // DEFAULT partition dir — so that dir holds non-null s="" rows
        // alongside true nulls, and neither a value bound (s = '' or
        // s < 'a' can match "") nor IS NOT NULL may drop it
        shell(b).map(_.copy(lo = b.lowerS.map(truncStr),
          hi = b.upperS.map(truncStr), escapeGuard = true,
          dropNulls = false))
      case _ =>
        shell(b).map(_.copy(lo = b.lower.map(v => truncLong(v).toString),
          hi = b.upper.map(v => truncLong(v).toString), numeric = true))
    }
  }

  private val TimeUnits = Set("years", "months", "days", "hours")

  /** Parse a committed `ptransform/` spec against the schema the table
    * committed it under. Loud on drift — a spec naming a missing or
    * re-typed base column is corruption, not a prune opportunity. */
  def parse(spec: String, schema: StructType): PartitionTransform = {
    val m = raw"([a-z]+)\(([^)]*)\)".r
    spec match {
      case m(unit, arg) if TimeUnits(unit) =>
        val f = fieldOf(schema, arg.trim, spec)
        require(f.dataType == TimestampType || f.dataType == TimestampNTZType ||
          f.dataType == DateType,
          s"$spec: base column must be timestamp/date (got ${f.dataType.simpleString})")
        require(unit != "hours" || f.dataType != DateType,
          s"$spec: hours() needs a timestamp base")
        TimeTransform(unit, f.name, f.dataType)
      case m("bucket", args) =>
        val Array(nStr, col) = args.split(",", 2).map(_.trim)
        val n = nStr.toInt
        require(n > 0, s"$spec: bucket count must be positive")
        val f = fieldOf(schema, col, spec)
        require(bucketable(f.dataType),
          s"$spec: bucket base must be integral/string/date/timestamp " +
            s"(got ${f.dataType.simpleString})")
        Bucket(n, f.name, f.dataType)
      case m("truncate", args) =>
        val Array(wStr, col) = args.split(",", 2).map(_.trim)
        val w = wStr.toInt
        require(w > 0, s"$spec: truncate width must be positive")
        val f = fieldOf(schema, col, spec)
        require(f.dataType == StringType || integral(f.dataType),
          s"$spec: truncate base must be integral/string (got ${f.dataType.simpleString})")
        Truncate(w, f.name, f.dataType)
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform '$other' (supported: " +
          "years|months|days|hours(col), bucket(n,col), truncate(w,col))")
    }
  }

  private def fieldOf(schema: StructType, name: String, spec: String) =
    schema.fields.find(_.name == name).getOrElse(throw new
        IllegalArgumentException(s"$spec: base column '$name' is not in the schema"))

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def bucketable(dt: DataType): Boolean = dt match {
    case StringType | DateType | TimestampType | TimestampNTZType => true
    case dt => integral(dt)
  }

  /** Default derived-column name for a spec (the Iceberg convention):
    * `ts_day`, `ts_month`, `ts_year`, `ts_hour`, `id_bucket`,
    * `s_trunc`. */
  def defaultName(t: PartitionTransform): String = t match {
    case TimeTransform(u, b, _) => s"${b}_${u.stripSuffix("s")}"
    case Bucket(_, b, _) => s"${b}_bucket"
    case Truncate(_, b, _) => s"${b}_trunc"
  }
}
