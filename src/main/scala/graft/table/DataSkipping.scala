package graft.table

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.types._

/** Extracts conservative per-column bounds from a predicate, for
  * file-level data skipping against the commit log's [[ColStat]]
  * index (Delta-style: prune before Spark even enumerates the files;
  * the full predicate still runs over whatever survives, so extraction
  * only ever needs to be SOUND, never complete).
  *
  * The predicate is RESOLVED first — analyzed as a `filter` over an
  * empty frame with the table's committed schema (public API only; no
  * analysis job touches data). That buys exact column-name resolution
  * and normalizes literals through the analyzer's implicit casts.
  *
  * Supported shapes: `col <op> literal` / `literal <op> col` for
  * =, <, <=, >, >= over integral OR string columns and literals,
  * combined with AND. Any other conjunct (OR, functions, other types)
  * simply contributes no bound — those files are read and filtered
  * normally. Integral strict comparisons tighten to inclusive bounds
  * by ±1 (exact in that domain); string strict comparisons carry an
  * explicit strictness flag instead (there is no "next string").
  * String pruning compares in CODE POINT order ([[cpCompare]]) — the
  * one order shared by parquet's unsigned-byte footer stats, Spark's
  * UTF8String row-time comparison, and the truncated [[ColStat]]
  * bounds; java.lang.String's UTF-16 order diverges beyond the BMP
  * and is never used on this path. */
object DataSkipping {

  /** String-stat bound length, in code points (Iceberg `truncate(16)`
    * analog): a text corpus's long string columns index at bounded
    * metadata cost per file per column, instead of embedding full
    * document prefixes in every commit and manifest. */
  val StatsStringTruncate = 16

  /** Compare in CODE POINT order — identical to UTF8String binary
    * order (Spark's row-time string comparison) and parquet's
    * unsigned-byte footer order. java.lang.String's natural UTF-16
    * order diverges beyond the BMP (U+E000..U+FFFF sort above astral
    * code points there), so every driver-side stat comparison routes
    * through this instead. */
  def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Sound LOWER bound for a string stat: the value itself when it is
    * at most `n` code points, else its `n`-code-point prefix — a
    * prefix precedes the original in every lexicographic order. */
  def truncateLower(s: String, n: Int = StatsStringTruncate): String =
    if (s.codePointCount(0, s.length) <= n) s
    else s.substring(0, s.offsetByCodePoints(0, n))

  /** Sound UPPER bound: the value itself when short enough, else its
    * `n`-code-point prefix with the last position bumped to the next
    * valid scalar (skipping the surrogate gap), carrying the borrow
    * leftward past U+10FFFF — the bumped prefix exceeds every string
    * that starts with the original prefix, in code point order. None
    * when no finite bound exists (every prefix position is U+10FFFF —
    * not a shape real text produces). */
  def truncateUpper(s: String, n: Int = StatsStringTruncate): Option[String] = {
    if (s.codePointCount(0, s.length) <= n) return Some(s)
    val cps = s.codePoints().limit(n.toLong).toArray
    var i = cps.length - 1
    while (i >= 0) {
      val next =
        if (cps(i) == 0xD7FF) 0xE000
        else if (cps(i) >= 0x10FFFF) -1
        else cps(i) + 1
      if (next > 0) {
        val kept = cps.take(i) :+ next
        return Some(new String(kept, 0, kept.length))
      }
      i -= 1
    }
    None
  }

  /** Inclusive integral bounds and/or (possibly strict) string bounds
    * a row must satisfy for a column; None = unbounded on that side.
    * A predicate binds one side of the pair per column — the other
    * stays empty and [[overlaps]] ignores it.
    *
    * `reqNull`/`reqNotNull` carry `IS NULL` / `IS NOT NULL` conjuncts
    * against the [[ColStat]] null index: IS NULL prunes files with
    * zero nulls; IS NOT NULL — and any value bound, whose comparison
    * is never true of NULL — prunes all-null files. */
  final case class Bounds(
      lower: Option[Long] = None, upper: Option[Long] = None,
      lowerS: Option[String] = None, upperS: Option[String] = None,
      lowerSStrict: Boolean = false, upperSStrict: Boolean = false,
      reqNull: Boolean = false, reqNotNull: Boolean = false,
      // float/double bounds (X75): no "next double", so strictness is
      // carried explicitly like the string side
      lowerD: Option[Double] = None, upperD: Option[Double] = None,
      lowerDStrict: Boolean = false, upperDStrict: Boolean = false,
      // Point sets (X100, the bloom-index feed): the EXACT value set an
      // equality/IN conjunct pins the column to — None = the predicate
      // is not a pure point constraint on this column. [min,max] bounds
      // carry the same information collapsed to a range; the bloom
      // prune needs the members themselves. Strings here are
      // unrestricted (hashes carry no ordering assumption, unlike the
      // ASCII-gated lowerS/upperS). AND intersects; an empty set is a
      // provably-false conjunct (col=5 AND col=6) and prunes freely.
      eqLongs: Option[Set[Long]] = None,
      eqStrs: Option[Set[String]] = None) {
    def hasValueBound: Boolean =
      lower.nonEmpty || upper.nonEmpty || lowerS.nonEmpty || upperS.nonEmpty ||
        lowerD.nonEmpty || upperD.nonEmpty || eqLongs.nonEmpty || eqStrs.nonEmpty
  }

  /** Per-column bounds implied by `predicate` against `schema`
    * (empty = nothing extractable, no pruning). */
  def bounds(spark: SparkSession, schema: StructType, predicate: Column): Map[String, Bounds] = {
    val empty = spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    empty.filter(predicate).queryExecution.analyzed.collectFirst {
      case f: logical.Filter => extract(f.condition)
    }.getOrElse(Map.empty)
  }

  /** Does a file whose rows span the stat's [min,max] possibly hold a
    * row inside `b`? Bounds of one kind never prune against a stat of
    * the other (conservatively kept). Null checks come first: an
    * all-null file's min/max are placeholders and must never be
    * consulted; a stat without a null tally (old log) prunes exactly
    * as before. */
  def overlaps(b: Bounds, stat: ColStat): Boolean =
    if (b.reqNull && stat.nulls.contains(0L)) false
    else if (stat.allNull) !b.reqNotNull && !b.hasValueBound
    else if (stat.isString) {
      val mx = stat.maxS.get
      val mn = stat.minS.get
      b.lowerS.forall(lo => if (b.lowerSStrict) cpCompare(mx, lo) > 0
        else cpCompare(mx, lo) >= 0) &&
        b.upperS.forall(hi => if (b.upperSStrict) cpCompare(mn, hi) < 0
          else cpCompare(mn, hi) <= 0)
    } else if (stat.isDouble) {
      // NaN-free by construction (parquet-mr omits NaN-tainted double
      // stats; the harvest double-checks), and a NaN literal never
      // extracts — so plain double comparison is exact here. A file
      // CONTAINING NaN has no entry at all and is always kept (NaN
      // compares greater than everything in Spark, so pruning it on a
      // finite upper bound would be unsound).
      val mx = stat.maxD.get
      val mn = stat.minD.get
      b.lowerD.forall(lo => if (b.lowerDStrict) mx > lo else mx >= lo) &&
        b.upperD.forall(hi => if (b.upperDStrict) mn < hi else mn <= hi)
    } else
      b.lower.forall(_ <= stat.max) && b.upper.forall(_ >= stat.min)

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Types whose internal representation is a discretely-ordered long
    * (so the integral [min,max] index and the ±1 strict-bound
    * tightening are exact): integrals, dates (int32 days), and
    * timestamps (int64 micros). */
  private def indexable(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case dt => integral(dt)
  }

  /** Struct-field access chains flatten to the parquet footer's
    * dot-path rendering (`hdr.total`) — the key the X6 stats index
    * stores for nested leaves, so nested predicates prune exactly like
    * flat ones once the writer indexed the leaf (statsColumns /
    * `graft.statsColumns` accept dot-paths). Array leaves join the
    * index under `….element…` paths via the EXISTS-shaped extraction
    * below ([[elemPath]]); map extraction stays unextractable. */
  private def dotPath(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case g: GetStructField => dotPath(g.child).map(_ + "." + g.extractFieldName)
    case _ => None
  }

  /** The attribute (or struct-leaf dot-path) under value-preserving
    * integral widening only — the shape the analyzer makes when
    * comparing an int column to a long literal. Non-widening casts
    * (incl. date→timestamp) are never unwrapped — they would change
    * comparison semantics. */
  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference if indexable(a.dataType) => Some(a.name)
    case g: GetStructField if indexable(g.dataType) => dotPath(g)
    case Cast(a: AttributeReference, dt, _, _)
        if integral(a.dataType) && integral(dt) &&
          dt.defaultSize >= a.dataType.defaultSize => Some(a.name)
    case Cast(g: GetStructField, dt, _, _)
        if integral(g.dataType) && integral(dt) &&
          dt.defaultSize >= g.dataType.defaultSize => dotPath(g)
    case _ => None
  }

  /** A bare string attribute or struct leaf — never unwrapped from
    * casts (a cast to or from string changes comparison semantics). */
  private def attrNameS(e: Expression): Option[String] = e match {
    case a: AttributeReference if a.dataType == StringType => Some(a.name)
    case g: GetStructField if g.dataType == StringType => dotPath(g)
    case _ => None
  }

  /** A float/double attribute or struct leaf, possibly under the
    * analyzer's value-preserving float→double cast (comparing a float
    * column to a double literal). Integral→double casts are NOT
    * unwrapped: a bigint loses precision in double, so the comparison
    * domain changes. */
  private def attrNameD(e: Expression): Option[String] = e match {
    case a: AttributeReference
        if a.dataType == FloatType || a.dataType == DoubleType => Some(a.name)
    case g: GetStructField
        if g.dataType == FloatType || g.dataType == DoubleType => dotPath(g)
    case Cast(a: AttributeReference, DoubleType, _, _)
        if a.dataType == FloatType => Some(a.name)
    case Cast(g: GetStructField, DoubleType, _, _)
        if g.dataType == FloatType => dotPath(g)
    case _ => None
  }

  /** Finite float/double literals only (widened to double — exact).
    * NaN is excluded: it compares GREATER than every value in Spark,
    * outside what a finite [min,max] can answer; infinities are
    * ordinary ordered values and stay. */
  private def litDbl(e: Expression): Option[Double] = {
    val v = e match {
      case Literal(null, _) => None
      case Literal(d: Double, DoubleType) => Some(d)
      case Literal(f: Float, FloatType) => Some(f.toDouble)
      case c: Cast if c.foldable &&
          (c.dataType == DoubleType || c.dataType == FloatType) =>
        Option(c.eval(null)).map {
          case d: Double => d
          case f: Float => f.toDouble
        }
      case _ => None
    }
    v.filterNot(_.isNaN)
  }

  /** The `….element` dot-path of an array column (or array struct-leaf)
    * whose ELEMENT type satisfies `ok` — the key under which the X6
    * index stores repeated-leaf [min,max] ([[IncrementalTable
    * .normalizeLeafPath]]). Bounds against an element entry answer "can
    * this file hold an element in range" — exactly the EXISTS-shaped
    * question `array_contains`/`exists` pruning asks. */
  private def elemPath(e: Expression, ok: DataType => Boolean): Option[String] = {
    val root = e match {
      case a: AttributeReference => Some((a.name, a.dataType))
      case g: GetStructField => dotPath(g).map(_ -> g.dataType)
      case _ => None
    }
    root.collect {
      case (p, ArrayType(et, _)) if ok(et) => s"$p.element"
    }
  }

  /** The `….key` / `….value` dot-path of a map column whose selected
    * side's type satisfies `ok` — the map twin of [[elemPath]] (X69). */
  private def mapPath(e: Expression, side: String,
      ok: DataType => Boolean): Option[String] = {
    val root = e match {
      case a: AttributeReference => Some((a.name, a.dataType))
      case g: GetStructField => dotPath(g).map(_ -> g.dataType)
      case _ => None
    }
    root.collect {
      case (p, MapType(kt, _, _)) if side == "key" && ok(kt) => s"$p.key"
      case (p, MapType(_, vt, _)) if side == "value" && ok(vt) => s"$p.value"
    }
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(null, _) => None
    case l @ Literal(_, dt) if indexable(dt) => asLong(l.value)
    case c: Cast if c.foldable && indexable(c.dataType) =>
      Option(c.eval(null)).flatMap(asLong)
    case _ => None
  }

  /** Non-null string literals — since bounds compare in code point
    * order end-to-end, non-ASCII literals are inside the sound domain
    * (the old ASCII gate predates [[cpCompare]]). */
  private def litStr(e: Expression): Option[String] = e match {
    case Literal(null, _) => None
    case Literal(v, StringType) => Option(v).map(_.toString)
    case _ => None
  }

  /** Any non-null string literal — the bloom point-set domain (X100):
    * hashes carry no ordering assumption, so non-ASCII equality points
    * are fair game even where [min,max] bounds are not. */
  private def litStrAny(e: Expression): Option[String] = e match {
    case Literal(null, _) => None
    case Literal(v, StringType) => Option(v).map(_.toString)
    case _ => None
  }

  private def asLong(v: Any): Option[Long] = v match {
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case _ => None
  }

  // intersection: both conjuncts must hold, so keep the TIGHTER bound;
  // for strings, on an equal-value tie the strict variant is tighter
  private def merge(a: Map[String, Bounds], b: Map[String, Bounds]): Map[String, Bounds] =
    (a.keySet ++ b.keySet).iterator.map { k =>
      val (x, y) = (a.getOrElse(k, Bounds()), b.getOrElse(k, Bounds()))
      val (loS, loStrict) = tighterS(x.lowerS, x.lowerSStrict, y.lowerS, y.lowerSStrict, takeMax = true)
      val (hiS, hiStrict) = tighterS(x.upperS, x.upperSStrict, y.upperS, y.upperSStrict, takeMax = false)
      val (loD, loDStrict) = tighterD(x.lowerD, x.lowerDStrict, y.lowerD, y.lowerDStrict, takeMax = true)
      val (hiD, hiDStrict) = tighterD(x.upperD, x.upperDStrict, y.upperD, y.upperDStrict, takeMax = false)
      k -> Bounds(
        (x.lower.toSeq ++ y.lower.toSeq).maxOption,
        (x.upper.toSeq ++ y.upper.toSeq).minOption,
        loS, hiS, loStrict, hiStrict,
        x.reqNull || y.reqNull, x.reqNotNull || y.reqNotNull,
        loD, hiD, loDStrict, hiDStrict,
        intersectPoints(x.eqLongs, y.eqLongs),
        intersectPoints(x.eqStrs, y.eqStrs))
    }.toMap

  // both conjuncts must hold: a value pinned by both point sets must be
  // in their intersection; one-sided stays as-is
  private def intersectPoints[A](a: Option[Set[A]], b: Option[Set[A]]): Option[Set[A]] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(x.intersect(y))
      case _ => a.orElse(b)
    }

  private def tighterS(a: Option[String], aStrict: Boolean,
      b: Option[String], bStrict: Boolean, takeMax: Boolean): (Option[String], Boolean) =
    (a, b) match {
      case (None, _) => (b, bStrict)
      case (_, None) => (a, aStrict)
      case (Some(x), Some(y)) =>
        if (x == y) (a, aStrict || bStrict)
        else if ((cpCompare(x, y) > 0) == takeMax) (a, aStrict)
        else (b, bStrict)
    }

  private def tighterD(a: Option[Double], aStrict: Boolean,
      b: Option[Double], bStrict: Boolean, takeMax: Boolean): (Option[Double], Boolean) =
    (a, b) match {
      case (None, _) => (b, bStrict)
      case (_, None) => (a, aStrict)
      case (Some(x), Some(y)) =>
        if (x == y) (a, aStrict || bStrict)
        else if ((x > y) == takeMax) (a, aStrict) else (b, bStrict)
    }

  private def one(col: Option[String], b: Bounds): Map[String, Bounds] =
    col.map(_ -> b).toMap

  private def extract(e: Expression): Map[String, Bounds] = e match {
    case And(l, r) => merge(extract(l), extract(r))
    // ---- integral ----
    case EqualTo(a, v) if litLong(v).nonEmpty =>
      one(attrName(a), Bounds(litLong(v), litLong(v),
        eqLongs = Some(litLong(v).toSet)))
    case EqualTo(v, a) if litLong(v).nonEmpty && attrName(a).nonEmpty =>
      one(attrName(a), Bounds(litLong(v), litLong(v),
        eqLongs = Some(litLong(v).toSet)))
    case GreaterThan(a, v) if litLong(v).nonEmpty => // a > v
      one(attrName(a), Bounds(lower = litLong(v).filter(_ != Long.MaxValue).map(_ + 1)))
    case GreaterThan(v, a) if litLong(v).nonEmpty && attrName(a).nonEmpty => // v > a
      one(attrName(a), Bounds(upper = litLong(v).filter(_ != Long.MinValue).map(_ - 1)))
    case GreaterThanOrEqual(a, v) if litLong(v).nonEmpty =>
      one(attrName(a), Bounds(lower = litLong(v)))
    case GreaterThanOrEqual(v, a) if litLong(v).nonEmpty && attrName(a).nonEmpty =>
      one(attrName(a), Bounds(upper = litLong(v)))
    case LessThan(a, v) if litLong(v).nonEmpty => // a < v
      one(attrName(a), Bounds(upper = litLong(v).filter(_ != Long.MinValue).map(_ - 1)))
    case LessThan(v, a) if litLong(v).nonEmpty && attrName(a).nonEmpty => // v < a
      one(attrName(a), Bounds(lower = litLong(v).filter(_ != Long.MaxValue).map(_ + 1)))
    case LessThanOrEqual(a, v) if litLong(v).nonEmpty =>
      one(attrName(a), Bounds(upper = litLong(v)))
    case LessThanOrEqual(v, a) if litLong(v).nonEmpty && attrName(a).nonEmpty =>
      one(attrName(a), Bounds(lower = litLong(v)))
    // ---- float/double (X75) ----
    case EqualTo(a, v) if litDbl(v).nonEmpty && attrNameD(a).nonEmpty =>
      one(attrNameD(a), Bounds(lowerD = litDbl(v), upperD = litDbl(v)))
    case EqualTo(v, a) if litDbl(v).nonEmpty && attrNameD(a).nonEmpty =>
      one(attrNameD(a), Bounds(lowerD = litDbl(v), upperD = litDbl(v)))
    case GreaterThan(a, v) if litDbl(v).nonEmpty && attrNameD(a).nonEmpty =>
      one(attrNameD(a), Bounds(lowerD = litDbl(v), lowerDStrict = true))
    case GreaterThan(v, a) if litDbl(v).nonEmpty && attrNameD(a).nonEmpty =>
      one(attrNameD(a), Bounds(upperD = litDbl(v), upperDStrict = true))
    case GreaterThanOrEqual(a, v) if litDbl(v).nonEmpty && attrNameD(a).nonEmpty =>
      one(attrNameD(a), Bounds(lowerD = litDbl(v)))
    case GreaterThanOrEqual(v, a) if litDbl(v).nonEmpty && attrNameD(a).nonEmpty =>
      one(attrNameD(a), Bounds(upperD = litDbl(v)))
    case LessThan(a, v) if litDbl(v).nonEmpty && attrNameD(a).nonEmpty =>
      one(attrNameD(a), Bounds(upperD = litDbl(v), upperDStrict = true))
    case LessThan(v, a) if litDbl(v).nonEmpty && attrNameD(a).nonEmpty =>
      one(attrNameD(a), Bounds(lowerD = litDbl(v), lowerDStrict = true))
    case LessThanOrEqual(a, v) if litDbl(v).nonEmpty && attrNameD(a).nonEmpty =>
      one(attrNameD(a), Bounds(upperD = litDbl(v)))
    case LessThanOrEqual(v, a) if litDbl(v).nonEmpty && attrNameD(a).nonEmpty =>
      one(attrNameD(a), Bounds(lowerD = litDbl(v)))
    // ---- string ----
    // equality carries its point into eqStrs for the bloom prune even
    // when the value is non-ASCII (where the ordered bounds must stay
    // empty — see litStr's doc)
    case EqualTo(a, v) if litStrAny(v).nonEmpty && attrNameS(a).nonEmpty =>
      one(attrNameS(a), Bounds(lowerS = litStr(v), upperS = litStr(v),
        eqStrs = Some(litStrAny(v).toSet)))
    case EqualTo(v, a) if litStrAny(v).nonEmpty && attrNameS(a).nonEmpty =>
      one(attrNameS(a), Bounds(lowerS = litStr(v), upperS = litStr(v),
        eqStrs = Some(litStrAny(v).toSet)))
    case GreaterThan(a, v) if litStr(v).nonEmpty => // a > v
      one(attrNameS(a), Bounds(lowerS = litStr(v), lowerSStrict = true))
    case GreaterThan(v, a) if litStr(v).nonEmpty => // v > a  ==  a < v
      one(attrNameS(a), Bounds(upperS = litStr(v), upperSStrict = true))
    case GreaterThanOrEqual(a, v) if litStr(v).nonEmpty =>
      one(attrNameS(a), Bounds(lowerS = litStr(v)))
    case GreaterThanOrEqual(v, a) if litStr(v).nonEmpty =>
      one(attrNameS(a), Bounds(upperS = litStr(v)))
    case LessThan(a, v) if litStr(v).nonEmpty => // a < v
      one(attrNameS(a), Bounds(upperS = litStr(v), upperSStrict = true))
    case LessThan(v, a) if litStr(v).nonEmpty => // v < a  ==  a > v
      one(attrNameS(a), Bounds(lowerS = litStr(v), lowerSStrict = true))
    case LessThanOrEqual(a, v) if litStr(v).nonEmpty =>
      one(attrNameS(a), Bounds(upperS = litStr(v)))
    case LessThanOrEqual(v, a) if litStr(v).nonEmpty =>
      one(attrNameS(a), Bounds(lowerS = litStr(v)))
    // ---- IN lists: a member must land inside [min,max] of the list ----
    case In(a, vs) if vs.nonEmpty =>
      val longs = vs.map(litLong)
      val strs = vs.map(litStrAny)
      if (longs.forall(_.nonEmpty))
        one(attrName(a), Bounds(Some(longs.flatten.min), Some(longs.flatten.max),
          eqLongs = Some(longs.flatten.toSet)))
      else if (strs.forall(_.nonEmpty) && attrNameS(a).nonEmpty) {
        val ss = strs.flatten
        one(attrNameS(a), Bounds(
          lowerS = Some(ss.reduce((x, y) => if (cpCompare(x, y) <= 0) x else y)),
          upperS = Some(ss.reduce((x, y) => if (cpCompare(x, y) >= 0) x else y)),
          eqStrs = Some(ss.toSet)))
      } else Map.empty
    case InSet(a, hset) if hset.nonEmpty =>
      // the optimizer's large-IN form; values are internal types
      val vals = hset.toSeq
      if (vals.forall(_.isInstanceOf[java.lang.Number]) &&
          vals.forall(v => asLong(longOf(v)).nonEmpty)) {
        val ls = vals.map(v => asLong(longOf(v)).get)
        one(attrName(a), Bounds(Some(ls.min), Some(ls.max),
          eqLongs = Some(ls.toSet)))
      } else if (vals.forall(_.isInstanceOf[org.apache.spark.unsafe.types.UTF8String])) {
        val ss = vals.map(_.toString)
        one(attrNameS(a), Bounds(
          lowerS = Some(ss.reduce((x, y) => if (cpCompare(x, y) <= 0) x else y)),
          upperS = Some(ss.reduce((x, y) => if (cpCompare(x, y) >= 0) x else y)),
          eqStrs = Some(ss.toSet)))
      } else Map.empty
    // ---- null checks against the null-count index ---------------------
    // type-agnostic: the null tally is recorded even for columns whose
    // VALUES the index can't bound (double, non-ASCII strings — the
    // boundless entries), so any attribute qualifies
    // nested leaves qualify too: the parquet leaf null count includes
    // rows whose PARENT struct is null (definition levels), exactly
    // matching `s.f IS NULL` semantics
    case IsNull(a: AttributeReference) =>
      Map(a.name -> Bounds(reqNull = true))
    case IsNotNull(a: AttributeReference) =>
      Map(a.name -> Bounds(reqNotNull = true))
    case IsNull(g: GetStructField) =>
      one(dotPath(g), Bounds(reqNull = true))
    case IsNotNull(g: GetStructField) =>
      one(dotPath(g), Bounds(reqNotNull = true))
    // ---- array leaves (X65): array_contains / exists ------------------
    // `array_contains(a, v)` is true only of a row holding an element
    // EQUAL to v — a file whose element [min,max] excludes v cannot
    // hold one. NULL search values never match (contains yields
    // null→false under a filter), so the literal gates are exact.
    // (map_keys/map_values spellings must precede the generic array
    // cases — elemPath can't see through MapKeys and the generic match
    // would swallow them with an empty extraction)
    case ArrayContains(MapKeys(m), v) if litLong(v).nonEmpty =>
      one(mapPath(m, "key", indexable), Bounds(litLong(v), litLong(v)))
    case ArrayContains(MapKeys(m), v) if litStr(v).nonEmpty =>
      one(mapPath(m, "key", _ == StringType),
        Bounds(lowerS = litStr(v), upperS = litStr(v)))
    case ArrayContains(MapValues(m), v) if litLong(v).nonEmpty =>
      one(mapPath(m, "value", indexable), Bounds(litLong(v), litLong(v)))
    case ArrayContains(MapValues(m), v) if litStr(v).nonEmpty =>
      one(mapPath(m, "value", _ == StringType),
        Bounds(lowerS = litStr(v), upperS = litStr(v)))
    case ArrayContains(a, v) if litLong(v).nonEmpty =>
      one(elemPath(a, indexable), Bounds(litLong(v), litLong(v)))
    case ArrayContains(a, v) if litStr(v).nonEmpty =>
      one(elemPath(a, _ == StringType),
        Bounds(lowerS = litStr(v), upperS = litStr(v)))
    // ---- map leaves (X69): key/value membership ----------------------
    // `map_contains_key(m, k)` (and its spelled-out twins over
    // map_keys/map_values) is true only of a row holding that KEY
    // (resp. a value) — total boolean functions, no ANSI error path,
    // so pruning a file can never suppress an error a full scan would
    // have raised. `m[k] = v` / element_at comparisons are NOT
    // extracted: under ANSI a missing key throws, and pruning the file
    // would swallow that error.
    case MapContainsKey(m, v) if litLong(v).nonEmpty =>
      one(mapPath(m, "key", indexable), Bounds(litLong(v), litLong(v)))
    case MapContainsKey(m, v) if litStr(v).nonEmpty =>
      one(mapPath(m, "key", _ == StringType),
        Bounds(lowerS = litStr(v), upperS = litStr(v)))
    // `exists(a, x -> p(x))`: true requires SOME element satisfying p —
    // rewrite the lambda variable as a synthetic attribute, reuse the
    // scalar extraction, and re-key its bounds under `<a>.element…`.
    // The element-entry overlap test ("can an element in range exist
    // here") is exactly the exists question, so every extracted shape
    // stays sound; conjuncts over OUTER columns inside the lambda must
    // hold on any row where exists is true and keep their own keys.
    // forall/aggregate have no such per-element witness and extract
    // nothing.
    case ae: ArrayExists =>
      // the element's index path: `a.element` for arrays, `m.key` /
      // `m.value` for exists over map_keys/map_values (the map sides
      // ARE the repeated leaves — same index entries, same semantics).
      // Element-type gating is deferred to the literal gates inside
      // the rewritten-lambda extraction, hence `ok = _ => true`.
      def containerRoot(e: Expression): Option[String] = e match {
        case MapKeys(m) => mapPath(m, "key", _ => true)
        case MapValues(m) => mapPath(m, "value", _ => true)
        case other => elemPath(other, _ => true)
      }
      (containerRoot(ae.argument), ae.function) match {
        case (Some(p), LambdaFunction(body, Seq(v: NamedLambdaVariable), _))
            // a real outer column literally named like the marker would
            // have its bounds re-keyed onto the element path after the
            // substitution below — bail out instead (ADVICE r7)
            if !body.exists {
              case a: AttributeReference => a.name == "__graft_elem__"
              case _ => false
            } =>
          val marker = "__graft_elem__"
          val rewritten = body.transform {
            case nv: NamedLambdaVariable if nv.exprId == v.exprId =>
              AttributeReference(marker, nv.dataType, nv.nullable)()
          }
          extract(rewritten).map {
            case (k, b) if k == marker => p -> b
            case (k, b) if k.startsWith(marker + ".") =>
              s"$p${k.stripPrefix(marker)}" -> b
            case kv => kv
          }
        case _ => Map.empty
      }
    // ---- prefix: col LIKE 'p%'  ==  [p, nextPrefix(p)) ----------------
    case StartsWith(a, v) if litStr(v).exists(_.nonEmpty) =>
      val p = litStr(v).get
      one(attrNameS(a),
        Bounds(lowerS = Some(p), upperS = nextPrefix(p), upperSStrict = true))
    // ---- fallback: a comparison against a NON-NULL literal is never
    // true of NULL, so it implies IS NOT NULL on its attribute side —
    // the only index a type without sound value bounds (double...)
    // has. Ordered after the specific cases, so extractable bounds
    // keep their tighter form; <=> is null-tolerant and excluded.
    case _: EqualNullSafe => Map.empty
    case cmp: BinaryComparison =>
      def nonNullLit(e: Expression): Boolean = e match {
        case Literal(v, _) => v != null
        case c: Cast if c.foldable => c.eval(null) != null
        case _ => false
      }
      val sides = Seq(cmp.left, cmp.right)
      if (sides.exists(nonNullLit))
        // casts unwrap soundly here: ANY cast of NULL is NULL, so a
        // true comparison still implies the underlying attr non-null
        sides.flatMap {
          case a: AttributeReference => Some(a.name)
          case g: GetStructField => dotPath(g)
          case Cast(a: AttributeReference, _, _, _) => Some(a.name)
          case Cast(g: GetStructField, _, _, _) => dotPath(g)
          case _ => None
        }.map(_ -> Bounds(reqNotNull = true)).toMap
      else Map.empty
    case _ => Map.empty // sound: unextractable conjuncts prune nothing
  }

  private def longOf(v: Any): Any = v match {
    case b: java.lang.Byte => b.longValue(): java.lang.Long
    case s: java.lang.Short => s.longValue(): java.lang.Long
    case o => o
  }

  /** The smallest ASCII string greater than every string with prefix
    * `p`: increment the last non-0x7F char, dropping any trailing
    * maximal chars first; all-maximal prefixes have no such bound. */
  private def nextPrefix(p: String): Option[String] = {
    val trimmed = p.reverse.dropWhile(_ == '\u007f').reverse
    if (trimmed.isEmpty) None
    else Some(trimmed.init + (trimmed.last + 1).toChar)
  }
}
