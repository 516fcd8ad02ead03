package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bit-level primitives shared by the bloom WRITE side ([[BloomAgg]],
  * the per-file harvest aggregate) and the READ side
  * ([[BloomMightContainAny]], the planning-time file-prune predicate).
  *
  * One self-contained format — `[k: int32][m: int64][words: int64 * m/64]`,
  * all big-endian — so the prune never deserializes a filter object per
  * row: membership reads k single bytes straight out of the binary
  * column. Hashing is Kirsch-Mitzenmacher double hashing
  * (`h_i = h1 + i*h2 mod m`) over two seeded xxhash64 passes, the
  * standard construction (two hashes buy k positions with no loss in
  * asymptotic false-positive rate). Both sides hash through Spark's own
  * [[XxHash64Function]] on internal types, so write-time and query-time
  * hashes agree BY CONSTRUCTION: integral columns are cast to long
  * before the aggregate ever sees them, and the query side hashes the
  * extracted long points; strings hash their UTF-8 bytes on both sides
  * (no ASCII restriction — unlike the [min,max] index, hashes carry no
  * ordering assumption). */
object BloomBits {
  val HeaderBytes = 12
  private val Seed1 = 0x9E3779B97F4A7C15L
  private val Seed2 = 0xC2B2AE3D27D4EB4FL

  /** Bloom geometry for `numItems` expected distinct values at
    * false-positive rate `fpp`: the textbook m = -n ln p / (ln 2)^2
    * (rounded up to whole 64-bit words), k = m/n ln 2. */
  def geometry(numItems: Long, fpp: Double): (Long, Int) = {
    require(numItems > 0 && fpp > 0 && fpp < 1,
      s"bloom geometry needs numItems > 0 and 0 < fpp < 1 (got $numItems, $fpp)")
    val ln2 = math.log(2)
    val m0 = math.ceil(-numItems * math.log(fpp) / (ln2 * ln2)).toLong
    val m = ((m0 + 63) / 64) * 64
    val k = math.max(1, math.round(m.toDouble / numItems * ln2).toInt)
    (m, k)
  }

  def hash1(v: Any, dt: DataType): Long = XxHash64Function.hash(v, dt, Seed1)
  def hash2(v: Any, dt: DataType): Long = XxHash64Function.hash(v, dt, Seed2)

  /** Query-side hash pair of an integral point (the aggregate casts
    * every integral column to long, so long hashing is the one shape). */
  def hashLong(v: Long): (Long, Long) =
    (XxHash64Function.hash(v, LongType, Seed1),
      XxHash64Function.hash(v, LongType, Seed2))

  /** Query-side hash pair of a string point (UTF-8 bytes, any content). */
  def hashString(s: String): (Long, Long) = {
    val u = UTF8String.fromString(s)
    (XxHash64Function.hash(u, StringType, Seed1),
      XxHash64Function.hash(u, StringType, Seed2))
  }

  def setBit(words: Array[Long], pos: Long): Unit =
    words((pos >>> 6).toInt) |= 1L << (pos & 63)

  /** Serialize `(k, words)` to the wire format above. */
  def serialize(k: Int, words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(HeaderBytes + words.length * 8)
    bb.putInt(k)
    bb.putLong(words.length.toLong * 64)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  /** Test one (h1, h2) pair against serialized bits — k single-byte
    * reads, no allocation. Big-endian words: bit b of word w lives in
    * byte `HeaderBytes + w*8 + (7 - b/8)`, bit `b % 8`. */
  def mightContain(bytes: Array[Byte], h1: Long, h2: Long): Boolean = {
    val bb = ByteBuffer.wrap(bytes, 0, HeaderBytes)
    val k = bb.getInt
    val m = bb.getLong
    var i = 0
    var h = h1
    while (i < k) {
      val pos = (h & Long.MaxValue) % m
      val w = (pos >>> 6).toInt
      val b = (pos & 63).toInt
      val byte = bytes(HeaderBytes + w * 8 + (7 - (b >>> 3)))
      if (((byte >> (b & 7)) & 1) == 0) return false
      h += h2
      i += 1
    }
    true
  }

  /** Does the filter possibly contain ANY of the points? `pairs` is
    * flat `[h1, h2, h1, h2, …]` (an IN list's disjunction: the file
    * can be pruned only when EVERY member misses). Called from both
    * interpreted eval and generated code. */
  def mightContainAny(bytes: Array[Byte], pairs: Array[Long]): Boolean = {
    var i = 0
    while (i < pairs.length) {
      if (mightContain(bytes, pairs(i), pairs(i + 1))) return true
      i += 2
    }
    false
  }
}

/** Per-group bloom filter aggregate: `BloomAgg(child, numItems, fpp)`
  * over a LONG or STRING child yields the serialized [[BloomBits]]
  * filter of the group's non-null values. Backs the per-FILE bloom
  * index harvest ([[graft.table.IncrementalTable]] `graft.bloomIndexColumns`):
  * one column-pruned job groups the staged rows by file and folds each
  * file's key values into one filter — partial aggregation merges
  * split-local filters with a word-wise OR, so a multi-split file
  * shuffles a handful of filter buffers, never its rows. */
case class BloomAgg(
    child: Expression,
    numItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val (m, k) = BloomBits.geometry(numItems, fpp)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a long or string child (cast integrals to " +
        s"long first), got ${dt.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((m / 64).toInt)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h1 = BloomBits.hash1(v, child.dataType)
      val h2 = BloomBits.hash2(v, child.dataType)
      var i = 0
      var h = h1
      while (i < k) {
        BloomBits.setBit(buf, (h & Long.MaxValue) % m)
        h += h2
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = BloomBits.serialize(k, buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** Planning-time prune predicate: does the serialized filter in `child`
  * possibly contain any of the pre-hashed points? The hash pairs are
  * baked into the node at plan time (the query's equality/IN literals,
  * hashed once on the driver), so per row it is k byte-probes per pair
  * against the binary column — it runs over the bloom-index SIDECAR
  * rows (one per file×column, metadata plane), never over data.
  * Codegen delegates to the static [[BloomBits]] helper. */
case class BloomMightContainAny(child: Expression, pairs: Array[Long])
    extends UnaryExpression {

  require(pairs.length % 2 == 0, "pairs is flat [h1, h2, …]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_any requires binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_any"

  override protected def nullSafeEval(bytes: Any): Any =
    BloomBits.mightContainAny(bytes.asInstanceOf[Array[Byte]], pairs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pairs", pairs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomBits.mightContainAny($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainAny =
    copy(child = newChild)
}
