package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 64-permutation MinHash signature:
  * `minhash_agg(h1: long, h2: long) -> array<long>` — permutation i's
  * hash is the 2-universal `h1 + i*h2` (Carter-Wegman; Broder's
  * original MinHash construction), so each row computes TWO string
  * hashes plus 64 multiply-adds instead of 64 independent seeded
  * xxhash64 passes over the shingle bytes, and the whole signature
  * lives in one `long[64]` buffer instead of 64 aggregate columns
  * (past 50 buffer slots HashAggregate drops its vectorized fast map).
  * Signed-wrap arithmetic is deterministic and identical on both join
  * sides, which is all banding needs. */
case class MinHashAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires (long, long), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(64)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v1 = left.eval(input)
    val v2 = right.eval(input)
    if (v1 != null && v2 != null) {
      val h1 = v1.asInstanceOf[Long]
      val h2 = v2.asInstanceOf[Long]
      var i = 0
      var h = h1
      while (i < 64) {
        if (h < buf(i)) buf(i) = h
        h += h2 // h1 + i*h2, incrementally
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    var i = 0
    while (i < 64) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](64)
    var i = 0
    while (i < 64) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashAgg =
    copy(left = newLeft, right = newRight)
}
