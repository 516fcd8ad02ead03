package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The catalog-level `bucket(n, col)` function (X96): Spark resolves a
  * scan-reported `bucket` transform through the table catalog's
  * `FunctionCatalog` when checking storage-partitioned-join
  * compatibility — without it, KeyGroupedPartitioning over bucketed
  * tables cannot be translated and SPJ silently disarms. The bound
  * semantics MUST equal the write-path router
  * ([[graft.table.PartitionTransform.Bucket]]): `floorMod(murmur3(col,
  * seed 42), n)` — the same function Spark's own `hash()` computes, so
  * the dir a row was routed to at write time IS the value this
  * function produces at plan time. */
private[sources] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): floorMod(murmur3(col, seed 42), n) — the graft " +
      "hidden-partitioning router, exposed for storage-partitioned joins"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.simpleString}")
    val dt = inputType.fields(1).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def produceResult(input: InternalRow): Integer =
        if (input.isNullAt(1)) null
        else {
          val n = input.getInt(0)
          val h = Murmur3HashFunction.hash(input.get(1, dt), dt, 42L).toInt
          Integer.valueOf(Math.floorMod(h, n))
        }
    }
  }
}
