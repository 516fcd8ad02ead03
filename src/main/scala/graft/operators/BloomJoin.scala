package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered joins — the manual form of Spark's runtime
  * row-level filtering, for the cases the optimizer rule can't see
  * (a small side computed by this library, a join hidden behind a
  * table boundary, a stream-side prune).
  *
  * Shape: hash the small side's keys through `xxhash64` into a bloom
  * filter (one aggregation, sketch size KBs-MBs regardless of row
  * count), then filter the BIG side with the codegen'd
  * `might_contain` BEFORE its shuffle — at 100 TB the win is that
  * non-matching rows (often >90% for selective dims) never leave the
  * scan stage, so the join's exchange moves a fraction of the bytes.
  * The bloom admits false positives, so the exact join still runs;
  * results are identical by construction.
  *
  * `might_contain` (catalyst's BloomFilterMightContain) is registered
  * by [[graft.GraftExtensions]]; the sketch ships as a binary literal
  * (same contract as the optimizer's injected filter: constant or
  * scalar subquery). Bloom build and probe both hash `xxhash64(key)`
  * to longs, the spark-sketch putLong/mightContainLong pair. */
object BloomJoin {

  /** Filter `big` to rows whose `key` might be in `small`'s key set.
    * False positives pass (bounded by `fpp`); false negatives cannot
    * happen, so composing with an exact join loses nothing. */
  def prefilter(big: DataFrame, bigKey: Column,
      small: DataFrame, smallKey: Column,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val hashed = small.select(xxhash64(smallKey).as("_graft_h"))
    // the emptiness probe is LOAD-BEARING: Spark's stat.bloomFilter
    // NPEs on a zero-row frame (BloomFilterAggregate yields null).
    // isEmpty is a limit-1 short-circuit, not a second full scan.
    if (hashed.isEmpty) big.limit(0)
    else {
      val bloom = hashed.stat.bloomFilter("_graft_h", expectedItems, fpp)
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      big.filter(call_function("might_contain",
        lit(out.toByteArray), xxhash64(bigKey)))
    }
  }

  /** Semi join with the bloom prune applied below the exchange: equals
    * `big.join(small, bigKey === smallKey, "left_semi")` row-for-row. */
  def semiJoin(big: DataFrame, bigKey: Column,
      small: DataFrame, smallKey: Column,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame =
    prefilter(big, bigKey, small, smallKey, expectedItems, fpp)
      .join(small.select(smallKey.as("_graft_k")).distinct(),
        bigKey === col("_graft_k"), "left_semi")
}
