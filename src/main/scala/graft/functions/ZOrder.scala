package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve helpers for multi-dimensional clustering —
  * the layout behind multi-column data skipping (Delta/Iceberg
  * OPTIMIZE ZORDER BY): sort rows by the interleaved bits of several
  * columns and nearby rows are near in EVERY dimension, so per-file
  * [min,max] stats form tight boxes and a range predicate on ANY of
  * the z-columns prunes files. Lexicographic `clusterBy` gives perfect
  * pruning on the leading column and none on the others; z-order
  * trades a little leading-column locality for pruning on all of them.
  *
  * The interleave is the textbook mask-spread (each step doubles the
  * gap between a value's bits): five shift/and/or steps per column,
  * all codegen'd built-ins — no per-bit expression fan-out (32+
  * inlined terms is the Janino blow-up zone the LSH work mapped), no
  * UDF, works at any row count. */
object ZOrder {

  /** Spread the low 16 bits of `c` so consecutive bits land 2 apart
    * (0b1111 -> 0b01010101). */
  private def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of 16-bit bucket ids (2..4 dims; 64/ndim bits used). */
  def interleave(buckets: Seq[Column]): Column = {
    require(buckets.size >= 2 && buckets.size <= 4,
      s"z-order needs 2..4 columns, got ${buckets.size}")
    buckets.zipWithIndex.map { case (b, i) =>
      val w = buckets.size match {
        case 2 => spread16(b)
        case n => spreadN(b, n)
      }
      shiftleft(w, i)
    }.reduce(_.bitwiseOR(_))
  }

  /** General stride spread for 3-4 dims over the low 64/n bits —
    * built per-bit but bounded (≤16 terms), beneath the codegen
    * blow-up threshold. */
  private def spreadN(c: Column, n: Int): Column = {
    val bits = 64 / n min 16
    (0 until bits).map { i =>
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n)
    }.reduce(_.bitwiseOR(_))
  }

  /** Equi-width 16-bit bucket id of `v` over the committed [lo, hi]
    * range: `(v - lo) >> s` with the shift chosen driver-side (BigInt,
    * overflow-safe) so the result fits 16 bits — pure integral ops,
    * no floating-point precision cliff at large magnitudes. */
  def bucket(v: Column, lo: Long, hi: Long): Column = {
    val range = BigInt(hi) - BigInt(lo)
    val s = 0 max (range.bitLength - 16)
    shiftright(v.cast("long") - lit(lo), s)
  }
}
