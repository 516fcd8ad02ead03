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
    * range: `(v - lo)` shifted so the range FILLS the 16-bit bucket
    * space — right for wide ranges (BigInt bit-length, overflow-safe,
    * no floating-point precision cliff), LEFT for narrow ones. The
    * up-shift matters when dimensions differ in magnitude: without it
    * a 0..400 column occupies only the low 9 interleaved bits and the
    * wider dimension dominates every file split, so the narrow column
    * never prunes. Pure integral ops either way. */
  def bucket(v: Column, lo: Long, hi: Long): Column = {
    val range = BigInt(hi) - BigInt(lo)
    val s = range.bitLength - 16
    val off = v.cast("long") - lit(lo)
    if (s >= 0) shiftright(off, s) else shiftleft(off, (-s) min 15)
  }

  /** Equi-width 16-bit bucket id of a DOUBLE/FLOAT column over the
    * slice's [lo, hi] — double z-dimensions (X89; price/score columns
    * are the classic range-predicate targets). LAYOUT-only like the
    * string proxy: fp rounding can only blur which bucket a boundary
    * row lands in, never pruning soundness (that stays with the X75
    * double footer bounds). NaNs cluster in the top bucket (they sort
    * above everything in Spark's double order). */
  def bucketDouble(v: Column, lo: Double, hi: Double): Column =
    if (!(hi > lo)) lit(0L)
    else when(isnan(v), lit(65535L)).otherwise(
      least(greatest(
        floor((v - lit(lo)) / lit((hi - lo) / 65535.0)).cast("long"),
        lit(0L)), lit(65535L)))

  /** Order-preserving long proxy of a STRING column: the first 8
    * characters' code points, clamped to a byte, packed big-endian
    * (shorter strings zero-pad, so prefixes sort first). Exactly
    * lexicographic on ASCII — the same domain the skipping index's
    * string bounds are sound on; beyond ASCII the clamp only coarsens
    * LAYOUT locality, never correctness (pruning still uses the real
    * footer min/max, which drop non-ASCII entries). Eight
    * least/ascii/shift terms — codegen-friendly, no UDF. */
  def packAscii8(c: Column): Column =
    (1 to 8).map { k =>
      shiftleft(least(ascii(substring(c, k, 1)), lit(255)).cast("long"),
        8 * (8 - k))
    }.reduce(_.bitwiseOR(_))
}
