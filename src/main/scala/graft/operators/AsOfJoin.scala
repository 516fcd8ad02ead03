package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the single right
  * row of the same key group with the greatest `rightTime` <=
  * `leftTime` — "the price in effect at order time", "the latest
  * sensor reading before the event". Spark has no built-in operator
  * for this (DuckDB ships `ASOF JOIN`; Flink calls it a temporal
  * join), and the naive formulations fall over at scale: an
  * inequality join degenerates to a per-row range probe (O(n·m)
  * nested loop), and the groupBy-then-max-per-left shape shuffles a
  * candidate row per (left, earlier-right) PAIR.
  *
  * This implementation is the sort-merge carry-forward shape — the one
  * that survives 100 TB:
  *
  *   1. tag both sides and union them (right payload boxed in one
  *      struct column, absent left columns null-filled);
  *   2. ONE hash shuffle on `keys`, sort within each key group by
  *      (time, side) — right-before-left on ties, so an exactly-
  *      simultaneous right row counts as "at or before";
  *   3. running `last(_r, ignoreNulls)` over rows-unbounded-preceding
  *      carries the latest right payload forward; every left row then
  *      reads its as-of match from the carry.
  *
  * Cost: one shuffle of left+right, one sort — identical to a plain
  * sort-merge join of the two inputs, independent of time-range
  * density. Rows with no prior right match carry null (left-outer
  * semantics; filter for inner). Output is left's columns plus the
  * right's non-key columns, `right_`-prefixed on name collision.
  *
  * Determinism: make (keys, rightTime) unique on the right (pre-
  * aggregate duplicates) — with ties the carried payload would depend
  * on sort order. Skew: a pathologically hot key serializes through
  * one reducer's sort; shard such keys by a coarse time bucket and
  * as-of join per bucket with boundary carry-in if that ever binds. */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    require(keys.nonEmpty, "asOf needs key columns")
    require(left.columns.contains(leftTime), s"left lacks time column '$leftTime'")
    require(right.columns.contains(rightTime), s"right lacks time column '$rightTime'")

    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val outName = payloadCols.map(c =>
      c -> (if (left.columns.contains(c)) s"right_$c" else c)).toMap
    val payloadStruct = struct(payloadCols.map(c => col(c).as(outName(c))): _*)
    val payloadType = right.select(payloadStruct).schema.fields.head.dataType

    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(payloadType))
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_r", payloadStruct)
      .select((keys ++ Seq("_t", "_side", "_r")).map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(col).toSeq ++
        payloadCols.map(c => col(s"_match.${outName(c)}").as(outName(c))): _*)
  }
}
