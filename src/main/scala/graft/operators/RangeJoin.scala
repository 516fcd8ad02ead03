package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match each point row to every interval row of
  * the same key group with `start <= point <= end`. Spark plans a raw
  * inequality join as a nested loop (every point × every interval per
  * key), which is quadratic in the hot keys; this operator makes it an
  * EQUI-join by time bucketing, the same trick engines with native
  * range joins (DuckDB IEJoin, Databricks range-join hints) apply:
  *
  *   1. a point lives in exactly ONE bucket: `floor(t / W)`;
  *   2. an interval explodes to the buckets it covers,
  *      `floor(start/W) .. floor(end/W)` — bounded fan-out when `W` is
  *      chosen near the typical interval length;
  *   3. hash equi-join on (keys, bucket), then the exact
  *      `start <= t <= end` filter.
  *
  * Because the point's single bucket is also one of the interval's
  * buckets, every qualifying pair meets exactly once — no dedup pass,
  * no candidate blowup beyond the fan-out factor. Cost: one shuffle of
  * points + one of the exploded intervals (≈ len/W + 1 rows each),
  * codegen end-to-end.
  *
  * `pointCol`/`startCol`/`endCol` are integral (e.g. epoch micros).
  * Column-name collisions between the two frames are the caller's to
  * resolve (alias before joining), like any Spark join. */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(keys.nonEmpty, "pointInInterval needs key columns")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bucket",
      floor(col(pointCol) / lit(bucketWidth)).cast("long"))
    val i = intervals.withColumn("_bucket", explode(sequence(
      floor(col(startCol) / lit(bucketWidth)).cast("long"),
      floor(col(endCol) / lit(bucketWidth)).cast("long"))))
    p.join(i, (keys :+ "_bucket").toSeq)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bucket")
  }
}
