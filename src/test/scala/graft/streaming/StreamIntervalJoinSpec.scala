package graft.streaming

import graft.SparkSpec
import graft.table.IncrementalTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Pins the property q112's oracle can't see: with watermarks on both
  * sides, the stream-stream join's state is actually EVICTED as the
  * watermark advances (bounded by the horizon, not the stream length),
  * while the emitted pairs still equal the batch join exactly. */
class StreamIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val hourUs = 3600L * 1000000L

  /** One row per minute for `hours` hours, one parquet file per hour,
    * file mtimes strictly increasing in hour order so the file source
    * drains them as time-ordered micro-batches. */
  /** One row per minute for `hours` hours, one parquet file per hour
    * (written under the FINAL column names — the file source matches
    * its user schema by name), file mtimes strictly increasing in hour
    * order so the file source drains them as time-ordered
    * micro-batches. */
  private def writeHourly(dir: String, side: String, hours: Int,
      idCol: String, uidCol: String, tsCol: String): DataFrame = {
    val base = 1700000000L * 1000000L // fixed epoch micros
    val rows = for (h <- 0 until hours; m <- 0 until 60) yield (
      s"$side-$h-$m", (m % 5).toLong,
      new java.sql.Timestamp((base + h * hourUs + m * 60L * 1000000L) / 1000L))
    val df = rows.toDF(idCol, uidCol, tsCol)
    (0 until hours).foreach { h =>
      df.filter(col(tsCol).cast("long").between(
          base / 1000000L + h * 3600L, base / 1000000L + (h + 1) * 3600L - 1))
        .coalesce(1).write.parquet(s"$dir/h=$h")
      // pin the drain order: mtime ties would let a later hour drain
      // first and make its predecessor late (the q109 ADVICE hazard)
      new java.io.File(s"$dir/h=$h").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(_.setLastModified(1000000000000L + h * 60000L))
    }
    df
  }

  test("watermarked interval join: state evicted, result equals batch join") {
    val root = tmpDir("sij")
    val hours = 6
    val clicks = writeHourly(s"$root/clicks", "c", hours,
      "click_id", "c_user", "cts")
    val errors = writeHourly(s"$root/errors", "e", hours,
      "error_id", "e_user", "ets")
    def src(path: String, schema: org.apache.spark.sql.types.StructType) =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true").parquet(path)
    val cond = col("c_user") === col("e_user") &&
      col("cts") >= col("ets") &&
      col("cts") <= col("ets") + expr("interval 5 minutes")

    val t = IncrementalTable(spark, s"$root/pairs/v1")
    val join = new StreamIntervalJoin(t, s"$root/ckpt", "2 minutes")
    val q = join.start(
      src(s"$root/clicks", clicks.schema), "cts",
      src(s"$root/errors", errors.schema), "ets", cond)
    q.awaitTermination()
    q.recentProgress.foreach(p => info(s"batch=${p.batchId} in=${p.numInputRows} " +
      s"state=${p.stateOperators.toSeq.map(s => (s.numRowsTotal, s.numRowsRemoved))} " +
      s"wm=${p.eventTime}"))
    info(s"commits=${t.commits().map(c => (c.version, c.action, c.add.size))}")

    // 1) exactness: time-ordered arrivals → lossless eviction → the
    //    sink equals the batch join
    val got = t.read().select("click_id", "error_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val want = clicks.join(errors, cond).select("click_id", "error_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)

    // 2) bounded state: eviction actually removed rows, and the state
    //    never approached "every row ever seen"
    val stateProgress = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq)
    val removed = stateProgress.map(_.numRowsRemoved).sum
    val maxState = stateProgress.map(_.numRowsTotal).max
    val totalInput = hours * 60 * 2
    assert(removed > 0, s"no join state was ever evicted ($stateProgress)")
    assert(maxState < totalInput / 2,
      s"state $maxState not bounded vs $totalInput inputs")
  }
}
