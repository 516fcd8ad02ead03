package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.table.IncrementalTable

/** Streaming windowed aggregation into an [[IncrementalTable]] — the
  * streaming-lakehouse "upsert" pattern without a MERGE primitive:
  *
  *  - event-time tumbling windows with a watermark bound the state;
  *  - `update` output mode re-emits a (window, key) group whenever a
  *    micro-batch changes it — including in-watermark late data;
  *  - the sink partitions the table by exactly the group key
  *    `(window_start, event_type)` and commits each micro-batch with
  *    [[IncrementalTable.dynamicReplace]]: the partitions present in
  *    the batch are replaced, all others untouched. Replacement
  *    granularity == re-emission granularity, so a group's partition
  *    always holds its single latest row — no duplicates, no lost
  *    updates.
  *
  * Exactly-once: one dynamicReplace commit per micro-batch, guarded by
  * (appId = checkpoint dir, batchId) like [[StreamIngest]]; a replayed
  * batch after a crash is a no-op even though it would touch multiple
  * window partitions (single-commit multi-partition replace — a loop of
  * per-partition replaceWhere would break the guard after the first).
  *
  * Scale: state size is O(open windows × keys) thanks to the watermark;
  * each micro-batch shuffles only its own groups. The partition layout
  * requires the group key to be directory-safe and low-cardinality per
  * window (here: event_type); for high-cardinality keys, widen the
  * partition to a hash bucket of the key and let readers filter — the
  * replacement unit must always CONTAIN the re-emission unit.
  * Alternative for close-once semantics: `append` output mode emits each
  * window exactly once after the watermark closes it, and a plain
  * `append` commit suffices (no replaces, but results arrive late by the
  * watermark delay).
  */
final class StreamWindowedCounts(
    table: IncrementalTable,
    checkpointDir: String,
    windowDuration: String = "10 minutes",
    watermarkDelay: String = "5 minutes") {

  /** Windowed count aggregation over `(ts, event_type)` rows. The
    * window start becomes a directory-safe partition string. */
  private[streaming] def transform(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        // Epoch seconds: the partition value must distinguish every
        // window the duration can produce AND be stable across session
        // time zones — a date_format rendering depends on
        // spark.sql.session.timeZone, where a DST fall-back hour maps
        // two distinct windows to one partition string (dynamicReplace
        // would then wipe a sibling window), and a TZ change across
        // restarts renames every partition. A timestamp→long cast is
        // TZ-free, second-granular, and directory-safe.
        col("window.start").cast("long").as("window_start"),
        col("event_type"),
        col("n_events"))

  /** Idempotent micro-batch commit (exposed for replay tests). */
  private[streaming] def commitBatch(batch: DataFrame, batchId: Long): Unit = {
    table.dynamicReplace(batch, partitionBy = Seq("window_start", "event_type"),
      batchId = Some(batchId),
      appId = Some(CheckpointId(batch.sparkSession, checkpointDir)))
    ()
  }

  /** Start the stream over `events` (must have `ts: timestamp` and
    * `event_type: string`). `availableNow = true` drains and stops. */
  def start(events: DataFrame, availableNow: Boolean = true): StreamingQuery =
    transform(events).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(if (availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime("10 seconds"))
      .foreachBatch { (batch: DataFrame, id: Long) => commitBatch(batch, id) }
      .start()
}
