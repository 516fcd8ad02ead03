package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.table.IncrementalTable

/** Watermarked stream-stream interval join into an [[IncrementalTable]]
  * sink — the PRODUCTION shape of the engine-native join q110
  * demonstrates unwatermarked.
  *
  * Both inputs carry an event-time watermark of `watermarkDelay`; with
  * the time-range `condition` (e.g. `lts between rts and rts + 1h`)
  * Structured Streaming derives per-side state retention bounds and
  * EVICTS join state as the watermark advances — state is
  * O(rows inside the watermark horizon), never O(stream length), which
  * is the property that lets the join run forever at 100 TB/day where
  * the unwatermarked variant would accrete every row it has ever seen.
  * StreamIntervalJoinSpec pins the eviction (StreamingQueryProgress
  * `numRowsTotal` drops below the cumulative input) and result
  * equality with the batch join.
  *
  * Semantics contract: an inner join's pairs emit eagerly, exactly once
  * each, out of the join state machinery; input rows older than the
  * current watermark are DROPPED (that is the deal production makes:
  * bounded state for bounded lateness). When each side's arrivals are
  * event-time ordered across micro-batches — the same cross-batch
  * contract [[StreamSessions]] documents — nothing is ever late, no
  * valid pair is lost (Spark only evicts state that can no longer match
  * any above-watermark input under `condition`), and the final sink
  * equals the batch join exactly: that equality is q112's oracle.
  *
  * Sink: append-only commits under the (appId, batchId) replay guard —
  * a crash replay of a committed micro-batch short-circuits at the log,
  * same exactly-once contract as every other streaming sink here. */
final class StreamIntervalJoin(sink: IncrementalTable, checkpointDir: String,
    watermarkDelay: String) {

  def start(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String, condition: Column): StreamingQuery = {
    val appId = CheckpointId(left.sparkSession, checkpointDir)
    left.withWatermark(leftTs, watermarkDelay)
      .join(right.withWatermark(rightTs, watermarkDelay), condition)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink.append(batch, partitionBy = Nil,
          batchId = Some(id), appId = Some(appId))
        ()
      }.start()
  }
}
