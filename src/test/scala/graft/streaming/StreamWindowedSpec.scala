package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.table.IncrementalTable

/** Streaming windowed counts into a commit-log table via dynamic
  * partition replace: updates overwrite their own (window, key)
  * partition, late-but-in-watermark data revises a window without
  * duplicating it, and micro-batch replays are no-ops. */
class StreamWindowedSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = // fixed base instant, UTC session
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 3, 26, 0, min, 0))

  // expected epoch-seconds window start (10-min tumbling aligns to epoch),
  // derived from the same Timestamp the event carries — TZ-robust
  private def win(min: Int): Long = ts(min).getTime / 1000 / 600 * 600

  private def snapshot(table: IncrementalTable): Set[(Long, String, Long)] =
    table.read().select($"window_start", $"event_type", $"n_events")
      .as[(Long, String, Long)].collect().toSet

  test("windowed upsert sink: per-group replace, late revision, exactly-once replay") {
    val root = tmpDir("swin")
    val table = IncrementalTable(spark, s"$root/t")
    val sink = new StreamWindowedCounts(table, s"$root/ckpt",
      windowDuration = "10 minutes", watermarkDelay = "5 minutes")

    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val events = ms.toDF().toDF("ts", "event_type")

    // windows: [00:00,00:10) gets a×3 + b×1; [00:10,00:20) gets a×2
    ms.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "a"), (ts(2), "b"),
      (ts(12), "a"), (ts(13), "a"))
    sink.start(events).awaitTermination()
    assert(snapshot(table) == Set(
      (win(1), "a", 3L),
      (win(2), "b", 1L),
      (win(12), "a", 2L)))

    // late event for the 00:00 window, inside the 5-min watermark
    // (max event time 00:13 -> watermark 00:08 < window end 00:10):
    // its group is re-emitted and REPLACES the old row; the other
    // groups' partitions are untouched
    ms.addData((ts(4), "a"))
    sink.start(events).awaitTermination()
    assert(snapshot(table) == Set(
      (win(1), "a", 4L),
      (win(2), "b", 1L),
      (win(12), "a", 2L)))

    // crash-replay contract: re-delivering the last batch with its
    // original batchId must be a no-op (single multi-partition commit)
    val lastBatch = table.commits().flatMap(_.batchId).max
    val fake = Seq((win(1), "a", 999L), (win(12), "a", 999L))
      .toDF("window_start", "event_type", "n_events")
    sink.commitBatch(fake, lastBatch)
    assert(snapshot(table).contains((win(1), "a", 4L)))

    // but a genuinely new batch replaces exactly its touched partitions
    sink.commitBatch(fake, lastBatch + 100)
    assert(snapshot(table) == Set(
      (win(1), "a", 999L),
      (win(2), "b", 1L),
      (win(12), "a", 999L)))
  }
}
