package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.table.IncrementalTable

/** Custom-state streaming sessionization (flatMapGroupsWithState):
  * gap-split within a batch, continuation ACROSS batches (same
  * session_id, extended aggregates), and exactly-once replay through
  * the MERGE-upsert sink. */
class StreamSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 3, 26, 0, min, 0))
  private def us(min: Int): Long = ts(min).getTime * 1000

  private def snapshot(t: IncrementalTable): Set[(Long, Long, Long, Long, Long)] =
    t.read().select($"user_id", $"session_id", $"n_events",
      $"start_us", $"end_us").as[(Long, Long, Long, Long, Long)].collect().toSet

  test("gap splits, cross-batch continuation, exactly-once replay") {
    val root = tmpDir("ssess")
    val table = IncrementalTable(spark, s"$root/t")
    val sink = new StreamSessions(table, s"$root/ckpt",
      gapUs = 10L * 60 * 1000000) // 10-minute gap

    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Timestamp, Double)]
    val events = ms.toDF().toDF("user_id", "event_id", "ts", "value")

    // batch 1, user 7: events at 00:00, 00:05 (one session), then 00:20
    // (gap > 10 min -> second session opens)
    ms.addData((7L, 1L, ts(0), 1.5), (7L, 2L, ts(5), 2.0), (7L, 3L, ts(20), 4.0))
    sink.start(events).awaitTermination()
    assert(snapshot(table) == Set(
      (7L, 1L, 2L, us(0), us(5)),
      (7L, 2L, 1L, us(20), us(20))))

    // batch 2: 00:25 continues session 2 (same start, extended end);
    // 00:50 opens session 3; a second user starts independently
    ms.addData((7L, 4L, ts(25), 1.0), (7L, 5L, ts(50), 8.0), (9L, 6L, ts(30), 3.0))
    sink.start(events).awaitTermination()
    assert(snapshot(table) == Set(
      (7L, 1L, 2L, us(0), us(5)),
      (7L, 2L, 2L, us(20), us(25)),
      (7L, 3L, 1L, us(50), us(50)),
      (9L, 1L, 1L, us(30), us(30))))

    // exact decimal sum survives the scaled-long state
    val sums = sink.sessions().select($"user_id", $"session_id", $"sum_value")
      .as[(Long, Long, Double)].collect().map { case (u, s, v) => ((u, s), v) }.toMap
    assert(sums((7L, 2L)) == 5.0) // 4.0 + 1.0

    // crash-replay contract: re-delivering a batch with its original
    // batchId is a no-op through the merge guard
    val lastBatch = table.commits().flatMap(_.batchId).max
    val fake = Seq((7L, 99L, 1L, us(0), us(0), 123L))
      .toDF("user_id", "session_id", "n_events", "start_us", "end_us", "sum_vmic")
    sink.commitBatch(fake, lastBatch)
    assert(snapshot(table).contains((7L, 1L, 2L, us(0), us(5))))

    // but a new batchId merges: the (7, us(0)) key is overwritten
    sink.commitBatch(fake, lastBatch + 100)
    assert(snapshot(table).contains((7L, 99L, 1L, us(0), us(0))))
  }
}
