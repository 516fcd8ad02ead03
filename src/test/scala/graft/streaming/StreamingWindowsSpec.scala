package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.SparkSpec

/** Structured-Streaming analytics coverage: event-time tumbling and
  * sliding windows with watermark-driven late-data drop, gap-based
  * session windows, and custom per-key state via mapGroupsWithState /
  * flatMapGroupsWithState — the streaming counterparts of q13 (time
  * bucketing) and q33 (sessionization).
  */
class StreamingWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-26 10:$minute%02d:00")
  private def ts11(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-26 11:$minute%02d:00")

  test("tumbling event-time windows drop data later than the watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = in.toDF().toDF("ts", "key", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"key")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    val q = agg.writeStream.format("memory").queryName("win")
      .outputMode(OutputMode.Append()).start()

    // batch 1: two windows' worth of events, watermark advances to 10:30
    in.addData((ts(1), "a", 1.0), (ts(3), "a", 2.0), (ts(7), "a", 4.0), (ts(40), "a", 8.0))
    q.processAllAvailable()
    // batch 2: a late event at 10:02 — 28 min behind the 10:40 max, past
    // the 10-minute allowed lateness -> silently dropped; plus an on-time
    // event keeping the stream moving
    in.addData((ts(2), "a", 100.0), (ts(55), "a", 16.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win")
      .select(col("window.start").cast("string"), $"n", $"sv")
      .as[(String, Long, Double)].collect()
      .map { case (w, n, sv) => w -> ((n, sv)) }.toMap
    // the 10:00 window emitted once the watermark passed; the late 100.0
    // never entered it
    assert(rows("2024-03-26 10:00:00") == ((2L, 3.0)))
    assert(rows("2024-03-26 10:05:00") == ((1L, 4.0)))
    assert(!rows.values.exists(_._2 == 103.0))
  }

  test("streaming dedup: dropDuplicatesWithinWatermark keeps first, state expires") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    // exactly-once-per-id within the watermark horizon: the streaming
    // twin of q21 exact dedup — state is BOUNDED by the watermark
    // (ids older than max(ts) - 10min are forgotten), which is what
    // makes dedup runnable forever at scale, unlike dropDuplicates'
    // unbounded state
    val deduped = in.toDF().toDF("ts", "id", "v")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()

    in.addData((ts(1), "a", 1.0), (ts(2), "a", 2.0), (ts(3), "b", 3.0))
    q.processAllAvailable()
    // same-batch and cross-batch duplicates of a live id are dropped
    in.addData((ts(4), "a", 4.0), (ts(5), "b", 5.0), (ts(6), "c", 6.0))
    q.processAllAvailable()
    // advance the watermark far past a's last occurrence: its state
    // expires, so a re-arrival is treated as new (bounded-state contract)
    in.addData((ts11(30), "x", 7.0))
    q.processAllAvailable()
    in.addData((ts11(31), "a", 8.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("dedup").select($"id", $"v")
      .as[(String, Double)].collect().toSeq
    assert(rows.count(_._1 == "a") == 2) // once live, once after expiry
    assert(rows.contains(("a", 1.0)) && rows.contains(("a", 8.0)))
    assert(rows.count(_._1 == "b") == 1 && rows.contains(("b", 3.0)))
    assert(rows.count(_._1 == "c") == 1)
  }

  test("session windows close after the gap (streaming twin of q33)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "user")
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window($"ts", "10 minutes").as("sw"), $"user")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()

    // one burst (3 events inside 10-min gaps), silence, then a second
    // burst far enough ahead to close and emit the first session
    in.addData((ts(0), "u"), (ts(4), "u"), (ts(8), "u"))
    q.processAllAvailable()
    in.addData((ts(45), "u"))
    q.processAllAvailable()
    in.addData((ts11(30), "u")) // advance watermark past session 2's close (10:55)
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sess")
      .select(col("sw.start").cast("string"), $"n").as[(String, Long)]
      .collect().toMap
    assert(sessions("2024-03-26 10:00:00") == 3L) // merged burst
    assert(sessions("2024-03-26 10:45:00") == 1L)
  }

  test("sliding windows assign each event to every overlapping window") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val agg = in.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes", "5 minutes")) // 2× overlap
      .agg(sum($"v").as("sv"))
    val q = agg.writeStream.format("memory").queryName("slide")
      .outputMode(OutputMode.Append()).start()

    in.addData((ts(2), 1.0), (ts(7), 2.0), (ts(12), 4.0))
    q.processAllAvailable()
    in.addData((ts(55), 0.0)) // advance watermark so all 3 windows emit
    q.processAllAvailable()
    q.stop()

    val sums = spark.table("slide")
      .select(col("window.start").cast("string"), $"sv")
      .as[(String, Double)].collect().toMap
    // 10:02 -> [09:55,10:05) and [10:00,10:10); 10:07 -> [10:00,10:10)
    // and [10:05,10:15); 10:12 -> [10:05,10:15) and [10:10,10:20)
    assert(sums("2024-03-26 09:55:00") == 1.0)
    assert(sums("2024-03-26 10:00:00") == 3.0)
    assert(sums("2024-03-26 10:05:00") == 6.0)
    assert(sums("2024-03-26 10:10:00") == 4.0)
  }

  test("flatMapGroupsWithState emits alerts on threshold crossings only") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    // running per-key total; emit a row only when it crosses a multiple
    // of 10 — the 0..N-rows-per-group shape mapGroupsWithState can't do
    def update(key: String, rows: Iterator[(String, Long)],
        state: GroupState[Long]): Iterator[(String, Long)] = {
      val prev = state.getOption.getOrElse(0L)
      val total = prev + rows.map(_._2).sum
      state.update(total)
      if (total / 10 > prev / 10) Iterator(key -> total) else Iterator.empty
    }
    val q = in.toDS().groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
      .toDF("key", "total_at_alert")
      .writeStream.format("memory").queryName("alerts")
      .outputMode(OutputMode.Append()).start()

    in.addData(("a", 4L), ("b", 3L))
    q.processAllAvailable() // a=4, b=3: no crossing, no rows
    in.addData(("a", 7L))
    q.processAllAvailable() // a=11: crossed 10 -> alert
    in.addData(("a", 2L), ("b", 5L))
    q.processAllAvailable() // a=13, b=8: no crossing
    q.stop()

    val alerts = spark.table("alerts").as[(String, Long)].collect().toSeq
    assert(alerts == Seq("a" -> 11L))
  }

  test("stream-stream interval join pairs events within the time bound only") {
    implicit val sq = spark.sqlContext
    val imp = MemoryStream[(Timestamp, String)]
    val clk = MemoryStream[(Timestamp, String)]
    val impDf = imp.toDF().toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "10 minutes")
    val clkDf = clk.toDF().toDF("clk_ts", "c_ad")
      .withWatermark("clk_ts", "10 minutes")
    // click attributes to an impression of the same ad within 15 minutes
    // after it — both sides watermarked so Spark can bound join state
    val joined = impDf.join(clkDf, expr(
      "ad = c_ad AND clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 15 minutes"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()

    imp.addData((ts(0), "a"), (ts(5), "b"))
    clk.addData((ts(10), "a")) // 10 min after a's impression: attributed
    q.processAllAvailable()
    clk.addData((ts(30), "b")) // 25 min after b's impression: outside bound
    clk.addData((ts11(0), "a")) // 60 min after: outside bound
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attrib")
      .select($"ad", col("imp_ts").cast("string"), col("clk_ts").cast("string"))
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(("a", "2024-03-26 10:00:00", "2024-03-26 10:10:00")))
  }

  test("mapGroupsWithState maintains custom running per-key state") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    def update(key: String, rows: Iterator[(String, Long)],
        state: GroupState[Long]): (String, Long) = {
      val total = state.getOption.getOrElse(0L) + rows.map(_._2).sum
      state.update(total)
      key -> total
    }
    val q = in.toDS().groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
      .toDF("key", "running")
      .writeStream.format("memory").queryName("state")
      .outputMode(OutputMode.Update()).start()

    in.addData(("a", 1L), ("a", 2L), ("b", 10L))
    q.processAllAvailable()
    in.addData(("a", 4L))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("state").as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(last("a") == 7L && last("b") == 10L)
  }
}
