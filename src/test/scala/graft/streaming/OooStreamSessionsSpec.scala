package graft.streaming

import graft.SparkSpec
import graft.table.IncrementalTable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Engine-level test of [[OooStreamSessions]]: arrivals deliberately
  * SHUFFLED across micro-batches (bounded disorder = one quarter of the
  * time range, covered by the watermark delay), drained under the
  * RocksDB state store, settled via deleteInsert — must equal the batch
  * sessionization exactly. The fold algebra under random batch
  * assignment is OooStreamSessionsProps; this pins the engine plumbing
  * (transformWithState, event-time timers, watermark, sink). */
class OooStreamSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("shuffled bounded-disorder arrivals settle to batch sessionization") {
    val root = tmpDir("ooos")
    val base = 1700000000L // epoch seconds
    // 6 users × 12 clusters of 4 events (10 min apart, clusters 2 h
    // apart) → 12 sessions/user under the 30-min gap
    val rows = for (u <- 1L to 6L; c <- 0 until 12; i <- 0 until 4) yield {
      val sec = base + c * 7200L + i * 600L + u * 7L
      (u, c * 100L + i * 10L + u, new java.sql.Timestamp(sec * 1000L),
        (i + 1) * 0.25 + u)
    }
    val ev = rows.toDF("user_id", "event_id", "ts", "value")

    // q113's split shape: quartile by time, odd event_ids delayed one
    // batch → every user's arrivals interleave out of order across
    // batches, disorder bounded by one quartile span
    val agg = ev.agg(min(unix_micros($"ts")), max(unix_micros($"ts"))).first()
    val (mn, mx) = (agg.getLong(0), agg.getLong(1))
    val spanUs = (mx - mn) / 4 + 1
    val batchIdx = ((unix_micros($"ts") - mn) / spanUs).cast("int") +
      ($"event_id" % 2).cast("int")
    val n = graft.ArrivalSplit.batchWrite(ev, batchIdx, s"$root/in")
    assert(n == 5)

    val t = IncrementalTable(spark, s"$root/sessions/v1")
    val stream = new OooStreamSessions(t, s"$root/ckpt",
      watermarkDelay = s"${spanUs / 1000000} seconds")
    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(s"$root/in")
    stream.run(src)

    val got = stream.sessions()
      .orderBy($"user_id", $"session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq

    // batch reference: the q33 window-function fold over the full set
    val byUser = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val want = ev.withColumn("us", unix_micros($"ts"))
      .withColumn("prev_us", lag($"us", 1).over(byUser))
      .withColumn("is_new", when($"prev_us".isNull ||
        $"us" - $"prev_us" > 30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("session_id", sum($"is_new")
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"), min($"us").as("start_us"),
        max($"us").as("end_us"),
        sum($"value".cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .orderBy($"user_id", $"session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq

    assert(got == want)
    assert(got.size == 72) // 6 users × 12 sessions, none lost or merged
  }
}
