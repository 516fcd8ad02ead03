package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.table.IncrementalTable

/** Structured-Streaming ingest: the idiomatic steady-state replacement
  * for the batch [[graft.ingest.FileSensor]] (SURVEY.md §3.1 "Spark
  * mapping", §7.1 module 5).
  *
  * The reference's whole sensor loop collapses into the file source:
  *  - tick (sensors.py:21-24)          → micro-batch trigger
  *  - cursor JSON (sensors.py:31-37)   → file-source checkpoint offsets
  *  - set-diff S3 (sensors.py:53)      → seen-files map in the source
  *  - RunRequest fan-out (S5)          → foreachBatch invocation
  *
  * Exactly-once: the sink is `foreachBatch` → [[IncrementalTable.append]]
  * with the micro-batch id as idempotence token. After a crash the engine
  * replays the last unacknowledged batch with the SAME batchId
  * (checkpoint contract); `hasBatch` turns the replay into a no-op, so
  * data+watermark commit exactly once even when the failure lands between
  * the table commit and the checkpoint acknowledgement. The guard
  * survives log compaction via the checkpoint's maxBatchId horizon.
  *
  * Scale: file discovery, content reads, and the seen-files log all live
  * in the engine (distributed scan; RocksDB-backed file-source log if
  * configured); nothing is O(corpus) on the driver. A batch may span
  * days — partition columns derive from each row's `day=` directory, not
  * from a per-run literal.
  */
final class StreamIngest(
    spark: SparkSession,
    ingestRoot: String,
    table: IncrementalTable,
    checkpointDir: String,
    // downstream hops drained after every micro-batch commit — the
    // multi-hop chained-stream DAG (SURVEY §3.4 decision (a)). Each hop
    // checkpoints in its own table, so a crash between hop 1's commit
    // and hop 2's drain just leaves work pending for the next drain.
    chained: Seq[CommitConsumer] = Nil,
    // Streaming ingest accumulates ~one file per partition per
    // micro-batch, and at scale scan cost is dominated by file count —
    // compact any partition exceeding this many live files back to one.
    // The check is a driver-side metadata scan per batch; the compaction
    // itself is a partition-scoped replace commit (atomic, time-travel
    // visible, derived consumers converge). Default 8: at the default
    // 128 MB scan split, 8 micro-batch files under ~16 MB each collapse
    // into one split-sized read instead of 8 task launches.
    autoCompactMaxFiles: Option[Int] = Some(8)) {

  private val partitionCols = Seq("year", "month", "day", "word_length")

  /** P3-P5 + W1-W3 for a micro-batch: parse `(filename, word,
    * word_length)` rows and derive the reference's physical partition
    * columns from the hive `day=YYYY-MM-DD` source directory. */
  private[streaming] def transform(batch: DataFrame): DataFrame = {
    import spark.implicits._
    batch
      .withColumn("path", input_file_name())
      .withColumn("day_key", regexp_extract($"path", "day=([0-9-]+)", 1))
      .select(
        element_at(split($"path", "/"), -1).as("filename"),
        $"value".as("word"),
        length($"value").cast("long").as("word_length"),
        substring($"day_key", 1, 4).as("year"),
        substring($"day_key", 6, 2).as("month"),
        substring($"day_key", 9, 2).as("day"))
  }

  /** Idempotent micro-batch commit (exposed for replay tests). The
    * checkpoint dir is the stream's writer identity (batchIds are
    * monotone within one checkpoint): scoping the replay guard to it
    * means a restart from a FRESH checkpoint — batchIds reset to 0 — is
    * never swallowed by the previous stream's batch horizon. */
  private[streaming] def ingestBatch(batch: DataFrame, batchId: Long): Unit = {
    table.append(transform(batch), partitionCols, batchId = Some(batchId),
      appId = Some(CheckpointId(spark, checkpointDir)))
    chained.foreach(_.drain()) // consume the append incrementally first
    autoCompactMaxFiles.foreach(table.compactIfNeeded(_))
  }

  /** Start the ingest stream. `availableNow = true` drains everything
    * currently on disk then stops (batch-boundary semantics for tests and
    * backfills); `false` runs continuously. */
  def start(availableNow: Boolean = true, maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.txt")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val src = reader.text(s"$ingestRoot/day=*")
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("10 seconds"))
      .foreachBatch { (batch: DataFrame, id: Long) => ingestBatch(batch, id) }
      .start()
  }
}
