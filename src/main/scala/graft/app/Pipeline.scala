package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{FileSensor, RunRequest}
import graft.model.{PartitionGrain, PartitionSpec}
import graft.table.IncrementalTable

/** Reference-DAG parity: listing → processed → backwards
  * (/root/reference/ingest_example/, SURVEY.md §3), Spark-first.
  *
  * Semantics preserved:
  *  - `listing` is an append-only per-day file log `(day, seq, filename)`
  *    — the reference's pickled `list[str]` (assets/listing.py) with the
  *    arrival order made explicit.
  *  - `processed` materializes incrementally: only listing entries with
  *    `seq >= watermark` are read (assets/processed.py:44-49); the new
  *    watermark is committed *atomically with the data* in the same
  *    IncrementalTable commit (fixing the reference's two-store race,
  *    SURVEY.md §4).
  *  - `backwards` is a derived full-partition transform
  *    (assets/backwards.py:6-15). The reference appends on re-run and
  *    silently duplicates (readme.md:13); derived batch assets here
  *    always write with partition-replace (SURVEY.md §3.4 decision (b)).
  *  - refresh: partition-scoped overwrite, other days' data survives
  *    (delta_io.py:92-93,104-107).
  */
final class Pipeline(spark: SparkSession, ingestRoot: String, tablesRoot: String,
    maxDriverPaths: Int = 10000) {
  import spark.implicits._

  val listing = IncrementalTable(spark, s"$tablesRoot/listing/v1")
  val processed = IncrementalTable(spark, s"$tablesRoot/processed/v1")
  val backwards = IncrementalTable(spark, s"$tablesRoot/backwards/v1")
  // the listing table doubles as the sensor's seen-files cursor: detect →
  // append is atomic by construction (ADVICE r1 #1, VERDICT r1 wrong #2)
  val sensor = new FileSensor(spark, ingestRoot, s"$tablesRoot/_state", listingFor)

  private val grain = PartitionGrain.Daily
  private val processedSpec = PartitionSpec(Seq("$time$expand", "word_length"))
  private val backwardsSpec = PartitionSpec.timeExpand

  /** Sensor tick + listing materialization for each run request
    * (reference steady-state path, SURVEY.md §3.1). Returns the days
    * that received new files. */
  def tickAndIngest(now: java.time.LocalDate = java.time.LocalDate.now(),
      scanAllDays: Boolean = false): Seq[String] = {
    val reqs = sensor.tick(now, scanAllDays)
    reqs.foreach(runListing)
    reqs.map(_.day)
  }

  /** `listing` asset: append the new `(seq, filename)` rows for a day
    * (incremental self-union, assets/listing.py:30-41; the previous
    * materialization is already in the table, so append == prev ++ new). */
  def runListing(req: RunRequest): Unit = {
    val df = req.newFiles.toDF("seq", "filename")
    listing.append(df, partitionBy = Seq("day"),
      partitionValues = Map("day" -> req.day))
  }

  /** Current listing for a day, in arrival order. Missing upstream —
    * including a never-created table — yields a typed empty frame
    * (reference L3 default, assets/listing.py:33-39). */
  def listingFor(day: String): DataFrame = {
    val df = listing.read(Map("day" -> day))
    if (df.schema.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("seq BIGINT, filename STRING"))
    else df.select($"seq".cast("long"), $"filename")
  }

  private def watermarkKey(day: String) = s"watermark/$day"

  /** `processed` asset for one day (SURVEY.md §3.2): watermark lookup
    * (P1) → suffix slice (P2) → per-file read (P3) → length projection
    * (P4/P5) → partitioned write with atomic watermark commit (P6/W3-W6). */
  def runProcessed(day: String, refresh: Boolean = false): Unit = {
    val all = listingFor(day)
    val wm: Long =
      if (refresh) 0L
      else processed.latestMeta(watermarkKey(day)).map(_.toLong).getOrElse(0L)
    val newWm = all.agg(coalesce(max($"seq") + 1, lit(0L))).as[Long].head()

    val toProcess = all.filter($"seq" >= wm) // P2 offset slice
    val df = readWords(day, toProcess)

    val (partitionBy, timeValues) = processedSpec.resolve(grain, day)
    val meta = Map(watermarkKey(day) -> newWm.toString)
    if (refresh)
      processed.replaceWhere(df, partitionBy, timeValues, timeValues, meta)
    else
      processed.append(df, partitionBy, timeValues, meta)
  }

  /** P3-P5: one row per file: (filename, word, word_length). `wholetext`
    * keeps file contents atomic per row; `input_file_name` recovers the
    * filename. Contents are always read by executors (files pack into
    * read tasks via spark.sql.files.maxPartitionBytes); what varies is
    * how the *file list* reaches the scan:
    *
    *  - small slices (incremental ticks): collect just the new filenames
    *    and scan exactly those paths — bounded by `maxDriverPaths`, reads
    *    no stale files;
    *  - large slices (backfills): scan the whole day directory once and
    *    `left_semi` join against the listing slice on filename, keeping
    *    the file list fully distributed (VERDICT r1 wrong #1: a
    *    million-file day must never become a million-element driver
    *    array / scan argument list).
    */
  private def readWords(day: String, slice: DataFrame): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "filename STRING, word STRING, word_length BIGINT"))
    val n = slice.count()
    if (n == 0) return empty

    def parse(df: DataFrame): DataFrame = df
      .select(
        element_at(split(input_file_name(), "/"), -1).as("filename"),
        $"value".as("word"))
      .withColumn("word_length", length($"word").cast("long"))

    if (n <= maxDriverPaths) {
      val files = slice.select($"filename").as[String].collect()
      val paths = files.map(f => s"$ingestRoot/day=$day/$f")
      parse(spark.read.option("wholetext", "true").text(paths: _*))
    } else {
      val dayDir = s"$ingestRoot/day=$day"
      parse(spark.read
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.txt")
        .text(dayDir))
        .join(slice.select($"filename"), Seq("filename"), "left_semi")
    }
  }

  /** `backwards` asset: full-partition derived transform, word reversed
    * (B1, assets/backwards.py:15); always partition-replace. */
  def runBackwards(day: String): Unit = {
    val (_, timeValues) = backwardsSpec.resolve(grain, day)
    val src = processed.read(timeValues)
    if (src.schema.isEmpty) return
    val df = src.withColumn("word", reverse($"word"))
      .select($"filename", $"word", $"word_length") // partition cols re-injected on write
    val (partitionBy, _) = backwardsSpec.resolve(grain, day)
    backwards.replaceWhere(df, partitionBy, timeValues, timeValues)
  }

  /** Materialize the full DAG for a day. */
  def runAll(day: String, refresh: Boolean = false): Unit = {
    runProcessed(day, refresh)
    runBackwards(day)
  }
}
