package graft.ingest

import java.time.{LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.state.{JsonStore, SensorClock}

/** One sensor dispatch: a day-partition with newly arrived files, each
  * tagged with its monotone arrival sequence number (the reference passes
  * the raw filename list as run config, sensors.py:55-67; the explicit
  * `seq` is our fix for its listdir-order nondeterminism).
  *
  * When a scan finds more than the sensor's `maxDriverPaths` new files
  * (first tick over a huge existing day — the backfill case), the
  * request instead carries `bulk`: the numbered `(seq, filename)` frame
  * kept fully DISTRIBUTED, so no corpus-sized name list ever sits in
  * driver memory. Consumers use [[files]] to handle both shapes. */
final case class RunRequest(day: String, newFiles: Seq[(Long, String)],
    bulk: Option[DataFrame] = None) {
  def isEmpty: Boolean = newFiles.isEmpty && bulk.isEmpty
  /** The new files as a `(seq: long, filename: string)` frame. */
  def files(spark: SparkSession): DataFrame = bulk.getOrElse {
    import spark.implicits._
    newFiles.toDF("seq", "filename")
  }
}

/** Batch file sensor: the reference's cursor-diff new-file detection
  * (/root/reference/ingest_example/sensors.py:21-80) re-expressed over the
  * Hadoop FileSystem API.
  *
  *  - S1 directory-partition scan: list `*.txt` under `<root>/day=<d>`
  *  - S2 candidate-day pruning: only today + the previous tick's day (a
  *    ~1-day allowed-lateness bound, sensors.py:40-42); `scanAllDays`
  *    covers backfill (listing.py:19-28)
  *  - S3 new-file detection: `left_anti` join of the listed files against
  *    the downstream listing table (sensors.py:53's set difference,
  *    relationally)
  *  - S4 cursor state: the listing table IS the cursor. The reference
  *    (and round-1's JSON seen-set) kept "seen" in a second store written
  *    before the listing append — a crash between the two dropped files
  *    forever (ADVICE r1 #1). Deriving seen-ness from the listing itself
  *    makes detect→append atomic by construction: a crash before the
  *    append just re-detects the same files next tick. Only the tick
  *    clock (for the S2 day window) persists separately, and losing it
  *    merely widens the rescan window.
  *  - S5 run-request fan-out: one RunRequest per day with news
  *
  * Scale: the per-day `listStatus` is driver-side (bounded by one day's
  * arrivals — the same contract as a streaming file source's discovery),
  * but the seen-diff is a distributed anti-join against the listing
  * table, so no all-history file set ever lives in driver memory. The
  * steady-state recommendation remains [[StreamIngest]], where discovery
  * and dedup both live in the streaming checkpoint.
  */
final class FileSensor(
    spark: SparkSession,
    ingestRoot: String,
    stateDir: String,
    seenSource: String => DataFrame, // day -> DataFrame(seq: long, filename)
    name: String = "ingest",
    suffix: String = ".txt",
    // Above this many files in one day's scan, detection switches to the
    // fully distributed path (same dial as Pipeline.readWords): the
    // directory is listed through a Spark file source, the seen-diff
    // anti-join never collects, and numbering is a distributed
    // sort+zipWithIndex — a million-file backfill day never becomes a
    // million-element driver array (VERDICT r3 wrong #3).
    maxDriverPaths: Int = 10000) {

  private val clockStore: JsonStore[SensorClock] =
    new JsonStore[SensorClock](spark, stateDir, s"clock_$name")
  private def fs = new Path(ingestRoot)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** List one day's partition dir, stopping at `cap`+1 names — enough
    * to know whether the driver path is safe without ever materializing
    * a huge listing (the streamed listStatusIterator, not listStatus). */
  private def listDayBounded(day: String, cap: Int): (Seq[String], Boolean) = {
    val dir = new Path(ingestRoot, s"day=$day")
    if (!fs.exists(dir)) return (Seq.empty, false)
    val it = fs.listStatusIterator(dir)
    val buf = Seq.newBuilder[String]
    var n = 0
    var overflow = false
    while (it.hasNext && !overflow) {
      val nm = it.next().getPath.getName
      if (nm.endsWith(suffix)) {
        n += 1
        if (n > cap) overflow = true else buf += nm
      }
    }
    (buf.result(), overflow)
  }

  private def allDays(): Seq[String] =
    if (!fs.exists(new Path(ingestRoot))) Seq.empty
    else fs.listStatus(new Path(ingestRoot)).map(_.getPath.getName)
      .filter(_.startsWith("day=")).map(_.stripPrefix("day=")).sorted.toSeq

  /** S1+S3 for one day: list the partition dir and anti-join against the
    * listing table; genuinely-new names come back numbered from the
    * prior max seq (arrival order made explicit). Shared by the tick
    * path and the graph-driven L1 backfill (listing's Asset compute). */
  def detect(day: String): Option[RunRequest] = {
    import spark.implicits._
    val (listed, overflow) = listDayBounded(day, maxDriverPaths)
    if (listed.isEmpty && !overflow) None
    else {
      val prior = seenSource(day)
      if (overflow) {
        // Huge day: list through the binaryFile source (path/length
        // only — content never read) and keep the seen-diff a
        // distributed anti-join. A bounded probe decides the request
        // shape, so a steady-state tick over a huge day (few new
        // arrivals) still yields a normal small request and an idle
        // tick yields None; only a backfill-scale diff goes bulk.
        val names = spark.read.format("binaryFile")
          .option("pathGlobFilter", s"*$suffix")
          .load(new Path(ingestRoot, s"day=$day").toString)
          .select(element_at(split(col("path"), "/"), -1).as("filename"))
        val news = names
          .join(prior.select($"filename"), Seq("filename"), "left_anti")
        val probe = news.as[String].limit(maxDriverPaths + 1).collect()
        if (probe.isEmpty) None
        else {
          val start = prior.agg(coalesce(max($"seq") + 1, lit(0L)))
            .as[Long].head()
          if (probe.length <= maxDriverPaths) {
            val numbered = probe.sorted.zipWithIndex
              .map { case (f, i) => (start + i, f) }
            Some(RunRequest(day, numbered.toSeq))
          } else {
            // genuinely bulk: numbering is a distributed sort +
            // zipWithIndex over filename (the same arrival-order rule
            // as the small path's `.sorted`; NOT a single-partition
            // global window). Nothing about the bulk set ever returns
            // to the driver.
            val numbered = news.select($"filename").as[String].rdd
              .sortBy(identity).zipWithIndex()
              .map { case (f, i) => (start + i, f) }
            Some(RunRequest(day, Seq.empty, Some(numbered.toDF("seq", "filename"))))
          }
        }
      } else {
        // S3 as a distributed anti-join; only genuinely-new names return
        // to the driver (bounded by this tick's arrivals)
        val news = listed.toDF("filename")
          .join(prior.select($"filename"), Seq("filename"), "left_anti")
          .as[String].collect().sorted
        if (news.isEmpty) None
        else {
          val start = prior.agg(coalesce(max($"seq") + 1, lit(0L)))
            .as[Long].head()
          val numbered = news.zipWithIndex.map { case (f, i) => (start + i, f) }
          Some(RunRequest(day, numbered.toSeq))
        }
      }
    }
  }

  // tick time awaiting commitClock() — captured at scan START so files
  // arriving mid-scan stay inside the next tick's candidate window
  @volatile private var pendingTickMillis: Option[Long] = None

  /** One sensor tick. Returns run requests for days with new files. The
    * caller materializes them into the listing table; nothing is marked
    * seen until that append commits, and the tick clock only advances
    * when the caller confirms via [[commitClock]] — a crash between
    * detect and append leaves the candidate-day window untouched, so the
    * same files are re-detected next tick instead of falling outside the
    * narrowed window until a manual backfill (ADVICE r2 #1). */
  def tick(now: LocalDate = LocalDate.now(ZoneOffset.UTC),
      scanAllDays: Boolean = false): Seq[RunRequest] = {
    val tickStart = System.currentTimeMillis()
    val clock = clockStore.load().getOrElse(SensorClock(None))
    val fmt = DateTimeFormatter.ISO_LOCAL_DATE
    val days: Seq[String] =
      if (scanAllDays) allDays()
      else {
        // today and the previous tick's day derive from the SAME UTC
        // clock (ADVICE r1: mixing system-zone `now` with a UTC
        // lastTick dropped the previous day near midnight)
        val prevDay = clock.lastTickMillis.map(ms =>
          java.time.Instant.ofEpochMilli(ms)
            .atZone(ZoneOffset.UTC).toLocalDate.format(fmt))
        (Set(now.format(fmt)) ++ prevDay).toSeq.sorted
      }

    val requests = days.flatMap(detect(_))
    pendingTickMillis = Some(tickStart)
    requests
  }

  /** Advance the persisted tick clock — call ONLY after this tick's run
    * requests have been materialized into the listing table. Losing the
    * clock (crash before this) merely widens the next rescan window;
    * advancing it early could orphan detected-but-unappended files. */
  def commitClock(): Unit = pendingTickMillis.foreach { t =>
    clockStore.save(SensorClock(Some(t)))
    pendingTickMillis = None
  }
}
