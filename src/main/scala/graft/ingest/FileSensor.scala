package graft.ingest

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.state.{Cursor, CursorStore, JsonStore}

/** One sensor dispatch: a day-partition with newly arrived files, each
  * tagged with its monotone arrival sequence number (the reference passes
  * the raw filename list as run config, sensors.py:55-67; the explicit
  * `seq` is our fix for its listdir-order nondeterminism). */
final case class RunRequest(day: String, newFiles: Seq[(Long, String)])

/** Batch file sensor: the reference's cursor-diff new-file detection
  * (/root/reference/ingest_example/sensors.py:21-80) re-expressed over the
  * Hadoop FileSystem API.
  *
  *  - S1 directory-partition scan: list `*.txt` under `<root>/day=<d>`
  *  - S2 candidate-day pruning: only today + the previous tick's day (a
  *    ~1-day allowed-lateness bound, sensors.py:40-42); `scanAllDays`
  *    covers backfill (listing.py:19-28)
  *  - S3 new-file detection: listed − cursor.seen (sensors.py:53)
  *  - S4 cursor persistence: atomic JSON doc (sensors.py:31-37,72-79)
  *  - S5 run-request fan-out: one RunRequest per day with news
  *
  * Scale: per-day file sets live in one JSON doc — right for the
  * reference's arrival rates (1 file/30-60s, generate.py:34). At
  * millions of files/day the cursor becomes an IncrementalTable keyed by
  * (day, filename) and S3 becomes a left_anti join; the streaming path
  * (StreamIngest) already gets exactly that from the file-source
  * checkpoint, which is why it is the steady-state recommendation.
  */
final class FileSensor(
    spark: SparkSession,
    ingestRoot: String,
    stateDir: String,
    name: String = "ingest",
    suffix: String = ".txt") {

  private val store: JsonStore[Cursor] = CursorStore(spark, stateDir, name)
  private def fs = new Path(ingestRoot)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listDay(day: String): Seq[String] = {
    val dir = new Path(ingestRoot, s"day=$day")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).filter(_.endsWith(suffix)).toSeq
  }

  private def allDays(): Seq[String] =
    if (!fs.exists(new Path(ingestRoot))) Seq.empty
    else fs.listStatus(new Path(ingestRoot)).map(_.getPath.getName)
      .filter(_.startsWith("day=")).map(_.stripPrefix("day=")).sorted.toSeq

  /** One sensor tick. Returns run requests for days with new files and
    * atomically advances the cursor. */
  def tick(now: LocalDate = LocalDate.now(), scanAllDays: Boolean = false): Seq[RunRequest] = {
    val cursor = store.load().getOrElse(Cursor.empty)
    val fmt = DateTimeFormatter.ISO_LOCAL_DATE
    val days: Seq[String] =
      if (scanAllDays) allDays()
      else {
        val prevDay = cursor.lastTickMillis.map(ms =>
          java.time.Instant.ofEpochMilli(ms)
            .atZone(java.time.ZoneOffset.UTC).toLocalDate.format(fmt))
        (Set(now.format(fmt)) ++ prevDay).toSeq.sorted
      }

    var seen = cursor.seen
    var seqs = cursor.seq
    val requests = days.flatMap { day =>
      val listed = listDay(day)
      val prev = seen.getOrElse(day, Set.empty)
      // sorted for intra-tick determinism; across ticks order = arrival
      val news = listed.filterNot(prev).sorted
      if (news.isEmpty) None
      else {
        val start = seqs.getOrElse(day, 0L)
        val numbered = news.zipWithIndex.map { case (f, i) => (start + i, f) }
        seen = seen.updated(day, prev ++ news)
        seqs = seqs.updated(day, start + news.length)
        Some(RunRequest(day, numbered))
      }
    }
    store.save(Cursor(seen, seqs, Some(System.currentTimeMillis())))
    requests
  }
}
