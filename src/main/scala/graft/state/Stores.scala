package graft.state

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Sensor tick clock — the only sensor state that lives outside the
  * listing table. The reference persisted the full seen-file map here
  * too (`Cursor = dict[str, set[str]]`,
  * /root/reference/ingest_example/sensors.py:18,31-37,72-79), which is
  * O(all files) driver memory AND races with the listing write (a crash
  * between cursor-save and listing-append dropped files forever —
  * ADVICE r1 #1). Seen-ness now derives from the listing table itself
  * (see [[graft.ingest.FileSensor]]); losing this clock only widens the
  * next tick's candidate-day rescan window, never loses or dups data. */
final case class SensorClock(lastTickMillis: Option[Long])

/** Tiny atomic JSON document store (Hadoop FS API: works on HDFS/S3A).
  * Used for the sensor clock; table-coupled state (watermarks, seen
  * files) instead rides in IncrementalTable commits so it is atomic
  * with the data. Single-writer, last-write-wins. */
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
    // single-writer sensor; a crash between them loses only the tick
    // clock, which self-heals (window widens one tick).
    if (fs.exists(doc)) fs.delete(doc, false)
    if (!fs.rename(tmp, doc))
      throw new java.io.IOException(s"state publish failed: $doc")
  }
}
