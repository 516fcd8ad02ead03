package graft.model

import java.time.LocalDate
import java.time.temporal.WeekFields

/** Partition grain of an asset: which physical time columns a partition
  * key expands into.
  *
  * Re-expresses the reference's grain table
  * (/root/reference/ingest_example/delta_io.py:22-34): Monthly→[year,month],
  * Daily→[year,month,day], Hourly→[+hour], Weekly→[year,week]; a
  * multi-dimension definition recurses on its time dimension.
  */
sealed trait PartitionGrain {
  def timeColumns: Seq[String]
  /** Number of '-'-separated segments in this grain's partition key. */
  def keyArity: Int = timeColumns.length
}
object PartitionGrain {
  case object Monthly extends PartitionGrain { val timeColumns = Seq("year", "month") }
  case object Daily   extends PartitionGrain { val timeColumns = Seq("year", "month", "day") }
  case object Hourly  extends PartitionGrain { val timeColumns = Seq("year", "month", "day", "hour") }
  case object Weekly  extends PartitionGrain { val timeColumns = Seq("year", "week") }
  /** Time dimension + static attribute dimensions (multi-partition). */
  final case class Multi(time: PartitionGrain, dims: Seq[String]) extends PartitionGrain {
    def timeColumns: Seq[String] = time.timeColumns
  }
}

/** A declared partition spec: ordered entries that are either the magic
  * tokens `$time` (partition by the finest time column only) or
  * `$time$expand` (expand the key into all grain columns), or plain
  * attribute column names — exactly the vocabulary of the reference's
  * `delta_partitions` metadata (/root/reference/ingest_example/delta_io.py:47-62,
  * used as ["$time$expand","word_length"] at assets/processed.py:34).
  */
final case class PartitionSpec(entries: Seq[String]) {

  /** Resolve against a grain and a concrete partition key.
    *
    * @return (physical partition-by column order,
    *          time column → zero-padded string value)
    *
    * Values stay zero-padded strings ("2024","03","26") for layout parity
    * with the reference, which injects the split key segments as string
    * literals (delta_io.py:63-67,108-110). Week values are ISO week
    * numbers zero-padded to 2 (delta_io.py:38-43).
    */
  def resolve(grain: PartitionGrain, key: String): (Seq[String], Map[String, String]) = {
    val timeCols = grain.timeColumns
    var timeValues = Map.empty[String, String]
    val partitionBy = Seq.newBuilder[String]
    entries.foreach {
      case "$time" =>
        val finest = timeCols.last
        partitionBy += finest
        timeValues = Map(finest -> key)
      case "$time$expand" =>
        partitionBy ++= timeCols
        val parts = key.split("-")
        val weekly = timeCols.contains("week")
        timeValues = timeCols.zipWithIndex.map { case (name, i) =>
          val v = name match {
            case "week" => PartitionSpec.isoWeek(key)
            // Weekly grain: year must be the ISO week-BASED year, or
            // year-boundary dates collide (2024-12-30 is ISO 2025-W01;
            // the calendar year would file it under year=2024/week=01
            // with 2024-01-01). The reference has this bug
            // (delta_io.py:38-43 + split('-')[0]); we fix rather than
            // reproduce it (ADVICE r1 #3).
            case "year" if weekly => PartitionSpec.isoWeekYear(key)
            case _ => parts(i)
          }
          name -> v
        }.toMap
      case attr =>
        partitionBy += attr
    }
    (partitionBy.result(), timeValues)
  }
}

object PartitionSpec {
  /** ISO-8601 week of a `YYYY-MM-DD[...]` key, zero-padded to 2 chars. */
  def isoWeek(key: String): String = {
    val week = LocalDate.parse(key.take(10))
      .get(WeekFields.ISO.weekOfWeekBasedYear())
    f"$week%02d"
  }

  /** ISO-8601 week-based year of a `YYYY-MM-DD[...]` key. */
  def isoWeekYear(key: String): String = {
    val y = LocalDate.parse(key.take(10))
      .get(WeekFields.ISO.weekBasedYear())
    f"$y%04d"
  }

  val timeExpand: PartitionSpec = PartitionSpec(Seq("$time$expand"))
}
