package graft.model

import java.time.LocalDate

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure partition-resolver properties (no Spark): fast, thousands of
  * cases. */
object PartitionsProps extends Properties("partitions") {
  import PartitionGrain._

  private val dates: Gen[LocalDate] =
    Gen.choose(0L, 365L * 60).map(LocalDate.ofEpochDay)

  property("daily expansion round-trips any date") = forAll(dates) { d =>
    val (_, v) = PartitionSpec.timeExpand.resolve(Daily, d.toString)
    v("year") + "-" + v("month") + "-" + v("day") == d.toString
  }

  property("ISO week is two digits in 01..53") = forAll(dates) { d =>
    val w = PartitionSpec.isoWeek(d.toString)
    w.length == 2 && w.toInt >= 1 && w.toInt <= 53
  }

  property("weekly (year, week) agrees with java.time ISO fields") =
    forAll(dates) { d =>
      val (_, v) = PartitionSpec.timeExpand.resolve(Weekly, d.toString)
      val wf = java.time.temporal.WeekFields.ISO
      v("year").toInt == d.get(wf.weekBasedYear()) &&
        v("week").toInt == d.get(wf.weekOfWeekBasedYear())
    }

  property("dates in the same ISO week share a weekly partition; dates a year apart never do") =
    forAll(dates) { d =>
      val (_, v1) = PartitionSpec.timeExpand.resolve(Weekly, d.toString)
      // Monday of d's ISO week is in the same partition
      val monday = d.`with`(java.time.temporal.WeekFields.ISO.dayOfWeek(), 1)
      val (_, v2) = PartitionSpec.timeExpand.resolve(Weekly, monday.toString)
      val (_, v3) = PartitionSpec.timeExpand.resolve(Weekly, d.plusDays(370).toString)
      v1 == v2 && v1 != v3
    }
}
