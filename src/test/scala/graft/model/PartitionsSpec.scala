package graft.model

import org.scalatest.funsuite.AnyFunSuite

class PartitionsSpec extends AnyFunSuite {
  import PartitionGrain._

  test("$time$expand daily resolves to zero-padded year/month/day (delta_io.py:63-67)") {
    val (cols, values) = PartitionSpec(Seq("$time$expand")).resolve(Daily, "2024-03-26")
    assert(cols == Seq("year", "month", "day"))
    assert(values == Map("year" -> "2024", "month" -> "03", "day" -> "26"))
  }

  test("$time$expand + attribute column matches the processed spec (assets/processed.py:34)") {
    val (cols, values) =
      PartitionSpec(Seq("$time$expand", "word_length")).resolve(Daily, "2024-03-26")
    assert(cols == Seq("year", "month", "day", "word_length"))
    assert(values == Map("year" -> "2024", "month" -> "03", "day" -> "26"))
  }

  test("$time resolves to only the finest grain column") {
    val (cols, values) = PartitionSpec(Seq("$time")).resolve(Daily, "2024-03-26")
    assert(cols == Seq("day"))
    assert(values == Map("day" -> "2024-03-26"))
  }

  test("weekly grain derives zero-padded ISO week (delta_io.py:38-43)") {
    val (cols, values) = PartitionSpec(Seq("$time$expand")).resolve(Weekly, "2024-01-01")
    assert(cols == Seq("year", "week"))
    // 2024-01-01 is ISO week 1 of 2024
    assert(values == Map("year" -> "2024", "week" -> "01"))
  }

  test("weekly year is the ISO week-based year at year boundaries (ADVICE r1 #3)") {
    // 2024-12-30 belongs to ISO 2025-W01: it must NOT share a partition
    // with 2024-01-01 (2024-W01), which the reference's calendar-year
    // split would cause (delta_io.py:38-43 + split('-')[0])
    val (_, boundary) = PartitionSpec(Seq("$time$expand")).resolve(Weekly, "2024-12-30")
    assert(boundary == Map("year" -> "2025", "week" -> "01"))
    val (_, early) = PartitionSpec(Seq("$time$expand")).resolve(Weekly, "2024-01-01")
    assert(early == Map("year" -> "2024", "week" -> "01"))
    // and the other direction: 2021-01-01 is ISO 2020-W53
    val (_, prev) = PartitionSpec(Seq("$time$expand")).resolve(Weekly, "2021-01-01")
    assert(prev == Map("year" -> "2020", "week" -> "53"))
  }

  test("monthly / hourly grains expand per the grain table (delta_io.py:22-34)") {
    assert(PartitionSpec(Seq("$time$expand")).resolve(Monthly, "2024-03")._1 ==
      Seq("year", "month"))
    assert(PartitionSpec(Seq("$time$expand")).resolve(Hourly, "2024-03-26-13")._2 ==
      Map("year" -> "2024", "month" -> "03", "day" -> "26", "hour" -> "13"))
  }

  test("multi-dimension grain recurses on its time dimension") {
    val (cols, _) = PartitionSpec(Seq("$time$expand", "region"))
      .resolve(Multi(Daily, Seq("region")), "2024-03-26")
    assert(cols == Seq("year", "month", "day", "region"))
  }

  test("property: daily expansion round-trips any date") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val key = java.time.LocalDate.ofEpochDay(rnd.nextLong(365L * 60)).toString
      val (_, values) = PartitionSpec.timeExpand.resolve(Daily, key)
      assert(values("year") + "-" + values("month") + "-" + values("day") == key)
    }
  }

  test("property: ISO week is always two digits, 01..53") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val w = PartitionSpec.isoWeek(
        java.time.LocalDate.ofEpochDay(rnd.nextLong(365L * 60)).toString)
      assert(w.length == 2 && w.toInt >= 1 && w.toInt <= 53)
    }
  }
}
