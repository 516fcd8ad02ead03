package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("range join matches brute force exactly, once per pair") {
    val rnd = new scala.util.Random(7)
    val points = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "k", "t")
    val ivals = (0 until 80).map { i =>
      val s = rnd.nextInt(950).toLong
      (i.toLong, rnd.nextInt(5).toLong, s, s + rnd.nextInt(120).toLong)
    }.toDF("iid", "k", "s", "e")

    val fast = RangeJoin.pointInInterval(points, ivals, Seq("k"), "t", "s", "e",
      bucketWidth = 100)
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    val brute = points.join(ivals, Seq("k"))
      .filter($"t" >= $"s" && $"t" <= $"e")
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    assert(fast == brute) // same pairs, and exactly once each (no dedup pass)
    assert(fast.distinct == fast)
    assert(fast.nonEmpty)
  }

  test("range join plans as a hash equi-join, not a nested loop") {
    val points = (0 until 100).map(i => (i.toLong, i.toLong % 3, i.toLong))
      .toDF("pid", "k", "t")
    val ivals = (0 until 20).map(i => (i.toLong, i.toLong % 3, i * 10L, i * 10L + 25))
      .toDF("iid", "k", "s", "e")
    val out = RangeJoin.pointInInterval(points, ivals, Seq("k"), "t", "s", "e", 25)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(plan.contains("Join"), plan)
  }
}
