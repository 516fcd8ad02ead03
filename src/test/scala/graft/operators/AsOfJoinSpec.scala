package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics: latest at-or-before, simultaneous ties count, no-match is null") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 30L, "r30"),
      (2L, 9L, "r9")).toDF("k", "t", "rv")

    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t")
    // collision prefix: right's `t` surfaces as right_t, in right order
    assert(out.columns.toSeq == Seq("k", "t", "lv", "right_t", "rv"))
    val rows = out.select($"k", $"t", $"lv", $"rv", $"right_t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    assert(rows == Set(
      (1L, 10L, "p1", "r10", 10L), // right at the same instant counts
      (1L, 20L, "p2", "r15", 15L), // latest of the earlier rights, not r30
      (2L, 5L, "p3", null, -1L))) // no right at-or-before: left-outer null
  }

  test("as-of plan is one hash shuffle, no range probe") {
    val left = (0 until 100).map(i => (i.toLong % 7, i.toLong, i)).toDF("k", "t", "lv")
    val right = (0 until 50).map(i => (i.toLong % 7, i.toLong * 2, s"r$i"))
      .toDF("k", "t", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t")
    val plan = out.queryExecution.executedPlan.toString
    // one Exchange for the shared window partitioning; a nested-loop or
    // per-row range join would show BroadcastNestedLoopJoin / extra joins
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
    assert(!plan.contains("NestedLoop"), plan)
    assert(out.count() == 100)
  }
}
