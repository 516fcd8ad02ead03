package graft.graph

import java.time.LocalDate

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.model.{PartitionGrain, PartitionSpec}

class AssetGraphSpec extends SparkSpec {
  import spark.implicits._

  private val day = "2024-03-26"
  private val today = LocalDate.parse("2024-03-26")
  private val parts = PartitionsDef(PartitionGrain.Daily, LocalDate.parse("2024-03-20"))

  // a mutable "source" the numbers asset reads — simulates file arrivals
  private var source: Seq[(Long, Long)] = Seq.empty // (seq, value)

  private def graph(root: String): AssetGraph = {
    val numbers = Asset("numbers", parts, PartitionSpec.timeExpand,
      WriteMode.IncrementalAppend) { (s, _, _) =>
      import s.implicits._
      source.toDF("seq", "value")
    }
    val squares = Asset("squares", parts, PartitionSpec.timeExpand,
      WriteMode.PartitionReplace, deps = Seq("numbers")) { (s, _, inputs) =>
      import s.implicits._
      inputs("numbers").select($"seq", ($"value" * $"value").as("sq"))
    }
    new AssetGraph(spark, root, Seq(numbers, squares))
  }

  test("partition validation enforces start_date and the open end_offset horizon") {
    assert(parts.validate("2024-03-19", today).isLeft) // predates start
    assert(parts.validate("2024-03-26", today).isRight) // today is open (end_offset=1)
    assert(parts.validate("2024-03-27", today).isLeft) // beyond horizon
    assert(parts.validate("garbage", today).isLeft)
    assert(parts.keys(today) == (20 to 26).map(d => s"2024-03-$d"))
  }

  test("topological materialization, incremental append, derived replace") {
    val root = tmpDir("graph")
    val g = graph(root)
    assert(g.topo("squares") == Seq("numbers", "squares"))

    source = Seq((0L, 2L), (1L, 3L), (2L, 4L))
    assert(g.materializeAll("squares", day, today = today) == Seq("numbers", "squares"))
    assert(g.tableFor("numbers").read().count() == 3)
    assert(g.tableFor("squares").read().select($"sq").as[Long].collect().toSet ==
      Set(4L, 9L, 16L))

    // source grows; numbers appends ONLY the suffix past the watermark,
    // squares recomputes its partition without duplicating
    source = source ++ Seq((3L, 5L), (4L, 6L))
    g.materializeAll("squares", day, today = today)
    val nums = g.tableFor("numbers").read()
    assert(nums.count() == 5)
    assert(nums.select($"seq").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(g.tableFor("squares").read().count() == 5)

    // idle re-run: no new rows, no duplicates (replay-safe)
    g.materializeAll("squares", day, today = today)
    assert(g.tableFor("numbers").read().count() == 5)
    assert(g.tableFor("squares").read().count() == 5)
  }

  test("orchestrator tick maintains registered views: chained views converge with zero manual refresh (VERDICT r13 #2)") {
    import graft.streaming.MaterializedView
    import graft.table.IncrementalTable
    val root = tmpDir("graph")
    val numbers = Asset("numbers", parts, PartitionSpec.timeExpand,
      WriteMode.IncrementalAppend) { (s, _, _) =>
      import s.implicits._
      source.toDF("seq", "value")
    }
    // v2 chains on v1's TABLE — the maintainer must drain v1 first
    // (topological order from the registrations themselves)
    val g = new AssetGraph(spark, root, Seq(numbers),
      views = Seq(s"$root/v2", s"$root/v1")) // deliberately out of order
    MaterializedView.create(spark, IncrementalTable(spark, s"$root/v1"),
      s"$root/numbers/v1", Seq("value"), "count:n")
    MaterializedView.create(spark, IncrementalTable(spark, s"$root/v2"),
      s"$root/v1", Seq("n"), "count:k")

    def v1 = IncrementalTable(spark, s"$root/v1").read()
      .select($"value", $"n").as[(Long, Long)].collect().toSet
    def v2 = IncrementalTable(spark, s"$root/v2").read()
      .select($"n", $"k").as[(Long, Long)].collect().toSet
    def expectV1 = IncrementalTable(spark, s"$root/numbers/v1").read()
      .groupBy($"value").count().as[(Long, Long)].collect().toSet

    // tick 1: materialize the asset -> BOTH views converge, no CALLs
    source = Seq((0L, 2L), (1L, 3L), (2L, 2L))
    g.materializeAll("numbers", day, today = today)
    assert(v1 == expectV1, s"v1 $v1 vs $expectV1")
    assert(v1 == Set((2L, 2L), (3L, 1L)))
    assert(v2 == Set((2L, 1L), (1L, 1L)), s"chained view: $v2")

    // tick 2: new arrivals flow asset -> v1 -> v2 in ONE tick
    source = source ++ Seq((3L, 3L), (4L, 4L))
    g.materializeAll("numbers", day, today = today)
    assert(v1 == expectV1)
    assert(v1 == Set((2L, 2L), (3L, 2L), (4L, 1L)))
    assert(v2 == Set((2L, 2L), (1L, 1L)), s"chained view after tick 2: $v2")

    // idle tick: everything current, the maintainer applies nothing
    val applied = g.maintainViews()
    assert(applied.values.forall(_ == 0), applied.toString)
  }

  test("incrementalDep: compute receives only the sliced upstream (P1/P2 in the planner)") {
    val root = tmpDir("graph")
    var computeSaw: Seq[Long] = Nil
    val src = Asset("src", parts, PartitionSpec.timeExpand,
      WriteMode.IncrementalAppend) { (s, _, _) =>
      import s.implicits._
      source.toDF("seq", "value")
    }
    val dst = Asset("dst", parts, PartitionSpec.timeExpand,
      WriteMode.IncrementalAppend, deps = Seq("src"),
      incrementalDep = Some("src")) { (s, _, inputs) =>
      import s.implicits._
      val in = inputs("src")
      computeSaw =
        if (in.schema.isEmpty) Nil
        else in.select($"seq").as[Long].collect().toSeq.sorted
      if (in.schema.isEmpty) s.emptyDataFrame
      else in.select($"seq", ($"value" * 10).as("v10"))
    }
    val g = new AssetGraph(spark, root, Seq(src, dst))

    source = Seq((0L, 2L), (1L, 3L), (2L, 4L))
    g.materializeAll("dst", day, today = today)
    assert(computeSaw == Seq(0L, 1L, 2L)) // first run: everything is new
    assert(g.tableFor("dst").read().count() == 3)

    // upstream grows: compute must see ONLY the suffix past the watermark
    source = source ++ Seq((3L, 5L), (4L, 6L))
    g.materializeAll("dst", day, today = today)
    assert(computeSaw == Seq(3L, 4L))
    assert(g.tableFor("dst").read().count() == 5)

    // idle re-run: empty slice, no new rows, no duplicates
    g.materializeAll("dst", day, today = today)
    assert(computeSaw.isEmpty)
    assert(g.tableFor("dst").read().count() == 5)

    // refresh: full recompute (wm=0), partition replaced, no duplicates
    g.materializeAll("dst", day, refresh = true, today = today)
    assert(computeSaw == Seq(0L, 1L, 2L, 3L, 4L))
    assert(g.tableFor("dst").read().count() == 5)
    assert(g.tableFor("dst").read().select($"v10").as[Long].collect().toSet ==
      Set(20L, 30L, 40L, 50L, 60L))
  }

  test("refresh is a planner decision, invisible to compute (fixes readme.md:15-19)") {
    val root = tmpDir("graph")
    val g = graph(root)
    source = Seq((0L, 7L), (1L, 8L))
    g.materializeAll("squares", day, today = today)
    g.materializeAll("squares", day, refresh = true, today = today)
    g.materializeAll("squares", day, refresh = true, today = today)
    assert(g.tableFor("numbers").read().count() == 2)
    assert(g.tableFor("squares").read().select($"sq").as[Long].collect().toSet ==
      Set(49L, 64L))
  }

  test("unknown deps and cycles are rejected at construction/traversal") {
    val a = Asset("a", parts, PartitionSpec.timeExpand,
      WriteMode.PartitionReplace, deps = Seq("missing")) { (_, _, _) => spark.emptyDataFrame }
    intercept[IllegalArgumentException] {
      new AssetGraph(spark, tmpDir("graph"), Seq(a))
    }
    val x = Asset("x", parts, PartitionSpec.timeExpand,
      WriteMode.PartitionReplace, deps = Seq("y")) { (_, _, _) => spark.emptyDataFrame }
    val y = Asset("y", parts, PartitionSpec.timeExpand,
      WriteMode.PartitionReplace, deps = Seq("x")) { (_, _, _) => spark.emptyDataFrame }
    val g = new AssetGraph(spark, tmpDir("graph"), Seq(x, y))
    intercept[IllegalArgumentException] { g.topo("x") }
  }

  test("backfill materializes the closure for every key in range, skipping invalid ones") {
    val root = tmpDir("graph")
    val g = graph(root)
    source = Seq((0L, 2L), (1L, 3L))
    // range reaches before start_date and to the open horizon: only
    // valid keys run (2024-03-20..26), oldest first
    val done = g.backfill("squares", "2024-03-01", "2024-03-26", today = today)
    assert(done == (20 to 26).map(d => s"2024-03-$d"))
    assert(g.tableFor("squares").read().count() == 7 * 2) // 2 rows per day
    assert(g.tableFor("squares").read(Map("day" -> "25")).count() == 2)
  }

  test("materializing an out-of-range partition fails fast") {
    val g = graph(tmpDir("graph"))
    intercept[IllegalArgumentException] {
      g.materialize("numbers", "2024-03-01", today = today)
    }
  }
}
