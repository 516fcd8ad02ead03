package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.IncrementalTable

/** maxCommitsPerDrain (VERDICT r10 #6) — the GraftStreamRead
  * maxCommitsPerTrigger analog for the derived-table consumers: a
  * lagging consumer catches up from a deep backlog in BOUNDED steps
  * (never folding the whole lag into one giant batch) and converges to
  * a final state IDENTICAL to the unbounded twin's. */
class RateControlSpec extends SparkSpec {
  import spark.implicits._

  test("DerivedStream: a 50-commit backlog drains in bounded steps, same state") {
    val dir = tmpDir("rate")
    val up = IncrementalTable(spark, dir + "/up")
    (0 until 50).foreach { i =>
      up.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), Nil)
    }
    val t = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("rv", reverse($"v"))
    val downA = IncrementalTable(spark, dir + "/downA")
    val unbounded = new DerivedStream(up, downA, Nil, t, "a",
      replayScope = Nil)
    assert(unbounded.drain() == 50)

    val downB = IncrementalTable(spark, dir + "/downB")
    val bounded = new DerivedStream(up, downB, Nil, t, "b",
      replayScope = Nil, maxCommitsPerDrain = 7)
    var steps = 0
    var applied = 0
    var n = bounded.drain()
    while (n > 0) {
      assert(n <= 7, s"drain applied $n > bound")
      steps += 1; applied += n
      n = bounded.drain()
    }
    assert(applied == 50 && steps == 8, s"$applied in $steps steps") // ceil(50/7)
    assert(bounded.sourceVersion == unbounded.sourceVersion)
    val a = downA.read().as[(Long, String, String)].collect().toSet
    val b = downB.read().as[(Long, String, String)].collect().toSet
    assert(a == b && a.size == 50, "bounded catch-up must converge to the same state")
  }

  test("AggregateStream: bounded catch-up equals the unbounded view") {
    val dir = tmpDir("rate")
    val up = IncrementalTable(spark, dir + "/up")
    (0 until 20).foreach { i =>
      up.append(Seq(("k" + (i % 3), i.toLong)).toDF("k", "v"), Nil)
    }
    val aggs = Seq(IncAgg.countAll("n"), IncAgg.sumOf(col("v"), "sum_v"))
    val downA = IncrementalTable(spark, dir + "/downA")
    new AggregateStream(up, downA, Seq("k"), aggs, name = "a",
      replayScope = Nil).drain()
    val downB = IncrementalTable(spark, dir + "/downB")
    val s = new AggregateStream(up, downB, Seq("k"), aggs, name = "b",
      replayScope = Nil, maxCommitsPerDrain = 6)
    var total = 0
    var n = s.drain()
    while (n > 0) { assert(n <= 6); total += n; n = s.drain() }
    assert(total == 20)
    val a = downA.read().select($"k", $"n", $"sum_v")
      .as[(String, Long, Long)].collect().toSet
    val b = downB.read().select($"k", $"n", $"sum_v")
      .as[(String, Long, Long)].collect().toSet
    assert(a == b && a.size == 3)
  }

  test("MinHashDedupStream: bounded catch-up keeps the identical kept set") {
    val dir = tmpDir("rate")
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog today",
      "the quick brown fox jumps over the lazy dog today", // dup of 0
      "an entirely different document about spark tables",
      "an entirely different document about spark tables here", // near-dup
      "a third subject matter with no overlap at all",
      "completely novel words appear in this final text")
    def mk(tag: String) = (
      IncrementalTable(spark, s"$dir/$tag/up"),
      IncrementalTable(spark, s"$dir/$tag/down"),
      IncrementalTable(spark, s"$dir/$tag/idx"))
    val (upA, downA, idxA) = mk("a")
    val (upB, downB, idxB) = mk("b")
    texts.zipWithIndex.foreach { case (t, i) =>
      val df = Seq((i.toLong, t)).toDF("doc_id", "text")
      upA.append(df, Nil); upB.append(df, Nil)
    }
    assert(new MinHashDedupStream(upA, downA, idxA, n = 2, tau = 0.5)
      .drain() == 6)
    val st = new MinHashDedupStream(upB, downB, idxB, n = 2, tau = 0.5,
      maxCommitsPerDrain = 2)
    var total = 0
    var n = st.drain()
    while (n > 0) { assert(n <= 2); total += n; n = st.drain() }
    assert(total == 6)
    val a = downA.read().select($"doc_id").as[Long].collect().toSet
    val b = downB.read().select($"doc_id").as[Long].collect().toSet
    assert(a == b, s"bounded $b != unbounded $a")
    assert(b.size < texts.size, "near-dups must have collapsed")
    // the persisted index covers exactly the kept docs on both twins
    val ia = idxA.read().select($"did").distinct().as[Long].collect().toSet
    val ib = idxB.read().select($"did").distinct().as[Long].collect().toSet
    assert(ia == a && ib == b)
  }
}
