package graft.table

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Round-8 maintenance verbs: library TIMESTAMP AS OF
  * (readAtTimestamp over non-decreasing in-commit timestamps) and
  * predicate-scoped compaction (compactWhere). */
class MaintenanceExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("readAtTimestamp: at-or-before semantics over clamped commit timestamps") {
    val t = IncrementalTable(spark, tmpDir("mx") + "/t1")
    t.append(Seq((1L, "a")).toDF("k", "v"), Nil)
    val c0 = System.currentTimeMillis()
    Thread.sleep(15)
    t.append(Seq((2L, "b")).toDF("k", "v"), Nil)
    Thread.sleep(15)
    // latest as of NOW; first snapshot as of just after commit 0
    assert(t.readAtTimestamp(System.currentTimeMillis()).count() == 2)
    assert(t.readAtTimestamp(c0).count() == 1)
    // predating the whole history is loud
    val e = intercept[IllegalArgumentException](t.readAtTimestamp(1000L))
    assert(e.getMessage.contains("no commit"), e.getMessage)
    // the committed ts sequence is non-decreasing by construction
    val tss = t.commits().map(_.ts)
    assert(tss.sorted == tss)
  }

  test("compactWhere: rewrites only the predicate-touched files, lossless") {
    val t = IncrementalTable(spark, tmpDir("mx") + "/t2")
    // 3 files clustered on k: [0..9], [10..19], [20..29]
    (0 until 3).foreach(i => t.append(
      (i * 10 until i * 10 + 10).map(k => (k.toLong, s"v$k")).toDF("k", "v")
        .coalesce(1),
      Nil, statsColumns = Seq("k")))
    // two half-files in the middle range
    t.append(Seq((12L, "x12b")).toDF("k", "v").coalesce(1), Nil,
      statsColumns = Seq("k"))
    val before = t.liveFiles().toSet
    assert(before.size == 4)
    val c = t.compactWhere(col("k") >= 10L && col("k") <= 19L,
      statsColumns = Seq("k"))
    assert(c.nonEmpty)
    val after = t.liveFiles().toSet
    // untouched ranges keep their exact files; touched ones merged to 1
    val kept = before.intersect(after)
    assert(kept.size == 2, s"$before -> $after")
    assert((after -- before).size == 1)
    assert(t.read().count() == 31)
    assert(t.readWhere(col("k") === 12L).count() == 2)
  }
}
