package graft.table

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** X94 (VERDICT r9 #9 stretch): maintenance rewrites are CDC no-ops.
  * A compaction commit carries the `maintenance/rewrite` marker (the
  * Delta `dataChange=false` analog) and the change feed skips it —
  * pre-marker, `changes()` read the full added+removed contents into
  * an O(rewrite) exceptAll that provably cancelled to zero rows; now
  * the rewrite files are never opened. DML/refresh replaces carry no
  * marker and keep their exact delta semantics. */
class MaintenanceCdcSpec extends SparkSpec {
  import spark.implicits._

  test("compaction is a CDC no-op; its rewrite files are never read") {
    val t = IncrementalTable(spark, tmpDir("mcdc") + "/t")
    t.append(spark.range(0, 50).toDF("id"), Nil)
    t.append(spark.range(50, 100).toDF("id"), Nil)
    // standing MOR delete: the compaction will MATERIALIZE these holes
    // — their delete rows were already emitted by THIS commit
    t.deleteVectorized($"id" % 10 === 0)
    def feed() = t.changes(0)
      .select($"id", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSeq.sorted
    val before = feed()
    assert(before.count(_._2 == "delete") == 10)

    val c = t.compact(targetFiles = 1).get
    assert(c.meta.get("maintenance/rewrite").contains("1"))
    // the feed is unchanged by the compaction — no spurious rows
    assert(feed() == before)
    // the compaction-only window emits nothing AND reads nothing
    val only = t.changes(c.version, c.version)
    assert(only.count() == 0)
    assert(only.inputFiles.isEmpty,
      s"compaction window read files: ${only.inputFiles.toSeq}")
    // the crossing window never opens the rewrite outputs either
    val full = t.changes(0)
    assert(!full.inputFiles.exists(f => c.add.exists(f.endsWith)),
      "full-window CDC read the compaction's rewrite files")
    // and the live state is exactly the compacted 90 rows
    assert(t.read().count() == 90)

    // contrast: an UN-marked replace (refresh semantics) still emits
    // its exact delta
    t.replaceWhere(spark.range(1000, 1002).toDF("id"), Nil,
      Map.empty, Map.empty)
    val tail = t.changes(t.latestVersion, t.latestVersion)
      .select($"_change_type").as[String].collect().toSeq
    assert(tail.contains("insert") && tail.contains("delete"), tail.toString)

    // compactWhere is marked too
    val t2 = IncrementalTable(spark, tmpDir("mcdc") + "/t2")
    t2.append(spark.range(0, 10).toDF("id"), Nil)
    t2.append(spark.range(10, 20).toDF("id"), Nil)
    val cw = t2.compactWhere(col("id") >= 0).get
    assert(cw.meta.get("maintenance/rewrite").contains("1"))
    assert(t2.changes(cw.version, cw.version).count() == 0)
  }
}
