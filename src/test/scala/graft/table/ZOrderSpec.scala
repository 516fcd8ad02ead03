package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-dimensional clustering: after `compact(zorderBy = x, y)`, a
  * range predicate on EITHER column must prune files via the committed
  * [min,max] index — the property lexicographic clustering only has on
  * its leading column. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def grid(dir: String): IncrementalTable = {
    val t = IncrementalTable(spark, dir)
    // 100x100 grid in hash-shuffled arrival order: pre-compaction,
    // every file spans nearly the full range of both columns
    val rows = spark.range(10000).select(
      (col("id") % 100).cast("int").as("x"),
      (col("id") / 100).cast("int").as("y"),
      col("id").as("payload"))
    t.append(rows.repartition(8), partitionBy = Nil)
    t
  }

  test("z-order compaction: range predicates on BOTH dimensions prune files") {
    val t = grid(tmpDir("zorder") + "/t")
    t.compact(targetFiles = 16, zorderBy = Seq("x", "y"))
    val all = t.liveFiles()
    assert(all.size == 16)

    val xs = t.liveFilesWhere(col("x") >= 10 && col("x") <= 19)
    val ys = t.liveFilesWhere(col("y") >= 10 && col("y") <= 19)
    // a 10%-wide stripe on either axis touches ~1 block-column (~4) of
    // the 4x4 morton blocks; 8 is a loose determinism-safe ceiling
    assert(xs.size <= 8, s"x-stripe touched ${xs.size}/16 files")
    assert(ys.size <= 8, s"y-stripe touched ${ys.size}/16 files")

    // pruning is sound: the pruned read returns exactly the filter's rows
    assert(t.readWhere(col("x") >= 10 && col("x") <= 19).count() == 1000)
    assert(t.readWhere(col("y") >= 10 && col("y") <= 19).count() == 1000)
    assert(t.readWhere(col("x") === 5 && col("y") === 5).count() == 1)
  }

  test("lexicographic clusterBy prunes the leading column only (the z-order contrast)") {
    val t = grid(tmpDir("zorder") + "/t2")
    t.compact(targetFiles = 16, clusterBy = Seq("x", "y"),
      statsColumns = Seq("x", "y"))
    val xs = t.liveFilesWhere(col("x") >= 10 && col("x") <= 19)
    val ys = t.liveFilesWhere(col("y") >= 10 && col("y") <= 19)
    assert(xs.size <= 3, s"leading column should prune hard: ${xs.size}/16")
    assert(ys.size == 16, "trailing column prunes nothing under lexicographic order")
  }

  test("empty z-order slice compacts without error; nulls order first") {
    val t = IncrementalTable(spark, tmpDir("zorder") + "/t3")
    t.append(Seq((Some(1), 10L), (None, 20L), (Some(5), 30L))
      .toDF("x", "y"), partitionBy = Nil)
    t.compact(targetFiles = 2, zorderBy = Seq("x", "y"))
    assert(t.read().count() == 3)
    assert(t.read().filter(col("x").isNull).count() == 1)
  }
}
