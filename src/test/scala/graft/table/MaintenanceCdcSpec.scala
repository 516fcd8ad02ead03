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

  test("stream consumers skip maintenance rewrites — no downstream recompute") {
    val tmp = tmpDir("mcdc_ds")
    val up = IncrementalTable(spark, s"$tmp/up")
    val down = IncrementalTable(spark, s"$tmp/down")
    up.append(spark.range(0, 30).toDF("id"), Nil)
    up.append(spark.range(30, 60).toDF("id"), Nil)
    val stream = new graft.streaming.DerivedStream(up, down, Nil,
      df => df.select((col("id") * 2).as("d")), "m")
    assert(stream.drain() == 2)
    val dver = down.latestVersion
    // compaction upstream: pre-X94 this forced a FULL downstream
    // replace-recompute; now nothing is pending
    up.compact(targetFiles = 1)
    assert(stream.drain() == 0, "compaction triggered a derived recompute")
    down.refresh()
    assert(down.latestVersion == dver)
    assert(down.read().count() == 60)
    // a real append after the compaction still flows incrementally
    up.append(spark.range(60, 70).toDF("id"), Nil)
    assert(stream.drain() == 1)
    assert(down.read().count() == 70)
  }

  test("plain streaming source streams THROUGH a compaction: no error, no duplicates") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("mcdc_src")
    val t = IncrementalTable(spark, s"$root/t")
    t.append(spark.range(0, 20).toDF("id"), Nil)
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(s"$root/t")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect().map(_.getLong(0))
          got.synchronized { got ++= rows }
          ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(got.sorted.toSeq == (0L until 20L))
    // compaction mid-stream: pre-X94 the source REFUSED the history
    // (append-only contract) without skipChangeCommits; the marked
    // rewrite now passes and its files are NOT re-emitted
    t.compact(targetFiles = 1)
    t.append(spark.range(20, 25).toDF("id"), Nil)
    drain()
    assert(got.sorted.toSeq == (0L until 25L),
      s"compaction duplicated or dropped rows: ${got.sorted.toSeq.size} rows")
  }
}
