package graft.table

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** X105: atomic merge-on-read upsert — ONE commit puts the batch's
  * distinct keys in force as an equality delete AND appends the batch,
  * under one batchId replay guard. The old versions of every key
  * vanish, the new rows land, nothing is scanned or rewritten — the
  * exactly-once streaming CDC-upsert sink shape, exposed on the sink as
  * `.option("upsertKeys", "id")`. */
class UpsertByKeySpec extends SparkSpec {
  import spark.implicits._

  test("one commit deletes the old versions and lands the new") {
    val t = IncrementalTable(spark, tmpDir("upsert") + "/t")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), Nil)
    val before = t.latestVersion
    val c = t.upsertByKey(Seq((2L, "b2"), (4L, "d")).toDF("id", "v"),
      Seq("id")).get
    assert(c.version == before + 1, "the upsert must be ONE commit")
    assert(c.action == "append" && c.add.nonEmpty && c.remove.isEmpty)
    assert(t.read().as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c"), (4L, "d")))
    // chained upserts: last writer wins per key
    t.upsertByKey(Seq((2L, "b3"), (1L, "a2")).toDF("id", "v"), Seq("id"))
    assert(t.read().as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a2"), (2L, "b3"), (3L, "c"), (4L, "d")))
    // compaction materializes; state unchanged; vacuum retires entries
    t.compact(); t.vacuum()
    assert(t.eqDeletes().isEmpty)
    assert(t.read().count() == 4)
  }

  test("exactly-once: a replayed batchId elides the whole upsert") {
    val t = IncrementalTable(spark, tmpDir("upsert") + "/once")
    t.append(Seq((1L, "a")).toDF("id", "v"), Nil)
    t.upsertByKey(Seq((1L, "a2")).toDF("id", "v"), Seq("id"),
      batchId = Some(7L), appId = Some("w1"))
    val v = t.latestVersion
    // the replay: no commit, no new delete, no sidecar churn
    assert(t.upsertByKey(Seq((1L, "a3")).toDF("id", "v"), Seq("id"),
      batchId = Some(7L), appId = Some("w1")).isEmpty)
    assert(t.latestVersion == v)
    assert(t.read().as[(Long, String)].collect().toSeq == Seq((1L, "a2")))
  }

  test("CDC: the upsert commit emits the old versions as deletes, the batch as inserts") {
    val t = IncrementalTable(spark, tmpDir("upsert") + "/cdc")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Nil)
    val c = t.upsertByKey(Seq((2L, "b2"), (9L, "z")).toDF("id", "v"),
      Seq("id")).get
    val feed = t.changes(c.version, c.version)
    assert(feed.filter($"_change_type" === "delete")
      .as[(Long, String, String, Long)].collect().map(r => (r._1, r._2))
      .toSeq == Seq((2L, "b")))
    assert(feed.filter($"_change_type" === "insert")
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 9L))
  }

  test("refusals: partition keys, unknown keys, unseeded table") {
    val t = IncrementalTable(spark, tmpDir("upsert") + "/refuse")
    intercept[IllegalArgumentException](
      t.upsertByKey(Seq((1L, "a")).toDF("id", "v"), Seq("id")))
    t.append(Seq((1L, "a", 1)).toDF("id", "v", "p"), Seq("p"))
    intercept[IllegalArgumentException](
      t.upsertByKey(Seq((1L, "a", 1)).toDF("id", "v", "p"), Seq("p"),
        partitionBy = Seq("p")))
    intercept[IllegalArgumentException](
      t.upsertByKey(Seq((1L, "a", 1)).toDF("id", "v", "p"), Seq("nope"),
        partitionBy = Seq("p")))
  }

  test("streaming sink: option(upsertKeys) upserts per epoch, exactly once") {
    val root = tmpDir("upsert") + "/stream"
    val in = s"$root/in"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$in/f0")
    Seq((2L, "b2"), (3L, "c")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$in/f1")
    new java.io.File(s"$in/f0").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f => f.setLastModified(1500000000000L); () }
    new java.io.File(s"$in/f1").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f => f.setLastModified(1500000060000L); () }
    val schema = Seq((0L, "")).toDF("id", "v").schema
    val t = IncrementalTable(spark, s"$root/t")
    t.append(Seq((0L, "seed"), (3L, "old")).toDF("id", "v"), Nil)
    def drain(): Unit = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true")
      .parquet(in)
      .writeStream.format("graft")
      .option("checkpointLocation", s"$root/ckpt")
      .option("upsertKeys", "id")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$root/t").awaitTermination()
    drain()
    t.refresh()
    // epoch 0 upserted (1,2); epoch 1 upserted (2,3) over it — per-key
    // last writer wins, the untouched seed row survives
    assert(t.read().as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((0L, "seed"), (1L, "a"), (2L, "b2"), (3L, "c")))
    // re-drain from the same checkpoint: the replay guard elides all
    drain()
    t.refresh()
    assert(t.read().count() == 4)
    assert(t.eqDeletes().size == 2, "one standing delete per epoch")
  }
}
