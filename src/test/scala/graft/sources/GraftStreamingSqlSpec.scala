package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.table.IncrementalTable

/** Catalog-addressed streaming on the public DSv2 bridges (the round-7
  * verdict's "done" criterion for the streaming migration):
  * `df.writeStream.toTable("graft.ns.t")` commits through
  * [[GraftStreamingWrite]] with the exactly-once (appId, batchId)
  * guard, `spark.readStream.table("graft.ns.t")` drains commits as
  * micro-batches through [[GraftMicroBatchStream]], and the
  * `t.changes` metadata table is the catalog spelling of the CDC
  * feed — batch AND streaming. */
class GraftStreamingSqlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cat: String = {
    val wh = tmpDir("gstream_wh")
    spark.conf.set("spark.sql.catalog.gstr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gstr.lake")
    "gstr"
  }
  private def rootOf(name: String): String =
    spark.conf.get(s"spark.sql.catalog.$cat.warehouse") + s"/lake/$name"

  test("writeStream.toTable appends exactly once per batch, partition-routed, stats indexed") {
    spark.sql(s"CREATE TABLE $cat.lake.sink (id BIGINT, s STRING, seg STRING) " +
      "PARTITIONED BY (seg) TBLPROPERTIES ('graft.statsColumns'='id')")
    val dir = tmpDir("gstream_sink")
    val in = s"$dir/in"
    Seq((1L, "a", "A"), (2L, "b", "B")).toDF("id", "s", "seg")
      .coalesce(1).write.parquet(s"$in/f0")
    Seq((3L, "c", "A")).toDF("id", "s", "seg")
      .coalesce(1).write.parquet(s"$in/f1")
    new java.io.File(s"$in/f0").listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach { f => f.setLastModified(1500000000000L); () }
    new java.io.File(s"$in/f1").listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach { f => f.setLastModified(1500000060000L); () }
    val schema = Seq((0L, "", "")).toDF("id", "s", "seg").schema
    def drain(): Unit = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true")
      .parquet(in)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .toTable(s"$cat.lake.sink").awaitTermination()
    drain()
    val t = IncrementalTable(spark, rootOf("sink"))
    assert(t.read().select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // two micro-batches = two append commits, each with the replay guard
    assert(t.commits().count(c => c.action == "append" && c.add.nonEmpty) == 2)
    // partition routing reached the hive layout (executor-side writer)
    assert(t.read(Map("seg" -> "A")).count() == 2)
    val files = t.liveFiles()
    assert(files.nonEmpty && files.forall(_.startsWith("seg=")), files.toString)
    // the staged footers fed the skipping index (graft.statsColumns)
    val stats = t.liveFileStats()
    assert(stats.nonEmpty && stats.values.forall(_.contains("id")), stats.toString)
    // re-drain from the same checkpoint: replay guard, nothing re-commits
    drain()
    t.refresh()
    assert(t.read().count() == 3)
    assert(t.commits().count(c => c.action == "append" && c.add.nonEmpty) == 2)
  }

  test("readStream.table drains commits and resumes incrementally") {
    spark.sql(s"CREATE TABLE $cat.lake.src (id BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.lake.src VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.lake.src VALUES (3, 'c')")
    val ckpt = tmpDir("gstream_src") + "/ckpt"
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    def drain(): Unit = {
      val q = spark.readStream
        .option("maxCommitsPerTrigger", 1).table(s"$cat.lake.src")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = b.collect().map(r => (id, r.getLong(0), r.getString(1)))
          got.synchronized { got ++= rows }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    // create-table commit (v0, empty) + one commit per INSERT, one per batch
    assert(got.map(r => (r._2, r._3)).sorted.toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).values.toSet ==
      Set(Set(1L, 2L), Set(3L)))
    got.clear()
    spark.sql(s"INSERT INTO $cat.lake.src VALUES (4, 'd')")
    drain()
    assert(got.map(r => (r._2, r._3)).toSeq == Seq((4L, "d")))
    // readChangeFeed is a path-door option; the catalog spelling is the
    // .changes metadata table
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      spark.readStream.option("readChangeFeed", "true").table(s"$cat.lake.src")
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("gstream_cdcrefuse") + "/ckpt")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(e.getCause.getMessage.contains("changes"), e.getCause.getMessage)
  }

  test("t.changes metadata table: batch CDC read and streaming CDC feed by name") {
    spark.sql(s"CREATE TABLE $cat.lake.cdc (id BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.lake.cdc VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql(s"DELETE FROM $cat.lake.cdc WHERE id = 1")              // v2 rewrite
    spark.sql(s"INSERT INTO $cat.lake.cdc VALUES (3, 'c')")           // v3
    // batch: the full logical history as a relation
    val hist = spark.sql(s"SELECT id, s, _change_type, _commit_version " +
        s"FROM $cat.lake.cdc.changes ORDER BY _commit_version, _change_type, id")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(hist == Seq((1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (1L, "a", "delete", 2L), (3L, "c", "insert", 3L)))
    // streaming: the same feed incrementally, rewrites as delete rows
    val got = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    val ckpt = tmpDir("gstream_cdc") + "/ckpt"
    def drain(): Unit = {
      val q = spark.readStream
        .option("maxCommitsPerTrigger", 1).table(s"$cat.lake.cdc.changes")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect().map(r =>
            (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
          got.synchronized { got ++= rows }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(got.sortBy(r => (r._4, r._3, r._1)).toSeq == hist)
    // resume: only the delta arrives
    got.clear()
    spark.sql(s"DELETE FROM $cat.lake.cdc WHERE id = 2") // v4
    drain()
    assert(got.toSeq == Seq((2L, "b", "delete", 4L)))
  }

  test("Complete output mode replaces the table per epoch (maintained view)") {
    spark.sql(s"CREATE TABLE $cat.lake.agg (s STRING, n BIGINT)")
    val dir = tmpDir("gstream_agg")
    val in = s"$dir/in"
    Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("s", "v")
      .coalesce(1).write.parquet(s"$in/f0")
    val schema = Seq(("", 0L)).toDF("s", "v").schema
    spark.readStream.schema(schema).option("recursiveFileLookup", "true")
      .parquet(in)
      .groupBy($"s").count().withColumnRenamed("count", "n")
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .toTable(s"$cat.lake.agg").awaitTermination()
    val t = IncrementalTable(spark, rootOf("agg"))
    assert(t.read().as[(String, Long)].collect().toSet ==
      Set(("a", 2L), ("b", 1L)))
    // a second arrival: the epoch REPLACES the maintained result
    Seq(("b", 9L)).toDF("s", "v").coalesce(1).write.parquet(s"$in/f1")
    spark.readStream.schema(schema).option("recursiveFileLookup", "true")
      .parquet(in)
      .groupBy($"s").count().withColumnRenamed("count", "n")
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .toTable(s"$cat.lake.agg").awaitTermination()
    t.refresh()
    assert(t.read().as[(String, Long)].collect().toSet ==
      Set(("a", 2L), ("b", 2L)))
    assert(t.commits().last.action == "replace")
  }

  test("streaming write validates CHECK constraints before anything commits") {
    spark.sql(s"CREATE TABLE $cat.lake.guard (id BIGINT, s STRING, " +
      "CONSTRAINT pos CHECK (id > 0))")
    val dir = tmpDir("gstream_guard")
    val in = s"$dir/in"
    Seq((-1L, "bad")).toDF("id", "s").coalesce(1).write.parquet(s"$in/f0")
    val schema = Seq((0L, "")).toDF("id", "s").schema
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      spark.readStream.schema(schema).option("recursiveFileLookup", "true")
        .parquet(in)
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .toTable(s"$cat.lake.guard").awaitTermination()
    }
    assert(e.getCause.getMessage.contains("pos"), e.getCause.getMessage)
    val t = IncrementalTable(spark, rootOf("guard"))
    assert(t.read().count() == 0)
    assert(!t.commits().exists(_.add.nonEmpty))
  }
}
