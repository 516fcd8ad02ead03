package graft.table

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** X98: write-audit-publish staged commits (the Iceberg `wap.id`
  * analog). A staged write promotes its files but commits only an
  * invisible `staged` record carrying the write's intent in a
  * `wap/<id>` meta entry — readers, CDC, streams, and vacuum-protection
  * all behave as if nothing happened until publishWap() adopts the
  * files in ONE atomic metadata commit; abortWap() tombstones and
  * drops them. The training-data ingest contract: a risky crawl batch
  * is audited against the staged state and only a clean batch ever
  * becomes visible. */
class WapSpec extends SparkSpec {
  import spark.implicits._

  test("staging is invisible; audit sees it; publish adopts it atomically") {
    val t = IncrementalTable(spark, tmpDir("wap") + "/t")
    t.append(spark.range(0, 10).toDF("id"), Nil)
    val v0 = t.latestVersion

    t.stageAppend(spark.range(10, 15).toDF("id"), "crawl-1")
    // nothing visible: snapshot, CDC, pending registry is the only trace
    assert(t.read().count() == 10)
    assert(t.changes(v0 + 1).count() == 0)
    assert(t.pendingWaps.keySet == Set("crawl-1"))
    // the audit frame IS base ∪ staged
    assert(t.readWap("crawl-1").as[Long].collect().sorted.toSeq == (0L until 15L))
    // audit is a pure read — repeatable, still pending
    assert(t.readWap("crawl-1").count() == 15)
    assert(t.pendingWaps.keySet == Set("crawl-1"))

    val pub = t.publishWap("crawl-1")
    assert(pub.action == "append" && pub.add.size >= 1)
    assert(t.read().as[Long].collect().sorted.toSeq == (0L until 15L))
    // CDC emits the staged rows AT the publish version, not the staging
    val feed = t.changes(pub.version, pub.version)
    assert(feed.filter(col("_change_type") === "insert").count() == 5)
    assert(t.pendingWaps.isEmpty)
    intercept[IllegalArgumentException](t.publishWap("crawl-1"))
  }

  test("stacked stagings under one id publish as ONE atomic commit") {
    val t = IncrementalTable(spark, tmpDir("wap") + "/stack")
    t.append(spark.range(0, 5).toDF("id"), Nil)
    t.stageAppend(spark.range(5, 10).toDF("id"), "backfill")
    t.stageAppend(spark.range(10, 15).toDF("id"), "backfill")
    // the audit frame sees BOTH staged batches
    assert(t.readWap("backfill").count() == 15)
    assert(t.pendingWaps("backfill").add.size >= 2)
    // a mismatched stacking refuses
    intercept[IllegalArgumentException](t.stageReplaceWhere(
      spark.range(0, 1).toDF("id"), "backfill", Nil, Map.empty, Map.empty))
    val pub = t.publishWap("backfill")
    assert(pub.add.size >= 2)
    assert(t.read().as[Long].collect().sorted.toSeq == (0L until 15L))
    // both batches land at ONE commit version in the change feed
    assert(t.changes(pub.version, pub.version).count() == 10)
    // a published id is reusable
    t.stageAppend(spark.range(15, 16).toDF("id"), "backfill")
    t.abortWap("backfill")
  }

  test("abort tombstones the staging and drops its files") {
    val dir = tmpDir("wap") + "/abort"
    val t = IncrementalTable(spark, dir)
    t.append(spark.range(0, 5).toDF("id"), Nil)
    t.stageAppend(spark.range(5, 8).toDF("id"), "bad-batch")
    val staged = t.pendingWaps("bad-batch").add
    assert(staged.nonEmpty)
    val dropped = t.abortWap("bad-batch")
    assert(dropped == staged)
    assert(t.read().count() == 5)
    assert(t.pendingWaps.isEmpty)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    staged.foreach { f =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, f)),
        s"aborted staged file survived: $f")
    }
    intercept[IllegalArgumentException](t.readWap("bad-batch"))
    // the id is free again
    t.stageAppend(spark.range(5, 8).toDF("id"), "bad-batch")
    t.publishWap("bad-batch")
    assert(t.read().count() == 8)
  }

  test("vacuum protects pending staged files") {
    val t = IncrementalTable(spark, tmpDir("wap") + "/vac")
    t.append(spark.range(0, 5).toDF("id"), Nil)
    t.stageAppend(spark.range(5, 9).toDF("id"), "pending")
    val staged = t.pendingWaps("pending").add
    val reclaimed = t.vacuum()
    assert(!reclaimed.exists(staged.contains),
      s"vacuum ate pending staged files: ${reclaimed.filter(staged.contains)}")
    // still fully auditable and publishable after the vacuum
    assert(t.readWap("pending").count() == 9)
    t.publishWap("pending")
    assert(t.read().as[Long].collect().sorted.toSeq == (0L until 9L))
  }

  test("staged replaceWhere: removal set computed at publish time") {
    val t = IncrementalTable(spark, tmpDir("wap") + "/rw")
    def day(d: Int, from: Int, until: Int) =
      spark.range(from, until).toDF("id").withColumn("day", lit(d))
    t.append(day(1, 0, 5), Seq("day"))
    t.append(day(2, 100, 105), Seq("day"))
    t.stageReplaceWhere(day(1, 50, 52), "reingest",
      Seq("day"), Map.empty, Map("day" -> "1"))
    // a writer lands MORE day=1 data while the audit runs — the staged
    // replace must scope it out at publish, not just the stage-time files
    t.append(day(1, 5, 8), Seq("day"))
    assert(t.read(Map("day" -> "1")).count() == 8)
    t.publishWap("reingest")
    assert(t.read(Map("day" -> "1")).select("id").as[Long].collect().sorted.toSeq
      == Seq(50L, 51L))
    assert(t.read(Map("day" -> "2")).count() == 5)
    // staged files outside the declared scope refuse to publish
    t.stageReplaceWhere(day(2, 0, 1), "wrong-scope",
      Seq("day"), Map.empty, Map("day" -> "1"))
    intercept[IllegalArgumentException](t.publishWap("wrong-scope"))
    t.abortWap("wrong-scope")
  }

  test("row-id mints never collide: the staging commit reserves its high-water") {
    val t = IncrementalTable(spark, tmpDir("wap") + "/rid")
    t.create(org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"),
      meta = Map("prop/graft.rowTracking" -> "true"))
    t.append(spark.range(0, 5).toDF("id"), Nil)
    t.stageAppend(spark.range(5, 8).toDF("id"), "race")
    // a write AFTER the staging mints above the staged reservation —
    // no collision, and the later publish needs no restage
    t.append(spark.range(100, 103).toDF("id"), Nil)
    // a second stacked staging mints above both
    t.stageAppend(spark.range(8, 10).toDF("id"), "race")
    t.publishWap("race")
    assert(t.read().count() == 13)
    // every row id unique across published + staged-then-published rows
    val ids = t.changes(0, includeRowId = true)
      .filter(col("_change_type") === "insert")
      .select("_row_id").as[Long].collect().toSeq
    assert(ids.distinct.size == ids.size, "row-id collision after WAP publish")
  }

  test("partition-spec evolution since stage refuses publish") {
    val t = IncrementalTable(spark, tmpDir("wap") + "/evo")
    t.append(spark.range(0, 5).toDF("id").withColumn("day", lit(1)), Seq("day"))
    t.stageAppend(spark.range(5, 8).toDF("id").withColumn("day", lit(1)),
      "stale-routing", Seq("day"))
    t.evolvePartitioning(Seq("day", "id"))
    intercept[ConcurrentWriteException](t.publishWap("stale-routing"))
    t.abortWap("stale-routing")
  }

  test("schema evolution flows through staging: audit sees the new column") {
    val t = IncrementalTable(spark, tmpDir("wap") + "/schema")
    t.append(spark.range(0, 3).toDF("id"), Nil)
    t.stageAppend(
      spark.range(3, 5).toDF("id").withColumn("lang", lit("en")), "wide")
    // the audit frame reads under the merged schema: old rows null-fill
    val audit = t.readWap("wide")
    assert(audit.columns.toSeq == Seq("id", "lang"))
    assert(audit.filter(col("lang").isNull).count() == 3)
    // ...but the COMMITTED schema is untouched until publish
    assert(t.read().columns.toSeq == Seq("id"))
    t.publishWap("wide")
    assert(t.read().columns.toSeq == Seq("id", "lang"))
    assert(t.read().filter(col("lang") === "en").count() == 2)
  }

  test("SQL front door: INSERT under spark.graft.wap.id stages; " +
      "CALL wap_publish / wap_abort close the loop") {
    val wh = tmpDir("wap_wh")
    spark.conf.set("spark.sql.catalog.wapcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wapcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wapcat.lake")
    spark.sql("CREATE TABLE wapcat.lake.w (id BIGINT)")
    spark.sql("INSERT INTO wapcat.lake.w SELECT id FROM range(5)")
    try {
      // the UNTOUCHED ingest statement stages once the session opts in
      spark.conf.set("spark.graft.wap.id", "nightly")
      spark.sql("INSERT INTO wapcat.lake.w SELECT id + 5 FROM range(5)")
      assert(spark.sql("SELECT * FROM wapcat.lake.w").count() == 5)
    } finally spark.conf.unset("spark.graft.wap.id")
    // the audit itself runs in pure SQL against the staged state
    assert(spark.sql(
      "SELECT * FROM wapcat.lake.w VERSION AS OF 'wap:nightly'").count() == 10)
    assert(spark.sql("SELECT max(id) AS m FROM wapcat.lake.w " +
      "VERSION AS OF 'wap:nightly'").as[Long].head() == 9L)
    // pending stagings are discoverable: the `waps` metadata table
    val waps = spark.sql("SELECT id, action, n_files FROM wapcat.lake.w.waps")
      .as[(String, String, Long)].collect().toSeq
    assert(waps.map(w => (w._1, w._2)) == Seq(("nightly", "append")))
    assert(waps.head._3 >= 1)
    val pub = spark.sql(
      "CALL wapcat.system.wap_publish('lake.w', 'nightly')").collect().head
    assert(pub.getAs[Int]("files_added") >= 1)
    assert(spark.sql("SELECT * FROM wapcat.lake.w").count() == 10)
    // abort path: a staged batch that never becomes visible
    try {
      spark.conf.set("spark.graft.wap.id", "bad")
      spark.sql("INSERT INTO wapcat.lake.w SELECT id + 100 FROM range(3)")
    } finally spark.conf.unset("spark.graft.wap.id")
    assert(spark.sql("SELECT * FROM wapcat.lake.w").count() == 10)
    val ab = spark.sql(
      "CALL wapcat.system.wap_abort('lake.w', 'bad')").collect().head
    assert(ab.getAs[Int]("files_dropped") >= 1)
    assert(spark.sql("SELECT * FROM wapcat.lake.w").count() == 10)
    // staged INSERT OVERWRITE of a partition scope publishes as the scope
    spark.sql("CREATE TABLE wapcat.lake.wp (id BIGINT, seg STRING) " +
      "PARTITIONED BY (seg)")
    spark.sql("INSERT INTO wapcat.lake.wp " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END FROM range(10)")
    try {
      spark.conf.set("spark.graft.wap.id", "refresh-a")
      spark.sql("INSERT OVERWRITE wapcat.lake.wp PARTITION (seg = 'A') " +
        "SELECT id + 1000 FROM range(2)")
    } finally spark.conf.unset("spark.graft.wap.id")
    assert(spark.sql(
      "SELECT * FROM wapcat.lake.wp WHERE seg = 'A'").count() == 5)
    spark.sql("CALL wapcat.system.wap_publish('lake.wp', 'refresh-a')")
    assert(spark.sql("SELECT id FROM wapcat.lake.wp WHERE seg = 'A'")
      .as[Long].collect().sorted.toSeq == Seq(1000L, 1001L))
    assert(spark.sql(
      "SELECT * FROM wapcat.lake.wp WHERE seg = 'B'").count() == 5)
  }

  test("path front door: the wapId write option stages") {
    val dir = tmpDir("wap") + "/path"
    val t = IncrementalTable(spark, dir)
    t.append(spark.range(0, 4).toDF("id"), Nil)
    spark.range(4, 7).toDF("id").write.format("graft")
      .mode("append").option("wapId", "opt-staged").save(dir)
    t.refresh()
    assert(t.read().count() == 4)
    assert(t.pendingWaps.keySet == Set("opt-staged"))
    t.publishWap("opt-staged")
    assert(t.read().count() == 7)
  }

  test("derived streams skip stagings and apply the publish") {
    val dir = tmpDir("wap") + "/stream"
    val up = IncrementalTable(spark, dir + "/up")
    val down = IncrementalTable(spark, dir + "/down")
    val hop = new graft.streaming.DerivedStream(up, down, Nil,
      df => df.filter(col("id") % 2 === 0), name = "wap-hop")
    up.append(spark.range(0, 10).toDF("id"), Nil)
    hop.drain()
    assert(down.read().count() == 5)
    up.stageAppend(spark.range(10, 20).toDF("id"), "audit-me")
    // the staging drains as a no-op — downstream unchanged
    hop.drain()
    assert(down.read().count() == 5)
    up.publishWap("audit-me")
    hop.drain()
    assert(down.read().count() == 10)
  }
}
