package graft.table

import org.apache.spark.sql.functions.{col, expr, lit}

import graft.SparkSpec

/** X104: equality deletes — merge-on-read delete by KEY (the Iceberg v2
  * equality-delete analog). `deleteByKey` writes the distinct key
  * tuples as a sidecar and commits O(metadata): no scan, no touched
  * -file detection, no rewrite. The delete applies to files added AT
  * OR BEFORE its base snapshot; later appends escape by version
  * ordering — so delete-then-append IS an upsert. Readers anti-join
  * the (broadcast) key sets; rewrites apply deletes physically so
  * nothing resurrects; vacuum retires inert entries and reclaims
  * sidecars once no retention surface can consult them. */
class EqualityDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def seeded(name: String): IncrementalTable = {
    val t = IncrementalTable(spark, tmpDir("eqdel") + s"/$name")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), Nil,
      statsColumns = Seq("id"))
    t.append(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), Nil,
      statsColumns = Seq("id"))
    t
  }

  test("MOR delete by key: O(metadata) commit, later append escapes (upsert)") {
    val t = seeded("upsert")
    val before = t.detail().head.getAs[Long]("num_files")
    val c = t.deleteByKey(Seq(Tuple1(2L)).toDF("id"), Seq("id")).get
    assert(c.action == "eqdelete" && c.add.isEmpty && c.remove.isEmpty,
      "the delete must move no data")
    assert(t.detail().head.getAs[Long]("num_files") == before)
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 4L, 5L))
    // the upsert contract: a NEW row under the deleted key lives
    t.append(Seq((2L, "b2")).toDF("id", "v"), Nil)
    assert(t.read().filter($"id" === 2L).select("v").as[String].collect()
      .toSeq == Seq("b2"))
    // a SECOND delete (new base) removes old and new alike
    t.deleteByKey(Seq(Tuple1(2L)).toDF("id"), Seq("id"))
    assert(t.read().filter($"id" === 2L).count() == 0)
    // empty key set elides; null keys match nothing (SQL join semantics)
    assert(t.deleteByKey(Seq.empty[Tuple1[Long]].toDF("id"), Seq("id")).isEmpty)
    t.deleteByKey(Seq(Tuple1(Option.empty[Long])).toDF("id"), Seq("id"))
    assert(t.read().count() == 4)
  }

  test("rewrites apply deletes physically — nothing resurrects") {
    val t = seeded("rewrite")
    t.deleteByKey(Seq(Tuple1(1L)).toDF("id"), Seq("id"))
    // copy-on-write UPDATE rewrites the touched file: the eqdel'd row
    // co-located with the updated one must not ride back in
    t.update(col("id") === 3L, Map("v" -> lit("c2")))
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L, 4L, 5L))
    // compaction materializes the delete...
    t.compact()
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L, 4L, 5L))
    // ...and vacuum retires the now-inert entry
    assert(t.eqDeletes().nonEmpty)
    t.vacuum()
    assert(t.eqDeletes().isEmpty, "vacuum must retire an inert delete")
    assert(t.read().count() == 4)
  }

  test("stats surfaces decline under standing deletes; recover after retire") {
    val t = seeded("stats")
    assert(t.liveRowCount().contains(5L))
    t.deleteByKey(Seq(Tuple1(5L)).toDF("id"), Seq("id"))
    assert(t.liveRowCount().isEmpty, "row-count metadata answer would overcount")
    assert(t.liveMinMax("id").isEmpty, "the deleted row may be the extreme")
    assert(t.read().count() == 4) // the scan answer stays exact
    t.compact(statsColumns = Seq("id")); t.vacuum()
    assert(t.liveRowCount().contains(4L))
  }

  test("time travel and restore revive pre-delete snapshots") {
    val t = seeded("restore")
    val vBefore = t.latestVersion
    t.deleteByKey(Seq(Tuple1(1L), Tuple1(4L)).toDF("id"), Seq("id"))
    assert(t.readAt(vBefore).count() == 5, "pre-delete snapshot is whole")
    assert(t.read().count() == 3)
    // restore re-adds the files at the restore version — they escape
    // the standing delete by version ordering, reviving the snapshot
    t.restore(vBefore)
    assert(t.read().count() == 5)
  }

  test("CDC: the eqdelete commit emits exactly the matched rows as deletes") {
    val t = seeded("cdc")
    val c = t.deleteByKey(Seq(Tuple1(2L), Tuple1(4L), Tuple1(99L)).toDF("id"),
      Seq("id")).get
    val feed = t.changes(c.version, c.version)
    assert(feed.filter($"_change_type" === "delete")
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    assert(feed.filter($"_change_type" =!= "delete").count() == 0)
    // a second delete overlapping the first re-emits NOTHING for the
    // already-deleted key
    val c2 = t.deleteByKey(Seq(Tuple1(2L), Tuple1(5L)).toDF("id"), Seq("id")).get
    assert(t.changes(c2.version, c2.version)
      .select("id").as[Long].collect().toSeq == Seq(5L))
    // the full window replays delete(2,4) then delete(5) exactly once
    val window = t.changes(c.version, c2.version)
    assert(window.filter($"_change_type" === "delete").count() == 3)
    // a rewrite that materializes the deletes cancels cleanly: compact
    // is a maintenance no-op, and an UPDATE emits only its own pair
    val c3 = t.update(col("id") === 1L, Map("v" -> lit("a2"))).get
    val upd = t.changes(c3.version, c3.version)
    assert(upd.filter($"_change_type" === "delete")
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(upd.filter($"_change_type" === "insert")
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("multi-column keys survive a rename (physical key storage)") {
    val t = IncrementalTable(spark, tmpDir("eqdel") + "/ren")
    t.append(Seq((1L, "en", "web"), (2L, "en", "book"), (3L, "de", "web"))
      .toDF("id", "lang", "src"), Nil)
    t.deleteByKey(Seq(("en", "web")).toDF("lang", "src"), Seq("lang", "src"))
    assert(t.read().select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    t.renameColumn("lang", "language")
    assert(t.read().select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L),
      "the delete must keep applying under the renamed column")
    // and a delete issued AFTER the rename addresses the new name
    t.deleteByKey(Seq(("en", "book")).toDF("language", "src"),
      Seq("language", "src"))
    assert(t.read().select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("vacuum reclaims sidecars once nothing can consult them") {
    val root = tmpDir("eqdel") + "/gc"
    val t = new IncrementalTable(spark, root, checkpointEvery = 5)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Nil)
    t.deleteByKey(Seq(Tuple1(1L)).toDF("id"), Seq("id"))
    t.compact()
    t.vacuum() // retires the inert entry (tombstone commit)
    assert(t.eqDeletes().isEmpty)
    val eqRoot = new java.io.File(root, "_graft_eqdel")
    assert(eqRoot.listFiles().nonEmpty,
      "sidecar stays while the issuing commit is in the replay window")
    // march the horizon past every commit that carried the entry
    (0 until 9).foreach(i => t.setProperties(Map(s"k$i" -> "v")))
    t.vacuum()
    assert(eqRoot.listFiles() == null || eqRoot.listFiles().isEmpty,
      "past the horizon the sidecar must reclaim")
    assert(t.read().count() == 1)
  }

  private lazy val cat: String = {
    val wh = tmpDir("eqdel_wh")
    spark.conf.set("spark.sql.catalog.ecat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ecat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ecat.ns")
    "ecat"
  }

  test("SQL front door: CALL delete_by_key with a key-supplying query") {
    spark.sql(s"CREATE TABLE $cat.ns.k (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.ns.k VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    val out = spark.sql(s"CALL $cat.system.delete_by_key('ns.k', 'id', " +
      "'SELECT id FROM range(2, 4) AS t(id)')").collect()
    assert(out(0).getLong(0) >= 0)
    assert(spark.sql(s"SELECT id FROM $cat.ns.k ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 4L))
    // upsert through the same door: a later INSERT escapes
    spark.sql(s"INSERT INTO $cat.ns.k VALUES (2, 'b2')")
    assert(spark.sql(s"SELECT v FROM $cat.ns.k WHERE id = 2")
      .as[String].collect().toSeq == Seq("b2"))
    // the standing delete is queryable: one row, keyed on id
    val reg = spark.sql(s"SELECT key_columns FROM $cat.ns.k.eqdeletes")
      .as[String].collect().toSeq
    assert(reg == Seq("id"), reg.mkString(","))
  }

  test("reads through the catalog/path doors apply deletes") {
    val t = seeded("doors")
    t.deleteByKey(Seq(Tuple1(3L)).toDF("id"), Seq("id"))
    // path door (format("graft")) routes through GraftRelation.scanDf →
    // readFiles → the eqdel-applying choke point
    val viaPath = spark.read.format("graft").load(t.root)
    assert(viaPath.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L, 5L))
    // pruned scans compose: a filter that would hit the deleted row
    assert(viaPath.filter($"id" === 3L).count() == 0)
    // metadata COUNT(*) declines to a real scan and stays exact
    assert(viaPath.count() == 4)
  }
}
