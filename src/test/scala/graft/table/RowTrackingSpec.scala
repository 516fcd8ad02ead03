package graft.table

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** Row tracking (X87, VERDICT r8 #3): `graft.rowTracking=true` mints a
  * stable physical `_graft_rid` per row at the write choke point,
  * carries it through CoW/MOR rewrites and compaction, and teaches
  * `changes()` to pair pre/post images into
  * update_preimage/update_postimage — so CDC consumers can distinguish
  * an UPDATE from a DELETE+INSERT. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def tracked(root: String): IncrementalTable = {
    val t = IncrementalTable(spark, root)
    t.create(StructType.fromDDL("id BIGINT, v STRING"),
      meta = Map("prop/graft.rowTracking" -> "true"))
    t
  }

  private def rids(t: IncrementalTable): Map[Long, Long] =
    t.liveFiles().flatMap { f =>
      spark.read.parquet(s"${t.root}/$f")
        .select(col("id"), col(IncrementalTable.RowIdCol))
        .as[(Long, Long)].collect()
    }.toMap

  private def changeTypes(t: IncrementalTable, from: Long): Map[String, Long] =
    t.changes(from).groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap

  test("ids mint unique across commits and never reach the logical schema") {
    val t = tracked(tmpDir("rtrk") + "/t1")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Nil)
    t.append(Seq((3L, "c")).toDF("id", "v"), Nil)
    assert(t.read().columns.toSeq == Seq("id", "v"))
    assert(t.schemaAt().get.fieldNames.toSeq == Seq("id", "v"))
    val m = rids(t)
    assert(m.size == 3 && m.values.toSet.size == 3, m.toString)
  }

  test("CoW UPDATE renders as update_preimage/update_postimage; untouched rows stay silent") {
    val t = tracked(tmpDir("rtrk") + "/t2")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .repartition(1), Nil)
    val before = rids(t)
    val v = t.latestVersion
    t.update(col("id") === 2L, Map("v" -> lit("B")))
    val ch = t.changes(v + 1)
    val byType = ch.groupBy("_change_type").count().as[(String, Long)]
      .collect().toMap
    // exactly one pre/post pair; rows 1 and 3 (rewritten untouched in
    // the same file) cancelled
    assert(byType == Map("update_preimage" -> 1L, "update_postimage" -> 1L),
      byType.toString)
    val pre = ch.filter($"_change_type" === "update_preimage")
      .select("id", "v").as[(Long, String)].collect().toSeq
    val post = ch.filter($"_change_type" === "update_postimage")
      .select("id", "v").as[(Long, String)].collect().toSeq
    assert(pre == Seq((2L, "b")) && post == Seq((2L, "B")))
    // the post-image kept its pre-image's id; others unchanged
    assert(rids(t) == before, s"${rids(t)} vs $before")
  }

  test("MOR updateVectorized pairs the same way") {
    val t = tracked(tmpDir("rtrk") + "/t3")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), Nil)
    val before = rids(t)
    val v = t.latestVersion
    t.updateVectorized(col("id") === 1L, Map("v" -> lit("A")))
    val byType = changeTypes(t, v + 1)
    assert(byType == Map("update_preimage" -> 1L, "update_postimage" -> 1L),
      byType.toString)
    assert(rids(t) == before)
  }

  test("a DELETE plus a separate INSERT of a similar row stays delete+insert") {
    val t = tracked(tmpDir("rtrk") + "/t4")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), Nil)
    val v = t.latestVersion
    t.delete(col("id") === 2L)
    t.append(Seq((2L, "b")).toDF("id", "v"), Nil) // same VALUES, new row
    val byType = changeTypes(t, v + 1)
    assert(byType == Map("delete" -> 1L, "insert" -> 1L), byType.toString)
  }

  test("ids are stable across compaction; the rewrite contributes no CDC rows") {
    val t = tracked(tmpDir("rtrk") + "/t5")
    t.append(Seq((1L, "a")).toDF("id", "v"), Nil)
    t.append(Seq((2L, "b")).toDF("id", "v"), Nil)
    val before = rids(t)
    val v = t.latestVersion
    t.compact(targetFiles = 1)
    assert(rids(t) == before)
    assert(changeTypes(t, v + 1).isEmpty)
  }

  test("merge: the replacing row inherits the matched row's id — an update pair; inserts mint") {
    val t = tracked(tmpDir("rtrk") + "/t6")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), Nil)
    val v = t.latestVersion
    t.merge(Seq((2L, "B2"), (9L, "i")).toDF("id", "v"), keys = Seq("id"))
    val byType = changeTypes(t, v + 1)
    assert(byType == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "insert" -> 1L), byType.toString)
    assert(t.read().count() == 3)
    assert(rids(t).values.toSet.size == 3)
  }

  test("includeRowId exposes the stable _row_id — the keyable IVM handle") {
    val t = tracked(tmpDir("rtrk") + "/t8")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), Nil)
    val v = t.latestVersion
    t.update(col("id") === 2L, Map("v" -> lit("B")))
    val ch = t.changes(v + 1, includeRowId = true)
    assert(ch.columns.contains("_row_id"), ch.columns.toSeq.toString)
    val pair = ch.filter($"_change_type".startsWith("update"))
      .select("_change_type", "_row_id").as[(String, Long)].collect().toMap
    // pre and post share ONE id — the join key an IVM consumer uses
    assert(pair.size == 2 && pair.values.toSet.size == 1, pair.toString)
    assert(pair("update_preimage") == rids(t)(2L))
    // untracked tables refuse loudly
    val u = IncrementalTable(spark, tmpDir("rtrk") + "/t8u")
    u.append(Seq((1L, "a")).toDF("id", "v"), Nil)
    intercept[IllegalArgumentException](u.changes(1, includeRowId = true).collect())
  }

  test("streaming CDC (readChangeFeed) delivers paired updates on tracked tables") {
    import org.apache.spark.sql.streaming.Trigger
    val t = tracked(tmpDir("rtrk") + "/t9")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), Nil)
    t.update(col("id") === 1L, Map("v" -> lit("A")))
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .load(t.root)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.collect().map(r =>
            (r.getAs[String]("_change_type"), r.getAs[Long]("id"),
              r.getAs[String]("v")))
        }
        ()
      }
      .option("checkpointLocation", tmpDir("rtrk") + "/t9ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val byType = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byType == Map("insert" -> 2, "update_preimage" -> 1,
      "update_postimage" -> 1), byType.toString)
    assert(got.contains(("update_preimage", 1L, "a")) &&
      got.contains(("update_postimage", 1L, "A")), got.toString)
  }

  test("rows written before tracking carry null ids and never pair") {
    val t = IncrementalTable(spark, tmpDir("rtrk") + "/t7")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), Nil)
    t.setProperties(Map("graft.rowTracking" -> "true"))
    val v = t.latestVersion
    t.update(col("id") === 2L, Map("v" -> lit("B")))
    // the rewrite mints fresh ids for the pre-tracking rows; the old
    // generation has none — pairing falls back to delete+insert and
    // the untouched row 1 still cancels by value? it cannot (its rid
    // differs from null) — both rows surface as delete+insert, honest
    // about the id discontinuity
    val byType = changeTypes(t, v + 1)
    assert(!byType.contains("update_preimage"), byType.toString)
    assert(byType.getOrElse("delete", 0L) >= 1L &&
      byType.getOrElse("insert", 0L) >= 1L, byType.toString)
    // from here on, tracking is in force: the next update pairs
    val v2 = t.latestVersion
    t.update(col("id") === 1L, Map("v" -> lit("A")))
    val byType2 = changeTypes(t, v2 + 1)
    assert(byType2 == Map("update_preimage" -> 1L, "update_postimage" -> 1L),
      byType2.toString)
  }
}
