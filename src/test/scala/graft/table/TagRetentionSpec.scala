package graft.table

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Durable snapshot tags (X101, Iceberg expire-snapshots-honors-refs):
  * a tagged version stays readable past the checkpoint replay horizon
  * (raw-delta replay) and vacuum keeps its files and DV generations
  * until the tag drops — the training-run reproducibility pin. */
class TagRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, from: Int = 0) =
    spark.range(from, from + n).select(col("id"), (col("id") * 2).as("v"))

  test("tagged version reads past the replay horizon; untagged fails loudly") {
    val t = new IncrementalTable(spark, tmpDir("tag") + "/t1", checkpointEvery = 3)
    t.append(rows(10), Nil) // v0
    t.append(rows(10, 10), Nil) // v1
    t.setTag("corpus-v1", 1) // v2
    // cross several checkpoints so v2 falls behind the horizon
    (0 until 8).foreach(i => t.append(rows(5, 100 + i * 5), Nil))
    assert(t.commits().head.version > 1, "horizon did not move")
    assert(t.readAt(1).count() == 20)
    assert(t.readAt(1).agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) ==
      (0 until 20).map(_ * 2L).sum)
    val e = intercept[IllegalArgumentException](t.readAt(0).count())
    assert(e.getMessage.contains("TAGGED"), e.getMessage)
  }

  test("vacuum keeps a tagged snapshot's files; dropTag releases them") {
    val t = new IncrementalTable(spark, tmpDir("tag") + "/t2", checkpointEvery = 3)
    t.append(rows(100), Nil)
    t.setTag("pin", 0)
    // rewrite the whole table repeatedly: v1's files leave the live set
    // and (after checkpoints truncate replay) would be vacuum bait
    (0 until 8).foreach { i =>
      t.replaceWhere(rows(50, 1000 + i), Nil, Map.empty, Map.empty)
    }
    t.vacuum()
    // the pinned snapshot still reads exactly
    assert(t.readAt(0).count() == 100)
    assert(t.tags == Map("pin" -> 0L))
    t.dropTag("pin")
    val reclaimed = t.vacuum()
    assert(reclaimed.nonEmpty, "dropTag should release the pinned files")
    intercept[Exception](t.readAt(0).count())
  }

  test("tagged snapshot preserves in-force deletion vectors") {
    val t = new IncrementalTable(spark, tmpDir("tag") + "/t3", checkpointEvery = 3)
    t.append(rows(100), Nil)
    t.delete(col("id") < 10) // DV generation in force
    val v = t.latestVersion
    t.setTag("after-delete", v)
    (0 until 8).foreach { i =>
      t.replaceWhere(rows(50, 2000 + i), Nil, Map.empty, Map.empty)
    }
    t.vacuum()
    assert(t.readAt(v).count() == 90, "tagged read must still apply its DVs")
    assert(t.readAt(v).agg(org.apache.spark.sql.functions.min("id")).head.getLong(0) == 10L)
  }

  test("SQL front door: VERSION AS OF a tag resolves past the horizon") {
    val wh = tmpDir("tag_wh")
    spark.conf.set("spark.sql.catalog.tagc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tagc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tagc.lake")
    spark.sql("CREATE TABLE tagc.lake.pins (id BIGINT, v BIGINT)")
    val t = IncrementalTable(spark, s"$wh/lake/pins")
    spark.sql("INSERT INTO tagc.lake.pins SELECT id, id * 2 FROM range(20)")
    spark.sql(s"CALL tagc.system.tag('lake.pins', 'v1')")
    (0 until IncrementalTable.checkpointInterval + 5).foreach { i =>
      spark.sql(s"INSERT INTO tagc.lake.pins VALUES ($i + 100, $i)")
    }
    t.refresh()
    assert(t.commits().head.action == "checkpoint" && t.commits().head.version > 2,
      "horizon did not move past the tag")
    assert(spark.sql(
      "SELECT count(*) FROM tagc.lake.pins VERSION AS OF 'v1'").head.getLong(0) == 20)
  }
}
