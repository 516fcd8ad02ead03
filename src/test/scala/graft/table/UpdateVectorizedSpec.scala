package graft.table

import org.apache.spark.sql.functions.{col, concat, lit}

import graft.SparkSpec

/** Merge-on-read UPDATE (X82): matched rows are shadowed by a deletion
  * vector and re-appended with assignments applied — one atomic commit,
  * zero data files rewritten. */
class UpdateVectorizedSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
    (4L, "d", 40L), (5L, "e", 50L)
  ).toDF("k", "v", "n")

  test("basic: values update, no data file rewritten, one commit") {
    val t = IncrementalTable(spark, tmpDir("uv") + "/t1")
    t.append(df, Nil)
    val before = t.liveFiles().toSet
    val v0 = t.latestVersion
    t.updateVectorized(col("k") % 2 === 0, Map("n" -> (col("n") + 1000L)))
    assert(t.latestVersion == v0 + 1) // ONE commit
    // every pre-update file still live (shadowed, not rewritten), plus adds
    assert(before.subsetOf(t.liveFiles().toSet))
    assert(t.liveFiles().size > before.size)
    assert(t.read().select("k", "n").as[(Long, Long)].collect().sorted.toSeq ==
      Seq((1L, 10L), (2L, 1020L), (3L, 30L), (4L, 1040L), (5L, 50L)))
    // history shows the update action with its dv attachment
    val h = t.history().filter(col("action") === "update").collect()
    assert(h.length == 1)
  }

  test("CDC: an update commit renders as exact pre-image deletes + post-image inserts") {
    val t = IncrementalTable(spark, tmpDir("uv") + "/t2")
    t.append(df, Nil)
    val c = t.updateVectorized(col("k") <= 2, Map("v" -> concat(col("v"), lit("!")))).get
    val ch = t.changes(c.version, c.version)
      .select("k", "v", "_change_type").as[(Long, String, String)]
      .collect().sortBy(r => (r._3, r._1)).toSeq
    assert(ch == Seq(
      (1L, "a", "delete"), (2L, "b", "delete"),
      (1L, "a!", "insert"), (2L, "b!", "insert")))
  }

  test("chained MOR ops: update over prior dv deletes, then delete over updates") {
    val t = IncrementalTable(spark, tmpDir("uv") + "/t3")
    t.append(df, Nil)
    t.deleteVectorized(col("k") === 5L)
    // k=5 is already shadowed: the update must not resurrect it
    t.updateVectorized(col("n") >= 30L, Map("n" -> (col("n") * 10L)))
    assert(t.read().select("k", "n").as[(Long, Long)].collect().sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 300L), (4L, 400L)))
    t.deleteVectorized(col("n") === 300L) // deletes the UPDATED copy
    assert(t.read().select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L))
    // compaction materializes everything back to plain files
    t.compact(targetFiles = 1)
    assert(t.read().select("k", "n").as[(Long, Long)].collect().sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L), (4L, 400L)))
  }

  test("updating a partition column routes the post-image to its new dir") {
    val t = IncrementalTable(spark, tmpDir("uv") + "/t4")
    val p = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("k", "seg")
    t.create(p.schema, Seq("seg"))
    t.append(p, Seq("seg"))
    t.updateVectorized(col("k") === 1L, Map("seg" -> lit("C")))
    assert(t.read(Map("seg" -> "C")).select("k").as[Long].collect().toSeq ==
      Seq(1L))
    assert(t.read(Map("seg" -> "A")).select("k").as[Long].collect().toSeq ==
      Seq(2L))
    assert(t.read().count() == 3)
  }

  test("loud validation: unknown column, silent type change, no matches") {
    val t = IncrementalTable(spark, tmpDir("uv") + "/t5")
    t.append(df, Nil)
    intercept[IllegalArgumentException](
      t.updateVectorized(lit(true), Map("nope" -> lit(1))))
    val e = intercept[IllegalArgumentException](
      t.updateVectorized(lit(true), Map("n" -> lit(1))))
    assert(e.getMessage.contains("cast explicitly"), e.getMessage)
    // no matching rows: no commit at all
    val v0 = t.latestVersion
    assert(t.updateVectorized(col("k") === 999L, Map("n" -> lit(0L))).isEmpty)
    assert(t.latestVersion == v0)
  }

  test("SQL: graft.deletionVectors=true flips UPDATE and DELETE to merge-on-read") {
    val wh = tmpDir("uv_wh")
    spark.conf.set("spark.sql.catalog.uvcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.uvcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS uvcat.lake")
    spark.sql("CREATE TABLE uvcat.lake.mor (k BIGINT, n BIGINT) " +
      "TBLPROPERTIES ('graft.deletionVectors'='true')")
    spark.sql("INSERT INTO uvcat.lake.mor SELECT id, id * 10 FROM range(100)")
    val t = IncrementalTable(spark, s"$wh/lake/mor")
    val files0 = t.liveFiles().toSet
    spark.sql("UPDATE uvcat.lake.mor SET n = n + 1 WHERE k < 10")
    spark.sql("DELETE FROM uvcat.lake.mor WHERE k >= 90")
    t.refresh() // the SQL DML committed through the catalog's handle
    // merge-on-read: every original file still live, never rewritten
    assert(files0.subsetOf(t.liveFiles().toSet))
    assert(t.history().filter(col("action") === "update").count() == 1)
    assert(t.history().filter(col("action") === "dv").count() == 1)
    assert(spark.sql("SELECT COUNT(*), SUM(n) FROM uvcat.lake.mor")
      .as[(Long, Long)].head() ==
      ((90L, (0L until 90L).map(_ * 10).sum + 10)))
    ()
  }
}
