package graft.table

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** Shallow clone (X78): a metadata-only table copy referencing the
  * source's live files by absolute path — independent thereafter. */
class ShallowCloneSpec extends SparkSpec {
  import spark.implicits._

  private def mk(root: String, parts: Int = 2): IncrementalTable = {
    val t = IncrementalTable(spark, root)
    t.append(spark.range(100).toDF("k")
      .select(col("k"), (col("k") % 4).cast("string").as("seg"),
        (col("k") * 3).as("v"))
      .repartition(parts), Seq("seg"), statsColumns = Seq("k"))
    t
  }

  test("clone is metadata-only, reads identically, and carries the skipping index") {
    val root = tmpDir("clone")
    val src = mk(root + "/src")
    val c = src.cloneTo(root + "/dst")
    assert(c.add.nonEmpty && c.add.forall(_.startsWith("/")))
    val dst = IncrementalTable(spark, root + "/dst")
    // no data files under the clone root
    assert(!new java.io.File(root + "/dst").listFiles
      .exists(f => f.getName.startsWith("seg=")))
    assert(dst.read().orderBy("k").collect().toSeq ==
      src.read().orderBy("k").collect().toSeq)
    assert(dst.partitionColumns == Seq("seg"))
    // identity partition values overlay correctly from FOREIGN dirs
    assert(dst.read().filter($"seg" === "2").count() == 25)
    // the skipping index came along: a k-range prunes cloned files
    assert(dst.liveFilesWhere($"k" >= 1000L).isEmpty)
    assert(dst.tableProperties.get("clonedFrom").isEmpty) // meta, not a prop
  }

  test("clone at a past version pins that snapshot") {
    val root = tmpDir("clone")
    val src = mk(root + "/src")
    val v1 = src.latestVersion
    src.append(spark.range(100, 150).toDF("k")
      .select(col("k"), (col("k") % 4).cast("string").as("seg"),
        (col("k") * 3).as("v")), Seq("seg"))
    src.cloneTo(root + "/dst", Some(v1))
    val dst = IncrementalTable(spark, root + "/dst")
    assert(dst.read().count() == 100)
    assert(src.read().count() == 150)
  }

  test("writes, DML, and compaction make the clone independent (un-sharing)") {
    val root = tmpDir("clone")
    val src = mk(root + "/src")
    src.cloneTo(root + "/dst")
    val dst = IncrementalTable(spark, root + "/dst")
    // append lands under the clone's own root
    dst.append(Seq((1000L, "9", 3000L)).toDF("k", "seg", "v"), Seq("seg"))
    assert(dst.read().count() == 101 && src.read().count() == 100)
    // copy-on-write delete rewrites the touched CLONED file locally
    dst.delete($"k" === 10L)
    assert(dst.read().count() == 100)
    assert(src.read().count() == 100) // source untouched
    // a dynamic-partition replace removes cloned files from the
    // replaced LOGICAL partition even though their dirs are foreign
    dst.dynamicReplace(Seq((0L, "0", 0L)).toDF("k", "seg", "v"), Seq("seg"))
    assert(dst.read().filter($"seg" === "0").count() == 1)
    assert(src.read().filter($"seg" === "0").count() == 25)
    // full compaction un-shares everything
    dst.compact()
    assert(dst.liveFiles().forall(!_.startsWith("/")))
    assert(dst.read().count() == 76) // 100 - 25 (seg=0) + 1 - hmm see below
  }

  test("vacuum on the clone never reclaims source files; DV on cloned files works") {
    val root = tmpDir("clone")
    val src = mk(root + "/src")
    src.cloneTo(root + "/dst")
    val dst = IncrementalTable(spark, root + "/dst")
    val srcFilesBefore = IncrementalTable(spark, root + "/src").liveFiles().size
    dst.vacuum()
    assert(IncrementalTable(spark, root + "/src").liveFiles().size == srcFilesBefore)
    assert(dst.read().count() == 100)
    // deletion vector over a CLONED file: positions bind by full path
    val c = dst.deleteVectorized($"k" === 7L)
    assert(c.nonEmpty)
    assert(dst.read().count() == 99)
    assert(!dst.read().filter($"k" === 7L).head(1).nonEmpty)
    assert(src.read().count() == 100)
  }

  test("clone carries transforms, constraints, tombstones; refuses DV sources and existing dests") {
    val root = tmpDir("clone")
    val src = IncrementalTable(spark, root + "/src")
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-03-25 08:00:00"), "a"),
      (2L, java.sql.Timestamp.valueOf("2024-03-26 08:00:00"), "b"))
      .toDF("id", "ts", "v")
    src.create(df.schema, Seq("ts_day"), transforms = Map("ts_day" -> "days(ts)"))
    src.append(df, Seq("ts_day"))
    src.addConstraint("pos_id", "id > 0")
    src.cloneTo(root + "/dst")
    val dst = IncrementalTable(spark, root + "/dst")
    assert(dst.partitionTransforms().view.mapValues(_.spec).toMap ==
      Map("ts_day" -> "days(ts)"))
    assert(dst.constraints.keySet == Set("pos_id"))
    // hidden-partition pruning works over the cloned foreign dirs
    assert(dst.liveFilesWhere(
      $"ts" >= lit(java.sql.Timestamp.valueOf("2024-03-26 00:00:00"))).map(f =>
      IncrementalTable.hiveSegments(f)("ts_day")).toSet == Set("2024-03-26"))
    // new writes into the clone must satisfy the cloned CHECK
    intercept[Exception] {
      dst.append(Seq((-5L, java.sql.Timestamp.valueOf("2024-03-27 00:00:00"), "x"))
        .toDF("id", "ts", "v"), Seq("ts_day"))
    }
    // existing destination refuses
    intercept[IllegalArgumentException] { src.cloneTo(root + "/dst") }
    // DV-bearing source refuses with the materialize pointer
    val dvSrc = mk(root + "/dvsrc")
    dvSrc.deleteVectorized($"k" === 1L)
    val e = intercept[IllegalArgumentException] { dvSrc.cloneTo(root + "/dst2") }
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("clone of a clone chains through multiple foreign roots") {
    val root = tmpDir("clone")
    val src = mk(root + "/src")
    src.cloneTo(root + "/c1")
    val c1 = IncrementalTable(spark, root + "/c1")
    c1.append(Seq((500L, "1", 1500L)).toDF("k", "seg", "v"), Seq("seg"))
    c1.cloneTo(root + "/c2")
    val c2 = IncrementalTable(spark, root + "/c2")
    assert(c2.read().count() == 101)
    // files reference BOTH the original root and c1's root
    val bases = c2.liveFiles().filter(_.startsWith("/"))
      .map(IncrementalTable.foreignBase).toSet
    assert(bases.exists(_.endsWith("/src")) && bases.exists(_.endsWith("/c1")))
    assert(c2.read().filter($"seg" === "1").count() == 26)
  }

  test("SQL: CALL graft.system.clone, then read and diverge by name") {
    val wh = tmpDir("clone_wh")
    spark.conf.set("spark.sql.catalog.clcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.clcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS clcat.lake")
    spark.sql("CREATE TABLE clcat.lake.src (k BIGINT, v STRING)")
    spark.sql("INSERT INTO clcat.lake.src SELECT id, CAST(id AS STRING) FROM range(50)")
    val out = spark.sql(
      "CALL clcat.system.clone('lake.src', 'lake.dst')").collect()
    assert(out.head.getInt(2) > 0) // files_referenced
    assert(spark.sql("SELECT COUNT(*) FROM clcat.lake.dst").head.getLong(0) == 50)
    // diverge: write to the clone only
    spark.sql("INSERT INTO clcat.lake.dst VALUES (999, 'x')")
    assert(spark.sql("SELECT COUNT(*) FROM clcat.lake.dst").head.getLong(0) == 51)
    assert(spark.sql("SELECT COUNT(*) FROM clcat.lake.src").head.getLong(0) == 50)
    // clone at a version
    spark.sql("INSERT INTO clcat.lake.src VALUES (1000, 'y')")
    spark.sql("CALL clcat.system.clone('lake.src', 'lake.dst0', version => 1)")
    assert(spark.sql("SELECT COUNT(*) FROM clcat.lake.dst0").head.getLong(0) == 50)
  }

  test("time travel and restore work across the clone commit") {
    val root = tmpDir("clone")
    val src = mk(root + "/src")
    src.cloneTo(root + "/dst")
    val dst = IncrementalTable(spark, root + "/dst")
    val v0 = dst.latestVersion
    dst.delete($"k" < 50L)
    assert(dst.read().count() == 50)
    assert(dst.readAt(v0).count() == 100)
    dst.restore(v0)
    assert(dst.read().count() == 100)
  }
}
