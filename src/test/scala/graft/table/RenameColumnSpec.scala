package graft.table

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** Column RENAME via column mapping (X72): a metadata-only commit with
  * zero data rewritten — old and new files bind the logical column to
  * the same immutable physical name, the skipping index follows, time
  * travel shows each era under its own name, and the old name stays
  * tombstoned. */
class RenameColumnSpec extends SparkSpec {
  import spark.implicits._

  test("rename is metadata-only: both file generations serve the new name") {
    val t = IncrementalTable(spark, tmpDir("rencol") + "/t1")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), Nil,
      statsColumns = Seq("id"))
    val filesBefore = t.liveFiles().toSet
    val preRename = t.latestVersion
    t.renameColumn("id", "ident")
    // zero data rewritten
    assert(t.liveFiles().toSet == filesBefore)
    assert(t.schemaAt().get.fieldNames.toSeq == Seq("ident", "v"))
    // new-name writes land in the SAME physical column
    t.append(Seq((3L, "c")).toDF("ident", "v").repartition(1), Nil,
      statsColumns = Seq("ident"))
    assert(t.read().select($"ident", $"v").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // time travel: the pre-rename snapshot shows the OLD name and values
    val old = t.readAt(preRename)
    assert(old.columns.toSeq == Seq("id", "v"))
    assert(old.select($"id").as[Long].collect().toSet == Set(1L, 2L))
    // the skipping index follows the rename across BOTH generations
    val pruned = t.liveFilesWhere($"ident" >= 3L)
    assert(pruned.size == 1, s"expected 1 surviving file, got $pruned")
    assert(t.readWhere($"ident" >= 3L).select($"ident").as[Long]
      .collect().toSeq == Seq(3L))
    // metadata-only MIN/MAX pushdown follows too
    assert(t.liveMinMax("ident") == Some((Some(1L), Some(3L))))
  }

  test("the old name is tombstoned: re-add refused on every path") {
    val t = IncrementalTable(spark, tmpDir("rencol") + "/t2")
    t.append(Seq((1L, 1L)).toDF("a", "b"), Nil)
    t.renameColumn("a", "a2")
    // write-path evolution refuses the resurfaced name
    val e1 = intercept[IllegalArgumentException] {
      t.append(Seq((9L, 9L, 9L)).toDF("a", "b", "x"), Nil)
    }
    assert(e1.getMessage.contains("previously dropped"), e1.getMessage)
    // ALTER ADD refuses it
    val e2 = intercept[IllegalArgumentException] {
      t.alter(additions = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType))))
    }
    assert(e2.getMessage.contains("previously dropped"), e2.getMessage)
    // renaming BACK onto the tombstone is refused
    val e3 = intercept[IllegalArgumentException] {
      t.renameColumn("a2", "a")
    }
    assert(e3.getMessage.contains("previously dropped") ||
      e3.getMessage.contains("renamed away"), e3.getMessage)
  }

  test("rename chains replay exactly under time travel") {
    val t = IncrementalTable(spark, tmpDir("rencol") + "/t3")
    t.append(Seq((10L, "x")).toDF("a", "v"), Nil) // v0
    t.renameColumn("a", "b") // v1
    t.append(Seq((20L, "y")).toDF("b", "v"), Nil) // v2
    t.renameColumn("b", "c") // v3
    t.append(Seq((30L, "z")).toDF("c", "v"), Nil) // v4
    assert(t.read().select($"c").as[Long].collect().sorted.toSeq ==
      Seq(10L, 20L, 30L))
    // mid-chain snapshot: logical name b, values from the physical a era
    val atB = t.readAt(2)
    assert(atB.columns.toSeq == Seq("b", "v"))
    assert(atB.select($"b").as[Long].collect().sorted.toSeq == Seq(10L, 20L))
    val atA = t.readAt(0)
    assert(atA.columns.toSeq == Seq("a", "v"))
    assert(atA.select($"a").as[Long].collect().toSeq == Seq(10L))
  }

  test("refusals: partition columns, constraint references, existing names") {
    val t = IncrementalTable(spark, tmpDir("rencol") + "/t4")
    t.append(Seq((1L, "p1", 5L)).toDF("id", "part", "n"), Seq("part"))
    intercept[IllegalArgumentException] { t.renameColumn("part", "part2") }
    intercept[IllegalArgumentException] { t.renameColumn("id", "n") }
    intercept[IllegalArgumentException] { t.renameColumn("nope", "x") }
    t.addConstraint("n_pos", "n > 0")
    val e = intercept[IllegalArgumentException] { t.renameColumn("n", "m") }
    assert(e.getMessage.contains("n_pos"), e.getMessage)
    t.dropConstraint("n_pos")
    t.renameColumn("n", "m") // now fine
    assert(t.schemaAt().get.fieldNames.contains("m"))
  }

  test("DML and deletion vectors keep working across a rename") {
    val t = IncrementalTable(spark, tmpDir("rencol") + "/t5")
    t.append(spark.range(1, 11).toDF("k").withColumn("v", col("k") * 2), Nil)
    t.deleteVectorized(col("k") === 3L)
    t.renameColumn("k", "key")
    assert(t.read().count() == 9) // DV still applies post-rename
    t.update(col("key") === 5L, Map("v" -> lit(0L)))
    t.delete(col("key") === 7L)
    t.merge(Seq((10L, 100L), (11L, 22L)).toDF("key", "v"), keys = Seq("key"))
    val out = t.read().select($"key", $"v").as[(Long, Long)].collect().toMap
    assert(out(5L) == 0L && out(10L) == 100L && out(11L) == 22L)
    assert(!out.contains(3L) && !out.contains(7L))
    // CDC walk across the rename serves the CURRENT logical names
    val feed = t.changes(0, t.latestVersion)
    assert(feed.columns.contains("key"))
    assert(feed.filter($"_change_type" === "insert").count() >= 10)
  }

  test("statsColumns table property follows the rename") {
    val t = IncrementalTable(spark, tmpDir("rencol") + "/t6")
    t.append(Seq((1L, 2L)).toDF("a", "b"), Nil,
      statsColumns = Seq("a"))
    t.setProperties(Map("graft.statsColumns" -> "a,b"))
    t.renameColumn("a", "a2")
    assert(t.tableProperties("graft.statsColumns") == "a2,b")
  }
}
