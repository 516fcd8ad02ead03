package graft.table

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** Partition spec evolution (X81): change the layout as one metadata
  * commit; old files keep their directory shape, new writes route under
  * the new layout, reads stay exact over the mixed window, and the
  * partition-addressed metadata operations that would silently mis-scope
  * refuse loudly until compaction migrates the stragglers. */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def custDf = Seq(
    (1L, "alice", "A", "east"),
    (2L, "bob", "A", "west"),
    (3L, "carol", "B", "east"),
    (4L, "dave", "B", "west")
  ).toDF("ck", "name", "seg", "region")

  test("identity evolution: mixed generations read exact, layout follows") {
    val t = IncrementalTable(spark, tmpDir("pe") + "/t1")
    t.create(custDf.schema, Seq("seg"))
    t.append(custDf, Seq("seg"))
    val v1 = t.latestVersion
    t.evolvePartitioning(Seq("region"))
    val gen2 = Seq((5L, "erin", "C", "east"), (6L, "frank", "C", "west"))
      .toDF("ck", "name", "seg", "region")
    t.append(gen2, Seq("region"))

    // old files under seg=, new under region=
    val shapes = t.liveFiles()
      .map(f => IncrementalTable.hiveSegments(f).keySet).toSet
    assert(shapes == Set(Set("seg"), Set("region")))
    // full read: every column exact in BOTH generations (dir overlay for
    // the generation that dir-encoded it, data bytes for the other)
    val got = t.read().select("ck", "seg", "region").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "A", "east"), (2L, "A", "west"), (3L, "B", "east"),
      (4L, "B", "west"), (5L, "C", "east"), (6L, "C", "west")))
    // predicate reads never refuse and stay exact over mixed specs
    assert(t.readWhere(col("region") === "east").select("ck").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 5L))
    assert(t.readWhere(col("seg") === "C").select("ck").as[Long]
      .collect().sorted.toSeq == Seq(5L, 6L))
    // time travel to the pre-evolution version: uniform, filterable
    assert(t.readAt(v1, Map("seg" -> "A")).count() == 2)
  }

  test("partition-addressed ops refuse on mixed specs; compact() migrates") {
    val t = IncrementalTable(spark, tmpDir("pe") + "/t2")
    t.create(custDf.schema, Seq("seg"))
    t.append(custDf, Seq("seg"))
    t.evolvePartitioning(Seq("region"))
    t.append(Seq((5L, "erin", "C", "east")).toDF("ck", "name", "seg", "region"),
      Seq("region"))

    // exact partition-filter read: old files don't encode region=
    val e1 = intercept[IllegalStateException](t.read(Map("region" -> "east")))
    assert(e1.getMessage.contains("compact()"), e1.getMessage)
    // ... and new files don't encode seg=
    intercept[IllegalStateException](t.read(Map("seg" -> "A")))
    intercept[IllegalStateException](
      t.liveFilesWhere(lit(true), Map("region" -> "east")))
    // partition-scoped replaces would silently miss old-spec files
    intercept[IllegalStateException](t.replaceWhere(
      Seq((9L, "x", "Z", "east")).toDF("ck", "name", "seg", "region"),
      Seq("region"), Map.empty, Map("region" -> "east")))
    intercept[IllegalStateException](t.dynamicReplace(
      Seq((9L, "x", "Z", "east")).toDF("ck", "name", "seg", "region"),
      Seq("region")))

    // full compact rewrites everything under the current spec ...
    t.compact(targetFiles = 1)
    assert(t.liveFiles().forall(f =>
      IncrementalTable.hiveSegments(f).keySet == Set("region")))
    // ... and the partition-addressed ops come back, exact
    assert(t.read(Map("region" -> "east")).select("ck").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 5L))
    t.dynamicReplace(
      Seq((9L, "x", "Z", "east")).toDF("ck", "name", "seg", "region"),
      Seq("region"))
    assert(t.read(Map("region" -> "east")).select("ck").as[Long]
      .collect().sorted.toSeq == Seq(9L))
    assert(t.read(Map("region" -> "west")).count() == 2)
  }

  test("transform evolution: added bucket prunes new files, keeps old conservatively") {
    val t = IncrementalTable(spark, tmpDir("pe") + "/t3")
    val df1 = Seq(
      (1L, ts("2024-03-25 08:00:00"), "a"),
      (2L, ts("2024-03-26 09:00:00"), "b"),
      (3L, ts("2024-03-27 10:00:00"), "c")
    ).toDF("id", "ts", "v")
    t.create(df1.schema, Seq("ts_day"), transforms = Map("ts_day" -> "days(ts)"))
    t.append(df1, Seq("ts_day"))
    t.evolvePartitioning(Seq("ts_day", "id_bucket"),
      Map("ts_day" -> "days(ts)", "id_bucket" -> "bucket(4,id)"))
    val df2 = Seq(
      (10L, ts("2024-03-28 08:00:00"), "d"),
      (11L, ts("2024-03-28 09:00:00"), "e"),
      (12L, ts("2024-03-28 10:00:00"), "f"),
      (13L, ts("2024-03-28 11:00:00"), "g")
    ).toDF("id", "ts", "v")
    t.append(df2.repartition(4, col("id")), Seq("ts_day", "id_bucket"))

    // ts_day survives in both generations: day pruning spans the table
    val dayPred = col("ts") >= lit(ts("2024-03-28 00:00:00"))
    assert(t.liveFilesWhere(dayPred).forall(f =>
      IncrementalTable.hiveSegments(f)("ts_day") == "2024-03-28"))
    // id point lookup: keeps EVERY old file (no bucket token — X81
    // conservatism) and at most one bucket of the new generation
    val keep = t.liveFilesWhere(col("id") === 10L)
    val (oldGen, newGen) = keep.partition(f =>
      !IncrementalTable.hiveSegments(f).contains("id_bucket"))
    assert(oldGen.toSet == t.liveFiles().filter(f =>
      !IncrementalTable.hiveSegments(f).contains("id_bucket")).toSet)
    assert(newGen.map(f =>
      IncrementalTable.hiveSegments(f)("id_bucket")).toSet.size <= 1)
    assert(t.readWhere(col("id") === 10L).count() == 1)
    assert(t.read().count() == 7)
  }

  test("retired transform names stay reserved; same spec re-activates") {
    val t = IncrementalTable(spark, tmpDir("pe") + "/t4")
    val df = Seq((1L, ts("2024-03-25 08:00:00"), "a"))
      .toDF("id", "ts", "v")
    t.create(df.schema, Seq("ts_day"), transforms = Map("ts_day" -> "days(ts)"))
    t.append(df, Seq("ts_day"))
    t.evolvePartitioning(Seq("ts_hour"), Map("ts_hour" -> "hours(ts)"))
    // ts_day is retired: a different spec under the old name refuses
    val e1 = intercept[IllegalArgumentException](t.evolvePartitioning(
      Seq("ts_day"), Map("ts_day" -> "hours(ts)")))
    assert(e1.getMessage.contains("previously carried"), e1.getMessage)
    // ... so does resurfacing it as a schema column, via ADD or RENAME
    val e2 = intercept[IllegalArgumentException](t.alter(
      additions = new org.apache.spark.sql.types.StructType()
        .add("ts_day", org.apache.spark.sql.types.StringType)))
    assert(e2.getMessage.contains("derived partition column"), e2.getMessage)
    intercept[IllegalArgumentException](t.renameColumn("v", "ts_day"))
    // the SAME spec re-activates the name
    t.evolvePartitioning(Seq("ts_day"), Map("ts_day" -> "days(ts)"))
    t.append(Seq((2L, ts("2024-03-26 08:00:00"), "b")).toDF("id", "ts", "v"),
      Seq("ts_day"))
    assert(t.read().count() == 2)
  }

  test("validation: no-op, unpartitioned target, non-schema identity refuse") {
    val t = IncrementalTable(spark, tmpDir("pe") + "/t5")
    t.create(custDf.schema, Seq("seg"))
    intercept[IllegalArgumentException](t.evolvePartitioning(Seq("seg")))
    intercept[IllegalArgumentException](t.evolvePartitioning(Nil))
    intercept[IllegalArgumentException](t.evolvePartitioning(Seq("nope")))
    intercept[IllegalArgumentException](
      t.evolvePartitioning(Seq("seg", "seg")))
    // a write still cannot change the layout as a side effect
    val e = intercept[IllegalArgumentException](
      t.append(custDf, Seq("region")))
    assert(e.getMessage.contains("evolve_partitioning"), e.getMessage)
  }

  test("compactIfNeeded on an evolved table migrates oversized dirs physically") {
    val t = IncrementalTable(spark, tmpDir("pe") + "/t6")
    t.create(custDf.schema, Seq("seg"))
    // many small files in seg=A
    (0 until 4).foreach(i => t.append(
      Seq((10L + i, s"u$i", "A", "east")).toDF("ck", "name", "seg", "region"),
      Seq("seg")))
    t.evolvePartitioning(Seq("region"))
    val scopes = t.compactIfNeeded(maxFiles = 2)
    assert(scopes.nonEmpty)
    // the oversized seg=A dir was rewritten UNDER THE CURRENT SPEC
    assert(t.liveFiles().forall(f =>
      IncrementalTable.hiveSegments(f).keySet == Set("region")))
    assert(t.read().select("ck").as[Long].collect().sorted.toSeq ==
      Seq(10L, 11L, 12L, 13L))
    assert(t.read().filter(col("seg") === "A").count() == 4)
  }

  test("DML over mixed specs: a delete rewrites touched old-spec files under the new layout") {
    val t = IncrementalTable(spark, tmpDir("pe") + "/t8")
    t.create(custDf.schema, Seq("seg"))
    t.append(custDf, Seq("seg"))
    t.evolvePartitioning(Seq("region"))
    t.append(Seq((5L, "erin", "C", "east")).toDF("ck", "name", "seg", "region"),
      Seq("region"))
    // ck=1 lives in an old seg=A file; the copy-on-write rewrite of its
    // survivors routes under the CURRENT layout (region=), and the
    // untouched seg=B file keeps its old shape
    t.delete(col("ck") === 1L)
    assert(t.read().select("ck").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L, 4L, 5L))
    val shapes = t.liveFiles().map(f =>
      (IncrementalTable.hiveSegments(f).keySet,
        IncrementalTable.hiveSegments(f)))
    assert(shapes.exists(_._1 == Set("region"))) // migrated survivor
    assert(t.readWhere(col("seg") === "A").select("ck").as[Long]
      .collect().toSeq == Seq(2L))
  }

  test("evolution survives checkpoints: layout, flag, and reservations persist") {
    val t = IncrementalTable(spark, tmpDir("pe") + "/t7", checkpointEvery = 3)
    t.create(custDf.schema, Seq("seg"))
    t.append(custDf, Seq("seg"))
    t.evolvePartitioning(Seq("region"))
    // push several commits past the checkpoint cadence
    (0 until 5).foreach(i => t.append(
      Seq((20L + i, s"w$i", "D", "east")).toDF("ck", "name", "seg", "region"),
      Seq("region")))
    assert(t.partitionColumns == Seq("region"))
    // strictness survives the fold (old seg= files are still live)
    intercept[IllegalStateException](t.read(Map("region" -> "east")))
    assert(t.read().count() == 9)
  }
}
