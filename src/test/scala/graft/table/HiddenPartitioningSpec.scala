package graft.table

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}

import graft.SparkSpec

/** Hidden partitioning (X77): Iceberg-style partition transforms —
  * derived dir columns computed from base columns at write, pruned
  * from base-column predicates at read, never part of the schema. */
class HiddenPartitioningSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def eventsDf = Seq(
    (1L, ts("2024-03-25 08:00:00"), "a"),
    (2L, ts("2024-03-25 23:59:59"), "b"),
    (3L, ts("2024-03-26 00:00:00"), "c"),
    (4L, ts("2024-03-26 12:30:00"), "d"),
    (5L, ts("2024-03-27 01:00:00"), "e"),
    (6L, ts("2024-03-28 10:00:00"), "f")
  ).toDF("id", "ts", "v")

  test("days(ts): writes route to day dirs, ts predicates prune dirs, results exact") {
    val t = IncrementalTable(spark, tmpDir("hp") + "/t1")
    t.create(eventsDf.schema, Seq("ts_day"), transforms = Map("ts_day" -> "days(ts)"))
    t.append(eventsDf.repartition(2), Seq("ts_day"))
    // layout: one hive dir per day, derived col absent from the schema
    val files = t.liveFiles()
    val days = files.map(f => IncrementalTable.hiveSegments(f)("ts_day")).toSet
    assert(days == Set("2024-03-25", "2024-03-26", "2024-03-27", "2024-03-28"))
    assert(t.schemaAt().get.fieldNames.toSeq == Seq("id", "ts", "v"))
    assert(t.read().columns.toSeq == Seq("id", "ts", "v"))
    assert(t.read().count() == 6)
    // range predicate on the BASE column prunes whole day dirs
    val pred = $"ts" >= lit(ts("2024-03-26 00:00:00")) &&
      $"ts" < lit(ts("2024-03-28 00:00:00"))
    val kept = t.liveFilesWhere(pred)
    assert(kept.map(f => IncrementalTable.hiveSegments(f)("ts_day")).toSet ==
      Set("2024-03-26", "2024-03-27"))
    assert(t.readWhere(pred).select("id").as[Long].collect().sorted.toSeq ==
      Seq(3L, 4L, 5L))
    // equality day: one dir
    val eq = $"ts" === lit(ts("2024-03-25 08:00:00"))
    assert(t.liveFilesWhere(eq).map(f =>
      IncrementalTable.hiveSegments(f)("ts_day")).toSet == Set("2024-03-25"))
    // strict bound at midnight keeps the boundary day (inclusive at dir level)
    val strict = $"ts" > lit(ts("2024-03-26 23:00:00"))
    assert(t.liveFilesWhere(strict).map(f =>
      IncrementalTable.hiveSegments(f)("ts_day")).toSet
      .subsetOf(Set("2024-03-26", "2024-03-27", "2024-03-28")))
    assert(t.readWhere(strict).count() == 2)
  }

  test("dir-clustered inserts: one file per derived dir at any input parallelism (VERDICT r8 #6)") {
    val t = IncrementalTable(spark, tmpDir("hp") + "/tc")
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp'2024-03-01 06:00:00' + make_interval(0, 0, 0, CAST(id % 5 AS INT))"))
      .repartition(16) // 16 tasks × (5 days × 4 buckets) would fan out
    t.create(StructType.fromDDL("id BIGINT, ts TIMESTAMP"),
      Seq("ts_day", "id_bucket"),
      transforms = Map("ts_day" -> "days(ts)", "id_bucket" -> "bucket(4,id)"))
    t.append(df, Seq("ts_day", "id_bucket"))
    val files = t.liveFiles()
    val byDir = files.groupBy(f => f.substring(0, f.lastIndexOf('/')))
    // every populated dir holds exactly ONE file — the insert was
    // repartitioned on the dir tuple so one writer owned each dir
    assert(byDir.values.forall(_.size == 1),
      byDir.view.mapValues(_.size).toMap.toString)
    assert(byDir.size <= 20 && byDir.size >= 15, byDir.size.toString)
    assert(t.read().count() == 2000)
    // opt-out restores the raw fan-out behavior
    val t2 = IncrementalTable(spark, tmpDir("hp") + "/tc2")
    t2.create(StructType.fromDDL("id BIGINT, ts TIMESTAMP"),
      Seq("ts_day"), transforms = Map("ts_day" -> "days(ts)"),
      meta = Map("prop/graft.insertClusterDirs" -> "false"))
    t2.append(df, Seq("ts_day"))
    val byDir2 = t2.liveFiles().groupBy(f => f.substring(0, f.lastIndexOf('/')))
    assert(byDir2.values.exists(_.size > 1), byDir2.view.mapValues(_.size).toMap.toString)
  }

  test("bucket(n, id): point lookups keep one bucket dir; parity with hash()") {
    val t = IncrementalTable(spark, tmpDir("hp") + "/t2")
    val df = spark.range(100).toDF("id").withColumn("v", col("id").cast("string"))
    t.create(df.schema, Seq("id_bucket"), transforms = Map("id_bucket" -> "bucket(4,id)"))
    t.append(df.repartition(3), Seq("id_bucket"))
    val dirs = t.liveFiles().map(f => IncrementalTable.hiveSegments(f)("id_bucket")).toSet
    assert(dirs.subsetOf(Set("0", "1", "2", "3")) && dirs.size == 4)
    // point predicate prunes to exactly the value's bucket
    val expect = df.select(org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.hash(lit(42L)), lit(4))).head.getInt(0).toString
    val kept = t.liveFilesWhere($"id" === 42L)
    assert(kept.nonEmpty)
    assert(kept.map(f => IncrementalTable.hiveSegments(f)("id_bucket")).toSet ==
      Set(expect))
    assert(t.readWhere($"id" === 42L).select("v").as[String].head() == "42")
    // a RANGE never bucket-prunes (scatters across buckets)
    assert(t.liveFilesWhere($"id" >= 10L && $"id" <= 12L).map(f =>
      IncrementalTable.hiveSegments(f)("id_bucket")).toSet == dirs)
    assert(t.readWhere($"id" >= 10L && $"id" <= 12L).count() == 3)
  }

  test("null base values route to the default partition; IS NULL / IS NOT NULL prune") {
    val t = IncrementalTable(spark, tmpDir("hp") + "/t3")
    val df = Seq((1L, Some(ts("2024-03-25 08:00:00"))), (2L, None),
      (3L, Some(ts("2024-03-26 08:00:00"))))
      .toDF("id", "ts")
    t.create(df.schema, Seq("ts_day"), transforms = Map("ts_day" -> "days(ts)"))
    t.append(df.repartition(1), Seq("ts_day"))
    val days = t.liveFiles().map(f => IncrementalTable.hiveSegments(f)("ts_day")).toSet
    assert(days == Set("2024-03-25", "2024-03-26", "__HIVE_DEFAULT_PARTITION__"))
    // IS NULL keeps ONLY the default partition
    assert(t.liveFilesWhere($"ts".isNull).map(f =>
      IncrementalTable.hiveSegments(f)("ts_day")).toSet ==
      Set("__HIVE_DEFAULT_PARTITION__"))
    assert(t.readWhere($"ts".isNull).select("id").as[Long].head() == 2L)
    // IS NOT NULL / any value bound drops it
    assert(!t.liveFilesWhere($"ts".isNotNull).exists(f =>
      IncrementalTable.hiveSegments(f)("ts_day") == "__HIVE_DEFAULT_PARTITION__"))
    assert(!t.liveFilesWhere($"ts" >= lit(ts("2024-03-01 00:00:00"))).exists(f =>
      IncrementalTable.hiveSegments(f)("ts_day") == "__HIVE_DEFAULT_PARTITION__"))
    assert(t.readWhere($"ts".isNotNull).count() == 2)
  }

  test("truncate over integrals compares tokens numerically") {
    val t = IncrementalTable(spark, tmpDir("hp") + "/t4")
    val df = spark.range(-20, 120).toDF("k").withColumn("v", col("k") * 2)
    t.create(df.schema, Seq("k_trunc"), transforms = Map("k_trunc" -> "truncate(50,k)"))
    t.append(df.repartition(2), Seq("k_trunc"))
    val dirs = t.liveFiles().map(f => IncrementalTable.hiveSegments(f)("k_trunc")).toSet
    assert(dirs == Set("-50", "0", "50", "100")) // floor toward -inf
    // numeric compare: token "100" must not sort below "50" (string order trap)
    val kept = t.liveFilesWhere($"k" >= 60L)
    assert(kept.map(f => IncrementalTable.hiveSegments(f)("k_trunc")).toSet ==
      Set("50", "100"))
    assert(t.readWhere($"k" >= 60L).count() == 60)
    assert(t.liveFilesWhere($"k" < 0L).map(f =>
      IncrementalTable.hiveSegments(f)("k_trunc")).toSet == Set("-50"))
    assert(t.readWhere($"k" < 0L).count() == 20)
  }

  test("truncate over strings: prefix dirs prune ranges; escaped tokens conservatively kept") {
    val t = IncrementalTable(spark, tmpDir("hp") + "/t5")
    val df = Seq("apple", "apricot", "banana", "berry", "cherry", "b:z")
      .toDF("s").withColumn("n", org.apache.spark.sql.functions.length(col("s")))
    t.create(df.schema, Seq("s_trunc"), transforms = Map("s_trunc" -> "truncate(2,s)"))
    t.append(df.repartition(1), Seq("s_trunc"))
    // "b:z" truncates to "b:", which ESCAPES to dir token "b%3A" — in
    // raw token order "b%3A" < "b0", so without the escape guard the
    // range below would unsoundly prune a matching row
    val kept = t.liveFilesWhere($"s" >= "b0" && $"s" < "bz")
    val toks = kept.map(f => IncrementalTable.hiveSegments(f)("s_trunc")).toSet
    assert(toks.contains("ba") && toks.contains("be") && toks.contains("b%3A"))
    assert(!toks.contains("ap") && !toks.contains("ch"))
    assert(t.readWhere($"s" >= "b0" && $"s" < "bz")
      .select("s").as[String].collect().sorted.toSeq ==
      Seq("b:z", "banana", "berry"))
    // point equality on a clean prefix
    assert(t.readWhere($"s" === "banana").count() == 1)
  }

  test("months/years and date-typed base columns") {
    val t = IncrementalTable(spark, tmpDir("hp") + "/t6")
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-01-15")),
      (2L, java.sql.Date.valueOf("2024-02-15")),
      (3L, java.sql.Date.valueOf("2025-01-15"))).toDF("id", "d")
    t.create(df.schema, Seq("d_month"), transforms = Map("d_month" -> "months(d)"))
    t.append(df.repartition(1), Seq("d_month"))
    assert(t.liveFiles().map(f => IncrementalTable.hiveSegments(f)("d_month")).toSet ==
      Set("2024-01", "2024-02", "2025-01"))
    val pred = $"d" >= lit(java.sql.Date.valueOf("2024-02-01")) &&
      $"d" < lit(java.sql.Date.valueOf("2025-01-01"))
    assert(t.liveFilesWhere(pred).map(f =>
      IncrementalTable.hiveSegments(f)("d_month")).toSet == Set("2024-02"))
    assert(t.readWhere(pred).select("id").as[Long].head() == 2L)
  }

  test("pruning holds on the columnar-checkpoint path and under time travel") {
    val t = new IncrementalTable(spark, tmpDir("hp") + "/t7",
      checkpointEvery = 2, parquetThreshold = 1)
    t.create(eventsDf.schema, Seq("ts_day"), transforms = Map("ts_day" -> "days(ts)"))
    eventsDf.collect().zipWithIndex.foreach { case (r, _) =>
      t.append(Seq((r.getLong(0), r.getTimestamp(1), r.getString(2)))
        .toDF("id", "ts", "v"), Seq("ts_day"))
    }
    val v = t.latestVersion
    t.append(Seq((9L, ts("2024-03-29 00:00:00"), "z")).toDF("id", "ts", "v"),
      Seq("ts_day"))
    val pred = $"ts" >= lit(ts("2024-03-26 00:00:00")) &&
      $"ts" < lit(ts("2024-03-27 00:00:00"))
    assert(t.liveFilesWhere(pred).map(f =>
      IncrementalTable.hiveSegments(f)("ts_day")).toSet == Set("2024-03-26"))
    assert(t.readWhere(pred).count() == 2)
    // as-of: transforms resolve at that version too
    assert(t.liveFilesWhere($"ts" >= lit(ts("2024-03-29 00:00:00")),
      asOf = Some(v)).isEmpty)
  }

  test("merge/delete rewrites and compaction keep the derived layout") {
    val t = IncrementalTable(spark, tmpDir("hp") + "/t8")
    t.create(eventsDf.schema, Seq("ts_day"), transforms = Map("ts_day" -> "days(ts)"))
    t.append(eventsDf.repartition(2), Seq("ts_day"))
    // copy-on-write delete: candidates pruned by day, rewrite re-routes
    t.delete($"ts" >= lit(ts("2024-03-28 00:00:00")))
    assert(t.read().count() == 5)
    assert(!t.liveFiles().exists(f =>
      IncrementalTable.hiveSegments(f)("ts_day") == "2024-03-28"))
    t.compact()
    assert(t.read().count() == 5)
    val days = t.liveFiles().map(f => IncrementalTable.hiveSegments(f)("ts_day")).toSet
    assert(days == Set("2024-03-25", "2024-03-26", "2024-03-27"))
    // pruning still works over compacted files
    assert(t.readWhere($"ts" < lit(ts("2024-03-26 00:00:00"))).count() == 2)
  }

  test("schema-evolution guards: base and derived names are protected") {
    val t = IncrementalTable(spark, tmpDir("hp") + "/t9")
    t.create(eventsDf.schema, Seq("ts_day", "id_bucket"),
      transforms = Map("ts_day" -> "days(ts)", "id_bucket" -> "bucket(4,id)"))
    t.append(eventsDf, Seq("ts_day", "id_bucket"))
    // widen the bucket base: dir tokens are type-dependent -> refuse
    intercept[IllegalArgumentException] {
      t.alter(widen = Map("id" -> org.apache.spark.sql.types.LongType))
    }
    // drop the transform base -> refuse
    intercept[IllegalArgumentException] { t.alter(drops = Seq("ts")) }
    // rename the transform base -> refuse
    intercept[IllegalArgumentException] { t.renameColumn("ts", "event_ts") }
    // add a schema column shadowing the derived dir name -> refuse
    intercept[IllegalArgumentException] {
      t.alter(additions = new StructType().add("ts_day", StringType))
    }
    // write-side evolution introducing the derived name -> refuse
    intercept[IllegalArgumentException] {
      t.append(eventsDf.withColumn("id_bucket", lit("x")),
        Seq("ts_day", "id_bucket"))
    }
    // adding an unrelated column is fine
    t.alter(additions = new StructType().add("extra", IntegerType))
    assert(t.schemaAt().get.fieldNames.contains("extra"))
  }

  test("create-time validation is loud") {
    val t = IncrementalTable(spark, tmpDir("hp") + "/t10")
    val schema = eventsDf.schema
    // derived name colliding with a schema column
    intercept[IllegalArgumentException] {
      t.create(schema, Seq("ts"), transforms = Map("ts" -> "days(ts)"))
    }
    // base column missing
    intercept[IllegalArgumentException] {
      t.create(schema, Seq("p"), transforms = Map("p" -> "days(nope)"))
    }
    // wrong base type
    intercept[IllegalArgumentException] {
      t.create(schema, Seq("p"), transforms = Map("p" -> "days(v)"))
    }
    // hours over a date base
    intercept[IllegalArgumentException] {
      t.create(Seq((1L, java.sql.Date.valueOf("2024-01-01"))).toDF("id", "d").schema,
        Seq("p"), transforms = Map("p" -> "hours(d)"))
    }
    // transform column not in partitionBy
    intercept[IllegalArgumentException] {
      t.create(schema, Nil, transforms = Map("p" -> "days(ts)"))
    }
  }

  // ---------------------------------------------------- SQL front door

  private lazy val cat: String = {
    val wh = tmpDir("hp_wh")
    spark.conf.set("spark.sql.catalog.hpcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.hpcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS hpcat.lake")
    "hpcat"
  }

  test("SQL: PARTITIONED BY (days(ts), bucket(n, id)) creates, routes, prunes") {
    spark.sql(s"CREATE TABLE $cat.lake.ev (id BIGINT, ts TIMESTAMP, v STRING) " +
      "PARTITIONED BY (days(ts), bucket(4, id))")
    eventsDf.createOrReplaceTempView("hp_src")
    spark.sql(s"INSERT INTO $cat.lake.ev SELECT id, ts, v FROM hp_src")
    val root = spark.conf.get("spark.sql.catalog.hpcat.warehouse") + "/lake/ev"
    val t = IncrementalTable(spark, root)
    // committed layout: derived names, transforms recorded, schema clean
    assert(t.partitionColumns == Seq("ts_day", "id_bucket"))
    assert(t.partitionTransforms().view.mapValues(_.spec).toMap ==
      Map("ts_day" -> "days(ts)", "id_bucket" -> "bucket(4,id)"))
    assert(t.schemaAt().get.fieldNames.toSeq == Seq("id", "ts", "v"))
    // reported partitioning round-trips as transforms (not identity)
    assert(spark.sql(s"DESCRIBE TABLE EXTENDED $cat.lake.ev").collect()
      .map(_.mkString(" ")).exists(s => s.contains("days(ts)")))
    // a ts range through pure SQL prunes dirs before the scan
    val out = spark.sql(s"SELECT id FROM $cat.lake.ev " +
      "WHERE ts >= TIMESTAMP'2024-03-26 00:00:00' " +
      "AND ts < TIMESTAMP'2024-03-27 00:00:00' ORDER BY id")
      .as[Long].collect().toSeq
    assert(out == Seq(3L, 4L))
    val scan = graft.sources.GraftRelation.lastScan(root).get
    assert(scan.filesScanned < scan.filesLive,
      s"expected a dir-pruned scan, got $scan")
    assert(scan.filesScanned >= 1)
    // point lookup on the bucketed key prunes to one bucket's dirs
    spark.sql(s"SELECT v FROM $cat.lake.ev WHERE id = 5").collect()
    val scan2 = graft.sources.GraftRelation.lastScan(root).get
    assert(scan2.filesScanned < scan2.filesLive,
      s"expected a bucket-pruned scan, got $scan2")
  }

  test("SQL: truncate transform + CTAS-style insert + DML across hidden layout") {
    spark.sql(s"CREATE TABLE $cat.lake.tr (s STRING, n INT) " +
      "PARTITIONED BY (truncate(1, s))")
    spark.sql(s"INSERT INTO $cat.lake.tr VALUES ('alpha', 1), ('beta', 2), " +
      "('gamma', 3), ('avocado', 4)")
    val root = spark.conf.get("spark.sql.catalog.hpcat.warehouse") + "/lake/tr"
    val t = IncrementalTable(spark, root)
    assert(t.liveFiles().map(f =>
      IncrementalTable.hiveSegments(f)("s_trunc")).toSet == Set("a", "b", "g"))
    // DELETE rides the pruned copy-on-write path and re-routes survivors
    spark.sql(s"DELETE FROM $cat.lake.tr WHERE s = 'beta'")
    assert(spark.sql(s"SELECT s FROM $cat.lake.tr ORDER BY s").as[String]
      .collect().toSeq == Seq("alpha", "avocado", "gamma"))
    assert(!IncrementalTable(spark, root).liveFiles().exists(f =>
      IncrementalTable.hiveSegments(f)("s_trunc") == "b"))
    // ALTER guards surface through SQL too
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.lake.tr DROP COLUMN s")
    }
    assert(e.getMessage.contains("partition transform"))
  }

  test("streaming writer routes through the same transforms (dir parity with batch)") {
    val root = tmpDir("hp")
    val src = IncrementalTable(spark, root + "/src")
    src.append(eventsDf, Nil)
    val dst = IncrementalTable(spark, root + "/dst")
    dst.create(eventsDf.schema, Seq("ts_day", "id_bucket"),
      transforms = Map("ts_day" -> "days(ts)", "id_bucket" -> "bucket(4,id)"))
    val q = spark.readStream.format("graft").load(root + "/src")
      .writeStream.format("graft")
      .option("checkpointLocation", root + "/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(root + "/dst")
    q.awaitTermination()
    dst.refresh()
    // batch twin for the expected dir set
    val twin = IncrementalTable(spark, root + "/twin")
    twin.create(eventsDf.schema, Seq("ts_day", "id_bucket"),
      transforms = Map("ts_day" -> "days(ts)", "id_bucket" -> "bucket(4,id)"))
    twin.append(eventsDf, Seq("ts_day", "id_bucket"))
    def dirs(t: IncrementalTable) = t.liveFiles().map { f =>
      val s = IncrementalTable.hiveSegments(f)
      (s("ts_day"), s("id_bucket"))
    }.toSet
    assert(dirs(dst) == dirs(twin))
    assert(dst.read().count() == 6)
    // and the streamed table prunes identically
    assert(dst.readWhere($"ts" >= lit(ts("2024-03-28 00:00:00"))).count() == 1)
    assert(dst.liveFilesWhere($"ts" >= lit(ts("2024-03-28 00:00:00"))).map(f =>
      IncrementalTable.hiveSegments(f)("ts_day")).toSet == Set("2024-03-28"))
  }
}
