package graft.table

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.lit
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** Iceberg v2 snapshot IMPORT (VERDICT r13 missing #1): export → import
  * round-trips bit-identically (incl. renames and null/escaped
  * partition values), a HAND-BUILT foreign layout imports through name
  * mapping, and every out-of-scope shape refuses loudly. */
class IcebergImportSpec extends SparkSpec {
  import spark.implicits._

  private implicit val fmts: Formats = DefaultFormats
  private def conf = spark.sparkContext.hadoopConfiguration

  private def readText(p: Path): String = {
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val b = new Array[Byte](len)
      in.readFully(b)
      new String(b, "UTF-8")
    } finally in.close()
  }

  private def writeText(p: Path, s: String): Unit = {
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def batch(day: String, ids: Range) =
    ids.map(i => (i.toLong, day, s"w$i")).toDF("id", "day", "w")

  test("export -> import round-trips bit-identically; imported table is a live graft table") {
    val base = tmpDir("iceimp")
    val t = IncrementalTable(spark, s"$base/src")
    for (d <- Seq("a", "b", "c")) t.append(batch(d, 0 until 40), Seq("day"))
    t.replaceWhere(batch("b", 100 until 120), Seq("day"),
      Map("day" -> "b"), Map("day" -> "b"))
    IcebergExport.export(spark, t, s"$base/ice", manifestTargetEntries = 2)

    val t2 = IncrementalTable(spark, s"$base/imp")
    val r = IcebergImport.importTable(spark, t2, s"$base/ice")
    assert(r.dataFiles == t.liveFiles().size)
    assert(r.totalRows == t.read().count())
    assert(r.renamedColumns == 0)
    assert(t2.schemaAt().get == t.schemaAt().get)
    assert(t2.partitionColumns == Seq("day"))
    // bit-identical content
    val want = t.read().collect().map(_.toSeq).toSet
    val got = t2.read().collect().map(_.toSeq).toSet
    assert(got == want)
    // the imported table prunes and WRITES like any graft table
    assert(t2.read(Map("day" -> "b")).count() == 20)
    t2.append(batch("z", 0 until 5), Seq("day"))
    assert(t2.read().count() == t.read().count() + 5)
    assert(t.read().count() == 100, "the source must be untouched")
  }

  test("renamed columns round-trip through name mapping into graft column mapping") {
    val base = tmpDir("iceimp")
    val t = IncrementalTable(spark, s"$base/src")
    t.append(batch("a", 0 until 20), Seq("day"))
    t.renameColumn("w", "word")
    IcebergExport.export(spark, t, s"$base/ice")
    val t2 = IncrementalTable(spark, s"$base/imp")
    val r = IcebergImport.importTable(spark, t2, s"$base/ice")
    assert(r.renamedColumns == 1)
    assert(t2.columnMapping() == Map("word" -> "w"),
      "the name-mapping alias must become a graft colmap channel")
    // values read under the LOGICAL name, from the physical bytes —
    // without the colmap this reads all NULLs
    assert(t2.read().select("word").as[String].collect().toSet ==
      (0 until 20).map(i => s"w$i").toSet)
  }

  test("null and escaped partition values round-trip") {
    val base = tmpDir("iceimp")
    val t = IncrementalTable(spark, s"$base/src")
    t.append(Seq((1L, "a:b c"), (2L, "x=y%z"), (3L, null: String))
      .toDF("id", "tag"), Seq("tag"))
    IcebergExport.export(spark, t, s"$base/ice")
    val t2 = IncrementalTable(spark, s"$base/imp")
    val r = IcebergImport.importTable(spark, t2, s"$base/ice")
    assert(r.dataFiles == 3)
    assert(t2.read().collect().map(_.toSeq).toSet ==
      t.read().collect().map(_.toSeq).toSet)
  }

  // ---- a HAND-BUILT foreign Iceberg table (not our export's writer):
  // hive-layout parquet + hand-written metadata.json + Avro manifest
  // list/manifest, schema names DIFFERING from the parquet names with a
  // name-mapping bridge — the adopt-files shape Iceberg documents.
  private def handBuild(base: String): (String, Seq[Path]) = {
    val dataDir = s"$base/foreign/data"
    Seq((1L, "x"), (2L, "y")).toDF("id", "w").withColumn("day", lit("a"))
      .write.partitionBy("day").parquet(dataDir)
    val fs = new Path(dataDir).getFileSystem(conf)
    val files = fs.listStatus(new Path(dataDir, "day=a"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).toSeq
    val metaDir = new Path(s"$base/foreign/metadata")
    fs.mkdirs(metaDir)
    // manifest (one entry per file), partition struct {day: string?}
    val entrySchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |{"name":"content","type":"int"},
        |{"name":"file_path","type":"string"},
        |{"name":"file_format","type":"string"},
        |{"name":"partition","type":{"type":"record","name":"r102","fields":[
        |{"name":"day","type":["null","string"],"default":null}]}},
        |{"name":"record_count","type":"long"},
        |{"name":"file_size_in_bytes","type":"long"}
        |]}}]}""".stripMargin)
    val manifestPath = new Path(metaDir, "m0.avro")
    locally {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](entrySchema))
      w.create(entrySchema, fs.create(manifestPath, true))
      try files.foreach { f =>
        val part = new GenericData.Record(
          entrySchema.getField("data_file").schema()
            .getField("partition").schema())
        part.put("day", "a")
        val df = new GenericData.Record(
          entrySchema.getField("data_file").schema())
        df.put("content", 0)
        df.put("file_path", fs.makeQualified(f).toString)
        df.put("file_format", "PARQUET")
        df.put("partition", part)
        df.put("record_count", 1L)
        df.put("file_size_in_bytes", fs.getFileStatus(f).getLen)
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1)
        e.put("data_file", df)
        w.append(e)
      } finally w.close()
    }
    val listSchema = new Schema.Parser().parse(
      IcebergExport.ManifestListSchemaJson)
    val listPath = new Path(metaDir, "snap-7-list.avro")
    locally {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](listSchema))
      w.create(listSchema, fs.create(listPath, true))
      try {
        val r = new GenericData.Record(listSchema)
        r.put("manifest_path", fs.makeQualified(manifestPath).toString)
        r.put("manifest_length", fs.getFileStatus(manifestPath).getLen)
        r.put("partition_spec_id", 0)
        r.put("content", 0)
        r.put("sequence_number", 1L)
        r.put("min_sequence_number", 1L)
        r.put("added_snapshot_id", 7L)
        r.put("added_files_count", files.size)
        r.put("existing_files_count", 0)
        r.put("deleted_files_count", 0)
        r.put("added_rows_count", files.size.toLong)
        r.put("existing_rows_count", 0L)
        r.put("deleted_rows_count", 0L)
        w.append(r)
      } finally w.close()
    }
    // schema names ident/word/day; parquet columns are id/w/day — the
    // name mapping bridges (the Iceberg add_files adoption shape)
    val metadataJson = s"""{
      |"format-version": 2, "table-uuid": "00000000-0000-0000-0000-000000000007",
      |"location": "$base/foreign", "last-sequence-number": 1,
      |"last-updated-ms": 1700000000000, "last-column-id": 3,
      |"current-schema-id": 5,
      |"schemas": [{"type": "struct", "schema-id": 5, "fields": [
      |  {"id": 1, "name": "ident", "required": false, "type": "long"},
      |  {"id": 2, "name": "word", "required": false, "type": "string"},
      |  {"id": 3, "name": "day", "required": false, "type": "string"}]}],
      |"default-spec-id": 9,
      |"partition-specs": [{"spec-id": 9, "fields": [
      |  {"name": "day", "transform": "identity", "source-id": 3, "field-id": 1000}]}],
      |"last-partition-id": 1000, "default-sort-order-id": 0,
      |"sort-orders": [{"order-id": 0, "fields": []}],
      |"properties": {"schema.name-mapping.default":
      |  "[{\\"field-id\\":1,\\"names\\":[\\"ident\\",\\"id\\"]},{\\"field-id\\":2,\\"names\\":[\\"word\\",\\"w\\"]},{\\"field-id\\":3,\\"names\\":[\\"day\\"]}]"},
      |"current-snapshot-id": 7,
      |"snapshots": [{"snapshot-id": 7, "sequence-number": 1,
      |  "timestamp-ms": 1700000000000, "schema-id": 5,
      |  "manifest-list": "${fs.makeQualified(listPath)}",
      |  "summary": {"operation": "append"}}],
      |"snapshot-log": [], "metadata-log": []
      |}""".stripMargin
    writeText(new Path(metaDir, "v1.metadata.json"), metadataJson)
    writeText(new Path(metaDir, "version-hint.text"), "1")
    (s"$base/foreign", files)
  }

  test("a hand-built foreign layout imports through name mapping") {
    val base = tmpDir("iceimp")
    val (root, _) = handBuild(base)
    val t = IncrementalTable(spark, s"$base/imp")
    val r = IcebergImport.importTable(spark, t, root)
    assert(r.snapshotId == 7L && r.dataFiles == 2 && r.totalRows == 2)
    assert(r.renamedColumns == 2)
    assert(t.schemaAt().get.fieldNames.toSeq == Seq("ident", "word", "day"))
    assert(t.columnMapping() == Map("ident" -> "id", "word" -> "w"))
    assert(t.read().select("ident", "word", "day").as[(Long, String, String)]
      .collect().toSet == Set((1L, "x", "a"), (2L, "y", "a")))
  }

  test("explicit vN.metadata.json argument selects a pinned version") {
    val base = tmpDir("iceimp")
    val t = IncrementalTable(spark, s"$base/src")
    t.append(batch("a", 0 until 10), Seq("day"))
    IcebergExport.export(spark, t, s"$base/ice")
    t.append(batch("b", 0 until 10), Seq("day"))
    IcebergExport.export(spark, t, s"$base/ice")
    // v1 pins the first snapshot (10 rows), the root resolves v2 (20)
    val t1 = IncrementalTable(spark, s"$base/imp1")
    assert(IcebergImport.importTable(spark, t1,
      s"$base/ice/metadata/v1.metadata.json").totalRows == 10L)
    val t2 = IncrementalTable(spark, s"$base/imp2")
    assert(IcebergImport.importTable(spark, t2, s"$base/ice")
      .totalRows == 20L)
  }

  test("refusals: v1/v3 format, transforms, delete manifests, non-hive layout, existing dest") {
    val base = tmpDir("iceimp")
    val t = IncrementalTable(spark, s"$base/src")
    t.append(batch("a", 0 until 10), Seq("day"))
    IcebergExport.export(spark, t, s"$base/ice")
    val mdPath = new Path(s"$base/ice/metadata/v1.metadata.json")
    val mdStr = readText(mdPath)

    def variant(name: String, edit: String => String): String = {
      val dir = s"$base/$name/metadata"
      val fs = new Path(dir).getFileSystem(conf)
      fs.mkdirs(new Path(dir))
      writeText(new Path(dir, "v1.metadata.json"), edit(mdStr))
      writeText(new Path(dir, "version-hint.text"), "1")
      s"$base/$name"
    }
    def refused(src: String, needle: String): Unit = {
      val d = IncrementalTable(spark, s"$base/d_${needle.take(6).hashCode.abs}")
      val e = intercept[IllegalArgumentException](
        IcebergImport.importTable(spark, d, src))
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    refused(variant("fv1",
      _.replace("\"format-version\" : 2", "\"format-version\" : 1")),
      "v2 only")
    refused(variant("fv3",
      _.replace("\"format-version\" : 2", "\"format-version\" : 3")),
      "v2 only")
    refused(variant("bucket",
      _.replace("\"transform\" : \"identity\"", "\"transform\" : \"bucket[4]\"")),
      "identity")
    refused(variant("nosnap", s =>
      s.replace("\"current-snapshot-id\" : " +
        t.latestVersion.toString, "\"current-snapshot-id\" : -1")),
      "no current snapshot")

    // a content=1 (delete) manifest whose entries are DATA files is
    // malformed — refused as such, never silently treated as either
    val deldir = variant("mor", identity)
    locally {
      val md = JsonMethods.parse(mdStr)
      val listPath = new Path(
        (((md \ "snapshots")(0)) \ "manifest-list").extract[String])
      val fs = listPath.getFileSystem(conf)
      val listSchema = new Schema.Parser().parse(
        IcebergExport.ManifestListSchemaJson)
      val rdr = new org.apache.avro.file.DataFileStream[GenericRecord](
        fs.open(listPath),
        new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      val recs = try {
        val b = Seq.newBuilder[GenericRecord]
        while (rdr.hasNext) b += rdr.next()
        b.result()
      } finally rdr.close()
      val newList = new Path(s"$deldir/metadata/snap-del-list.avro")
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](listSchema))
      w.create(listSchema, fs.create(newList, true))
      try recs.foreach { r0 =>
        val r = new GenericData.Record(listSchema)
        listSchema.getFields.forEach(f =>
          r.put(f.name(), r0.get(f.name())))
        r.put("content", 1) // DELETES manifest
        w.append(r)
      } finally w.close()
      val edited = mdStr.replace(
        (((md \ "snapshots")(0)) \ "manifest-list").extract[String],
        fs.makeQualified(newList).toString)
      writeText(new Path(s"$deldir/metadata/v1.metadata.json"), edited)
    }
    refused(deldir, "malformed manifest")

    val t2 = IncrementalTable(spark, s"$base/existing")
    t2.append(batch("a", 0 until 3), Seq("day"))
    val e2 = intercept[IllegalArgumentException](
      IcebergImport.importTable(spark, t2, s"$base/ice"))
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
  }

  test("non-hive layout and wrong-token layouts refuse per file") {
    val base = tmpDir("iceimp")
    val (root, _) = handBuild(base)
    // break the layout: claim partition day=b in the manifest while the
    // dir token says day=a — must refuse, never read wrong values
    val mdP = new Path(s"$root/metadata/v1.metadata.json")
    val fs = mdP.getFileSystem(conf)
    val manifestPath = new Path(s"$root/metadata/m0.avro")
    val entryIn = new org.apache.avro.file.DataFileStream[GenericRecord](
      fs.open(manifestPath),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    val (eschema, recs) = try {
      val b = Seq.newBuilder[GenericRecord]
      while (entryIn.hasNext) b += entryIn.next()
      (entryIn.getSchema, b.result())
    } finally entryIn.close()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](eschema))
    w.create(eschema, fs.create(manifestPath, true))
    try recs.foreach { e =>
      e.get("data_file").asInstanceOf[GenericRecord]
        .get("partition").asInstanceOf[GenericRecord].put("day", "b")
      w.append(e)
    } finally w.close()
    val d = IncrementalTable(spark, s"$base/impbad")
    val e = intercept[IllegalArgumentException](
      IcebergImport.importTable(spark, d, root))
    assert(e.getMessage.contains("does not match the manifest partition"),
      e.getMessage)
  }

  test("MERGE-ON-READ round-trip: DVs and sequence-ordered equality deletes replay exactly") {
    val base = tmpDir("iceimp")
    val t = IncrementalTable(spark, s"$base/src")
    for (d <- Seq("a", "b")) t.append(batch(d, 0 until 40), Seq("day"))
    t.deleteVectorized($"id" < 5) // position deletes, both partitions
    // eq delete + UPSERT-shaped later append: the id=7 replacement was
    // added AFTER the delete's base and must SURVIVE the import — only
    // the sequence-ordered commit replay preserves that
    t.deleteByKey(Seq(7L).toDF("id"), Seq("id"))
    t.append(Seq((7L, "a", "w7_v2")).toDF("id", "day", "w"), Seq("day"))
    val er = IcebergExport.export(spark, t, s"$base/ice")
    assert(er.posDeleteFiles >= 1 && er.eqDeleteFiles >= 1)

    val t2 = IncrementalTable(spark, s"$base/imp")
    val r = IcebergImport.importTable(spark, t2, s"$base/ice")
    assert(r.posDeleteFiles >= 1 && r.eqDeleteFiles >= 1, r.toString)
    // data groups (2 seqs) + 1 eq delete + 1 dv generation
    assert(r.commits == 4, r.toString)
    val want = t.read().collect().map(_.toSeq).toSet
    val got = t2.read().collect().map(_.toSeq).toSet
    assert(got == want, s"MOR import diverged: ${got.size} vs ${want.size}")
    // the escape row survived; the deleted originals did not
    assert(got.exists(_.contains("w7_v2")))
    assert(!got.exists(_.contains("w7")) || got.count(r0 =>
      r0.head == 7L) == 1, "old id=7 rows must be gone")
    assert(!got.exists(r0 => r0.head.asInstanceOf[Long] < 5L),
      "position-deleted rows must be gone")
    // the imported table is a full MOR graft table: its own standing
    // state compacts away like native state
    t2.compact(targetFiles = 2)
    assert(t2.read().collect().map(_.toSeq).toSet == want)
  }

  test("SQL door: CALL graft.system.import_iceberg") {
    val base = tmpDir("iceimp")
    spark.conf.set("spark.sql.catalog.impc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.impc.warehouse", s"$base/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS impc.lake")
    spark.sql("CREATE TABLE impc.lake.src (id BIGINT, w STRING)")
    spark.sql(
      "INSERT INTO impc.lake.src SELECT id, CAST(id AS STRING) FROM range(50)")
    spark.sql(s"CALL impc.system.export_iceberg('lake.src', '$base/ice')")
    val row = spark.sql(
      s"CALL impc.system.import_iceberg('lake.adopted', '$base/ice')").head
    assert(row.getAs[Long]("total_rows") == 50L)
    assert(row.getAs[Int]("data_files") >= 1)
    // the adopted table answers SQL through the catalog immediately
    assert(spark.sql("SELECT count(*) FROM impc.lake.adopted").head.getLong(0)
      == 50L)
    assert(spark.sql(
      "SELECT sum(id) FROM impc.lake.adopted").head.getLong(0) == 1225L)
  }
}
