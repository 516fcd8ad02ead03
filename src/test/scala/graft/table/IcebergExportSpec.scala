package graft.table

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** Iceberg v2 snapshot export (VERDICT r12 #6). No Iceberg jars in the
  * image, so validation is STRUCTURAL and exact: metadata.json parses
  * back with the right wiring (snapshot → manifest list → manifests),
  * the Avro files parse with generic readers, and the file set, row
  * counts, byte sizes and partition tuples match the live snapshot
  * bit-for-bit. */
class IcebergExportSpec extends SparkSpec {
  import spark.implicits._

  private implicit val fmts: Formats = DefaultFormats
  private def conf = spark.sparkContext.hadoopConfiguration

  private def readAvro(p: Path): Seq[GenericRecord] = {
    val in = p.getFileSystem(conf).open(p)
    val rdr = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try {
      val buf = Seq.newBuilder[GenericRecord]
      while (rdr.hasNext) buf += rdr.next()
      buf.result()
    } finally rdr.close()
  }

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

  private def batch(day: String, ids: Range) =
    ids.map(i => (i.toLong, day, s"w$i")).toDF("id", "day", "w")

  test("export mirrors the live snapshot; every layer parses back exactly") {
    val base = tmpDir("iceberg")
    val t = IncrementalTable(spark, s"$base/t")
    for (d <- Seq("a", "b", "c")) t.append(batch(d, 0 until 40), Seq("day"))
    // dead files must be invisible: replace one partition
    t.replaceWhere(batch("b", 100 until 120), Seq("day"),
      Map("day" -> "b"), Map("day" -> "b"))
    val dest = s"$base/ice"
    val r = IcebergExport.export(spark, t, dest, manifestTargetEntries = 2)
    assert(r.dataFiles == t.liveFiles().size)
    assert(r.totalRows == t.read().count())
    assert(r.manifests == (r.dataFiles + 1) / 2, s"chunking: $r")

    // ---- metadata.json wiring ----------------------------------------
    val metaDir = new Path(dest, "metadata")
    assert(readText(new Path(metaDir, "version-hint.text")) == "1")
    val md = JsonMethods.parse(readText(new Path(metaDir, r.metadataFile
      .stripPrefix("metadata/"))))
    assert((md \ "format-version").extract[Int] == 2)
    assert((md \ "current-snapshot-id").extract[Long] == t.latestVersion)
    val fields = (md \ "schemas")(0) \ "fields"
    assert(fields.children.map(f => (f \ "name").extract[String]) ==
      Seq("id", "day", "w"))
    val ids = fields.children.map(f =>
      (f \ "name").extract[String] -> (f \ "id").extract[Int]).toMap
    val spec = ((md \ "partition-specs")(0) \ "fields")(0)
    assert((spec \ "name").extract[String] == "day")
    assert((spec \ "transform").extract[String] == "identity")
    assert((spec \ "source-id").extract[Int] == ids("day"))
    // name mapping rides properties (our parquet has no field-ids)
    val nm = JsonMethods.parse(
      (md \ "properties" \ "schema.name-mapping.default").extract[String])
    assert(nm.children.map(e => (e \ "names")(0).extract[String]).toSet ==
      Set("id", "day", "w"))

    // ---- manifest list -----------------------------------------------
    val listPath = new Path((((md \ "snapshots")(0)) \ "manifest-list")
      .extract[String])
    val list = readAvro(listPath)
    assert(list.size == r.manifests)
    assert(list.map(_.get("added_files_count").asInstanceOf[Int]).sum ==
      r.dataFiles)
    assert(list.map(_.get("added_rows_count").asInstanceOf[Long]).sum ==
      r.totalRows)
    val fs = listPath.getFileSystem(conf)
    list.foreach { m =>
      val mp = new Path(m.get("manifest_path").toString)
      assert(fs.getFileStatus(mp).getLen ==
        m.get("manifest_length").asInstanceOf[Long], mp)
    }

    // ---- manifests: exact file set, rows, bytes, partition tuples -----
    val entries = list.flatMap(m =>
      readAvro(new Path(m.get("manifest_path").toString)))
    val tfs = new Path(t.root).getFileSystem(conf)
    val wantFiles = t.liveFiles()
      .map(rel => tfs.makeQualified(new Path(t.root, rel)).toString).toSet
    val gotFiles = entries.map(
      _.get("data_file").asInstanceOf[GenericRecord]
        .get("file_path").toString).toSet
    assert(gotFiles == wantFiles)
    assert(entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum == t.read().count())
    entries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      val p = new Path(df.get("file_path").toString)
      assert(tfs.getFileStatus(p).getLen ==
        df.get("file_size_in_bytes").asInstanceOf[Long], p)
      val day = df.get("partition").asInstanceOf[GenericRecord]
        .get("day").toString
      assert(df.get("file_path").toString.contains(s"day=$day/"),
        s"partition tuple must match the dir token: $df")
      assert(df.get("file_format").toString == "PARQUET")
      assert(e.get("status").asInstanceOf[Int] == 1)
    }

    // ---- re-export after new commits bumps the metadata version -------
    t.append(batch("d", 0 until 10), Seq("day"))
    val r2 = IcebergExport.export(spark, t, dest)
    assert(r2.metadataFile == "metadata/v2.metadata.json")
    assert(readText(new Path(metaDir, "version-hint.text")) == "2")
    assert(r2.snapshotId == t.latestVersion && r2.snapshotId > r.snapshotId)
    assert(r2.dataFiles == t.liveFiles().size)
  }

  test("SQL door returns the export summary") {
    val base = tmpDir("iceberg")
    spark.conf.set("spark.sql.catalog.icat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.icat.warehouse", s"$base/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS icat.lake")
    spark.sql("CREATE TABLE icat.lake.exp (id BIGINT, w STRING)")
    spark.sql("INSERT INTO icat.lake.exp SELECT id, CAST(id AS STRING) FROM range(50)")
    val row = spark.sql(
      s"CALL icat.system.export_iceberg('lake.exp', '$base/ice2')").head
    assert(row.getAs[Int]("data_files") >= 1)
    assert(row.getAs[Long]("total_rows") == 50L)
    assert(row.getAs[String]("metadata_file") == "metadata/v1.metadata.json")
    // unpartitioned: the partition struct is EMPTY, not absent
    val md = JsonMethods.parse(readText(
      new Path(s"$base/ice2/metadata/v1.metadata.json")))
    assert((((md \ "partition-specs")(0)) \ "fields").children.isEmpty)
  }

  test("refusals: hidden transforms, VARIANT columns") {
    val base = tmpDir("iceberg")
    // hidden-partitioning transforms → refuse
    spark.conf.set("spark.sql.catalog.icat2",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.icat2.warehouse", s"$base/wh2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS icat2.lake")
    spark.sql("""CREATE TABLE icat2.lake.ht (id BIGINT, ts TIMESTAMP)
      |PARTITIONED BY (days(ts))""".stripMargin)
    spark.sql("""INSERT INTO icat2.lake.ht
      |SELECT id, TIMESTAMP'2026-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT))
      |FROM range(5)""".stripMargin)
    val ht = IncrementalTable(spark, s"$base/wh2/lake/ht")
    val e2 = intercept[IllegalArgumentException](
      IcebergExport.export(spark, ht, s"$base/ht_ice"))
    assert(e2.getMessage.contains("hidden-partitioning"), e2.getMessage)
    // VARIANT column → refuse, naming the shredding remedy
    val tv = IncrementalTable(spark, s"$base/var")
    tv.append(spark.range(3).selectExpr("id", "parse_json('{\"a\":1}') AS v"), Nil)
    val e3 = intercept[IllegalArgumentException](
      IcebergExport.export(spark, tv, s"$base/var_ice"))
    assert(e3.getMessage.contains("VARIANT"), e3.getMessage)
  }

  test("incremental re-export: clean manifests reused by reference, footers read only for new files") {
    val base = tmpDir("iceberg")
    val t = IncrementalTable(spark, s"$base/t")
    for (d <- Seq("a", "b", "c")) t.append(batch(d, 0 until 40), Seq("day"))
    val dest = s"$base/ice"
    val r1 = IcebergExport.export(spark, t, dest, manifestTargetEntries = 2)
    assert(r1.manifestsReused == 0 && r1.footersRead == r1.dataFiles)
    // append-only: ALL previous manifests reuse, ONLY new files' footers read
    val before = t.liveFiles().size
    t.append(batch("d", 0 until 20), Seq("day"))
    val newFiles = t.liveFiles().size - before
    val r2 = IcebergExport.export(spark, t, dest, manifestTargetEntries = 2)
    assert(r2.manifestsReused == r1.manifests, s"append-only must reuse all: $r2 vs $r1")
    assert(r2.footersRead == newFiles, s"footers only for the new files: $r2")
    assert(r2.dataFiles == t.liveFiles().size)
    // partition replace: exactly the manifests holding day=b files
    // rewrite; replaced files re-harvest, everything else carries over
    t.replaceWhere(batch("b", 100 until 140), Seq("day"),
      Map("day" -> "b"), Map("day" -> "b"))
    val bFiles = t.liveFiles().count(_.startsWith("day=b/"))
    val r3 = IcebergExport.export(spark, t, dest, manifestTargetEntries = 2)
    assert(r3.footersRead == bFiles, s"only the replaced partition harvests: $r3 bFiles=$bFiles")
    assert(r3.manifestsReused > 0 && r3.manifestsReused < r2.manifests,
      s"day=b manifests rewrite, the rest reuse: $r3 vs $r2")
    // the incremental export still parses back EXACT — carried row
    // counts and byte sizes must equal filesystem truth. Prior
    // snapshots carry forward, so resolve the CURRENT one by id.
    val md = JsonMethods.parse(readText(new Path(s"$dest/metadata/v3.metadata.json")))
    val curId = (md \ "current-snapshot-id").extract[Long]
    val curSnap = (md \ "snapshots").children
      .find(sn => (sn \ "snapshot-id").extract[Long] == curId).get
    // ADVICE r13 low: reused manifests keep their ORIGINAL
    // added_snapshot_id — every such id must resolve in `snapshots`
    val knownIds = (md \ "snapshots").children
      .map(sn => (sn \ "snapshot-id").extract[Long]).toSet
    val listPath = new Path((curSnap \ "manifest-list").extract[String])
    readAvro(listPath).foreach { m =>
      assert(knownIds(m.get("added_snapshot_id").asInstanceOf[Long]),
        s"dangling added_snapshot_id in $m — history must carry forward")
    }
    val entries = readAvro(listPath).flatMap(m =>
      readAvro(new Path(m.get("manifest_path").toString)))
    val tfs = new Path(t.root).getFileSystem(conf)
    val wantFiles = t.liveFiles()
      .map(rel => tfs.makeQualified(new Path(t.root, rel)).toString).toSet
    assert(entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("file_path").toString).toSet == wantFiles)
    assert(entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum == t.read().count())
    entries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      assert(tfs.getFileStatus(new Path(df.get("file_path").toString)).getLen
        == df.get("file_size_in_bytes").asInstanceOf[Long])
    }
    // a schema change invalidates reuse — the next export starts fresh
    import org.apache.spark.sql.functions.lit
    t.append(batch("e", 0 until 5).withColumn("extra", lit(1L)), Seq("day"))
    val r4 = IcebergExport.export(spark, t, dest)
    assert(r4.manifestsReused == 0 && r4.footersRead == t.liveFiles().size,
      s"schema evolution must start a fresh export: $r4")
  }

  test("renamed columns export BOTH logical and physical names in the name mapping") {
    // ADVICE r13 high: parquet bytes live under the immutable PHYSICAL
    // name; without the alias an Iceberg reader resolving by name
    // mapping silently reads NULL for every renamed column.
    val base = tmpDir("iceberg")
    val t = IncrementalTable(spark, s"$base/t")
    t.append(batch("a", 0 until 20), Seq("day"))
    t.renameColumn("w", "word")
    assert(t.columnMapping() == Map("word" -> "w"))
    val r = IcebergExport.export(spark, t, s"$base/ice")
    val md = JsonMethods.parse(readText(new Path(
      s"$base/ice/metadata/${r.metadataFile.stripPrefix("metadata/")}")))
    val nm = JsonMethods.parse(
      (md \ "properties" \ "schema.name-mapping.default").extract[String])
    val byFirst = nm.children.map(e =>
      (e \ "names")(0).extract[String] ->
        (e \ "names").children.map(_.extract[String])).toMap
    assert(byFirst("word") == List("word", "w"),
      s"renamed column must alias its physical parquet name: $byFirst")
    assert(byFirst("id") == List("id") && byFirst("day") == List("day"))
    // schema itself carries ONLY the logical name
    val fieldNames = ((md \ "schemas")(0) \ "fields").children
      .map(f => (f \ "name").extract[String])
    assert(fieldNames == Seq("id", "day", "word"))
  }

  test("partition values unescape and nulls export as Avro null") {
    // ADVICE r13 medium: dir tokens are hive-ESCAPED ('%3A' = ':') and
    // null renders as __HIVE_DEFAULT_PARTITION__; exporting raw tokens
    // would silently corrupt string values and throw on numeric nulls.
    val base = tmpDir("iceberg")
    val t = IncrementalTable(spark, s"$base/t")
    t.append(Seq((1L, "a:b c"), (2L, "x=y%z"), (3L, null: String))
      .toDF("id", "tag"), Seq("tag"))
    val r = IcebergExport.export(spark, t, s"$base/ice")
    assert(r.dataFiles == 3 && r.totalRows == 3)
    val md = JsonMethods.parse(readText(new Path(
      s"$base/ice/metadata/${r.metadataFile.stripPrefix("metadata/")}")))
    val listPath = new Path((((md \ "snapshots")(0)) \ "manifest-list")
      .extract[String])
    val tags = readAvro(listPath)
      .flatMap(m => readAvro(new Path(m.get("manifest_path").toString)))
      .map { e =>
        val p = e.get("data_file").asInstanceOf[GenericRecord]
          .get("partition").asInstanceOf[GenericRecord].get("tag")
        Option(p).map(_.toString)
      }.toSet
    assert(tags == Set(Some("a:b c"), Some("x=y%z"), None),
      s"partition tuple must carry the REAL values: $tags")
    // numeric null partition must not throw mid-export either
    val tn = IncrementalTable(spark, s"$base/tn")
    tn.append(Seq((1L, java.lang.Long.valueOf(7L)), (2L, null: java.lang.Long))
      .toDF("id", "bucket"), Seq("bucket"))
    val rn = IcebergExport.export(spark, tn, s"$base/icen")
    assert(rn.dataFiles == 2 && rn.totalRows == 2)
  }

  test("metadata version is max+1 and never silently clobbers across gaps") {
    // ADVICE r13 low: 1+count(v*) collides after a gap (a manually
    // deleted version) and the old overwrite=true silently destroyed
    // the surviving version's snapshot history.
    val base = tmpDir("iceberg")
    val t = IncrementalTable(spark, s"$base/t")
    t.append(batch("a", 0 until 10), Seq("day"))
    IcebergExport.export(spark, t, s"$base/ice")
    t.append(batch("b", 0 until 10), Seq("day"))
    IcebergExport.export(spark, t, s"$base/ice")
    val metaDir = new Path(s"$base/ice/metadata")
    val fs = metaDir.getFileSystem(conf)
    val v2Before = fs.getFileStatus(new Path(metaDir, "v2.metadata.json"))
    // punch a gap: v1 goes away, count(v*)=1 but max(vN)=2
    fs.delete(new Path(metaDir, "v1.metadata.json"), false)
    t.append(batch("c", 0 until 10), Seq("day"))
    val r3 = IcebergExport.export(spark, t, s"$base/ice")
    assert(r3.metadataFile == "metadata/v3.metadata.json",
      s"next version must be max+1 across gaps: $r3")
    val v2After = fs.getFileStatus(new Path(metaDir, "v2.metadata.json"))
    assert(v2After.getModificationTime == v2Before.getModificationTime &&
      v2After.getLen == v2Before.getLen,
      "a surviving metadata version must never be clobbered")
    assert(readText(new Path(metaDir, "version-hint.text")) == "3")
  }

  test("MERGE-ON-READ export: DVs and equality deletes map to Iceberg v2 delete files (VERDICT r13 #5)") {
    import org.apache.spark.sql.functions.{col, lit}
    val base = tmpDir("iceberg")
    val t = IncrementalTable(spark, s"$base/t")
    for (d <- Seq("a", "b")) t.append(batch(d, 0 until 40), Seq("day"))
    // position deletes (DVs) across both partitions
    t.deleteVectorized($"id" < 5)
    // equality delete on id=7, then an UPSERT-shaped later append whose
    // id=7 row must ESCAPE (added after baseVersion) — the sequence-
    // number mapping is what carries that rule to Iceberg readers
    t.deleteByKey(Seq(7L).toDF("id"), Seq("id"))
    t.append(Seq((7L, "a", "w7_v2")).toDF("id", "day", "w"), Seq("day"))
    val r = IcebergExport.export(spark, t, s"$base/ice")
    assert(r.posDeleteFiles >= 1, r.toString)
    assert(r.eqDeleteFiles >= 1, r.toString)

    // ---- parse back and replay the MOR read the way an Iceberg reader
    // would: data rows minus matching (file_path,pos) rows minus rows
    // matching an equality tuple in files with data_seq < delete_seq.
    // The result must equal graft's own MOR read bit-for-bit — which is
    // also exactly apply_eq_deletes()+compact() would materialize, so
    // the equivalence is pinned on the LIVE MOR state.
    val md = JsonMethods.parse(readText(new Path(
      s"$base/ice/metadata/${r.metadataFile.stripPrefix("metadata/")}")))
    assert((md \ "last-sequence-number").extract[Long] == 3L,
      "1 eq delete: data seqs 1/2, eq seq 2, pos seq 3")
    val curId = (md \ "current-snapshot-id").extract[Long]
    val snap = (md \ "snapshots").children
      .find(sn => (sn \ "snapshot-id").extract[Long] == curId).get
    val list = readAvro(new Path((snap \ "manifest-list").extract[String]))
    val (delLists, dataLists) = list.partition(
      _.get("content").asInstanceOf[Int] == 1)
    assert(delLists.size == 2, s"one pos + one eq delete manifest: $list")
    // data entries with per-file sequence numbers
    val dataEntries = dataLists.flatMap(m =>
      readAvro(new Path(m.get("manifest_path").toString)))
    val delEntries = delLists.flatMap(m =>
      readAvro(new Path(m.get("manifest_path").toString)))
    def df_(e: GenericRecord) = e.get("data_file").asInstanceOf[GenericRecord]
    val posFiles = delEntries.filter(e =>
      df_(e).get("content").asInstanceOf[Int] == 1)
    val eqFiles = delEntries.filter(e =>
      df_(e).get("content").asInstanceOf[Int] == 2)
    assert(posFiles.nonEmpty && eqFiles.nonEmpty, delEntries.toString)
    // the escaped upsert file carries a seq ABOVE the eq delete's; the
    // covered originals sit below it
    val eqSeq = eqFiles.map(_.get("sequence_number").asInstanceOf[Long]).max
    val dataSeqs = dataEntries.map(e =>
      e.get("sequence_number").asInstanceOf[Long])
    assert(dataSeqs.exists(_ < eqSeq) && dataSeqs.exists(_ >= eqSeq),
      s"upsert escape needs seqs straddling the delete: $dataSeqs vs $eqSeq")
    eqFiles.foreach { e =>
      val ids = df_(e).get("equality_ids")
      assert(ids != null && ids.toString.nonEmpty, s"equality_ids: $e")
    }

    // simulated MOR read
    val dataRows = dataEntries.map { e =>
      val df = df_(e)
      val p = df.get("file_path").toString
      val day = df.get("partition").asInstanceOf[GenericRecord]
        .get("day").toString
      spark.read.parquet(p)
        .withColumn("day", lit(day))
        .withColumn("_fp", lit(p))
        .withColumn("_pos", col("_metadata.row_index"))
        .withColumn("_seq",
          lit(e.get("sequence_number").asInstanceOf[Long]))
    }.reduce(_ unionByName _)
    val posDel = posFiles.map { e =>
      spark.read.parquet(df_(e).get("file_path").toString)
    }.reduce(_ union _)
    val afterPos = dataRows.join(posDel,
      dataRows("_fp") === posDel("file_path") &&
        dataRows("_pos") === posDel("pos"), "left_anti")
    val eqKeys = eqFiles.map { e =>
      spark.read.parquet(df_(e).get("file_path").toString)
    }.reduce(_ union _)
    val survivors = afterPos
      .join(eqKeys.withColumnRenamed("id", "_ek"),
        afterPos("id") === col("_ek") && afterPos("_seq") < lit(eqSeq),
        "left_anti")
      .select("id", "day", "w")
    val want = t.read().select("id", "day", "w")
      .collect().map(_.toSeq).toSet
    val got = survivors.collect().map(_.toSeq).toSet
    assert(got == want,
      s"Iceberg MOR replay diverged: ${got.size} vs ${want.size} rows")

    // position-delete files are sorted (file_path, pos) per the spec
    posFiles.foreach { e =>
      val rows = spark.read.parquet(df_(e).get("file_path").toString)
        .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
      assert(rows == rows.sorted, "position delete rows must be sorted")
    }
  }
}
