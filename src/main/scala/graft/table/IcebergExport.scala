package graft.table

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** What one [[IcebergExport.export]] call wrote. */
final case class IcebergExportResult(snapshotId: Long, metadataFile: String,
    manifests: Int, dataFiles: Int, totalRows: Long,
    manifestsReused: Int, footersRead: Int,
    posDeleteFiles: Int = 0, eqDeleteFiles: Int = 0)

/** Iceberg-v2-compatible snapshot export (VERDICT r12 #6, extending the
  * X33 external-reader family): `CALL graft.system.export_iceberg(
  * 'ns.t', dest)` mirrors the CURRENT live snapshot as a structurally
  * valid Iceberg v2 table — `metadata/vN.metadata.json` +
  * `version-hint.text` (the HadoopTables convention), an Avro manifest
  * list, and chunked Avro manifests whose entries carry the live data
  * files IN PLACE (absolute URIs — no data copies, the shallow-export
  * analog of X78's clone). An Iceberg-capable engine points
  * `HadoopTables.load(dest)` at it and reads exactly the committed
  * snapshot.
  *
  * MERGE-ON-READ snapshots export NATIVELY (VERDICT r13 #5 — Iceberg
  * v2 delete files are the exact mapping, no forced compaction):
  *  - deletion vectors (X10/X82 position sidecars) become Iceberg
  *    POSITION delete files: the standing `(file, pos)` rows rewrite
  *    to `(file_path, pos)` parquet (absolute data URIs, sorted), one
  *    delete file per touched partition, carried by a `content=1`
  *    delete manifest whose entries keep the data partition tuple;
  *  - equality deletes (X104) become Iceberg EQUALITY delete files:
  *    the immutable key-tuple sidecars are referenced IN PLACE (the
  *    same zero-copy rule as data), `equality_ids` mapping the
  *    physical key columns to their field-ids, in an UNPARTITIONED
  *    spec manifest (global scope, exactly graft's semantics);
  *  - graft's "files added after baseVersion escape" rule maps to
  *    Iceberg SEQUENCE NUMBERS: data files take seq `group+1` from the
  *    SAME `eqDelGroups` applicability fold the read path uses, the
  *    i-th equality delete takes seq `i+2` (so it covers exactly data
  *    seq < i+2), and position deletes take the head seq (they name
  *    exact file paths). With no deletes in force everything stays at
  *    the flat seq 1 of previous rounds.
  *
  * Scope and refusals (each loud, naming the remedy):
  *  - hidden-partitioning transforms refuse (the export maps identity
  *    partitions only; transformed dir tokens would need the source
  *    value, which the token no longer carries);
  *  - VARIANT columns refuse (an Iceberg v3 type; v2 has no mapping);
  *  - a file whose path does not carry every partition token in spec
  *    order refuses (shallow-cloned foreign layouts, pre-evolution
  *    shapes — rewrite into the current spec first).
  *
  * Fidelity notes:
  *  - Field-ids are assigned fresh (top-level first, then a nested
  *    walk) and recorded BOTH in the schema and as a FULL recursive
  *    `schema.name-mapping.default` table property (struct members,
  *    list elements, map keys/values), because our parquet files carry
  *    no embedded field-ids — name mapping is exactly Iceberg's
  *    mechanism for adopting such files.
  *  - Column mapping (X72 rename) is honored: a renamed column's
  *    mapping entry lists BOTH the logical and the immutable PHYSICAL
  *    name (`names: [logical, physical]`), because the parquet bytes
  *    are written under the physical name — without the alias an
  *    Iceberg reader resolving by name finds no column and silently
  *    reads NULL (ADVICE r13 high).
  *  - Identity partition values are recovered from the hive dir tokens
  *    with the writer's own unescape ('%3A' → ':', …) and the
  *    `__HIVE_DEFAULT_PARTITION__` marker maps to an Avro null
  *    (partition fields are nullable in the manifest schema) — raw
  *    escaped tokens would export silently wrong string values and
  *    throw on null numeric partitions (ADVICE r13 medium).
  *  - The new metadata version is max(existing vN)+1 and the file is
  *    created no-overwrite, so a gap in the version sequence can never
  *    silently clobber an existing version (ADVICE r13 low).
  *  - Prior snapshots carry FORWARD into the new metadata's
  *    `snapshots` / `snapshot-log` (and the prior metadata file into
  *    `metadata-log`) whenever schema+spec are unchanged, so reused
  *    manifests' original `added_snapshot_id`s always resolve — no
  *    dangling ids for metadata-table readers (ADVICE r13 low). A
  *    schema/spec change starts a fresh single-snapshot history (the
  *    carried snapshots would otherwise mis-bind to the new schema-id).
  *
  * Scale: the only per-file work is the footer row-count + length
  * harvest, which reuses the commit path's two-shape rule — inline on
  * the driver up to `spark.graft.distributedStatsThreshold` files, one
  * Spark job above it. Re-export is INCREMENTAL when schema and spec
  * are unchanged: clean manifests are referenced, not rewritten, and
  * previously harvested per-file stats carry forward. Manifests chunk
  * at `manifestTargetEntries` entries, so the manifest list stays
  * O(files / chunk) and no single Avro file grows with the table.
  * Validation without Iceberg jars is structural: IcebergExportSpec
  * parses everything back (JSON + generic Avro) and asserts file sets,
  * row counts and byte sizes exactly. */
object IcebergExport {

  private val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  def export(spark: SparkSession, t: IncrementalTable, dest: String,
      manifestTargetEntries: Int = 10000): IcebergExportResult = {
    require(t.exists, s"export_iceberg source $t does not exist")
    require(t.partitionTransforms().isEmpty,
      s"table ${t.root} uses hidden-partitioning transforms — the " +
        "export maps identity partitions only")
    val schema = t.schemaAt().getOrElse(throw new IllegalArgumentException(
      s"table ${t.root} has no schema (no data commits) — nothing to export"))
    schema.foreach(f => requireNoVariant(f.name, f.dataType))
    val partitionBy = t.partitionColumns
    val cmap = t.columnMapping()

    val conf = IncrementalTable.hadoopConf(spark)
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(conf)
    val metaDir = new Path(destPath, "metadata")
    fs.mkdirs(metaDir)

    // ---- ids + schema/spec/name-mapping JSON --------------------------
    // Top-level ids first (stable source-ids for the spec), then each
    // field's nested ids from the shared counter. The name-mapping walk
    // shares the SAME traversal, so every minted id gets a mapping entry.
    var lastId = 0
    def nextId(): Int = { lastId += 1; lastId }
    val topIds = schema.fields.map(f => f.name -> nextId()).toMap
    val (fieldsJson, mappingJson) = schema.fields.map { f =>
      val (tJson, childMap) = typeAndMapping(f.dataType, f.name, cmap, nextId)
      val sf: JValue = ("id" -> topIds(f.name)) ~ ("name" -> f.name) ~
        ("required" -> !f.nullable) ~ ("type" -> tJson)
      (sf, mappingEntry(topIds(f.name), names(f.name, f.name, cmap), childMap))
    }.toList.unzip
    val schemaJson: JObject =
      ("type" -> "struct") ~ ("schema-id" -> 0) ~ ("fields" -> fieldsJson)
    val specFields = partitionBy.zipWithIndex.map { case (c, i) =>
      val srcId = topIds.getOrElse(c, throw new IllegalStateException(
        s"partition column '$c' is not in the schema"))
      ("name" -> c) ~ ("transform" -> "identity") ~
        ("source-id" -> srcId) ~ ("field-id" -> (1000 + i))
    }.toList
    val specJson: JObject = ("spec-id" -> 0) ~ ("fields" -> specFields)
    val nameMapping =
      JsonMethods.compact(JsonMethods.render(JArray(mappingJson)))

    // ---- incremental reuse (the X108 pattern applied to the export):
    // a previous export of the SAME schema + spec contributes (a) its
    // clean manifests BY REFERENCE — every file still live, no Avro
    // rewrite — and (b) carried row counts / byte sizes for files it
    // already harvested, so the footer pass touches ONLY never-seen
    // files. An append-only re-export is O(new files); a partition
    // replace rewrites exactly the manifests holding removed files.
    val rels = t.liveFiles().sorted
    val rootStr = t.root
    val tableFs = new Path(rootStr).getFileSystem(conf)
    def absUri(rel: String): String =
      tableFs.makeQualified(new Path(rootStr, rel)).toString
    val schemaJsonStr = JsonMethods.compact(JsonMethods.render(schemaJson))
    val specJsonStr = JsonMethods.compact(JsonMethods.render(specFields))
    val eqs = t.eqDeletes() // ascending by (baseVersion, gen)
    val dvMap = t.liveDv() // data rel path -> sidecar generations
    // per-file sequence numbers vary once equality deletes are in
    // force — previously written flat-seq manifests cannot be reused
    // then (delete manifests are rewritten fresh every export either
    // way; readPrevious already skips them for reuse/stats)
    val prev =
      if (eqs.nonEmpty) None
      else readPrevious(fs, metaDir, schemaJsonStr, specJsonStr)
    val prevManifests = prev.map(_.manifests).getOrElse(Nil)
    val liveAbsSet = rels.map(absUri).toSet
    val reused = prevManifests.filter(_.entries.forall(e => liveAbsSet(e._1)))
    val carried: Map[String, (Long, Long)] =
      prevManifests.flatMap(_.entries).map(e => e._1 -> (e._2, e._3)).toMap
    val coveredAbs = reused.flatMap(_.entries).map(_._1).toSet
    val leftover = rels.filterNot(r => coveredAbs(absUri(r)))
    val needFooter = leftover.filterNot(r => carried.contains(absUri(r)))

    // ---- per-file row counts + byte sizes (two-shape harvest, only the
    // files no previous export measured) --------------------------------
    val threshold = spark.conf
      .getOption("spark.graft.distributedStatsThreshold")
      .map(_.toInt).getOrElse(IncrementalTable.DefaultDistributedStatsThreshold)
    val harvested: Map[String, (Long, Long)] =
      if (needFooter.size <= threshold)
        needFooter.map(rel =>
          rel -> footerMeta(new Path(rootStr, rel), conf)).toMap
      else {
        val sconf = new graft.parquet.RowParquet.SerializableConf(conf)
        val slices = math.min(needFooter.size,
          spark.sparkContext.defaultParallelism * 2).max(1)
        spark.sparkContext.parallelize(needFooter, slices).map { rel =>
          rel -> footerMeta(new Path(rootStr, rel), sconf.value)
        }.collect().toMap
      }
    val fileMeta: Seq[(String, Long, Long)] = leftover.map { rel =>
      val (r, b) = carried.getOrElse(absUri(rel), harvested(rel))
      (rel, r, b)
    }
    val totalRows = fileMeta.iterator.map(_._2).sum +
      reused.iterator.flatMap(_.entries).map(_._2).sum

    // ---- partition tuple per file (identity tokens, spec order) -------
    // Dir tokens carry the PHYSICAL column name (X72 renames never
    // rewrite paths) and the writer's hive escaping; recover the real
    // value via unescape, and map the hive null marker to None → an
    // Avro null in the (nullable) partition struct.
    def partitionOf(rel: String): Seq[(String, Option[String])] = {
      val tokens = rel.split("/").dropRight(1).iterator.map { seg =>
        val i = seg.indexOf('=')
        if (i <= 0) "" -> "" else seg.take(i) -> seg.drop(i + 1)
      }.toMap
      partitionBy.map { c =>
        val raw = tokens.get(cmap.getOrElse(c, c)).orElse(tokens.get(c))
          .getOrElse(throw new IllegalArgumentException(
            s"file '$rel' does not carry partition token '$c=' — foreign " +
              "or pre-evolution layout; rewrite into the current spec " +
              "before exporting"))
        c -> (if (raw == HiveDefaultPartition) None
              else Some(graft.parquet.RowParquet.unescapePathName(raw)))
      }
    }

    // ---- snapshot identity --------------------------------------------
    val head = t.commits().last
    val snapshotId = t.latestVersion
    val ts = head.ts

    // ---- sequence numbers (MOR fidelity) --------------------------------
    // Data files take seq group+1 from the SAME applicability fold the
    // read path uses (eqDelGroups — applicability is a suffix of the
    // baseVersion-ascending delete list, so groups nest); the i-th
    // equality delete takes seq i+2 (Iceberg applies an equality delete
    // to data with data_seq < delete_seq — exactly graft's "added at or
    // before baseVersion" rule); position deletes name exact file paths
    // and take the top seq. With no deletes in force everything stays
    // at the flat seq 1 of previous rounds.
    val seqOf: String => Long =
      if (eqs.isEmpty) _ => 1L
      else t.eqDelGroups(rels, eqs, snapshotId).flatMap { case (suffix, fs0) =>
        val g = eqs.length - suffix.length
        fs0.map(_ -> (g + 1L))
      }.toMap
    val posDeleteSeq = eqs.length + 2L
    val lastSeq =
      if (dvMap.nonEmpty) posDeleteSeq
      else if (eqs.nonEmpty) eqs.length + 1L
      else 1L

    // ---- manifests (chunked Avro; a chunk never mixes seqs) ------------
    val entrySchema = new Schema.Parser().parse(
      manifestEntrySchemaJson(schema, partitionBy))
    val partSchema = entrySchema.getField("data_file").schema()
      .getField("partition").schema()
    val dataFileSchema = entrySchema.getField("data_file").schema()
    def writeManifest(name: String, schemaOfEntry: Schema, specId: Int,
        content: String,
        entries: Iterator[GenericRecord]): (String, Long) = {
      val p = new Path(metaDir, name)
      val out = fs.create(p, true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schemaOfEntry))
      w.setMeta("schema", schemaJsonStr)
      w.setMeta("partition-spec",
        if (specId == 0) specJsonStr else "[]")
      w.setMeta("partition-spec-id", specId.toString)
      w.setMeta("format-version", "2")
      w.setMeta("content", content)
      w.create(schemaOfEntry, out)
      try entries.foreach(w.append) finally w.close()
      (name, fs.getFileStatus(p).getLen)
    }
    val chunks: Seq[(Long, Seq[(String, Long, Long)])] =
      fileMeta.groupBy(f => seqOf(f._1)).toSeq.sortBy(_._1).flatMap {
        case (sq, fm) =>
          fm.grouped(math.max(1, manifestTargetEntries)).map(sq -> _)
      }
    val manifests = chunks.zipWithIndex.map { case ((sq, chunk), i) =>
      val entries = chunk.iterator.map { case (rel, rows, bytes) =>
        val part = new GenericData.Record(partSchema)
        partitionOf(rel).foreach { case (c, v) =>
          part.put(c, v.map(partitionValue(schema(c).dataType, _)).orNull)
        }
        val df = new GenericData.Record(dataFileSchema)
        df.put("content", 0)
        df.put("file_path", absUri(rel))
        df.put("file_format", "PARQUET")
        df.put("partition", part)
        df.put("record_count", rows)
        df.put("file_size_in_bytes", bytes)
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1) // ADDED in this snapshot
        e.put("snapshot_id", snapshotId)
        e.put("sequence_number", sq)
        e.put("file_sequence_number", sq)
        e.put("data_file", df)
        e
      }
      val (name, len) =
        writeManifest(f"m$i%05d-$snapshotId.avro", entrySchema, 0, "data",
          entries)
      (name, len, chunk.size, chunk.iterator.map(_._2).sum, sq)
    }

    // ---- POSITION delete files (DVs -> Iceberg, VERDICT r13 #5) --------
    // The standing (file, pos) sidecar rows rewrite to (file_path, pos)
    // parquet — absolute data URIs, sorted per the spec — ONE delete
    // file per touched partition so each manifest entry carries the
    // right partition tuple. Volume is the standing delete volume
    // (bounded by compaction/auto-apply), and the rewrite is a Spark
    // job per touched partition, never a driver fold over positions.
    val absBase = tableFs.makeQualified(new Path(rootStr)).toString
      .stripSuffix("/")
    val schemePfx = {
      val u = new Path(absBase).toUri
      u.getScheme + ":" + Option(u.getAuthority).fold("")("//" + _)
    }
    val posDeletes: Seq[(String, Long, Long, String)] = // (uri,rows,bytes,sampleRel)
      if (dvMap.isEmpty) Nil
      else {
        import org.apache.spark.sql.functions.{col, concat, lit, when}
        val dvSchema = new StructType()
          .add("file", StringType).add("pos", LongType)
        dvMap.keys.toSeq.sorted.groupBy(partitionOf).toSeq
          .sortBy(_._2.head).zipWithIndex.map { case ((_, files), i) =>
            val gens = files.flatMap(dvMap(_)).distinct.sorted
            val rows = spark.read.schema(dvSchema)
              .parquet(gens.map(g =>
                new Path(rootStr, s"${t.dvPrefix}/$g").toString): _*)
              .filter(col("file").isin(files: _*))
              .select(
                when(col("file").startsWith("/"),
                  concat(lit(schemePfx), col("file")))
                  .otherwise(concat(lit(absBase + "/"), col("file")))
                  .as("file_path"),
                col("pos"))
              .distinct()
              .repartition(1).sortWithinPartitions("file_path", "pos")
            val dir = new Path(destPath, f"deletes/pos-$snapshotId-$i%05d")
            rows.write.mode("overwrite").parquet(dir.toString)
            val part = fs.listStatus(dir).map(_.getPath)
              .filter(_.getName.endsWith(".parquet")) match {
              case Array(one) => one
              case many => throw new IllegalStateException(
                s"position-delete write produced ${many.length} files in $dir")
            }
            val (nRows, bytes) = footerMeta(part, conf)
            (fs.makeQualified(part).toString, nRows, bytes, files.head)
          }
      }
    val posDeleteManifests: Seq[(String, Long, Int, Long, Long)] =
      if (posDeletes.isEmpty) Nil
      else {
        val entries = posDeletes.iterator.map { case (uri, rows, bytes, rel) =>
          val part = new GenericData.Record(partSchema)
          partitionOf(rel).foreach { case (c, v) =>
            part.put(c, v.map(partitionValue(schema(c).dataType, _)).orNull)
          }
          val df = new GenericData.Record(dataFileSchema)
          df.put("content", 1) // POSITION_DELETES
          df.put("file_path", uri)
          df.put("file_format", "PARQUET")
          df.put("partition", part)
          df.put("record_count", rows)
          df.put("file_size_in_bytes", bytes)
          val e = new GenericData.Record(entrySchema)
          e.put("status", 1)
          e.put("snapshot_id", snapshotId)
          e.put("sequence_number", posDeleteSeq)
          e.put("file_sequence_number", posDeleteSeq)
          e.put("data_file", df)
          e
        }
        val (name, len) = writeManifest(s"del-pos-$snapshotId.avro",
          entrySchema, 0, "deletes", entries)
        Seq((name, len, posDeletes.size,
          posDeletes.iterator.map(_._2).sum, posDeleteSeq))
      }

    // ---- EQUALITY delete files (X104 -> Iceberg) ------------------------
    // The immutable key-tuple sidecars are referenced IN PLACE (the
    // zero-copy rule); `equality_ids` maps the PHYSICAL key columns
    // back through column mapping to their schema field-ids. Scope is
    // global, so the entries ride an UNPARTITIONED spec (id 1) — the
    // manifest-list entry names that spec.
    val physToLogical: Map[String, String] = cmap.map(_.swap)
    val eqEntrySchema =
      if (eqs.isEmpty || partitionBy.isEmpty) entrySchema
      else new Schema.Parser().parse(manifestEntrySchemaJson(schema, Nil))
    val eqSpecId = if (partitionBy.isEmpty) 0 else 1
    val eqDeletes: Seq[(String, Long, Long, List[Int], Long)] =
      eqs.zipWithIndex.flatMap { case ((gen, p), i) =>
        val ids = p.cols.map { phys =>
          val logical = physToLogical.getOrElse(phys, phys)
          topIds.getOrElse(logical, throw new IllegalStateException(
            s"equality-delete column '$phys' (logical '$logical') is not " +
              "a top-level schema field"))
        }.toList
        val dir = new Path(rootStr, s"${IncrementalTable.EqDelDir}/$gen")
        tableFs.listStatus(dir).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          .map { part =>
            val (nRows, bytes) = footerMeta(part, conf)
            (tableFs.makeQualified(part).toString, nRows, bytes, ids, i + 2L)
          }
      }
    val eqDeleteManifests: Seq[(String, Long, Int, Long, Long)] =
      if (eqDeletes.isEmpty) Nil
      else {
        val emptyPart = new GenericData.Record(
          eqEntrySchema.getField("data_file").schema()
            .getField("partition").schema())
        val eqDataFileSchema = eqEntrySchema.getField("data_file").schema()
        val entries = eqDeletes.iterator.map { case (uri, rows, bytes, ids, sq) =>
          val df = new GenericData.Record(eqDataFileSchema)
          df.put("content", 2) // EQUALITY_DELETES
          df.put("file_path", uri)
          df.put("file_format", "PARQUET")
          df.put("partition", emptyPart)
          df.put("record_count", rows)
          df.put("file_size_in_bytes", bytes)
          df.put("equality_ids",
            java.util.Arrays.asList(ids.map(Int.box): _*))
          val e = new GenericData.Record(eqEntrySchema)
          e.put("status", 1)
          e.put("snapshot_id", snapshotId)
          e.put("sequence_number", sq)
          e.put("file_sequence_number", sq)
          e.put("data_file", df)
          e
        }
        val (name, len) = writeManifest(s"del-eq-$snapshotId.avro",
          eqEntrySchema, eqSpecId, "deletes", entries)
        Seq((name, len, eqDeletes.size, eqDeletes.iterator.map(_._2).sum,
          eqDeletes.iterator.map(_._5).max))
      }

    // ---- manifest list (Avro) -----------------------------------------
    val listName = s"snap-$snapshotId-manifest-list.avro"
    val listSchema = new Schema.Parser().parse(ManifestListSchemaJson)
    locally {
      val out = fs.create(new Path(metaDir, listName), true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](listSchema))
      w.setMeta("format-version", "2")
      w.create(listSchema, out)
      try {
      reused.foreach { pm =>
        val r = new GenericData.Record(listSchema)
        r.put("manifest_path", pm.path)
        r.put("manifest_length",
          fs.getFileStatus(new Path(pm.path)).getLen)
        r.put("partition_spec_id", 0)
        r.put("content", 0)
        r.put("sequence_number", 1L)
        r.put("min_sequence_number", 1L)
        // fidelity: the files were ADDED by the snapshot that first
        // exported them — a reused manifest keeps that id (and the
        // carried `snapshots` history below keeps the id resolvable)
        r.put("added_snapshot_id", pm.addedSnapshotId)
        r.put("added_files_count", pm.entries.size)
        r.put("existing_files_count", 0)
        r.put("deleted_files_count", 0)
        r.put("added_rows_count", pm.entries.iterator.map(_._2).sum)
        r.put("existing_rows_count", 0L)
        r.put("deleted_rows_count", 0L)
        w.append(r)
      }
      def listEntry(name: String, len: Long, nFiles: Int, nRows: Long,
          sq: Long, content: Int, specId: Int,
          minSq: Option[Long] = None): Unit = {
        val r = new GenericData.Record(listSchema)
        r.put("manifest_path",
          fs.makeQualified(new Path(metaDir, name)).toString)
        r.put("manifest_length", len)
        r.put("partition_spec_id", specId)
        r.put("content", content)
        r.put("sequence_number", sq)
        r.put("min_sequence_number", minSq.getOrElse(sq))
        r.put("added_snapshot_id", snapshotId)
        r.put("added_files_count", nFiles)
        r.put("existing_files_count", 0)
        r.put("deleted_files_count", 0)
        r.put("added_rows_count", nRows)
        r.put("existing_rows_count", 0L)
        r.put("deleted_rows_count", 0L)
        w.append(r)
      }
      manifests.foreach { case (name, len, nFiles, nRows, sq) =>
        listEntry(name, len, nFiles, nRows, sq, content = 0, specId = 0)
      }
      posDeleteManifests.foreach { case (name, len, nFiles, nRows, sq) =>
        listEntry(name, len, nFiles, nRows, sq, content = 1, specId = 0)
      }
      eqDeleteManifests.foreach { case (name, len, nFiles, nRows, sq) =>
        // the eq manifest holds entries at seqs 2..n+1: sq is the max,
        // min_sequence_number the conservative lower bound readers prune by
        listEntry(name, len, nFiles, nRows, sq, content = 1,
          specId = eqSpecId,
          minSq = Some(eqDeletes.iterator.map(_._5).min))
      } } finally w.close()
    }

    // ---- vN.metadata.json + version-hint.text -------------------------
    // Next version = max(existing vN) + 1, created NO-overwrite: a gap
    // in the sequence (a manually deleted version) must never make a
    // new export silently clobber a surviving one (ADVICE r13 low).
    val VersionName = """v(\d+)\.metadata\.json""".r
    val version = 1 + fs.listStatus(metaDir)
      .iterator.map(_.getPath.getName)
      .collect { case VersionName(n) => n.toInt }
      .foldLeft(0)(math.max)
    val snapshot: JObject =
      ("snapshot-id" -> snapshotId) ~ ("sequence-number" -> lastSeq) ~
        ("timestamp-ms" -> ts) ~ ("schema-id" -> 0) ~
        ("manifest-list" ->
          fs.makeQualified(new Path(metaDir, listName)).toString) ~
        ("summary" -> (("operation" -> "append") ~
          ("added-data-files" -> rels.size.toString) ~
          ("added-records" -> totalRows.toString) ~
          ("total-data-files" -> rels.size.toString) ~
          ("total-records" -> totalRows.toString) ~
          ("total-delete-files" ->
            (posDeletes.size + eqDeletes.size).toString)))
    // Same-shape history carries forward so reused manifests'
    // added_snapshot_ids resolve; a re-export of the SAME snapshot id
    // replaces its prior entry instead of duplicating it.
    val priorSnapshots = prev.map(_.snapshots.filter(sn =>
      snapshotIdOf(sn) != snapshotId)).getOrElse(Nil)
    val priorLog = prev.map(_.snapshotLog.filter(e =>
      snapshotIdOf(e) != snapshotId)).getOrElse(Nil)
    val priorMetaLog = prev.map(p => p.metadataLog :+
      ((("timestamp-ms" -> p.lastUpdatedMs) ~
        ("metadata-file" -> p.metadataPath)): JValue)).getOrElse(Nil)
    val metadata: JObject =
      ("format-version" -> 2) ~
        ("table-uuid" -> java.util.UUID.nameUUIDFromBytes(
          s"graft-iceberg-export:${t.root}".getBytes(UTF_8)).toString) ~
        ("location" -> dest) ~
        ("last-sequence-number" -> lastSeq) ~
        ("last-updated-ms" -> ts) ~
        ("last-column-id" -> lastId) ~
        ("current-schema-id" -> 0) ~
        ("schemas" -> List(schemaJson)) ~
        ("default-spec-id" -> 0) ~
        // the extra UNPARTITIONED spec (id 1) scopes global equality
        // deletes on a partitioned table
        ("partition-specs" ->
          (List(specJson: JValue) ++
            (if (eqDeleteManifests.nonEmpty && partitionBy.nonEmpty)
               List((("spec-id" -> 1) ~ ("fields" -> JArray(Nil))): JValue)
             else Nil))) ~
        ("last-partition-id" -> (999 + partitionBy.size)) ~
        ("default-sort-order-id" -> 0) ~
        ("sort-orders" -> List(
          (("order-id" -> 0) ~ ("fields" -> JArray(Nil))): JValue)) ~
        ("properties" -> ("schema.name-mapping.default" -> nameMapping)) ~
        ("current-snapshot-id" -> snapshotId) ~
        ("snapshots" -> (priorSnapshots :+ (snapshot: JValue))) ~
        ("snapshot-log" -> (priorLog :+
          ((("timestamp-ms" -> ts) ~ ("snapshot-id" -> snapshotId)): JValue))) ~
        ("metadata-log" -> priorMetaLog)
    val metaName = s"v$version.metadata.json"
    writeText(fs, new Path(metaDir, metaName),
      JsonMethods.pretty(JsonMethods.render(metadata)), overwrite = false)
    writeText(fs, new Path(metaDir, "version-hint.text"), version.toString)
    IcebergExportResult(snapshotId, s"metadata/$metaName",
      reused.size + manifests.size + posDeleteManifests.size +
        eqDeleteManifests.size,
      rels.size, totalRows,
      manifestsReused = reused.size, footersRead = needFooter.size,
      posDeleteFiles = posDeletes.size, eqDeleteFiles = eqDeletes.size)
  }

  private def snapshotIdOf(sn: JValue): Long = {
    implicit val fmts: Formats = DefaultFormats
    (sn \ "snapshot-id").extract[Long]
  }

  /** One previous-export manifest: its path, the snapshot that first
    * added its files, and (file URI, rows, bytes) per entry. */
  private final case class PrevManifest(path: String, addedSnapshotId: Long,
      entries: Seq[(String, Long, Long)])

  /** Previous same-shape export state: manifests for incremental reuse,
    * plus the snapshot history to carry forward. */
  private final case class PrevState(manifests: Seq[PrevManifest],
      snapshots: List[JValue], snapshotLog: List[JValue],
      metadataLog: List[JValue], metadataPath: String, lastUpdatedMs: Long)

  /** Previous export state for incremental reuse: each manifest of the
    * last metadata version (same schema + spec ONLY — an evolved export
    * starts fresh). Metadata-plane reads only; O(previous files) Avro
    * decode, zero data access. */
  private def readPrevious(fs: org.apache.hadoop.fs.FileSystem,
      metaDir: Path, schemaJsonStr: String,
      specJsonStr: String): Option[PrevState] = {
    import org.apache.avro.file.DataFileStream
    import org.apache.avro.generic.GenericDatumReader
    implicit val fmts: Formats = DefaultFormats
    val hint = new Path(metaDir, "version-hint.text")
    if (!fs.exists(hint)) return None
    val v = readToString(fs, hint).trim.toInt
    val mdPath = new Path(metaDir, s"v$v.metadata.json")
    if (!fs.exists(mdPath)) return None
    val md = JsonMethods.parse(readToString(fs, mdPath))
    val sameShape =
      JsonMethods.compact(JsonMethods.render((md \ "schemas")(0))) == schemaJsonStr &&
        JsonMethods.compact(JsonMethods.render(
          ((md \ "partition-specs")(0)) \ "fields")) == specJsonStr
    if (!sameShape) return None
    val snapId = (md \ "current-snapshot-id").extract[Long]
    val snap = (md \ "snapshots").children
      .find(sn => (sn \ "snapshot-id").extract[Long] == snapId)
      .getOrElse(return None)
    def avroRecords(p: Path): Seq[GenericRecord] = {
      val in = fs.open(p)
      val rdr = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try {
        val b = Seq.newBuilder[GenericRecord]
        while (rdr.hasNext) b += rdr.next()
        b.result()
      } finally rdr.close()
    }
    // Hadoop Path strings are not URI-encoded — parse with Path itself
    val listPath = new Path((snap \ "manifest-list").extract[String])
    // delete manifests (content=1) never reuse — they are rewritten
    // from the CURRENT standing-delete state every export, and their
    // entries are not data files for the stats carry
    val manifests = avroRecords(listPath).filter(m =>
      Option(m.get("content")).fold(0)(_.asInstanceOf[Int]) == 0).map { m =>
      val mpath = m.get("manifest_path").toString
      val entries = avroRecords(new Path(mpath)).map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        (df.get("file_path").toString,
          df.get("record_count").asInstanceOf[Long],
          df.get("file_size_in_bytes").asInstanceOf[Long])
      }
      PrevManifest(mpath,
        m.get("added_snapshot_id").asInstanceOf[Long], entries)
    }
    Some(PrevState(manifests,
      (md \ "snapshots").children,
      (md \ "snapshot-log").children,
      (md \ "metadata-log").children,
      fs.makeQualified(mdPath).toString,
      (md \ "last-updated-ms").extract[Long]))
  }

  private def readToString(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): String = {
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val b = new Array[Byte](len)
      in.readFully(b)
      new String(b, UTF_8)
    } finally in.close()
  }

  /** Footer row count + file length — the per-file body both harvest
    * shapes share (the stagedFooterStats pattern). */
  private def footerMeta(p: Path, conf: Configuration): (Long, Long) = {
    val len = p.getFileSystem(conf).getFileStatus(p).getLen
    val rd = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try (rd.getRecordCount, len) finally rd.close()
  }

  private def writeText(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      s: String, overwrite: Boolean = true): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(s.getBytes(UTF_8)) finally out.close()
  }

  private def requireNoVariant(name: String, dt: DataType): Unit = dt match {
    case _: VariantType => throw new IllegalArgumentException(
      s"column '$name' is VARIANT — an Iceberg v3 type; v2 export has " +
        "no mapping (shred the needed fields into generated columns)")
    case s: StructType => s.foreach(f => requireNoVariant(s"$name.${f.name}", f.dataType))
    case a: ArrayType => requireNoVariant(s"$name.element", a.elementType)
    case m: MapType =>
      requireNoVariant(s"$name.key", m.keyType)
      requireNoVariant(s"$name.value", m.valueType)
    case _ => ()
  }

  /** The `names` list for a name-mapping entry: the logical name, plus
    * the immutable PHYSICAL name when a rename made them diverge —
    * parquet bytes live under the physical name, so an Iceberg reader
    * needs it to resolve the column at all (ADVICE r13 high). `lpath`
    * is the logical dot-path (the columnMapping key). */
  private def names(lpath: String, fname: String,
      cmap: Map[String, String]): List[String] =
    cmap.get(lpath).filter(_ != fname).fold(List(fname))(p => List(fname, p))

  private def mappingEntry(id: Int, ns: List[String],
      childFields: Option[JArray]): JValue = {
    val base = ("field-id" -> id) ~ ("names" -> ns)
    childFields.fold(base: JValue)(cf => base ~ ("fields" -> cf))
  }

  /** Spark type → (Iceberg v2 schema-JSON type, name-mapping `fields`
    * for its children). Nested ids mint from the shared counter; the
    * mapping walk shares the SAME traversal so ids and entries can
    * never drift. */
  private def typeAndMapping(dt: DataType, lpath: String,
      cmap: Map[String, String],
      nextId: () => Int): (JValue, Option[JArray]) = dt match {
    case BooleanType => (JString("boolean"), None)
    case ByteType | ShortType | IntegerType => (JString("int"), None)
    case LongType => (JString("long"), None)
    case FloatType => (JString("float"), None)
    case DoubleType => (JString("double"), None)
    case StringType => (JString("string"), None)
    case BinaryType => (JString("binary"), None)
    case DateType => (JString("date"), None)
    case TimestampType => (JString("timestamptz"), None)
    case TimestampNTZType => (JString("timestamp"), None)
    case d: DecimalType => (JString(s"decimal(${d.precision}, ${d.scale})"), None)
    case s: StructType =>
      val (fs, ms) = s.fields.map { f =>
        val id = nextId()
        val (tJson, childMap) =
          typeAndMapping(f.dataType, s"$lpath.${f.name}", cmap, nextId)
        val sf: JValue = ("id" -> id) ~ ("name" -> f.name) ~
          ("required" -> !f.nullable) ~ ("type" -> tJson)
        (sf, mappingEntry(id, names(s"$lpath.${f.name}", f.name, cmap), childMap))
      }.toList.unzip
      ((("type" -> "struct") ~ ("fields" -> fs)): JValue, Some(JArray(ms)))
    case a: ArrayType =>
      val eid = nextId()
      val (et, em) = typeAndMapping(a.elementType, s"$lpath.element", cmap, nextId)
      ((("type" -> "list") ~ ("element-id" -> eid) ~
        ("element" -> et) ~ ("element-required" -> !a.containsNull)): JValue,
        Some(JArray(List(mappingEntry(eid, List("element"), em)))))
    case m: MapType =>
      val kid = nextId()
      val (kt, km) = typeAndMapping(m.keyType, s"$lpath.key", cmap, nextId)
      val vid = nextId()
      val (vt, vm) = typeAndMapping(m.valueType, s"$lpath.value", cmap, nextId)
      ((("type" -> "map") ~ ("key-id" -> kid) ~ ("key" -> kt) ~
        ("value-id" -> vid) ~ ("value" -> vt) ~
        ("value-required" -> !m.valueContainsNull)): JValue,
        Some(JArray(List(
          mappingEntry(kid, List("key"), km),
          mappingEntry(vid, List("value"), vm)))))
    case other => throw new IllegalArgumentException(
      s"no Iceberg v2 mapping for Spark type ${other.simpleString}")
  }

  /** Identity partition token (already unescaped, non-null) → the Avro
    * value matching [[partitionAvroType]]. */
  private def partitionValue(dt: DataType, token: String): Any = dt match {
    case LongType => token.toLong
    case ByteType | ShortType | IntegerType => token.toInt
    case _ => token
  }

  private def partitionAvroType(dt: DataType): String = dt match {
    case LongType => "long"
    case ByteType | ShortType | IntegerType => "int"
    case _ => "string" // identity dir tokens are strings already
  }

  /** Iceberg v2 manifest_entry Avro schema with the table's partition
    * struct inlined (spec field-ids 1000+i, data_file ids per spec).
    * Partition fields are nullable: `__HIVE_DEFAULT_PARTITION__`
    * dir tokens export as Avro null. */
  private def manifestEntrySchemaJson(schema: StructType,
      partitionBy: Seq[String]): String = {
    val partFields = partitionBy.zipWithIndex.map { case (c, i) =>
      s"""{"name":"${c}","type":["null","${partitionAvroType(schema(c).dataType)}"],"default":null,"field-id":${1000 + i}}"""
    }.mkString(",")
    s"""{"type":"record","name":"manifest_entry","fields":[
       |{"name":"status","type":"int","field-id":0},
       |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
       |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
       |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
       |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
       |{"name":"content","type":"int","field-id":134},
       |{"name":"file_path","type":"string","field-id":100},
       |{"name":"file_format","type":"string","field-id":101},
       |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$partFields]}},
       |{"name":"record_count","type":"long","field-id":103},
       |{"name":"file_size_in_bytes","type":"long","field-id":104},
       |{"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135}
       |]}}]}""".stripMargin
  }

  /** Iceberg v2 manifest_file (manifest list entry) Avro schema. */
  private[table] val ManifestListSchemaJson: String =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514}
      |]}""".stripMargin
}
