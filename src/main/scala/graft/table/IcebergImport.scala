package graft.table

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** What one [[IcebergImport.importTable]] call adopted. `totalRows` is
  * the GROSS data-file row count (before standing deletes apply);
  * `commits` counts the replayed graft commits (1 for a pure data
  * snapshot; data-seq groups + equality deletes + one DV generation
  * for a merge-on-read snapshot). */
final case class IcebergImportResult(snapshotId: Long, metadataFile: String,
    dataFiles: Int, totalRows: Long, renamedColumns: Int,
    posDeleteFiles: Int = 0, eqDeleteFiles: Int = 0, commits: Int = 1)

/** Iceberg v2 snapshot IMPORT (VERDICT r13 missing #1 — the reverse of
  * [[IcebergExport]], completing X116 into two-way interop):
  * `CALL graft.system.import_iceberg('ns.dest', src)` reads an Iceberg
  * v2 table's CURRENT snapshot — `metadata/vN.metadata.json` (resolved
  * via `version-hint.text`, the HadoopTables convention, or an explicit
  * `…/vN.metadata.json` argument) → Avro manifest list → Avro manifests
  * — and creates `dest` as a graft table whose first commit REFERENCES
  * the live data files in place by absolute path (the X78 shallow-clone
  * shape: zero data copied, O(metadata) cost at any size). A migration
  * user points graft at an existing lakehouse table and queries it
  * immediately; subsequent graft writes land under dest's own root and
  * DML/compaction un-share the referenced files exactly like a clone.
  *
  * MERGE-ON-READ snapshots import natively (completing the two-way MOR
  * interop with [[IcebergExport]]): position delete files replay into
  * ONE graft DV generation (the (file_path,pos) rows rewritten to the
  * scan's own `_metadata.file_path` rendering — read back from a
  * column-pruned metadata scan, rendering-proof), and equality delete
  * files replay through [[IncrementalTable.deleteByKey]] with the data
  * groups committed in Iceberg SEQUENCE-NUMBER order: an equality
  * delete at seq s commits after the data groups it covers (data_seq
  * < s) and before the groups that escape it, so graft's own
  * "added at or before baseVersion" rule reproduces the Iceberg read
  * exactly — an upsert's new rows survive the import like they survive
  * an Iceberg reader. A pure data snapshot stays ONE commit; a MOR
  * snapshot is a short deterministic commit replay (groups + deletes),
  * documented non-atomic: a crash mid-import leaves a partial dest to
  * drop and re-run.
  *
  * Scope and refusals (each loud, naming the remedy):
  *  - format-version 1 and 3 refuse (v1: rewrite with a v2 writer;
  *    v3: downgrade or export a v2 snapshot);
  *  - a delete manifest whose entries are data files (or vice versa)
  *    refuses as malformed;
  *  - non-identity partition transforms refuse (graft's import binds
  *    partition values from hive `k=v` dir tokens; a bucket/days
  *    transform value is not recoverable from the token);
  *  - a PARTITIONED table whose data files do not sit under hive
  *    `k=v` dirs matching the manifest partition tuple refuses (e.g.
  *    the object-storage layout) — graft's scan derives partition
  *    values from the trailing dir tokens, so a mismatch would read
  *    wrong partition values silently; the check is per file against
  *    the manifest tuple, so nothing silent gets through;
  *  - non-PARQUET data files (ORC/Avro file_format) refuse;
  *  - types graft cannot map (uuid, fixed, time) refuse.
  *
  * Fidelity notes:
  *  - Name mapping round-trips column RENAMES: an entry listing
  *    `names: [logical, physical]` (what [[IcebergExport]] writes for a
  *    renamed column, and what Iceberg itself uses to adopt files whose
  *    parquet names differ from the schema) becomes a graft column-
  *    mapping channel (`colmap/logical -> physical`) in the import
  *    commit, so the scan reads the physical parquet bytes under the
  *    logical name — export → import round-trips bit-identically
  *    including renames, and a foreign table adopted via name mapping
  *    imports correctly instead of reading NULLs.
  *  - `required` fields import as non-nullable schema columns;
  *    partition-tuple values are cross-checked (unescaped) against the
  *    dir tokens, with Avro null ↔ `__HIVE_DEFAULT_PARTITION__`.
  *  - Manifest `record_count`s are trusted for the result summary (the
  *    same numbers an Iceberg reader plans with); graft's own stats
  *    index starts empty and ANALYZE/compaction backfills it.
  *
  * Scale: metadata-plane only — one JSON read, one manifest-list Avro
  * read, O(manifests) manifest Avro reads (each bounded by the writer's
  * chunk size), zero data-file access. The commit is the same bulk-add
  * shape as [[IncrementalTable.cloneTo]], so a million-file import
  * costs one log write. */
object IcebergImport {

  private val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  def importTable(spark: SparkSession, dest: IncrementalTable,
      src: String): IcebergImportResult = {
    implicit val fmts: Formats = DefaultFormats
    require(!dest.exists, s"import_iceberg destination ${dest.root} " +
      "already exists — import creates a NEW table")
    val conf = IncrementalTable.hadoopConf(spark)

    // ---- resolve + parse vN.metadata.json ------------------------------
    val srcPath = new Path(src)
    val fs = srcPath.getFileSystem(conf)
    val mdPath =
      if (src.endsWith(".metadata.json")) srcPath
      else {
        val metaDir = new Path(srcPath, "metadata")
        val hint = new Path(metaDir, "version-hint.text")
        val VersionName = """v(\d+)\.metadata\.json""".r
        val v =
          if (fs.exists(hint)) readToString(fs, hint).trim.toInt
          else {
            require(fs.exists(metaDir), s"'$src' has no metadata/ dir and " +
              "is not a vN.metadata.json path — not an Iceberg table root")
            fs.listStatus(metaDir).iterator.map(_.getPath.getName)
              .collect { case VersionName(n) => n.toInt }
              .foldLeft(0)(math.max)
          }
        require(v > 0, s"'$src' has no vN.metadata.json under metadata/")
        new Path(metaDir, s"v$v.metadata.json")
      }
    require(fs.exists(mdPath), s"metadata file $mdPath does not exist")
    val md = JsonMethods.parse(readToString(fs, mdPath))
    val fv = (md \ "format-version").extract[Int]
    require(fv == 2, s"format-version $fv: graft imports Iceberg v2 only " +
      (if (fv < 2) "— rewrite the table with a v2 writer first"
       else "— export a v2-compatible snapshot first"))
    val snapshotId = (md \ "current-snapshot-id") match {
      case JInt(v) if v >= 0 => v.toLong
      case JLong(v) if v >= 0 => v
      case _ => throw new IllegalArgumentException(
        s"$mdPath has no current snapshot — nothing to import")
    }
    val snap = (md \ "snapshots").children
      .find(sn => (sn \ "snapshot-id").extract[Long] == snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"current-snapshot-id $snapshotId is not in $mdPath's snapshots"))

    // ---- schema (current-schema-id) ------------------------------------
    val schemaId = (md \ "current-schema-id").extract[Int]
    val schemaJson = (md \ "schemas").children
      .find(s => (s \ "schema-id").extract[Int] == schemaId)
      .getOrElse(throw new IllegalArgumentException(
        s"current-schema-id $schemaId is not in $mdPath's schemas"))
    val fields = (schemaJson \ "fields").children
    val struct = StructType(fields.map { f =>
      StructField((f \ "name").extract[String],
        sparkType((f \ "type"), (f \ "name").extract[String]),
        nullable = !(f \ "required").extract[Boolean])
    })
    val idToName = fields.map(f =>
      (f \ "id").extract[Int] -> (f \ "name").extract[String]).toMap

    // ---- partition spec (default-spec-id, identity only) ---------------
    val specId = (md \ "default-spec-id").extract[Int]
    val spec = (md \ "partition-specs").children
      .find(s => (s \ "spec-id").extract[Int] == specId)
      .getOrElse(throw new IllegalArgumentException(
        s"default-spec-id $specId is not in $mdPath's partition-specs"))
    val partitionBy = (spec \ "fields").children.map { pf =>
      val transform = (pf \ "transform").extract[String]
      require(transform == "identity",
        s"partition transform '$transform' — graft import maps identity " +
          "partitions only (dir tokens cannot recover transformed values)")
      val srcId = (pf \ "source-id").extract[Int]
      idToName.getOrElse(srcId, throw new IllegalArgumentException(
        s"partition source-id $srcId is not a top-level schema field"))
    }

    // ---- name mapping → graft column-mapping channels -------------------
    // An entry whose `names` list carries an alias binds the LOGICAL
    // schema name (the one matching a schema field) to the PHYSICAL
    // parquet name — exactly graft's colmap contract. Resolved
    // recursively over struct members (dot-path keys, the X86 shape);
    // list/map element/key/value entries have fixed names and never
    // carry renames.
    val cmap: Map[String, String] =
      (md \ "properties" \ "schema.name-mapping.default") match {
        case JString(s) => colmapOf(JsonMethods.parse(s).children, struct)
        case _ => Map.empty
      }

    // ---- manifest list → manifests → live data files --------------------
    def avroRecords(p: Path): Seq[GenericRecord] = {
      val in = p.getFileSystem(conf).open(p)
      val rdr = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try {
        val b = Seq.newBuilder[GenericRecord]
        while (rdr.hasNext) b += rdr.next()
        b.result()
      } finally rdr.close()
    }
    // Hadoop Path strings are NOT URI-encoded (a hive token like
    // 'tag=a%3Ab c' carries a literal '%' and space) — parse with
    // Hadoop's own Path, never java.net.URI
    def pathOf(uri: String): Path = new Path(uri)
    val listPath = pathOf((snap \ "manifest-list").extract[String])
    // (uri, rows, partition, sequence number); delete files collect
    // separately — MERGE-ON-READ snapshots import natively (the
    // delete files replay into graft DVs / equality deletes below)
    val dataBuf = Seq.newBuilder[(String, Long, Option[GenericRecord], Long)]
    val posBuf = Seq.newBuilder[String]
    val eqBuf = Seq.newBuilder[(String, Seq[Int], Long)]
    // writers vary: a field can be ABSENT from the writer schema (a
    // minimal hand-built manifest) as well as null — treat both as
    // default
    def fieldOpt(r: GenericRecord, name: String): Option[Any] =
      Option(r.getSchema.getField(name)).flatMap(_ => Option(r.get(name)))
    avroRecords(listPath).foreach { m =>
      val mContent = fieldOpt(m, "content").fold(0)(_.asInstanceOf[Int])
      val mSeq = fieldOpt(m, "sequence_number").fold(1L)(_.asInstanceOf[Long])
      avroRecords(pathOf(m.get("manifest_path").toString)).foreach { e =>
        val status = e.get("status").asInstanceOf[Int]
        if (status != 2) { // 2 = DELETED entry — not part of the snapshot
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val dfContent =
            fieldOpt(df, "content").fold(0)(_.asInstanceOf[Int])
          // Iceberg invariant: data manifests hold ONLY data files,
          // delete manifests ONLY delete files
          require(if (mContent == 0) dfContent == 0 else dfContent != 0,
            s"malformed manifest ${m.get("manifest_path")}: list content " +
              s"$mContent vs data_file content $dfContent")
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("PARQUET"),
            s"file ${df.get("file_path")} is $fmt — graft adopts " +
              "PARQUET files only")
          val uri = df.get("file_path").toString
          // null entry seq inherits the manifest-list entry's (the
          // Iceberg sequence-number-inheritance rule)
          val seq = fieldOpt(e, "sequence_number")
            .fold(mSeq)(_.asInstanceOf[Long])
          dfContent match {
            case 0 => dataBuf += ((uri,
              df.get("record_count").asInstanceOf[Long],
              Option(df.get("partition")).map(_.asInstanceOf[GenericRecord]),
              seq))
            case 1 => posBuf += uri
            case 2 =>
              val ids = fieldOpt(df, "equality_ids").map {
                case l: java.util.List[_] =>
                  l.asInstanceOf[java.util.List[Any]].toArray.toSeq
                    .map(_.asInstanceOf[Int])
                case o => throw new IllegalArgumentException(
                  s"equality delete ${uri}: unreadable equality_ids $o")
              }.getOrElse(throw new IllegalArgumentException(
                s"equality delete $uri carries no equality_ids"))
              eqBuf += ((uri, ids, seq))
            case other => throw new IllegalArgumentException(
              s"file $uri has unknown content=$other")
          }
        }
      }
    }
    val dataEntries = dataBuf.result()
    val posDeleteUris = posBuf.result()
    val eqDeleteEntries = eqBuf.result()
    val files = dataEntries.map(d => (d._1, d._2, d._3))
    require(files.nonEmpty,
      s"snapshot $snapshotId of $mdPath lists no live data files")

    // ---- per-file partition-token cross-check ---------------------------
    // graft's scan binds partition values from the trailing hive dir
    // tokens (foreignBase), so the tokens MUST carry exactly the
    // manifest tuple — checked per file, nothing silent gets through.
    val absFiles = files.map { case (uri, _, partRec) =>
      val u = new Path(uri).toUri
      val abs = if (u.getScheme == null || u.getScheme == "file") u.getPath
                else uri
      if (partitionBy.nonEmpty) {
        val tokens = abs.split("/").dropRight(1).iterator.map { seg =>
          val i = seg.indexOf('=')
          if (i <= 0) "" -> "" else seg.take(i) -> seg.drop(i + 1)
        }.toMap
        partitionBy.foreach { c =>
          val phys = cmap.getOrElse(c, c)
          val raw = tokens.get(phys).orElse(tokens.get(c)).getOrElse(
            throw new IllegalArgumentException(
              s"data file '$uri' carries no '$c=' dir token — graft binds " +
                "partition values from hive-layout paths (the object-" +
                "storage layout cannot import; rewrite into a hive layout)"))
          val fromDir =
            if (raw == HiveDefaultPartition) null
            else graft.parquet.RowParquet.unescapePathName(raw)
          val fromManifest = partRec.flatMap(r => Option(r.get(c)))
            .map(_.toString).orNull
          require(fromDir == fromManifest,
            s"data file '$uri': dir token '$c=$raw' (= $fromDir) does not " +
              s"match the manifest partition value '$fromManifest' — the " +
              "layout is not hive-consistent; refuse rather than read " +
              "wrong partition values")
        }
      }
      abs
    }
    val totalRows = files.iterator.map(_._2).sum

    // ---- the adopting commits (the cloneTo shape, replayed in Iceberg
    // SEQUENCE-NUMBER order so MOR semantics survive) ---------------------
    // An equality delete at seq s covers data with data_seq < s — so
    // data groups commit ascending by seq, with each equality delete
    // committed AFTER the groups it covers and BEFORE the groups that
    // escape it (graft's own "added at or before baseVersion" rule then
    // reproduces the Iceberg read exactly). Position deletes name
    // explicit files and land last as one DV generation. A pure data
    // snapshot stays the single-commit fast path of previous rounds.
    val meta = Map(
      "importedFrom" -> fs.makeQualified(mdPath).toString,
      "importedSnapshot" -> snapshotId.toString) ++
      cmap.map { case (l, p) => s"colmap/$l" -> p }
    val liveNameOf: Map[String, String] = // manifest uri -> live-set name
      dataEntries.map(_._1).zip(absFiles).toMap
    val dataBySeq: Seq[(Long, Seq[String])] = dataEntries.zip(absFiles)
      .groupBy(_._1._4).view.mapValues(_.map(_._2)).toSeq.sortBy(_._1)
    val minDataSeq = dataBySeq.head._1
    // an equality delete covering NO data group is a no-op (everything
    // escapes) — dropped, which also keeps the first commit a data one
    val eqApplicable = eqDeleteEntries.filter(_._3 > minDataSeq)
      .sortBy(e => (e._3, e._1))
    var commits = 0
    var first = true
    def commitData(fs0: Seq[String]): Unit = {
      dest.commit(Commit(0, "append", fs0, Nil, Map.empty, partitionBy,
        struct.toDDL, if (first) meta else Map.empty, None,
        System.currentTimeMillis()))
      first = false
      commits += 1
    }
    var eqIdx = 0
    dataBySeq.foreach { case (sq, fs0) =>
      // deletes with delete_seq <= this group's seq precede it (they
      // cover strictly-earlier groups only; this group escapes them)
      while (eqIdx < eqApplicable.length && eqApplicable(eqIdx)._3 <= sq) {
        commitEqDelete(spark, dest, eqApplicable(eqIdx), idToName, cmap)
        commits += 1
        eqIdx += 1
      }
      commitData(fs0)
    }
    while (eqIdx < eqApplicable.length) {
      commitEqDelete(spark, dest, eqApplicable(eqIdx), idToName, cmap)
      commits += 1
      eqIdx += 1
    }
    if (posDeleteUris.nonEmpty) {
      commits += commitPositionDeletes(spark, dest, posDeleteUris,
        liveNameOf, partitionBy, struct.toDDL)
    }
    IcebergImportResult(snapshotId, fs.makeQualified(mdPath).toString,
      files.size, totalRows, cmap.size,
      posDeleteFiles = posDeleteUris.size,
      eqDeleteFiles = eqDeleteEntries.size, commits = commits)
  }

  /** Replay one Iceberg equality delete file into a graft equality
    * delete: the key tuples read from the delete parquet (PHYSICAL
    * column names), relabelled to the logical names `equality_ids`
    * resolve to, through the public [[IncrementalTable.deleteByKey]]
    * door — baseVersion lands on the just-committed covered groups. */
  private def commitEqDelete(spark: SparkSession, dest: IncrementalTable,
      e: (String, Seq[Int], Long), idToName: Map[Int, String],
      cmap: Map[String, String]): Unit = {
    val (uri, ids, _) = e
    val logical = ids.map(id => idToName.getOrElse(id,
      throw new IllegalArgumentException(
        s"equality delete $uri: equality_id $id is not a top-level " +
          "schema field")))
    val physical = logical.map(l => cmap.getOrElse(l, l))
    val keys = spark.read.parquet(new Path(uri).toString)
    physical.foreach(p => require(keys.columns.contains(p),
      s"equality delete $uri carries no column '$p' " +
        s"(${keys.columns.mkString(", ")})"))
    val relabelled = keys.select(physical.map(
      org.apache.spark.sql.functions.col): _*).toDF(logical: _*)
    dest.deleteByKey(relabelled, logical)
    ()
  }

  /** Replay the snapshot's position delete files into ONE graft DV
    * generation. The sidecar rows must carry the SCAN's own encoded
    * path rendering (`_metadata.file_path`), so the touched files'
    * rendering is read back from one column-pruned metadata scan —
    * O(standing delete volume), no data columns read. */
  private def commitPositionDeletes(spark: SparkSession,
      dest: IncrementalTable, posUris: Seq[String],
      liveNameOf: Map[String, String], partitionBy: Seq[String],
      schemaDdl: String): Int = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val posDf = spark.read
      .schema(new org.apache.spark.sql.types.StructType()
        .add("file_path", org.apache.spark.sql.types.StringType)
        .add("pos", org.apache.spark.sql.types.LongType))
      .parquet(posUris.map(new Path(_).toString): _*)
    val touchedUris = posDf.select("file_path").distinct()
      .as[String].collect().toSeq
      // a delete row naming a file outside this snapshot is inert
      .filter(liveNameOf.contains)
    if (touchedUris.isEmpty) return 0
    val touchedLive = touchedUris.map(liveNameOf)
    // the scan's encoded rendering of each touched file, from the
    // file's own metadata column (rendering-proof: whatever
    // _metadata.file_path says IS what the DV anti-join matches)
    val encPairs = spark.read.parquet(touchedLive: _*)
      .select(col("_metadata.file_path")).distinct()
      .as[String].collect()
    val encOf: Map[String, String] = encPairs.map { enc =>
      new java.net.URI(enc).getPath -> enc
    }.toMap
    val mapRows = touchedUris.map { u =>
      val live = liveNameOf(u)
      u -> encOf.getOrElse(live, throw new IllegalStateException(
        s"position delete target $live has no metadata rendering"))
    }
    val mapDf = mapRows.toDF("_ice_fp", "file")
    val gen = java.util.UUID.randomUUID().toString
    val genDir = new Path(dest.root, s"${dest.dvPrefix}/$gen")
    posDf.join(mapDf, posDf("file_path") === mapDf("_ice_fp"))
      .select(col("file"), col("pos")).distinct()
      .write.parquet(genDir.toString)
    dest.commit(Commit(0, "dv", Nil, Nil, Map.empty, partitionBy,
      schemaDdl, Map.empty, None, System.currentTimeMillis(),
      dv = touchedLive.map(_ -> Seq(gen)).toMap))
    1
  }

  /** Recursive name-mapping walk: entries whose `names` list has >1
    * name yield `logical-dot-path -> physical`; `logical` is the name
    * that matches the schema field at this level, `physical` the first
    * alias. Entries under list/map (fixed names) never rename. */
  private def colmapOf(entries: List[JValue],
      struct: StructType): Map[String, String] = {
    implicit val fmts: Formats = DefaultFormats
    def walk(es: List[JValue], st: StructType,
        prefix: String): Map[String, String] =
      es.flatMap { e =>
        val ns = (e \ "names").children.map(_.extract[String])
        val logical = ns.find(n => st.fieldNames.contains(n))
          .getOrElse(ns.headOption.getOrElse(""))
        if (logical.isEmpty) Map.empty[String, String]
        else {
          val key = s"$prefix$logical"
          val self = ns.find(_ != logical).map(p => key -> p)
          val children = (e \ "fields").children match {
            case Nil => Map.empty[String, String]
            case cs => st(logical).dataType match {
              case s: StructType => walk(cs, s, s"$key.")
              case _ => Map.empty[String, String] // list/map internals
            }
          }
          self.toMap ++ children
        }
      }.toMap
    walk(entries, struct, "")
  }

  /** Iceberg v2 schema-JSON type → Spark type (the inverse of the
    * export's mapping; unsupported v2 types refuse by name). */
  private def sparkType(j: JValue, at: String): DataType = j match {
    case JString("boolean") => BooleanType
    case JString("int") => IntegerType
    case JString("long") => LongType
    case JString("float") => FloatType
    case JString("double") => DoubleType
    case JString("string") => StringType
    case JString("binary") => BinaryType
    case JString("date") => DateType
    case JString("timestamptz") => TimestampType
    case JString("timestamp") => TimestampNTZType
    case JString(s) if s.startsWith("decimal(") =>
      val Dec = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
      s match {
        case Dec(p, sc) => DecimalType(p.toInt, sc.toInt)
        case _ => throw new IllegalArgumentException(
          s"malformed decimal type '$s' at '$at'")
      }
    case JString(other) => throw new IllegalArgumentException(
      s"Iceberg type '$other' at '$at' has no Spark mapping — " +
        "cast it in the source engine before importing")
    case o: JObject =>
      implicit val fmts: Formats = DefaultFormats
      (o \ "type").extract[String] match {
        case "struct" => StructType((o \ "fields").children.map { f =>
          val n = (f \ "name").extract[String]
          StructField(n, sparkType(f \ "type", s"$at.$n"),
            nullable = !(f \ "required").extract[Boolean])
        })
        case "list" => ArrayType(sparkType(o \ "element", s"$at.element"),
          containsNull = !(o \ "element-required").extract[Boolean])
        case "map" => MapType(sparkType(o \ "key", s"$at.key"),
          sparkType(o \ "value", s"$at.value"),
          valueContainsNull = !(o \ "value-required").extract[Boolean])
        case k => throw new IllegalArgumentException(
          s"Iceberg nested type kind '$k' at '$at' has no Spark mapping")
      }
    case other => throw new IllegalArgumentException(
      s"unparseable Iceberg type at '$at': $other")
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
}
