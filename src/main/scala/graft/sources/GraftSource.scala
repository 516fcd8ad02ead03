package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.table.IncrementalTable

/** The Spark front door for [[graft.table.IncrementalTable]]:
  * `spark.read.format("graft").load(path)` and
  * `CREATE TEMPORARY VIEW t USING graft OPTIONS (path '…')` followed by
  * plain `SELECT … FROM t` — the "engine opens the table by name"
  * contract of the reference's IO-manager read path
  * (delta_io.py:118-129), expressed as a Spark V1 relation.
  *
  * Read path: [[GraftRelation]] is a `PrunedFilteredScan`, so Catalyst
  * hands it the pushed predicates and the pruned column set. Pushed
  * filters route into the table's log-level data-skipping index
  * ([[IncrementalTable.liveFilesWhere]]) BEFORE Spark enumerates any
  * file — on a clustered 100 TB table a narrow range predicate opens a
  * handful of files out of millions, and only the survivors' names ever
  * reach the driver (the prune itself runs as a Spark job above the
  * checkpoint threshold). Partition-column equality additionally prunes
  * at directory granularity, and deletion vectors apply inside the scan
  * exactly as [[IncrementalTable.read]] does. Column pruning reaches
  * the parquet scan because the projection is applied to the inner
  * DataFrame plan before it is bridged to the V1 row RDD.
  *
  * Write path: `df.write.format("graft").mode(…).save(path)` maps
  * Append → [[IncrementalTable.append]] and Overwrite →
  * [[IncrementalTable.replaceWhere]] with an empty filter (a full,
  * atomic, OCC-checked overwrite) — so SQL-level `INSERT INTO` /
  * `INSERT OVERWRITE` on a `USING graft` view commit through the same
  * log as the library API, with the same conflict detection.
  *
  * Options: `path` (required), `versionAsOf` (time travel),
  * `partitionBy` (writes: comma-separated; defaults to the table's
  * committed layout).
  */
final class GraftSource extends RelationProvider with SchemaRelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with org.apache.spark.sql.connector.catalog.TableProvider {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft datasource requires a 'path' option (or load(path)/save(path))"))

  private def tableOf(sqlContext: SQLContext,
      parameters: Map[String, String]): IncrementalTable =
    IncrementalTable(sqlContext.sparkSession, pathOf(parameters))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val t = tableOf(sqlContext, parameters)
    val asOf = parameters.get("versionAsOf").map(_.toLong)
    require(t.exists, s"graft table ${t.root} has no commits")
    GraftRelation(sqlContext.sparkSession, t, asOf)
  }

  /** User-supplied schema is accepted only when it matches the committed
    * one — the log is authoritative (a mismatched schema would silently
    * mis-cast partition columns on read). */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String], schema: StructType): BaseRelation = {
    val rel = createRelation(sqlContext, parameters)
    require(rel.schema == schema,
      s"user-specified schema $schema does not match committed table " +
        s"schema ${rel.schema}; omit the schema — the commit log is authoritative")
    rel
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val t = tableOf(sqlContext, parameters)
    val partitionBy = parameters.get("partitionBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(if (t.exists) t.partitionColumns else Seq.empty)
    // same skipping-index contract as catalog writes: the
    // `graft.statsColumns` table property (or an explicit
    // `statsColumns` write option) indexes every written file
    val stats = parameters.get("statsColumns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(GraftCatalog.statsColumnsOf(t))
    // write-audit-publish (X98): the `wapId` write option or the
    // session-wide `spark.graft.wap.id` conf stages instead of
    // committing — path-door parity with the catalog's INSERT staging
    val wap = parameters.get("wapId").orElse(
        sqlContext.sparkSession.conf.getOption("spark.graft.wap.id"))
      .map(_.trim).filter(_.nonEmpty)
    // branch writes (X102): the `branch` write option or the
    // session-wide `spark.graft.branch` conf lands the write on the
    // named branch's chain — path-door parity with the catalog
    val branchTo = parameters.get("branch").orElse(
        sqlContext.sparkSession.conf.getOption("spark.graft.branch"))
      .map(_.trim).filter(_.nonEmpty)
    require(wap.isEmpty || branchTo.isEmpty,
      "a write stages under a WAP id OR a branch, not both")
    (mode, wap) match {
      case (SaveMode.Append, _) if branchTo.isDefined =>
        t.appendBranch(data, branchTo.get, partitionBy, statsColumns = stats)
      case (SaveMode.Overwrite, _) if branchTo.isDefined =>
        t.replaceWhereBranch(data, branchTo.get, partitionBy, Map.empty,
          Map.empty, statsColumns = stats)
      case (SaveMode.Append, Some(id)) =>
        t.stageAppend(data, id, partitionBy, statsColumns = stats)
      case (SaveMode.Overwrite, Some(id)) =>
        t.stageReplaceWhere(data, id, partitionBy, Map.empty, Map.empty,
          statsColumns = stats)
      case (SaveMode.Append, None) =>
        t.append(data, partitionBy, statsColumns = stats)
      case (SaveMode.Overwrite, None) =>
        t.replaceWhere(data, partitionBy, Map.empty, Map.empty,
          statsColumns = stats)
      case (SaveMode.ErrorIfExists, _) =>
        require(!t.exists, s"graft table ${t.root} already exists (mode=ErrorIfExists)")
        require(wap.isEmpty && branchTo.isEmpty,
          "WAP staging / branch writes need an existing table")
        t.append(data, partitionBy, statsColumns = stats)
      case (SaveMode.Ignore, _) =>
        if (!t.exists) {
          require(wap.isEmpty && branchTo.isEmpty,
            "WAP staging / branch writes need an existing table")
          t.append(data, partitionBy, statsColumns = stats)
        }
    }
    GraftRelation(sqlContext.sparkSession, t, None)
  }

  // ---------------------------------------------------- DSv2 (streaming)
  // The TableProvider face serves STREAMING only: the returned table
  // advertises MICRO_BATCH_READ + STREAMING_WRITE and nothing else, so
  // Spark's batch read/write paths fall back to the V1 relations above
  // (probed and spec-pinned: V2FallbackProbeSpec) — `read`/`write`
  // semantics, SaveModes included, are byte-identical to round 7, while
  // `readStream`/`writeStream` ride the public connector interfaces
  // ([[GraftMicroBatchStream]]/[[GraftStreamingWrite]]) instead of the
  // retired `execution.streaming.Source`/`Sink` internals.

  /** The engine hands back whatever this returns when the user omits
    * the schema; a user-specified schema arrives at [[getTable]] and is
    * validated there. A table with no commits yet (a writeStream target
    * about to be created by its first epoch) has no schema to infer. */
  override def inferSchema(options: org.apache.spark.sql.util.CaseInsensitiveStringMap): StructType = {
    val params = GraftSource.paramsOf(options)
    val t = IncrementalTable(SparkSession.active, pathOf(params))
    t.schemaAt() match {
      case Some(committed) =>
        if (GraftSource.cdcMode(params)) GraftSource.cdcSchema(committed)
        else committed
      case None => new StructType()
    }
  }

  /** Accepting external metadata lets `spark.read.format("graft")
    * .schema(…)` keep reaching the V1 SchemaRelationProvider (the
    * engine would otherwise refuse before the V1 fallback could run);
    * the schema itself is still validated against the log. */
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): org.apache.spark.sql.connector.catalog.Table = {
    val params = properties.asScala.toMap
    val spark = SparkSession.active
    val t = GraftSource.tableFromOptions(spark, params)
    t.schemaAt().foreach { committed =>
      val expected =
        if (GraftSource.cdcMode(params)) GraftSource.cdcSchema(committed)
        else committed
      // Common fields must type-match (modulo nullability); extra or
      // missing fields pass. The engine routes BATCH WRITES through here
      // too (before the V1 fallback), handing the incoming frame's
      // schema — whose non-null flags and add-column evolution are
      // legitimate; genuinely wrong user schemas (renamed columns, type
      // changes) still fail here, and batch reads re-validate exactly in
      // the V1 relation.
      require(schema.isEmpty || schema.fields.forall(f =>
          expected.fields.find(_.name == f.name).forall(
            _.dataType.catalogString == f.dataType.catalogString)),
        "omit the schema — the commit log is authoritative")
    }
    new GraftStreamingTable(spark, t, params)
  }
}

private[sources] object GraftSource {
  import scala.jdk.CollectionConverters._

  def paramsOf(options: org.apache.spark.sql.util.CaseInsensitiveStringMap): Map[String, String] =
    options.asCaseSensitiveMap().asScala.toMap

  def cdcMode(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  /** Parse option `name` with `f`, failing with a message that names
    * the offending option and carries the accepted renderings (ADVICE
    * r7: a bare NumberFormatException from `.toInt` never told the user
    * WHICH option was malformed). */
  def parseOpt[T](parameters: Map[String, String], name: String,
      accepted: String)(f: String => T): Option[T] =
    parameters.get(name).map { s =>
      try f(s) catch {
        case e: IllegalArgumentException if e.getMessage != null &&
            e.getMessage.contains(s"option '$name'") => throw e
        case e: Exception => throw new IllegalArgumentException(
          s"invalid value '$s' for option '$name' (accepted: $accepted)", e)
      }
    }

  /** `startingTimestamp` rendering: epoch millis, an ISO-8601 instant
    * (`2026-08-14T12:00:00Z`), an offset-zoned ISO timestamp
    * (`2026-08-14T12:00:00+02:00`), or a local `yyyy-MM-dd[ HH:mm:ss]`
    * interpreted in UTC. */
  def parseTimestampMillis(s: String): Long =
    parseTimestampMillisZoned(s, java.time.ZoneOffset.UTC)

  /** The same rendering with zone-less local timestamps interpreted in
    * `zone` — the SQL surface (CALL restore, matching `TIMESTAMP AS OF`,
    * which Spark parses under the session timezone) passes
    * `spark.sql.session.timeZone`; the streaming option keeps its
    * documented UTC contract (ADVICE r8: `Timestamp.valueOf` read the
    * DRIVER JVM's default zone — same call, different answers across
    * environments). */
  def parseTimestampMillisZoned(s: String, zone: java.time.ZoneId): Long =
    if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
    else try java.time.Instant.parse(s).toEpochMilli
    catch {
      case _: java.time.format.DateTimeParseException =>
        try java.time.OffsetDateTime.parse(s).toInstant.toEpochMilli
        catch {
          case _: java.time.format.DateTimeParseException =>
            val norm = if (s.contains("T") || s.contains(" ")) s.replace(' ', 'T')
              else s + "T00:00:00"
            java.time.LocalDateTime.parse(norm)
              .atZone(zone).toInstant.toEpochMilli
        }
    }

  def cdcSchema(committed: StructType): StructType = committed
    .add("_change_type", org.apache.spark.sql.types.StringType, nullable = false)
    .add("_commit_version", org.apache.spark.sql.types.LongType, nullable = false)

  /** The table behind a path-addressed streaming option map —
    * `cdcRetention` needs a handle constructed with the retention. */
  def tableFromOptions(spark: SparkSession,
      parameters: Map[String, String]): IncrementalTable = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft datasource requires a 'path' option (or load(path)/save(path))"))
    parseOpt(parameters, "cdcRetention", "a non-negative integer")(_.toInt) match {
      case Some(r) => new IncrementalTable(spark, path, cdcRetention = r)
      case None => IncrementalTable(spark, path)
    }
  }

  /** Shared micro-batch-stream factory for both front doors (path
    * datasource and SQL catalog): validates option combinations,
    * resolves `startingVersion`/`startingTimestamp`, and pins the
    * stream schema. */
  def microBatchStream(spark: SparkSession, table: IncrementalTable,
      parameters: Map[String, String],
      checkpointLocation: String): GraftMicroBatchStream = {
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "set either startingVersion or startingTimestamp, not both")
    val skip = parameters.get("skipChangeCommits").exists(_.toBoolean)
    val cdc = cdcMode(parameters)
    require(!(cdc && skip),
      "readChangeFeed and skipChangeCommits contradict each other " +
        "(stream every change vs skip rewrite commits) — set one, not both")
    val committed = table.schemaAt().getOrElse(throw new IllegalStateException(
      s"graft table ${table.root} has no committed schema to stream"))
    val schema = if (cdc) cdcSchema(committed) else committed
    // startingTimestamp (Delta analog): the FIRST commit at-or-after
    // the timestamp starts the stream, resolved over the RAW delta
    // records so a timestamp behind the replay horizon still names the
    // true historical version (batch 0 then goes through the archived
    // CDC walk, or fails loudly — never a silent under-delivery); a
    // timestamp past the head means "only future commits".
    val startV = parseOpt(parameters, "startingVersion",
        "a commit version")(_.toLong).orElse(
      parseOpt(parameters, "startingTimestamp",
          "epoch millis or ISO-8601, e.g. 2026-08-14T12:00:00Z") { s =>
        table.versionAtOrAfterTimestamp(parseTimestampMillis(s))
          .getOrElse(table.latestVersion + 1)
      }).getOrElse(0L)
    new GraftMicroBatchStream(spark, table, schema,
      startingVersion = startV,
      maxCommitsPerTrigger = parseOpt(parameters, "maxCommitsPerTrigger",
        "a positive integer")(_.toLong),
      cdc = cdc, skipChangeCommits = skip,
      checkpointLocation = checkpointLocation)
  }
}

/** The streaming-only DSv2 table behind `format("graft")`:
  * MICRO_BATCH_READ + STREAMING_WRITE and nothing else (batch falls
  * back to the V1 relations — see the provider note). Scan options are
  * the READER's options (they rode getTable's properties), write
  * options the writer's. */
private[sources] final class GraftStreamingTable(spark: SparkSession,
    table: IncrementalTable, params: Map[String, String])
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.connector.catalog.TableCapability

  override def name(): String = s"graft.`${table.root}`"

  override def schema(): StructType = table.schemaAt() match {
    case Some(committed) =>
      if (GraftSource.cdcMode(params)) GraftSource.cdcSchema(committed)
      else committed
    case None => new StructType()
  }

  override def partitioning(): Array[org.apache.spark.sql.connector.expressions.Transform] =
    table.partitionColumns
      .map(org.apache.spark.sql.connector.expressions.Expressions.identity)
      .toArray

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder = {
    val pinned = schema()
    new org.apache.spark.sql.connector.read.ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.Scan {
          override def readSchema(): StructType = pinned
          override def description(): String = s"GraftStreamScan ${table.root}"
          override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
            GraftSource.microBatchStream(spark, table, params, checkpointLocation)
        }
    }
  }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftStreamWriteBuilder(spark, table,
      params ++ GraftSource.paramsOf(info.options()), info)
}

/** Streaming write builder shared by the path front door (this file)
  * and reused in spirit by the catalog's [[GraftWriteBuilder]]:
  * Append → per-epoch append commits, Complete (the engine calls
  * [[truncate]]) → per-epoch atomic replace. The writer identity for
  * the exactly-once (appId, batchId) guard is the qualified
  * checkpointLocation when present — the SAME identity the retired V1
  * sink derived, so existing streams resume across the migration
  * without replaying or dropping a batch — else the engine's stable
  * query id. */
private[sources] final class GraftStreamWriteBuilder(spark: SparkSession,
    table: IncrementalTable, params: Map[String, String],
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  private var replaceEachEpoch = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    replaceEachEpoch = true
    this
  }

  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
        def split(s: String): Seq[String] =
          s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val partitionBy = params.get("partitionBy").map(split)
          .getOrElse(if (table.exists) table.partitionColumns else Seq.empty)
        val appId = params.get("checkpointLocation")
          .map(graft.streaming.CheckpointId(spark, _))
          .getOrElse(info.queryId())
        val stats = params.get("statsColumns").map(split)
          .getOrElse(GraftCatalog.statsColumnsOf(table))
        new GraftStreamingWrite(table, partitionBy, appId, info.schema(),
          stats, replaceEachEpoch,
          new graft.parquet.RowParquet.SerializableConf(
            IncrementalTable.hadoopConf(spark)),
          upsertKeys = params.get("upsertKeys").map(split).getOrElse(Nil))
      }
      override def description(): String = s"GraftStreamingWrite ${table.root}"
    }
}

/** One scan's prune accounting, recorded per table root for tests and
  * observability: how many files were live vs how many survived the
  * pushed-filter prune and were actually handed to the parquet reader. */
final case class GraftScanInfo(filesLive: Long, filesScanned: Int,
    pushed: Seq[String])

object GraftRelation {
  // scan-prune observability; keyed by table root, last scan wins
  private val scans = new java.util.concurrent.ConcurrentHashMap[String, GraftScanInfo]()
  def lastScan(root: String): Option[GraftScanInfo] = Option(scans.get(root))
  private[sources] def record(root: String, info: GraftScanInfo): Unit =
    scans.put(root, info)

  def apply(spark: SparkSession, table: IncrementalTable,
      asOf: Option[Long]): GraftRelation = {
    val schema = table.schemaAt(asOf).getOrElse(throw new IllegalStateException(
      s"graft table ${table.root} has no committed schema" +
        asOf.fold("")(v => s" as of version $v")))
    new GraftRelation(spark, table, asOf, schema)
  }

  /** Catalyst `sources.Filter` → `Column`, conservatively: None means
    * "can't express", and the filter is reported unhandled so Spark
    * re-evaluates it above the scan. Translated filters are applied in
    * full on the inner plan (both for file pruning and row filtering),
    * so claiming them handled is exact. */
  private[sources] def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isInCollection(vs.toSeq))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for { lc <- translate(l); rc <- translate(r) } yield lc && rc
    case Or(l, r) => for { lc <- translate(l); rc <- translate(r) } yield lc || rc
    case Not(c) => translate(c).map(!_)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  /** The scan contract shared by the V1 relation and the DSv2 catalog
    * bridge ([[GraftCatalog]]): prune files through the commit log's
    * skipping index (translated filters + partition-directory
    * equality), read ONLY the survivors with DV state applied in-scan,
    * re-apply the full predicate row-level, and project to the pruned
    * column set INSIDE the inner Catalyst plan — so the parquet
    * ReadSchema shrinks before any row bridge. Records prune accounting
    * per table root for tests/observability. */
  /** The prune half of the scan contract, separated so a caller that
    * needs the survivor list TWICE (the catalog scan's cost estimate
    * at planning + its row bridge at execution) computes it once —
    * also pinning the scan to one snapshot's file set. */
  private[sources] def pruneFiles(table: IncrementalTable, asOf: Option[Long],
      filters: Seq[Filter]): (Option[Column], Seq[String]) = {
    val pred = filters.flatMap(translate).reduceOption(_ && _)
    // partition-column equality prunes at DIRECTORY granularity (no
    // stats needed — partition values live in the path, not the footer)
    val partCols = table.partitionColumns.toSet
    val partMap = filters.collect {
      case EqualTo(a, v) if partCols(a) && v != null => a -> v.toString
    }.toMap
    val files = pred match {
      case Some(p) => table.liveFilesWhere(p, partMap, asOf)
      case None => table.liveFiles(partMap, asOf)
    }
    (pred, files)
  }

  private[sources] def scanDf(table: IncrementalTable, asOf: Option[Long],
      requiredColumns: Seq[String], filters: Seq[Filter],
      pruned: Option[(Option[Column], Seq[String])] = None): DataFrame = {
    val (pred, files) = pruned.getOrElse(pruneFiles(table, asOf, filters))
    // liveFileCount is a count JOB above the checkpoint threshold —
    // the accounting must never itself collect the live set
    record(table.root, GraftScanInfo(
      filesLive = table.liveFileCount(asOf),
      filesScanned = files.size,
      pushed = filters.map(_.toString)))
    val base = table.readFiles(files, asOf)
    val filtered = pred.map(base.filter).getOrElse(base)
    if (requiredColumns.isEmpty) filtered.select()
    else filtered.select(requiredColumns.toIndexedSeq.map(col): _*)
  }
}

/** See [[GraftSource]]. The scan contract: prune files through the
  * commit log's skipping index, read ONLY the survivors (with DV state
  * applied in-scan), project to the pruned column set inside the inner
  * Catalyst plan, then bridge to the V1 row RDD. */
final class GraftRelation private (spark: SparkSession,
    val table: IncrementalTable, asOf: Option[Long],
    override val schema: StructType)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext

  /** Live-snapshot bytes from the commit log, so Catalyst's join
    * planning sees a real size instead of `defaultSizeInBytes`
    * (= never-broadcast): a small graft table on the build side of a
    * join broadcasts exactly like a small parquet directory would. */
  override lazy val sizeInBytes: Long = table.liveBytes(asOf)

  /** Everything we can translate is fully applied inside [[buildScan]]
    * (pruning AND row filtering), so only untranslatable filters need
    * Spark's re-evaluation above the scan. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filter(GraftRelation.translate(_).isEmpty)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] =
    GraftRelation.scanDf(table, asOf, requiredColumns.toIndexedSeq,
      filters.toIndexedSeq).rdd
}
