package graft.sources

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
    with StreamSinkProvider with StreamSourceProvider {

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
    mode match {
      case SaveMode.Append => t.append(data, partitionBy, statsColumns = stats)
      case SaveMode.Overwrite =>
        t.replaceWhere(data, partitionBy, Map.empty, Map.empty,
          statsColumns = stats)
      case SaveMode.ErrorIfExists =>
        require(!t.exists, s"graft table ${t.root} already exists (mode=ErrorIfExists)")
        t.append(data, partitionBy, statsColumns = stats)
      case SaveMode.Ignore =>
        if (!t.exists) t.append(data, partitionBy, statsColumns = stats)
    }
    GraftRelation(sqlContext.sparkSession, t, None)
  }

  /** Streaming front door: `df.writeStream.format("graft")
    * .option("checkpointLocation", …).start(path)` — each micro-batch
    * appends under the table's (appId = checkpoint identity, batchId)
    * replay guard, the same exactly-once contract as the library's
    * foreachBatch sinks: a crash replay of a committed batch
    * short-circuits at the commit log before any plan runs. Append
    * output mode only (an aggregate's update stream should go through
    * the library's maintained-view sinks instead). */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft streaming sink supports Append output mode only (got $outputMode)")
    val t = tableOf(sqlContext, parameters)
    val appId = parameters.get("checkpointLocation")
      .map(graft.streaming.CheckpointId(sqlContext.sparkSession, _))
      .getOrElse(t.root)
    new GraftSink(t, partitionColumns, appId)
  }

  /** Streaming SOURCE front door: `spark.readStream.format("graft")
    * .load(path)` — the "stream FROM a table" contract (the Delta
    * analog of [[graft.streaming.DerivedStream]]'s changefeed read):
    * offsets are commit versions, each micro-batch is exactly the
    * window's appended rows. Options: `startingVersion` (default:
    * everything committed so far becomes batch 0, Delta's initial-
    * snapshot shape), `startingTimestamp` (first commit at-or-after
    * the timestamp starts the stream — epoch millis or ISO-8601 UTC;
    * mutually exclusive with startingVersion),
    * `maxCommitsPerTrigger` (rate limit),
    * `readChangeFeed` (CDC rows `… , _change_type, _commit_version`;
    * rewrites/deletes stream as delete+insert rows instead of failing),
    * `skipChangeCommits` (plain stream tolerates rewrite commits by
    * skipping them, Delta's option of the same name), `cdcRetention`
    * (how many commits back the change feed stays readable across
    * checkpoint folds — [[IncrementalTable]]'s cdcRetention). */
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val t = tableOf(sqlContext, parameters)
    val committed = t.schemaAt().getOrElse(throw new IllegalStateException(
      s"graft table ${t.root} has no committed schema to stream"))
    val out =
      if (GraftSource.cdcMode(parameters)) GraftSource.cdcSchema(committed)
      else committed
    schema.foreach(s => require(s == out,
      "omit the schema — the commit log is authoritative"))
    (s"graft[${t.root}]", out)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val t = parameters.get("cdcRetention").map(_.toInt) match {
      case Some(r) => new IncrementalTable(sqlContext.sparkSession,
        pathOf(parameters), cdcRetention = r)
      case None => tableOf(sqlContext, parameters)
    }
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "set either startingVersion or startingTimestamp, not both")
    val skip = parameters.get("skipChangeCommits").exists(_.toBoolean)
    require(!(GraftSource.cdcMode(parameters) && skip),
      "readChangeFeed and skipChangeCommits contradict each other " +
        "(stream every change vs skip rewrite commits) — set one, not both")
    // startingTimestamp (Delta analog): the FIRST commit at-or-after
    // the timestamp starts the stream, resolved over the RAW delta
    // records so a timestamp behind the replay horizon still names the
    // true historical version (batch 0 then goes through the archived
    // CDC walk, or fails loudly — never a silent under-delivery); a
    // timestamp past the head means "only future commits". Epoch
    // millis or ISO-8601 (UTC — the engine pins the session tz).
    val startV = parameters.get("startingVersion").map(_.toLong).orElse(
      parameters.get("startingTimestamp").map { s =>
        t.versionAtOrAfterTimestamp(GraftSource.parseTimestampMillis(s))
          .getOrElse(t.latestVersion + 1)
      }).getOrElse(0L)
    new GraftStreamSource(sqlContext.sparkSession, t,
      startingVersion = startV,
      maxCommitsPerTrigger = parameters.get("maxCommitsPerTrigger").map(_.toLong),
      cdc = GraftSource.cdcMode(parameters),
      skipChangeCommits = skip)
  }
}

private[sources] object GraftSource {
  def cdcMode(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  /** `startingTimestamp` rendering: epoch millis, an ISO-8601 instant
    * (`2026-08-14T12:00:00Z`), or a local `yyyy-MM-dd[ HH:mm:ss]`
    * interpreted in UTC. */
  def parseTimestampMillis(s: String): Long =
    if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
    else try java.time.Instant.parse(s).toEpochMilli
    catch {
      case _: java.time.format.DateTimeParseException =>
        val norm = if (s.contains("T") || s.contains(" ")) s.replace(' ', 'T')
          else s + "T00:00:00"
        java.time.LocalDateTime.parse(norm)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }

  def cdcSchema(committed: StructType): StructType = committed
    .add("_change_type", org.apache.spark.sql.types.StringType, nullable = false)
    .add("_commit_version", org.apache.spark.sql.types.LongType, nullable = false)
}

/** See [[GraftSource.createSource]]. Offsets are COMMIT VERSIONS
  * (LongOffset): `getOffset` reports the table head (rate-limited by
  * `maxCommitsPerTrigger`), `getBatch(from, to)` materializes the
  * window's appended rows.
  *
  * Append-only contract: a replace/dv/restore commit inside the window
  * is a rewrite no append stream can express — the source fails loudly
  * and points at the change feed / library streams (Delta's
  * ignoreChanges-less default). A window predating the head checkpoint
  * (a lagging consumer crossing the replay horizon) goes through
  * [[IncrementalTable.changes]], which reads the ARCHIVED delta
  * records — so checkpoint folding never silently drops a commit from
  * the stream; outside CDC retention it fails like `changes` does,
  * never under-reports.
  *
  * `cdc` (option `readChangeFeed`): micro-batches are the window's
  * CHANGE rows — `…, _change_type ('insert'|'delete'),
  * _commit_version` straight from [[IncrementalTable.changes]] (X15) —
  * so replace/dv/restore commits stream as delete+insert pairs instead
  * of failing; a downstream `foreachBatch` applies them as an exact
  * revision. `skipChangeCommits`: the plain (non-CDC) stream tolerates
  * rewrite commits by SKIPPING them (only pure appends are emitted) —
  * Delta's documented escape hatch when downstream only wants new
  * rows. */
private[sources] final class GraftStreamSource(spark: SparkSession,
    table: IncrementalTable, startingVersion: Long,
    maxCommitsPerTrigger: Option[Long],
    cdc: Boolean = false, skipChangeCommits: Boolean = false)
    extends org.apache.spark.sql.execution.streaming.Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.execution.streaming.{Offset => V1Offset}
  import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
  import org.apache.spark.sql.graftshim.StreamingBatchShim

  override val schema: StructType = {
    val committed = table.schemaAt().getOrElse(throw new IllegalStateException(
      s"graft table ${table.root} has no committed schema to stream"))
    if (cdc) GraftSource.cdcSchema(committed) else committed
  }

  private def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json().trim.toLong
  }

  // Trigger.AvailableNow pins the drain target at query start (without
  // this the engine consults getOffset ONCE, so a rate-limited run
  // would stop after its first micro-batch); each subsequent trigger
  // advances by maxCommitsPerTrigger until the pinned head is reached
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    table.refresh()
    availableNowTarget = Some(table.latestVersion)
  }

  /** SupportsTriggerAvailableNow extends SupportsAdmissionControl; the
    * V1 engine path still drives planning through [[getOffset]], so the
    * DSv2-shaped accessor just delegates. */
  override def latestOffset(start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): org.apache.spark.sql.connector.read.streaming.Offset =
    getOffset.orNull

  override def getOffset: Option[V1Offset] = {
    val latest = availableNowTarget.getOrElse {
      table.refresh()
      table.latestVersion
    }
    if (latest < 0) None
    else Some(LongOffset(maxCommitsPerTrigger match {
      case Some(max) =>
        // rate limit measured from the last PLANNED offset, not the
        // committed one — getOffset may be polled between batches
        val floor = lastPlanned.getOrElse(startingVersion - 1)
        math.min(latest, floor + max)
      case None => latest
    }))
  }
  @volatile private var lastPlanned: Option[Long] = None

  override def getBatch(start: Option[V1Offset], end: V1Offset): org.apache.spark.sql.DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion - 1)
    val to = versionOf(end)
    // floor tracks the FURTHEST window edge ever seen: on a restart the
    // in-memory floor resets below the checkpoint's committed offset,
    // and the engine may hand one stale (to < from) window — empty by
    // the filter below, and `from` (the committed offset) re-seeds the
    // floor so no version is ever re-delivered
    lastPlanned = Some(math.max(lastPlanned.getOrElse(Long.MinValue),
      math.max(from, to)))
    table.refresh()
    val visible = table.commits().filter(c => c.version > from && c.version <= to)
    val crossesFold = visible.headOption.exists(c =>
      c.action == "checkpoint" && c.filesParquet.isDefined && from + 1 < c.version)
    val batch =
      if (cdc) {
        // the change feed IS the stream: the CDC walk handles in-window
        // rewrites (delete+insert pairs) and horizon crossings (archived
        // delta records under cdcRetention) uniformly — an empty window
        // yields the empty CDC frame
        if (from + 1 > to)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else table.changes(from + 1, to)
      } else if (!crossesFold) {
        if (!skipChangeCommits) visible.foreach { c =>
          require(c.action == "append" || c.action == "meta" ||
              c.action == "dvmerge" || c.action == "checkpoint",
            s"graft streaming source requires append-only history: version " +
              s"${c.version} is '${c.action}' — stream the change feed " +
              "(option readChangeFeed) or the library's rebuild-aware streams")
        }
        visible.filter(c => c.action == "append" && c.add.nonEmpty)
          .map(c => table.readCommit(c.version))
          .reduceOption(_.unionByName(_))
          .getOrElse(table.readFiles(Nil).limit(0))
      } else {
        // lagging consumer crossed the replay horizon: the folded
        // commits' add-sets are gone from the replayed log, but the
        // archived delta walk (CDC retention) still has them
        val feed = table.changes(from + 1, to)
        if (skipChangeCommits) {
          // same semantics as the un-folded branch: only PURE APPEND
          // commits emit (a rewrite's re-added rows are skipped with
          // their commit) — actions come from the raw delta records,
          // which survive the fold
          val appends = table.commitActions(from, to)
            .collect { case (v, "append") => v }.toSeq
          feed.filter(col("_change_type") === "insert" &&
              col("_commit_version").isInCollection(appends))
            .drop("_change_type", "_commit_version")
        } else {
          val deletes = feed.filter(col("_change_type") === "delete")
          require(deletes.isEmpty,
            "graft streaming source crossed the replay horizon over a window " +
              "containing row deletes — append-only streams cannot express " +
              "them (options: readChangeFeed, skipChangeCommits)")
          feed.filter(col("_change_type") === "insert")
            .drop("_change_type", "_commit_version")
        }
      }
    StreamingBatchShim.asStreamingBatch(
      batch.select(schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
}

/** See [[GraftSource.createSink]]. The micro-batch frame is
  * re-materialized through its OWN QueryExecution (no new analysis
  * touches the streaming plan —
  * [[org.apache.spark.sql.graftshim.StreamingBatchShim]]) into a batch
  * frame the table's append path can stage. */
private[sources] final class GraftSink(table: IncrementalTable,
    partitionColumns: Seq[String], appId: String)
    extends org.apache.spark.sql.execution.streaming.Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val partitionBy =
      if (partitionColumns.nonEmpty) partitionColumns
      else if (table.exists) table.partitionColumns
      else Seq.empty
    val batch = org.apache.spark.sql.graftshim.StreamingBatchShim.rebatch(data)
    table.append(batch, partitionBy,
      batchId = Some(batchId), appId = Some(appId),
      statsColumns = GraftCatalog.statsColumnsOf(table))
    ()
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
