package graft.sources

import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

import graft.parquet.RowParquet
import graft.table.IncrementalTable

/** A task's staged files: paths RELATIVE to the epoch's staging dir
  * (hive layout included), reported back for the driver-side commit —
  * only message-listed files enter the log, so a speculative or retried
  * task's extra files stay invisible orphans until the stage dir is
  * dropped. */
final case class GraftTaskFiles(rels: Seq[String]) extends WriterCommitMessage

/** DSv2 streaming sink for a graft table — `df.writeStream
  * .format("graft").start(path)` / `.toTable("graft.ns.t")` on PUBLIC
  * connector interfaces only (the round-7 V1 `execution.streaming.Sink`
  * + `internalCreateDataFrame` shim are retired).
  *
  * Execution shape: executors write parquet directly into a per-epoch
  * staging dir under the table root via [[RowParquet]] (partition
  * values route to hive dirs, data files carry only data columns —
  * byte-identical layout to the batch writer); the driver-side
  * `commit(epoch)` then promotes exactly the task-reported files and
  * publishes ONE log commit carrying the (appId, batchId) replay guard,
  * so a crash replay of a committed epoch short-circuits at the log
  * before any file moves — the same exactly-once contract as the
  * library's foreachBatch sinks, now with zero per-batch re-planning
  * (the V1 sink re-materialized every micro-batch through a second
  * QueryExecution; here rows stream straight from the running plan into
  * the staged files).
  *
  * `truncate` (Complete output mode, via the write builder's
  * SupportsTruncate): each epoch commits a full atomic replace instead
  * of an append — the maintained-view shape. */
final class GraftStreamingWrite(table: IncrementalTable,
    partitionBy: Seq[String], appId: String, writeSchema: StructType,
    statsColumns: Seq[String], truncate: Boolean,
    conf: RowParquet.SerializableConf,
    // X105 streaming MOR upsert: each epoch's key tuples go in force
    // as an equality delete inside the epoch's own commit
    upsertKeys: Seq[String] = Nil) extends StreamingWrite {

  // one staging namespace per writer identity: deterministic, so a
  // crashed epoch's re-attempt lands in the same place and the commit
  // sweeps its predecessors' orphans with the stage dir
  private val stageNs = "stream_" + Integer.toHexString(appId.hashCode)

  private def epochStage(epochId: Long): Path =
    new Path(new Path(table.root), s"_staging/$stageNs/e$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    // staged files carry PHYSICAL names (column mapping, X72; nested
    // members too, X86) — renames preserve field order and types, so
    // the positional rows bind as-is; partition columns are never
    // renamable, so routing names hold
    val phys = table.physicalSchemaOf(writeSchema)
    // hidden partitioning (X77): derived partition columns route via
    // their committed transform, evaluated per row executor-side (spec
    // strings ship; transform bases are rename-guarded, so the names
    // hold under the physical schema too)
    val specs = table.partitionTransforms().view
      .mapValues(_.spec).toMap.toSeq
    new GraftStreamWriterFactory(
      new Path(new Path(table.root), s"_staging/$stageNs").toString,
      graft.table.IncrementalTable.ddlOf(phys), partitionBy, specs, conf,
      table.tableProperties.getOrElse("graft.parquet.compression", "snappy"))
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val rels = messages.toIndexedSeq
      .flatMap(m => m.asInstanceOf[GraftTaskFiles].rels)
    table.commitStagedStream(epochStage(epochId), rels, writeSchema,
      partitionBy, replace = truncate, batchId = epochId, appId = appId,
      statsColumns = statsColumns, upsertKeys = upsertKeys)
    ()
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val stage = epochStage(epochId)
    val fs = stage.getFileSystem(conf.value)
    if (fs.exists(stage)) fs.delete(stage, true)
    ()
  }

  override def toString: String =
    s"GraftStreamingWrite[${table.root}]${if (truncate) " truncate" else ""}"
}

private[sources] final class GraftStreamWriterFactory(stageNsUri: String,
    schemaDdl: String, partitionBy: Seq[String],
    transformSpecs: Seq[(String, String)],
    conf: RowParquet.SerializableConf,
    codec: String = "snappy") extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(new Path(stageNsUri, s"e$epochId"),
      StructType.fromDDL(schemaDdl), partitionBy, transformSpecs,
      conf.value, partitionId, taskId, codec)
}

/** Executor-side writer: routes each row to its hive partition dir
  * (values rendered exactly as the batch writer's —
  * [[RowParquet.partitionToken]] mirrors Spark's escapePathName), strips
  * the partition columns from the written file, and reports the staged
  * rel paths on task commit. One open file per partition value per
  * task, same as Spark's dynamic-partition writer without sorting. */
private[sources] final class GraftStreamDataWriter(epochStage: Path,
    schema: StructType, partitionBy: Seq[String],
    transformSpecs: Seq[(String, String)], conf: Configuration,
    partitionId: Int, taskId: Long,
    codec: String = "snappy") extends DataWriter[InternalRow] {

  // per partition column: Left(field ordinal) routes an identity
  // column by its row value; Right(transform, base ordinal) derives
  // the token per row (X77) — parse against the write schema is loud
  // when the stream projection dropped the base column
  private val routes: Array[Either[Int, (graft.table.PartitionTransform, Int)]] = {
    val specs = transformSpecs.toMap
    partitionBy.map { p =>
      specs.get(p) match {
        case Some(spec) =>
          val t = graft.table.PartitionTransform.parse(spec, schema)
          Right((t, schema.fieldIndex(t.base)))
        case None => Left(schema.fieldIndex(p))
      }
    }.toArray
  }
  private val partOrds: Array[Int] = routes.collect { case Left(o) => o }
  private val dataOrds: Array[Int] =
    schema.fields.indices.filterNot(partOrds.contains(_)).toArray
  private val dataSchema = StructType(dataOrds.map(schema.fields(_)))

  private val writers = mutable.LinkedHashMap.empty[String, ParquetWriter[InternalRow]]
  private val rels = mutable.ArrayBuffer.empty[String]
  private val buf = new GenericInternalRow(dataOrds.length)

  override def write(row: InternalRow): Unit = {
    val dir = {
      val sb = new StringBuilder
      var i = 0
      while (i < routes.length) {
        if (i > 0) sb.append('/')
        sb.append(partitionBy(i)).append('=')
        routes(i) match {
          case Left(ord) =>
            val dt = schema.fields(ord).dataType
            val v = if (row.isNullAt(ord)) null else row.get(ord, dt)
            sb.append(RowParquet.partitionToken(v, dt))
          case Right((t, ord)) =>
            val dt = schema.fields(ord).dataType
            val v = if (row.isNullAt(ord)) null else t.eval(row.get(ord, dt))
            sb.append(RowParquet.partitionToken(v,
              org.apache.spark.sql.types.StringType))
        }
        i += 1
      }
      sb.toString
    }
    val w = writers.getOrElseUpdate(dir, {
      val rel = (if (dir.isEmpty) "" else dir + "/") +
        f"part-$partitionId%05d-$taskId-${UUID.randomUUID()}.$codec.parquet"
      rels += rel
      RowParquet.writer(
        HadoopOutputFile.fromPath(new Path(epochStage, rel), conf),
        dataSchema, conf, codec)
    })
    var i = 0
    while (i < dataOrds.length) {
      val ord = dataOrds(i)
      val dt = dataSchema.fields(i).dataType
      buf.update(i, if (row.isNullAt(ord)) null else row.get(ord, dt))
      i += 1
    }
    w.write(buf)
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_.close())
    writers.clear()
    GraftTaskFiles(rels.toSeq)
  }

  override def abort(): Unit = {
    writers.values.foreach(w => try w.close() catch { case _: Exception => })
    writers.clear()
    val fs = epochStage.getFileSystem(conf)
    rels.foreach { rel =>
      try { fs.delete(new Path(epochStage, rel), false); () }
      catch { case _: Exception => }
    }
  }

  override def close(): Unit = {
    writers.values.foreach(w => try w.close() catch { case _: Exception => })
    writers.clear()
  }
}
