package graft.sources

import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, TableScan}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec

/** Scratch probe (round 8): when a DataSource class implements BOTH the
  * V1 batch interfaces and TableProvider, and its Table advertises only
  * STREAMING capabilities, do batch read/write fall back to V1? */
object ProbeSource {
  @volatile var v1Reads = 0
  @volatile var v1Writes = 0
  val schema: StructType = StructType(Seq(StructField("k", LongType)))
}

class ProbeSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister with TableProvider {
  override def shortName(): String = "graftprobe"

  private def rel(ctx: SQLContext): BaseRelation =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = ProbeSource.schema
      override def buildScan(): RDD[Row] =
        ctx.sparkContext.parallelize(Seq(Row(1L), Row(2L)), 1)
    }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    ProbeSource.v1Reads += 1
    rel(sqlContext)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    ProbeSource.v1Writes += 1
    rel(sqlContext)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ProbeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = new Table with SupportsRead {
    override def name(): String = "probe"
    override def schema(): StructType = ProbeSource.schema
    override def capabilities(): JSet[TableCapability] =
      Set(TableCapability.MICRO_BATCH_READ).asJava
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      throw new UnsupportedOperationException("batch scan should not be built")
  }
}

class V2FallbackProbeSpec extends SparkSpec {
  test("batch read/write fall back to V1 when the table is streaming-only") {
    val n = spark.read.format("graft.sources.ProbeSource").load().count()
    assert(n == 2)
    assert(ProbeSource.v1Reads == 1)
    import spark.implicits._
    Seq(1L).toDF("k").write.format("graft.sources.ProbeSource")
      .mode(SaveMode.ErrorIfExists).save()
    assert(ProbeSource.v1Writes == 1)
    Seq(1L).toDF("k").write.format("graft.sources.ProbeSource")
      .mode(SaveMode.Append).save()
    assert(ProbeSource.v1Writes == 2)
  }
}
