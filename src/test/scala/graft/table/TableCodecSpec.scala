package graft.table

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Per-table parquet compression (X89, `graft.parquet.compression`):
  * zstd for storage-bound corpora, snappy default — applied at the
  * batch write choke point and the streaming executor writer alike. */
class TableCodecSpec extends SparkSpec {
  import spark.implicits._

  private def codecOf(t: IncrementalTable, rel: String): String = {
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(t.root, rel),
        spark.sparkContext.hadoopConfiguration))
    try rd.getFooter.getBlocks.get(0).getColumns.get(0).getCodec.toString
    finally rd.close()
  }

  test("batch writes honor graft.parquet.compression=zstd; reads stay exact") {
    val t = IncrementalTable(spark, tmpDir("codec") + "/t1")
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING"),
      meta = Map("prop/graft.parquet.compression" -> "zstd"))
    t.append(spark.range(0, 1000).select(col("id"),
      org.apache.spark.sql.functions.md5(col("id").cast("string")).as("v")),
      Nil)
    t.liveFiles().foreach(f => assert(codecOf(t, f) == "ZSTD", f))
    assert(t.read().count() == 1000)
    // DML rewrites inherit the codec (one choke point)
    t.delete(col("id") < 10L)
    t.liveFiles().foreach(f => assert(codecOf(t, f) == "ZSTD", f))
    assert(t.read().count() == 990)
    // untouched default stays snappy
    val d = IncrementalTable(spark, tmpDir("codec") + "/t2")
    d.append(Seq((1L, "a")).toDF("id", "v"), Nil)
    d.liveFiles().foreach(f => assert(codecOf(d, f) == "SNAPPY", f))
  }

  test("the streaming executor writer honors the codec too") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = tmpDir("codec_wh")
    spark.conf.set("spark.sql.catalog.codc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.codc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS codc.lake")
    spark.sql("CREATE TABLE codc.lake.zs (id BIGINT) " +
      "TBLPROPERTIES ('graft.parquet.compression'='zstd')")
    val dir = tmpDir("codec_in")
    spark.range(0, 100).coalesce(1).write.parquet(s"$dir/in/f0")
    spark.readStream.schema(spark.range(1).toDF().schema)
      .option("recursiveFileLookup", "true").parquet(s"$dir/in")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .toTable("codc.lake.zs").awaitTermination()
    val t = IncrementalTable(spark, s"$wh/lake/zs")
    assert(t.liveFiles().nonEmpty)
    t.liveFiles().foreach(f => assert(codecOf(t, f) == "ZSTD", f))
    assert(t.read().count() == 100)
  }
}
