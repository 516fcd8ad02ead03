package graft.parquet

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.table.IncrementalTable

/** The public-API parquet ⇄ InternalRow bridge under the DSv2 streaming
  * front door: files our writer produces must read back identically
  * through Spark's reader, files Spark writes must decode identically
  * through our reader (incl. INT96 timestamps and nested types), and
  * the evolution contract (missing column → null, int32 file → long
  * target) must match the table's batch-read behavior. */
class RowParquetSpec extends SparkSpec {
  import spark.implicits._

  private def conf = IncrementalTable.hadoopConf(spark)

  private def readAll(path: String, target: StructType): Seq[Row] = {
    val rd = RowParquet.reader(
      HadoopInputFile.fromPath(new Path(path), conf), target)
    val conv = CatalystTypeConverters.createToScalaConverter(target)
    val out = Seq.newBuilder[Row]
    try {
      var r = rd.read()
      while (r != null) {
        out += conv(r).asInstanceOf[Row]
        r = rd.read()
      }
    } finally rd.close()
    out.result()
  }

  private def onlyParquet(dir: String): String =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .head.getAbsolutePath

  private val wideSchema = StructType(Seq(
    StructField("b", BooleanType),
    StructField("i8", ByteType),
    StructField("i16", ShortType),
    StructField("i32", IntegerType),
    StructField("i64", LongType),
    StructField("f32", FloatType),
    StructField("f64", DoubleType),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("d", DateType),
    StructField("ts", TimestampType),
    StructField("dec", DecimalType(12, 2)),
    StructField("bigdec", DecimalType(25, 3)),
    StructField("arr", ArrayType(LongType)),
    StructField("m", MapType(StringType, LongType)),
    StructField("st", StructType(Seq(
      StructField("x", LongType), StructField("y", StringType))))))

  private def wideRows: Seq[Row] = Seq(
    Row(true, 1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5,
      "héllo", Array[Byte](1, 2, 3), java.sql.Date.valueOf("2024-03-26"),
      java.sql.Timestamp.valueOf("2024-03-26 12:34:56.789"),
      BigDecimal("12345.67").bigDecimal, BigDecimal("123456789012345678.901").bigDecimal,
      Seq(1L, 2L, null), Map("a" -> 1L, "b" -> 2L), Row(7L, "in")),
    Row(null, null, null, null, null, null, null, null, null, null, null,
      null, null, null, null, null),
    Row(false, -1.toByte, -2.toShort, -3, -4L, -1.5f, -2.5,
      "", Array[Byte](), java.sql.Date.valueOf("1969-12-31"),
      java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
      BigDecimal("-0.01").bigDecimal, BigDecimal("-1.001").bigDecimal,
      Seq.empty[Long], Map.empty[String, Long], Row(null, null)))

  private def norm(r: Row): Seq[Any] = r.toSeq.map {
    case b: Array[Byte] => b.toSeq
    case x => x
  }

  test("our reader decodes Spark-written files across all supported types") {
    val dir = tmpDir("rowpq_read")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(wideRows, 1), wideSchema)
    df.coalesce(1).write.parquet(dir + "/d")
    val got = readAll(onlyParquet(dir + "/d"), wideSchema)
    assert(got.map(norm).toSet == df.collect().toSeq.map(norm).toSet)
  }

  test("our reader decodes legacy INT96 timestamps") {
    val dir = tmpDir("rowpq_int96")
    val old = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try Seq(("a", java.sql.Timestamp.valueOf("2024-03-26 01:02:03.000004")))
      .toDF("k", "ts").coalesce(1).write.parquet(dir + "/d")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", old)
    val target = StructType(Seq(StructField("k", StringType),
      StructField("ts", TimestampType)))
    val got = readAll(onlyParquet(dir + "/d"), target)
    assert(got.map(norm) == Seq(Seq("a",
      java.sql.Timestamp.valueOf("2024-03-26 01:02:03.000004"))))
  }

  test("Spark reads back our writer's files identically") {
    val dir = tmpDir("rowpq_write")
    val out = new Path(dir, "ours.parquet")
    val toInternal = CatalystTypeConverters.createToCatalystConverter(wideSchema)
    val w = RowParquet.writer(HadoopOutputFile.fromPath(out, conf), wideSchema, conf)
    try wideRows.foreach(r => w.write(toInternal(r).asInstanceOf[InternalRow]))
    finally w.close()
    val back = spark.read.schema(wideSchema).parquet(out.toString)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(wideRows, 1), wideSchema)
    assert(back.collect().toSeq.map(norm).toSet == df.collect().toSeq.map(norm).toSet)
  }

  test("evolution: missing target column reads null, int32 file widens to long target") {
    val dir = tmpDir("rowpq_evo")
    Seq((1, "a"), (2, "b")).toDF("k", "s").coalesce(1).write.parquet(dir + "/d")
    val target = StructType(Seq(
      StructField("k", LongType), // file has int32
      StructField("added", StringType), // absent from the file
      StructField("s", StringType)))
    val got = readAll(onlyParquet(dir + "/d"), target)
    assert(got.map(norm).toSet == Set(Seq(1L, null, "a"), Seq(2L, null, "b")))
  }

  test("evolution: in-struct added field reads null from old files") {
    val dir = tmpDir("rowpq_struct")
    Seq((1L, (2L, "x"))).toDF("k", "st").coalesce(1).write.parquet(dir + "/d")
    val target = StructType(Seq(
      StructField("k", LongType),
      StructField("st", StructType(Seq(
        StructField("_1", LongType),
        StructField("extra", StringType), // not in the file's struct
        StructField("_2", StringType))))))
    val got = readAll(onlyParquet(dir + "/d"), target)
    assert(got.map(norm) == Seq(Seq(1L, Row(2L, null, "x"))))
  }

  test("lossy mismatch fails loudly instead of corrupting") {
    val dir = tmpDir("rowpq_lossy")
    Seq(Tuple1(1L)).toDF("k").coalesce(1).write.parquet(dir + "/d")
    val target = StructType(Seq(StructField("k", IntegerType))) // int64 file
    val e = intercept[Exception] { readAll(onlyParquet(dir + "/d"), target) }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("lossy"))),
      e.toString)
  }

  test("hive path token round-trip incl. escaping and null") {
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq("plain", "a b", "a/b", "a=b", "100%", "tick'")
    cases.foreach { s =>
      val tok = RowParquet.partitionToken(UTF8String.fromString(s), StringType)
      assert(!tok.contains("/") && !tok.contains("="), tok)
      assert(RowParquet.partitionValue(tok, StringType) == UTF8String.fromString(s))
    }
    assert(RowParquet.partitionToken(null, StringType) == "__HIVE_DEFAULT_PARTITION__")
    assert(RowParquet.partitionValue("__HIVE_DEFAULT_PARTITION__", StringType) == null)
    assert(RowParquet.partitionValue("42", LongType) == 42L)
    assert(RowParquet.partitionValue("2024-03-26", DateType) ==
      java.time.LocalDate.parse("2024-03-26").toEpochDay.toInt)
  }
}
