package graft.table

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, StructType}

import graft.SparkSpec

/** Column DEFAULTs (X79): one committed literal per column, serving as
  * both the EXISTENCE default (files from before the column existed
  * read it instead of null) and the CURRENT default (INSERTs omitting
  * the column get it). */
class DefaultColumnsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cat: String = {
    val wh = tmpDir("dflt_wh")
    spark.conf.set("spark.sql.catalog.dfcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dfcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dfcat.lake")
    "dfcat"
  }

  test("ALTER ADD COLUMN DEFAULT: old files read the default, new inserts fill it") {
    spark.sql(s"CREATE TABLE $cat.lake.d1 (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.lake.d1 VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE $cat.lake.d1 ADD COLUMN score INT DEFAULT 7")
    // generation 1 (no column physically): reads the default, not null
    assert(spark.sql(s"SELECT k, score FROM $cat.lake.d1 ORDER BY k")
      .as[(Long, Int)].collect().toSeq == Seq((1L, 7), (2L, 7)))
    // INSERT omitting the column: analyzer fills the CURRENT default
    spark.sql(s"INSERT INTO $cat.lake.d1 (k, v) VALUES (3, 'c')")
    // INSERT with an explicit value — incl. explicit NULL — is honored
    spark.sql(s"INSERT INTO $cat.lake.d1 VALUES (4, 'd', 9), (5, 'e', NULL)")
    assert(spark.sql(s"SELECT k, score FROM $cat.lake.d1 ORDER BY k")
      .as[(Long, Option[Int])].collect().toSeq ==
      Seq(1L -> Some(7), 2L -> Some(7), 3L -> Some(7), 4L -> Some(9), 5L -> None))
    // DEFAULT keyword in VALUES
    spark.sql(s"INSERT INTO $cat.lake.d1 VALUES (6, 'f', DEFAULT)")
    assert(spark.sql(s"SELECT score FROM $cat.lake.d1 WHERE k = 6")
      .as[Int].head() == 7)
  }

  test("CREATE TABLE with DEFAULT columns") {
    spark.sql(s"CREATE TABLE $cat.lake.d2 (k BIGINT, tag STRING DEFAULT 'raw', " +
      "n INT DEFAULT 0)")
    spark.sql(s"INSERT INTO $cat.lake.d2 (k) VALUES (1)")
    spark.sql(s"INSERT INTO $cat.lake.d2 VALUES (2, 'clean', 5)")
    assert(spark.sql(s"SELECT k, tag, n FROM $cat.lake.d2 ORDER BY k")
      .as[(Long, String, Int)].collect().toSeq ==
      Seq((1L, "raw", 0), (2L, "clean", 5)))
  }

  test("library path: alter(defaults), mixed generations, rename and drop follow") {
    val t = IncrementalTable(spark, tmpDir("dflt") + "/t1")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Nil)
    t.alter(additions = new StructType().add("score", IntegerType),
      defaults = Map("score" -> "42"))
    assert(t.read().orderBy("k").select("k", "score")
      .as[(Long, Int)].collect().toSeq == Seq((1L, 42), (2L, 42)))
    // new generation carries a real value; old keeps the default
    t.append(Seq((3L, "c", 9)).toDF("k", "v", "score"), Nil)
    assert(t.read().orderBy("k").select("score").as[Int].collect().toSeq ==
      Seq(42, 42, 9))
    // rename: the default follows the new name
    t.renameColumn("score", "points")
    assert(t.columnDefaults() == Map("points" -> "42"))
    assert(t.read().orderBy("k").select("points").as[Int].collect().toSeq ==
      Seq(42, 42, 9))
    // drop: the default entry tombstones with the column
    t.alter(drops = Seq("points"))
    assert(t.columnDefaults().isEmpty)
  }

  test("validation: junk, non-constant, and uncastable defaults refuse; no SET DEFAULT") {
    val t = IncrementalTable(spark, tmpDir("dflt") + "/t2")
    t.append(Seq((1L, "a")).toDF("k", "v"), Nil)
    intercept[IllegalArgumentException] {
      t.alter(additions = new StructType().add("c", IntegerType),
        defaults = Map("c" -> "not a literal ((("))
    }
    intercept[IllegalArgumentException] {
      t.alter(additions = new StructType().add("c", IntegerType),
        defaults = Map("c" -> "rand()"))
    }
    intercept[IllegalArgumentException] {
      t.alter(additions = new StructType().add("c", IntegerType),
        defaults = Map("c" -> "array(1,2)"))
    }
    // default for a column NOT being added = SET DEFAULT, refused
    intercept[IllegalArgumentException] {
      t.alter(defaults = Map("v" -> "'x'"))
    }
  }

  test("streaming read fills defaults for pre-column files (bridge parity)") {
    val root = tmpDir("dflt")
    val src = IncrementalTable(spark, root + "/src")
    src.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Nil)
    src.alter(additions = new StructType().add("score", IntegerType),
      defaults = Map("score" -> "7"))
    src.append(Seq((3L, "c", 1)).toDF("k", "v", "score"), Nil)
    val out = root + "/out"
    spark.readStream.format("graft").load(root + "/src")
      .writeStream.format("graft")
      .option("checkpointLocation", root + "/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(out).awaitTermination()
    val got = IncrementalTable(spark, out).read()
      .orderBy("k").select("k", "score").as[(Long, Option[Int])].collect().toSeq
    assert(got == Seq(1L -> Some(7), 2L -> Some(7), 3L -> Some(1)))
  }

  test("defaulted column never breaks skipping soundness") {
    val t = IncrementalTable(spark, tmpDir("dflt") + "/t3")
    t.append(spark.range(100).toDF("k"), Nil, statsColumns = Seq("k", "score"))
    t.alter(additions = new StructType().add("score", IntegerType),
      defaults = Map("score" -> "50"))
    t.append(spark.range(100, 200).toDF("k")
      .withColumn("score", (col("k") % 10).cast("int")),
      Nil, statsColumns = Seq("k", "score"))
    // the old file has NO stats entry for score -> conservatively kept,
    // and its rows carry the default 50
    assert(t.readWhere(col("score") === 50).count() == 100)
    assert(t.readWhere(col("score") === 5).count() == 10)
    // metadata MIN/MAX must DECLINE (the stats-less old file could hold
    // the extreme via its default)
    assert(t.liveMinMax("score").isEmpty)
  }
}
