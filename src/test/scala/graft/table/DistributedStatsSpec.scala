package graft.table

import org.apache.spark.sql.functions.{col, concat, lit, when}

import graft.SparkSpec

/** VERDICT r8 #1: above `spark.graft.distributedStatsThreshold` staged
  * files, the commit-time stats harvest runs as a Spark job over the
  * staged paths instead of the serial driver footer loop — same
  * per-file body, so BOTH paths must produce identical index contents
  * and identical pruning. */
class DistributedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def mkDf = spark.range(0, 2000).toDF("id")
    .withColumn("v", col("id") % 37)
    .withColumn("s", concat(lit("k"), (col("id") % 7).cast("string")))
    .withColumn("d", col("id").cast("double") / 8.0)
    .withColumn("n", when(col("id") % 5 === 0, col("id")).otherwise(lit(null)))
    .repartition(12, col("id")) // 12 staged files, deterministic routing

  private val statsCols = Seq("id", "v", "s", "d", "n")

  test("distributed harvest == inline harvest: index contents and pruning") {
    val a = IncrementalTable(spark, tmpDir("dstats") + "/inline")
    a.append(mkDf, Nil, statsColumns = statsCols)

    val prev = spark.conf.getOption("spark.graft.distributedStatsThreshold")
    spark.conf.set("spark.graft.distributedStatsThreshold", "0")
    val b = IncrementalTable(spark, tmpDir("dstats") + "/dist")
    try b.append(mkDf, Nil, statsColumns = statsCols)
    finally prev match {
      case Some(p) => spark.conf.set("spark.graft.distributedStatsThreshold", p)
      case None => spark.conf.unset("spark.graft.distributedStatsThreshold")
    }

    // identical per-file index CONTENTS: file names differ (UUID task
    // files) but the deterministic repartition routes identical row
    // sets, so the multiset of per-file ColStat maps must match exactly
    def canon(t: IncrementalTable) = t.liveFileStats().values
      .map(_.toSeq.sortBy(_._1).mkString("|")).toSeq.sorted
    assert(canon(a) == canon(b))
    assert(a.liveFileStats().size == 12 && b.liveFileStats().size == 12)

    // identical pruning on every stat class: integral range, string
    // point, double range, IS NULL / IS NOT NULL
    Seq(
      col("id") >= 1900L,
      col("v") === 36L,
      col("s") === "k3",
      col("d") < 2.0,
      col("n").isNotNull,
      col("n").isNull
    ).foreach { p =>
      assert(a.liveFilesWhere(p).size == b.liveFilesWhere(p).size, p.toString)
      assert(a.readWhere(p).count() == b.readWhere(p).count(), p.toString)
    }
    // and the reads stay exact vs the unpruned filter
    assert(b.readWhere(col("id") >= 1900L).count() ==
      b.read().filter(col("id") >= 1900L).count())
  }

  test("vacuum: distributed listing reclaims exactly what the driver walk does (VERDICT r8 #5)") {
    def build(root: String): IncrementalTable = {
      val t = IncrementalTable(spark, root)
      val df = spark.range(0, 300).toDF("id")
        .withColumn("p", (col("id") % 100).cast("string"))
      t.append(df.repartition(4), Seq("p")) // 100 partition dirs
      t.delete(col("id") < 30L) // rewrites leave removed files on disk
      // plant an orphan (a crashed writer's stray) in a partition dir
      val stray = new org.apache.hadoop.fs.Path(root, "p=0/stray-orphan.parquet")
      val fs = stray.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val os = fs.create(stray, true)
      os.write(Array[Byte](1, 2, 3)); os.close()
      t
    }
    val a = build(tmpDir("dlist") + "/driver")
    val reclaimedA = a.vacuum().sorted

    val prev = spark.conf.getOption("spark.graft.distributedListingThreshold")
    spark.conf.set("spark.graft.distributedListingThreshold", "0")
    val b = build(tmpDir("dlist") + "/dist")
    val reclaimedB = try b.vacuum().sorted
    finally prev match {
      case Some(p) => spark.conf.set("spark.graft.distributedListingThreshold", p)
      case None => spark.conf.unset("spark.graft.distributedListingThreshold")
    }
    // identical reclaim CLASSES: the stray orphan goes on both paths,
    // live data survives, and the table reads identically after
    assert(reclaimedA.exists(_.endsWith("stray-orphan.parquet")))
    assert(reclaimedB.exists(_.endsWith("stray-orphan.parquet")))
    assert(reclaimedA.size == reclaimedB.size, s"$reclaimedA vs $reclaimedB")
    assert(a.read().count() == 270 && b.read().count() == 270)
    // a second vacuum finds nothing more on either path
    assert(a.vacuum().isEmpty)
    spark.conf.set("spark.graft.distributedListingThreshold", "0")
    try assert(b.vacuum().isEmpty)
    finally prev match {
      case Some(p) => spark.conf.set("spark.graft.distributedListingThreshold", p)
      case None => spark.conf.unset("spark.graft.distributedListingThreshold")
    }
  }

  test("identity high-water and watermark meta ride the distributed path identically") {
    val prev = spark.conf.getOption("spark.graft.distributedStatsThreshold")
    val t = IncrementalTable(spark, tmpDir("dstats") + "/idt")
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v INT"), meta = Map("identity/id" -> "1,1,false"))
    spark.conf.set("spark.graft.distributedStatsThreshold", "0")
    try t.append(spark.range(0, 500).select(col("id").cast("int").as("v")), Nil)
    finally prev match {
      case Some(p) => spark.conf.set("spark.graft.distributedStatsThreshold", p)
      case None => spark.conf.unset("spark.graft.distributedStatsThreshold")
    }
    // the footer-pass high-water fold ran through the Spark job:
    // ids are dense 1..500 and the next (inline-path) mint continues
    // from 501
    val ids = t.read().select("id").as[Long].collect().sorted
    assert(ids.toSeq == (1L to 500L))
    t.append(Seq(9).toDF("v"), Nil)
    assert(t.read().select("id").as[Long].collect().max == 501L)
  }
}
