package graft.table

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** Pins the round-9 ADVICE fixes:
  *  - the dir-clustered insert repartition is gated on userWrite, so a
  *    compaction's own layout (zorder range + sort, targetFiles count)
  *    survives on hidden-partitioned tables;
  *  - a commit that loses the OCC version race re-unions its ndv/
  *    sketches against the winner's channel instead of overwriting it
  *    (HLL unions commute — never an underestimate);
  *  - changes(includeRowId=true) validates row tracking once, up
  *    front, even when the window holds no commits;
  *  - the distributed vacuum listing excludes root-level '_'-prefixed
  *    files, same as the driver walk;
  *  - an hll-unsupported type in graft.ndvColumns is skipped with a
  *    warning instead of failing every write on the table. */
class AdviceR9Spec extends SparkSpec {
  import spark.implicits._

  test("compact keeps its zorder layout and targetFiles on a hidden-partitioned table") {
    val t = IncrementalTable(spark, tmpDir("advr9") + "/zc")
    t.create(StructType.fromDDL("id BIGINT, x BIGINT, y BIGINT"),
      partitionBy = Seq("id_bucket"),
      transforms = Map("id_bucket" -> "bucket(2,id)"))
    val df = spark.range(0, 1024).select(col("id"),
      (col("id") % 32).as("x"), (col("id") / 32).cast("bigint").as("y"))
    t.append(df, Seq("id_bucket"))
    t.compact(targetFiles = 4, zorderBy = Seq("x", "y"))
    // pre-fix: the write choke point re-hashed on the dir tuple — ONE
    // file per bucket dir (2 total), range layout destroyed. Post-fix
    // each of the 4 z-range tasks writes its slice of both dirs.
    val files = t.liveFiles()
    assert(files.size > 2, s"targetFiles collapsed to one per dir: $files")
    // z-clustering survives: a narrow x-band prunes below the full set
    val xs = t.liveFilesWhere(col("x") >= 0 && col("x") <= 7)
    assert(xs.size < files.size, s"no z pruning: ${xs.size} of ${files.size}")
    // and the rewrite is lossless
    assert(t.read().count() == 1024)
    assert(t.read().select("id").as[Long].collect().toSet ==
      (0L until 1024L).toSet)
  }

  test("ndv sketch survives losing the OCC version race (re-union, not overwrite)") {
    val root = tmpDir("advr9") + "/ndvrace"
    val h1 = IncrementalTable(spark, root)
    h1.create(StructType.fromDDL("id BIGINT"),
      meta = Map("prop/graft.ndvColumns" -> "id"))
    // a second handle with its own (now-current) replay cache
    val h2 = IncrementalTable(spark, root)
    assert(h2.latestVersion == h1.latestVersion) // caches warmed
    // h1 commits 1000 distinct ids; h2's cache is now STALE
    h1.append(spark.range(0, 1000).toDF("id"), Nil)
    // h2 appends 1000 MORE distinct ids: its ndv fold unions against
    // the stale (empty) channel, its publish loses the version race,
    // and the retry must re-union against h1's sketch — pre-fix it
    // overwrote, dropping h1's 1000 distincts
    h2.append(spark.range(1000, 2000).toDF("id"), Nil)
    val ndv = IncrementalTable(spark, root).columnNdv()("id")
    assert(math.abs(ndv - 2000L) <= 100L,
      s"ndv=$ndv — the race loser overwrote the winner's sketch")
  }

  test("changes(includeRowId=true) refuses untracked tables even on an empty window") {
    val t = IncrementalTable(spark, tmpDir("advr9") + "/cw")
    t.create(StructType.fromDDL("id BIGINT"))
    t.append(Seq(1L, 2L).toDF("id"), Nil)
    val v = t.latestVersion
    // empty window (from > to): pre-fix the per-commit require never
    // ran and the call silently returned an empty frame
    val e = intercept[IllegalArgumentException](
      t.changes(v + 1, v, includeRowId = true))
    assert(e.getMessage.contains("rowTracking"), e.getMessage)
  }

  test("distributed vacuum listing keeps root-level '_'-prefixed parquet files") {
    val root = tmpDir("advr9") + "/vac"
    val t = IncrementalTable(spark, root)
    t.create(StructType.fromDDL("id BIGINT, p INT"), partitionBy = Seq("p"))
    t.append(Seq((1L, 0), (2L, 1)).toDF("id", "p"), Seq("p"))
    // a root-level auxiliary file an engine might stage (e.g. a
    // _metadata summary) — never an orphan candidate on either path
    val marker = new java.io.File(root, "_aux.parquet")
    java.nio.file.Files.write(marker.toPath, Array[Byte](1, 2, 3))
    val old = spark.conf.getOption("spark.graft.distributedListingThreshold")
    spark.conf.set("spark.graft.distributedListingThreshold", "0")
    try {
      val removed = t.vacuum()
      assert(!removed.exists(_.contains("_aux")), removed.toString)
      assert(marker.exists(), "distributed listing deleted a '_' file")
    } finally old match {
      case Some(v0) => spark.conf.set("spark.graft.distributedListingThreshold", v0)
      case None => spark.conf.unset("spark.graft.distributedListingThreshold")
    }
  }

  test("an hll-unsupported ndvColumns type is skipped, not a write failure") {
    val t = IncrementalTable(spark, tmpDir("advr9") + "/ndvtype")
    t.create(StructType.fromDDL("k BIGINT, d DOUBLE"),
      meta = Map("prop/graft.ndvColumns" -> "k,d"))
    // pre-fix: hll_sketch_agg(d) threw inside EVERY write until the
    // property was unset
    t.append(Seq((1L, 0.5), (2L, 1.5), (2L, 2.5)).toDF("k", "d"), Nil)
    val ndv = t.columnNdv()
    assert(ndv.get("k").contains(2L), ndv.toString)
    assert(!ndv.contains("d"), ndv.toString)
    // analyzeNdv takes the same skip path instead of throwing
    t.analyzeNdv(Seq("k", "d"))
    assert(IncrementalTable(spark, t.root).columnNdv().get("k").contains(2L))
  }
}
