package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.{col, concat, lit}

import graft.SparkSpec
import graft.functions.BloomBits

/** Log-level bloom-filter file index (X100): per `graft.bloomIndexColumns`
  * column, every write harvests one bloom filter per staged FILE into a
  * `_graft_log/bloomidx/` sidecar; `liveFilesWhere` drops any file whose
  * filter provably misses every equality/IN point. The [min,max] index
  * answers range questions; on a high-cardinality UNCLUSTERED key every
  * file's span covers every literal and minmax prunes nothing — the
  * bloom is the point-lookup path a 100 TB table actually needs.
  *
  * These tables deliberately set NO statsColumns: every pruned file in
  * the asserts below is pruned by the bloom index alone. */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  /** 8 files; file i holds ids {i, 8+i, 16+i, …} — interleaved ranges,
    * the minmax-useless worst case. */
  private def interleaved(t: IncrementalTable): Unit =
    (0 until 8).foreach { i =>
      t.append(spark.range(100)
        .select((col("id") * 8 + i).as("id"),
          concat(lit("doc-"), (col("id") * 8 + i)).as("url"))
        .coalesce(1), Nil)
    }

  test("point lookup prunes files minmax cannot; results stay exact") {
    val t = IncrementalTable(spark, tmpDir("bloom") + "/t1")
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, url STRING"),
      meta = Map("prop/graft.bloomIndexColumns" -> "id,url"))
    interleaved(t)
    assert(t.liveFiles().size == 8)
    // long point: id=17 lives only in file (17 mod 8)=1
    val byId = t.liveFilesWhere(col("id") === 17L)
    assert(byId.size < 8, s"bloom should prune: kept ${byId.size}")
    assert(t.readWhere(col("id") === 17L).collect().map(_.getLong(0)).toSeq == Seq(17L))
    // string point
    val byUrl = t.liveFilesWhere(col("url") === "doc-17")
    assert(byUrl.size < 8, s"bloom should prune: kept ${byUrl.size}")
    assert(t.readWhere(col("url") === "doc-17").count() == 1)
    // absent value: typically zero files survive; result exact either way
    assert(t.readWhere(col("id") === 9999L).count() == 0)
    assert(t.readWhere(col("url") === "doc-9999").count() == 0)
  }

  test("soundness: every present point's file survives the prune") {
    val t = IncrementalTable(spark, tmpDir("bloom") + "/t2")
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, url STRING"),
      meta = Map("prop/graft.bloomIndexColumns" -> "id,url"))
    interleaved(t)
    (0 until 800 by 37).foreach { v =>
      assert(t.readWhere(col("id") === v.toLong).count() == 1, s"lost id=$v")
      assert(t.readWhere(col("url") === s"doc-$v").count() == 1, s"lost url doc-$v")
    }
  }

  test("IN lists prune to the union of member files; non-ASCII points work") {
    val t = IncrementalTable(spark, tmpDir("bloom") + "/t3")
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, url STRING"),
      meta = Map("prop/graft.bloomIndexColumns" -> "id,url"))
    interleaved(t)
    // a 9th file with non-ASCII keys (outside the ordered-stats domain,
    // inside the bloom's — hashes carry no ordering assumption)
    t.append(Seq((10000L, "ü-doc-α"), (10001L, "ü-doc-β")).toDF("id", "url"), Nil)
    val kept = t.liveFilesWhere(col("id").isin(16L, 17L))
    assert(kept.size < 9 && kept.nonEmpty, s"kept ${kept.size}")
    assert(t.readWhere(col("id").isin(16L, 17L)).count() == 2)
    val keptS = t.liveFilesWhere(col("url") === "ü-doc-α")
    assert(keptS.size == 1, s"non-ASCII point kept ${keptS.size}")
    assert(t.readWhere(col("url") === "ü-doc-α").select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(10000L))
    // conjunction intersects point sets: provably-false conjunct drops
    // every indexed file, result still exact (empty)
    assert(t.readWhere(col("id") === 16L && col("id") === 17L).count() == 0)
  }

  test("files written before the property are conservatively kept") {
    val t = IncrementalTable(spark, tmpDir("bloom") + "/t4")
    t.append(spark.range(100).select(col("id"),
      concat(lit("doc-"), col("id")).as("url")), Nil)
    t.setProperties(Map("graft.bloomIndexColumns" -> "id"))
    t.append(spark.range(100, 200).select(col("id"),
      concat(lit("doc-"), col("id")).as("url")), Nil)
    // old files have no sidecar entry -> kept; new files prune normally
    assert(t.readWhere(col("id") === 5L).count() == 1)
    assert(t.readWhere(col("id") === 150L).count() == 1)
    val preIdx = t.liveFiles().size
    val kept = t.liveFilesWhere(col("id") === 5L)
    assert(kept.size < preIdx, "new files with a miss should have pruned")
  }

  test("compaction rewrites re-harvest: pruning keeps working on the new files") {
    val t = IncrementalTable(spark, tmpDir("bloom") + "/t5")
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, url STRING"),
      meta = Map("prop/graft.bloomIndexColumns" -> "id"))
    interleaved(t)
    t.compact(targetFiles = 2)
    assert(t.liveFiles().size <= 2)
    assert(t.readWhere(col("id") === 17L).count() == 1)
    // with 2 compacted files a single point keeps at most 1 (fpp aside)
    assert(t.liveFilesWhere(col("id") === 17L).size <= t.liveFiles().size)
    (0 until 800 by 113).foreach { v =>
      assert(t.readWhere(col("id") === v.toLong).count() == 1, s"lost id=$v post-compact")
    }
  }

  test("columnar-checkpoint path: bloom prune composes with the job-side stat prune") {
    val t = new IncrementalTable(spark, tmpDir("bloom") + "/t6",
      checkpointEvery = 3, parquetThreshold = 0)
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, url STRING"),
      meta = Map("prop/graft.bloomIndexColumns" -> "id,url"))
    interleaved(t)
    assert(t.commits().head.columnarCkpt, "not on the columnar path")
    val kept = t.liveFilesWhere(col("url") === "doc-17")
    assert(kept.size < 8 && kept.nonEmpty, s"kept ${kept.size}")
    assert(t.readWhere(col("url") === "doc-17").count() == 1)
    (0 until 800 by 97).foreach { v =>
      assert(t.readWhere(col("id") === v.toLong).count() == 1, s"lost id=$v columnar")
    }
  }

  test("vacuum reclaims sidecars of dead files, keeps live ones") {
    val t = IncrementalTable(spark, tmpDir("bloom") + "/t7")
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, url STRING"),
      meta = Map("prop/graft.bloomIndexColumns" -> "id"))
    interleaved(t)
    val fs = new Path(t.root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val idxRoot = new Path(t.root, "_graft_log/bloomidx")
    val before = fs.listStatus(idxRoot).count(_.isDirectory)
    assert(before == 8, s"$before sidecar dirs")
    // full-table replace: all 8 original files die in one commit
    t.replaceWhere(spark.range(10).select(col("id"),
      concat(lit("doc-"), col("id")).as("url")), Nil, Map.empty, Map.empty)
    // checkpoint so the window stops referencing the dead files, then
    // reclaim (cdcRetention default may still protect; force horizon)
    (1 to IncrementalTable.checkpointInterval).foreach { i =>
      t.append(spark.range(i, i + 1).select(col("id"),
        concat(lit("doc-"), col("id")).as("url")), Nil)
    }
    t.vacuum()
    val after = fs.listStatus(idxRoot).filter(_.isDirectory)
    assert(after.length < before + 101,
      s"dead sidecars not reclaimed: ${after.length}")
    // the surviving index still serves exact point lookups
    assert(t.readWhere(col("id") === 5L).count() == 2) // replace row + loop row
  }

  test("buildBloomIndex retrofits existing files; pruning fires on them") {
    val t = IncrementalTable(spark, tmpDir("bloom") + "/t8")
    interleaved(t) // 8 files, NO property at write time
    t.setProperties(Map("graft.bloomIndexColumns" -> "id,url"))
    // before the retrofit: no sidecar entries, everything kept
    assert(t.liveFilesWhere(col("id") === 17L).size == 8)
    t.buildBloomIndex()
    val kept = t.liveFilesWhere(col("id") === 17L)
    assert(kept.size < 8, s"retrofit did not enable pruning: ${kept.size}")
    assert(t.readWhere(col("id") === 17L).count() == 1)
    val keptS = t.liveFilesWhere(col("url") === "doc-33")
    assert(keptS.size < 8, s"string retrofit: ${keptS.size}")
    (0 until 800 by 61).foreach { v =>
      assert(t.readWhere(col("id") === v.toLong).count() == 1, s"lost id=$v")
      assert(t.readWhere(col("url") === s"doc-$v").count() == 1, s"lost doc-$v")
    }
  }

  test("CALL graft.system.bloom_index retrofits through the SQL front door") {
    val wh = tmpDir("bloom_wh")
    spark.conf.set("spark.sql.catalog.bidx",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bidx.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bidx.lake")
    spark.sql("CREATE TABLE bidx.lake.pts (k BIGINT, v BIGINT)")
    (0 until 4).foreach { r =>
      spark.sql("INSERT INTO bidx.lake.pts " +
        s"SELECT /*+ COALESCE(1) */ id * 4 + $r, id FROM range(0, 200)")
    }
    spark.sql("ALTER TABLE bidx.lake.pts " +
      "SET TBLPROPERTIES ('graft.bloomIndexColumns' = 'k')")
    val n = spark.sql("CALL bidx.system.bloom_index('lake.pts')")
      .head.getLong(0)
    assert(n == 4L, s"files_indexed = $n")
    val t = IncrementalTable(spark, s"$wh/lake/pts")
    assert(t.liveFilesWhere(col("k") === 9L).size < 4)
    assert(spark.sql("SELECT v FROM bidx.lake.pts WHERE k = 9")
      .head.getLong(0) == 2L)
  }

  test("BloomBits: geometry, membership, and false-positive sanity") {
    val (m, k) = BloomBits.geometry(100000L, 0.03)
    assert(m % 64 == 0 && m > 600000 && m < 800000, s"m=$m")
    assert(k >= 4 && k <= 6, s"k=$k")
    // tiny direct round-trip through the agg's primitives
    val words = new Array[Long]((BloomBits.geometry(100L, 0.01)._1 / 64).toInt)
    val mm = words.length.toLong * 64
    val kk = BloomBits.geometry(100L, 0.01)._2
    val vals = (0L until 100L).map(_ * 7919L)
    vals.foreach { v =>
      val (h1, h2) = BloomBits.hashLong(v)
      var i = 0; var h = h1
      while (i < kk) { BloomBits.setBit(words, (h & Long.MaxValue) % mm); h += h2; i += 1 }
    }
    val bytes = BloomBits.serialize(kk, words)
    vals.foreach { v =>
      val (h1, h2) = BloomBits.hashLong(v)
      assert(BloomBits.mightContain(bytes, h1, h2), s"false negative for $v")
    }
    val fps = (1L to 2000L).count { v =>
      val (h1, h2) = BloomBits.hashLong(v * 7919L + 3L)
      BloomBits.mightContain(bytes, h1, h2)
    }
    assert(fps < 2000 * 0.05, s"fp rate too high: $fps/2000")
  }
}
