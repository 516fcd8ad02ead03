package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import graft.SparkSpec

/** The columnar (parquet) checkpoint path must be observationally
  * identical to the inline-JSON path: same reads, same pruning, same
  * dv state, same CDC, same time travel — only the storage of the
  * checkpointed live set differs. Each test drives the SAME mutation
  * script through two tables, one pinned inline
  * (`parquetThreshold = MaxValue`) and one pinned columnar
  * (`parquetThreshold = 0`), and compares every metadata surface.
  * The synthetic-log test then proves the 100× claim: a checkpoint
  * naming 100k files opens with an O(tail) log replay and prunes
  * Spark-side. */
class ColumnarCheckpointSpec extends SparkSpec {
  import spark.implicits._

  /** Inline/columnar twin tables with an aggressive checkpoint cadence
    * so every script crosses at least one compaction boundary. */
  private def twins(name: String): (IncrementalTable, IncrementalTable) = {
    val base = tmpDir(name)
    (new IncrementalTable(spark, base + "/inline", checkpointEvery = 3,
        parquetThreshold = Int.MaxValue),
      new IncrementalTable(spark, base + "/columnar", checkpointEvery = 3,
        parquetThreshold = 0))
  }

  private def onBoth(t: (IncrementalTable, IncrementalTable))(
      f: IncrementalTable => Unit): Unit = { f(t._1); f(t._2) }

  private def assertAgree(inline: IncrementalTable, colr: IncrementalTable): Unit = {
    // the columnar twin really is columnar (the head checkpoint moved
    // its live set out of the inline JSON)
    assert(colr.commits().head.columnarCkpt,
      "columnar twin's head checkpoint is still inline")
    assert(colr.commits().head.add.isEmpty && colr.commits().head.dv.isEmpty)
    def rows(t: IncrementalTable) =
      t.read().collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(rows(colr) == rows(inline))
    assert(colr.liveFiles().toSet.map(fileName) == inline.liveFiles().toSet.map(fileName))
    assert(mapNames(colr.liveDv()).keySet == mapNames(inline.liveDv()).keySet)
    assert(statNames(colr.liveFileStats()) == statNames(inline.liveFileStats()))
    val (di, dc) = (inline.detail().head, colr.detail().head)
    assert(dc.getAs[Long]("num_files") == di.getAs[Long]("num_files"))
    assert(dc.getAs[Long]("size_bytes") == di.getAs[Long]("size_bytes"))
    assert(dc.getAs[String]("partition_by") == di.getAs[String]("partition_by"))
    assert(dc.getAs[Long]("num_dv_files") == di.getAs[Long]("num_dv_files"))
  }

  // file names are UUID-random per table, so cross-table comparison
  // reduces each live set to partition-dir + count shape
  private def fileName(rel: String): String =
    rel.substring(0, rel.lastIndexOf('/') + 1)
  private def mapNames(m: Map[String, Seq[String]]): Map[String, Int] =
    m.map { case (k, v) => fileName(k) -> v.size }
  private def statNames(m: Map[String, Map[String, ColStat]]): Set[(String, Set[String])] =
    m.toSeq.map { case (f, st) => fileName(f) -> st.keySet }.toSet

  test("inline and columnar paths agree across append/replace/dv/update/compact") {
    val (inline, colr) = twins("ckpt-parity")
    val p = Seq("day")
    def batch(day: String, ids: Range) =
      ids.map(i => (i.toLong, s"w$i", day)).toDF("id", "w", "day")

    onBoth((inline, colr)) { t =>
      t.append(batch("26", 0 until 10), p, statsColumns = Seq("id"))
      t.append(batch("27", 10 until 20), p, statsColumns = Seq("id"))
      t.append(batch("28", 20 until 30), p, statsColumns = Seq("id")) // ckpt @ v2
      t.deleteVectorized(col("id") % 7 === 1)
      t.replaceWhere(batch("26", 100 until 105), p,
        Map("day" -> "26"), Map("day" -> "26"))
      t.update(col("id") === 11L, Map("w" -> org.apache.spark.sql.functions.lit("upd"))) // ckpt @ v5
      t.append(batch("29", 30 until 35), p, statsColumns = Seq("id"))
    }
    assertAgree(inline, colr)

    // data-skipping prune agrees (names differ; the pruned ROW SET must not)
    def prunedIds(t: IncrementalTable) =
      t.readWhere(col("id") >= 100L).select($"id").as[Long].collect().toSet
    assert(prunedIds(colr) == prunedIds(inline))
    // ... and the columnar prune actually skips files Spark-side
    assert(colr.liveFilesWhere(col("id") >= 100L).size < colr.liveFiles().size)

    // time travel: both paths replay the same post-checkpoint windows
    val horizon = colr.commits().head.version
    (horizon to colr.latestVersion).foreach { v =>
      def at(t: IncrementalTable) =
        t.readAt(v).select($"id", $"w").as[(Long, String)].collect().toSeq.sorted
      assert(at(colr) == at(inline), s"time travel diverged at v$v")
    }

    // CDC: net fold over the common post-horizon window agrees
    // (changes() refuses windows crossing the checkpoint itself)
    def net(t: IncrementalTable) = {
      val m = scala.collection.mutable.Map.empty[(Long, String), Int]
      t.changes(horizon + 1).select($"id", $"w", $"_change_type")
        .as[(Long, String, String)].collect().foreach { case (id, w, ct) =>
          m((id, w)) = m.getOrElse((id, w), 0) + (if (ct == "insert") 1 else -1)
        }
      m.filter(_._2 != 0).toMap
    }
    assert(net(colr) == net(inline))
  }

  test("null-count pruning agrees across inline and columnar checkpoint paths") {
    val (inline, colr) = twins("ckptnulls")
    onBoth((inline, colr)) { t =>
      t.append(Seq((1L, Some(10L)), (2L, Some(20L))).toDF("id", "v")
        .repartition(1), Nil, statsColumns = Seq("v"))
      t.append(Seq((3L, Some(30L)), (4L, Option.empty[Long])).toDF("id", "v")
        .repartition(1), Nil, statsColumns = Seq("v"))
      t.append(Seq((5L, Option.empty[Long]), (6L, Option.empty[Long])).toDF("id", "v")
        .repartition(1), Nil, statsColumns = Seq("v"))
      // one more commit pushes past checkpointEvery=3 on both twins
      t.commitMeta(Map("touch" -> "1"))
    }
    assertAgree(inline, colr)
    onBoth((inline, colr)) { t =>
      assert(t.liveFilesWhere(col("v").isNull).size == 2)
      assert(t.liveFilesWhere(col("v").isNotNull).size == 2)
      assert(t.liveFilesWhere(col("v") >= 25).size == 1)
      assert(t.readWhere(col("v").isNull).count() == 3)
      assert(t.readWhere(col("v").isNotNull).count() == 3)
    }
  }

  test("numFiles stays exact across successive columnar checkpoints (no recount job)") {
    val t = new IncrementalTable(spark, tmpDir("ckpt-count") + "/t",
      checkpointEvery = 2, parquetThreshold = 0)
    val p = Seq("day")
    (0 until 8).foreach { i =>
      t.append(Seq((i.toLong, s"d${i % 3}")).toDF("id", "day"), p)
    }
    t.delete(col("id") < 2L)
    t.compact()
    // one more append lands ON a checkpoint boundary, so the head
    // checkpoint's count reflects the final state (numFiles is a
    // checkpoint-time value, maintained arithmetically)
    t.append(Seq((8L, "d2")).toDF("id", "day"), p)
    val head = t.commits().head
    assert(head.columnarCkpt)
    assert(head.version == t.latestVersion)
    assert(head.numFiles.contains(t.liveFiles().size.toLong))
    assert(t.detail().head.getAs[Long]("num_files") == t.liveFiles().size.toLong)
  }

  test("vacuum reclaims superseded checkpoint dirs; keeps the referenced one and in-force DVs") {
    val t = new IncrementalTable(spark, tmpDir("ckpt-vac") + "/t",
      checkpointEvery = 2, parquetThreshold = 0)
    val p = Seq("day")
    (0 until 4).foreach { i =>
      t.append(Seq((i.toLong, "26")).toDF("id", "day"), p)
    }
    t.deleteVectorized(col("id") === 2L)
    (4 until 7).foreach { i => // more checkpoints supersede the first
      t.append(Seq((i.toLong, "26")).toDF("id", "day"), p)
    }
    val fs = new Path(t.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val poolDir = new Path(t.root, "_graft_log/manifests")
    def pool() = fs.listStatus(poolDir).map(_.getPath.getName).toSet
    val referenced = t.commits().head.manifests.get.map(_.name).toSet
    assert(pool().size > referenced.size,
      "script left no superseded manifests to reclaim")
    val reclaimed = t.vacuum()
    assert(reclaimed.exists(_.startsWith("_graft_log/manifests/")))
    assert(pool() == referenced,
      "vacuum must keep exactly the referenced manifests")
    // merge-on-read state survived the reclaim
    assert(t.read().select($"id").as[Long].collect().toSet ==
      (0L until 7L).toSet - 2L)
    assert(t.liveDv().nonEmpty)
  }

  test("a 100k-file synthetic columnar log opens O(tail) and prunes Spark-side") {
    implicit val fmts: Formats = DefaultFormats
    val root = new Path(tmpDir("ckpt-big") + "/t")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(root, "_graft_log")
    fs.mkdirs(logDir)

    // 100k live-file rows, each covering an id decade — written straight
    // to the checkpoint parquet, no data files behind them (metadata
    // operations never open data files)
    val n = 100000L
    val ckptVersion = 100000L
    val dirName = f"$ckptVersion%010d.checkpoint.parquet"
    spark.range(n).select(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("day=26/part-"),
          col("id"), org.apache.spark.sql.functions.lit(".parquet")).as("file"),
        org.apache.spark.sql.functions.lit(100L).as("size"),
        org.apache.spark.sql.functions.map(
          org.apache.spark.sql.functions.lit("id"),
          org.apache.spark.sql.functions.struct(
            (col("id") * 10L).as("min"), (col("id") * 10L + 9L).as("max"),
            org.apache.spark.sql.functions.lit(null).cast("string").as("minS"),
            org.apache.spark.sql.functions.lit(null).cast("string").as("maxS"))).as("stats"),
        org.apache.spark.sql.functions.array().cast("array<string>").as("dvGens"))
      .repartition(4).write.parquet(new Path(logDir, dirName).toString)

    // Commit.schemaJson holds the schema's DDL rendering (what write()
    // commits via mergedSchema(...).toDDL)
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.StringType))).toDDL
    def writeCommit(c: Commit, name: String): Unit = {
      val out = fs.create(new Path(logDir, name), false)
      try out.write(Serialization.write(c).getBytes("UTF-8")) finally out.close()
    }
    writeCommit(Commit(ckptVersion, "checkpoint", Nil, Nil, Map.empty,
      Seq("day"), schemaJson, Map.empty, None, 1L,
      filesParquet = Some(dirName), numFiles = Some(n)),
      f"$ckptVersion%010d.checkpoint.json")
    // a real tail: remove one base file, add one (with stats + a backing
    // file so detail() can size it)
    val extra = "day=26/extra.parquet"
    val out = fs.create(new Path(root, extra), false)
    try out.write(Array.fill(10)(0.toByte)) finally out.close()
    writeCommit(Commit(ckptVersion + 1, "append", Seq(extra),
      Seq("day=26/part-0.parquet"), Map.empty, Seq("day"), schemaJson,
      Map.empty, None, 2L,
      fileStats = Map(extra -> Map("id" -> ColStat(5L, 5L)))),
      f"${ckptVersion + 1}%010d.json")

    val t = new IncrementalTable(spark, root.toString,
      checkpointEvery = 1000, parquetThreshold = 0)
    // O(tail) open: the replayed log is two records, not 100k adds
    assert(t.commits().size == 2)
    assert(t.commits().head.add.isEmpty)
    // the selective prune returns survivors only — part-0 (the only base
    // file whose [0,9] range meets id<=5) was removed by the tail, so
    // exactly the tail add comes back out of 100k candidates
    assert(t.liveFilesWhere(col("id") <= 5L) == Seq(extra))
    val top = t.liveFilesWhere(col("id") >= (n - 1) * 10L)
    assert(top == Seq(s"day=26/part-${n - 1}.parquet"))
    // the census never folds 100k names on the driver, but the count is
    // still exact: base - 1 removed + 1 added
    assert(t.detail().head.getAs[Long]("num_files") == n)
  }
}
