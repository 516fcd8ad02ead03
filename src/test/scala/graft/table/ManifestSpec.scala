package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import graft.SparkSpec

/** Manifest-list checkpoint tier (VERDICT r10 #4): checkpoints store
  * live rows in immutable pool manifests with file-path ranges, so
  *  - a checkpoint REWRITES only the manifests its tail window dirtied
  *    (write cost scales with the changed subset — asserted by pool
  *    file-write counts, the verdict's done-criterion);
  *  - readers prune whole manifest FILES by partition prefix before
  *    any row is scanned;
  *  - legacy single-directory checkpoints migrate on their next
  *    checkpoint and stay readable until then;
  *  - fragmentation is bounded: small tail manifests fold together
  *    when the list outgrows ~4x the ideal. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def pool(t: IncrementalTable): Set[String] = {
    val fs = new Path(t.root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(t.root, "_graft_log/manifests")
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(_.getPath.getName).toSet
  }

  private def headMs(t: IncrementalTable): Seq[ManifestRef] =
    t.commits().head.manifests.getOrElse(
      fail(s"head checkpoint of ${t.root} is not manifest-based"))

  private def batch(day: String, ids: Range) =
    ids.map(i => (i.toLong, s"w$i", day)).toDF("id", "w", "day")

  test("checkpoint rewrite cost scales with the dirty subset, not the table") {
    val t = new IncrementalTable(spark, tmpDir("mani") + "/t",
      checkpointEvery = 2, parquetThreshold = 0, manifestTargetRows = 4)
    // 5 partitions x 4 files (one file per append through the
    // dir-clustered write choke point); meta commits land a checkpoint
    // boundary covering the full live set
    for (d <- Seq("a", "b", "c", "d", "e"); j <- 0 until 4)
      t.append(batch(d, (j * 2) until (j * 2 + 2)), Seq("day"))
    t.commitMeta(Map("touch" -> "1"))
    t.commitMeta(Map("touch" -> "1b"))
    val nLive = t.liveFiles().size.toLong
    assert(nLive >= 15L, s"need enough files for several manifests: $nLive")
    val m1 = headMs(t)
    assert(m1.size >= 3, s"need several manifests to observe reuse: $m1")
    assert(m1.map(_.n).sum == nLive)
    val pool1 = pool(t)

    // touch ONLY day=e (one partition): replace it, cross a checkpoint
    t.replaceWhere(batch("e", 100 until 104), Seq("day"),
      Map("day" -> "e"), Map("day" -> "e"))
    t.commitMeta(Map("touch" -> "2"))
    t.commitMeta(Map("touch" -> "3"))
    val m2 = headMs(t)
    val reused = m2.map(_.name).toSet & m1.map(_.name).toSet
    val fresh = m2.map(_.name).toSet -- m1.map(_.name).toSet
    assert(reused.size >= 2,
      s"untouched partitions' manifests must carry over by reference: " +
        s"reused=$reused of ${m1.size}")
    assert(fresh.size <= 2,
      s"a one-partition change must not rewrite the table's manifests: $fresh")
    // the POOL grew by exactly the fresh manifests (write counts — the
    // verdict's done-criterion)
    assert(pool(t) -- pool1 == fresh)
    // correctness through the folded state
    assert(t.read().count() == 36) // 4 days x 8 rows + 4 replaced rows
    assert(t.read().filter($"day" === "e").select($"id").as[Long]
      .collect().sorted.toSeq == (100L until 104L).toSeq)
    assert(m2.map(_.n).sum == t.liveFiles().size.toLong)
    assert(t.detail().head.getAs[Long]("num_files") ==
      t.liveFiles().size.toLong)
  }

  test("readers prune whole manifests by partition prefix") {
    val t = new IncrementalTable(spark, tmpDir("mani") + "/p",
      checkpointEvery = 2, parquetThreshold = 0, manifestTargetRows = 4)
    for (d <- Seq("a", "b", "c", "d"); j <- 0 until 4)
      t.append(batch(d, (j * 2) until (j * 2 + 2)), Seq("day"))
    t.commitMeta(Map("t" -> "1"))
    t.commitMeta(Map("t" -> "2"))
    val ms = headMs(t)
    assert(ms.size >= 3)
    // the pruning decision itself (pure metadata): a pinned leading
    // partition keeps only range-overlapping manifests
    val kept = t.manifestPrune(ms, Map("day" -> "a"), Seq("day"))
    assert(kept.size < ms.size,
      s"day=a must not consult every manifest (${kept.size} of ${ms.size})")
    assert(kept.forall(m => m.lo <= "day=a/\uffff" && m.hi >= "day=a/"))
    // soundness: the pruned read still answers exactly
    assert(t.liveFiles(Map("day" -> "a")).size == t.liveFiles().size / 4)
    assert(t.read(Map("day" -> "a")).count() == 8)
    // non-leading / absent filters fall back to all manifests
    assert(t.manifestPrune(ms, Map.empty, Seq("day")) == ms)
    assert(t.manifestPrune(ms, Map("other" -> "x"), Seq("day")) == ms)
  }

  test("prune keeps non-prefix-shaped manifests (clones, evolved specs)") {
    val t = new IncrementalTable(spark, tmpDir("mani") + "/shape",
      checkpointEvery = 2, parquetThreshold = 0, manifestTargetRows = 4)
    def m(name: String, lo: String, hi: String) = ManifestRef(name, lo, hi, 2)
    // X78: shallow-cloned foreign files carry ABSOLUTE paths — they
    // sort below every "day=…" path but still match the row filter
    val abs = m("abs", "/src/day=a/p1.parquet", "/src/day=a/p2.parquet")
    // X81: a file written under an earlier spec can carry the pinned
    // token in a NON-LEADING position
    val reorder = m("re", "hour=1/day=a/x.parquet", "hour=9/day=a/y.parquet")
    // a manifest MIXING shaped and foreign rows has a foreign bound
    val mixed = m("mix", "/src/day=a/z.parquet", "day=b/f.parquet")
    val shapedIn = m("in", "day=a/f1.parquet", "day=a/f9.parquet")
    val shapedOut = m("out", "day=b/f1.parquet", "day=c/f9.parquet")
    val all = Seq(abs, reorder, mixed, shapedIn, shapedOut)
    val kept = t.manifestPrune(all, Map("day" -> "a"), Seq("day"))
    assert(kept.map(_.name).toSet == Set("abs", "re", "mix", "in"),
      s"non-prefix shapes must be KEPT, shaped-disjoint pruned: $kept")
    // multi-key descent: inside day=a the hour range prunes too — but
    // only for manifests whose bounds verify the hour shape
    val h1 = m("h1", "day=a/hour=1/x.parquet", "day=a/hour=3/y.parquet")
    val h2 = m("h2", "day=a/hour=7/x.parquet", "day=a/hour=9/y.parquet")
    val straddle = m("st", "day=a/hour=1/x.parquet", "day=b/hour=1/y.parquet")
    val odd = m("odd", "day=a/extra/hour=5/x.parquet", "day=a/hour=2/y.parquet")
    val kept2 = t.manifestPrune(Seq(h1, h2, straddle, odd, abs),
      Map("day" -> "a", "hour" -> "8"), Seq("day", "hour"))
    assert(kept2.map(_.name).toSet == Set("h2", "st", "odd", "abs"),
      s"hour descent must prune h1 only: $kept2")
    // ADVICE r12: the upper sentinel must be U+10FFFF, not U+FFFF — a
    // path continuing "day=a/" with an ASTRAL code point (e.g. a
    // file/key segment starting with U+10000+) sorts ABOVE
    // "day=a/\uffff" in code point order, so the smaller sentinel
    // wrongly pruned a manifest whose rows match the filter
    val astral = m("astral",
      "day=a/\ud800\udc00seg/x.parquet", "day=a/\ud800\udc00seg/y.parquet")
    val keptAstral = t.manifestPrune(Seq(astral, shapedOut),
      Map("day" -> "a"), Seq("day"))
    assert(keptAstral.map(_.name) == Seq("astral"),
      s"astral continuation of the filtered prefix must be KEPT: $keptAstral")
  }

  test("evolved-spec metadata reads through manifests keep old-layout files") {
    // end-to-end X81: files written before evolvePartitioning carry the
    // pinned token in a NON-LEADING position ("hour=…/day=…"); a
    // token-filtered metadata read through a manifest-tier checkpoint
    // must still surface them (the naive range prune dropped their
    // manifests — ADVICE r11 high)
    val t = new IncrementalTable(spark, tmpDir("mani") + "/evo",
      checkpointEvery = 2, parquetThreshold = 0, manifestTargetRows = 2)
    val rows = (0 until 8).map(i => (i.toLong, s"w$i", s"d${i % 2}", s"h${i % 4}"))
      .toDF("id", "w", "day", "hour")
    t.append(rows, Seq("hour", "day"))    // old spec: hour leads
    t.evolvePartitioning(Seq("day", "hour")) // new spec: day leads
    t.append(rows.withColumn("id", $"id" + 100), Seq("day", "hour"))
    t.commitMeta(Map("t" -> "1")); t.commitMeta(Map("t" -> "2"))
    assert(t.commits().head.manifests.exists(_.nonEmpty),
      "test needs a manifest-tier checkpoint")
    // BOTH generations encode day= (so the uniform-spec gate passes);
    // the old generation's paths lead with hour= and would sort outside
    // the "day=d1/" range — they must survive the manifest prune
    val files = t.liveFiles(Map("day" -> "d1"))
    val shapes = files.map(f =>
      IncrementalTable.hiveSegments(f).keySet).toSet
    assert(shapes == Set(Set("day", "hour")), s"shapes: $shapes")
    val oldGen = files.count(_.startsWith("hour="))
    val newGen = files.count(_.startsWith("day="))
    assert(oldGen > 0 && newGen > 0 && oldGen + newGen == files.size,
      s"old-layout files dropped by the manifest prune: $files")
    // and the predicate read door stays exact over the mixed window
    assert(t.readWhere($"day" === "d1").select($"id").as[Long]
      .collect().sorted.toSeq ==
      Seq(1L, 3L, 5L, 7L, 101L, 103L, 105L, 107L))
  }

  test("legacy single-directory checkpoints stay readable and migrate") {
    implicit val fmts: Formats = DefaultFormats
    val root = new Path(tmpDir("mani") + "/legacy")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(root, "_graft_log")
    fs.mkdirs(logDir)
    // a v2 legacy checkpoint whose rows live in ONE parquet directory
    val dirName = "0000000002.checkpoint.parquet"
    val files = (0 until 6).map(i => s"day=a/part-$i.parquet")
    files.foreach { f =>
      val out = fs.create(new Path(root, f), false)
      try out.write(Array.fill(4)(0.toByte)) finally out.close()
    }
    files.map(f => (f, 4L,
        Map.empty[String, IncrementalTable.CkptStatRow], Seq.empty[String]))
      .toDF("file", "size", "stats", "dvGens")
      .coalesce(1).write.parquet(new Path(logDir, dirName).toString)
    val schemaDdl = "id BIGINT, day STRING"
    def writeCommit(c: Commit, name: String): Unit = {
      val out = fs.create(new Path(logDir, name), false)
      try out.write(Serialization.write(c).getBytes("UTF-8")) finally out.close()
    }
    writeCommit(Commit(2, "checkpoint", Nil, Nil, Map.empty, Seq("day"),
      schemaDdl, Map.empty, None, 1L, filesParquet = Some(dirName),
      numFiles = Some(6L)), "0000000002.checkpoint.json")
    val t = new IncrementalTable(spark, root.toString,
      checkpointEvery = 2, parquetThreshold = 0, manifestTargetRows = 4)
    assert(t.commits().head.filesParquet.isDefined)
    assert(t.liveFiles().size == 6) // legacy read path
    // two more commits cross the next boundary: the new checkpoint is
    // manifest-based (full migration rewrite), same live set
    t.append(batch("b", 0 until 2), Seq("day"))
    t.append(batch("b", 2 until 4), Seq("day"))
    t.refresh()
    val head = t.commits().head
    assert(head.manifests.isDefined && head.filesParquet.isEmpty,
      s"migration checkpoint still legacy: $head")
    assert(t.liveFiles().size == 6 + t.liveFiles(Map("day" -> "b")).size)
    assert(headMs(t).map(_.n).sum == t.liveFiles().size.toLong)
  }

  test("emptying the table checkpoints to zero manifests; fragmentation folds") {
    val t = new IncrementalTable(spark, tmpDir("mani") + "/frag",
      checkpointEvery = 1, parquetThreshold = 0, manifestTargetRows = 4)
    // checkpointEvery=1: EVERY commit checkpoints, so each append adds
    // a fresh tail manifest — fragmentation pressure by construction
    (0 until 12).foreach { i =>
      t.append(batch("a", (i * 2) until (i * 2 + 2)), Seq("day"))
    }
    val ms = headMs(t)
    val nLive = t.liveFiles().size.toLong
    val ideal = math.max(1L, (nLive + 3L) / 4L)
    assert(ms.size <= math.max(8L, 4L * ideal),
      s"fragmentation unbounded: ${ms.size} manifests for $nLive files")
    assert(ms.map(_.n).sum == nLive)
    assert(t.read().count() == 24)
    // empty the table; the next checkpoint carries zero manifests but
    // stays columnar (the live set IS columnar, with zero rows)
    t.delete(org.apache.spark.sql.functions.lit(true))
    t.refresh()
    val head = t.commits().head
    assert(head.action == "checkpoint" && head.manifests.contains(Nil),
      s"empty-table checkpoint: $head")
    assert(t.read().count() == 0 && t.liveFiles().isEmpty)
    assert(t.detail().head.getAs[Long]("num_files") == 0L)
    // and the pool reclaims down to nothing referenced
    t.vacuum()
    assert(pool(t).isEmpty)
  }

  test("the t.manifests metadata table surfaces checkpoint health via SQL") {
    val wh = tmpDir("mani_wh")
    spark.conf.set("spark.sql.catalog.mcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcat.ns")
    val t = new IncrementalTable(spark, s"$wh/ns/mm",
      checkpointEvery = 2, parquetThreshold = 0, manifestTargetRows = 4)
    for (d <- Seq("a", "b"); j <- 0 until 3)
      t.append(batch(d, (j * 2) until (j * 2 + 2)), Seq("day"))
    t.commitMeta(Map("t" -> "1"))
    t.commitMeta(Map("t" -> "2"))
    val rows = spark.sql(
      "SELECT manifest, lo, hi, n_files FROM mcat.ns.mm.manifests")
      .as[(String, String, String, Long)].collect().toSeq
    val want = t.manifestList().map(m => (m.name, m.lo, m.hi, m.n))
      .sortBy(r => (r._2, r._1))
    assert(rows == want, s"sql door $rows != library $want")
    assert(rows.nonEmpty && rows.map(_._4).sum == t.liveFiles().size.toLong)
  }

  test("rewrite_manifests folds the list compactly; vacuum reclaims the old pool") {
    val t = new IncrementalTable(spark, tmpDir("mani") + "/rw",
      checkpointEvery = 1, parquetThreshold = 0, manifestTargetRows = 50)
    // cadence-1 checkpoints: every append adds a tail manifest — the
    // fragmentation rewrite_manifests exists to fold
    (0 until 7).foreach { i =>
      t.append(batch("a", (i * 2) until (i * 2 + 2)), Seq("day"))
    }
    val before = headMs(t)
    assert(before.size > 1, s"no fragmentation to fold: $before")
    val rows = t.read().collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    val after = t.rewriteManifests()
    assert(after.size < before.size,
      s"rewrite must compact: ${after.size} vs ${before.size}")
    assert(after.map(_.n).sum == before.map(_.n).sum)
    assert(headMs(t) == after, "the forced checkpoint is the head")
    assert(t.read().collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
      == rows, "rewrite is metadata-only")
    t.vacuum()
    assert(pool(t) == after.map(_.name).toSet,
      "vacuum must reclaim the superseded pool files")
    // SQL front door
    val wh2 = tmpDir("mani_wh2")
    spark.conf.set("spark.sql.catalog.mcat2",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mcat2.warehouse", wh2)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcat2.ns")
    val t2 = new IncrementalTable(spark, s"$wh2/ns/rw",
      checkpointEvery = 1, parquetThreshold = 0, manifestTargetRows = 50)
    (0 until 5).foreach { i =>
      t2.append(batch("a", (i * 2) until (i * 2 + 2)), Seq("day"))
    }
    val out = spark.sql(
      "CALL mcat2.system.rewrite_manifests('ns.rw')").collect()
    t2.refresh()
    assert(out(0).getInt(0) == t2.manifestList().size)
    assert(out(0).getLong(1) == t2.liveFiles().size.toLong)
  }
}
