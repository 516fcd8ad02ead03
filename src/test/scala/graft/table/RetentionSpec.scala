package graft.table

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Age-based retention verbs (VERDICT r11 #2):
  *  - `expireSnapshots(olderThanHours)` deletes archived delta records
  *    older than the cutoff — never past a tag, a live branch base, the
  *    CDC retention window, or the replay horizon — keeping the floor
  *    checkpoint as the archived-replay seed, so still-reachable
  *    answers never change while aged-out versions fail loudly with an
  *    error NAMING the retention;
  *  - `vacuum(olderThanHours)` leaves reclaim candidates younger than
  *    the grace in place (the in-flight-reader allowance). */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(t: IncrementalTable) =
    new Path(t.root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(t: IncrementalTable): Set[String] = {
    val fs = fsOf(t)
    def walk(p: Path): Seq[String] =
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) {
          if (st.getPath.getName.startsWith("_")) Nil else walk(st.getPath)
        } else if (st.getPath.getName.endsWith(".parquet"))
          Seq(st.getPath.toString)
        else Nil
      }
    walk(new Path(t.root)).toSet
  }

  private def batch(ids: Range) = ids.map(i => (i.toLong, s"w$i")).toDF("id", "w")

  test("vacuum grace keeps young candidates; grace 0 reclaims them") {
    val t = new IncrementalTable(spark, tmpDir("ret") + "/grace",
      checkpointEvery = 2, parquetThreshold = 0)
    t.append(batch(0 until 4), Nil)
    val before = dataFiles(t)
    // replace everything, then cross a checkpoint so the old files'
    // add-commits fold away — they become pure reclaim candidates
    t.replaceWhere(batch(100 until 104), Nil, Map.empty, Map.empty)
    t.commitMeta(Map("x" -> "1")); t.commitMeta(Map("x" -> "2"))
    val doomed = before -- dataFiles(t).filter(f =>
      t.liveFiles().exists(lf => f.endsWith(lf)))
    assert(doomed.nonEmpty)
    // a 1-hour grace: the seconds-old candidates survive
    val keptRun = t.vacuum(olderThanHours = 1.0)
    assert(keptRun.isEmpty, s"grace must keep young candidates: $keptRun")
    assert(doomed.forall(f => fsOf(t).exists(new Path(f))),
      "young candidates must stay on disk under the grace")
    // strict reclaim removes them
    val reclaimed = t.vacuum()
    assert(reclaimed.nonEmpty)
    assert(doomed.forall(f => !fsOf(t).exists(new Path(f))))
    assert(t.read().select($"id").as[Long].collect().sorted.toSeq ==
      (100L until 104L).toSeq)
  }

  test("expire_snapshots ages out history; young reads survive; error names it") {
    val t = new IncrementalTable(spark, tmpDir("ret") + "/exp",
      checkpointEvery = 2, parquetThreshold = 0)
    // v0..v5: three append+replace rounds crossing several checkpoints
    t.append(batch(0 until 4), Nil)                                  // v0
    t.commitMeta(Map("r" -> "1"))                                    // v1 (ckpt@1? cadence 2 -> ckpt at v2,v4)
    t.replaceWhere(batch(10 until 14), Nil, Map.empty, Map.empty)    // v2
    t.commitMeta(Map("r" -> "2"))                                    // v3
    t.replaceWhere(batch(20 until 24), Nil, Map.empty, Map.empty)    // v4
    t.commitMeta(Map("r" -> "3"))                                    // v5
    val head = t.latestVersion
    val ckptHead = t.commits().head.version
    assert(ckptHead > 0, "test needs a checkpointed head")
    val filesBefore = dataFiles(t)
    // nothing is older than -1h in the future direction: a huge cutoff
    // expires nothing
    assert(t.expireSnapshots(olderThanHours = 1e6) == (-1L, 0L))
    // cutoff "now": every record qualifies; floor = the replay horizon
    val (floor, n) = t.expireSnapshots(olderThanHours = 0.0)
    assert(floor == ckptHead, s"floor $floor != replay horizon $ckptHead")
    assert(n > 0)
    // young versions (inside the replay window) still read exactly
    assert(t.readAt(t.latestVersion).count() == 4)
    assert(t.read().select($"id").as[Long].collect().sorted.toSeq ==
      (20L until 24L).toSeq)
    // aged-out versions fail LOUDLY, naming the retention verb
    val e = intercept[IllegalArgumentException](t.readAt(0))
    assert(e.getMessage.contains("expire_snapshots"), e.getMessage)
    assert(e.getMessage.contains("older_than_hours"), e.getMessage)
    // expired-only data files reclaim on the next vacuum
    t.vacuum()
    val filesAfter = dataFiles(t)
    assert(filesAfter.size < filesBefore.size,
      s"expired snapshots' files must reclaim: ${filesAfter.size} vs ${filesBefore.size}")
    assert(t.read().select($"id").as[Long].collect().sorted.toSeq ==
      (20L until 24L).toSeq)
    assert(head == t.latestVersion - 1 || head <= t.latestVersion,
      "expiry's props commit is a normal version advance")
  }

  test("tags pin history: expiry stops at the pinned floor and the tag stays readable") {
    val t = new IncrementalTable(spark, tmpDir("ret") + "/tags",
      checkpointEvery = 2, parquetThreshold = 0)
    t.append(batch(0 until 4), Nil)                                  // v0
    t.commitMeta(Map("r" -> "1"))                                    // v1
    t.replaceWhere(batch(10 until 14), Nil, Map.empty, Map.empty)    // v2 (ckpt)
    val pinned = t.latestVersion
    t.setTag("train-run", pinned)
    t.commitMeta(Map("r" -> "2"))
    t.replaceWhere(batch(20 until 24), Nil, Map.empty, Map.empty)
    t.commitMeta(Map("r" -> "3"))
    val (floor, _) = t.expireSnapshots(olderThanHours = 0.0)
    assert(floor <= pinned, s"expiry must not pass the tag: $floor > $pinned")
    t.vacuum()
    // the tagged snapshot replays from the floor seed, exactly
    assert(t.readAt(pinned).select($"id").as[Long].collect().sorted.toSeq ==
      (10L until 14L).toSeq)
    // dropping the tag unpins: a second expiry moves the floor past it
    t.dropTag("train-run")
    val (floor2, _) = t.expireSnapshots(olderThanHours = 0.0)
    assert(floor2 > floor, s"unpinned expiry must advance: $floor2 <= $floor")
    intercept[IllegalArgumentException](t.readAt(pinned))
  }

  test("CDC retention bounds expiry; post-expiry changes() stay exact") {
    val t = new IncrementalTable(spark, tmpDir("ret") + "/cdc",
      checkpointEvery = 2, parquetThreshold = 0, cdcRetention = 3)
    t.append(batch(0 until 4), Nil)                                  // v0
    t.commitMeta(Map("r" -> "1"))                                    // v1
    t.replaceWhere(batch(10 until 14), Nil, Map.empty, Map.empty)    // v2
    t.commitMeta(Map("r" -> "2"))                                    // v3
    t.append(batch(30 until 32), Nil)                                // v4
    t.commitMeta(Map("r" -> "3"))                                    // v5
    val latest = t.latestVersion
    // the expiry's own props commit advances the version by one, and the
    // CDC retention window is relative to the CURRENT version — leave
    // one commit of slack so the window stays inside retention after it
    val winFrom = latest - 2
    val before = t.changes(winFrom, latest)
      .select($"id", $"_change_type").collect().map(_.toSeq).toSet
    val (floor, _) = t.expireSnapshots(olderThanHours = 0.0)
    assert(floor <= latest - 2, s"expiry must not eat the CDC window: $floor")
    val after = t.changes(winFrom, latest)
      .select($"id", $"_change_type").collect().map(_.toSeq).toSet
    assert(after == before, "a CDC window inside retention must not change")
  }

  test("vacuum dry run lists the exact reclaim set without touching disk") {
    val t = new IncrementalTable(spark, tmpDir("ret") + "/dry",
      checkpointEvery = 2, parquetThreshold = 0)
    t.append(batch(0 until 4), Nil)
    t.replaceWhere(batch(100 until 104), Nil, Map.empty, Map.empty)
    t.commitMeta(Map("x" -> "1")); t.commitMeta(Map("x" -> "2"))
    val before = dataFiles(t)
    val version = t.latestVersion
    val predicted = t.vacuum(dryRun = true)
    assert(predicted.nonEmpty)
    // nothing deleted, no maintenance commit landed
    assert(dataFiles(t) == before, "dry run must not delete")
    t.refresh()
    assert(t.latestVersion == version, "dry run must not commit")
    // the real run reclaims exactly what the dry run predicted
    val real = t.vacuum()
    assert(real.toSet == predicted.toSet,
      s"dry run must equal the real reclaim: $predicted vs $real")
    assert(t.read().count() == 4)
  }

  test("SQL doors: CALL expire_snapshots / vacuum(older_than_hours)") {
    val wh = tmpDir("ret_wh")
    spark.conf.set("spark.sql.catalog.rcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rcat.ns")
    val t = new IncrementalTable(spark, s"$wh/ns/rt",
      checkpointEvery = 2, parquetThreshold = 0)
    t.append(batch(0 until 4), Nil)
    t.commitMeta(Map("r" -> "1"))
    t.replaceWhere(batch(10 until 14), Nil, Map.empty, Map.empty)
    t.commitMeta(Map("r" -> "2"))
    t.commitMeta(Map("r" -> "3"))
    // a graced vacuum reclaims nothing seconds after the rewrite
    val v0 = spark.sql(
      "CALL rcat.system.vacuum('ns.rt', older_than_hours => 1.0)").collect()
    assert(v0(0).getInt(0) == 0)
    val out = spark.sql(
      "CALL rcat.system.expire_snapshots('ns.rt', older_than_hours => 0.0)")
      .collect()
    t.refresh()
    assert(out(0).getLong(0) == t.commits().head.version ||
      out(0).getLong(0) > 0)
    assert(out(0).getLong(1) > 0)
    val v1 = spark.sql("CALL rcat.system.vacuum('ns.rt')").collect()
    assert(v1(0).getInt(0) > 0, "strict vacuum reclaims the expired files")
    assert(t.read().count() == 4)
  }

  test("a pending WAP pins expiry: the staged record survives and still publishes (ADVICE r12)") {
    val t = new IncrementalTable(spark, tmpDir("ret") + "/wap",
      checkpointEvery = 2, parquetThreshold = 0)
    t.append(batch(0 until 4), Nil)                                  // v0
    t.commitMeta(Map("r" -> "1"))                                    // v1
    t.replaceWhere(batch(10 until 14), Nil, Map.empty, Map.empty)    // v2 (ckpt)
    t.commitMeta(Map("r" -> "2"))                                    // v3
    t.stageAppend(batch(50 until 54), "audit-1")                     // v4 (staged)
    val staged = t.latestVersion
    t.commitMeta(Map("r" -> "3"))                                    // v5
    t.replaceWhere(batch(20 until 24), Nil, Map.empty, Map.empty)    // v6 (ckpt)
    t.commitMeta(Map("r" -> "4"))                                    // v7
    // cutoff "now": every record is old enough, but the floor must stop
    // STRICTLY below the pending staging — publishWap's evolve-conflict
    // anchor scan needs the raw `staged` record, which the checkpoint
    // fold does not preserve (only the folded channel value)
    val (floor, n) = t.expireSnapshots(olderThanHours = 0.0)
    assert(floor >= 0 && n > 0, s"expiry must still make progress: ($floor, $n)")
    assert(floor < staged,
      s"floor $floor must stay below the pending staging at $staged")
    // the pending WAP is intact AND publishable after the expiry
    assert(t.pendingWaps.contains("audit-1"))
    val c = t.publishWap("audit-1")
    assert(c.add.nonEmpty)
    assert(t.read().select($"id").as[Long].collect().sorted.toSeq ==
      ((20L until 24L) ++ (50L until 54L)).sorted.toSeq)
    // once published, the pin lifts: a later expiry advances past it
    t.commitMeta(Map("r" -> "5")); t.commitMeta(Map("r" -> "6"))
    val (floor2, _) = t.expireSnapshots(olderThanHours = 0.0)
    assert(floor2 > floor, s"published WAP must unpin expiry: $floor2 <= $floor")
  }
}
