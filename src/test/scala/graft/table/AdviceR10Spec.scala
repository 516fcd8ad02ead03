package graft.table

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** Pins the round-10 ADVICE fixes — all three are equality-delete
  * (X104/X105) edge paths:
  *  - restore()'s own-commit coverage is scoped to commits whose OWN
  *    carried payload has coverOwnCommit=true (only restore writes
  *    that), so a restore landing AFTER an atomic MOR upsert no longer
  *    pulls the upsert's new-version rows under the re-issued delete;
  *  - the forward OCC rule flags an eqdelete-carrying loser against a
  *    winning MOR "update" (add + dv, remove EMPTY) — previously only
  *    remove/evolve winners were tested, so the retried delete's stale
  *    baseVersion fence let the update's post-image rows escape;
  *  - fastForward's divergence check counts pure-meta eqdelete commits
  *    as divergence, same as the DV or copy-on-write spelling of the
  *    identical logical delete. */
class AdviceR10Spec extends SparkSpec {
  import spark.implicits._

  test("restore to an upsertByKey version keeps the upsert's new rows") {
    val t = IncrementalTable(spark, tmpDir("advr10") + "/ru")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), Nil) // v1
    t.upsertByKey(Seq((2L, "b2")).toDF("id", "v"), Seq("id")) // v2: eqdel+add
    val vUp = t.latestVersion
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    t.append(Seq((4L, "d")).toDF("id", "v"), Nil) // v3
    t.restore(vUp)
    // pre-fix: the restore re-issued the upsert's gen with
    // coverOwnCommit=true, and the exemption keyed on ANY commit
    // carrying the gen — the upsert's own adds (the NEW version of
    // key 2) fell out of the escape set and (2,"b2") silently vanished
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c")),
      "the upsert's new-version row must survive the restore")
    // the re-added PRE-upsert snapshot files stay covered: the OLD
    // version of key 2 must not resurrect alongside the new one
    assert(t.read().filter($"id" === 2L).count() == 1)
    // time travel through the restore stays exact in both directions
    assert(t.readAt(vUp).orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(t.readAt(vUp + 1).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // a second restore over the restored state (re-issue of a
    // re-issue) is a no-op that keeps the same logical table
    t.restore(vUp)
    assert(t.read().count() == 3)
  }

  test("OCC: eqdelete loser vs a winning MOR update fails instead of resurrecting") {
    val dir = tmpDir("advr10") + "/occ"
    val a = IncrementalTable(spark, dir)
    a.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), Nil)
    val b = IncrementalTable(spark, dir) // second handle, shared root
    // b's MOR update wins: add (post-image file) + dv, remove EMPTY —
    // the winner shape the old rule missed
    val w = b.updateVectorized($"id" === 2L, Map("v" -> lit("b2"))).get
    assert(w.action == "update" && w.remove.isEmpty && w.add.nonEmpty)
    intercept[ConcurrentWriteException] {
      // a's stale cached log fences the delete at the pre-update base;
      // retrying would let the update's post-image row (in a file
      // versioned AFTER that base) escape the delete by version order
      a.deleteByKey(Seq(Tuple1(2L)).toDF("id"), Seq("id"))
    }
    b.refresh()
    assert(b.read().filter($"id" === 2L).select("v").as[String].collect()
      .toSeq == Seq("b2"), "the losing delete must not land")
    // the standard recovery: refresh and re-run — now the delete's
    // base postdates the update, so the post-image row is covered
    a.refresh()
    a.deleteByKey(Seq(Tuple1(2L)).toDF("id"), Seq("id"))
    assert(a.read().select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L))
  }

  test("fastForward refuses a main that diverged by a pure-meta eqdelete") {
    val t = IncrementalTable(spark, tmpDir("advr10") + "/ff")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Nil)
    t.createBranch("dev")
    // the branch rewrites base-derived rows (replace semantics), then
    // main logically deletes key 2 via the O(metadata) eqdelete door —
    // no add/remove/dv on the commit, only the eqdel/ meta entry
    t.appendBranch(Seq((3L, "c")).toDF("id", "v"), "dev")
    t.deleteByKey(Seq(Tuple1(2L)).toDF("id"), Seq("id"))
    assert(t.read().select("id").as[Long].collect().toSeq == Seq(1L))
    // pre-fix: the diverged filter tested add/remove/dv/evolve only, so
    // the ff published the chain at a post-delete version — and had the
    // chain carried a rewrite of key 2's file, the row resurrected
    val e = intercept[ConcurrentWriteException](t.fastForward("dev"))
    assert(e.getMessage.contains("diverged"), e.getMessage)
    // the delete survives, the branch stays readable and droppable
    assert(t.read().select("id").as[Long].collect().sorted.toSeq == Seq(1L))
    assert(t.readBranch("dev").select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L), "branch head is fork-time state + chain")
    t.dropBranch("dev")
  }
}
