package graft.table

import graft.SparkSpec

/** X107 — multi-table atomic publish: write-ahead intent + per-child
  * WAP publish. The crash matrix the verdict asked for:
  *  - crash BETWEEN child publishes (intent decided): recovery
  *    re-drives the remaining children, never re-publishes a done one,
  *    and the recovery-gated door ([[MultiPublish.openAll]]) can never
  *    hand out a torn set;
  *  - crash BEFORE the intent: nothing was decided — recovery is a
  *    no-op, abort retires the orphan stagings, readers never saw a
  *    row;
  *  - decided intents refuse abort (some children may be visible). */
class MultiPublishSpec extends SparkSpec {
  import spark.implicits._

  private def seedPair(base: String): (IncrementalTable, IncrementalTable) = {
    val a = IncrementalTable(spark, s"$base/processed")
    val b = IncrementalTable(spark, s"$base/backwards")
    a.append(Seq((1L, "one"), (2L, "two")).toDF("id", "v"), Nil)
    b.append(Seq((1L, "eno"), (2L, "owt")).toDF("id", "v"), Nil)
    (a, b)
  }

  test("happy path: one decision publishes both tables; intent finalizes") {
    val base = tmpDir("mpub")
    val (a, b) = seedPair(base)
    val mp = new MultiPublish(spark, s"$base/_publish")
    a.stageAppend(Seq((3L, "three")).toDF("id", "v"), "p1")
    b.stageAppend(Seq((3L, "eerht")).toDF("id", "v"), "p1")
    assert(a.read().count() == 2 && b.read().count() == 2, "staged = invisible")
    val cs = mp.publish("p1", Seq(a, b))
    assert(cs.size == 2)
    assert(a.read().count() == 3 && b.read().count() == 3)
    assert(mp.pendingIntents.isEmpty, "publish must finalize its intent")
    // publishing without a staging refuses up front
    intercept[IllegalArgumentException](mp.publish("p2", Seq(a, b)))
  }

  test("crash between children: recovery re-drives; gated door is never torn") {
    val base = tmpDir("mpub")
    val (a, b) = seedPair(base)
    val mp = new MultiPublish(spark, s"$base/_publish")
    a.stageAppend(Seq((3L, "three")).toDF("id", "v"), "p1")
    b.stageAppend(Seq((3L, "eerht")).toDF("id", "v"), "p1")
    // the decision lands, then the process dies after child 0 (a)
    mp.writeIntent(PublishIntent("p1", Seq(a.root, b.root)))
    intercept[IllegalStateException](
      mp.publishChildren("p1", Seq(a, b), failAfter = 1))
    a.refresh(); b.refresh()
    assert(a.read().count() == 3 && b.read().count() == 2,
      "mid-crash: a published, b not — the window recovery closes")
    // a decided publish refuses abort — it must complete, not unwind
    // (the refusal comes from LOSING the intent-slot race, not from a
    // racy exists-check)
    intercept[IllegalStateException](mp.abort("p1", Seq(a, b)))
    // a NEW coordinator (the restarted process) sees and re-drives it
    val mp2 = new MultiPublish(spark, s"$base/_publish")
    assert(mp2.pendingIntents.map(_.id) == Seq("p1"))
    val Seq(a2, b2) = mp2.openAll(Seq(a.root, b.root))
    assert(a2.read().count() == 3 && b2.read().count() == 3,
      "the recovery-gated door must never return a torn set")
    assert(mp2.pendingIntents.isEmpty)
    // idempotent: a second recovery run finds nothing to do
    assert(mp2.recover().isEmpty)
  }

  test("crash before the intent: presumed abort — stagings retire, no rows leak") {
    val base = tmpDir("mpub")
    val (a, b) = seedPair(base)
    val mp = new MultiPublish(spark, s"$base/_publish")
    a.stageAppend(Seq((3L, "three")).toDF("id", "v"), "p1")
    b.stageAppend(Seq((3L, "eerht")).toDF("id", "v"), "p1")
    // process died before writeIntent: recovery has nothing decided
    assert(mp.recover().isEmpty)
    assert(a.read().count() == 2 && b.read().count() == 2)
    mp.abort("p1", Seq(a, b))
    assert(a.pendingWaps.isEmpty && b.pendingWaps.isEmpty)
    assert(a.read().count() == 2 && b.read().count() == 2)
    // the id is reusable after the abort (clean cycle close)
    a.stageAppend(Seq((4L, "four")).toDF("id", "v"), "p1")
    b.stageAppend(Seq((4L, "ruof")).toDF("id", "v"), "p1")
    mp.publish("p1", Seq(a, b))
    assert(a.read().count() == 3 && b.read().count() == 3)
  }

  test("two coordinators racing one id: exactly one decision wins the slot") {
    val base = tmpDir("mpub")
    val (a, b) = seedPair(base)
    a.stageAppend(Seq((3L, "three")).toDF("id", "v"), "p1")
    b.stageAppend(Seq((3L, "eerht")).toDF("id", "v"), "p1")
    val mpA = new MultiPublish(spark, s"$base/_publish")
    val mpB = new MultiPublish(spark, s"$base/_publish")
    // A decides first; B's decision loses the rename-no-overwrite race
    mpA.writeIntent(PublishIntent("p1", Seq(a.root, b.root)))
    intercept[ConcurrentWriteException](
      mpB.writeIntent(PublishIntent("p1", Seq(a.root, b.root))))
    // ... and B's ABORT of the same id loses the same race — it can
    // never retire the stagings of A's decided publish
    intercept[IllegalStateException](mpB.abort("p1", Seq(a, b)))
    assert(a.pendingWaps.contains("p1") && b.pendingWaps.contains("p1"),
      "losing abort must not touch the stagings")
    // A's decided intent re-drives normally on either coordinator
    assert(mpB.recover() == Seq("p1"))
    a.refresh(); b.refresh()
    assert(a.read().count() == 3 && b.read().count() == 3)
  }

  test("abort crash after the tombstone: recovery finalizes, stagings retire later") {
    val base = tmpDir("mpub")
    val (a, b) = seedPair(base)
    val mp = new MultiPublish(spark, s"$base/_publish")
    a.stageAppend(Seq((3L, "three")).toDF("id", "v"), "p1")
    b.stageAppend(Seq((3L, "eerht")).toDF("id", "v"), "p1")
    // an abort that crashed between its tombstone and the retirement
    mp.writeIntent(PublishIntent("p1", Nil))
    // the slot is taken: a publish of the id refuses up front
    intercept[IllegalArgumentException](mp.publish("p1", Seq(a, b)))
    // recovery finalizes the tombstone WITHOUT publishing anything
    assert(mp.recover().isEmpty)
    assert(mp.pendingIntents.isEmpty)
    assert(a.read().count() == 2 && b.read().count() == 2)
    // the orphan stagings retire on the next abort (presumed-abort)
    mp.abort("p1", Seq(a, b))
    assert(a.pendingWaps.isEmpty && b.pendingWaps.isEmpty)
  }

  test("recover skips an intent whose root is gone; later intents still re-drive") {
    val base = tmpDir("mpub")
    val (a, b) = seedPair(base)
    val mp = new MultiPublish(spark, s"$base/_publish")
    // p0: decided against a root that no longer resolves to a table
    mp.writeIntent(PublishIntent("p0", Seq(s"$base/ghost")))
    // p1: a normal decided publish behind it
    a.stageAppend(Seq((3L, "three")).toDF("id", "v"), "p1")
    b.stageAppend(Seq((3L, "eerht")).toDF("id", "v"), "p1")
    mp.writeIntent(PublishIntent("p1", Seq(a.root, b.root)))
    // p0 must not block p1 (VERDICT r11: no hard-fail of the whole list)
    assert(mp.recover() == Seq("p1"))
    a.refresh(); b.refresh()
    assert(a.read().count() == 3 && b.read().count() == 3)
    // the unresolvable intent stays visible for the operator
    assert(mp.pendingIntents.map(_.id) == Seq("p0"))
    // once the root exists again, recovery completes it
    val ghost = IncrementalTable(spark, s"$base/ghost")
    ghost.append(Seq((1L, "g")).toDF("id", "v"), Nil)
    ghost.stageAppend(Seq((2L, "h")).toDF("id", "v"), "p0")
    assert(mp.recover() == Seq("p0"))
    assert(mp.pendingIntents.isEmpty)
    ghost.refresh()
    assert(ghost.read().count() == 2)
  }

  test("recovery survives a double crash (re-drive of a partial re-drive)") {
    val base = tmpDir("mpub")
    val (a, b) = seedPair(base)
    val c = IncrementalTable(spark, s"$base/third")
    c.append(Seq((1L, "x")).toDF("id", "v"), Nil)
    val mp = new MultiPublish(spark, s"$base/_publish")
    Seq(a, b, c).zip(Seq("t3", "eerht", "y")).foreach { case (t, v) =>
      t.stageAppend(Seq((9L, v)).toDF("id", "v"), "p1")
    }
    mp.writeIntent(PublishIntent("p1", Seq(a.root, b.root, c.root)))
    intercept[IllegalStateException](
      mp.publishChildren("p1", Seq(a, b, c), failAfter = 1)) // crash 1
    val mp2 = new MultiPublish(spark, s"$base/_publish")
    intercept[IllegalStateException]( // crash 2, mid-recovery
      mp2.publishChildren("p1",
        Seq(a.root, b.root, c.root).map(IncrementalTable(spark, _)),
        failAfter = 2))
    val mp3 = new MultiPublish(spark, s"$base/_publish")
    assert(mp3.recover() == Seq("p1"))
    Seq(a, b, c).foreach { t =>
      t.refresh()
      assert(t.read().filter($"id" === 9L).count() == 1, t.root)
      assert(t.pendingWaps.isEmpty, t.root)
    }
  }

  test("abort-vs-publish interleaving: the loser fails LOUDLY, never a silent no-op (ADVICE r12)") {
    val base = tmpDir("mpub")
    val (a, b) = seedPair(base)
    val mp = new MultiPublish(spark, s"$base/_publish")
    a.stageAppend(Seq((3L, "three")).toDF("id", "v"), "p1")
    b.stageAppend(Seq((3L, "eerht")).toDF("id", "v"), "p1")
    // the ADVICE interleaving, via the race-injection hook: publish
    // passes its pendingWaps preconditions, THEN an abort decides,
    // fully retires the stagings and finalizes (freeing the intent
    // slot). The late publish wins writeIntent on the freed slot but
    // has nothing left to publish — it must THROW, not return an
    // empty "success" the caller reads as "the set published".
    val e = intercept[IllegalStateException](
      mp.publish("p1", Seq(a, b), afterCheck = () => mp.abort("p1", Seq(a, b))))
    assert(e.getMessage.contains("concurrent abort"), e.getMessage)
    assert(e.getMessage.contains("nothing became visible"), e.getMessage)
    a.refresh(); b.refresh()
    assert(a.read().count() == 2 && b.read().count() == 2,
      "nothing may become visible after the abort won")
    assert(mp.pendingIntents.isEmpty, "the moot intent must finalize")
    // the PARTIAL interleaving: one child's staging retired behind the
    // decided publish — the published children stay visible (they
    // cannot unwind) and the error names both halves exactly
    a.stageAppend(Seq((4L, "four")).toDF("id", "v"), "p2")
    b.stageAppend(Seq((4L, "ruof")).toDF("id", "v"), "p2")
    val e2 = intercept[IllegalStateException](
      mp.publish("p2", Seq(a, b), afterCheck = () => b.abortWap("p2")))
    assert(e2.getMessage.contains("PARTIAL"), e2.getMessage)
    assert(e2.getMessage.contains(b.root), e2.getMessage)
    assert(e2.getMessage.contains(a.root), e2.getMessage)
    a.refresh(); b.refresh()
    assert(a.read().count() == 3, "a's publish is atomic and stays")
    assert(b.read().count() == 2)
    assert(mp.pendingIntents.isEmpty)
  }
}
