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
    intercept[IllegalArgumentException](mp.abort("p1", Seq(a, b)))
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
}
