package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.IncrementalTable

/** SQL materialized views over the IVM machinery (VERDICT r11 #3):
  * create registers the definition on the view table's meta channel,
  * refresh drains upstream commits through AggregateStream — including
  * the X48 paths (maintenance compaction is a CDC no-op; a genuine
  * rewrite converges via scoped recompute). */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def batch(ids: Range) =
    ids.map(i => (i.toLong, s"t${i % 3}", (i % 7).toLong)).toDF("id", "typ", "k")

  private def expect(up: IncrementalTable) =
    up.read().groupBy($"typ")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"))
      .select($"typ", $"n", $"sum_k")
      .collect().map(_.toSeq).toSet

  private def got(view: IncrementalTable) = {
    view.refresh()
    view.read().select($"typ", $"n", $"sum_k").collect().map(_.toSeq).toSet
  }

  test("create → append → refresh converges; definition rides the meta channel") {
    val base = tmpDir("mv")
    val up = IncrementalTable(spark, s"$base/src")
    val view = IncrementalTable(spark, s"$base/view")
    up.append(batch(0 until 30), Nil)
    MaterializedView.create(spark, view, up.root, Seq("typ"),
      "count:n;sum:sum_k:k")
    // the definition is table metadata — a FRESH handle refreshes it
    val view2 = IncrementalTable(spark, s"$base/view")
    assert(MaterializedView.refresh(spark, view2) == 1)
    assert(got(view) == expect(up))
    // incremental: two more appends, one refresh drains both
    up.append(batch(30 until 40), Nil)
    up.append(batch(40 until 55), Nil)
    assert(MaterializedView.refresh(spark, view) == 2)
    assert(got(view) == expect(up))
    // idempotent: nothing pending → zero applied, state unchanged
    assert(MaterializedView.refresh(spark, view) == 0)
    assert(got(view) == expect(up))
  }

  test("refresh after compaction is a no-op; after a rewrite it converges (X48)") {
    val base = tmpDir("mv")
    val up = IncrementalTable(spark, s"$base/src")
    val view = IncrementalTable(spark, s"$base/view")
    (0 until 3).foreach(i => up.append(batch(i * 10 until (i + 1) * 10), Nil))
    MaterializedView.create(spark, view, up.root, Seq("typ"), "count:n;sum:sum_k:k")
    assert(MaterializedView.refresh(spark, view) == 3)
    val v1 = got(view)
    // maintenance compaction preserves logical rows (X94 CDC no-op):
    // refresh must apply ZERO commits and the view must not change
    up.compact(targetFiles = 1)
    assert(MaterializedView.refresh(spark, view) == 0,
      "a maintenance rewrite must not trigger view work")
    assert(got(view) == v1)
    // a genuine rewrite (delete some rows via replace) converges
    up.replaceWhere(up.read().filter($"id" % 2 === 0), Nil, Map.empty, Map.empty)
    assert(MaterializedView.refresh(spark, view) == 1)
    assert(got(view) == expect(up))
  }

  test("sketch and derived-monoid kinds: hll estimates, avg struct state") {
    val base = tmpDir("mv")
    val up = IncrementalTable(spark, s"$base/src")
    val view = IncrementalTable(spark, s"$base/view")
    (0 until 3).foreach(i => up.append(batch(i * 20 until (i + 1) * 20), Nil))
    MaterializedView.create(spark, view, up.root, Seq("typ"),
      "hll:uniq_k:k;avg@4:avg_k:k;count:n")
    assert(MaterializedView.refresh(spark, view) == 3)
    view.refresh()
    val got = view.read().select($"typ",
      expr("CAST(hll_sketch_estimate(uniq_k) AS BIGINT)").as("uniq"),
      expr("CAST(avg_k.s AS DOUBLE) / avg_k.n").as("avg_k"), $"n")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val want = up.read().groupBy($"typ")
      .agg(countDistinct($"k").as("uniq"), avg($"k").as("avg_k"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(0 + 1), r.getDouble(2), r.getLong(3))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (t, (uniq, avgK, n)) =>
      // HLL is exact at these cardinalities (sparse mode)
      assert(got(t)._1 == uniq, s"$t hll: ${got(t)._1} != $uniq")
      assert(math.abs(got(t)._2 - avgK) < 1e-9, s"$t avg")
      assert(got(t)._3 == n, s"$t count")
    }
  }

  test("join views: per-side cursors pair late halves exactly once") {
    val base = tmpDir("mv")
    val l = IncrementalTable(spark, s"$base/orders")
    val r = IncrementalTable(spark, s"$base/cust")
    val view = IncrementalTable(spark, s"$base/joined")
    def ords(ids: Range) = ids.map(i => (i.toLong, (i % 10).toLong, i * 1.5))
      .toDF("ok", "ck", "total")
    def custs(ids: Range) = ids.map(i => (i.toLong, s"c$i")).toDF("ck", "cname")
    MaterializedView.createJoin(spark, view, l.root, r.root, Seq("ck"),
      joinType = "inner")
    // halves interleave across refreshes: pairs whose counterpart is
    // missing must not enter, and must enter EXACTLY ONCE when it lands
    l.append(ords(0 until 40).filter($"ok" % 2 === 0), Nil)
    r.append(custs(0 until 10).filter($"ck" % 2 === 0), Nil)
    assert(MaterializedView.refresh(spark, view) == 2) // one per side
    view.refresh()
    val mid = view.read().count()
    assert(mid > 0 && mid < 40, s"partial pairing expected: $mid")
    l.append(ords(0 until 40).filter($"ok" % 2 === 1), Nil)
    r.append(custs(0 until 10).filter($"ck" % 2 === 1), Nil)
    MaterializedView.refresh(spark, view)
    view.refresh()
    val got = view.read().select($"ok", $"ck", $"total", $"cname")
      .collect().map(_.toSeq).toSet
    val want = ords(0 until 40).join(custs(0 until 10), Seq("ck"))
      .select($"ok", $"ck", $"total", $"cname")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    // double-registration across the two flavors refuses
    intercept[IllegalArgumentException](
      MaterializedView.create(spark, view, l.root, Seq("ck"), "count:n"))
    intercept[IllegalArgumentException](
      MaterializedView.createJoin(spark, view, l.root, r.root, Seq("ck")))
    intercept[IllegalArgumentException](
      MaterializedView.createJoin(spark, IncrementalTable(spark, s"$base/v9"),
        l.root, r.root, Seq("ck"), joinType = "cross"))
  }

  test("views CHAIN: an aggregate view over a join view converges") {
    // composability: the join view's own commit log is a changefeed any
    // downstream consumer can maintain from — register an aggregate
    // view whose SOURCE is the join view and refresh bottom-up
    val base = tmpDir("mv")
    val l = IncrementalTable(spark, s"$base/orders")
    val r = IncrementalTable(spark, s"$base/cust")
    val joined = IncrementalTable(spark, s"$base/joined")
    val rollup = IncrementalTable(spark, s"$base/rollup")
    def ords(ids: Range) = ids.map(i => (i.toLong, (i % 5).toLong, (i % 7).toLong))
      .toDF("ok", "ck", "qty")
    val custs = (0 until 5).map(i => (i.toLong, s"seg${i % 2}")).toDF("ck", "seg")
    MaterializedView.createJoin(spark, joined, l.root, r.root, Seq("ck"))
    MaterializedView.create(spark, rollup, joined.root, Seq("seg"),
      "count:n;sum:qty_sum:qty")
    r.append(custs, Nil)
    (0 until 3).foreach { i =>
      l.append(ords(i * 10 until (i + 1) * 10), Nil)
      MaterializedView.refresh(spark, joined)
      MaterializedView.refresh(spark, rollup)
    }
    rollup.refresh()
    val got = rollup.read().select($"seg", $"n", $"qty_sum")
      .collect().map(_.toSeq).toSet
    val want = ords(0 until 30).join(custs, Seq("ck")).groupBy($"seg")
      .agg(count(lit(1)).as("n"), sum($"qty").as("qty_sum"))
      .select($"seg", $"n", $"qty_sum").collect().map(_.toSeq).toSet
    assert(got == want, s"chained views diverged: $got vs $want")
  }

  test("where filter and partitioned views; bad specs fail loudly") {
    val base = tmpDir("mv")
    val up = IncrementalTable(spark, s"$base/src")
    val view = IncrementalTable(spark, s"$base/view")
    up.append(batch(0 until 40), Nil)
    MaterializedView.create(spark, view, up.root, Seq("typ"),
      "count:n;max:max_k:k", where = "k > 2", partitionBy = Seq("typ"))
    MaterializedView.refresh(spark, view)
    val want = up.read().filter($"k" > 2).groupBy($"typ")
      .agg(count(lit(1)).as("n"), max($"k").as("max_k"))
      .collect().map(_.toSeq).toSet
    view.refresh()
    assert(view.read().select($"typ", $"n", $"max_k")
      .collect().map(_.toSeq).toSet == want)
    // the view's physical layout follows partition_by
    assert(view.liveFiles().forall(_.startsWith("typ=")))
    // refresh on a non-view refuses with a pointer to create_view
    val plain = IncrementalTable(spark, s"$base/plain")
    plain.append(batch(0 until 3), Nil)
    val e = intercept[IllegalArgumentException](
      MaterializedView.refresh(spark, plain))
    assert(e.getMessage.contains("create_view"), e.getMessage)
    // double-create refuses; bad agg kinds refuse at create time
    intercept[IllegalArgumentException](
      MaterializedView.create(spark, view, up.root, Seq("typ"), "count:n"))
    val v2 = IncrementalTable(spark, s"$base/v2")
    intercept[IllegalArgumentException](
      MaterializedView.create(spark, v2, up.root, Seq("typ"), "median:m:k"))
    intercept[IllegalArgumentException](
      MaterializedView.create(spark, v2, up.root, Seq("typ"), "sum:s"))
  }

  test("create refuses a populated target; a meta-only target is fine (ADVICE r12)") {
    val base = tmpDir("mv")
    val up = IncrementalTable(spark, s"$base/src")
    up.append(batch(0 until 10), Nil)
    // an existing table with data commits must NOT silently become a
    // view — the first refresh would merge deltas into its rows
    val tgt = IncrementalTable(spark, s"$base/tgt")
    tgt.append(batch(0 until 5), Nil)
    val e = intercept[IllegalArgumentException](
      MaterializedView.create(spark, tgt, up.root, Seq("typ"), "count:n"))
    assert(e.getMessage.contains("holds data"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      MaterializedView.createJoin(spark, tgt, up.root, up.root, Seq("id")))
    assert(e2.getMessage.contains("holds data"), e2.getMessage)
    assert(tgt.read().count() == 5, "refusal must not touch the table")
    // a target carrying only META commits has no rows to corrupt
    val meta = IncrementalTable(spark, s"$base/meta")
    meta.commitMeta(Map("note" -> "pre-registered"))
    MaterializedView.create(spark, meta, up.root, Seq("typ"), "count:n")
    assert(MaterializedView.refresh(spark, meta) == 1)
  }

  test("create-time validation: keys, agg exprs, where and @dials refuse loudly (VERDICT r12 #2/#7)") {
    val base = tmpDir("mv")
    val up = IncrementalTable(spark, s"$base/src")
    up.append(batch(0 until 10), Nil)
    def fresh(n: String) = IncrementalTable(spark, s"$base/$n")
    val eKey = intercept[IllegalArgumentException](
      MaterializedView.create(spark, fresh("v1"), up.root, Seq("nope"), "count:n"))
    assert(eKey.getMessage.contains("nope") &&
      eKey.getMessage.contains("not in source"), eKey.getMessage)
    val eExpr = intercept[IllegalArgumentException](
      MaterializedView.create(spark, fresh("v2"), up.root, Seq("typ"),
        "sum:s:no_such_col + 1"))
    assert(eExpr.getMessage.contains("no_such_col"), eExpr.getMessage)
    val eWhere = intercept[IllegalArgumentException](
      MaterializedView.create(spark, fresh("v3"), up.root, Seq("typ"),
        "count:n", where = "ghost > 2"))
    assert(eWhere.getMessage.contains("ghost"), eWhere.getMessage)
    val eDial = intercept[IllegalArgumentException](
      MaterializedView.create(spark, fresh("v4"), up.root, Seq("typ"),
        "avg@big:a:k"))
    assert(eDial.getMessage.contains("integer"), eDial.getMessage)
    // join keys must resolve on BOTH sides
    val r = fresh("r")
    r.append(Seq((1L, "x")).toDF("rk", "w"), Nil)
    val eJk = intercept[IllegalArgumentException](
      MaterializedView.createJoin(spark, fresh("v5"), up.root, r.root, Seq("id")))
    assert(eJk.getMessage.contains("right") && eJk.getMessage.contains("id"),
      eJk.getMessage)
    // nothing registered, nothing committed by the refusals
    assert(!fresh("v1").exists && !fresh("v5").exists)
  }

  test("a source column rename after create breaks refresh LOUDLY, naming the registration") {
    val base = tmpDir("mv")
    val up = IncrementalTable(spark, s"$base/src")
    up.append(batch(0 until 10), Nil)
    val view = IncrementalTable(spark, s"$base/view")
    MaterializedView.create(spark, view, up.root, Seq("typ"), "count:n;sum:s:k")
    assert(MaterializedView.refresh(spark, view) == 1)
    up.renameColumn("k", "k_renamed")
    up.append(batch(10 until 15).withColumnRenamed("k", "k_renamed"), Nil)
    val e = intercept[IllegalStateException](MaterializedView.refresh(spark, view))
    assert(e.getMessage.contains(view.root), e.getMessage)
    assert(e.getMessage.contains("registration"), e.getMessage)
    assert(e.getMessage.contains("k"), e.getMessage)
    assert(e.getMessage.contains("re-create"), e.getMessage)
  }

  test("bounded refresh, refreshUntilCurrent and the staleness report (VERDICT r12 #1)") {
    val base = tmpDir("mv")
    val up = IncrementalTable(spark, s"$base/src")
    val view = IncrementalTable(spark, s"$base/view")
    (0 until 4).foreach(i => up.append(batch(i * 10 until (i + 1) * 10), Nil))
    MaterializedView.create(spark, view, up.root, Seq("typ"),
      "count:n;sum:sum_k:k")
    // never refreshed: the full backlog is the lag, cursor = -1
    val s0 = MaterializedView.status(spark, view).head
    assert(s0.role == "source" && s0.source == up.root)
    assert(s0.cursorVersion == -1L && s0.lagCommits > 0)
    val lag0 = s0.lagCommits
    // ONE bounded step consumes exactly one commit and reports the rest
    assert(MaterializedView.refresh(spark, view, maxCommits = 1) == 1)
    val s1 = MaterializedView.status(spark, view).head
    assert(s1.lagCommits == lag0 - 1, s"$s1 after one bounded step (lag0=$lag0)")
    assert(s1.cursorVersion >= 0 && s1.cursorVersion < s1.headVersion)
    // the drain loop converges to lag 0 in bounded steps
    val total = MaterializedView.refreshUntilCurrent(spark, view,
      maxCommitsPerStep = 1)
    assert(total == lag0 - 1, s"drain loop applied $total, expected ${lag0 - 1}")
    val s2 = MaterializedView.status(spark, view).head
    assert(s2.lagCommits == 0 && s2.lagMs.contains(0L), s2.toString)
    assert(s2.cursorVersion == s2.headVersion)
    assert(got(view) == expect(up))
    // "lag 0" and "refresh applies nothing" can never disagree — same
    // predicate (CommitConsumer.isDataCommit)
    assert(MaterializedView.refresh(spark, view) == 0)
    // restart-mid-catchup: a FRESH handle (new process) resumes the loop
    (4 until 6).foreach(i => up.append(batch(i * 10 until (i + 1) * 10), Nil))
    assert(MaterializedView.refresh(spark, view, maxCommits = 1) == 1)
    val resumed = IncrementalTable(spark, s"$base/view")
    assert(MaterializedView.refreshUntilCurrent(spark, resumed,
      maxCommitsPerStep = 1) == 1)
    assert(got(resumed) == expect(up))
  }

  test("lag_ms is null when unknowable (cursor predates the retained window)") {
    val base = tmpDir("mv")
    // aggressive checkpoint cadence so expire_snapshots can truncate
    val up = new IncrementalTable(spark, s"$base/src",
      checkpointEvery = 2, parquetThreshold = 0)
    (0 until 5).foreach(i => up.append(batch(i * 10 until (i + 1) * 10), Nil))
    val view = IncrementalTable(spark, s"$base/view")
    MaterializedView.create(spark, view, up.root, Seq("typ"),
      "count:n;sum:sum_k:k")
    // a DEFAULT-cadence source retains genesis: never-refreshed lag is
    // EXACT (a number, not null) while the whole span is visible
    val plain = IncrementalTable(spark, s"$base/plain")
    plain.append(batch(0 until 10), Nil)
    plain.append(batch(10 until 20), Nil)
    val pview = IncrementalTable(spark, s"$base/pview")
    MaterializedView.create(spark, pview, plain.root, Seq("typ"), "count:n")
    assert(MaterializedView.status(spark, pview).head.lagMs.isDefined)
    // `up` checkpoints every 2 commits, so its replayed window no longer
    // starts at genesis — a never-refreshed cursor predates the window
    // and any lag_ms would silently undercount (VERDICT r13 wrong #3);
    // the COUNT stays exact. expire_snapshots makes the truncation
    // durable (archived records gone, not just folded).
    val (floor, n) = up.expireSnapshots(olderThanHours = 0.0)
    assert(floor > 0 && n > 0, s"test needs real expiry (floor=$floor, n=$n)")
    val s = MaterializedView.status(spark, view).head
    assert(s.lagMs.isEmpty, s"unknowable lag must be None: $s")
    assert(s.lagCommits > 0)
    // ...and "lag == what refresh applies" still holds on the truncated
    // log (same predicate), converging to an EXACT Some(0)
    val applied = MaterializedView.refreshUntilCurrent(spark, view)
    assert(applied.toLong == s.lagCommits, s"applied $applied vs $s")
    val s2 = MaterializedView.status(spark, view).head
    assert(s2.lagCommits == 0 && s2.lagMs.contains(0L), s2.toString)
  }

  test("join-view staleness: one status row per side, per-side cursors") {
    val base = tmpDir("mv")
    val l = IncrementalTable(spark, s"$base/l")
    val r = IncrementalTable(spark, s"$base/r")
    val view = IncrementalTable(spark, s"$base/joined")
    def ords(ids: Range) = ids.map(i => (i.toLong, (i % 5).toLong)).toDF("ok", "ck")
    MaterializedView.createJoin(spark, view, l.root, r.root, Seq("ck"))
    l.append(ords(0 until 10), Nil)
    l.append(ords(10 until 20), Nil)
    r.append((0 until 5).map(i => (i.toLong, s"c$i")).toDF("ck", "cname"), Nil)
    val st = MaterializedView.status(spark, view)
    assert(st.map(_.role) == Seq("left", "right"))
    assert(st.forall(_.cursorVersion == -1L))
    assert(st.find(_.role == "left").get.lagCommits == 2)
    assert(st.find(_.role == "right").get.lagCommits == 1)
    MaterializedView.refreshUntilCurrent(spark, view)
    val st2 = MaterializedView.status(spark, view)
    assert(st2.forall(s => s.lagCommits == 0 && s.lagMs.contains(0L)), st2.toString)
    assert(st2.forall(s => s.cursorVersion == s.headVersion))
  }
}
