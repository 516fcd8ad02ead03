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
    MaterializedView.create(view, up.root, Seq("typ"),
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
    MaterializedView.create(view, up.root, Seq("typ"), "count:n;sum:sum_k:k")
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
    MaterializedView.create(view, up.root, Seq("typ"),
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
    MaterializedView.createJoin(view, l.root, r.root, Seq("ck"),
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
      MaterializedView.create(view, l.root, Seq("ck"), "count:n"))
    intercept[IllegalArgumentException](
      MaterializedView.createJoin(view, l.root, r.root, Seq("ck")))
    intercept[IllegalArgumentException](
      MaterializedView.createJoin(IncrementalTable(spark, s"$base/v9"),
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
    MaterializedView.createJoin(joined, l.root, r.root, Seq("ck"))
    MaterializedView.create(rollup, joined.root, Seq("seg"),
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
    MaterializedView.create(view, up.root, Seq("typ"),
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
      MaterializedView.create(view, up.root, Seq("typ"), "count:n"))
    val v2 = IncrementalTable(spark, s"$base/v2")
    intercept[IllegalArgumentException](
      MaterializedView.create(v2, up.root, Seq("typ"), "median:m:k"))
    intercept[IllegalArgumentException](
      MaterializedView.create(v2, up.root, Seq("typ"), "sum:s"))
  }
}
