package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.IncrementalTable

/** Incremental join maintenance ([[JoinStream]]): after every drain the
  * maintained table must EQUAL the full inner join of both upstreams —
  * across any interleaving of appends, crash replays, one-sided
  * starts, and upstream rewrites. */
class JoinStreamSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (Long, Long, String)*): DataFrame =
    rows.toDF("order_id", "cust_id", "status")

  private def custs(rows: (Long, String)*): DataFrame =
    rows.toDF("cust_id", "name")

  private def mk(dir: String): (IncrementalTable, IncrementalTable,
      IncrementalTable, JoinStream) = {
    val l = IncrementalTable(spark, dir + "/orders/v1")
    val r = IncrementalTable(spark, dir + "/custs/v1")
    val d = IncrementalTable(spark, dir + "/joined/v1")
    (l, r, d, new JoinStream(l, r, d, Seq("cust_id"), name = "oc"))
  }

  /** Ground truth: full inner join of the live upstreams. */
  private def fullJoin(l: IncrementalTable, r: IncrementalTable): Set[(Long, Long, String, String)] =
    l.read().join(r.read(), Seq("cust_id"))
      .select($"order_id", $"cust_id", $"status", $"name")
      .as[(Long, Long, String, String)].collect().toSet

  private def state(d: IncrementalTable): Set[(Long, Long, String, String)] =
    d.read().select($"order_id", $"cust_id", $"status", $"name")
      .as[(Long, Long, String, String)].collect().toSet

  test("interleaved appends on both sides equal the full join at every drain") {
    val (l, r, d, s) = mk(tmpDir("joinstream"))

    // left first — right has nothing incorporated, cursor-only advance
    // (the downstream holds just the cursor: no data, no schema yet)
    l.append(orders((100L, 1L, "OPEN"), (101L, 2L, "OPEN")), Nil)
    assert(s.drain() == 1)
    assert(d.read().count() == 0)

    // right arrives: ΔR joins the incorporated left -> both pairs
    r.append(custs(1L -> "ann", 3L -> "cid"), Nil)
    assert(s.drain() == 1)
    assert(state(d) == fullJoin(l, r))
    assert(state(d) == Set((100L, 1L, "OPEN", "ann")))

    // both sides grow between drains; one drain applies both deltas.
    // New left rows must meet OLD right rows (ΔL ⋈ R@cursor) and new
    // right rows must meet ALL left rows including this drain's ΔL.
    l.append(orders((102L, 1L, "SHIP"), (103L, 3L, "OPEN")), Nil)
    r.append(custs(2L -> "bob"), Nil)
    assert(s.drain() == 2)
    assert(state(d) == fullJoin(l, r))
    assert(state(d) == Set(
      (100L, 1L, "OPEN", "ann"), (102L, 1L, "SHIP", "ann"),
      (103L, 3L, "OPEN", "cid"), (101L, 2L, "OPEN", "bob")))

    assert(s.drain() == 0) // nothing pending; re-drain is a no-op
  }

  test("crash replay is a no-op: a fresh consumer resumes from the table alone") {
    val dir = tmpDir("joinstream")
    val (l, r, d, s) = mk(dir)
    l.append(orders((1L, 1L, "A")), Nil)
    r.append(custs(1L -> "ann"), Nil)
    s.drain()
    l.append(orders((2L, 1L, "B")), Nil)
    s.drain()

    // post-crash identity: cursors recover from the downstream log
    val (l2, r2, d2, s2) = mk(dir)
    assert(s2.drain() == 0)
    assert(state(d2) == fullJoin(l2, r2))
    assert(s2.leftVersion == l2.commits().last.version)
  }

  test("upstream rewrite on either side triggers a rebuild equal to the full join") {
    val (l, r, d, s) = mk(tmpDir("joinstream"))
    l.append(orders((1L, 1L, "A"), (2L, 2L, "B")), Nil)
    r.append(custs(1L -> "ann", 2L -> "bob"), Nil)
    s.drain()

    // rewrite the LEFT history (e.g. a refresh correcting statuses):
    // appends can't patch it — the stream must rebuild
    l.replaceWhere(orders((1L, 1L, "FIXED"), (3L, 2L, "C")), Nil,
      Map.empty, partitionFilter = Map.empty)
    assert(s.drain() == 1)
    assert(state(d) == fullJoin(l, r))
    assert(state(d) == Set((1L, 1L, "FIXED", "ann"), (3L, 2L, "C", "bob")))

    // incremental consumption resumes after the rebuild
    r.append(custs(9L -> "zed"), Nil)
    l.append(orders((4L, 9L, "D")), Nil)
    assert(s.drain() == 2)
    assert(state(d) == fullJoin(l, r))
  }

  private def mkOuter(dir: String): (IncrementalTable, IncrementalTable,
      IncrementalTable, JoinStream) = {
    val l = IncrementalTable(spark, dir + "/orders/v1")
    val r = IncrementalTable(spark, dir + "/custs/v1")
    val d = IncrementalTable(spark, dir + "/joined/v1")
    (l, r, d, new JoinStream(l, r, d, Seq("cust_id"), name = "oc",
      joinType = "left_outer"))
  }

  /** Ground truth: full left outer join with the matched flag. */
  private def fullOuter(l: IncrementalTable, r: IncrementalTable): Set[(Long, Long, String, Option[String], Boolean)] =
    l.read().join(r.read(), Seq("cust_id"), "left")
      .select($"order_id", $"cust_id", $"status", $"name",
        $"name".isNotNull.as("matched"))
      .as[(Long, Long, String, Option[String], Boolean)].collect().toSet

  private def outerState(d: IncrementalTable): Set[(Long, Long, String, Option[String], Boolean)] =
    d.read().select($"order_id", $"cust_id", $"status", $"name", $"matched")
      .as[(Long, Long, String, Option[String], Boolean)].collect().toSet

  test("left outer: unmatched rows are null-extended; a late match retracts them") {
    val (l, r, d, s) = mkOuter(tmpDir("joinstream"))
    r.append(custs(1L -> "ann"), Nil)
    l.append(orders((100L, 1L, "A"), (101L, 2L, "B")), Nil)
    assert(s.drain() == 2)
    assert(outerState(d) == fullOuter(l, r))
    assert(outerState(d) == Set(
      (100L, 1L, "A", Some("ann"), true),
      (101L, 2L, "B", None, false))) // unmatched, null-extended

    // the late right row must INSERT the pair and RETRACT the null-row
    // in one commit
    r.append(custs(2L -> "bob"), Nil)
    assert(s.drain() == 1)
    assert(outerState(d) == fullOuter(l, r))
    assert(outerState(d) == Set(
      (100L, 1L, "A", Some("ann"), true),
      (101L, 2L, "B", Some("bob"), true)))

    // still-unmatched left rows keep their null-row across drains
    l.append(orders((102L, 9L, "C")), Nil)
    assert(s.drain() == 1)
    assert(outerState(d) == fullOuter(l, r))
    assert(outerState(d).contains((102L, 9L, "C", None, false)))
    assert(s.drain() == 0)
  }

  test("left outer: equals the full outer join under interleaving and resume") {
    val dir = tmpDir("joinstream")
    val (l, r, d, s) = mkOuter(dir)
    r.append(custs(1L -> "ann", 3L -> "cid"), Nil)
    l.append(orders((1L, 1L, "A"), (2L, 2L, "B")), Nil)
    s.drain()
    l.append(orders((3L, 2L, "C"), (4L, 3L, "D")), Nil) // 2 still unmatched
    r.append(custs(2L -> "bob"), Nil) // matches BOTH null-rows for cust 2
    assert(s.drain() == 2)
    assert(outerState(d) == fullOuter(l, r))

    // fresh consumer resumes from the downstream log alone
    val (l2, r2, d2, s2) = mkOuter(dir)
    assert(s2.drain() == 0)
    assert(outerState(d2) == fullOuter(l2, r2))
  }

  test("left outer: rewrite on either side rebuilds to the exact outer join") {
    val (l, r, d, s) = mkOuter(tmpDir("joinstream"))
    r.append(custs(1L -> "ann"), Nil)
    l.append(orders((1L, 1L, "A"), (2L, 5L, "B")), Nil)
    s.drain()
    r.replaceWhere(custs(5L -> "eve"), Nil, Map.empty,
      partitionFilter = Map.empty) // cust 1 gone, cust 5 appears
    assert(s.drain() == 1)
    assert(outerState(d) == fullOuter(l, r))
    assert(outerState(d) == Set(
      (1L, 1L, "A", None, false), (2L, 5L, "B", Some("eve"), true)))
  }

  private def mkFull(dir: String): (IncrementalTable, IncrementalTable,
      IncrementalTable, JoinStream) = {
    val l = IncrementalTable(spark, dir + "/orders/v1")
    val r = IncrementalTable(spark, dir + "/custs/v1")
    val d = IncrementalTable(spark, dir + "/joined/v1")
    (l, r, d, new JoinStream(l, r, d, Seq("cust_id"), name = "oc",
      joinType = "full_outer"))
  }

  /** Ground truth: full outer join with the side marker. */
  private def fullOuterBoth(l: IncrementalTable, r: IncrementalTable): Set[(Option[Long], Long, Option[String], Option[String], String)] =
    l.read().join(r.read(), Seq("cust_id"), "full")
      .select($"order_id", $"cust_id", $"status", $"name",
        when($"order_id".isNotNull && $"name".isNotNull, "both")
          .when($"order_id".isNotNull, "left").otherwise("right").as("side"))
      .as[(Option[Long], Long, Option[String], Option[String], String)]
      .collect().toSet

  private def fullState(d: IncrementalTable): Set[(Option[Long], Long, Option[String], Option[String], String)] =
    d.read().select($"order_id", $"cust_id", $"status", $"name", $"side")
      .as[(Option[Long], Long, Option[String], Option[String], String)]
      .collect().toSet

  test("full outer: placeholders on both sides retract as their match arrives") {
    val (l, r, d, s) = mkFull(tmpDir("joinstream"))
    l.append(orders((100L, 1L, "A")), Nil)
    r.append(custs(2L -> "bob"), Nil)
    assert(s.drain() == 2)
    assert(fullState(d) == fullOuterBoth(l, r))
    assert(fullState(d) == Set(
      (Some(100L), 1L, Some("A"), None, "left"),
      (None, 2L, None, Some("bob"), "right")))

    // cust 1 arrives: retracts order 100's LEFT placeholder;
    // order for cust 2 arrives: retracts bob's RIGHT placeholder
    r.append(custs(1L -> "ann"), Nil)
    l.append(orders((101L, 2L, "B")), Nil)
    assert(s.drain() == 2)
    assert(fullState(d) == fullOuterBoth(l, r))
    assert(fullState(d) == Set(
      (Some(100L), 1L, Some("A"), Some("ann"), "both"),
      (Some(101L), 2L, Some("B"), Some("bob"), "both")))
    assert(s.drain() == 0)

    // fresh consumer resumes cleanly
    val d2 = IncrementalTable(spark, d.root)
    val s2 = new JoinStream(l, r, d2, Seq("cust_id"), name = "oc",
      joinType = "full_outer")
    assert(s2.drain() == 0)
  }

  test("full outer: rebuild and continued incremental consumption") {
    val (l, r, d, s) = mkFull(tmpDir("joinstream"))
    l.append(orders((1L, 1L, "A"), (2L, 7L, "B")), Nil)
    r.append(custs(1L -> "ann", 9L -> "zed"), Nil)
    s.drain()
    assert(fullState(d) == fullOuterBoth(l, r))
    l.replaceWhere(orders((3L, 9L, "C")), Nil, Map.empty,
      partitionFilter = Map.empty)
    assert(s.drain() == 1)
    assert(fullState(d) == fullOuterBoth(l, r))
    assert(fullState(d) == Set(
      (Some(3L), 9L, Some("C"), Some("zed"), "both"),
      (None, 1L, None, Some("ann"), "right")))
    l.append(orders((4L, 1L, "D")), Nil)
    assert(s.drain() == 1)
    assert(fullState(d) == fullOuterBoth(l, r))
  }

  test("right outer via the factory equals the relational right outer join") {
    val dir = tmpDir("joinstream")
    val l = IncrementalTable(spark, dir + "/orders/v1")
    val r = IncrementalTable(spark, dir + "/custs/v1")
    val d = IncrementalTable(spark, dir + "/joined/v1")
    val s = JoinStream.rightOuter(l, r, d, Seq("cust_id"), name = "oc")
    l.append(orders((1L, 1L, "A")), Nil)
    r.append(custs(1L -> "ann", 2L -> "bob"), Nil)
    s.drain()
    l.append(orders((2L, 2L, "B")), Nil) // retracts bob's unmatched row
    s.drain()
    val got = d.read()
      .select($"order_id", $"cust_id", $"status", $"name", $"matched")
      .as[(Option[Long], Long, Option[String], String, Boolean)]
      .collect().toSet
    val want = l.read().join(r.read(), Seq("cust_id"), "right")
      .select($"order_id", $"cust_id", $"status", $"name",
        $"order_id".isNotNull.as("matched"))
      .as[(Option[Long], Long, Option[String], String, Boolean)]
      .collect().toSet
    assert(got == want)
    assert(got == Set(
      (Some(1L), 1L, Some("A"), "ann", true),
      (Some(2L), 2L, Some("B"), "bob", true)))
  }

  test("inner: a rewrite arriving before the other side ever has data clears safely") {
    val (l, r, d, s) = mk(tmpDir("joinstream"))
    r.append(custs(1L -> "ann"), Nil)
    s.drain() // right cursor advances; left has never produced data
    r.replaceWhere(custs(2L -> "bob"), Nil, Map.empty,
      partitionFilter = Map.empty)
    assert(s.drain() == 1) // rebuild with a -1 left cursor must not wedge
    assert(!d.exists || d.read().columns.isEmpty || d.read().count() == 0)
    // the stream proceeds normally once the left side appears
    l.append(orders((1L, 2L, "A")), Nil)
    assert(s.drain() == 1)
    assert(state(d) == Set((1L, 2L, "A", "bob")))
  }

  test("three-way join as chained hops: A⋈B maintained into T1, T1⋈C into T2") {
    val dir = tmpDir("joinstream")
    val a = IncrementalTable(spark, dir + "/a/v1")
    val b = IncrementalTable(spark, dir + "/b/v1")
    val c = IncrementalTable(spark, dir + "/c/v1")
    val t1 = IncrementalTable(spark, dir + "/t1/v1")
    val t2 = IncrementalTable(spark, dir + "/t2/v1")
    val hop1 = new JoinStream(a, b, t1, Seq("cust_id"), name = "ab")
    val hop2 = new JoinStream(t1, c, t2, Seq("cust_id"), name = "abc")
    def drainAll(): Unit = { hop1.drain(); hop2.drain() }

    def want: Set[(Long, Long, String, String, String)] =
      a.read().join(b.read(), Seq("cust_id")).join(c.read(), Seq("cust_id"))
        .select($"order_id", $"cust_id", $"status", $"name", $"region")
        .as[(Long, Long, String, String, String)].collect().toSet
    def got: Set[(Long, Long, String, String, String)] =
      t2.read().select($"order_id", $"cust_id", $"status", $"name", $"region")
        .as[(Long, Long, String, String, String)].collect().toSet

    // interleaved arrival across ALL THREE inputs; every drain pair
    // keeps T2 equal to the full three-way join
    a.append(orders((1L, 1L, "A"), (2L, 2L, "B")), Nil)
    c.append(Seq((1L, "EU")).toDF("cust_id", "region"), Nil)
    drainAll()
    b.append(custs(1L -> "ann"), Nil)
    drainAll()
    assert(got == want)
    assert(got == Set((1L, 1L, "A", "ann", "EU")))

    b.append(custs(2L -> "bob"), Nil)
    c.append(Seq((2L, "US")).toDF("cust_id", "region"), Nil)
    a.append(orders((3L, 1L, "C")), Nil)
    drainAll()
    assert(got == want)
    assert(got.size == 3)

    // an upstream rewrite cascades: hop1 rebuilds (replace commit on
    // T1), which hop2 sees as a non-append and rebuilds T2
    b.replaceWhere(custs(1L -> "ANN2", 2L -> "bob"), Nil, Map.empty,
      partitionFilter = Map.empty)
    drainAll()
    assert(got == want)
    assert(got.exists(_._4 == "ANN2"))
  }

  test("left outer: a right rewrite before any left data clears safely") {
    val (l, r, d, s) = mkOuter(tmpDir("joinstream"))
    r.append(custs(1L -> "ann"), Nil)
    s.drain() // right cursor advances; left has never produced data
    r.replaceWhere(custs(2L -> "bob"), Nil, Map.empty,
      partitionFilter = Map.empty)
    assert(s.drain() == 1) // rebuild with vL=-1: view is empty, no wedge
    assert(!d.exists || d.read().columns.isEmpty || d.read().count() == 0)
    l.append(orders((1L, 9L, "A")), Nil) // unmatched left appears
    assert(s.drain() == 1)
    assert(outerState(d) == Set((1L, 9L, "A", None, false)))
  }

  test("non-key column collision across sides is rejected") {
    val dir = tmpDir("joinstream")
    val l = IncrementalTable(spark, dir + "/a/v1")
    val r = IncrementalTable(spark, dir + "/b/v1")
    val d = IncrementalTable(spark, dir + "/j/v1")
    val s = new JoinStream(l, r, d, Seq("cust_id"), name = "clash")
    l.append(Seq((1L, "x")).toDF("cust_id", "name"), Nil)
    r.append(Seq((1L, "y")).toDF("cust_id", "name"), Nil)
    val e = intercept[IllegalArgumentException](s.drain())
    assert(e.getMessage.contains("name"))
  }
}
