package graft.table

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** X102: branch refs (the Iceberg branch analog). A branch is a named,
  * writable fork of a pinned snapshot: writes extend its chain as
  * invisible `staged` commits (base + chain visible only through
  * readBranch / `VERSION AS OF 'branch:<name>'`), replaceWhere removal
  * sets resolve against the branch's OWN live set, and fastForward
  * publishes the whole chain onto main as ONE atomic commit — failing
  * loudly when main diverged since the fork. The multi-write
  * generalization of WAP's single-write isolation. */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  test("fork isolation: branch writes invisible to main, main meta-commits fine") {
    val t = IncrementalTable(spark, tmpDir("branch") + "/t")
    t.append(spark.range(0, 10).toDF("id"), Nil) // v0
    t.createBranch("dev") // v1

    t.appendBranch(spark.range(10, 15).toDF("id"), "dev")
    t.appendBranch(spark.range(15, 20).toDF("id"), "dev")
    // main: unchanged snapshot, no CDC, the ref registry is the only trace
    assert(t.read().count() == 10)
    assert(t.changes(2).filter(col("_change_type") === "insert").count() == 0)
    assert(t.branches.keySet == Set("dev"))
    assert(t.branches("dev").commits.size == 2)
    // branch: base + both chain commits, repeatably (pure read)
    assert(t.readBranch("dev").as[Long].collect().sorted.toSeq == (0L until 20L))
    assert(t.readBranch("dev").count() == 20)
    // main meta commits (tag, property) do not disturb the branch
    t.setTag("pin", 0)
    t.setProperties(Map("owner" -> "ci"))
    assert(t.readBranch("dev").count() == 20)
    // refusals: duplicate fork, unknown branch, numeric / ':' names
    intercept[IllegalArgumentException](t.createBranch("dev"))
    intercept[IllegalArgumentException](t.readBranch("nope"))
    intercept[IllegalArgumentException](t.createBranch("123"))
    intercept[IllegalArgumentException](t.createBranch("a:b"))
  }

  test("replaceWhere on a branch resolves against the BRANCH's live set") {
    val t = IncrementalTable(spark, tmpDir("branch") + "/rw")
    val seed = Seq((1L, "a", 1), (2L, "b", 2), (3L, "c", 2))
      .toDF("id", "name", "p")
    t.append(seed, Seq("p")) // v0: p=1, p=2
    t.createBranch("dev")
    // chain 1: append INTO p=2 on the branch
    t.appendBranch(Seq((4L, "d", 2)).toDF("id", "name", "p"), "dev", Seq("p"))
    assert(t.readBranch("dev").count() == 4)
    // chain 2: replace p=2 on the branch — must remove BOTH the base
    // p=2 file and the branch's own earlier p=2 add
    t.replaceWhereBranch(Seq((9L, "z", 2)).toDF("id", "name", "p"), "dev",
      Seq("p"), Map.empty, Map("p" -> "2"))
    val branchRows = t.readBranch("dev").select("id").as[Long].collect().sorted
    assert(branchRows.toSeq == Seq(1L, 9L), branchRows.mkString(","))
    // main never moved
    assert(t.read().count() == 3)
    // the chain recorded the replace's removal of its own prior add
    val chain = t.branches("dev").commits
    assert(chain.size == 2 && chain.last.action == "replace")
    assert(chain.last.remove.toSet.intersect(chain.head.add.toSet).nonEmpty,
      "branch replace must remove the branch's own earlier add")
  }

  test("fast-forward publishes the chain as ONE atomic commit") {
    val t = IncrementalTable(spark, tmpDir("branch") + "/ff")
    t.append(Seq((1L, 1), (2L, 2)).toDF("id", "p"), Seq("p")) // v0
    t.createBranch("dev") // v1
    t.appendBranch(Seq((3L, 1)).toDF("id", "p"), "dev", Seq("p"))
    t.replaceWhereBranch(Seq((9L, 2)).toDF("id", "p"), "dev",
      Seq("p"), Map.empty, Map("p" -> "2"))
    val before = t.latestVersion
    val c = t.fastForward("dev")
    assert(c.version == before + 1, "ff must be ONE commit")
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 9L))
    assert(t.branches.isEmpty)
    // CDC emits the net change AT the ff version
    val feed = t.changes(c.version, c.version)
    assert(feed.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq == Seq(3L, 9L))
    assert(feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSeq == Seq(2L))
    // the ref is gone: re-ff and re-read both refuse
    intercept[IllegalArgumentException](t.fastForward("dev"))
    intercept[IllegalArgumentException](t.readBranch("dev"))
  }

  test("fast-forward refuses a diverged main; spec evolve kills the branch") {
    val t = IncrementalTable(spark, tmpDir("branch") + "/div")
    t.append(spark.range(0, 5).toDF("id"), Nil)
    t.createBranch("dev")
    t.appendBranch(spark.range(5, 8).toDF("id"), "dev")
    t.append(spark.range(100, 101).toDF("id"), Nil) // main diverges
    val e = intercept[ConcurrentWriteException](t.fastForward("dev"))
    assert(e.getMessage.contains("diverged"), e.getMessage)
    // branch still readable (its chain is intact) — and droppable
    assert(t.readBranch("dev").count() == 8)
    t.dropBranch("dev")

    val t2 = IncrementalTable(spark, tmpDir("branch") + "/evolve")
    t2.append(Seq((1L, 1, "x")).toDF("id", "p", "s"), Seq("p"))
    t2.createBranch("dev")
    t2.evolvePartitioning(Seq("s"))
    val e2 = intercept[ConcurrentWriteException](
      t2.appendBranch(Seq((2L, 2, "y")).toDF("id", "p", "s"), "dev", Seq("s")))
    assert(e2.getMessage.contains("evolved"), e2.getMessage)
    intercept[ConcurrentWriteException](t2.fastForward("dev"))
  }

  test("vacuum protects a live branch's files; dropBranch reclaims them") {
    val t = IncrementalTable(spark, tmpDir("branch") + "/vac",
      checkpointEvery = 3)
    t.append(spark.range(0, 10).toDF("id"), Nil)
    t.createBranch("dev")
    t.appendBranch(spark.range(10, 20).toDF("id"), "dev")
    // churn main's meta so checkpoints fold the channel forward
    (0 until 6).foreach(i => t.setProperties(Map(s"k$i" -> "v")))
    assert(t.vacuum().isEmpty, "vacuum must keep the live branch's files")
    assert(t.readBranch("dev").count() == 20)
    val dropped = t.dropBranch("dev")
    assert(dropped.nonEmpty)
    intercept[IllegalArgumentException](t.readBranch("dev"))
    // the eager delete already reclaimed them; nothing newly dangling
    assert(t.read().count() == 10)
  }

  test("branch chains replay across reopen and checkpoint folding") {
    val root = tmpDir("branch") + "/replay"
    val t = IncrementalTable(spark, root, checkpointEvery = 3)
    t.append(spark.range(0, 5).toDF("id"), Nil)
    t.createBranch("dev")
    t.appendBranch(spark.range(5, 10).toDF("id"), "dev")
    (0 until 6).foreach(i => t.setProperties(Map(s"k$i" -> "v")))
    // a FRESH handle replays the ref from the (checkpoint-folded) log
    val t2 = IncrementalTable(spark, root, checkpointEvery = 3)
    assert(t2.branches.keySet == Set("dev"))
    assert(t2.readBranch("dev").count() == 10)
    val c = t2.fastForward("dev")
    assert(t2.read().count() == 10 && c.add.nonEmpty)
  }

  test("empty branch append elides; ff of an empty chain just drops the ref") {
    val t = IncrementalTable(spark, tmpDir("branch") + "/empty")
    t.append(spark.range(0, 3).toDF("id"), Nil)
    t.createBranch("dev")
    assert(t.appendBranch(spark.range(0, 0).toDF("id"), "dev").isEmpty)
    assert(t.branches("dev").commits.isEmpty)
    val v = t.latestVersion
    t.fastForward("dev") // net-zero chain: one meta tombstone commit
    assert(t.latestVersion == v + 1 && t.branches.isEmpty)
    assert(t.read().count() == 3)
  }

  // one warehouse per suite: catalog instances are memoized per name by
  // Spark's CatalogManager, so the warehouse conf must be stable
  private lazy val cat: String = {
    val wh = tmpDir("branch_wh")
    spark.conf.set("spark.sql.catalog.bcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bcat.ns")
    "bcat"
  }

  test("SQL front door: CALL branch, conf-routed INSERT, branch: read, ff") {
    {
      spark.sql(s"CREATE TABLE $cat.ns.b (id BIGINT, p INT) PARTITIONED BY (p)")
      spark.sql(s"INSERT INTO $cat.ns.b VALUES (1, 1), (2, 2)")
      spark.sql(s"CALL $cat.system.branch('ns.b', 'dev')")
      try {
        spark.conf.set("spark.graft.branch", "dev")
        spark.sql(s"INSERT INTO $cat.ns.b VALUES (3, 1)")
        spark.sql(s"INSERT OVERWRITE $cat.ns.b PARTITION (p = 2) VALUES (9)")
      } finally spark.conf.unset("spark.graft.branch")
      // main blind, branch head readable by ref spelling
      assert(spark.sql(s"SELECT * FROM $cat.ns.b").count() == 2)
      assert(spark.sql(
        s"SELECT id FROM $cat.ns.b VERSION AS OF 'branch:dev' ORDER BY id")
        .as[Long].collect().toSeq == Seq(1L, 3L, 9L))
      // the registry is queryable
      val reg = spark.sql(s"SELECT * FROM $cat.ns.b.branches").collect()
      assert(reg.length == 1 && reg(0).getString(0) == "dev" &&
        reg(0).getLong(2) == 2L)
      val ff = spark.sql(s"CALL $cat.system.fast_forward('ns.b', 'dev')").collect()
      assert(ff(0).getInt(1) >= 2, "ff should adopt the chain's files")
      assert(spark.sql(s"SELECT id FROM $cat.ns.b ORDER BY id")
        .as[Long].collect().toSeq == Seq(1L, 3L, 9L))
      assert(spark.sql(s"SELECT * FROM $cat.ns.b.branches").isEmpty)
      // drop_branch leg on a fresh fork
      spark.sql(s"CALL $cat.system.branch('ns.b', 'scratch')")
      try {
        spark.conf.set("spark.graft.branch", "scratch")
        spark.sql(s"INSERT INTO $cat.ns.b VALUES (7, 1)")
      } finally spark.conf.unset("spark.graft.branch")
      val d = spark.sql(s"CALL $cat.system.drop_branch('ns.b', 'scratch')").collect()
      assert(d(0).getInt(0) == 1)
      assert(spark.sql(s"SELECT * FROM $cat.ns.b").count() == 3)
    }
  }
}
