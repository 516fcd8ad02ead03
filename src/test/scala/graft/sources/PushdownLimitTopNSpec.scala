package graft.sources

import graft.SparkSpec
import graft.table.IncrementalTable

/** X103: LIMIT and TOP-N pushdown through the DSv2 catalog scan. Both
  * are PARTIAL pushes — Spark's Limit / Sort+Limit stay above and
  * re-apply exactly — so the only thing at stake is FILE count: a
  * `SELECT … LIMIT n` plans the shortest file prefix whose committed
  * tallies cover n, and an `ORDER BY c DESC LIMIT k` on a
  * stats-indexed integral column drops every file whose [min,max]
  * provably cannot reach the top k. Soundness guards under test:
  * deletion-vector'd files guarantee nothing (more files planned,
  * never fewer), NULLS FIRST keeps null-bearing files, pushed filters
  * decline the reduction entirely. */
class PushdownLimitTopNSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cat: String = {
    val wh = tmpDir("pushdown_wh")
    spark.conf.set("spark.sql.catalog.pcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pcat.ns")
    "pcat"
  }

  /** 8 single-file commits of 100 rows each, ids [i*100, i*100+100). */
  private def eightFiles(name: String): (String, IncrementalTable) = {
    spark.sql(s"CREATE TABLE $cat.ns.$name (id BIGINT) " +
      "TBLPROPERTIES ('graft.statsColumns' = 'id')")
    val root = spark.conf.get("spark.sql.catalog.pcat.warehouse") + s"/ns/$name"
    val t = IncrementalTable(spark, root)
    (0 until 8).foreach { i =>
      t.append(spark.range(i * 100L, i * 100L + 100).toDF("id").repartition(1),
        Nil, statsColumns = Seq("id"))
    }
    assert(t.detail().head.getAs[Long]("num_files") == 8)
    (root, t)
  }

  test("LIMIT plans one file of eight; result size exact") {
    val (root, _) = eightFiles("lim")
    val out = spark.sql(s"SELECT id FROM $cat.ns.lim LIMIT 7").collect()
    assert(out.length == 7)
    val scan = GraftRelation.lastScan(root).get
    assert(scan.filesScanned == 1,
      s"LIMIT 7 should plan 1 file of 8, planned ${scan.filesScanned}")
    // a limit beyond the table plans everything and returns everything
    assert(spark.sql(s"SELECT id FROM $cat.ns.lim LIMIT 9999").count() == 800)
    assert(GraftRelation.lastScan(root).get.filesScanned == 8)
  }

  test("TOP-N DESC prunes to the newest file; values exact") {
    val (root, _) = eightFiles("topd")
    val out = spark.sql(
      s"SELECT id FROM $cat.ns.topd ORDER BY id DESC LIMIT 3")
      .as[Long].collect().toSeq
    assert(out == Seq(799L, 798L, 797L))
    val scan = GraftRelation.lastScan(root).get
    assert(scan.filesScanned == 1,
      s"top-3 DESC should plan 1 file of 8, planned ${scan.filesScanned}")
  }

  test("TOP-N ASC (nulls-first default) prunes null-free files; keeps null-bearing") {
    val (root, t) = eightFiles("topa")
    val asc = spark.sql(s"SELECT id FROM $cat.ns.topa ORDER BY id LIMIT 3")
      .as[Long].collect().toSeq
    assert(asc == Seq(0L, 1L, 2L))
    assert(GraftRelation.lastScan(root).get.filesScanned == 1)
    // a 9th file holding NULL ids: under ASC NULLS FIRST those nulls
    // ARE the top rows — the planner must keep that file
    t.append(Seq[Option[Long]](None, None).toDF("id").repartition(1),
      Nil, statsColumns = Seq("id"))
    val withNulls = spark.sql(
      s"SELECT id FROM $cat.ns.topa ORDER BY id LIMIT 3").collect()
    assert(withNulls.count(_.isNullAt(0)) == 2,
      "ASC NULLS FIRST top-3 must surface both null rows")
    assert(GraftRelation.lastScan(root).get.filesScanned == 2,
      "null-bearing file + best value file")
    // DESC (nulls LAST): the value guarantee excludes nulls — the
    // null file prunes away again
    val desc = spark.sql(
      s"SELECT id FROM $cat.ns.topa ORDER BY id DESC LIMIT 3")
      .as[Long].collect().toSeq
    assert(desc == Seq(799L, 798L, 797L))
    assert(GraftRelation.lastScan(root).get.filesScanned == 1)
  }

  test("deletion vectors void a file's guarantee: more files planned, exact rows") {
    val (root, t) = eightFiles("dv")
    // delete most of the newest file merge-on-read (deletion vector):
    // its committed tally (100) no longer reflects live rows
    t.deleteVectorized(org.apache.spark.sql.functions.expr("id >= 705"))
    assert(t.liveDv().nonEmpty, "expected a standing deletion vector")
    // top-10 DESC: the DV'd file contributes 0 to the threshold, so the
    // planner keeps it AND enough whole files to cover k=10
    val out = spark.sql(
      s"SELECT id FROM $cat.ns.dv ORDER BY id DESC LIMIT 10")
      .as[Long].collect().toSeq
    assert(out == (695L to 704L).reverse)
    val scan = GraftRelation.lastScan(root).get
    assert(scan.filesScanned == 2,
      s"DV'd newest + its predecessor, planned ${scan.filesScanned}")
    // LIMIT likewise: DV'd file guarantees 0, prefix extends past it
    assert(spark.sql(s"SELECT id FROM $cat.ns.dv LIMIT 100").count() == 100)
  }

  test("pushed filters decline the reduction; results stay exact") {
    val (root, _) = eightFiles("flt")
    val out = spark.sql(s"SELECT id FROM $cat.ns.flt " +
      "WHERE id % 10 = 3 ORDER BY id DESC LIMIT 4").as[Long].collect().toSeq
    assert(out == Seq(793L, 783L, 773L, 763L))
    // the filter's own skipping prune applies (all files match here);
    // the TopN reduction must NOT have dropped below the filter prune
    assert(GraftRelation.lastScan(root).get.filesScanned == 8)
  }

  test("library parity: limitFiles / topNFiles math on raw file lists") {
    val (_, t) = eightFiles("lib")
    val files = t.liveFiles()
    assert(t.limitFiles(files, 150).size == 2)
    assert(t.limitFiles(files, 801).size == 8)
    val top = t.topNFiles(files, "id", 5, descending = true,
      nullsFirst = false)
    assert(top.exists(_.size == 1))
    val bottom = t.topNFiles(files, "id", 150, descending = false,
      nullsFirst = false)
    assert(bottom.exists(_.size == 2))
    // unprovable threshold (k > guaranteed rows) disarms
    assert(t.topNFiles(files, "id", 1000, descending = true,
      nullsFirst = false).isEmpty)
  }
}
