package graft.table

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Column NDV statistics for CBO (X88, VERDICT r8 #8): one HLL sketch
  * per `graft.ndvColumns` column folded at every commit, surfaced
  * through the catalog scan's SupportsReportStatistics column stats —
  * so CostBasedJoinReorder plans multi-joins over graft tables on real
  * per-key cardinalities instead of row counts alone. */
class NdvStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cat: String = {
    val wh = tmpDir("ndv_wh")
    spark.conf.set("spark.sql.catalog.ndv",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ndv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ndv.lake")
    "ndv"
  }
  private def wh = spark.conf.get("spark.sql.catalog.ndv.warehouse")

  test("ndv sketches fold across commits; estimates track true distinct counts") {
    val t = IncrementalTable(spark, tmpDir("ndv") + "/t1")
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v BIGINT"),
      meta = Map("prop/graft.ndvColumns" -> "k,v",
        "prop/graft.statsColumns" -> "k"))
    t.append(spark.range(0, 1000).select(
      (col("id") % 10).as("k"), col("id").as("v")), Nil)
    t.append(spark.range(1000, 2000).select(
      (col("id") % 20).as("k"), col("id").as("v")), Nil)
    val ndv = t.columnNdv()
    // k: 20 distinct (exact in HLL's sparse regime); v: 2000 within 5%
    assert(ndv("k") == 20L, ndv.toString)
    assert(math.abs(ndv("v") - 2000L) <= 100L, ndv.toString)
    // rename follows the channel
    t.renameColumn("k", "key")
    assert(t.columnNdv()("key") == 20L)
    assert(!t.columnNdv().contains("k"))
  }

  test("ndv sketches fold through the streaming sink's fast path too") {
    import org.apache.spark.sql.streaming.Trigger
    spark.sql(s"CREATE TABLE $cat.lake.sn (k BIGINT) " +
      "TBLPROPERTIES ('graft.ndvColumns'='k')")
    val dir = tmpDir("ndv_stream")
    spark.range(0, 500).select((col("id") % 25).as("k"))
      .coalesce(1).write.parquet(s"$dir/in/f0")
    spark.readStream.schema(spark.range(1).select(col("id").as("k")).schema)
      .option("recursiveFileLookup", "true").parquet(s"$dir/in")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .toTable(s"$cat.lake.sn").awaitTermination()
    val t = IncrementalTable(spark, s"$wh/lake/sn")
    assert(t.columnNdv().get("k").contains(25L), t.columnNdv().toString)
  }

  test("CALL analyze recomputes sketches retroactively and resets delete drift") {
    spark.sql(s"CREATE TABLE $cat.lake.az (k BIGINT) " +
      "TBLPROPERTIES ('graft.statsColumns'='k')")
    spark.sql(s"INSERT INTO $cat.lake.az " +
      "SELECT CAST(id % 50 AS BIGINT) FROM range(1000)")
    val t = IncrementalTable(spark, s"$wh/lake/az")
    assert(t.columnNdv().isEmpty) // no property, nothing folded
    // retroactive: the scan covers data written before the opt-in
    spark.sql(s"ALTER TABLE $cat.lake.az SET TBLPROPERTIES " +
      "('graft.ndvColumns'='k')")
    spark.sql(s"CALL $cat.system.analyze('lake.az')")
    t.refresh()
    assert(t.columnNdv().get("k").contains(50L), t.columnNdv().toString)
    // the incremental union never shrinks after a delete...
    spark.sql(s"DELETE FROM $cat.lake.az WHERE k >= 10")
    t.refresh()
    assert(t.columnNdv()("k") >= 50L)
    // ...analyze resets it to the live truth
    spark.sql(s"CALL $cat.system.analyze('lake.az')")
    t.refresh()
    assert(t.columnNdv().get("k").contains(10L), t.columnNdv().toString)
  }

  test("under CBO, multi-join plans carry graft stats nodes with distinctCount") {
    spark.sql(s"CREATE TABLE $cat.lake.s1 (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.ndvColumns'='k', 'graft.statsColumns'='k')")
    spark.sql(s"INSERT INTO $cat.lake.s1 " +
      "SELECT CAST(id % 7 AS BIGINT) AS k, id AS v FROM range(500)")
    val prevC = spark.conf.get("spark.sql.cbo.enabled")
    val prevR = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      val df = spark.sql(
        s"SELECT count(*) FROM $cat.lake.s1 a " +
          s"JOIN $cat.lake.s1 b ON a.k = b.k " +
          s"JOIN $cat.lake.s1 c ON b.v = c.v")
      val nodes = df.queryExecution.optimizedPlan.collect {
        case n: graft.plans.GraftStatsNode => n
      }
      assert(nodes.size == 3, df.queryExecution.optimizedPlan.toString)
      val st = nodes.head.stats
      assert(st.rowCount.contains(BigInt(500)), st.toString)
      assert(st.attributeStats.exists { case (a, cs) =>
        a.name == "k" && cs.distinctCount.contains(BigInt(7)) &&
          cs.min.contains(0L) && cs.max.contains(6L)
      }, st.toString)
      // the stats node plans away: execution answers exactly
      assert(df.as[Long].head > 0L)
      // single-table plans stay untouched (no pushdown tax outside the
      // multi-join CBO regime)
      val single = spark.sql(s"SELECT k FROM $cat.lake.s1 WHERE k = 3")
      assert(single.queryExecution.optimizedPlan.collect {
        case n: graft.plans.GraftStatsNode => n
      }.isEmpty)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevC)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevR)
    }
  }

  test("join reorder: NDV stats flip a 3-table join order row counts get wrong") {
    // a: 20k rows, k has NDV 20 (a ⋈ b explodes), j unique (a ⋈ c tight)
    spark.sql(s"CREATE TABLE $cat.lake.ja (k BIGINT, j BIGINT) " +
      "TBLPROPERTIES ('graft.ndvColumns'='k,j', 'graft.statsColumns'='k')")
    spark.sql(s"INSERT INTO $cat.lake.ja " +
      "SELECT CAST(id % 20 AS BIGINT), id FROM range(20000)")
    spark.sql(s"CREATE TABLE $cat.lake.jb (k BIGINT) " +
      "TBLPROPERTIES ('graft.ndvColumns'='k', 'graft.statsColumns'='k')")
    spark.sql(s"INSERT INTO $cat.lake.jb " +
      "SELECT CAST(id % 20 AS BIGINT) FROM range(20000)")
    spark.sql(s"CREATE TABLE $cat.lake.jc (j BIGINT) " +
      "TBLPROPERTIES ('graft.ndvColumns'='j', 'graft.statsColumns'='j')")
    spark.sql(s"INSERT INTO $cat.lake.jc SELECT id FROM range(20000)")
    val q = s"SELECT count(*) FROM $cat.lake.ja a " +
      s"JOIN $cat.lake.jb b ON a.k = b.k " +
      s"JOIN $cat.lake.jc c ON a.j = c.j"
    def leafOrder(cbo: Boolean): Seq[String] = {
      val prevC = spark.conf.get("spark.sql.cbo.enabled")
      val prevR = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      try spark.sql(q).queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString)
        .map { s =>
          if (s.contains("ja")) "a" else if (s.contains("jb")) "b"
          else if (s.contains("jc")) "c" else "?"
        }
      finally {
        spark.conf.set("spark.sql.cbo.enabled", prevC)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevR)
      }
    }
    // without CBO: syntactic order (a ⋈ b) ⋈ c — the 20M-row
    // intermediate; with CBO + our NDV stats: (a ⋈ c) first, the
    // 20k-row intermediate, b joined last
    assert(leafOrder(cbo = false) == Seq("a", "b", "c"))
    val reordered = leafOrder(cbo = true)
    assert(reordered.indexOf("c") < reordered.indexOf("b"), reordered.toString)
    // and the answer is the same either way
    assert(spark.sql(q).as[Long].head == 20000000L)
  }

  test("histograms (X93): a skewed equality flips a join order NDV-uniform gets wrong") {
    // ha.s is Zipfian-shaped: value 0 holds 19,900 of 20,000 rows,
    // values 1..100 one row each — NDV(s)=101, so the uniform estimate
    // for s=0 is rows/ndv ~ 198 while the truth is ~19,900 (100x off,
    // in the direction that picks the WRONG first join)
    spark.sql(s"CREATE TABLE $cat.lake.ha (s BIGINT, j BIGINT) " +
      "TBLPROPERTIES ('graft.ndvColumns'='s,j', 'graft.statsColumns'='s')")
    spark.sql(s"INSERT INTO $cat.lake.ha " +
      "SELECT CASE WHEN id < 19900 THEN 0L ELSE id - 19899 END, " +
      "CAST(id % 1000 AS BIGINT) FROM range(20000)")
    spark.sql(s"CREATE TABLE $cat.lake.hb (j BIGINT, m BIGINT) " +
      "TBLPROPERTIES ('graft.ndvColumns'='j,m', 'graft.statsColumns'='j')")
    spark.sql(s"INSERT INTO $cat.lake.hb SELECT id, id FROM range(1000)")
    spark.sql(s"CREATE TABLE $cat.lake.hc (m BIGINT) " +
      "TBLPROPERTIES ('graft.ndvColumns'='m', 'graft.statsColumns'='m')")
    spark.sql(s"INSERT INTO $cat.lake.hc SELECT id FROM range(1000)")
    val q = s"SELECT count(*) FROM $cat.lake.ha a " +
      s"JOIN $cat.lake.hb b ON a.j = b.j " +
      s"JOIN $cat.lake.hc c ON b.m = c.m WHERE a.s = 0"
    def leafOrder(): Seq[String] = {
      val prevC = spark.conf.get("spark.sql.cbo.enabled")
      val prevR = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      try spark.sql(q).queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString)
        .map { s =>
          if (s.contains("ha")) "a" else if (s.contains("hb")) "b"
          else if (s.contains("hc")) "c" else "?"
        }
      finally {
        spark.conf.set("spark.sql.cbo.enabled", prevC)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevR)
      }
    }
    // estimates: |σ(a)⋈b| scales with the s=0 estimate (~198 uniform vs
    // ~19,700 histogram) while |b⋈c| is fixed at 1,000 — so NDV-uniform
    // joins the (supposedly tiny) filtered a first...
    val uniform = leafOrder()
    assert(uniform.indexOf("a") == 0, uniform.toString)
    // ...and ANALYZE's equi-height histogram (percentile-bound bins:
    // ~63 of 64 pinned at [0,0]) corrects the selectivity, flipping the
    // plan to (b⋈c) first with the 19,900-row a joined LAST
    spark.sql(s"CALL $cat.system.analyze('lake.ha')")
    val t = IncrementalTable(spark, s"$wh/lake/ha")
    val hist = t.columnHistograms().get("s")
    assert(hist.isDefined, "ANALYZE did not commit a histogram for s")
    assert(hist.get._2.count(b => b._1 == 0.0 && b._2 == 0.0) >= 32,
      s"skew not captured: ${hist.get._2.take(5)}...")
    val skewAware = leafOrder()
    assert(skewAware.indexOf("a") > skewAware.indexOf("b") &&
      skewAware.indexOf("a") > skewAware.indexOf("c"),
      s"histogram did not flip the join order: $skewAware")
    // exactness is untouched by planning: 19,900 a-rows x 1:1 joins
    assert(spark.sql(q).as[Long].head == 19900L)
    // histograms follow RENAME like every logically-keyed channel
    t.renameColumn("s", "sk")
    assert(t.columnHistograms().contains("sk"))
    assert(!t.columnHistograms().contains("s"))
  }

  test("STRING histograms (VERDICT r13 #6): a Zipfian string key flips the join order — the X93 twin") {
    // sa.s is the string Zipfian: 'hot' holds 19,900 of 20,000 rows,
    // 'u<i>' strings one row each — NDV(s)=101, so the uniform guess
    // for s='hot' is rows/ndv ~ 198 while the truth is 19,900. Spark's
    // FilterEstimation cannot price a string equality from a histogram
    // (no literal->double conversion), so this exercises the rule's own
    // hash-space override.
    spark.sql(s"CREATE TABLE $cat.lake.sa (s STRING, j BIGINT) " +
      "TBLPROPERTIES ('graft.ndvColumns'='s,j', 'graft.statsColumns'='j')")
    spark.sql(s"INSERT INTO $cat.lake.sa " +
      "SELECT CASE WHEN id < 19900 THEN 'hot' ELSE concat('u', id) END, " +
      "CAST(id % 1000 AS BIGINT) FROM range(20000)")
    spark.sql(s"CREATE TABLE $cat.lake.sb (j BIGINT, m BIGINT) " +
      "TBLPROPERTIES ('graft.ndvColumns'='j,m', 'graft.statsColumns'='j')")
    spark.sql(s"INSERT INTO $cat.lake.sb SELECT id, id FROM range(1000)")
    spark.sql(s"CREATE TABLE $cat.lake.sc (m BIGINT) " +
      "TBLPROPERTIES ('graft.ndvColumns'='m', 'graft.statsColumns'='m')")
    spark.sql(s"INSERT INTO $cat.lake.sc SELECT id FROM range(1000)")
    val q = s"SELECT count(*) FROM $cat.lake.sa a " +
      s"JOIN $cat.lake.sb b ON a.j = b.j " +
      s"JOIN $cat.lake.sc c ON b.m = c.m WHERE a.s = 'hot'"
    def leafOrder(): Seq[String] = {
      val prevC = spark.conf.get("spark.sql.cbo.enabled")
      val prevR = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      try spark.sql(q).queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString)
        .map { s =>
          if (s.contains("sa")) "a" else if (s.contains("sb")) "b"
          else if (s.contains("sc")) "c" else "?"
        }
      finally {
        spark.conf.set("spark.sql.cbo.enabled", prevC)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevR)
      }
    }
    // NDV-uniform: the "tiny" filtered a joins first
    val uniform = leafOrder()
    assert(uniform.indexOf("a") == 0, uniform.toString)
    // ANALYZE commits hash-space bins; the hot string pins singleton
    // [h,h] bins exactly like a hot integer pins [0,0] bins
    spark.sql(s"CALL $cat.system.analyze('lake.sa')")
    val t = IncrementalTable(spark, s"$wh/lake/sa")
    val hist = t.columnHistograms().get("s")
    assert(hist.isDefined, "ANALYZE did not commit a histogram for s")
    assert(hist.get._2.count(b => b._1 == b._2) >= 32,
      s"string skew not captured: ${hist.get._2.take(5)}...")
    val skewAware = leafOrder()
    assert(skewAware.indexOf("a") > skewAware.indexOf("b") &&
      skewAware.indexOf("a") > skewAware.indexOf("c"),
      s"string histogram did not flip the join order: $skewAware")
    assert(spark.sql(q).as[Long].head == 19900L)

    // a multi-join ON a skewed string key itself must PLAN and answer
    // with histograms on both sides (JoinEstimation's bin-overlap path
    // — and never FilterEstimation's literal conversion)
    spark.sql(s"CREATE TABLE $cat.lake.sd (s STRING) " +
      "TBLPROPERTIES ('graft.ndvColumns'='s')")
    spark.sql(s"INSERT INTO $cat.lake.sd " +
      "SELECT CASE WHEN id < 50 THEN 'hot' ELSE concat('v', id) END " +
      "FROM range(100)")
    spark.sql(s"CALL $cat.system.analyze('lake.sd')")
    val qj = s"SELECT count(*) FROM $cat.lake.sa a " +
      s"JOIN $cat.lake.sd d ON a.s = d.s " +
      s"JOIN $cat.lake.sd e ON d.s = e.s"
    val prevC = spark.conf.get("spark.sql.cbo.enabled")
    val prevR = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try assert(spark.sql(qj).as[Long].head == 19900L * 50 * 50,
      "string-key join with two-sided histograms must answer exactly")
    finally {
      spark.conf.set("spark.sql.cbo.enabled", prevC)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevR)
    }
  }
}
