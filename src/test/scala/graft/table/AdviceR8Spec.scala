package graft.table

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** Pins the round-8 ADVICE fixes: cloneTo carries the default/identity/
  * idhw/genexpr channels, string-truncate partition pruning keeps the
  * hive default dir (it holds non-null empty-string rows), GENERATED
  * ALWAYS identity refuses explicit values on INSERT OVERWRITE and
  * UPDATE SET (not just append), CALL restore parses timestamps under
  * the SESSION timezone, and days() dir tokens stay write/prune-exact
  * at |micros| > 2^53 (integral div, no double division). */
class AdviceR8Spec extends SparkSpec {
  import spark.implicits._

  test("cloneTo carries defaults, identity (with high-water), and generated columns") {
    val src = IncrementalTable(spark, tmpDir("advr8") + "/csrc")
    src.create(StructType.fromDDL("id BIGINT, a INT, c INT"),
      meta = Map("identity/id" -> "1,1,false", "genexpr/c" -> "a + 1"))
    src.append(Seq(10, 20).toDF("a"), Nil) // ids minted 1,2; c computed
    // a column added AFTER those rows, with a default the old files read
    src.alter(additions = StructType.fromDDL("d INT"),
      defaults = Map("d" -> "7"))
    val dstRoot = tmpDir("advr8") + "/cdst"
    src.cloneTo(dstRoot)
    val dst = IncrementalTable(spark, dstRoot)
    // default/ carried: the cloned references read 7, not NULL
    assert(dst.read().select("d").as[Int].collect().toSeq == Seq(7, 7))
    // identity/ + idhw/ carried: the clone keeps minting UNIQUE ids
    // from the source's high-water instead of restarting (or nulling)
    dst.append(Seq(30).toDF("a"), Nil)
    assert(dst.read().select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // genexpr/ carried: computed when omitted, verified when carried
    assert(dst.read().filter(col("c") =!= col("a") + 1).count() == 0)
    val e = intercept[Exception](
      dst.append(Seq((99L, 5, 6)).toDF("id", "a", "c"), Nil))
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    // the source is untouched by the clone's mint
    assert(src.read().count() == 2)
  }

  test("truncate(w, string): empty-string rows live in the default dir and survive value-bounded prunes") {
    val t = IncrementalTable(spark, tmpDir("advr8") + "/trunc")
    t.create(StructType.fromDDL("s STRING, v INT"),
      partitionBy = Seq("s_trunc"),
      transforms = Map("s_trunc" -> "truncate(4,s)"))
    t.append(Seq((Some(""), 1), (Some("apple"), 2), (Some("zebra"), 3),
      (Option.empty[String], 0)).toDF("s", "v"), Seq("s_trunc"))
    // pre-fix: s < 'a' set dropNulls=true and pruned the default dir —
    // silently losing the s="" row that dir holds
    assert(t.readWhere(col("s") < "a").select("v").as[Int].collect().toSeq
      == Seq(1))
    assert(t.readWhere(col("s") === "").select("v").as[Int].collect().toSeq
      == Seq(1))
    // IS NOT NULL must keep it too (s="" IS NOT NULL)
    assert(t.readWhere(col("s").isNotNull).count() == 3)
    // IS NULL still answers exactly (the full predicate runs over the
    // kept default dir)
    assert(t.readWhere(col("s").isNull).select("v").as[Int].collect().toSeq
      == Seq(0))
    // value-dir pruning still works
    assert(t.readWhere(col("s") === "apple").select("v").as[Int]
      .collect().toSeq == Seq(2))
  }

  test("GENERATED ALWAYS identity refuses INSERT OVERWRITE values and UPDATE SET") {
    val t = IncrementalTable(spark, tmpDir("advr8") + "/ida")
    t.create(StructType.fromDDL("id BIGINT, v STRING"),
      meta = Map("identity/id" -> "1,1,false"))
    t.append(Seq("a").toDF("v"), Nil)
    // INSERT OVERWRITE (replaceWhere) with an explicit value: refused
    val e1 = intercept[Exception](t.replaceWhere(
      Seq((99L, "x")).toDF("id", "v"), Nil, Map.empty, Map.empty))
    assert(e1.getMessage.contains("GENERATED ALWAYS"), e1.getMessage)
    // UPDATE ... SET id: refused on both the CoW and MOR paths
    val e2 = intercept[IllegalArgumentException](
      t.update(col("v") === "a", Map("id" -> lit(5L))))
    assert(e2.getMessage.contains("GENERATED ALWAYS"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      t.updateVectorized(col("v") === "a", Map("id" -> lit(5L))))
    assert(e3.getMessage.contains("GENERATED ALWAYS"), e3.getMessage)
    // an overwrite OMITTING the column still mints
    t.replaceWhere(Seq("b").toDF("v"), Nil, Map.empty, Map.empty)
    assert(t.read().select("v").as[String].collect().toSeq == Seq("b"))
    assert(t.read().select("id").as[Long].collect().head >= 1L)
    // BY DEFAULT identity accepts explicit UPDATE SET
    val d = IncrementalTable(spark, tmpDir("advr8") + "/idd")
    d.create(StructType.fromDDL("id BIGINT, v STRING"),
      meta = Map("identity/id" -> "1,1,true"))
    d.append(Seq("a").toDF("v"), Nil)
    d.update(col("v") === "a", Map("id" -> lit(50L)))
    assert(d.read().select("id").as[Long].collect().toSeq == Seq(50L))
  }

  test("CALL restore parses its timestamp under the session timezone") {
    val wh = tmpDir("advr8_wh")
    spark.conf.set("spark.sql.catalog.advr8",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.advr8.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS advr8.lake")
    spark.sql("CREATE TABLE advr8.lake.rst (k BIGINT)")
    spark.sql("INSERT INTO advr8.lake.rst VALUES (1)")
    val t = IncrementalTable(spark, s"$wh/lake/rst")
    val head = t.latestVersion
    val headTs = t.commits().last.ts
    // a minute past head, rendered as a LOCAL timestamp in a zone
    // BEHIND UTC: a UTC (or JVM-default) parse lands hours BEFORE the
    // first commit and versionAtTimestamp fails loudly — only the
    // session-timezone parse resolves to head
    val zone = java.time.ZoneId.of("America/Los_Angeles")
    val local = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(headTs + 60000), zone)
    val s = local.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val row = spark.sql(
        s"CALL advr8.system.restore('lake.rst', timestamp => '$s')").head
      assert(row.getLong(1) == head, row.toString)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("days() dir tokens are write/prune-exact past 2^53 micros (integral div)") {
    val t = IncrementalTable(spark, tmpDir("advr8") + "/xts")
    val schema = StructType.fromDDL("ts TIMESTAMP, v INT")
    t.create(schema, partitionBy = Seq("ts_day"),
      transforms = Map("ts_day" -> "days(ts)"))
    // 2260 epoch micros ≈ 9.16e15 > 2^53; pre-epoch 1600s ≈ -1.17e16
    val far = java.time.Instant.parse("2260-06-15T12:34:56Z")
    val old = java.time.Instant.parse("1601-02-03T04:05:06Z")
    t.append(Seq((far, 1), (old, 2)).toDF("ts", "v"), Seq("ts_day"))
    val tr = PartitionTransform.parse("days(ts)", schema)
    Seq(far -> 1, old -> 2).foreach { case (i, v) =>
      val micros = i.getEpochSecond * 1000000L + i.getNano / 1000L
      val token = tr.eval(micros)
      // the written dir carries exactly eval's token (write parity)...
      val dir = new java.io.File(t.root, s"ts_day=$token")
      assert(dir.isDirectory, s"missing dir ts_day=$token for $i")
      // ...and the pruned read finds the row (infer parity)
      assert(t.readWhere(col("ts") === lit(java.sql.Timestamp.from(i)))
        .select("v").as[Int].collect().toSeq == Seq(v))
    }
  }
}
