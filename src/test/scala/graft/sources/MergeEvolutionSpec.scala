package graft.sources

import graft.SparkSpec
import graft.table.IncrementalTable

/** MERGE WITH SCHEMA EVOLUTION beyond the canonical upsert (X74):
  * conditional clauses assigning source-only columns. SQL rides the
  * analyzer's public evolution hook (ResolveMergeIntoSchemaEvolution,
  * armed by the AUTOMATIC_SCHEMA_EVOLUTION capability → one atomic
  * schema commit, then the merge commit); the library twin
  * ([[IncrementalTable.mergeInto]] `evolve`) widens and merges in ONE
  * commit. */
class MergeEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cat: String = {
    val wh = tmpDir("mev_wh")
    spark.conf.set("spark.sql.catalog.gmev", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmev.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmev.lake")
    "gmev"
  }
  private def rootOf(n: String): String =
    spark.conf.get(s"spark.sql.catalog.$cat.warehouse") + s"/lake/$n"

  test("SQL: conditional clauses assigning a source-only column evolve the schema") {
    spark.sql(s"CREATE TABLE $cat.lake.t1 (okey BIGINT, status STRING)")
    spark.sql(s"INSERT INTO $cat.lake.t1 VALUES (1, 'a'), (2, 'b'), (4, 'd')")
    Seq((1L, "A", 10.0), (3L, "C", 30.0), (4L, "D", 1.0))
      .toDF("okey", "status", "total").createOrReplaceTempView("mev_src")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.lake.t1 t
      |USING mev_src s ON t.okey = s.okey
      |WHEN MATCHED AND s.total > 5 THEN UPDATE SET status = s.status, total = s.total
      |WHEN MATCHED THEN DELETE
      |WHEN NOT MATCHED AND s.total > 5 THEN
      |  INSERT (okey, status, total) VALUES (s.okey, s.status, s.total)
      |""".stripMargin)
    val out = spark.table(s"$cat.lake.t1").orderBy($"okey").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    // 1 matched>5: updated with total; 2 unmatched-by-source: kept,
    // null total; 3 not-matched>5: inserted; 4 matched<=5: deleted
    assert(out.toSeq == Seq((1L, "A", 10.0), (2L, "b", -1.0), (3L, "C", 30.0)))
    // evolution is an explicit opt-in: the same shape WITHOUT the
    // clause fails resolution loudly
    spark.sql(s"CREATE TABLE $cat.lake.t2 (okey BIGINT, status STRING)")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"""MERGE INTO $cat.lake.t2 t USING mev_src s ON t.okey = s.okey
        |WHEN MATCHED THEN UPDATE SET status = s.status, total = s.total
        |""".stripMargin)
    }
    assert(e.getMessage.contains("total"), e.getMessage)
  }

  test("SQL: the schema commit and the merge commit are each atomic, in order") {
    spark.sql(s"CREATE TABLE $cat.lake.t3 (okey BIGINT, status STRING)")
    spark.sql(s"INSERT INTO $cat.lake.t3 VALUES (1, 'a')")
    Seq((1L, "A", 7L)).toDF("okey", "status", "n")
      .createOrReplaceTempView("mev_src3")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.lake.t3 t
      |USING mev_src3 s ON t.okey = s.okey
      |WHEN MATCHED AND s.n > 0 THEN UPDATE SET n = s.n
      |""".stripMargin)
    val t = IncrementalTable(spark, rootOf("t3"))
    val actions = t.commits().map(_.action)
    // create, insert, schema widening (meta), merge rewrite (replace)
    assert(actions == Seq("append", "append", "meta", "replace"), actions)
    assert(t.read().select($"okey", $"n").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 7L)))
  }

  test("library: mergeInto(evolve) widens and merges in ONE commit") {
    val t = IncrementalTable(spark, tmpDir("mev_lib") + "/t")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), Nil)
    val versionBefore = t.latestVersion
    val src = Seq((1L, "A", 100L), (3L, "C", 300L)).toDF("id", "v", "score")
    import IncrementalTable.{mergeSourceCol, WhenClause}
    t.mergeInto(src, keys = Seq("id"),
      matched = Seq(WhenClause(
        Some(mergeSourceCol("score") > 50L),
        Some(Seq("v" -> mergeSourceCol("v"), "score" -> mergeSourceCol("score"))))),
      notMatched = Seq(WhenClause(None,
        Some(Seq("id" -> mergeSourceCol("id"), "v" -> mergeSourceCol("v"),
          "score" -> mergeSourceCol("score"))))),
      notMatchedBySource = Nil,
      evolve = Seq("score"))
    assert(t.latestVersion == versionBefore + 1) // ONE commit
    val out = t.read().orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(out.toSeq == Seq((1L, "A", 100L), (2L, "b", -1L), (3L, "C", 300L)))
    assert(t.schemaAt().get.fieldNames.toSeq == Seq("id", "v", "score"))
    // an evolved name no clause assigns has no type — refused
    intercept[IllegalArgumentException] {
      t.mergeInto(src, Seq("id"),
        matched = Seq(WhenClause(None, Some(Seq("v" -> mergeSourceCol("v"))))),
        notMatched = Nil, notMatchedBySource = Nil, evolve = Seq("ghost"))
    }
  }
}
