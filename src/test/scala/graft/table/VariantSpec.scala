package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VARIANT / semi-structured columns (VERDICT r12 #5): Spark 4's
  * VariantType rides the table format end to end — append, CoW
  * rewrite, DV merge-on-read, schema evolution, time travel — with
  * skipping stats gracefully BOUNDLESS on the variant column itself
  * (the X49 struct precedent: no bounds recorded, never a crash, the
  * per-row filter decides) and a SHREDDED path via X84 stored
  * generated columns: `variant_get(v, '$.k', 'bigint')` as a generated
  * column is a real stored column, so the skipping index prunes on it
  * for free. Parquet-side the writer auto-shreds (typed_value groups,
  * VARIANT logical annotation) and the reader re-assembles — both are
  * Spark's own codecs; the table format only promises the column
  * survives every one of ITS paths. */
class VariantSpec extends SparkSpec {
  import spark.implicits._

  /** id → {"k": id%10, "d": {"t": "ty<id%3>", "a": [id, id+1]}} */
  private def payload(n: Int) = spark.range(n.toLong).selectExpr("id",
    "parse_json(to_json(named_struct(" +
      "'k', id % 10, " +
      "'d', named_struct('t', concat('ty', id % 3), 'a', array(id, id + 1))" +
      "))) AS v")

  private def extract(df: DataFrame): Set[(Long, Long, String, Long)] =
    df.selectExpr("id",
      "variant_get(v, '$.k', 'bigint') AS k",
      "variant_get(v, '$.d.t', 'string') AS ty",
      "variant_get(v, '$.d.a[1]', 'bigint') AS a1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet

  private def want(ids: Seq[Long]): Set[(Long, Long, String, Long)] =
    ids.map(i => (i, i % 10, s"ty${i % 3}", i + 1)).toSet

  test("round-trip, CoW delete, DV merge-on-read, time travel, compaction") {
    val t = new IncrementalTable(spark, tmpDir("var") + "/t",
      checkpointEvery = 3, parquetThreshold = 0)
    t.append(payload(60), Nil)
    t.append(payload(120).filter($"id" >= 60), Nil)
    assert(extract(t.read()) == want(0L until 120L))
    val v0 = t.latestVersion
    // pin the pre-delete snapshot: the later commits roll the replay
    // horizon past it (checkpointEvery = 3), and tagged reads must
    // re-assemble archived variant values exactly
    t.setTag("pre-delete", v0)
    // CoW delete keyed on a variant FIELD: touched files rewrite, the
    // re-written variant values stay bit-faithful
    t.delete(expr("variant_get(v, '$.k', 'bigint') = 3"))
    assert(extract(t.read()) == want((0L until 120L).filterNot(_ % 10 == 3)))
    // DV merge-on-read delete: rows leave with no rewrite; the DV-read
    // path re-assembles the surviving variants
    t.deleteVectorized($"id" >= 110)
    assert(extract(t.read()) ==
      want((0L until 110L).filterNot(_ % 10 == 3)))
    // time travel re-assembles the pre-delete snapshot exactly
    assert(extract(t.readAt(v0)) == want(0L until 120L))
    // full CoW rewrite (compaction) is value-preserving
    t.compact(targetFiles = 2)
    assert(extract(t.read()) ==
      want((0L until 110L).filterNot(_ % 10 == 3)))
  }

  test("schema evolution: a late variant column null-fills old files") {
    val t = IncrementalTable(spark, tmpDir("var") + "/evo")
    t.append(spark.range(5).toDF("id"), Nil)
    t.append(payload(10).filter($"id" >= 5), Nil)
    val got = t.read().selectExpr("id", "variant_get(v, '$.k', 'bigint') AS k")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == ((0L until 5L).map(i => (i, -1L)) ++
      (5L until 10L).map(i => (i, i % 10))).toSet)
  }

  test("stats stay boundless on variant; sibling columns still prune (X49)") {
    val t = IncrementalTable(spark, tmpDir("var") + "/stats")
    t.append(payload(400).repartition(8), Nil)
    t.compact(targetFiles = 8, clusterBy = Seq("id"),
      statsColumns = Seq("v", "id"))
    val stats = t.liveFileStats()
    assert(stats.nonEmpty)
    assert(stats.values.forall(m => !m.contains("v")),
      "a variant column must carry NO min/max bounds")
    assert(stats.values.exists(_.contains("id")))
    val pred = $"id" >= 100 && $"id" < 150
    assert(t.liveFilesWhere(pred).size < t.liveFiles().size,
      "the sibling bigint column must still prune")
    assert(t.readWhere(pred).count() == 50)
    // a predicate on the unindexed variant itself: no pruning, no
    // crash, row-exact
    assert(t.readWhere(expr("variant_get(v, '$.k', 'bigint') = 3"))
      .count() == 40)
  }

  test("SQL door: VARIANT DDL + shredded generated column joins the stats index") {
    val wh = tmpDir("var_wh")
    spark.conf.set("spark.sql.catalog.vcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vcat.lake")
    spark.sql("""CREATE TABLE vcat.lake.vt (
      |  id BIGINT, v VARIANT,
      |  k BIGINT GENERATED ALWAYS AS (variant_get(v, '$.k', 'bigint')))
      |TBLPROPERTIES ('graft.statsColumns' = 'k')""".stripMargin)
    payload(300).createOrReplaceTempView("var_src")
    // k-disjoint inserts give each commit's files a tight k range — the
    // shape a shredded field index exists for
    (0 until 10 by 2).foreach(i => spark.sql(
      s"""INSERT INTO vcat.lake.vt (id, v)
         |SELECT id, v FROM var_src WHERE id % 10 IN ($i, ${i + 1})""".stripMargin))
    val got = spark.sql(
      """SELECT id, k, variant_get(v, '$.d.t', 'string') AS ty
        |FROM vcat.lake.vt WHERE k = 7 ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == (0L until 300L).filter(_ % 10 == 7)
      .map(i => (i, 7L, s"ty${i % 3}")))
    // the shredded column is STORED: the skipping index prunes on it
    val t = IncrementalTable(spark, s"$wh/lake/vt")
    val pruned = t.liveFilesWhere($"k" === 7)
    assert(pruned.size < t.liveFiles().size,
      s"shredded-field prune: ${pruned.size} of ${t.liveFiles().size}")
  }
}
