package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted join/aggregation must be result-identical to the unsalted
  * plans on pathologically skewed keys, and a SQL-frontend sanity check
  * proves the engine's SQL entry point agrees with the DataFrame API. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of fact rows share one key — the classic stranded-reducer shape
  private def skewedFact = spark.range(0, 10000)
    .select(
      when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 50).as("k"),
      ($"id" * 3).as("v"))
  private def dim = (0L until 50L).map(k => (k, s"name$k")).toDF("k", "kname")

  test("saltedJoin equals the plain join on skewed keys") {
    val plain = skewedFact.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(skewedFact, dim, Seq("k"), salts = 8)
    assert(salted.count() == plain.count())
    val pa = plain.groupBy($"k").agg(sum($"v").as("sv"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val sa = salted.groupBy($"k").agg(sum($"v").as("sv"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(pa == sa)
  }

  test("saltedSums equals direct aggregation") {
    val direct = skewedFact.groupBy($"k")
      .agg(sum($"v").as("sv"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSums(skewedFact, Seq("k"), 8, Map("sv" -> $"v"))
      .select($"k", $"sv", $"n_rows")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("SQL frontend agrees with the DataFrame plan (free via Catalyst)") {
    graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("lineitem_v")
    val sql = spark.sql(
      """SELECT l_returnflag, CAST(SUM(l_quantity) AS BIGINT) AS sq, COUNT(*) AS n
        |FROM lineitem_v GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(_.toSeq).toSeq
    val df = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity").cast("long").as("sq"), count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
      .collect().map(_.toSeq).toSeq
    assert(sql == df)
  }
}
