package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BloomJoin: the prefilter must never lose a true match (no false
  * negatives), must actually prune (measured), and the composed semi
  * join must equal the plain one row-for-row. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("bloom semi join equals the plain left_semi join") {
    val li = graft.Tables.lineitem(spark, sf)
    val hi = graft.Tables.orders(spark, sf)
      .filter($"o_totalprice" > 400000.0).select($"o_orderkey")
    val got = BloomJoin.semiJoin(li, $"l_orderkey", hi, $"o_orderkey",
        expectedItems = 100000L)
      .select($"l_orderkey", $"l_linenumber")
      .as[(Long, Long)].collect().toSet
    val want = li.join(hi, $"l_orderkey" === $"o_orderkey", "left_semi")
      .select($"l_orderkey", $"l_linenumber")
      .as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("prefilter keeps every match and prunes most non-matches pre-shuffle") {
    val li = graft.Tables.lineitem(spark, sf)
    val hi = graft.Tables.orders(spark, sf)
      .filter($"o_totalprice" > 400000.0).select($"o_orderkey")
    val total = li.count()
    val exact = li.join(hi, $"l_orderkey" === $"o_orderkey", "left_semi").count()
    val pre = BloomJoin.prefilter(li, $"l_orderkey", hi, $"o_orderkey",
      expectedItems = 100000L)
    val kept = pre.count()
    assert(kept >= exact)            // no false negatives, ever
    assert(kept <= exact + total / 50) // fpp=0.01 with slack: real pruning
    // the probe sits in the scan stage, before any exchange
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
    assert(!plan.contains("Exchange"))
  }

  test("empty build side yields an empty (schema-preserving) result") {
    val li = graft.Tables.lineitem(spark, sf)
    val none = graft.Tables.orders(spark, sf).filter(lit(false))
      .select($"o_orderkey")
    val out = BloomJoin.semiJoin(li, $"l_orderkey", none, $"o_orderkey")
    assert(out.count() == 0)
    assert(out.columns.toSeq == li.columns.toSeq)
  }
}
