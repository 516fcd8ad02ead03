package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

import graft.SparkSpec

/** Bucketed co-located join: the layout must (a) be invisible to results
  * and (b) actually remove the join-side exchanges from the executed
  * plan — the whole point of paying the bucketed write. (The per-bucket
  * SortExec legitimately remains: since SPARK-24528 the bucketed scan
  * does not report output ordering unless a legacy flag is set, so the
  * local sort — an O(n) pass over already-sorted runs, no data movement
  * — is the expected Spark 3+/4 shape.) */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case _ => p.children
    }
    p +: kids.flatMap(collectNodes)
  }

  test("join on bucketed tables: no exchange below the SMJ; result equals plain join") {
    val li = graft.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_extendedprice")
    val ord = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderpriority")
    val (bli, bord) = Bucketing.bucketedPair(
      spark, li -> "l_orderkey", ord -> "o_orderkey", buckets = 8)

    // hint("merge"): at test scale the planner would broadcast (both
    // sides fit); the layout exists for the scale where it can't.
    val joined = bli.hint("merge").join(bord, $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan
    val nodes = collectNodes(plan)
    val smjs = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a sort-merge join:\n$plan")
    assert(nodes.exists {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.bucketedScan
      case _ => false
    }, s"scan is not bucketed:\n$plan")
    val below = smjs.flatMap(_.children).flatMap(collectNodes)
    assert(!below.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"bucketed join still shuffles:\n$plan")

    val got = joined.groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    val want = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    assert(got == want && want.nonEmpty)
  }

  test("one file per bucket (scan parallelism stays bucket-aligned)") {
    val ord = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderpriority")
    val (ba, _) = Bucketing.bucketedPair(
      spark, ord -> "o_orderkey", ord -> "o_orderkey", buckets = 8)
    val files = ba.inputFiles
    assert(files.length == 8, s"expected 8 bucket files, got ${files.length}")
  }
}
