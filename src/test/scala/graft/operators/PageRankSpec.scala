package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def edges = Tables.lineitem(spark, dir)
    .select((col("l_partkey") * 2).as("pa"), (col("l_suppkey") * 2 + 1).as("sb"))
    .distinct()

  test("rank is conserved: sums to 1 (no dangling mass in a symmetrized graph)") {
    val total = PageRank.run(edges, "pa", "sb", iters = 10)
      .agg(sum("rank")).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("degree asymmetry shows: every supplier outranks every part") {
    // bipartite: few suppliers each linked to many parts
    val pr = PageRank.run(edges, "pa", "sb", iters = 10)
    val maxPart = pr.filter(col("id") % 2 === 0).agg(max("rank")).head.getDouble(0)
    val minSupp = pr.filter(col("id") % 2 === 1).agg(min("rank")).head.getDouble(0)
    assert(minSupp > maxPart)
  }

  test("fixed iteration count is a pure function of the input (replay-identical)") {
    val a = PageRank.run(edges, "pa", "sb", iters = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = PageRank.run(edges, "pa", "sb", iters = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b)
  }

  test("more iterations converge: iter-10 vs iter-9 delta below iter-2 vs iter-1") {
    def ranks(k: Int) = PageRank.run(edges, "pa", "sb", iters = k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val (r1, r2, r9, r10) = (ranks(1), ranks(2), ranks(9), ranks(10))
    def delta(x: Map[Long, Double], y: Map[Long, Double]) =
      x.map { case (k, v) => math.abs(v - y(k)) }.sum
    assert(delta(r10, r9) < delta(r2, r1) / 2)
  }
}
