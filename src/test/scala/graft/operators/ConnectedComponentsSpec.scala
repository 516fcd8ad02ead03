package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chains, stars, and disjoint components all collapse to min labels") {
    // chain 1-2-3-4-5 (diameter stresses the propagation rounds),
    // star 10-{11,12,13}, disjoint pair 20-21
    val edges = Seq[(Long, Long)](
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (11L, 10L), (12L, 10L), (13L, 10L),
      (21L, 20L))
    val got = cc(edges)
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("transitive near-dups collapse even when endpoints never pair directly") {
    // A~B, B~C but no A~C edge — one cluster, representative A
    val got = cc(Seq((100L, 200L), (200L, 300L)))
    assert(got == Map(100L -> 100L, 200L -> 100L, 300L -> 100L))
  }
}
