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

  private def ccStar(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.runStar(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  /** Reference union-find for the randomized comparison. */
  private def ccRef(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("large-star/small-star equals label propagation and union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { _ =>
      val n = 2 + rnd.nextInt(40)
      val m = 1 + rnd.nextInt(60)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val expect = ccRef(edges)
        assert(ccStar(edges) == expect)
        assert(cc(edges) == expect)
      }
    }
  }

  test("a self-loop-only node is still labeled (both algorithms)") {
    assert(ccStar(Seq((5L, 5L))) == Map(5L -> 5L))
    assert(cc(Seq((5L, 5L))) == Map(5L -> 5L))
  }

  test("star contraction handles the long chain label propagation is worst at") {
    // 0-1-2-...-60: diameter 60, label propagation would need 60 rounds
    // (its default cap is 25); star contraction converges in O(log n)
    val chain = (0L until 60L).map(i => (i, i + 1))
    assert(ccStar(chain) == (0L to 60L).map(_ -> 0L).toMap)
  }
}
