package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.Vectors.{Scored, TopK}

/** The bounded-insert TopK Aggregator (no per-row sort, VERDICT r2 next
  * #7) must agree with the obvious dedup-sort-take-k reference under ANY
  * partitioning of the input into reduce groups and any merge order —
  * exactly the freedom Spark's partial aggregation has.
  *
  * TopK's contract (round 4): the score is a pure function of
  * (query, neighbor), so a repeated nid always carries the same sim —
  * multi-table LSH (q27) presents such repeats once per colliding
  * table, and the buffer keeps the first. The generator derives sim
  * from nid to model that contract; the reference dedups by nid. */
object VectorsProps extends Properties("vectors.topk") {

  // sim is a deterministic function of nid (same-neighbor repeats are
  // bit-identical, as in real queries); coarse rounding => score ties
  // ACROSS different nids still happen often
  private def simOf(nid: Long): Double =
    math.rint(math.sin(nid.toDouble) * 4) / 4

  private val entries: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.chooseNum(0L, 30L).map(nid => (simOf(nid), nid)))

  property("insert+merge == dedup-sort-take-k under any partitioning") =
    forAll(entries, Gen.choose(1, 8), Gen.choose(1, 6), Gen.choose(0, 1000)) {
      (xs, k, nParts, seed) =>
        val agg = new TopK(k)
        val rnd = new scala.util.Random(seed)
        // random partitioning into reduce groups
        val parts = xs.map(x => (rnd.nextInt(nParts), x)).groupBy(_._1)
          .values.map(_.map(_._2)).toList
        val reduced = parts.map(_.foldLeft(agg.zero) { (b, x) =>
          agg.reduce(b, Scored(0L, x._2, x._1))
        })
        // random merge order (fold in shuffled sequence)
        val merged = rnd.shuffle(reduced).foldLeft(agg.zero)(agg.merge)

        val expected = xs.distinct
          .sortBy { case (sim, nid) => (-sim, nid) }.take(k)
        merged == expected
    }

  property("buffer never exceeds k, stays ordered, no duplicate nid") =
    forAll(entries, Gen.choose(1, 5)) { (xs, k) =>
      val agg = new TopK(k)
      val buf = xs.foldLeft(agg.zero) { (b, x) =>
        agg.reduce(b, Scored(0L, x._2, x._1))
      }
      buf.size <= k &&
      buf.map(_._2).distinct.size == buf.size &&
      buf.sliding(2).forall {
        case Seq((s1, n1), (s2, n2)) => s1 > s2 || (s1 == s2 && n1 < n2)
        case _ => true
      }
    }
}
