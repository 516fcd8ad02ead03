package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.Vectors.{Scored, TopK}

/** The bounded-insert TopK Aggregator (no per-row sort, VERDICT r2 next
  * #7) must agree with the obvious sort-take-k reference under ANY
  * partitioning of the input into reduce groups and any merge order —
  * exactly the freedom Spark's partial aggregation has. */
object VectorsProps extends Properties("vectors.topk") {

  private val entries: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(
      Gen.chooseNum(-1.0, 1.0),
      Gen.chooseNum(0L, 30L))) // small id range => plenty of score ties

  property("insert+merge == sort-take-k under any partitioning") =
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

        val expected = xs.sortBy { case (sim, nid) => (-sim, nid) }.take(k)
        merged == expected
    }

  property("buffer never exceeds k and stays ordered") =
    forAll(entries, Gen.choose(1, 5)) { (xs, k) =>
      val agg = new TopK(k)
      val buf = xs.foldLeft(agg.zero) { (b, x) =>
        agg.reduce(b, Scored(0L, x._2, x._1))
      }
      // non-strict: duplicate (sim, nid) inputs legitimately coexist in
      // the buffer (sort-take-k keeps multiset duplicates; real queries
      // never produce them since nid is unique per group)
      buf.size <= k && buf.sliding(2).forall {
        case Seq((s1, n1), (s2, n2)) => s1 > s2 || (s1 == s2 && n1 <= n2)
        case _ => true
      }
    }
}
