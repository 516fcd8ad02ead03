package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the guarantees the q58 two-pass heavy-hitter plan rests on,
  * plus the mergeable-sketch (count-min) scale twin. All sketch seeds
  * are fixed, so every assertion is deterministic. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def grams = graft.Tables.documents(spark, sf)
    .select(explode(TextOps.wordNgrams($"text", 2)).as("gram"))

  test("wordNgrams is the ordered multiset wordShingles distincts") {
    val df = Seq("a b a b", "x", "").toDF("text")
      .select(TextOps.wordNgrams($"text", 2).as("g"),
        TextOps.wordShingles($"text", 2).as("s"))
    val rows = df.as[(Seq[String], Seq[String])].collect()
    assert(rows(0)._1 == Seq("a b", "b a", "a b")) // order kept, dups kept
    assert(rows(0)._2 == Seq("a b", "b a"))
    assert(rows(1)._1.isEmpty && rows(2)._1.isEmpty)
  }

  test("freqItems(support) candidates are a superset of the exact top-30") {
    val exact = grams.groupBy($"gram").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"gram").limit(30)
      .select($"gram").as[String].collect().toSet
    val candidates = grams.stat.freqItems(Array("gram"), 0.0005)
      .head.getSeq[String](0).toSet
    assert(exact.subsetOf(candidates))
    // the prune is real: candidates are bounded (≤ 1/support) and the
    // recount shuffles candidate groups, not every distinct gram
    assert(candidates.size <= 2000)
  }

  test("count-min sketch estimates bound the true counts (eps·N overestimate)") {
    val total = grams.count()
    val eps = 0.001
    // the distributed mergeable path: partial sketches per partition,
    // merged in the agg — constant memory at any corpus size
    val bytes = grams
      .agg(expr("count_min_sketch(gram, 0.001d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val top = grams.groupBy($"gram").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"gram").limit(30)
      .as[(String, Long)].collect()
    top.foreach { case (g, n) =>
      val est = cms.estimateCount(g)
      assert(est >= n, s"CMS under-counted '$g': $est < $n")
      assert(est <= n + (eps * total).toLong + 1,
        s"CMS over-counted '$g' past the eps bound: $est vs $n")
    }
  }
}
