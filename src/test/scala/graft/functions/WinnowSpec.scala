package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Winnowing fingerprints (q151, Schleimer et al. 2003): the detection
  * GUARANTEE that distinguishes it from MinHash/SimHash — any two
  * documents sharing a token run of length >= w + k - 1 (here 4 + 3 - 1
  * = 6) MUST share at least one fingerprint, because the shared run
  * contains a full window whose minimum k-gram hash both sides select
  * identically. Tested by construction: plant a 6-token run inside
  * otherwise-disjoint documents and assert a shared fingerprint; a
  * 5-token overlap (below the guarantee) carries no such promise. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val W = 4

  private def fps(df: org.apache.spark.sql.DataFrame) = {
    val withH = df
      .filter(size(TextOps.tokens($"text")) >= K)
      .select($"doc_id",
        transform(TextOps.wordNgrams($"text", K),
          g => md5(g.cast("binary"))).as("h"))
    withH.select($"doc_id", explode(array_distinct(
      transform(sequence(lit(1), greatest(size($"h") - (W - 1), lit(1))),
        i => array_min(slice($"h", i, lit(W)))))).as("f"))
  }

  test("a shared run of w+k-1 tokens always shares a fingerprint") {
    // 20 random-ish disjoint-vocabulary doc pairs, each planting the
    // same 6-token run at different offsets on both sides
    val run = "alpha beta gamma delta epsilon zeta"
    val docs = (0 until 20).flatMap { i =>
      val padA = (0 until 5 + i).map(j => s"a${i}_$j").mkString(" ")
      val padB = (0 until 3 + i).map(j => s"b${i}_$j").mkString(" ")
      val tailA = (0 until 4).map(j => s"at${i}_$j").mkString(" ")
      val tailB = (0 until 7).map(j => s"bt${i}_$j").mkString(" ")
      Seq((2L * i, s"$padA $run $tailA"), (2L * i + 1, s"$padB $run $tailB"))
    }.toDF("doc_id", "text")
    val shared = fps(docs).as("x")
      .join(fps(docs).as("y"),
        $"x.f" === $"y.f" && $"x.doc_id" < $"y.doc_id")
      .select(($"x.doc_id" / 2).cast("long").as("pair"),
        $"x.doc_id".as("a"), $"y.doc_id".as("b"))
      .filter($"b" === $"a" + 1 && $"a" % 2 === 0)
      .select($"pair").distinct().as[Long].collect().toSet
    assert(shared == (0L until 20L).toSet,
      s"pairs missing a shared fingerprint: ${(0L until 20L).toSet -- shared}")
  }

  test("fingerprint density is ~2/(w+1) of the gram count") {
    val docs = Seq((0L, (0 until 400).map(i => s"w${i * 7 % 401}").mkString(" ")))
      .toDF("doc_id", "text")
    val n = fps(docs).count().toDouble
    val grams = 400 - (K - 1)
    // expected density 2/(w+1) = 0.4; allow a generous band — the point
    // is "sparse selection", not an exact constant
    assert(n / grams > 0.2 && n / grams < 0.6, s"density ${n / grams}")
  }
}
