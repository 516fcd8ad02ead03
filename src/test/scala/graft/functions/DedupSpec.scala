package graft.functions

import graft.{SparkSpec, Tables}

/** The dedup operators' correctness is carried by the DuckDB oracle
  * (q21-q24); this spec covers the scale knob the oracle can't: the
  * document-frequency cap on inverted-index candidate generation. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("df-capped candidate generation preserves pairs when near-dups share low-df shingles") {
    val docs = Tables.documents(spark, sf)
    def run(cap: Option[Long]) =
      Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", 3, 0.5, cap)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val uncapped = run(None)
    // corpus max df is 25; a cap of 100 prunes nothing
    assert(run(Some(100L)) == uncapped)
    // an aggressive cap still finds every pair here: each near-dup pair
    // shares discriminative shingles with df <= 3
    assert(run(Some(3L)) == uncapped)
    assert(uncapped.size == 25)
  }

  test("a df cap of 0 disables candidate generation entirely (recall floor)") {
    val docs = Tables.documents(spark, sf)
    val none = Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", 3, 0.5, Some(0L))
    assert(none.count() == 0)
  }

  test("duplicateSpans: cross-doc boilerplate found, short docs skipped, within-doc repeats counted") {
    // shared 4-token boilerplate "one two three four" in docs 1,2; doc 3
    // repeats it twice internally; doc 4 is shorter than k; doc 5 disjoint
    val docs = Seq(
      (1L, "one two three four alpha"),
      (2L, "prefix one two three four"),
      (3L, "one two three four one two three four"),
      (4L, "one two three"),
      (5L, "five six seven eight nine")).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, $"doc_id", $"text", k = 4)
      .as[(String, Long, Long)].collect().map { case (s, a, b) => (s, (a, b)) }.toMap
    val hit = out("one two three four")
    assert(hit._1 == 3L) // docs 1, 2, 3 — doc 4 too short to span
    assert(hit._2 == 4L) // 1 + 1 + 2: doc 3's sliding window hits it at i=1 and i=5
    // minDocs raises the floor
    val strict = Dedup.duplicateSpans(docs, $"doc_id", $"text", k = 4, minDocs = 4)
    assert(strict.filter($"span" === "one two three four").count() == 0)
  }

  test("duplicateSpans hashed-key variant equals the exact grouping on the corpus") {
    val docs = Tables.documents(spark, sf)
    def rows(hashKey: Boolean) =
      Dedup.duplicateSpans(docs, $"doc_id", $"text", k = 8, hashKey = hashKey)
        .as[(String, Long, Long)].collect().toSet
    assert(rows(hashKey = true) == rows(hashKey = false))
  }

  test("uncapped co-occurrence candidates are QUADRATIC in shingle df; the cap bounds them (sf1 scaling audit)") {
    // the q68 sf1 finding's cause, pinned with counted asserts: D docs
    // sharing one hot shingle make the exact-recall (uncapped) variant
    // emit every pair — D(D-1)/2, quadratic in df by construction. The
    // df cap excludes the hot shingle from CANDIDATE GENERATION and
    // bounds the per-key fan-out; q22 (capped) and q23 (LSH) are the
    // scale paths, q68's uncapped run is the exactness oracle.
    def corpus(d: Int) = (0 until d).map(i =>
      (i.toLong, s"hot shared shingle unique$i tail$i")).toDF("doc_id", "text")
    def pairs(d: Int, cap: Option[Long]) =
      Dedup.ngramJaccardPairs(corpus(d), $"doc_id", $"text", 3, 0.0, cap)
        .filter($"jaccard" > 0).count()
    assert(pairs(20, None) == 190L) // 20*19/2
    assert(pairs(40, None) == 780L) // 2x docs -> 4.1x pairs: the quadratic
    // capped: the df-40 hot shingle leaves candidate generation; the
    // remaining shingles are df=1 -> zero co-occurrence, zero pairs
    assert(pairs(40, Some(10L)) == 0L)
  }
}
