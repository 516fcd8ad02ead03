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
}
