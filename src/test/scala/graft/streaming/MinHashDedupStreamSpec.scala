package graft.streaming

import org.apache.spark.sql.functions.{array_intersect, col, size}

import graft.{SparkSpec, Tables}
import graft.functions.TextOps
import graft.table.IncrementalTable

/** Pins the streaming near-dup dedup (X95 / q148): deterministic
  * replay, the kept-distinct invariant (no two kept docs are >= tau
  * near-dups), the persisted index covering exactly the kept docs,
  * and crash-replay no-ops across instances. */
class MinHashDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"
  private val N = 3
  private val Tau = 0.5

  private def build(tmp: String): (IncrementalTable, IncrementalTable,
      IncrementalTable, MinHashDedupStream) = {
    val up = IncrementalTable(spark, s"$tmp/docs/v1")
    val down = IncrementalTable(spark, s"$tmp/kept/v1")
    val idx = IncrementalTable(spark, s"$tmp/bands/v1")
    (up, down, idx, new MinHashDedupStream(up, down, idx, n = N, tau = Tau))
  }

  test("near-dups collapse across and within batches; kept set is tau-distinct") {
    val tmp = tmpDir("mhds")
    val (up, down, idx, st) = build(tmp)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text", $"source")
    up.append(docs.filter($"doc_id" % 2 === 0), Nil)
    up.append(docs.filter($"doc_id" % 2 === 1), Nil)
    assert(st.drain() == 2)
    val total = docs.count()
    val kept = down.read().select($"doc_id").as[Long].collect().toSet
    assert(kept.size < total, "no near-dups collapsed at sf0.01")
    assert(kept.nonEmpty)
    // THE invariant: every kept pair is below tau (exact all-pairs
    // verify over the kept slice — test-scale only)
    val sets = down.read().select($"doc_id",
      TextOps.wordShingles($"text", N).as("sh"))
    val bad = sets.as("a").join(sets.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("li",
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long"))
      .filter(col("li").cast("double") /
        (size(col("a.sh")) + size(col("b.sh")) - col("li")).cast("double")
          >= Tau)
      .count()
    assert(bad == 0, s"$bad kept pairs are still >= tau near-dups")
    // the index holds bands for exactly the kept docs
    val idxDocs = idx.read().select($"did").as[Long].collect().toSet
    assert(idxDocs == kept,
      s"index covers ${idxDocs.size} docs, kept ${kept.size}")
    // replay: nothing pending, nothing duplicated — same-instance and
    // crash-recovery (fresh instance resumes from the downstream log)
    assert(st.drain() == 0)
    val (_, down2, _, st2) = build(tmp)
    assert(st2.drain() == 0)
    assert(down2.read().count() == kept.size)
    // late batch: an exact copy of a kept doc arrives -> dropped via
    // the INDEX probe (no corpus re-banding)
    val copy = down.read().orderBy($"doc_id").limit(1)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text", $"source")
    up.append(copy, Nil)
    assert(st.drain() == 1)
    assert(down.read().count() == kept.size, "a near-dup of a kept doc got in")
  }

  test("append-only contract: maintenance rewrites tolerated, data rewrites refused loudly") {
    val tmp = tmpDir("mhds_ct")
    val (up, down, _, st) = build(tmp)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text", $"source")
      .filter($"doc_id" < 100)
    up.append(docs, Nil)
    assert(st.drain() == 1)
    val kept = down.read().count()
    // a compaction upstream is a logical no-op (X94 marker): no error,
    // nothing pending, output untouched
    up.compact(targetFiles = 1)
    assert(st.drain() == 0)
    assert(down.read().count() == kept)
    // a REAL rewrite invalidates the kept set: refuse with guidance
    // instead of silently diverging
    up.replaceWhere(docs.limit(1), Nil, Map.empty, Map.empty)
    val e = intercept[IllegalArgumentException](st.drain())
    assert(e.getMessage.contains("append-only"), e.getMessage)
  }

  test("determinism: two independent runs produce identical kept sets") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text", $"source")
    def run(): Seq[Long] = {
      val (up, down, _, st) = build(tmpDir("mhds_det"))
      up.append(docs.filter($"doc_id" % 2 === 0), Nil)
      up.append(docs.filter($"doc_id" % 2 === 1), Nil)
      st.drain()
      down.read().select($"doc_id").as[Long].collect().toSeq.sorted
    }
    assert(run() == run())
  }
}
