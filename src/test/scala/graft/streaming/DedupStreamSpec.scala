package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.IncrementalTable

/** Incremental dedup ([[DedupStream]]): after every drain, the
  * maintained table must EQUAL the batch dedup of the whole upstream —
  * across appends (within-batch and vs-history dups), crash replays,
  * and upstream rewrites. */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fp(df: DataFrame): DataFrame =
    df.withColumn("fp", md5(col("text").cast("binary")))

  private def mk(dir: String): (IncrementalTable, IncrementalTable, DedupStream) = {
    val up = IncrementalTable(spark, dir + "/docs/v1")
    val down = IncrementalTable(spark, dir + "/deduped/v1")
    (up, down, new DedupStream(up, down, fp, keyCol = "id", name = "docs"))
  }

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("id", "text")

  /** Ground truth: global dedup of the live upstream, min id wins. */
  private def batchDedup(up: IncrementalTable): Set[(Long, String)] = {
    import org.apache.spark.sql.expressions.Window
    fp(up.read())
      .withColumn("_rn", row_number().over(
        Window.partitionBy($"fp").orderBy($"id")))
      .filter($"_rn" === 1)
      .select($"id", $"text").as[(Long, String)].collect().toSet
  }

  private def state(down: IncrementalTable): Set[(Long, String)] =
    down.read().select($"id", $"text").as[(Long, String)].collect().toSet

  test("dedups within batch and against all history; equals batch dedup at every step") {
    val (up, down, s) = mk(tmpDir("dedupstream"))

    // batch 1: c duplicates a (same text) -> min id representative
    up.append(docs(1L -> "alpha", 2L -> "beta", 3L -> "alpha"), Nil)
    assert(s.drain() == 1)
    assert(state(down) == Set(1L -> "alpha", 2L -> "beta"))

    // batch 2: 4 duplicates history(alpha); 5/6 duplicate each other
    up.append(docs(4L -> "alpha", 5L -> "gamma", 6L -> "gamma"), Nil)
    assert(s.drain() == 1)
    assert(state(down) == batchDedup(up))
    assert(state(down) == Set(1L -> "alpha", 2L -> "beta", 5L -> "gamma"))

    // empty drain: nothing pending
    assert(s.drain() == 0)
  }

  test("crash replay is a no-op: a fresh consumer resumes from the table alone") {
    val dir = tmpDir("dedupstream")
    val (up, down, s) = mk(dir)
    up.append(docs(1L -> "x", 2L -> "y"), Nil)
    s.drain()
    up.append(docs(3L -> "x", 4L -> "z"), Nil)
    s.drain()

    // new consumer instance over the same tables (post-crash identity):
    // sourceVersion recovers from the downstream log, nothing re-applies
    val (up2, down2, s2) = {
      val u = IncrementalTable(spark, dir + "/docs/v1")
      val d = IncrementalTable(spark, dir + "/deduped/v1")
      (u, d, new DedupStream(u, d, fp, keyCol = "id", name = "docs"))
    }
    assert(s2.drain() == 0)
    assert(state(down2) == Set(1L -> "x", 2L -> "y", 4L -> "z"))
    assert(state(down2) == batchDedup(up2))
  }

  test("near-dup semantics compose: a MinHash band key as the fingerprint") {
    // the fingerprint hook takes ANY df=>df that adds `fp` — here a
    // crude band key (sorted distinct tokens), so reordered copies of a
    // document dedup as near-dups while genuinely new text survives
    def bandFp(df: DataFrame): DataFrame =
      df.withColumn("fp", md5(concat_ws(" ",
        array_sort(array_distinct(split(col("text"), " ")))).cast("binary")))
    val dir = tmpDir("dedupstream")
    val up = IncrementalTable(spark, dir + "/docs/v1")
    val down = IncrementalTable(spark, dir + "/deduped/v1")
    val s = new DedupStream(up, down, bandFp, keyCol = "id", name = "docs")

    up.append(docs(1L -> "the quick fox", 2L -> "slow brown dog"), Nil)
    s.drain()
    // 3 is a token-reordering of 1 (near-dup); 4 is new
    up.append(docs(3L -> "fox the quick", 4L -> "entirely new text"), Nil)
    s.drain()
    assert(state(down) == Set(1L -> "the quick fox", 2L -> "slow brown dog",
      4L -> "entirely new text"))
  }

  test("a batch that is 100% duplicates still advances the cursor (no rework loop)") {
    val (up, down, s) = mk(tmpDir("dedupstream"))
    up.append(docs(1L -> "a", 2L -> "b"), Nil)
    assert(s.drain() == 1)
    // the steady-state dedup case: every arriving row already seen —
    // the empty append elides data but its cursor meta + batch guard
    // still commit, so the commit is consumed exactly once
    up.append(docs(3L -> "a", 4L -> "b"), Nil)
    assert(s.drain() == 1)
    assert(s.sourceVersion == up.commits().last.version)
    assert(s.drain() == 0) // nothing pending: no per-drain rework
    assert(state(down) == Set(1L -> "a", 2L -> "b"))
  }

  test("upstream auto-checkpoint does not flip committed representatives") {
    // the log checkpoint shares the version of the commit it folds, so
    // a caught-up consumer sees the CHECKPOINT instead of that delta —
    // the rebuild must keep prior representatives (here: id 10 for
    // "same" beats the later-arriving smaller id 5), not re-dedup
    // globally by min id
    val dir = tmpDir("dedupstream")
    val up = IncrementalTable(spark, dir + "/docs/v1", checkpointEvery = 2)
    val down = IncrementalTable(spark, dir + "/deduped/v1")
    val s = new DedupStream(up, down, fp, keyCol = "id", name = "docs")
    up.append(docs(10L -> "same"), Nil) // v1
    assert(s.drain() == 1)
    up.append(docs(5L -> "same", 6L -> "other"), Nil) // v2 + checkpoint@2
    assert(s.drain() == 1)
    assert(state(down) == Set(10L -> "same", 6L -> "other"))
    assert(s.drain() == 0)
  }

  test("upstream rewrite triggers a full rebuild that equals batch dedup") {
    val (up, down, s) = mk(tmpDir("dedupstream"))
    up.append(docs(1L -> "a", 2L -> "b"), Seq.empty)
    s.drain()
    // upstream history rewrite: replace everything with a new corpus
    up.replaceWhere(docs(10L -> "b", 11L -> "c", 12L -> "c"), Nil,
      Map.empty, partitionFilter = Map.empty)
    assert(s.drain() == 1)
    assert(state(down) == Set(10L -> "b", 11L -> "c"))
    assert(state(down) == batchDedup(up))
  }
}
