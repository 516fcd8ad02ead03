package graft.similarity

import org.apache.spark.sql.functions.col

import graft.{SparkEntry, SparkSpec, Tables}
import graft.streaming.PqIndexStream
import graft.table.IncrementalTable

/** Pins the persisted PQ index (X91 / q147): the index table serves
  * bit-identically to the in-plan recompute (q97), maintenance is
  * incremental (appends encode only new commits under the FIXED
  * codebook), replays are no-ops, and querying never mutates or
  * retrains the index. */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("index-served ANN equals the in-plan PQ recompute bit-exactly") {
    val fromIndex = SparkEntry.queries("q147_pq_index_ann")(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val recompute = SparkEntry.queries("q97_pq_ann")(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    // same corpus + deterministic train/encode/ADC -> identical top-k.
    // This inherits q97's PqAnnSpec recall floor by construction.
    assert(fromIndex == recompute,
      s"index diverged from recompute: ${fromIndex.size} vs ${recompute.size} rows")
    assert(fromIndex.nonEmpty)
  }

  test("maintenance is incremental and converges to the full-corpus encode") {
    val tmp = tmpDir("pqidx")
    val up = IncrementalTable(spark, s"$tmp/emb/v1")
    val down = IncrementalTable(spark, s"$tmp/idx/v1")
    val e = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    // seed with 80% of the corpus, build the index (codebook trains on
    // THIS snapshot and is then frozen)
    up.append(e.filter($"vec_id" % 5 =!= 0), Nil)
    val idx = new PqIndexStream(spark, up, down)
    assert(idx.drain() >= 1)
    val cb = idx.codebook()
    val n1 = down.read().count()
    // late arrivals: a new commit encodes ONLY the added files, under
    // the original codebook
    up.append(e.filter($"vec_id" % 5 === 0), Nil)
    assert(idx.drain() == 1)
    val served = down.read().select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect().toMap
    assert(served.size > n1)
    // equals a from-scratch encode of the full corpus under the same
    // (persisted) codebook — per-row determinism of pqCodes
    val full = graft.QueriesSimilarity.pqCodes(spark, e, cb)
      .groupBy($"vec_id")
      .agg(org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.array_sort(
          org.apache.spark.sql.functions.collect_list(
            org.apache.spark.sql.functions.struct($"sub", $"cid"))),
        p => p.getField("cid")).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(served == full, "maintained codes diverge from full recompute")
    // the codebook channel was not retrained by the second drain
    assert(idx.codebook() == cb)
  }

  test("upstream row-level deletes propagate by key — O(change), codes match a recompute") {
    val tmp = tmpDir("pqidx_dv")
    val up = IncrementalTable(spark, s"$tmp/emb/v1")
    val down = IncrementalTable(spark, s"$tmp/idx/v1")
    val e = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .filter($"vec_id" < 200)
    up.append(e, Nil)
    val idx = new PqIndexStream(spark, up, down)
    idx.drain()
    val cb = idx.codebook()
    // forget-user shape: MOR delete of a vec_id slice upstream
    up.deleteVectorized($"vec_id" % 10 === 0)
    assert(idx.drain() == 1)
    val served = down.read().select($"vec_id").as[Long].collect().toSet
    assert(served == (0L until 200L).filter(_ % 10 != 0).toSet,
      s"index kept deleted ids or lost live ones: ${served.size}")
    // codes of the survivors are untouched (keyed delete, not re-encode)
    val full = graft.QueriesSimilarity.pqCodes(spark, up.read(), cb)
      .groupBy($"vec_id")
      .agg(org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.array_sort(
          org.apache.spark.sql.functions.collect_list(
            org.apache.spark.sql.functions.struct($"sub", $"cid"))),
        p => p.getField("cid")).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    val have = down.read().select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect().toMap
    assert(have == full)
    // and the query path serves the post-delete corpus
    assert(idx.query(up.read().filter($"vec_id" < 3)).count() > 0)
  }

  test("drain replays are no-ops, across instances too; query never mutates") {
    val tmp = tmpDir("pqidx2")
    val up = IncrementalTable(spark, s"$tmp/emb/v1")
    val down = IncrementalTable(spark, s"$tmp/idx/v1")
    val e = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .filter($"vec_id" < 100)
    up.append(e, Nil)
    val idx = new PqIndexStream(spark, up, down)
    idx.drain()
    val rows = down.read().count()
    val v = down.latestVersion
    // same-instance replay: nothing pending
    assert(idx.drain() == 0)
    // crash recovery: a FRESH instance resumes from the downstream log
    // alone and re-applies nothing
    assert(new PqIndexStream(spark, up, down).drain() == 0)
    assert(down.read().count() == rows)
    // query-time: plan reads the index table; no retrain, no commit
    val out = idx.query(e.filter($"vec_id" < 3))
    assert(out.count() > 0)
    down.refresh()
    assert(down.latestVersion == v, "query() mutated the index table")
  }
}
