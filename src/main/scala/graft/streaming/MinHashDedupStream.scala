package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextOps}
import graft.operators.ConnectedComponents
import graft.table.IncrementalTable

/** Continuous NEAR-dup dedup against a growing corpus (X95): the
  * streaming form of q23's MinHash-LSH, with the banded signatures
  * persisted as a graft INDEX table maintained from the upstream
  * commit log — the near-dup twin of [[DedupStream]] (exact
  * content-hash) and the second instance of the persisted-index
  * pattern ([[PqIndexStream]]).
  *
  * Per upstream append commit, the batch:
  *  1. bands its docs (pure per-doc, O(batch) —
  *     [[Dedup.minhashBands]]) and probes the INDEX table on
  *     `(band, bkey)`: candidates are (new doc, kept doc) pairs that
  *     collide on a full band — the corpus is never re-banded and
  *     never all-pairs'd;
  *  2. exact-verifies candidates at Jaccard >= tau (texts read only
  *     for candidate partners: the kept side is a semi-joined slice
  *     of the deduped table) and drops matching new docs — a doc is
  *     dropped iff it near-matches a KEPT doc, so every kept doc is
  *     >= tau-distinct from every other kept doc;
  *  3. collapses the surviving batch's own near-dup clusters to their
  *     min-id representative (LSH pairs within the batch →
  *     [[ConnectedComponents]] large-star/small-star min-label);
  *  4. appends the kept docs downstream and their bands to the index,
  *     both under the (appId, batchId = upstream version) replay
  *     guard. The downstream commit carries the cursor; a crash
  *     between the two appends replays deterministically (the batch's
  *     own bands are not yet in the index, so it never self-matches).
  *
  * 100 TB shape: steady-state work is O(batch bands + candidates) —
  * the index join shuffles on band keys (or broadcasts the batch
  * side), verification touches only colliding pairs' texts, and the
  * within-batch CC runs on the batch's pair graph, not the corpus's.
  * Maintenance rewrites upstream are skipped (X94); the index and
  * output tables compact independently without disturbing the stream.
  *
  * Recall contract: candidates come from 16-band/4-row 64-perm LSH —
  * the same banding whose measured recall at tau=0.8 on the documents
  * corpus is 1.0 (MinHashDedupStreamSpec pins stream == relational
  * replay exactly; on corpora where LSH recall < 1 the output keeps
  * false survivors, never drops a non-dup). */
final class MinHashDedupStream(
    up: IncrementalTable, down: IncrementalTable, index: IncrementalTable,
    idCol: String = "doc_id", textCol: String = "text",
    n: Int = 3, tau: Double = 0.8, name: String = "neardup",
    // rate control: at most this many pending APPEND commits per
    // drain() — catch-up from a deep backlog runs in bounded steps
    // (the append-only guard still validates every commit up to the
    // cut, so nothing is skipped over silently)
    maxCommitsPerDrain: Int = Int.MaxValue) {
  require(maxCommitsPerDrain > 0, "maxCommitsPerDrain must be positive")

  private val srcKey = s"src_version/$name"
  private val appId = s"minhashdedup:$name"

  def sourceVersion: Long =
    down.latestMeta(srcKey).map(_.toLong).getOrElse(-1L)

  private def id: Column = col(idCol)

  /** Exact Jaccard >= tau filter over word n-gram shingles: keep the
    * candidate rows whose (aKey from aDocs, bKey from bDocs) texts
    * verify — the q22/q23 verification, parameterized over sides. */
  private def verifiedAtTau(cands: DataFrame, aKey: String, aDocs: DataFrame,
      bKey: String, bDocs: DataFrame): DataFrame = {
    val a = aDocs.select(id.as(aKey), TextOps.wordShingles(col(textCol), n).as("sa"))
    val b = bDocs.select(id.as(bKey), TextOps.wordShingles(col(textCol), n).as("sb"))
    cands.join(a, aKey).join(b, bKey)
      .withColumn("li", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("li").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("li")).cast("double") >= tau)
      .select(col(aKey), col(bKey))
  }

  /** Process every upstream append commit past the cursor; returns how
    * many were applied. */
  def drain(): Int = {
    up.refresh()
    val from = sourceVersion
    val fullWindow = up.commits().filter(_.version > from)
    // bound the window at the (max+1)-th append: everything up to the
    // cut — interleaved meta/maintenance included — still goes through
    // the append-only guard below, so bounding can never skip OVER an
    // invalidating commit
    val window = {
      var seen = 0
      fullWindow.takeWhile { c =>
        if (c.action == "append" && c.add.nonEmpty) seen += 1
        seen <= maxCommitsPerDrain
      }
    }
    // Append-only contract, enforced LOUDLY: a replace/dv upstream
    // would invalidate the kept set (a kept doc's text may change or
    // vanish under the index), and a checkpoint in the window means
    // the consumer lagged past log compaction (appends folded away).
    // Silently skipping either diverges; fail with guidance instead.
    window.foreach { c =>
      require(c.action == "append" || c.action == "meta" ||
          c.action == "dvmerge" ||
          (c.action == "replace" &&
            c.meta.get(IncrementalTable.MaintenanceKey).contains("1")),
        s"MinHashDedupStream($name) requires an append-only upstream: " +
          s"version ${c.version} is '${c.action}'" +
          (if (c.action == "checkpoint")
            " — the consumer lagged past log compaction; rebuild the " +
              "dedup output and index from the current snapshot"
          else " — rebuild from the current snapshot after row-level " +
            "changes"))
    }
    val pending = window.filter(c => c.action == "append" && c.add.nonEmpty)
    pending.foreach { c =>
      val batch = up.readCommit(c.version).localCheckpoint(true)
      // band ONCE per batch (the signature aggregate is the expensive
      // leg); the index probe, within-batch pairing, and the index
      // append all reuse this frame — bands are pure per-doc
      val bandsB = Dedup.minhashBands(batch, id, col(textCol), n)
        .localCheckpoint(true)
      // 1. probe the persisted index: (band, bkey) collisions against
      //    the KEPT corpus — the candidate set, never all-pairs
      val crossDups =
        if (!index.exists) batch.limit(0).select(id.as("new_id"))
        else {
          val cands = bandsB.select(col("did").as("new_id"),
              col("band"), col("bkey"))
            .join(index.read(), Seq("band", "bkey"))
            .select(col("new_id"), col("did").as("old_id")).distinct()
          // 2. exact verify: kept texts only for candidate partners
          val oldIds = cands.select(col("old_id")).distinct()
          val oldSlice = down.read()
            .join(oldIds.withColumnRenamed("old_id", idCol), Seq(idCol),
              "left_semi")
          verifiedAtTau(cands, "new_id", batch, "old_id", oldSlice)
            .select(col("new_id")).distinct()
        }
      val dupIds = crossDups.withColumnRenamed("new_id", idCol)
      val surv = batch.join(dupIds, Seq(idCol), "left_anti")
      val bandsS = bandsB.join(
        dupIds.withColumnRenamed(idCol, "did"), Seq("did"), "left_anti")
      // 3. within-batch clusters -> min-id representative (LSH pairs
      //    from the REUSED bands, exact-verified, connected components)
      val candsW = bandsS.as("x").join(bandsS.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.did") < col("y.did"))
        .select(col("x.did").as("a_id"), col("y.did").as("b_id")).distinct()
      val pairs = verifiedAtTau(candsW, "a_id", surv, "b_id", surv)
      val nonRep = ConnectedComponents.run(pairs, "a_id", "b_id")
        .filter(col("id") =!= col("component"))
        .select(col("id").as(idCol))
      val kept = surv.join(nonRep, Seq(idCol), "left_anti")
        .localCheckpoint(true) // both appends + the replay read one plan
      // 4. output first (carries the cursor), index second; both
      //    replay-guarded, recomputation above is deterministic
      down.append(kept, Nil, meta = Map(srcKey -> c.version.toString),
        batchId = Some(c.version), appId = Some(appId))
      index.append(
        bandsB.join(kept.select(id.as("did")), Seq("did"), "left_semi")
          .select(col("did"), col("band"), col("bkey")),
        Nil, batchId = Some(c.version), appId = Some(appId))
    }
    pending.size
  }
}
