package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.table.IncrementalTable

/** Incremental corpus dedup: maintain an exactly-deduplicated table as
  * the upstream grows, deduping each new batch against ALL history —
  * the continuous form of `q21_dedup_exact`, and the op a training
  * pipeline actually runs (the corpus arrives over months; re-deduping
  * 100 TB from scratch per drop is not a plan).
  *
  * Like [[DerivedStream]], the upstream commit log IS the stream and
  * the DOWNSTREAM TABLE is both checkpoint and dedup state: survivors
  * are stored WITH their fingerprint column, so "seen before?" is a
  * query against the output itself — no side state store, nothing to
  * rebuild after a crash, and the (appId, batchId = upstream version)
  * guard makes replays no-ops.
  *
  * Per append commit, survivors are:
  *  1. within-batch dedup — one representative per fingerprint, chosen
  *     by min `keyCol` (deterministic, partitioning-independent);
  *  2. vs-history dedup — drop fingerprints already committed
  *     downstream.
  *
  * Scale shape of step 2 (the part that touches history): the HISTORY
  * side is never shuffled and never broadcast. The batch's fingerprint
  * set (small — one tick's arrivals) broadcasts to a column-pruned scan
  * of the history's `fp` column (a left_semi probe whose row-group
  * reads the X20 parquet bloom filters can skip); only the matching
  * fingerprints ("hits", ≤ batch size) come back, and the batch
  * anti-joins that tiny set. Cost per drain: O(new data) shuffle +
  * one sequential fp-column scan of history — at any table size, with
  * no state to keep in executor memory (contrast
  * `dropDuplicatesWithinWatermark`, which bounds state by TIME and
  * forgets; this dedups against ALL of history by keeping the state in
  * the table).
  *
  * Non-append upstream commits (replace / log-compaction checkpoint)
  * invalidate incremental reasoning — dedup is a GLOBAL property, so a
  * changed history cannot be patched per-partition. Those commits
  * trigger a REPRESENTATIVE-STABLE rebuild against the upstream
  * snapshot: a fingerprint's already-committed representative is KEPT
  * as long as its exact row still exists upstream, fingerprints whose
  * representative vanished re-pick min `keyCol` among survivors, new
  * fingerprints enter by min `keyCol`, and fingerprints gone upstream
  * drop. Stability matters because the upstream log auto-checkpoints
  * every [[graft.table.IncrementalTable.checkpointInterval]] commits —
  * a checkpoint shares the version of the commit it folds, so a
  * caught-up consumer sees the checkpoint INSTEAD of that delta; a
  * naive global re-dedup there would silently flip representatives
  * (and churn downstream consumers) with zero upstream data change.
  * The rebuild is idempotent, so it needs no batch guard; its cost is
  * O(snapshot) but amortizes to O(1/checkpointInterval) per commit on
  * append-only ingest.
  *
  * @param fingerprint adds the `fp` column (e.g. md5 of normalized
  *   text — or a MinHash band key for near-dup semantics).
  * @param keyCol unique row key ordering within-batch representatives.
  */
final class DedupStream(
    up: IncrementalTable,
    down: IncrementalTable,
    fingerprint: DataFrame => DataFrame,
    keyCol: String,
    partitionBy: Seq[String] = Nil,
    name: String = "src",
    // rate control: at most this many pending commits per drain() —
    // catch-up from a deep backlog runs in bounded steps (see
    // DerivedStream; same contract, identical final state)
    maxCommitsPerDrain: Int = Int.MaxValue)
    extends CommitConsumer {
  require(maxCommitsPerDrain > 0, "maxCommitsPerDrain must be positive")

  private val srcKey = s"src_version/$name"
  private val appId = s"dedup:$name"

  def sourceVersion: Long =
    down.latestMeta(srcKey).map(_.toLong).getOrElse(-1L)

  /** One representative per fingerprint: min keyCol wins. */
  private def dedupWithin(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp")).orderBy(col(keyCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Batch survivors not fingerprint-matched by committed history. */
  private def dedupAgainst(batch: DataFrame, history: DataFrame): DataFrame = {
    val hits = history.select(col("fp"))
      .join(broadcast(batch.select(col("fp")).distinct()), Seq("fp"), "left_semi")
    batch.join(broadcast(hits), Seq("fp"), "left_anti")
  }

  def drain(): Int = {
    up.refresh()
    val from = sourceVersion
    val pending = up.commits().filter(c =>
      c.version > from && CommitConsumer.isDataCommit(c))
      // earliest-first bound: the remainder stays pending for the next
      // drain(), so a deep backlog catches up in bounded steps
      .take(maxCommitsPerDrain)
    pending.foreach { c =>
      c.action match {
        case "append" =>
          val batch = dedupWithin(fingerprint(up.readCommit(c.version)))
          val survivors =
            if (down.exists) dedupAgainst(batch, down.read()) else batch
          down.append(survivors, partitionBy,
            meta = Map(srcKey -> c.version.toString),
            batchId = Some(c.version), appId = Some(appId))
        case _ =>
          // replace | checkpoint: representative-stable rebuild (see
          // class doc). Idempotent; no guard needed.
          val snap = fingerprint(up.readAt(c.version))
          val rebuilt =
            if (!down.exists) dedupWithin(snap)
            else {
              // table-scale joins (rebuilds are rare, O(snapshot) by
              // contract): no broadcast hints — AQE decides
              val prior = down.read()
              // prior representatives whose exact row survived upstream
              val kept = prior.join(
                snap.select(col("fp"), col(keyCol)).distinct(),
                Seq("fp", keyCol), "left_semi")
              // fps with no surviving representative: re-pick min key
              val fresh = dedupWithin(snap)
                .join(kept.select(col("fp")), Seq("fp"), "left_anti")
              kept.unionByName(fresh)
            }
          down.replaceWhere(rebuilt, partitionBy,
            Map.empty, partitionFilter = Map.empty,
            meta = Map(srcKey -> c.version.toString))
      }
    }
    pending.size
  }
}
