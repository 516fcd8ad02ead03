package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.table.IncrementalTable

/** A chained streaming hop: consume an upstream [[IncrementalTable]]'s
  * commit log as a change stream and maintain a derived table,
  * exactly-once — SURVEY.md §3.4 decision (a) for streaming derived
  * assets, closing the reference's central tension (readme.md:13: its
  * derived `backwards` asset silently duplicates when re-run after the
  * upstream grew, because "incremental" stops at the first hop).
  *
  * The upstream log IS the stream (the analog of streaming FROM a Delta
  * table): each append commit's `add` files are exactly one micro-batch
  * of new rows. No second checkpoint directory exists — the DOWNSTREAM
  * TABLE is the checkpoint: every hop commit carries the upstream
  * version it consumed (`src_version/<name>` meta) atomically with the
  * derived data, and the (appId = derived identity, batchId = upstream
  * version) pair makes crash replays no-ops. Kill this process anywhere
  * and a fresh instance resumes from the downstream log alone.
  *
  * Per upstream commit action:
  *  - `append` → transform exactly the added files, append downstream
  *    (offset-incremental: O(new data), never a rescan);
  *  - `replace` (refresh/compaction) → a delta cannot be applied
  *    incrementally, so recompute the touched `replayScope` partitions
  *    from the upstream snapshot AS OF that commit and partition-replace
  *    them downstream (idempotent by construction, so it needs no batch
  *    guard: replaying a replace converges to the same state);
  *  - `checkpoint` (the consumer lagged past log compaction, so the
  *    individual deltas are gone) → same recompute, over the full live
  *    set — correctness never depends on the consumer keeping up;
  *  - `meta` → nothing to derive; skipped without advancing the cursor
  *    (the batch guard makes re-walking them free).
  *
  * Scale: steady state reads only each commit's added files — derived
  * work is proportional to arriving data, not table size, at any corpus
  * scale. The replace path is bounded by the touched partitions, and
  * the transform plan stays fully distributed (this class moves no rows
  * through the driver).
  *
  * @param replayScope partition columns shared by both tables at which
  *   replace-recomputes are scoped (the time partition, by default).
  */
final class DerivedStream(
    up: IncrementalTable,
    down: IncrementalTable,
    partitionBy: Seq[String],
    transform: DataFrame => DataFrame,
    name: String = "src",
    replayScope: Seq[String] = Seq("year", "month", "day"),
    // X97: set when `transform` is ROW-WISE and KEY-PRESERVING on these
    // downstream columns (each upstream row derives exactly the rows
    // carrying its keys, independent of other rows). An upstream dv
    // commit (row-level delete) then deletes the downstream rows by
    // key — O(deleted rows), no recompute; the deleted keys come from
    // the commit's own exact CDC delta run through `transform`. Unset
    // (the default), dv commits take the sound recompute path.
    keyedBy: Seq[String] = Nil,
    // Rate control (the GraftStreamRead maxCommitsPerTrigger analog):
    // one drain() applies at most this many pending upstream commits,
    // so a consumer catching up from a deep backlog works in bounded
    // memory/time per call instead of folding the whole lag into one
    // giant batch. Catch-up loops drain() until it returns 0; the final
    // state is identical by construction (same per-commit processing,
    // same cursors, just more calls).
    maxCommitsPerDrain: Int = Int.MaxValue)
    extends CommitConsumer {
  require(maxCommitsPerDrain > 0, "maxCommitsPerDrain must be positive")

  private val srcKey = s"src_version/$name"
  private val appId = s"derived:$name"

  /** Upstream version the downstream has fully incorporated. */
  def sourceVersion: Long =
    down.latestMeta(srcKey).map(_.toLong).getOrElse(-1L)

  /** Process every upstream commit past the downstream's recorded
    * source version; returns how many were applied. Call after each
    * upstream micro-batch (chained streams) or on any schedule —
    * lagging never loses data, it only batches more per drain. */
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
          down.append(transform(up.readCommit(c.version)), partitionBy,
            meta = Map(srcKey -> c.version.toString),
            batchId = Some(c.version), appId = Some(appId))
        case "dv" if keyedBy.nonEmpty && down.exists =>
          // X97: the dv commit IS its own exact delta — derive the
          // deleted rows' downstream keys and delete by key,
          // O(deleted rows), never a recompute. Replay-guarded like
          // the append path.
          val deletedRaw = up.changes(c.version, c.version)
            .filter(org.apache.spark.sql.functions
              .col("_change_type") === "delete")
            .drop("_change_type", "_commit_version")
          val keys = transform(deletedRaw)
            .select(keyedBy.map(org.apache.spark.sql.functions.col): _*)
          down.deleteInsert(keys, keyedBy,
            org.apache.spark.sql.functions.lit(true),
            inserts = down.read().limit(0),
            partitionBy = partitionBy,
            meta = Map(srcKey -> c.version.toString),
            batchId = Some(c.version), appId = Some(appId))
        case _ => // replace | checkpoint: recompute the touched scopes
          val scopes = (c.add ++ c.remove ++ c.dv.keys).map(scopeOf).distinct.filter(_.nonEmpty)
          if (scopes.isEmpty)
            // upstream not partitioned by the replay scope: the only
            // sound recompute unit is the whole table
            down.replaceWhere(transform(up.readAt(c.version)), partitionBy,
              Map.empty, partitionFilter = Map.empty,
              meta = Map(srcKey -> c.version.toString))
          else scopes.zipWithIndex.foreach { case (sc, i) =>
            val cursor = if (i == scopes.size - 1)
              Map(srcKey -> c.version.toString) else Map.empty[String, String]
            down.replaceWhere(transform(up.readAt(c.version, sc)), partitionBy,
              Map.empty, partitionFilter = sc, meta = cursor)
          }
      }
    }
    pending.size
  }

  /** Hive `k=v` segments of a path, restricted to the replay scope. */
  private def scopeOf(rel: String): Map[String, String] =
    IncrementalTable.hiveSegments(rel).view.filterKeys(replayScope.contains).toMap
}
