package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.table.IncrementalTable

/** Incremental view maintenance for a two-input INNER equi-join — the
  * binary sibling of [[DerivedStream]] (map/filter) and
  * [[AggregateStream]] (grouped aggregates). Maintains
  * `prepareLeft(L) ⋈ prepareRight(R) on joinKeys` as a table that
  * equals the full recompute after every drain, while reading only
  * each side's NEW data in steady state.
  *
  * Delta-join algebra (the classic incremental-join decomposition —
  * each joined pair must enter the view exactly once):
  *
  *  - a LEFT append commit ΔL joins against the right state AS OF the
  *    right cursor already incorporated downstream: `ΔL ⋈ R@rCursor`;
  *  - a RIGHT append commit ΔR joins against the left state as of the
  *    (by then advanced) left cursor: `L@lCursor ⋈ ΔR`.
  *
  * A pair (l, r) is emitted exactly when the LATER of its two rows'
  * commits is applied — the earlier row is already inside the other
  * side's cursor snapshot, and never again after, because each delta
  * only sees the other side's PAST. Inner equi-join of append-only
  * inputs is monotone, so maintenance is pure appends: no retraction
  * state, no MERGE. (Outer joins need delete/insert retraction pairs —
  * the CDC changefeed is the hook — and are out of scope here.)
  *
  * Scale: steady-state cost per commit is `|Δ| ⋈ other-side-state` —
  * one join whose delta side is micro-batch-sized (AQE broadcasts it),
  * with the big side's scan pruned to the join keys' files by the
  * table's data-skipping index where clustered. Never O(|L| ⋈ |R|)
  * except at seed/rebuild. No rows move through the driver.
  *
  * Non-append commits on EITHER side (replace / compaction checkpoint)
  * invalidate the incremental reasoning — a rewritten history cannot
  * be patched by appends — and trigger a full rebuild at the pair of
  * head versions, committed as one idempotent replace (no batch guard
  * needed; replaying it converges).
  *
  * Exactly-once, same protocol as the other hops: the downstream table
  * IS the checkpoint. TWO cursors ride the commits —
  * `src_version/<name>:left` and `:right` — each delta commit advances
  * its side's cursor atomically with the data, and per-side
  * (appId, batchId = upstream version) pairs make crash replays no-ops
  * before any plan runs. The other side's snapshot is re-read AT ITS
  * CURSOR (`readAt`) during recovery, so a replayed delta recomputes
  * byte-identically even if that side has since grown.
  */
final class JoinStream(
    upLeft: IncrementalTable,
    upRight: IncrementalTable,
    down: IncrementalTable,
    joinKeys: Seq[String],
    prepareLeft: DataFrame => DataFrame = identity,
    prepareRight: DataFrame => DataFrame = identity,
    partitionBy: Seq[String] = Nil,
    name: String = "join")
    extends CommitConsumer {
  require(joinKeys.nonEmpty, "JoinStream needs join keys")

  private val leftKey = s"src_version/$name:left"
  private val rightKey = s"src_version/$name:right"
  private val leftApp = s"join:$name:left"
  private val rightApp = s"join:$name:right"

  /** Left upstream version fully incorporated downstream. */
  def leftVersion: Long =
    down.latestMeta(leftKey).map(_.toLong).getOrElse(-1L)

  /** Right upstream version fully incorporated downstream. */
  def rightVersion: Long =
    down.latestMeta(rightKey).map(_.toLong).getOrElse(-1L)

  /** The [[CommitConsumer]] contract wants ONE cursor; for a binary
    * operator the honest answer is the slower side. */
  def sourceVersion: Long = math.min(leftVersion, rightVersion)

  private def pendingOf(up: IncrementalTable, from: Long) = {
    up.refresh()
    up.commits().filter(c =>
      c.version > from && c.action != "meta" &&
        (c.add.nonEmpty || c.remove.nonEmpty || c.dv.nonEmpty))
  }

  private def joined(l: DataFrame, r: DataFrame): DataFrame = {
    val dup = (l.columns.toSet & r.columns.toSet) -- joinKeys
    require(dup.isEmpty,
      s"non-key columns collide across sides: ${dup.mkString(", ")} — " +
        "disambiguate them in prepareLeft/prepareRight")
    l.join(r, joinKeys)
  }

  /** Apply every pending commit on both sides; returns how many were
    * applied. Lagging never loses data — it only batches more rows per
    * delta join. */
  def drain(): Int = {
    val pendL = pendingOf(upLeft, leftVersion)
    val pendR = pendingOf(upRight, rightVersion)
    if (pendL.isEmpty && pendR.isEmpty) return 0

    if (pendL.exists(_.action != "append") ||
        pendR.exists(_.action != "append")) {
      // rebuild at the pair of head versions, one idempotent replace
      val vL = pendL.lastOption.map(_.version).getOrElse(leftVersion)
      val vR = pendR.lastOption.map(_.version).getOrElse(rightVersion)
      down.replaceWhere(
        joined(prepareLeft(upLeft.readAt(vL)), prepareRight(upRight.readAt(vR))),
        partitionBy, Map.empty, partitionFilter = Map.empty,
        meta = Map(leftKey -> vL.toString, rightKey -> vR.toString))
      return pendL.size + pendR.size
    }

    // all appends: left deltas against the right cursor snapshot, then
    // right deltas against the (now advanced) left cursor snapshot.
    // Order across sides is free — each pair still meets exactly once —
    // but must be deterministic so crash replays recompute identically.
    pendL.foreach { c =>
      applyDelta(c.version, leftKey, leftApp,
        rCursor => joined(prepareLeft(upLeft.readCommit(c.version)),
          prepareRight(upRight.readAt(rCursor))),
        otherCursor = rightVersion)
    }
    pendR.foreach { c =>
      applyDelta(c.version, rightKey, rightApp,
        lCursor => joined(prepareLeft(upLeft.readAt(lCursor)),
          prepareRight(upRight.readCommit(c.version))),
        otherCursor = leftVersion)
    }
    pendL.size + pendR.size
  }

  /** One side's delta commit: join against the OTHER side at its
    * incorporated cursor and append, carrying this side's cursor
    * atomically. With nothing incorporated on the other side the delta
    * is empty by definition — advance the cursor alone (guarded: a
    * crash replay must not stack duplicate meta commits). */
  private def applyDelta(version: Long, cursorKey: String, appId: String,
      delta: Long => DataFrame, otherCursor: Long): Unit = {
    val cursor = Map(cursorKey -> version.toString)
    if (otherCursor < 0) {
      if (!down.hasBatch(version, Some(appId)))
        down.commitMeta(cursor, batchId = Some(version), appId = Some(appId))
    } else
      down.append(delta(otherCursor), partitionBy, meta = cursor,
        batchId = Some(version), appId = Some(appId))
  }
}
