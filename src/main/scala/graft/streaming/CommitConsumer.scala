package graft.streaming

import graft.table.{Commit, IncrementalTable}

/** A downstream hop that consumes an upstream [[graft.table.IncrementalTable]]
  * commit log incrementally — the common face of [[DerivedStream]]
  * (map/filter hops) and [[AggregateStream]] (grouped-aggregate views),
  * so any mix of them chains off a streaming sink. */
trait CommitConsumer {
  /** Upstream version fully incorporated downstream. */
  def sourceVersion: Long

  /** Apply every upstream commit past [[sourceVersion]]; returns how
    * many were applied. Must be crash-safe to call at any time. */
  def drain(): Int
}

object CommitConsumer {
  /** The ONE definition of "a commit a downstream hop must apply" —
    * shared by every stream's drain() and by the staleness report
    * ([[MaterializedView.status]]), so "lag = 0" and "drain applies
    * nothing" can never disagree:
    *  - `meta` commits carry no rows;
    *  - `dvmerge` rewrites sidecar metadata only (same logical rows) —
    *    never a rebuild trigger;
    *  - maintenance rewrites (X94, the dataChange=false analog):
    *    compaction preserves the logical rows, so it must never
    *    trigger a downstream recompute — skipped like dvmerge;
    *  - a columnar checkpoint folds the same-version data commit with
    *    EMPTY inline sets — it must stay visible as a rebuild trigger
    *    or that folded commit is silently skipped. */
  def isDataCommit(c: Commit): Boolean =
    c.action != "meta" &&
      c.action != "dvmerge" &&
      !(c.action == "replace" &&
        c.meta.get(IncrementalTable.MaintenanceKey).contains("1")) &&
      (c.add.nonEmpty || c.remove.nonEmpty || c.dv.nonEmpty ||
        c.columnarCkpt)
}
