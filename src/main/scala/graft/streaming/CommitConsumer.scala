package graft.streaming

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
