package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.table.IncrementalTable

/** One incrementally-maintainable aggregate column: `delta` folds raw
  * rows into a partial state, `combine` merges two states. `combine`
  * must be commutative and associative with `delta`'s output as its
  * carrier (a commutative monoid without an explicit identity — the
  * maintenance join never combines with "nothing", it inserts), which
  * is exactly the class of aggregates a 100 TB engine can maintain
  * without re-reading history: count, sum, min, max, and anything
  * built from them (avg = sum/count at read time). Non-distributive
  * aggregates (median, distinct count) have no finite merge state and
  * must go through the sketch twins (q38/q44) or a recompute. */
final case class IncAgg(name: String, delta: Column,
    combine: (Column, Column) => Column)

object IncAgg {
  def countAll(name: String): IncAgg =
    IncAgg(name, count(lit(1)), _ + _)
  /** SQL SUM skips nulls, so null is the state's identity: a batch
    * whose inputs are all null must not poison the running total. */
  def sumOf(c: Column, name: String): IncAgg =
    IncAgg(name, sum(c), (a, b) => coalesce(a + b, a, b))
  def minOf(c: Column, name: String): IncAgg =
    IncAgg(name, min(c), least(_, _))
  def maxOf(c: Column, name: String): IncAgg =
    IncAgg(name, max(c), greatest(_, _))
  /** Approximate COUNT DISTINCT as maintainable state: the view column
    * holds a datasketches HLL binary — `hll_union` is the combine, so
    * distinct counts (the textbook non-distributive aggregate) become
    * incrementally maintainable at fixed state size; read the estimate
    * with `hll_sketch_estimate(col)`. Exact for small cardinalities
    * (sparse mode), ~2% error at scale. */
  def approxDistinct(c: Column, name: String): IncAgg =
    IncAgg(name, hll_sketch_agg(c), (a, b) => hll_union(a, b))
}

/** Incremental view maintenance for a grouped aggregate — the
  * aggregating sibling of [[DerivedStream]]. A map/filter hop can
  * process each upstream commit independently; a GROUP BY cannot
  * (per-batch aggregation of the same key across batches yields
  * duplicate partial rows, the reference's readme.md:13 duplication
  * tension in aggregate form). This class maintains
  * `prepare(upstream).groupBy(groupKeys).agg(aggs)` as a table that
  * stays equal to the full recompute after every drain:
  *
  *  - `append` commit → aggregate ONLY the commit's added files (a
  *    micro-batch-sized job), left-join the delta against the current
  *    state of just those keys, fold with each [[IncAgg]]'s `combine`,
  *    and MERGE — copy-on-write on the files holding touched keys, so
  *    the write cost scales with the delta's key count, not the view
  *    size. O(new data + touched files) at any history length.
  *  - `replace`/`checkpoint` commit → deltas cannot be applied (no
  *    retraction state), so recompute: scoped to the touched replay
  *    partitions when `replayScope ⊆ groupKeys` (each output group
  *    then belongs to exactly one scope and a partition-scoped
  *    replace is sound), otherwise the whole view.
  *
  * Exactly-once, same protocol as DerivedStream: the downstream table
  * IS the checkpoint — each maintenance commit carries the consumed
  * upstream version as `src_version/<name>` meta atomically with the
  * data, and (appId, batchId = upstream version) makes crash replays
  * no-ops BEFORE any recompute runs. Kill anywhere, re-drain, and the
  * view converges with nothing double-counted. */
final class AggregateStream(
    up: IncrementalTable,
    down: IncrementalTable,
    groupKeys: Seq[String],
    aggs: Seq[IncAgg],
    prepare: DataFrame => DataFrame = identity,
    partitionBy: Seq[String] = Nil,
    name: String = "src",
    replayScope: Seq[String] = Seq("year", "month", "day"))
    extends CommitConsumer {
  require(groupKeys.nonEmpty, "AggregateStream needs group keys")
  require(aggs.nonEmpty, "AggregateStream needs aggregate columns")
  require(partitionBy.forall(groupKeys.contains),
    "partitionBy must be a subset of groupKeys")

  private val srcKey = s"src_version/$name"
  private val appId = s"aggregate:$name"

  /** Upstream version the view has fully incorporated. */
  def sourceVersion: Long =
    down.latestMeta(srcKey).map(_.toLong).getOrElse(-1L)

  private def aggOf(raw: DataFrame): DataFrame =
    prepare(raw).groupBy(groupKeys.map(col): _*)
      .agg(aggs.head.delta.as(aggs.head.name),
        aggs.tail.map(a => a.delta.as(a.name)): _*)

  /** Fold every upstream commit past the recorded source version into
    * the view; returns how many were applied. Lagging never loses
    * data — it only batches more rows per delta aggregation. */
  def drain(): Int = {
    up.refresh()
    val from = sourceVersion
    val pending = up.commits().filter(c =>
      c.version > from && c.action != "meta" &&
        (c.add.nonEmpty || c.remove.nonEmpty))
    pending.foreach { c =>
      val cursor = Map(srcKey -> c.version.toString)
      c.action match {
        case "append" if down.exists =>
          val delta = aggOf(up.readCommit(c.version))
          val cur = down.read().select(
            groupKeys.map(col) ++
              aggs.map(a => col(a.name).as(s"_cur_${a.name}")): _*)
          // left join: the view's other keys never enter the plan;
          // AQE broadcasts the (micro-batch-sized) delta side
          val src = delta.join(cur, groupKeys, "left").select(
            groupKeys.map(col) ++ aggs.map { a =>
              val prev = col(s"_cur_${a.name}")
              when(prev.isNull, col(a.name))
                .otherwise(a.combine(prev, col(a.name))).as(a.name)
            }: _*)
          down.merge(src, groupKeys, meta = cursor,
            batchId = Some(c.version), appId = Some(appId))
        case "append" => // first commit seeds the view
          down.append(aggOf(up.readCommit(c.version)), partitionBy,
            meta = cursor, batchId = Some(c.version), appId = Some(appId))
        case _ => // replace | checkpoint: recompute (deltas can't retract)
          // scoped replace is sound only when every output group maps
          // to one scope (scope ⊆ groupKeys) AND the view is laid out
          // so a partition filter captures it (scope ⊆ partitionBy)
          val scopable = replayScope.forall(k =>
            groupKeys.contains(k) && partitionBy.contains(k))
          val scopes =
            if (scopable)
              (c.add ++ c.remove).map(scopeOf).distinct.filter(_.nonEmpty)
            else Nil
          if (scopes.isEmpty)
            down.replaceWhere(aggOf(up.readAt(c.version)), partitionBy,
              Map.empty, partitionFilter = Map.empty, meta = cursor,
              batchId = Some(c.version), appId = Some(appId))
          else scopes.zipWithIndex.foreach { case (sc, i) =>
            val m = if (i == scopes.size - 1) cursor
              else Map.empty[String, String]
            down.replaceWhere(
              aggOf(up.readAt(c.version, sc)).filter(
                sc.map { case (k, v) => col(k) === lit(v) }.reduce(_ && _)),
              partitionBy, Map.empty, partitionFilter = sc, meta = m,
              batchId = if (i == scopes.size - 1) Some(c.version) else None,
              appId = Some(appId))
          }
      }
    }
    pending.size
  }

  /** Hive `k=v` segments of a path, restricted to the replay scope. */
  private def scopeOf(rel: String): Map[String, String] =
    rel.split("/").iterator.flatMap { s =>
      val i = s.indexOf('=')
      if (i > 0) Some(s.substring(0, i) -> s.substring(i + 1)) else None
    }.toMap.view.filterKeys(replayScope.contains).toMap
}
