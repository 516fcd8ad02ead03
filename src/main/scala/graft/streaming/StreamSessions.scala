package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.DecimalType

import graft.table.IncrementalTable

/** Streaming sessionization with custom state — the
  * `flatMapGroupsWithState` pattern the windowed-aggregation operators
  * can't express: session boundaries depend on the GAP between
  * consecutive events, so the state is an open session per user, not a
  * fixed window.
  *
  * Contract and shape:
  *  - state per user = the single OPEN session (id counter, start,
  *    last-seen, running aggregates) — O(users), never O(events);
  *  - each micro-batch folds its rows in (event-time, event_id) order
  *    into the state and emits every session it TOUCHED: sessions
  *    closed by a gap (final values) and the still-open session
  *    (provisional values, re-emitted on every extension);
  *  - the sink MERGE-upserts on `(user_id, start_us)` — a session's
  *    start is immutable once created, so closed sessions settle and
  *    the open session's row converges to its final value. No timeout
  *    machinery: the open session is always present in the table, so
  *    nothing needs a watermark-driven flush at stream end (the classic
  *    last-session-never-emitted problem of append-mode sessionization).
  *
  * Ordering caveat (the price of oracle-exact session ids): sessions
  * and their numbering are deterministic iff each user's events arrive
  * time-ordered ACROSS micro-batches (within a batch the fold sorts).
  * An out-of-order event across batches extends or splits sessions
  * differently than a global sort would — acceptable for monotone
  * sources (log shipping, CDC by commit time); bound disorder upstream
  * with a watermark-sorted staging hop if the source can stray.
  *
  * Exactly-once: one commit per micro-batch guarded by (appId =
  * checkpoint identity, batchId), like every streaming sink here; batch
  * 0 seeds the table with an append, later batches MERGE (both paths
  * honor the replay guard, so a crash-replay of either is a no-op).
  *
  * Scale: state store carries one small row per user; each micro-batch
  * shuffles only its own users' events (groupByKey on user_id); the
  * MERGE touches only files holding re-emitted keys (data-skipping
  * candidates on the join keys). At 100 TB the session table partitions
  * by a user-hash bucket so merges stay file-local per bucket.
  */
object StreamSessions {
  /** Input row after projection: event time + exact-decimal micros. */
  private[streaming] case class Ev(user_id: Long, event_id: Long, us: Long, vmic: Long)
  /** The open session per user (state-store row). */
  private[streaming] case class Open(session_id: Long, start_us: Long,
      last_us: Long, n_events: Long, sum_vmic: Long)
  /** Emitted session snapshot (closed = final, open = provisional). */
  private[streaming] case class SessionRow(user_id: Long, session_id: Long,
      n_events: Long, start_us: Long, end_us: Long, sum_vmic: Long)

  private def toRow(userId: Long, o: Open): SessionRow =
    SessionRow(userId, o.session_id, o.n_events, o.start_us, o.last_us, o.sum_vmic)

  /** Fold one user's micro-batch slice into the open-session state.
    * Lives on the (serializable) companion: the executor-side closure
    * must not capture the enclosing class, which holds the table. */
  private[streaming] def fold(gapUs: Long)(userId: Long, rows: Iterator[Ev],
      state: GroupState[Open]): Iterator[SessionRow] = {
    val evs = rows.toArray.sortBy(e => (e.us, e.event_id))
    val out = new ArrayBuffer[SessionRow](4)
    var open = state.getOption.orNull
    evs.foreach { e =>
      if (open == null)
        open = Open(1L, e.us, e.us, 1L, e.vmic)
      else if (e.us - open.last_us > gapUs) {
        out += toRow(userId, open) // gap closed it: final emission
        open = Open(open.session_id + 1, e.us, e.us, 1L, e.vmic)
      } else
        open = open.copy(last_us = math.max(open.last_us, e.us),
          n_events = open.n_events + 1, sum_vmic = open.sum_vmic + e.vmic)
    }
    if (open != null) { out += toRow(userId, open); state.update(open) }
    out.iterator
  }
}

final class StreamSessions(
    table: IncrementalTable,
    checkpointDir: String,
    gapUs: Long = 30L * 60 * 1000000) {
  import StreamSessions._

  /** Project a `(user_id, event_id, ts, value)` events frame to the
    * typed fold input. `value` goes through DECIMAL(18,6) to scaled-long
    * micros so the running sum is exact integer arithmetic (the fold
    * must be order-insensitive and replay-identical; double accumulation
    * is neither). */
  private[streaming] def project(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        (col("value").cast(DecimalType(18, 6)) * 1000000).cast("long").as("vmic"))
      .as[Ev]
  }

  private[streaming] def transform(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val gap = gapUs // plain long: don't drag `this` into the closure
    project(events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        StreamSessions.fold(gap) _)
      .toDF()
  }

  /** Idempotent micro-batch commit (exposed for replay tests). The
    * batch is persisted first: merge evaluates its source several times
    * (duplicate-key check, touched-file probe, rewrite), and each
    * evaluation would otherwise re-run the stateful fold — paying ~3×
    * the state-store load and making commit correctness lean on
    * re-execution determinism it doesn't need to. */
  private[streaming] def commitBatch(batch: DataFrame, batchId: Long): Unit = {
    val appId = CheckpointId(batch.sparkSession, checkpointDir)
    val pinned = batch.persist()
    try {
      if (!table.exists)
        table.append(pinned, partitionBy = Nil,
          batchId = Some(batchId), appId = Some(appId))
      else
        table.merge(pinned, keys = Seq("user_id", "start_us"),
          batchId = Some(batchId), appId = Some(appId))
      ()
    } finally { pinned.unpersist(); () }
  }

  /** Start over `events` (needs `user_id, event_id, ts: timestamp,
    * value: double`). `availableNow = true` drains and stops. */
  def start(events: DataFrame, availableNow: Boolean = true): StreamingQuery =
    transform(events).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(if (availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime("10 seconds"))
      .foreachBatch { (batch: DataFrame, id: Long) => commitBatch(batch, id) }
      .start()

  /** The settled session table: one row per (user, session), provisional
    * only for each user's final open session. `sum_value` derives from
    * the exact scaled-long sum at read time. */
  def sessions(): DataFrame =
    table.read().select(col("user_id"), col("session_id"), col("n_events"),
      col("start_us"), col("end_us"),
      (col("sum_vmic").cast(DecimalType(28, 6)) / 1000000).cast("double").as("sum_value"))
}
