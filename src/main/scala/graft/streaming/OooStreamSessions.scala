package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, StreamingQuery, TimeMode, Trigger, TTLConfig, ValueState}
import org.apache.spark.sql.types.DecimalType

import graft.table.IncrementalTable

/** Sessionization under OUT-OF-ORDER arrivals — the `transformWithState`
  * twin of [[StreamSessions]], dropping its cross-batch ordering
  * contract.
  *
  * [[StreamSessions]] keeps O(1) state per user but requires each
  * user's events to arrive time-ordered ACROSS micro-batches — a
  * contract a real file/Kafka source violates. This variant accepts any
  * arrival order with lateness bounded by the input watermark delay:
  *
  *  - state per user = the BUFFER of not-yet-settled events plus the
  *    count of sessions already finalized — O(events inside the
  *    watermark horizon), the price of disorder (cf. the same trade in
  *    [[StreamIntervalJoin]] vs the ordered IVM JoinStream);
  *  - each batch folds new events into the buffer, re-sessionizes the
  *    sorted buffer, and FINALIZES the prefix of sessions whose
  *    `end + gap <= watermark`: no future non-late event can extend
  *    them, land before them, or bridge them, so their ids and
  *    aggregates are settled — those events leave the buffer;
  *  - the still-mutable tail is emitted PROVISIONALLY each time it
  *    changes; an event-time timer registered at the open session's
  *    close time re-runs settlement when the watermark passes it, so
  *    sessions finalize (and state drains) even for users with no
  *    further input — the "timers close sessions at the watermark"
  *    half of the Spark 4 state API;
  *  - an out-of-order event can merge two provisional sessions, so the
  *    per-user session COUNT can shrink: the processor remembers the
  *    highest session_id it ever emitted and issues explicit DELETE
  *    markers for ids beyond the new count; the sink applies each
  *    batch as one atomic [[IncrementalTable.deleteInsert]] (retract
  *    stale ids + upsert current rows) under the (appId, batchId)
  *    replay guard.
  *
  * Determinism: provided no event is later than the watermark delay,
  * the settled table equals the batch sessionization (q33's oracle)
  * regardless of arrival order — q113 drives it with a deliberately
  * shuffled bounded-disorder split, and OooStreamSessionsProps
  * randomizes batch assignment under the same oracle fold. Events
  * later than the delay are dropped (the bounded-state deal; the
  * defensive `finalizedThrough` guard additionally refuses to rewrite
  * settled history even if the engine delivers one).
  *
  * Requires the RocksDB state store provider (a `transformWithState`
  * engine requirement) — [[OooStreamSessions.run]] sets it for the
  * drain and restores the previous provider after. */
object OooStreamSessions {
  /** Input row: event time both as micros (exact math) and as the
    * original timestamp column (carries the watermark). */
  private[streaming] case class Ev(user_id: Long, event_id: Long, us: Long,
      vmic: Long, ts: java.sql.Timestamp)
  /** Emitted row: a session upsert, or (deleted=true) a retraction of a
    * session id the latest re-sessionization no longer produces. */
  private[streaming] case class SessOut(user_id: Long, session_id: Long,
      n_events: Long, start_us: Long, end_us: Long, sum_vmic: Long,
      deleted: Boolean)

  private[streaming] case class Sess(start_us: Long, end_us: Long,
      n_events: Long, sum_vmic: Long)

  /** Contiguous gap-delimited runs of the (sorted) buffer. */
  private[streaming] def sessionize(sorted: Array[Ev], gapUs: Long): ArrayBuffer[Sess] = {
    val out = new ArrayBuffer[Sess](4)
    var i = 0
    while (i < sorted.length) {
      val e = sorted(i)
      if (out.nonEmpty && e.us - out.last.end_us <= gapUs) {
        val s = out.last
        out(out.length - 1) = Sess(s.start_us, math.max(s.end_us, e.us),
          s.n_events + 1, s.sum_vmic + e.vmic)
      } else out += Sess(e.us, e.us, 1L, e.vmic)
      i += 1
    }
    out
  }

  /** Per-user settlement state, engine-independent (the props drive
    * [[settleCore]] directly; the Processor persists this through the
    * state-store handles). */
  private[streaming] case class PState(buf: Vector[Ev], closed: Long,
      maxEmitted: Long, finalizedThrough: Long)
  private[streaming] val EmptyState: PState =
    PState(Vector.empty, 0L, 0L, Long.MinValue)

  /** The pure settlement step: fold `fresh` into the buffer and settle
    * against watermark `wmUs`. Returns the new state, the emissions
    * (finalized prefix + provisional tail + retractions), and the
    * settlement timer to arm (ms, when a provisional tail remains). */
  private[streaming] def settleCore(userId: Long, st: PState,
      fresh: Iterator[Ev], wmUs: Long,
      gapUs: Long): (PState, Seq[SessOut], Option[Long]) = {
    // refuse to rewrite settled history: anything at or before the
    // finalized horizon is provably late beyond the watermark delay
    val incoming = fresh.filter(_.us > st.finalizedThrough).toArray
    val all = (st.buf.iterator ++ incoming.iterator).toArray
      .sortBy(e => (e.us, e.event_id))
    if (all.isEmpty) return (st, Nil, None)
    val sessions = sessionize(all, gapUs)
    var closed = st.closed
    val out = new ArrayBuffer[SessOut](sessions.length + 1)
    // finalize the settled prefix: end + gap below the watermark means
    // no future non-late event can touch it, precede it, or bridge it
    var nFinal = 0
    while (nFinal < sessions.length &&
        sessions(nFinal).end_us + gapUs <= wmUs) {
      val s = sessions(nFinal)
      closed += 1
      out += SessOut(userId, closed, s.n_events, s.start_us, s.end_us,
        s.sum_vmic, deleted = false)
      nFinal += 1
    }
    val (finThrough, buf) =
      if (nFinal > 0) {
        val horizon = sessions(nFinal - 1).end_us
        (horizon, all.iterator.dropWhile(_.us <= horizon).toVector)
      } else (st.finalizedThrough, all.toVector)
    // provisional tail: re-emit every still-mutable session
    var j = nFinal
    while (j < sessions.length) {
      val s = sessions(j)
      out += SessOut(userId, closed + (j - nFinal) + 1, s.n_events,
        s.start_us, s.end_us, s.sum_vmic, deleted = false)
      j += 1
    }
    // retract ids beyond the new total (an ooo event merged sessions)
    val total = closed + (sessions.length - nFinal)
    var sid = total + 1
    while (sid <= st.maxEmitted) {
      out += SessOut(userId, sid, 0L, 0L, 0L, 0L, deleted = true)
      sid += 1
    }
    val timer =
      if (sessions.length > nFinal)
        Some((sessions.last.end_us + gapUs) / 1000L + 1L)
      else None
    (PState(buf, closed, math.max(st.maxEmitted, total), finThrough),
      out.toSeq, timer)
  }

  private[streaming] final class Processor(gapUs: Long)
      extends StatefulProcessor[Long, Ev, SessOut] {
    @transient private var buf: ListState[Ev] = _
    @transient private var closedCount: ValueState[Long] = _
    @transient private var maxEmitted: ValueState[Long] = _
    @transient private var finalizedThrough: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[Ev]("buf", Encoders.product[Ev], TTLConfig.NONE)
      closedCount = getHandle.getValueState[Long]("closed",
        Encoders.scalaLong, TTLConfig.NONE)
      maxEmitted = getHandle.getValueState[Long]("maxEmit",
        Encoders.scalaLong, TTLConfig.NONE)
      finalizedThrough = getHandle.getValueState[Long]("finThrough",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def valueOr(s: ValueState[Long], dflt: Long): Long =
      if (s.exists()) s.get() else dflt

    /** State-store round-trip around [[settleCore]]; shared by input
      * handling and timer expiry (fresh = empty). */
    private def settle(userId: Long, fresh: Iterator[Ev],
        wmUs: Long): Iterator[SessOut] = {
      val st = PState(buf.get().toVector, valueOr(closedCount, 0L),
        valueOr(maxEmitted, 0L), valueOr(finalizedThrough, Long.MinValue))
      val (st2, out, timer) = settleCore(userId, st, fresh, wmUs, gapUs)
      if (st2 ne st) {
        if (st2.buf != st.buf) {
          buf.clear()
          if (st2.buf.nonEmpty) buf.put(st2.buf.toArray)
        }
        if (st2.closed != st.closed) closedCount.update(st2.closed)
        if (st2.maxEmitted != st.maxEmitted) maxEmitted.update(st2.maxEmitted)
        if (st2.finalizedThrough != st.finalizedThrough)
          finalizedThrough.update(st2.finalizedThrough)
      }
      // (re-)arm the settlement timer at the open tail's close time so
      // the watermark alone finalizes it, input or not
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      timer.foreach(getHandle.registerTimer)
      out.iterator
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[SessOut] =
      settle(key, rows, timerValues.getCurrentWatermarkInMs() * 1000L)

    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessOut] =
      settle(key, Iterator.empty, timerValues.getCurrentWatermarkInMs() * 1000L)
  }

  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
  /** Dial for the q113 watch (VERDICT r10 #5): changelog checkpointing
    * uploads per-batch RocksDB changelogs instead of full snapshots —
    * checkpoint cost tracks the batch's state DELTA, not total state
    * size (the shape that matters when per-key session state grows).
    * Default ON; `spark.graft.ooo.changelog=false` restores full
    * snapshots (the r1-r10 behavior) for A/B runs. */
  private val DialKey = "spark.graft.ooo.changelog"
}

final class OooStreamSessions(
    table: IncrementalTable,
    checkpointDir: String,
    watermarkDelay: String,
    gapUs: Long = 30L * 60 * 1000000) {
  import OooStreamSessions._

  private[streaming] def transform(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        (col("value").cast(DecimalType(18, 6)) * 1000000).cast("long").as("vmic"),
        col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new Processor(gapUs), TimeMode.EventTime(),
        OutputMode.Update())
      .toDF()
  }

  /** One atomic retract-and-upsert commit per micro-batch: stale ids
    * (count shrank) delete, current rows replace-or-insert — both under
    * the (appId, batchId) replay guard. */
  private[streaming] def commitBatch(batch: DataFrame, batchId: Long): Unit = {
    val appId = CheckpointId(batch.sparkSession, checkpointDir)
    val pinned = batch.persist()
    try {
      // timer expiry and input handling can both emit a key in one
      // batch with identical settled values — collapse before insert
      val ups = pinned.filter(!col("deleted")).drop("deleted")
        .dropDuplicates("user_id", "session_id")
      if (!table.exists)
        table.append(ups, partitionBy = Nil,
          batchId = Some(batchId), appId = Some(appId))
      else
        table.deleteInsert(
          pinned.select("user_id", "session_id").distinct(),
          Seq("user_id", "session_id"), lit(true), ups,
          batchId = Some(batchId), appId = Some(appId))
      ()
    } finally { pinned.unpersist(); () }
  }

  private def start(events: DataFrame): StreamingQuery =
    transform(events).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => commitBatch(batch, id) }
      .start()

  /** Drain `events` (needs `user_id, event_id, ts: timestamp, value`)
    * to completion under the RocksDB state store (a transformWithState
    * engine requirement), restoring the session's previous provider
    * after. */
  def run(events: DataFrame): Unit = {
    val conf = events.sparkSession.conf
    val prev = conf.getOption(ProviderKey)
    val prevCl = conf.getOption(ChangelogKey)
    conf.set(ProviderKey, RocksDbProvider)
    conf.set(ChangelogKey,
      conf.getOption(DialKey).getOrElse("true"))
    try start(events).awaitTermination()
    finally {
      prev match {
        case Some(p) => conf.set(ProviderKey, p)
        case None => conf.unset(ProviderKey)
      }
      prevCl match {
        case Some(p) => conf.set(ChangelogKey, p)
        case None => conf.unset(ChangelogKey)
      }
    }
  }

  /** The settled session table, in [[StreamSessions.sessions]]'s shape
    * (q33's oracle columns). */
  def sessions(): DataFrame =
    table.read().select(col("user_id"), col("session_id"), col("n_events"),
      col("start_us"), col("end_us"),
      (col("sum_vmic").cast(DecimalType(28, 6)) / 1000000).cast("double").as("sum_value"))
}
