package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.StreamSessions.{Ev, Open, SessionRow}

/** Property: folding any TIME-ORDERED batch split of an event set
  * through the StreamSessions state machine, then taking each key's
  * LAST emission (what the MERGE sink settles to), equals a reference
  * batch sessionization — for any gap, any per-batch arrival order,
  * any number of batches. This is the fold-level twin of
  * StreamSessionsSpec's engine-level test: the engine supplies
  * (partitioned iterators, state store); the algebra lives here. */
object StreamSessionsProps extends Properties("StreamSessions") {

  /** Reference: sessionize fully-sorted events per user. */
  private def batchSessions(evs: Seq[Ev], gapUs: Long): Map[(Long, Long), SessionRow] = {
    evs.groupBy(_.user_id).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.us, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer[SessionRow]()
      var sid = 0L
      var cur: SessionRow = null
      sorted.foreach { e =>
        if (cur == null || e.us - cur.end_us > gapUs) {
          if (cur != null) out += cur
          sid += 1
          cur = SessionRow(u, sid, 1L, e.us, e.us, e.vmic)
        } else cur = cur.copy(n_events = cur.n_events + 1,
          end_us = math.max(cur.end_us, e.us), sum_vmic = cur.sum_vmic + e.vmic)
      }
      if (cur != null) out += cur
      out
    }.map(r => ((r.user_id, r.start_us), r)).toMap
  }

  /** Drive the production fold over a batch split, mimicking the state
    * store (Map) and the MERGE sink (last emission per key wins). */
  private def streamSessions(batches: Seq[Seq[Ev]], gapUs: Long): Map[(Long, Long), SessionRow] = {
    val state = scala.collection.mutable.Map[Long, Open]()
    val table = scala.collection.mutable.Map[(Long, Long), SessionRow]()
    batches.foreach { batch =>
      batch.groupBy(_.user_id).foreach { case (u, es) =>
        val gs = new FakeGroupState(state.get(u))
        StreamSessions.fold(gapUs)(u, es.iterator, gs).foreach { r =>
          table((r.user_id, r.start_us)) = r
        }
        gs.value.foreach(state(u) = _)
      }
    }
    table.toMap
  }

  private val evGen: Gen[Ev] = for {
    u <- Gen.choose(1L, 4L)
    id <- Gen.choose(1L, 1000000L)
    us <- Gen.choose(0L, 5000L) // dense time axis vs gap ⇒ plenty of sessions
    v <- Gen.choose(-500L, 500L)
  } yield Ev(u, id, us, v)

  property("any time-ordered batch split settles to the batch sessionization") =
    forAll(Gen.listOf(evGen), Gen.choose(1, 6), Gen.choose(50L, 800L)) {
      (evs0: List[Ev], nBatches: Int, gap: Long) =>
        // distinct event ids: the sort tiebreak must be total
        val evs = evs0.groupBy(e => (e.user_id, e.event_id)).values.map(_.head).toSeq
        // time-ordered split: batch boundaries are cuts on the time axis,
        // order WITHIN a batch shuffled by the hash groupBy above
        val sorted = evs.sortBy(e => (e.us, e.user_id, e.event_id))
        val cuts = (1 until nBatches)
          .map(i => i * (sorted.size / nBatches.toDouble)).map(_.toInt)
        val batches = (Seq(0) ++ cuts :+ sorted.size).sliding(2).collect {
          case Seq(a, b) if b > a => sorted.slice(a, b)
        }.toSeq
        streamSessions(batches, gap) == batchSessions(evs, gap)
    }

  /** Minimal GroupState for driving the fold outside the engine. */
  private final class FakeGroupState[S](init: Option[S])
      extends org.apache.spark.sql.streaming.GroupState[S] {
    var value: Option[S] = init
    override def exists: Boolean = value.isDefined
    override def get: S = value.get
    override def getOption: Option[S] = value
    override def update(s: S): Unit = { value = Some(s) }
    override def remove(): Unit = { value = None }
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(durationMs: Long): Unit = ()
    override def setTimeoutDuration(duration: String): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
