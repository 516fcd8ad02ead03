package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.OooStreamSessions.{settleCore, EmptyState, Ev, PState, SessOut}

/** Property: folding ANY batch assignment of an event set (arbitrary
  * disorder, not just time-ordered splits — the generalization of
  * StreamSessionsProps) through the OooStreamSessions settlement core,
  * with the watermark delay sized to the realized disorder, settles to
  * the reference batch sessionization — for any gap, any number of
  * batches, any interleaving. Simulates the engine: per-key state map,
  * watermark advanced to (max seen - delay) at each batch end, one
  * settlement timer per key fired when the watermark passes it, and a
  * deleteInsert sink (upserts keyed (user, session_id), deletes drop
  * the key). */
object OooStreamSessionsProps extends Properties("OooStreamSessions") {

  /** Reference: sessionize fully-sorted events per user, ids 1..k. */
  private def batchSessions(evs: Seq[Ev],
      gapUs: Long): Map[(Long, Long), (Long, Long, Long, Long)] = {
    evs.groupBy(_.user_id).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.us, e.event_id)).toArray
      val sessions = OooStreamSessions.sessionize(sorted, gapUs)
      sessions.zipWithIndex.map { case (s, i) =>
        ((u, i + 1L), (s.n_events, s.start_us, s.end_us, s.sum_vmic))
      }
    }
  }

  /** Engine simulation over an arbitrary batch assignment. */
  private def streamOoo(batches: Seq[Seq[Ev]], gapUs: Long,
      delayUs: Long): Map[(Long, Long), (Long, Long, Long, Long)] = {
    val state = scala.collection.mutable.Map[Long, PState]()
    val timers = scala.collection.mutable.Map[Long, Long]()
    val table = scala.collection.mutable.Map[(Long, Long), (Long, Long, Long, Long)]()
    def apply(out: Seq[SessOut]): Unit = out.foreach { r =>
      if (r.deleted) table.remove((r.user_id, r.session_id))
      else table((r.user_id, r.session_id)) =
        (r.n_events, r.start_us, r.end_us, r.sum_vmic)
    }
    var wmUs = Long.MinValue
    var maxSeen = Long.MinValue
    batches.foreach { batch =>
      batch.groupBy(_.user_id).foreach { case (u, es) =>
        val (st2, out, timer) =
          settleCore(u, state.getOrElse(u, EmptyState), es.iterator, wmUs, gapUs)
        state(u) = st2
        apply(out)
        timers.remove(u)
        timer.foreach(timers(u) = _)
      }
      if (batch.nonEmpty)
        maxSeen = math.max(maxSeen, batch.map(_.us).max)
      if (maxSeen != Long.MinValue) wmUs = maxSeen - delayUs
      // fire settlement timers the new watermark has passed
      timers.filter { case (_, tMs) => tMs * 1000L <= wmUs }.keys.toSeq
        .foreach { u =>
          timers.remove(u)
          val (st2, out, timer) =
            settleCore(u, state(u), Iterator.empty, wmUs, gapUs)
          state(u) = st2
          apply(out)
          timer.foreach(timers(u) = _)
        }
    }
    table.toMap
  }

  private val evGen: Gen[Ev] = for {
    u <- Gen.choose(1L, 4L)
    id <- Gen.choose(1L, 1000000L)
    us <- Gen.choose(0L, 5000L) // dense time axis vs gap ⇒ plenty of sessions
    v <- Gen.choose(-500L, 500L)
  } yield Ev(u, id, us, v, new java.sql.Timestamp(us / 1000L))

  property("any bounded-disorder batch assignment settles to the batch sessionization") =
    forAll(Gen.listOf(evGen), Gen.choose(1, 6), Gen.choose(50L, 800L),
        Gen.choose(0L, Long.MaxValue)) {
      (evs0: List[Ev], nBatches: Int, gap: Long, seed: Long) =>
        // distinct event ids: the sort tiebreak must be total
        val evs = evs0.groupBy(e => (e.user_id, e.event_id)).values.map(_.head).toSeq
        // RANDOM batch assignment — no ordering constraint at all
        val rnd = new scala.util.Random(seed)
        val assigned = evs.map(e => (e, rnd.nextInt(nBatches)))
        val batches = (0 until nBatches).map(b =>
          assigned.collect { case (e, bb) if bb == b => e })
        // size the watermark delay to the REALIZED disorder: no event
        // may arrive below the watermark (the determinism contract)
        var maxSeen = Long.MinValue
        var disorder = 0L
        batches.foreach { b =>
          if (b.nonEmpty) {
            val mx = b.map(_.us).max
            b.foreach(e => if (maxSeen != Long.MinValue)
              disorder = math.max(disorder, maxSeen - e.us))
            maxSeen = math.max(maxSeen, mx)
          }
        }
        val delayUs = disorder + 1
        streamOoo(batches, gap, delayUs) == batchSessions(evs, gap)
    }
}
