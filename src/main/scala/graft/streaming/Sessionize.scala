package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One raw event entering sessionization. */
final case class SessionEvent(userId: Long, ts: Timestamp, value: Double)

/** Accumulating per-user session state (kept in the state store). */
final case class SessionAgg(
    startUs: Long, endUs: Long, nEvents: Long, sumValue: Double)

/** A closed session emitted downstream. */
final case class ClosedSession(
    userId: Long, start: Timestamp, end: Timestamp,
    nEvents: Long, sumValue: Double)

/** Streaming sessionization with custom keyed state — the
  * `flatMapGroupsWithState` analog of the batch gaps-and-islands
  * query (`q21_sessionize`): events for a user belong to one session
  * until a gap larger than `gapMs` passes with no activity; the
  * session is then CLOSED and emitted exactly once.
  *
  * Mechanics (the canonical Structured Streaming custom-state shape):
  * - input must carry a watermark on `ts` — event-time timeouts fire
  *   when the watermark passes `lastEventTime + gap`;
  * - state per user is a tiny running aggregate (start/end/n/sum),
  *   NOT the event list — state size is O(#active users), independent
  *   of event volume;
  * - the GAP CHECK runs against event time inside the state function,
  *   not only via the timeout: a batch may deliver events that are
  *   already more than `gap` past the stored session (backlog replay,
  *   or the watermark lagging a trigger), and two >gap-separated
  *   events can even share one micro-batch — each gap crossing closes
  *   the open session immediately and starts a new one, so emitted
  *   sessions match the batch gaps-and-islands semantics exactly;
  * - the timeout only covers the "stream went quiet" case: it emits
  *   the trailing open session once the watermark passes end + gap.
  *   Late events beyond the watermark are dropped by the framework
  *   before they reach the state function.
  *
  * At scale the state store shards by key across executors like any
  * keyed shuffle; no driver involvement per event.
  */
object Sessionize {

  /** Full-microsecond event time. `Timestamp.getTime` alone truncates
    * to milliseconds, which would silently shift session boundaries
    * off the batch gaps-and-islands answer (`q21_sessionize`) on
    * sub-ms data — the nanos field carries the rest. */
  private def tsUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def usTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def sessions(
      events: Dataset[SessionEvent],
      gapMs: Long): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[SessionAgg]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionAgg, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, batch: Iterator[SessionEvent],
         state: GroupState[SessionAgg]) => {
          def close(s: SessionAgg): ClosedSession = ClosedSession(
            userId, usTs(s.startUs), usTs(s.endUs), s.nEvents, s.sumValue)
          if (state.hasTimedOut) {
            // stream went quiet: close and clear
            val s = state.get
            state.remove()
            Iterator.single(close(s))
          } else {
            val evs = batch.toSeq.sortBy(e => tsUs(e.ts))
            if (evs.isEmpty) Iterator.empty
            else {
              val gapUs = gapMs * 1000L
              val closed = Seq.newBuilder[ClosedSession]
              var cur = state.getOption
              for (e <- evs) {
                val us = tsUs(e.ts)
                cur = cur match {
                  case Some(s) if us - s.endUs > gapUs =>
                    closed += close(s) // event-time gap crossed
                    Some(SessionAgg(us, us, 1L, e.value))
                  case Some(s) if s.startUs - us > gapUs =>
                    // late arrival more than a gap BEFORE the open
                    // session: it can never extend it — emit the late
                    // event as its own closed session (best effort
                    // without buffering; within-gap late events merge)
                    closed += close(SessionAgg(us, us, 1L, e.value))
                    Some(s)
                  case Some(s) =>
                    Some(SessionAgg(math.min(s.startUs, us),
                      math.max(s.endUs, us), s.nEvents + 1L,
                      s.sumValue + e.value))
                  case None =>
                    Some(SessionAgg(us, us, 1L, e.value))
                }
              }
              val open = cur.get
              state.update(open)
              // the trailing session closes when no event arrives for
              // `gap` past its latest event (event time). Spark rejects
              // a timeout at/below the current watermark — clamp just
              // above it, which fires on the next watermark advance
              // (the session is already gap-expired in event time).
              state.setTimeoutTimestamp(
                math.max(open.endUs / 1000 + gapMs,
                  state.getCurrentWatermarkMs() + 1))
              closed.result().iterator
            }
          }
        })
  }
}
