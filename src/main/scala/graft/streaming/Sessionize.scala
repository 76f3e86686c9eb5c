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
  * - a batch with new events extends the session and re-arms the
  *   timeout; a timeout callback emits the closed session and clears
  *   state. Late events beyond the watermark are dropped by the
  *   framework before they reach the state function.
  *
  * At scale the state store shards by key across executors like any
  * keyed shuffle; no driver involvement per event.
  */
object Sessionize {

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
          if (state.hasTimedOut) {
            // gap elapsed: close and clear
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(
              userId,
              new Timestamp(s.startUs / 1000),
              new Timestamp(s.endUs / 1000),
              s.nEvents, s.sumValue))
          } else {
            val evs = batch.toSeq
            if (evs.isEmpty) Iterator.empty
            else {
              val us = evs.map(e => e.ts.getTime * 1000L)
              val prev = state.getOption
              val next = SessionAgg(
                startUs = math.min(prev.map(_.startUs).getOrElse(Long.MaxValue), us.min),
                endUs = math.max(prev.map(_.endUs).getOrElse(Long.MinValue), us.max),
                nEvents = prev.map(_.nEvents).getOrElse(0L) + evs.size,
                sumValue = prev.map(_.sumValue).getOrElse(0.0) + evs.map(_.value).sum)
              state.update(next)
              // close the session when no event arrives for `gap`
              // past the latest event seen (event time)
              state.setTimeoutTimestamp(next.endUs / 1000 + gapMs)
              Iterator.empty
            }
          }
        })
  }
}
