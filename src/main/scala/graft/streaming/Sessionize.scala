package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState`: event-time
  * sessionization per key with a gap timeout — the engine surface for
  * per-entity stateful logic beyond windowed aggregation (the reference
  * never keeps state across elements, SURVEY §2.6; training-data
  * pipelines need it for sessions, run-length stitching, per-entity
  * rate stats).
  *
  * Scale shape: state lives in the state store, partitioned by key —
  * shuffle is one exchange on the key, state size is O(open sessions),
  * and event-time timeouts + watermark bound retention. Also runs on a
  * bounded Dataset for batch backfill, with one semantic difference:
  * batch mode has no timeouts, so only gap-COMPLETED sessions emit — the
  * trailing open session of each key does not (append a per-key sentinel
  * event past the gap to flush them).
  */
object Sessionize {

  case class Event(key: Long, tsMs: Long, value: Double)

  case class SessionState(start: Long, last: Long, n: Long, total: Double)

  case class Session(key: Long, startMs: Long, endMs: Long, nEvents: Long,
      total: Double)

  implicit private val evEnc = Encoders.product[Event]
  implicit private val stEnc = Encoders.product[SessionState]
  implicit private val outEnc = Encoders.product[Session]
  implicit private val keyEnc = Encoders.scalaLong

  /** Split a key's events (plus any carried state) into gap-separated
    * sessions; completed sessions are emitted, the still-open tail stays
    * in state with an event-time timeout of `gapMs` past its last event.
    */
  private def step(gapMs: Long)(key: Long, rows: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(key, s.start, s.last, s.n, s.total))
    } else {
      val sorted = rows.toIndexedSeq.sortBy(_.tsMs)
      var open = state.getOption
      val done = IndexedSeq.newBuilder[Session]
      sorted.foreach { e =>
        open match {
          case Some(s) if e.tsMs - s.last <= gapMs =>
            // a late replay (tsMs < start) still merges; extend both ends
            open = Some(SessionState(math.min(s.start, e.tsMs),
              math.max(s.last, e.tsMs), s.n + 1, s.total + e.value))
          case Some(s) =>
            done += Session(key, s.start, s.last, s.n, s.total)
            open = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
          case None =>
            open = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
        }
      }
      open match {
        case Some(s) =>
          state.update(s)
          // a timeout at-or-before the current watermark is illegal (late
          // replays can put last+gap behind it) — clamp forward so the
          // session times out on the next watermark advance instead of
          // killing the query
          val wm = scala.util.Try(state.getCurrentWatermarkMs())
            .getOrElse(Long.MinValue) // batch mode has no watermark
          state.setTimeoutTimestamp(math.max(s.last + gapMs, wm + 1))
        case None => state.remove()
      }
      done.result().iterator
    }
  }

  /** Sessionize a stream of [[Event]]s (requires a watermark upstream for
    * the event-time timeout). Append-mode output of COMPLETED sessions.
    */
  def apply(events: Dataset[Event], gapMs: Long): Dataset[Session] =
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout())(step(gapMs) _)
}
