package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, ExpiredTimerInfo, TTLConfig, ValueState}

import Sessionize.{Event, Session, SessionState}

/** [[Sessionize]] on Spark 4's `transformWithState` API — the current-gen
  * arbitrary-state operator that replaces `flatMapGroupsWithState`:
  * typed state handles (`ValueState`/`ListState`/`MapState`) instead of
  * one opaque blob, explicit event-time timers instead of implicit
  * timeout config, and a RocksDB-backed store (changelog-checkpointed at
  * scale). Semantics are kept identical to [[Sessionize.step]] — same
  * merge, same gap split, same emission — so the two operators are
  * interchangeable and `SessionizeTwsSpec` pins them to each other.
  *
  * Scale shape is unchanged: one shuffle on the key, state = open
  * sessions, watermark-driven timer expiry bounds retention. TWS adds
  * per-state TTL and multiple named states per key for richer operators
  * (rate limiting + sessionization in one pass) without re-shuffling.
  */
object SessionizeTws {

  class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, Event, Session] {

    @transient private var open: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState]("open",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Session] = {
      val sorted = rows.toIndexedSeq.sortBy(_.tsMs)
      var cur: Option[SessionState] =
        if (open.exists()) Some(open.get()) else None
      val done = IndexedSeq.newBuilder[Session]
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.tsMs - s.last <= gapMs =>
            cur = Some(SessionState(math.min(s.start, e.tsMs),
              math.max(s.last, e.tsMs), s.n + 1, s.total + e.value))
          case Some(s) =>
            done += Session(key, s.start, s.last, s.n, s.total)
            cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
          case None =>
            cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
        }
      }
      cur.foreach { s =>
        open.update(s)
        // fire once the watermark passes the gap window; a session
        // extended by a later batch leaves this timer stale, which
        // handleExpiredTimer detects and ignores
        getHandle.registerTimer(s.last + gapMs + 1)
      }
      done.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      if (!open.exists()) Iterator.empty
      else {
        val s = open.get()
        // stale timer from a since-extended session: the real expiry is
        // still ahead
        if (s.last + gapMs + 1 > expiredTimerInfo.getExpiryTimeInMs())
          Iterator.empty
        else {
          open.clear()
          Iterator(Session(key, s.start, s.last, s.n, s.total))
        }
      }
    }
  }

  /** Sessionize a (possibly streaming) keyed event Dataset; event-time
    * semantics require the caller to have set a watermark on a timestamp
    * column derived from `tsMs` when streaming.
    */
  def apply(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val evEnc = Encoders.product[Event]
    implicit val outEnc = Encoders.product[Session]
    events.groupByKey(_.key)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
