package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Event-time TIMERS under `transformWithState`: sessionization that
  * emits a summary exactly when the WATERMARK passes the session's
  * inactivity deadline — the half of the Spark 4 stateful API
  * [[RunningTotals]] doesn't exercise (named timers + expiry callback;
  * the flatMapGroupsWithState ancestor is q31's sessionize with
  * GroupStateTimeout).
  *
  * Per user the state is (event count, last event-time); every batch
  * re-arms ONE timer at lastTs + gap (the previous timer is deleted —
  * timers are a keyed set, not a slot). When the watermark crosses the
  * deadline Spark invokes `handleExpiredTimer`, which emits
  * (user, n_events, session_end) and clears the state — so each closed
  * session is emitted exactly once, and an open session holds exactly
  * one pending timer. State and timers are both bounded by live users
  * and evicted on close.
  */
class SessionTimers(gapMs: Long)
    extends StatefulProcessor[Long, (Long, Timestamp), (Long, Long, Timestamp)] {

  @transient private var sess: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[(Long, Long)]("session",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Timestamp)],
      timers: TimerValues): Iterator[(Long, Long, Timestamp)] = {
    val (n0, last0) = Option(sess.get()).getOrElse((0L, Long.MinValue))
    val (n, last) = rows.foldLeft((n0, last0)) { case ((an, al), (_, ts)) =>
      (an + 1L, math.max(al, ts.getTime))
    }
    if (last0 != Long.MinValue) getHandle.deleteTimer(last0 + gapMs)
    getHandle.registerTimer(last + gapMs)
    sess.update((n, last))
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[(Long, Long, Timestamp)] = {
    val out = Option(sess.get()).map { case (n, last) =>
      (key, n, new Timestamp(last))
    }
    sess.clear()
    out.iterator
  }
}

object SessionTimers {

  /** Wire a (user_id, ts) stream (must carry a watermark on ts) through
    * the timer-driven sessionizer. Requires the RocksDB state store.
    */
  def closedSessions(events: Dataset[(Long, Timestamp)], gapMs: Long)
      : Dataset[(Long, Long, Timestamp)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new SessionTimers(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
