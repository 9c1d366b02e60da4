package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * incremental form of [[graft.pipeline.Sessions.sessionize]]: a session
  * closes after `gapMinutes` of user inactivity, tracked with event-time
  * timeouts against the watermark.
  *
  * Scale: state is one small record per ACTIVE user (not per event), keyed
  * and shuffled by user_id; closed sessions are emitted and state dropped
  * on timeout, so state size is bounded by concurrently-active users. */
// Serializable: eventUs is called from flatMapGroupsWithState closures,
// which serialize a reference to this module into the task
object StreamingSessions extends Serializable {

  case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)

  /** Shared full-µs instant for every streaming gate's in-batch ordering:
    * `getTime` carries the milliseconds; the sub-ms residue lives in
    * `getNanos`. One definition — the gates must agree on how
    * equal-millisecond events order (the batch operators order by exact
    * µs), so no gate keeps a private truncating copy. */
  private[graft] def eventUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Exact inverse of [[eventUs]]: the `new Timestamp(us / 1000)` shortcut
    * TRUNCATES the sub-millisecond residue, which made closed-session spans
    * µs-lossy — the batch-replay equivalence gate ([[Replay]]) needs the
    * stream's session spans bit-identical to the batch window math, so the
    * sub-ms µs go back in through setNanos. */
  private[graft] def usToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
  case class SessionState(startUs: Long, lastUs: Long, nEvents: Long)

  /** `start_us`/`end_us` carry the exact event-time µs of the span (the
    * timestamps render the same instant; integer µs is what downstream
    * exact arithmetic — the replay gate's duration sums — folds over). */
  case class ClosedSession(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
      n_events: Long, duration_sec: Double, start_us: Long, end_us: Long)

  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def toUs(t: Timestamp): Long = eventUs(t)
    def close(userId: Long, st: SessionState): ClosedSession =
      ClosedSession(userId, usToTs(st.startUs), usToTs(st.lastUs),
        st.nEvents, (st.lastUs - st.startUs) / 1e6, st.startUs, st.lastUs)

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (toUs(e.ts), e.value))
            var st = state.getOption.orNull
            val closed = scala.collection.mutable.Buffer[ClosedSession]()
            for (e <- sorted) {
              val us = toUs(e.ts)
              st = if (st == null) SessionState(us, us, 1L)
              else if (us - st.lastUs > gapUs) { closed += close(userId, st); SessionState(us, us, 1L) }
              else st.copy(lastUs = math.max(st.lastUs, us), nEvents = st.nEvents + 1)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.lastUs / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.iterator
          }
      }
  }
}
