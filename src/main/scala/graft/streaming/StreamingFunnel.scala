package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming conversion funnel via `flatMapGroupsWithState` — the
  * incremental form of [[graft.pipeline.EventAnalytics.funnel]]: per user,
  * track first-touch completion of the ordered steps
  * view → click → purchase (a later step counts only STRICTLY AFTER the
  * previous step's first completion) and emit one row per step the moment
  * it completes.
  *
  * Scale: state is three optional timestamps per user — keyed and shuffled
  * by user_id, independent of event volume.
  *
  * Ordering contract (the streaming relaxation): events are sorted by time
  * WITHIN each microbatch, so the gate is exact for in-order feeds and for
  * any disorder contained in one batch. A cross-batch retro-event (e.g. an
  * earlier `view` arriving after a later batch already fixed t1) can only
  * have made step gates STRICTER than the batch recomputation — the gate
  * never counts a conversion the batch form would not, it can only miss
  * one whose evidence arrived out of order. The spec pins batch==stream on
  * in-order feeds.
  */
object StreamingFunnel {

  import StreamingSessions.Event

  /** Per-user progress: first-touch µs of each completed step. */
  case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long])

  case class StepCompletion(user_id: Long, step: String, ts: Timestamp)

  val Steps = Seq("view", "click", "purchase")

  def funnelGate(events: Dataset[Event]): Dataset[StepCompletion] = {
    val spark = events.sparkSession
    import spark.implicits._
    def toUs(t: Timestamp): Long = StreamingSessions.eventUs(t)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StepCompletion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, rows, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(None, None, None))
          val out = scala.collection.mutable.Buffer[StepCompletion]()
          for (e <- rows.toSeq.sortBy(e => toUs(e.ts))) {
            val us = toUs(e.ts)
            e.event_type match {
              case "view" if st.t1.isEmpty =>
                st = st.copy(t1 = Some(us))
                out += StepCompletion(userId, "view", e.ts)
              case "click" if st.t2.isEmpty && st.t1.exists(us > _) =>
                st = st.copy(t2 = Some(us))
                out += StepCompletion(userId, "click", e.ts)
              case "purchase" if st.t3.isEmpty && st.t2.exists(us > _) =>
                st = st.copy(t3 = Some(us))
                out += StepCompletion(userId, "purchase", e.ts)
              case _ => ()
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
