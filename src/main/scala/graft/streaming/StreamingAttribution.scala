package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming last-touch attribution via `flatMapGroupsWithState` —
  * the incremental form of [[graft.pipeline.EventAnalytics.attribution]]:
  * per user, remember the most recent non-conversion touch; the moment a
  * conversion arrives, emit a credit row (channel, conversion ts, revenue).
  * Downstream, the channels-sized rollup is an ordinary streaming
  * aggregation the consumer picks (or a batch query over the credit sink).
  *
  * Scale: state is ONE optional string per user — keyed and shuffled by
  * user_id, bounded by the user universe, independent of event volume; no
  * watermark needed (last-touch never expires by time).
  *
  * Ordering contract (the StreamingFunnel relaxation): events are sorted
  * WITHIN each microbatch by the batch operator's exact key — full-µs
  * timestamp, then event_id (the feed carries the id precisely so
  * equal-timestamp ties resolve identically to the batch window's
  * `orderBy(ts_us, event_id)`) — so crediting is exact for in-order feeds
  * and any disorder contained in one batch. A cross-batch retro-touch can
  * make a credit differ from the batch recomputation only for conversions
  * whose true last touch arrived late — the credit falls back to the
  * then-known touch (or 'direct'), never to a touch that happened after
  * the conversion. The spec pins batch==stream on in-order feeds.
  */
object StreamingAttribution {

  /** The attribution feed row — [[StreamingSessions.Event]] plus the
    * event_id the batch tiebreak needs. */
  case class AttrEvent(ts: Timestamp, user_id: Long, event_type: String,
      value: Double, event_id: Long)

  /** Per-user memory: the last non-conversion event type seen. */
  case class TouchState(channel: Option[String])

  case class Credit(user_id: Long, channel: String, ts: Timestamp, value: Double)

  val ConversionType: String = graft.pipeline.EventAnalytics.ConversionType

  def attributionGate(events: Dataset[AttrEvent]): Dataset[Credit] = {
    val spark = events.sparkSession
    import spark.implicits._

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Credit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, rows, state: GroupState[TouchState]) =>
          var channel = state.getOption.flatMap(_.channel)
          val out = scala.collection.mutable.Buffer[Credit]()
          for (e <- rows.toSeq.sortBy(e => (StreamingSessions.eventUs(e.ts), e.event_id))) {
            if (e.event_type == ConversionType)
              out += Credit(userId, channel.getOrElse("direct"), e.ts, e.value)
            else channel = Some(e.event_type)
          }
          state.update(TouchState(channel))
          out.iterator
      }
  }
}
