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
  * Ordering contract (the StreamingFunnel relaxation): events are sorted by
  * full-µs timestamp WITHIN each microbatch, so crediting is exact for
  * in-order feeds and any disorder contained in one batch. A cross-batch
  * retro-touch can make a credit differ from the batch recomputation only
  * for conversions whose true last touch arrived late — the credit falls
  * back to the then-known touch (or 'direct'), never to a touch that
  * happened after the conversion. The spec pins batch==stream on in-order
  * feeds.
  */
object StreamingAttribution {

  import StreamingSessions.Event

  /** Per-user memory: the last non-conversion event type seen. */
  case class TouchState(channel: Option[String])

  case class Credit(user_id: Long, channel: String, ts: Timestamp, value: Double)

  val ConversionType: String = graft.pipeline.EventAnalytics.ConversionType

  def attributionGate(events: Dataset[Event]): Dataset[Credit] = {
    val spark = events.sparkSession
    import spark.implicits._
    // full-µs instant: getTime carries ms; the sub-ms residue lives in nanos
    def toUs(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Credit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, rows, state: GroupState[TouchState]) =>
          var channel = state.getOption.flatMap(_.channel)
          val out = scala.collection.mutable.Buffer[Credit]()
          for (e <- rows.toSeq.sortBy(e => toUs(e.ts))) {
            if (e.event_type == ConversionType)
              out += Credit(userId, channel.getOrElse("direct"), e.ts, e.value)
            else channel = Some(e.event_type)
          }
          state.update(TouchState(channel))
          out.iterator
      }
  }
}
