package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming engagement counts — the incremental form of
  * [[graft.pipeline.EventAnalytics.activeUsers]]'s approx path: per
  * event-time day window, distinct users via `approx_count_distinct`
  * (HLL++). The aggregation state per window is ONE mergeable sketch
  * (fixed size), not a user set — the property that makes streaming
  * distinct-counting viable at all; an exact streaming distinct would hold
  * the day's entire user universe in the state store.
  *
  * Watermark bounds state: day windows finalize (and their sketches drop)
  * once event time passes window end + the lateness budget. Append mode
  * emits each day exactly once, on finalization — the same contract as
  * [[StreamingDrift]]'s windowed monitor.
  */
object StreamingEngagement {

  /** `events` needs (ts TIMESTAMP, user_id). Emits (day_start, dau). */
  def dauStream(events: DataFrame, lateness: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(approx_count_distinct("user_id").as("dau"))
      .select(col("w.start").as("day_start"), col("dau"))

  // --------------------------------------------------------- running TWAP

  /** Per-user running integral for the streaming TWAP — the incremental
    * form of [[graft.pipeline.EventAnalytics.timeWeightedValue]]: the
    * piecewise-constant area accrues event-by-event, so state is FOUR
    * scalars per user regardless of history length. The area accumulates
    * in a double (each user's additions are sequential in one state cell,
    * so there is no partial-sum-order nondeterminism — the batch
    * operator's DECIMAL discipline guards a PARALLEL sum); the spec pins
    * stream == batch to 1e-6. In-order contract as the other gates:
    * events sort by the batch operator's exact (µs, event_id) key within
    * each microbatch. */
  case class TwapState(firstUs: Long, lastUs: Long, lastValue: Double,
      area: Double, nEvents: Long)

  case class TwapRow(user_id: Long, n_events: Long, span_us: Long, twap: Option[Double])

  import StreamingAttribution.AttrEvent

  def twapGate(events: org.apache.spark.sql.Dataset[AttrEvent])
      : org.apache.spark.sql.Dataset[TwapRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TwapState, TwapRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, rows, state: GroupState[TwapState]) =>
          var st = state.getOption.orNull
          for (e <- rows.toSeq.sortBy(e => (StreamingSessions.eventUs(e.ts), e.event_id))) {
            val us = StreamingSessions.eventUs(e.ts)
            st =
              if (st == null) TwapState(us, us, e.value, 0.0, 1L)
              else st.copy(
                area = st.area + st.lastValue * (us - st.lastUs),
                lastUs = us, lastValue = e.value, nEvents = st.nEvents + 1)
          }
          state.update(st)
          val span = st.lastUs - st.firstUs
          Iterator.single(TwapRow(userId, st.nEvents, span,
            if (span > 0) Some(st.area / span) else None))
      }
  }
}
