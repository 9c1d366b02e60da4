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
}
