package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming drift monitoring: the batch drift operators applied
  * incrementally to an event stream.
  *
  * The reference is batch-only; this is the streaming extension a
  * production pipeline needs — windowed per-key statistics with a
  * watermark, joined against static reference statistics, emitting a drift
  * flag per (window, key). State is bounded by the watermark; the
  * aggregation is a standard streaming hash-agg, so it scales exactly like
  * the batch groupBy (partial aggregation per micro-batch, shuffle by
  * (window, key)).
  */
object StreamingDrift {

  /** Per-(event_type) reference statistics from a batch frame. */
  def referenceStats(ref: DataFrame): DataFrame =
    ref.groupBy("event_type").agg(
      avg("value").as("ref_mean"),
      stddev("value").as("ref_std"),
      count(lit(1)).as("ref_n"))

  /** Windowed mean-shift monitor over a STREAMING events frame
    * (schema: ts timestamp, event_type string, value double).
    * Emits one row per closed window per key with a z-scored mean shift
    * against the static reference. */
  def monitor(events: DataFrame, refStats: DataFrame,
      windowDuration: String = "10 minutes",
      watermarkDelay: String = "20 minutes",
      zThreshold: Double = 3.0): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"), avg("value").as("win_mean"))
      .join(broadcast(refStats), "event_type")
      // a constant (or single-row) reference gives std 0/null: the z-score
      // is undefined, not infinite — null mean_z, no drift flag (ANSI mode
      // would otherwise raise DIVIDE_BY_ZERO on the std=0 case)
      .withColumn("mean_z",
        when(col("ref_std") > 0,
          abs(col("win_mean") - col("ref_mean")) / (col("ref_std") / sqrt(col("n")))))
      .withColumn("drift_detected", coalesce(col("mean_z") > zThreshold, lit(false)))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n"), col("win_mean"), col("ref_mean"),
        col("mean_z"), col("drift_detected"))

  /** Windowed numeric stats per event type — the streaming twin of the
    * batch tumbling-window aggregation ([[graft.pipeline.Sessions.eventWindow]]):
    * count, sum and mean of `value` per closed (window, event_type).
    *
    * The SUM accumulates in DECIMAL(18,6), exactly like the batch twin —
    * `value` is a 2-decimal measure so the cast is lossless and the sum is
    * EXACT no matter how the rows split across micro-batches, which is what
    * lets the batch-replay gate ([[Replay]]) hash-compare this output
    * against the batch query's DuckDB oracle bit-for-bit. The mean is ONE
    * double division of that exact sum at emission. State: one small
    * accumulator per in-flight (window, key), dropped as the watermark
    * passes. */
  def windowedStats(events: DataFrame,
      windowDuration: String = "1 day",
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value_dec"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n_events"),
        col("sum_value_dec").cast("double").as("sum_value"),
        (col("sum_value_dec").cast("double") / col("n_events")).as("avg_value"))

  /** Streaming categorical frequency monitor: windowed value counts with
    * relative frequency per window — the streaming form of the O15 value
    * counts (join downstream against reference frequencies for JS/χ²). */
  def categoricalMonitor(events: DataFrame,
      windowDuration: String = "10 minutes",
      watermarkDelay: String = "20 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))
}
