package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.drift.GroupDrift.groupSlices]]: windowed
  * per-(dimension, category) slice metrics for EVERY dimension in one
  * stateful aggregation.
  *
  * The batch side uses GROUPING SETS (one Expand, one exchange); the
  * stream side gets the same single-pass shape from a `stack` projection —
  * a stateless row expansion (d rows per event, one per dimension) feeding
  * ONE windowed hash-agg keyed by (window, dimension, category). State is
  * bounded by the watermark × slice cardinality, independent of event
  * volume; a per-dimension query would instead pay d stateful
  * aggregations and d state stores over the same feed.
  *
  * Fit-batch / apply-stream: [[referenceSlices]] computes per-slice
  * reference stats from a batch snapshot; [[monitor]] joins each closed
  * window's slices against that broadcast frame and emits the mean
  * pct-change with the group-analyzer zero rule — the same comparison
  * `group_numeric_metrics` makes between two batch snapshots.
  */
object StreamingSlices {

  private def stackExpr(dims: Seq[String]): String =
    s"stack(${dims.size}, " +
      dims.map(d => s"'$d', CAST($d AS STRING)").mkString(", ") +
      ") AS (dimension, category)"

  /** Per-(dimension, category) reference stats from a BATCH frame: row
    * count and exact-decimal metric sum (the same accumulators the batch
    * grouping-sets path uses). */
  def referenceSlices(ref: DataFrame, dims: Seq[String], metric: String): DataFrame =
    ref.selectExpr(stackExpr(dims), metric)
      .groupBy("dimension", "category")
      .agg(count(lit(1)).as("ref_n"),
        sum(col(metric).cast("decimal(32,6)")).as("ref_sum"))
      .withColumn("ref_mean", col("ref_sum").cast("double") / col("ref_n"))

  /** Windowed slice monitor over a STREAMING frame (ts timestamp, the
    * dims, and `metric`). Emits one row per closed (window, dimension,
    * category) with the slice mean and its pct change vs the reference;
    * `threshold` flags slices whose |pct change| exceeds it (the O32/O33
    * mean-drift dial). Slices absent from the reference carry NULL
    * ref_mean/pct change and never flag. */
  def monitor(events: DataFrame, refSlices: DataFrame, dims: Seq[String],
      metric: String,
      windowDuration: String = "10 minutes",
      watermarkDelay: String = "20 minutes",
      threshold: Double = 0.1): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .selectExpr(Seq("ts", stackExpr(dims), metric): _*)
      .groupBy(window(col("ts"), windowDuration), col("dimension"), col("category"))
      .agg(count(lit(1)).as("n"),
        sum(col(metric).cast("decimal(32,6)")).as("win_sum"))
      .withColumn("win_mean", col("win_sum").cast("double") / col("n"))
      .join(broadcast(refSlices.select("dimension", "category", "ref_n", "ref_mean")),
        Seq("dimension", "category"), "left")
      .withColumn("mean_pct_change",
        expr(graft.drift.pctChangeSql("ref_mean", "win_mean")))
      .withColumn("drift_detected",
        coalesce(abs(col("mean_pct_change")) > threshold, lit(false)))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("dimension"), col("category"), col("n"), col("win_mean"),
        col("ref_mean"), col("mean_pct_change"), col("drift_detected"))
}
