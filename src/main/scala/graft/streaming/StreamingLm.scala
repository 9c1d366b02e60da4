package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.pipeline.LmScore

/** Streaming LM-perplexity gate: the CCNet quality signal
  * ([[graft.pipeline.LmScore]]) applied to an unbounded document feed.
  *
  * The model is TRAINED BATCH-SIDE (a trusted corpus doesn't arrive on the
  * stream) and, since round 9, scoring is COMPLETELY STATELESS: the
  * vocabulary-sized model collects to broadcast count maps and each doc
  * scores in-row over its token array ([[LmScore.scoreCollected]] — the
  * exact code path the batch queries run, so stream and snapshot scores
  * are bit-identical by construction, not by parallel maintenance). No
  * stream-static join, no per-doc aggregation, no state store at all:
  * a doc's score emits in the micro-batch it arrives in. The watermark is
  * still stamped on `ts` so downstream windowed consumers (the drift
  * monitor, the bucket rollups) can aggregate this output directly.
  *
  * Output contract: the stateless default is AT-LEAST-ONCE — a source that
  * redelivers a doc emits its score row again (the pre-round-9
  * watermarked groupBy emitted exactly one row per key). Consumers that
  * need per-doc uniqueness from a replaying source opt into
  * `dedupeRedeliveries = true`, which inserts
  * `dropDuplicatesWithinWatermark(doc_id)` — keyed on doc_id ALONE, so a
  * redelivery survives even when the source re-stamps `ts` on retry — a
  * watermark-bounded state store (keys expire as the watermark passes, so
  * state stays O(inflight window), never O(stream)).
  *
  * The model collect is CEILING-GUARDED like every batch surface
  * ([[LmScore.collectModelBounded]]: a plan-level `limit(ceiling + 1)`, so
  * the driver never fetches more than the ceiling no matter how
  * Heaps-law-explosive the bigram vocabulary is) — but unlike the batch
  * path there is NO join fallback to route to: the joined scorer is a
  * per-doc groupBy pipeline, which on a stream would mean a state store
  * per doc — worse than the thing guarded against. So an over-ceiling
  * model FAILS LOUDLY at gate construction (before any stream starts),
  * with the fix in the message: train on a smaller trusted sample or run
  * the batch gate. A stream must never silently OOM its driver.
  */
object StreamingLm {

  /** Scores a streaming (ts, doc_id, text) feed against a batch-trained
    * [[LmScore.LmModel]]. Emits (ts, doc_id, n_bigrams, bigram_hit_rate,
    * oov_rate, avg_logprob, ppl) once per ARRIVAL (see the at-least-once
    * contract in the object doc), in arrival micro-batch (stateless map —
    * nothing waits on the watermark unless `dedupeRedeliveries`).
    *
    * @throws IllegalArgumentException if the model exceeds `maxModelRows`
    *         collected rows (see the object doc — no stream-safe fallback
    *         exists, so the gate refuses to start rather than risk the
    *         driver heap). */
  def scoreStream(docs: DataFrame, model: LmScore.LmModel,
      watermarkDelay: String = "1 hour",
      dedupeRedeliveries: Boolean = false,
      maxModelRows: Int = LmScore.DefaultMaxModelRows): DataFrame = {
    val collected = LmScore.collectModelBounded(model, maxModelRows)
      .getOrElse(throw new IllegalArgumentException(
        s"StreamingLm: model exceeds $maxModelRows collected rows; the " +
          "streaming gate has no never-collected fallback (a per-doc join " +
          "would need a state store per doc) — train on a smaller trusted " +
          "sample or score batch-side via LmScore.scoreRouted"))
    val wm = docs.withWatermark("ts", watermarkDelay)
    val in = if (dedupeRedeliveries)
      wm.dropDuplicatesWithinWatermark("doc_id") else wm
    LmScore.scoreCollected(in, collected, carry = Seq("ts"))
      .select("ts", "doc_id", "n_bigrams", "bigram_hit_rate", "oov_rate",
        "avg_logprob", "ppl")
  }

  /** CCNet quality sampling on a stream: the head/middle/tail tercile
    * thresholds are FIT BATCH-SIDE over a corpus snapshot
    * ([[LmScore.pplTerciles]]) and replayed here as literals — an unbounded
    * feed has no global percentile, so the deployment shape is exactly
    * fit-batch / apply-stream, like the drift monitor's reference stats.
    * Adds a `bucket` column to [[scoreStream]]'s per-doc output via the
    * SAME bucket expression the batch query uses, so a doc buckets
    * identically whether it arrived in the snapshot or on the feed. */
  def bucketStream(docs: DataFrame, model: LmScore.LmModel,
      headMax: Double, middleMax: Double,
      watermarkDelay: String = "1 hour",
      dedupeRedeliveries: Boolean = false,
      maxModelRows: Int = LmScore.DefaultMaxModelRows): DataFrame =
    scoreStream(docs, model, watermarkDelay, dedupeRedeliveries, maxModelRows)
      .withColumn("bucket", LmScore.bucketExpr(headMax, middleMax))
}
