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
  */
object StreamingLm {

  /** Scores a streaming (ts, doc_id, text) feed against a batch-trained
    * [[LmScore.LmModel]]. Emits (ts, doc_id, n_bigrams, bigram_hit_rate,
    * oov_rate, avg_logprob, ppl) once per doc, in arrival micro-batch
    * (stateless map — nothing waits on the watermark). */
  def scoreStream(docs: DataFrame, model: LmScore.LmModel,
      watermarkDelay: String = "1 hour"): DataFrame =
    LmScore.scoreCollected(docs.withWatermark("ts", watermarkDelay),
        LmScore.collectModel(model), carry = Seq("ts"))
      .select("ts", "doc_id", "n_bigrams", "bigram_hit_rate", "oov_rate",
        "avg_logprob", "ppl")

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
      watermarkDelay: String = "1 hour"): DataFrame =
    scoreStream(docs, model, watermarkDelay)
      .withColumn("bucket", LmScore.bucketExpr(headMax, middleMax))
}
