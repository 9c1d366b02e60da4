package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.LmScore

/** Streaming LM-perplexity gate: the CCNet quality signal
  * ([[graft.pipeline.LmScore]]) applied to an unbounded document feed.
  *
  * The model is TRAINED BATCH-SIDE (a trusted corpus doesn't arrive on the
  * stream) and scoring needs only stream-static equi-joins against the
  * vocabulary-sized count tables — Structured Streaming's cheapest join
  * shape: the static side broadcasts, the stream side stays a stateless
  * projection until the single per-doc aggregation. That aggregation is
  * keyed on (ts, doc_id) under a watermark, so state is bounded by the
  * horizon and each doc's score emits exactly once when its event time
  * expires — the same contract as the windowed drift monitor.
  *
  * The 1-row totals frame is folded into literals at plan-build time
  * (driver-side collect of a bounded aggregate) rather than cross-joined:
  * stream-static cross joins needlessly complicate the plan for two
  * numbers that are constants of the trained model.
  */
object StreamingLm {

  /** Scores a streaming (ts, doc_id, text) feed against a batch-trained
    * [[LmScore.LmModel]]. Emits (ts, doc_id, n_bigrams, bigram_hit_rate,
    * oov_rate, avg_logprob, ppl) once per doc when the watermark passes. */
  def scoreStream(docs: DataFrame, model: LmScore.LmModel,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val t = model.totals.collect()(0)
    val (nTrain, vTrain) =
      (Option(t.get(0)).fold("NULL")(_ => t.getDouble(0).toString),
        Option(t.get(1)).fold("NULL")(_ => t.getDouble(1).toString))
    val pairs = docs
      .selectExpr("ts", "doc_id",
        "filter(split(lower(text), '\\\\s+'), t -> t != '') AS toks")
      .selectExpr("ts", "doc_id",
        "filter(transform(toks, (t, i) -> named_struct('w1', t, 'w2', " +
          "try_element_at(toks, i + 2))), s -> s.w2 IS NOT NULL) AS bgs")
      .selectExpr("ts", "doc_id", "inline_outer(bgs)")
    pairs
      .join(broadcast(model.uni.select(col("w").as("w1"), col("cu").as("cu1"))), Seq("w1"), "left")
      .join(broadcast(model.uni.select(col("w").as("w2"), col("cu").as("cu2"))), Seq("w2"), "left")
      .join(broadcast(model.bi), Seq("w1", "w2"), "left")
      .selectExpr("ts", "doc_id",
        "CASE WHEN w1 IS NULL THEN NULL WHEN cb IS NOT NULL THEN 1e0 ELSE 0e0 END AS hit",
        "CASE WHEN w1 IS NULL THEN NULL WHEN cu2 IS NULL THEN 1e0 ELSE 0e0 END AS oov",
        "CASE WHEN w1 IS NULL THEN NULL WHEN cb IS NOT NULL THEN log10(cb * 1e0 / cu1) " +
          s"ELSE log10(${LmScore.BackoffSql} * (COALESCE(cu2, 0) + 1) / ($nTrain + $vTrain)) END AS lp")
      .withWatermark("ts", watermarkDelay)
      .groupBy("ts", "doc_id").agg(
        count(col("hit")).as("n_bigrams"),
        avg("hit").as("bigram_hit_rate"),
        avg("oov").as("oov_rate"),
        avg("lp").as("avg_logprob"))
      .selectExpr("ts", "doc_id", "n_bigrams", "bigram_hit_rate", "oov_rate",
        "avg_logprob",
        "CASE WHEN avg_logprob IS NOT NULL THEN pow(10e0, -avg_logprob) END AS ppl")
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
      watermarkDelay: String = "1 hour"): DataFrame =
    scoreStream(docs, model, watermarkDelay)
      .withColumn("bucket", LmScore.bucketExpr(headMax, middleMax))
}
