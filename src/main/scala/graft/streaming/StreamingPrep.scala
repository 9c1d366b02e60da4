package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** Streaming corpus-prep: the batch funnel's language + quality gates and
  * exact dedup, incrementalized for an unbounded document feed.
  *
  * The gates are the SAME stateless expression chain the batch funnel uses
  * ([[TextAnalysis.gateDocs]]) — a pure projection, so Structured Streaming
  * runs it per-row with zero state. Exact dedup reuses the watermark-bounded
  * `dropDuplicatesWithinWatermark` contract (one state entry per content
  * fingerprint, evicted when the watermark passes — state is bounded by
  * arrival rate × horizon, never stream lifetime).
  *
  * The near-dup stage deliberately stays batch-side: MinHash-LSH banding
  * and component closure need corpus-wide shuffles; on a stream, run them
  * per micro-batch via `foreachBatch` against the accumulated canonical
  * store.
  */
object StreamingPrep {

  /** Gate + dedup an unbounded (ts, doc_id, source, text) feed: emits each
    * gate-surviving distinct content at most once per watermark horizon.
    * `minEntropyBits` additionally drops templated/repetitive docs whose
    * in-row word entropy ([[TextAnalysis.lexicalSignals]] — a stateless
    * run-length fold, no state, no shuffle) rounds below the floor; the
    * pr6'd comparison is the same decision text as the batch
    * `doc_entropy` census. */
  def prepStream(docs: DataFrame, watermarkDelay: String = "1 hour",
      minEntropyBits: Option[Double] = None): DataFrame = {
    val gated = TextAnalysis.gateDocs(docs, carry = Seq("ts"))
      .filter(col("qual_ok"))
    val entGated = minEntropyBits match {
      case Some(floor) =>
        // the floor binds as a typed literal (a raw string interpolation
        // would emit an unparseable SQL literal for scientific-notation
        // doubles); the pr6'd h side is the same text as the batch census
        TextAnalysis.lexicalSignals(gated)
          .filter(expr(graft.drift.pr6Sql("h")) >= lit(floor))
      case None => gated
    }
    entGated
      .withColumn("fingerprint", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fingerprint")
      .select("ts", "doc_id", "source", "text")
  }
}
