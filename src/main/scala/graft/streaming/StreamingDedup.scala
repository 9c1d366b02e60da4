package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the incremental form of
  * `pipeline.Dedup.dedupExact` for an unbounded document feed.
  *
  * Rows are keyed by a content fingerprint (md5 of the text) and dropped
  * when the same fingerprint was already seen inside the watermark horizon:
  * `dropDuplicatesWithinWatermark` keeps one state entry per fingerprint
  * and EVICTS it once the watermark passes, so state is bounded by
  * (arrival rate × horizon), not by the stream's lifetime — the property
  * that lets this run indefinitely on a 100 TB/day feed where a plain
  * `dropDuplicates` would accumulate state forever.
  */
object StreamingDedup {

  /** Emit each distinct document content at most once per watermark
    * horizon. Input schema: (ts timestamp, doc_id, text). */
  def dedupStream(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fingerprint")
}
