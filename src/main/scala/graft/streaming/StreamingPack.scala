package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.pipeline.Packing

/** Streaming concat-and-chunk packing: assign every arriving document its
  * place in the fixed-token-window stream, incrementally.
  *
  * The batch [[Packing.seqPack]] materializes per-shard packing STATS; this
  * twin emits the per-document ASSIGNMENT — (window id, offset) — as docs
  * arrive, which is what an online ingestion service needs to route a doc
  * to the training shard that will contain it. State per md5 bucket is ONE
  * running token counter (a `Long`): bounded by shard count forever, no
  * watermark needed — the counter never needs eviction because packing is
  * append-only by construction.
  *
  * Ordering semantics: a stream packs in ARRIVAL order (batch uses the md5
  * permutation for replayability). Within one micro-batch the per-bucket
  * iterator order is not guaranteed by Spark, so docs are packed in doc_id
  * order inside each (bucket, micro-batch) group — deterministic under
  * replay of the same micro-batch boundaries, which is Structured
  * Streaming's own recovery contract.
  */
object StreamingPack {

  case class DocTok(doc_id: Long, bucket: String, tok: Long)
  case class Assignment(doc_id: Long, bucket: String, tok: Long,
      start_offset: Long, first_window: Long, last_window: Long,
      crosses_boundary: Boolean)
  case class BucketCursor(cum: Long)

  /** Pack an unbounded (doc_id, text) feed. Emits one assignment per doc. */
  def packStream(docs: DataFrame,
      windowTokens: Int = Packing.WindowTokens): Dataset[Assignment] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = windowTokens.toLong
    docs
      .selectExpr("doc_id", s"${Packing.tokSpark} AS tok",
        s"substring(${Packing.hSpark}, 1, 1) AS bucket")
      .select("doc_id", "bucket", "tok").as[DocTok]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketCursor, Assignment](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket, rows, state) =>
          var cum = state.getOption.fold(0L)(_.cum)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val start = cum
            cum += d.tok
            Assignment(d.doc_id, bucket, d.tok, start,
              start / w, (cum - 1) / w, start / w != (cum - 1) / w)
          }
          state.update(BucketCursor(cum))
          out.iterator
      }
  }
}
