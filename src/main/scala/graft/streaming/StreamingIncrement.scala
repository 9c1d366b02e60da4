package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Streaming twin of [[graft.pipeline.Dedup.incrementalDedup]]: an
  * unbounded feed of new documents gated against a STATIC accepted
  * corpus, as pure stream-static anti-joins.
  *
  * Gate 1 (exact): md5(text) anti-join against the corpus hash set.
  * Gate 2 (fuzzy): any shared MinHash band bucket → presumed near-dup,
  * dropped. The signatures are computed per row by
  * [[Dedup.rowBandSigs]] — a stateless projection, so the whole gate
  * carries ZERO streaming state: no aggregation, no watermark, no
  * `dropDuplicates` buffer. Deviation from the batch gate (documented):
  * batch verifies band collisions at exact Jaccard before dropping;
  * collision-verification needs a per-candidate shingle join that would
  * re-aggregate per micro-batch, so the stream drops on collision alone
  * (high precision at the 0.8 banding point; a consumer can re-verify
  * the dropped stream offline). Batch-kept ⊇ stream-kept always.
  *
  * At scale the static side is the persisted corpus signature artifact
  * ([[Dedup.corpusBandSets]] — computed once per corpus snapshot, like
  * [[Dedup.writeClusters]]), and each anti-join is a broadcast or
  * shuffled equi-join per micro-batch of increment size, never corpus
  * size on the stream side.
  */
object StreamingIncrement {

  /** Gate an unbounded (doc_id, text, …) stream against a static corpus
    * (doc_id, text). Emits the admitted rows with the input schema. */
  def incrementGate(newDocs: DataFrame, corpus: DataFrame): DataFrame =
    incrementGateWith(newDocs,
      corpus.select(md5(col("text")).as("h")).distinct(),
      Dedup.corpusBandSets(corpus))

  /** The same gate against PRECOMPUTED static artifacts — the production
    * form: `corpusHashes` is the distinct md5 set and `bandSets` the
    * per-band signature frames (persist/load via [[Dedup.writeBandSets]] /
    * [[Dedup.readBandSets]]), so per-increment cost never includes a
    * corpus scan. */
  def incrementGateWith(newDocs: DataFrame, corpusHashes: DataFrame,
      bandSets: Seq[DataFrame]): DataFrame = {
    val inCols = newDocs.columns.toSeq
    val sigs = Dedup.rowBandSigs("__w")
    val withSigs = newDocs
      .withColumn("__h", md5(col("text")))
      .withColumn("__w", split(col("text"), "\\s+"))
    val exactKept = withSigs.join(corpusHashes,
      withSigs("__h") === corpusHashes("h"), "left_anti")
    val fuzzyKept = sigs.zipWithIndex.foldLeft(exactKept) { case (df, (sig, b)) =>
      val withSig = df.withColumn(s"__sig$b", sig)
      val bucket = bandSets(b).withColumnRenamed("sig", s"__bsig$b")
      withSig.join(bucket, withSig(s"__sig$b") === bucket(s"__bsig$b"), "left_anti")
    }
    fuzzyKept.select(inCols.map(col): _*)
  }
}
