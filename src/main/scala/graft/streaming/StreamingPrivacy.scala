package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.Privacy

/** Streaming twin of the batch re-identification audit
  * ([[graft.pipeline.Privacy]]): per-window equivalence-class sizes over a
  * quasi-identifier set, flagging classes below the k line as each window
  * closes — "did the last 10 minutes of ingest publish a near-unique
  * profile", the alarm a release feed watches between full batch audits.
  *
  * The QI key expressions are the SAME shared bucketing text the batch
  * [[Privacy.QiSets]] group on; the only state is ONE windowed count per
  * (window, QI class) — state size = windows × distinct classes,
  * independent of row rate. The corpus-wide rollups (the dataset k value,
  * band histogram, l-diversity) need every class at once and deliberately
  * stay batch-side, same split as StreamingConstraints' Unique/ForeignKey
  * note: a closed window's per-class rows ARE that window's class frame,
  * so the batch rollup text applies directly to the sink table. */
object StreamingPrivacy {

  /** Monitor `rows` (must carry an event-time `ts` column plus the columns
    * `qiExprs` reads) for k-anonymity breaches. Emits one row per closed
    * (window, QI class): (window_start, window_end, qi0.., class_size,
    * at_risk) with at_risk = class_size < k. */
  def kAnonymityMonitor(rows: DataFrame, qiExprs: Seq[String],
      k: Int = Privacy.KThreshold,
      windowDuration: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val keys = qiExprs.zipWithIndex.map { case (e, i) => s"$e AS qi$i" }
    rows
      .withWatermark("ts", watermarkDelay)
      .selectExpr("ts" +: keys: _*)
      .groupBy(window(col("ts"), windowDuration) +: qiExprs.indices.map(i => col(s"qi$i")): _*)
      .agg(count(lit(1)).as("class_size"))
      .selectExpr(Seq("window.start AS window_start", "window.end AS window_end") ++
        qiExprs.indices.map(i => s"qi$i") ++
        Seq("CAST(class_size AS BIGINT) AS class_size",
          s"class_size < $k AS at_risk"): _*)
  }
}
