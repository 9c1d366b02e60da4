package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.Constraints
import graft.pipeline.Constraints.Constraint

/** Streaming twin of the batch validation suite
  * ([[graft.pipeline.Constraints]]): per-window pass rates for the
  * row-local constraint kinds (completeness, range, accepted values) over
  * an unbounded feed — "did the last 10 minutes of ingest stay healthy",
  * the gate a feed operator watches between full batch audits.
  *
  * The indicators are the SAME per-row expressions the batch numerators
  * sum ([[Constraints.indicatorExpr]]), stacked to (check_name, ok) rows
  * in a stateless projection; the only state is ONE windowed aggregation
  * covering every check (state size = windows × checks, independent of
  * row rate). Unique/ForeignKey constraints need corpus-wide context and
  * deliberately stay batch-side — run [[Constraints.constraintCheck]] on
  * snapshots for those (the same split as StreamingPrep's near-dup note).
  */
object StreamingConstraints {

  /** Monitor `rows` (must carry an event-time `ts` column plus the
    * constrained columns) against the row-local subset of `suite`. Emits
    * one row per (window, check) on window close:
    * (window_start, window_end, check_name, n_ok, n_rows, metric,
    * threshold, passed). */
  def constraintMonitor(rows: DataFrame, suite: Seq[Constraint],
      windowDuration: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val cs = suite.flatMap(c => Constraints.indicatorExpr(c).map(c -> _))
    require(cs.nonEmpty,
      "suite has no row-local constraints (Unique/ForeignKey are batch-side)")
    val stackRows = cs.map { case (c, ind) =>
      s"'${c.name}', CAST(($ind) AS BIGINT), CAST(${Constraints.dlit(c.threshold)} AS DOUBLE)"
    }.mkString(", ")
    rows
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"),
        expr(s"stack(${cs.size}, $stackRows) AS (check_name, ok, threshold)"))
      .groupBy(window(col("ts"), windowDuration), col("check_name"), col("threshold"))
      .agg(sum("ok").as("n_ok"), count(lit(1)).as("n_rows"))
      .selectExpr("window.start AS window_start", "window.end AS window_end",
        "check_name", "n_ok", "n_rows",
        graft.drift.pr6Sql("CAST(n_ok AS DOUBLE) / CAST(n_rows AS DOUBLE)") + " AS metric",
        "threshold",
        s"${graft.drift.pr6Sql("CAST(n_ok AS DOUBLE) / CAST(n_rows AS DOUBLE)")} >= threshold AS passed")
  }
}
