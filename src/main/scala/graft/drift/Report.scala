package graft.drift

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flat result consolidation + run summary — reference O39/O40
  * (/root/reference/result_handler.py, data_drift_detector.py).
  *
  * The flat result schema is `(column_name, column_type, dimension_id,
  * drift_score, drift_severity)` rows from every analyzer family
  * (result_handler.py:14-21), and the summary is the severity histogram +
  * average score (result_handler.py:75-120). Everything stays in-plan; the
  * union of analyzer outputs is a cheap union of already-tiny aggregates.
  */
object Report {

  /** Unified flat drift-result rows: numeric O13 scores + categorical O19
    * scores, one row per (table, column). */
  def driftResults(spark: SparkSession, dir: String): DataFrame = {
    val num = NumericDrift.driftScore(spark, dir)
      .selectExpr("table_name", "column_name", "column_type", "dimension_id",
        "drift_score", "drift_severity")
    val cat = CategoricalDrift.categoricalDrift(spark, dir)
      .selectExpr("table_name", "column_name", "'categorical' AS column_type",
        "'all' AS dimension_id", "drift_score", "drift_severity")
    num.union(cat).orderBy("table_name", "column_name")
  }

  def driftResultsSql: String =
    s"SELECT table_name, column_name, column_type, dimension_id, drift_score, drift_severity " +
      s"FROM (${NumericDrift.driftScoreSql}) n UNION ALL " +
      "SELECT table_name, column_name, 'categorical' AS column_type, 'all' AS dimension_id, " +
      s"drift_score, drift_severity FROM (${CategoricalDrift.categoricalDriftSql}) c " +
      "ORDER BY table_name, column_name"

  /** O39 get_drift_summary: severity histogram + average drift score. */
  private val summaryFinal: Seq[String] = Seq(
    "COUNT(*) AS total_columns_analyzed",
    "ROUND(AVG(drift_score), 6) AS average_drift_score",
    "SUM(CASE WHEN drift_severity = 'None' THEN 1 ELSE 0 END) AS n_none",
    "SUM(CASE WHEN drift_severity = 'Low' THEN 1 ELSE 0 END) AS n_low",
    "SUM(CASE WHEN drift_severity = 'Medium' THEN 1 ELSE 0 END) AS n_medium",
    "SUM(CASE WHEN drift_severity = 'High' THEN 1 ELSE 0 END) AS n_high",
    "SUM(CASE WHEN drift_severity = 'Critical' THEN 1 ELSE 0 END) AS n_critical")

  def driftSummary(spark: SparkSession, dir: String): DataFrame =
    driftResults(spark, dir)
      .agg(expr(summaryFinal.head), summaryFinal.tail.map(expr): _*)
      .selectExpr("'all' AS dimension_id", "total_columns_analyzed", "average_drift_score",
        "CAST(n_none AS BIGINT) AS n_none", "CAST(n_low AS BIGINT) AS n_low",
        "CAST(n_medium AS BIGINT) AS n_medium", "CAST(n_high AS BIGINT) AS n_high",
        "CAST(n_critical AS BIGINT) AS n_critical")

  def driftSummarySql: String =
    s"SELECT dimension_id, total_columns_analyzed, average_drift_score, " +
      "CAST(n_none AS BIGINT) AS n_none, CAST(n_low AS BIGINT) AS n_low, " +
      "CAST(n_medium AS BIGINT) AS n_medium, CAST(n_high AS BIGINT) AS n_high, " +
      "CAST(n_critical AS BIGINT) AS n_critical FROM " +
      s"(SELECT 'all' AS dimension_id, ${summaryFinal.mkString(", ")} FROM (${driftResultsSql.stripSuffix(" ORDER BY table_name, column_name")}) r) s"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "drift_results" -> ((s, d) => driftResults(s, d)),
    "drift_summary" -> ((s, d) => driftSummary(s, d)),
  )

  def oracles: Map[String, String] = Map(
    "drift_results" -> driftResultsSql,
    "drift_summary" -> driftSummarySql,
  )
}
