package graft.drift

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Result persistence + per-column metadata — reference P3 sink, O5, O39
  * write_results / O40 save_results (/root/reference/result_handler.py:205-
  * 224, data_drift_detector.py:246-284, column_analyzer.py:153-182).
  *
  * The reference appends to Delta with mergeSchema; this environment has no
  * Delta jars, so the sink is parquet-append behind the same API (swap the
  * format string for Delta deployments). */
object Results {

  /** O5: per-column physical metadata profile (driver-side schema walk). */
  def columnMetadata(df: DataFrame): Seq[(String, String, Boolean, String)] =
    df.schema.fields.toSeq.map(f =>
      (f.name, f.dataType.simpleString, f.nullable, f.metadata.json))

  /** Flat result rows (result_handler.py:14-21 schema) from a [[DriftReport]]:
    * (run_timestamp, column_name, column_type, dimension_id, drift_score,
    * metrics JSON). */
  def flatResults(spark: SparkSession, report: DriftReport): DataFrame = {
    import spark.implicits._
    // non-finite doubles (possible for rel-diffs/stddev on degenerate
    // columns) serialize as null — bare NaN/Infinity is invalid JSON
    def j(kv: (String, Any)*): String =
      kv.map { case (k, v) =>
        val jv = v match {
          case d: Double if d.isNaN || d.isInfinite => "null"
          case other => other.toString
        }
        s""""$k": $jv"""
      }.mkString("{", ", ", "}")
    val num = report.numeric.map { n =>
      (n.column, "numerical", "all", n.driftScore,
        j("mean_ref" -> n.refMean, "mean_curr" -> n.currMean,
          "mean_rel_diff" -> n.meanRelDiff, "null_diff" -> n.nullDiff,
          "drift_detected" -> n.driftDetected))
    }
    val cat = report.categorical.map { c =>
      (c.column, "categorical", "all", c.driftScore,
        j("js_divergence" -> c.jsDivergence, "chi_p_value" -> c.chiPValue,
          "null_diff" -> c.nullDiff, "drift_detected" -> c.driftDetected))
    }
    val base = (num ++ cat)
      .toDF("column_name", "column_type", "dimension_id", "drift_score", "metrics")
    // group-analysis rows carry the reference's '<dim>=<category>' style
    // dimension_id (result_handler's dimensional rows, demo_notebook.py:64)
    val withGroups =
      if (report.groupDrift.columns.contains("overall_drift_score"))
        base.unionByName(report.groupDrift.selectExpr(
          "dimension AS column_name", "'group' AS column_type",
          "CONCAT(dimension, '=', category) AS dimension_id",
          "overall_drift_score AS drift_score",
          "CONCAT('{\"drift_detected\": ', drift_detected, '}') AS metrics"))
      else base
    withGroups
      .withColumn("run_timestamp", current_timestamp())
      .withColumn("drift_severity", severity(col("drift_score")))
      .select("run_timestamp", "column_name", "column_type", "dimension_id",
        "drift_score", "drift_severity", "metrics")
  }

  /** Append flat results to a parquet sink (Delta in the reference). */
  def writeResults(spark: SparkSession, report: DriftReport, path: String): Unit =
    flatResults(spark, report).write.mode(SaveMode.Append).parquet(path)

  /** Nested report as one JSON row (data_drift_detector.py:261-272 shape). */
  def writeNested(spark: SparkSession, report: DriftReport, path: String): Unit = {
    import spark.implicits._
    val json =
      s"""{"drift_detected": ${report.driftDetected}, """ +
        s""""assessment": "${report.assessment}", """ +
        s""""numerical_drift_count": ${report.numeric.count(_.driftDetected)}, """ +
        s""""categorical_drift_count": ${report.categorical.count(_.driftDetected)}, """ +
        s""""schema_changes": ${report.schemaChanges.size}, """ +
        s""""execution_time_sec": ${report.executionTimeSec}}"""
    Seq(json).toDF("results_json")
      .withColumn("run_timestamp", current_timestamp())
      .write.mode(SaveMode.Append).parquet(path)
  }
}

/** Pluggable analyzer extension point — the rebuild's answer to the
  * reference's analyzer-scaffold generator (O43, create_analyzer_template.py):
  * implement the trait, register, and the orchestrator surface can run it
  * alongside the built-ins. */
trait Analyzer {
  def name: String
  def analyze(ref: DataFrame, curr: DataFrame, config: DriftConfig): DataFrame
}

object AnalyzerRegistry {
  private val analyzers = scala.collection.mutable.LinkedHashMap[String, Analyzer]()
  def register(a: Analyzer): Unit = analyzers.synchronized { analyzers(a.name) = a }
  def all: Seq[Analyzer] = analyzers.synchronized { analyzers.values.toSeq }
  def run(ref: DataFrame, curr: DataFrame, config: DriftConfig = DriftConfig()): Map[String, DataFrame] =
    all.map(a => a.name -> a.analyze(ref, curr, config)).toMap
}
