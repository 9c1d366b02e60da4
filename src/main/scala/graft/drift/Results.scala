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

  // ---- minimal JSON writer (no deps; driver-side over per-column rows) ----

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Bare NaN/Infinity is invalid JSON → null (degenerate rel-diffs). */
  private def jnum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  private def jarr(xs: Seq[String]): String = xs.mkString("[", ", ", "]")

  private def jobj(kvs: Seq[(String, String)]): String =
    kvs.map { case (k, v) => s"${jstr(k)}: $v" }.mkString("{", ", ", "}")

  /** The reference's full nested results document
    * (data_drift_detector.py:38-48 top-level keys, 68-75 column_info,
    * 84-114 per-column metric objects keyed by column, 92-95/110-113
    * drift_summary, 220-226 overall_assessment + recommended_actions) as a
    * JSON string. The per-column metric objects carry the same metric set
    * as the flat rows plus the rel-diff spine and drift causes, so a
    * downstream consumer of the reference's `results_json` finds every key
    * it reads today. */
  def nestedJson(report: DriftReport): String = {
    val types = report.columnTypes
    val numDriftCols = report.numeric.filter(_.driftDetected).map(_.column)
    val catDriftCols = report.categorical.filter(_.driftDetected).map(_.column)
    val numMetrics = report.numeric.map { n =>
      n.column -> jobj(Seq(
        "mean_ref" -> jnum(n.refMean), "mean_curr" -> jnum(n.currMean),
        "mean_rel_diff" -> jnum(n.meanRelDiff),
        "median_rel_diff" -> jnum(n.medianRelDiff),
        "std_rel_diff" -> jnum(n.stdRelDiff),
        "iqr_rel_diff" -> jnum(n.iqrRelDiff),
        "range_rel_diff" -> jnum(n.rangeRelDiff),
        "null_diff" -> jnum(n.nullDiff),
        "drift_score" -> jnum(n.driftScore),
        "drift_detected" -> n.driftDetected.toString,
        "drift_causes" -> jarr(n.driftCauses.map(jstr))))
    }
    val catMetrics = report.categorical.map { c =>
      c.column -> jobj(Seq(
        "js_divergence" -> jnum(c.jsDivergence),
        "chi_p_value" -> jnum(c.chiPValue),
        "null_diff" -> jnum(c.nullDiff),
        "new_categories_ratio" -> jnum(c.newCategoriesRatio),
        "missing_categories_ratio" -> jnum(c.missingCategoriesRatio),
        "drift_score" -> jnum(c.driftScore),
        "drift_detected" -> c.driftDetected.toString,
        "drift_causes" -> jarr(c.driftCauses.map(jstr))))
    }
    val schemaAnalysis = jobj(Seq(
      "added_columns" -> jarr(report.schemaChanges
        .filter(_.changeType == "added").map(c => jstr(c.path))),
      "removed_columns" -> jarr(report.schemaChanges
        .filter(_.changeType == "removed").map(c => jstr(c.path))),
      "type_changes" -> jarr(report.schemaChanges
        .filter(_.changeType == "type_changed").map(c => jobj(Seq(
          "column" -> jstr(c.path),
          "ref_type" -> c.refType.map(jstr).getOrElse("null"),
          "curr_type" -> c.currType.map(jstr).getOrElse("null"),
          "compatible" -> c.compatible.map(_.toString).getOrElse("null")))))))
    val columnInfo = jobj(Seq(
      "numerical_count" -> types.valuesIterator.count(_ == "numerical").toString,
      "categorical_count" -> types.valuesIterator.count(_ == "categorical").toString,
      "temporal_count" -> types.valuesIterator.count(_ == "temporal").toString,
      "total_analyzed" -> types.size.toString,
      "column_types" -> jobj(types.toSeq.sortBy(_._1).map { case (c, t) => c -> jstr(t) })))
    val driftSummary = jobj(
      (if (numDriftCols.nonEmpty) Seq(
        "numerical_drift_columns" -> jarr(numDriftCols.map(jstr)),
        "numerical_drift_count" -> numDriftCols.size.toString) else Nil) ++
      (if (catDriftCols.nonEmpty) Seq(
        "categorical_drift_columns" -> jarr(catDriftCols.map(jstr)),
        "categorical_drift_count" -> catDriftCols.size.toString) else Nil) ++
      (if (report.driftDetected) Seq(
        "overall_assessment" -> jstr(report.assessment)) else Nil))
    jobj(Seq(
      "drift_detected" -> report.driftDetected.toString,
      "column_info" -> columnInfo,
      "schema_analysis" -> schemaAnalysis,
      "metrics" -> jobj(Seq(
        "numerical" -> jobj(numMetrics),
        "categorical" -> jobj(catMetrics))),
      "drift_summary" -> driftSummary,
      "recommended_actions" -> jarr(report.recommendations.map(jstr)),
      "execution_time_sec" -> jnum(report.executionTimeSec)))
  }

  /** Nested report as one row per run (data_drift_detector.py:261-272
    * save_results shape: run identity columns + the full document in
    * `results_json`). Optional table/version/profile metadata mirrors the
    * reference's identity columns for deployments that track them. */
  def writeNested(spark: SparkSession, report: DriftReport, path: String,
      tablePath: String = "", refVersion: String = "", currVersion: String = "",
      profile: String = "standard"): Unit = {
    import spark.implicits._
    Seq((tablePath, refVersion, currVersion, profile, report.driftDetected,
        report.executionTimeSec, nestedJson(report)))
      .toDF("table_path", "reference_version", "current_version", "profile",
        "drift_detected", "execution_time_sec", "results_json")
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
