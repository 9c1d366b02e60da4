package graft

import org.apache.spark.sql.DataFrame
import graft.drift._

class ResultsSpec extends SparkSpec {

  test("flat results carry the reference schema and severity (O39)") {
    val v1 = SyntheticDrift.version(spark, 1, n = 2000)
    val v3 = SyntheticDrift.version(spark, 3, n = 2000)
    val report = new DriftDetector(spark).detectDrift(v1, v3, DriftConfig(sampleSize = 0))
    val flat = Results.flatResults(spark, report)
    assert(flat.columns.toSeq == Seq("run_timestamp", "column_name", "column_type",
      "dimension_id", "drift_score", "drift_severity", "metrics"))
    val groupRows = if (report.groupDrift.columns.contains("overall_drift_score"))
      report.groupDrift.count() else 0L
    assert(groupRows > 0) // default config runs group analysis
    assert(flat.count() == report.numeric.size + report.categorical.size + groupRows)
    // group rows use the reference's '<dim>=<category>' dimension_id style
    import org.apache.spark.sql.functions.col
    assert(flat.filter(col("dimension_id").contains("=")).count() == groupRows)
    val dir = java.nio.file.Files.createTempDirectory("graft-results").toString
    Results.writeResults(spark, report, s"$dir/flat")
    Results.writeResults(spark, report, s"$dir/flat") // append
    assert(spark.read.parquet(s"$dir/flat").count() == 2 * flat.count())
    Results.writeNested(spark, report, s"$dir/nested", tablePath = "golden",
      refVersion = "1", currVersion = "3")
    val nested = spark.read.parquet(s"$dir/nested")
    assert(nested.count() == 1)
    // round-trip: the full reference document shape is in results_json —
    // the drifted column's metric object, the drift summary, column_info,
    // schema changes and recommendations are all reachable by JSON path
    val row = nested.selectExpr(
      "get_json_object(results_json, '$.metrics.numerical.numeric_normal.drift_detected') AS nd",
      "get_json_object(results_json, '$.metrics.numerical.numeric_normal.mean_rel_diff') AS mrd",
      "get_json_object(results_json, '$.metrics.categorical.category_balanced.js_divergence') AS js",
      "get_json_object(results_json, '$.drift_summary.numerical_drift_count') AS ndc",
      "get_json_object(results_json, '$.drift_summary.overall_assessment') AS oa",
      "get_json_object(results_json, '$.column_info.total_analyzed') AS ta",
      "get_json_object(results_json, '$.schema_analysis.added_columns[0]') AS addc",
      "get_json_object(results_json, '$.recommended_actions[0]') AS rec",
      "get_json_object(results_json, '$.execution_time_sec') AS ets",
      "table_path", "reference_version", "current_version").collect()(0)
    assert(row.getAs[String]("nd") == "true")
    assert(row.getAs[String]("mrd").toDouble > 0)
    assert(row.getAs[String]("js").toDouble >= 0)
    assert(row.getAs[String]("ndc").toInt >= 1)
    assert(row.getAs[String]("oa") != null && row.getAs[String]("oa").nonEmpty)
    assert(row.getAs[String]("ta").toInt > 0)
    assert(row.getAs[String]("addc") == "new_feature")
    assert(row.getAs[String]("rec") != null)
    assert(row.getAs[String]("ets").toDouble >= 0)
    assert(row.getAs[String]("table_path") == "golden")
  }

  test("column metadata profile (O5)") {
    val v3 = SyntheticDrift.version(spark, 3, n = 100)
    val meta = Results.columnMetadata(v3)
    assert(meta.exists { case (n, t, _, _) => n == "new_feature" && t == "double" })
  }

  test("custom analyzers run through the registry (O43 extension point)") {
    AnalyzerRegistry.register(new Analyzer {
      def name = "row_count_delta"
      def analyze(ref: DataFrame, curr: DataFrame, config: DriftConfig): DataFrame = {
        import ref.sparkSession.implicits._
        Seq((ref.count(), curr.count())).toDF("ref_rows", "curr_rows")
      }
    })
    val v1 = SyntheticDrift.version(spark, 1, n = 50)
    val out = AnalyzerRegistry.run(v1, v1)
    assert(out("row_count_delta").collect()(0).getLong(0) == 50L)
  }
}
