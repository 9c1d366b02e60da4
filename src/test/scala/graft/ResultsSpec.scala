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
    Results.writeNested(spark, report, s"$dir/nested")
    assert(spark.read.parquet(s"$dir/nested").count() == 1)
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
