package graft

import org.apache.spark.sql.types._
import graft.drift._

class ConfigAndScreenSpec extends SparkSpec {
  import spark.implicits._

  test("sample config JSON carries the three profile threshold tables (O42)") {
    val json = ConfigGen.sampleConfigJson("/data/tbl", 3, 7)
    assert(json.contains("\"reference_version\": 3"))
    for (p <- Seq("summary", "standard", "deep_dive")) assert(json.contains("\"" + p + "\""))
    assert(json.contains("\"mean_threshold\": 0.05")) // standard
    assert(json.contains("\"chi_square_pvalue\": 0.01")) // summary
    // parseable by any JSON reader: minimal structural sanity
    assert(json.count(_ == '{') == json.count(_ == '}'))
  }

  test("inferred config embeds semantic types as custom_column_types (O42)") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "cat")
    val json = ConfigGen.inferConfigJson(spark, df, "/data/tbl")
    assert(json.contains("\"id\": \"numerical\""))
    assert(json.contains("\"cat\": \"categorical\""))
  }

  test("valid-column screen drops high-null columns (O29)") {
    val ref = Seq.tabulate(100)(i => (i.toDouble, if (i < 20) Some(i.toDouble) else None))
      .toDF("good", "mostly_null")
    val curr = ref
    assert(CorrelationDrift.validColumns(ref, curr, Seq("good", "mostly_null")) == Seq("good"))
  }

  test("profile compare reports histogram and column-count changes (O10)") {
    val s1 = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val s2 = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType),
      StructField("c", ArrayType(IntegerType))))
    val d = SchemaOps.compareProfiles(SchemaOps.profile(s1), SchemaOps.profile(s2))
    assert(d("column_count_change") == 1)
    assert(d("complex_columns_added") == Seq("c"))
  }

  test("DriftConfig profiles select the right thresholds") {
    assert(DriftConfig("summary").meanThreshold == 0.1)
    assert(DriftConfig("standard").meanThreshold == 0.05)
    assert(DriftConfig("deep_dive").stdThreshold == 0.05)
    assert(DriftConfig("deep_dive").correlationThreshold == 0.6)
  }

  test("module flags derive from the profile and overrides win (config_generator.py:59-101)") {
    val summary = DriftConfig("summary")
    assert(!summary.analyzeDistributions && !summary.detectRareEvents &&
      !summary.genDistributionSummaries)
    val standard = DriftConfig("standard")
    assert(standard.analyzeDistributions && standard.detectRareEvents &&
      !standard.genDistributionSummaries)
    val deep = DriftConfig("deep_dive")
    assert(deep.analyzeDistributions && deep.detectRareEvents &&
      deep.genDistributionSummaries)
    // explicit override beats the profile default in both directions
    assert(DriftConfig("summary", analyzeDistributionsFlag = Some(true)).analyzeDistributions)
    assert(!DriftConfig("deep_dive", genDistributionSummariesFlag = Some(false)).genDistributionSummaries)
  }

  test("generated config round-trips the per-profile module flags") {
    for (profile <- Seq("summary", "standard", "deep_dive")) {
      val run = ConfigReader.read(ConfigGen.sampleConfigJson("/t", 0, 1, profile))
      val expect = ConfigGen.profileFlags(profile).toMap
      assert(run.config.detectRareEvents == expect("detect_rare_values"))
      assert(run.config.genDistributionSummaries ==
        expect.getOrElse("gen_distribution_summaries", false))
      assert(run.config.analyzeDistributions == expect("analyze_distributions"))
    }
    // top-level analyze_distributions: false skips the whole module even if
    // the profile block says true (data_drift_detector.py:117)
    val json = ConfigGen.sampleConfigJson("/t", 0, 1, "standard")
      .replace("\"analyze_distributions\": true, \"analyze_correlations\"",
        "\"analyze_distributions\": false, \"analyze_correlations\"")
    assert(!ConfigReader.read(json).config.analyzeDistributions)
  }

  test("sample-size threshold factor matches adaptive_threshold.py:523-556") {
    import AdaptiveThresholds.{sampleSizeFactor => f, adjustThresholdForSampleSize => adj}
    assert(f(100, 0) == 1.0) // no full size -> unchanged
    assert(f(500, 500) == 1.0 && f(600, 500) == 1.0) // sample >= full
    assert(f(10, 10000) == 2.0) // ratio 0.001 <= 0.01 -> max
    assert(f(100, 10000) == 2.0) // ratio exactly 0.01 -> max
    assert(f(5000, 10000) == 0.5) // ratio 0.5 -> min
    assert(f(9000, 10000) == 0.5) // ratio 0.9 -> min
    // mid band: 0.5 + 1.5 * (1 - sqrt(ratio/0.5)); ratio=0.25
    assert(math.abs(f(2500, 10000) - (0.5 + 1.5 * (1 - math.sqrt(0.5)))) < 1e-12)
    assert(math.abs(adj(0.1, 2500, 10000) - 0.1 * f(2500, 10000)) < 1e-15)
    // wired into the config: scale multiplies drift thresholds, not the
    // chi-square p-value or correlation strength cut
    val c = DriftConfig("standard", thresholdScale = 2.0)
    assert(c.meanThreshold == 0.1 && c.categoryThreshold == 0.06)
    assert(c.chiSquarePValue == 0.05 && c.correlationThreshold == 0.7)
  }

  test("config round-trip: generate -> load -> same run + thresholds (O42)") {
    for (profile <- Seq("summary", "standard", "deep_dive")) {
      val json = ConfigGen.sampleConfigJson("/data/tbl", 3, 7, profile)
      val run = ConfigReader.read(json)
      assert(run.tablePath == "/data/tbl" && run.refVersion == 3 && run.currVersion == 7)
      assert(run.outputTable.isEmpty && run.config.targetColumn.isEmpty)
      assert(run.config.profile == profile && run.config.sampleSize == 100000L)
      // the thresholds the loaded config resolves must equal the threshold
      // table the file carries for its profile (reference-default parity,
      // config_generator.py:40-103)
      val table = ConfigGen.profileThresholds(profile)
      val c = run.config
      assert(c.meanThreshold == table("numerical")("mean_threshold"))
      assert(c.stdThreshold == table("numerical")("std_threshold"))
      assert(c.numericNullThreshold == table("numerical")("null_threshold"))
      assert(c.categoryThreshold == table("categorical")("category_threshold"))
      assert(c.chiSquarePValue == table("categorical")("chi_square_pvalue"))
      assert(c.correlationThreshold == table("correlation")("correlation_threshold"))
      assert(c.correlationChangeThreshold == table("correlation")("correlation_change_threshold"))
      assert(c.jsDistanceThreshold == table("correlation")("js_distance_threshold"))
      assert(c.rareValueThreshold == table("correlation")("rare_value_threshold"))
    }
  }

  test("config reader parses lists, maps and flags from the dialect") {
    val json = """{"table_path": "/t", "reference_version": 1, "current_version": 2,
      "profile": "standard", "include_columns": ["a", "b"], "exclude_columns": ["c"],
      "group_columns": ["g"], "custom_column_types": {"a": "numerical", "g": "categorical"},
      "target_column": "a", "sample_size": 5000, "analyze_groups": false,
      "output_table": "/out",
      "thresholds": {"standard": {"detect_rare_values": false, "analyze_distributions": true}}}"""
    val run = ConfigReader.read(json)
    assert(run.config.includeColumns == Seq("a", "b"))
    assert(run.config.excludeColumns == Seq("c"))
    assert(run.config.groupColumns == Seq("g"))
    assert(run.config.customColumnTypes == Map("a" -> "numerical", "g" -> "categorical"))
    assert(run.config.targetColumn.contains("a"))
    assert(run.config.sampleSize == 5000L)
    assert(!run.config.analyzeGroups && run.config.analyzeCorrelations)
    assert(!run.config.detectRareEvents && run.config.analyzeDistributions)
    assert(run.outputTable.contains("/out"))
  }

  test("detectDrift(configPath) runs end-to-end from a config file") {
    val root = java.nio.file.Files.createTempDirectory("graft-cfg").toString
    SyntheticDrift.version(spark, 1, 500).write.mode("overwrite").parquet(s"$root/v0")
    SyntheticDrift.version(spark, 3, 500).write.mode("overwrite").parquet(s"$root/v1")
    val cfg = ConfigGen.sampleConfigJson(root, 0, 1)
      .replace("\"output_table\": null, ", "")
      .replace("\"sample_size\": 100000", "\"sample_size\": 0")
    val cfgPath = s"$root/config.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath), cfg)
    val report = new DriftDetector(spark).detectDrift(cfgPath)
    assert(report.schemaChanges.exists(_.changeType == "added")) // new_feature in v3
    assert(report.driftDetected)
  }
}
