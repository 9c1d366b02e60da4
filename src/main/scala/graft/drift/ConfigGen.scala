package graft.drift

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Config generation / inference — reference O42
  * (/root/reference/config_generator.py:6-296): emit a default config JSON
  * with the three profiles' threshold tables, or sample the table, infer
  * semantic types (O4) and embed them as custom_column_types. JSON is
  * hand-rolled (no extra deps in this environment). */
object ConfigGen {

  private def jstr(s: String) = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The de-facto semantics contract: per-profile threshold tables
    * (config_generator.py:40-103, SURVEY.md §2 footer). */
  val profileThresholds: Map[String, Map[String, Map[String, Double]]] = {
    def p(meanMed: Double, stdIqr: Double, nul: Double, cat: Double, chi: Double,
        corrThr: Double, corrChg: Double, js: Double, rare: Double) = Map(
      "numerical" -> Map(
        "mean_threshold" -> meanMed, "median_threshold" -> meanMed,
        "std_threshold" -> stdIqr, "iqr_threshold" -> stdIqr,
        "null_threshold" -> nul, "range_threshold" -> stdIqr),
      "categorical" -> Map(
        "category_threshold" -> cat, "chi_square_pvalue" -> chi,
        "null_threshold" -> nul),
      "correlation" -> Map(
        "correlation_threshold" -> corrThr, "correlation_change_threshold" -> corrChg,
        "js_distance_threshold" -> js, "rare_value_threshold" -> rare))
    Map(
      "summary" -> p(0.1, 0.2, 0.01, 0.05, 0.01, 0.7, 0.3, 0.1, 0.01),
      "standard" -> p(0.05, 0.1, 0.005, 0.03, 0.05, 0.7, 0.2, 0.1, 0.01),
      "deep_dive" -> p(0.03, 0.05, 0.001, 0.01, 0.05, 0.6, 0.15, 0.05, 0.005))
  }

  /** Per-profile module flags carried inside each threshold block, exactly
    * as the reference emits them (config_generator.py:59-60 summary off;
    * :80-81 standard distributions on / summaries off; :100-101 deep_dive
    * all on; summary carries no gen_distribution_summaries key at all). */
  val profileFlags: Map[String, Seq[(String, Boolean)]] = Map(
    "summary" -> Seq("analyze_distributions" -> false, "detect_rare_values" -> false),
    "standard" -> Seq("analyze_distributions" -> true, "detect_rare_values" -> true,
      "gen_distribution_summaries" -> false),
    "deep_dive" -> Seq("analyze_distributions" -> true, "detect_rare_values" -> true,
      "gen_distribution_summaries" -> true))

  /** Default config JSON (generate_sample_config). */
  def sampleConfigJson(tablePath: String, refVersion: Long, currVersion: Long,
      profile: String = "standard"): String = {
    val thr = profileThresholds.map { case (prof, groups) =>
      jstr(prof) + ": {" + (groups.map { case (g, kv) =>
        jstr(g) + ": {" + kv.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${jstr(k)}: $v" }.mkString(", ") + "}"
      }.toSeq ++ profileFlags(prof).map { case (k, v) => s"${jstr(k)}: $v" })
        .mkString(", ") + "}"
    }.mkString("{", ", ", "}")
    s"""{"table_path": ${jstr(tablePath)}, "reference_version": $refVersion, """ +
      s""""current_version": $currVersion, "profile": ${jstr(profile)}, """ +
      s""""analyze_distributions": true, "analyze_correlations": true, """ +
      s""""analyze_groups": true, "analyze_feature_importance": false, """ +
      s""""target_column": null, """ +
      s""""sample_size": 100000, "include_columns": [], "exclude_columns": [], """ +
      s""""group_columns": [], "custom_column_types": {}, "thresholds": $thr}"""
  }

  /** Sample ≤n rows, infer types (O4), embed as custom_column_types
    * (infer_and_generate_config, config_generator.py:117-296). */
  def inferConfigJson(spark: SparkSession, df: DataFrame, tablePath: String,
      sampleSize: Long = 1000L, profile: String = "standard"): String = {
    val sampled = Sampling.sample(df, sampleSize)
    val types = TypeInference.infer(sampled).toSeq.sortBy(_._1)
    val custom = types.map { case (c, t) => s"${jstr(c)}: ${jstr(t)}" }.mkString("{", ", ", "}")
    val base = sampleConfigJson(tablePath, 0, 1, profile)
    base.replace("\"custom_column_types\": {}", s""""custom_column_types": $custom""")
  }

  /** Parse a profile name out of config JSON into a [[DriftConfig]] (the
    * code-read dialect only — SURVEY.md §7.3). */
  def fromProfile(profile: String): DriftConfig = DriftConfig(profile = profile)
}
