package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.drift._
import graft.pipeline._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Each entry in [[queries]] is one operator of the rebuilt engine
  * (SURVEY.md §2.b inventory + training-pipeline extensions), evaluated over
  * the driver testdata at `sfDir`; [[oracleSql]] carries the equivalent
  * DuckDB SQL over the same parquet tables. Column names and row order are
  * aligned between both engines and all floating outputs are rounded to 6
  * decimals for stable hash comparison.
  */
object SparkEntry {

  /** Flagship query on sf=0.001 (driver smoke-checks rows>0): TPC-H-Q1-style
    * pricing summary — one scan, partial-agg-friendly, whole-stage codegen. */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avg("l_quantity").as("avg_qty"),
        avg("l_extendedprice").as("avg_price"),
        avg("l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // The monetary SUMs reach ~5·10⁹ at sf0.1, where 6-decimal precision
  // exceeds double's 16 significant digits and the engines' different
  // partial-sum orders diverge in the last ulp. Accumulating in
  // DECIMAL(18,4) is EXACT (associativity-free), so both engines produce
  // the identical value at any scale; one final cast to double is then
  // deterministic. The AVGs stay double: their magnitude (≤10⁵) leaves
  // 10+ guard digits at 6 decimals.
  private def q1(s: SparkSession, dir: String): DataFrame =
    drift.table(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        drift.r6(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")).as("sum_qty"),
        drift.r6(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")).as("sum_base_price"),
        drift.r6(sum((col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))).cast("double")).as("sum_disc_price"),
        drift.r6(avg("l_quantity")).as("avg_qty"),
        drift.r6(avg("l_extendedprice")).as("avg_price"),
        drift.r6(avg("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Sql =
    "SELECT l_returnflag, l_linestatus, " +
      "ROUND(CAST(SUM(l_quantity::DECIMAL(18,4)) AS DOUBLE), 6) AS sum_qty, " +
      "ROUND(CAST(SUM(l_extendedprice::DECIMAL(18,4)) AS DOUBLE), 6) AS sum_base_price, " +
      "ROUND(CAST(SUM(l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4))) AS DOUBLE), 6) AS sum_disc_price, " +
      "ROUND(AVG(l_quantity), 6) AS avg_qty, ROUND(AVG(l_extendedprice), 6) AS avg_price, " +
      "ROUND(AVG(l_discount), 6) AS avg_disc, COUNT(*) AS count_order " +
      "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame]("q1_pricing_summary" -> (q1 _)) ++
      NumericDrift.queries ++
      DistanceDrift.queries ++
      JsonDrift.queries ++
      CategoricalDrift.queries ++
      CorrelationDrift.queries ++
      GroupDrift.queries ++
      SchemaOps.queries ++
      AdaptiveThresholds.queries ++
      TimelineDrift.queries ++
      RobustDrift.queries ++
      PcaAnomaly.queries ++
      Report.queries ++
      Dedup.queries ++
      Similarity.queries ++
      TextAnalysis.queries ++
      Sessions.queries ++
      EventAnalytics.queries ++
      RangeJoin.queries ++
      SnapshotDiff.queries ++
      AsofJoin.queries ++
      LmScore.queries ++
      SpanDedup.queries ++
      DataSplit.queries ++
      Multimodal.queries ++
      EmbeddingDrift.queries ++
      Dsir.queries ++
      ScaleJoins.queries ++
      Packing.queries ++
      Layout.queries ++
      EntityResolution.queries ++
      Retrieval.queries ++
      MarketBasket.queries ++
      Constraints.queries ++
      Benford.queries ++
      CorpusDesign.queries ++
      Privacy.queries ++
      EngineProbe.queries ++
      Orchestrated.queries ++
      graft.streaming.StreamingReplay.queries

  /** The benchmark surface: same operators, but the percentile-heavy
    * queries run their `approx = true` scale path (fixed-size mergeable
    * sketches instead of exact sort-based `percentile`, which buffers every
    * value per agg buffer and OOMs at 100 TB). Verify keeps the exact forms
    * so the DuckDB oracle reproduces values bit-for-bit; DriftMathSpec
    * asserts the approx results track exact within tolerance. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries ++ Map[String, (SparkSession, String) => DataFrame](
      "numeric_stats" -> ((s, d) => NumericDrift.stats(s, d, approx = true)),
      "token_stats" -> ((s, d) => TextAnalysis.tokenStats(s, d, approx = true)),
      "corpus_balance" -> ((s, d) => TextAnalysis.balancedMix(s, d, approx = true)),
      "data_split" -> ((s, d) => DataSplit.dataSplit(s, d, approx = true)),
      "type_inference" -> ((s, d) => TypeInference.typeInferenceQuery(s, d, approxDistinct = true)),
      "topk_entropy" -> ((s, d) => CategoricalDrift.topkEntropy(s, d, approx = true)),
      "lm_ppl_buckets" -> ((s, d) => LmScore.lmPplBuckets(s, d, approx = true)),
      "quality_ensemble" -> ((s, d) => TextAnalysis.qualityEnsemble(s, d, approx = true)),
      "source_quality_drift" -> ((s, d) => TextAnalysis.sourceQualityDrift(s, d, approx = true)),
      // the per-source rollup switches canonical doc-ordered folds (which
      // collect per-source doc lists — oracle-exact but driver-sized) to
      // plain map-side-combined SUMs
      "doc_entropy" -> ((s, d) => TextAnalysis.docEntropy(s, d, approx = true)),
      // the ECDF windows run on a grid-snapped frame (≤10k rows/column)
      // instead of the raw distinct-value frame
      "ks_test" -> ((s, d) => DistanceDrift.ksTest(s, d, approx = true)),
      "wasserstein" -> ((s, d) => DistanceDrift.wasserstein(s, d, approx = true)),
      "numeric_drift" -> ((s, d) => NumericDrift.drift(s, d, approx = true)),
      "metric_audit" -> ((s, d) => NumericDrift.metricAudit(s, d, approx = true)),
      "numeric_drift_score" -> ((s, d) => NumericDrift.driftScore(s, d, approx = true)),
      "quantile_shifts" -> ((s, d) => NumericDrift.quantileShifts(s, d, approx = true)),
      "mad_outliers" -> ((s, d) => RobustDrift.madOutliers(s, d, approx = true)),
      "rfm_segments" -> ((s, d) => EventAnalytics.rfmSegments(s, d, approx = true)),
      // HLL sketches straight off the raw scan: the (user, day) universe is
      // never shuffled (sketches merge map-side)
      "active_users" -> ((s, d) => EventAnalytics.activeUsers(s, d, approx = true)),
      // uniqueness/FK-coverage distinct counts via HLL sketches instead of
      // exact COUNT(DISTINCT tuple) — the exact form shuffles every key
      // tuple (the one 100 TB-hostile shuffle on the bench surface before
      // round 12); approx-vs-exact pinned in ConstraintsSpec
      "constraint_check" -> ((s, d) => Constraints.constraintCheck(s, d, approx = true)),
      "conversion_lag" -> ((s, d) => EventAnalytics.conversionLag(s, d, approx = true)),
      "revenue_concentration" -> ((s, d) => EventAnalytics.revenueConcentration(s, d, approx = true)),
      "embedding_audit" -> ((s, d) => EmbeddingDrift.embeddingAudit(s, d, approx = true)),
      "group_numeric_metrics" -> ((s, d) => GroupDrift.groupNumericMetrics(s, d, approx = true)),
      "group_drift" -> ((s, d) => GroupDrift.groupDriftVerdict(s, d, approx = true)),
      // the report family shares one memoized scoring DAG; at scale that DAG
      // runs on the sketch percentiles too
      "drift_results" -> ((s, d) => Report.driftResultsCached(s, d, approx = true)),
      "drift_summary" -> ((s, d) => Report.driftSummary(s, d, approx = true)),
      "dimensional_summary" -> ((s, d) => Report.dimensionalSummary(s, d, approx = true)),
      "top_dimensions" -> ((s, d) => Report.topDimensions(s, d, approx = true)),
      "top_drifted_columns" -> ((s, d) => Report.topDriftedColumns(s, d, approx = true)),
      // the full O40 orchestration runs its O12 percentiles on the sketch
      // too (round 10 — this was the single most expensive bench query
      // while it still paid exact percentile through the orchestrator)
      "orchestrated_report" -> ((s, d) => Orchestrated.orchestratedReport(s, d, approx = true)),
    )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Map("q1_pricing_summary" -> q1Sql) ++
      NumericDrift.oracles ++
      DistanceDrift.oracles ++
      JsonDrift.oracles ++
      CategoricalDrift.oracles ++
      CorrelationDrift.oracles ++
      GroupDrift.oracles ++
      SchemaOps.oracles ++
      AdaptiveThresholds.oracles ++
      TimelineDrift.oracles ++
      RobustDrift.oracles ++
      PcaAnomaly.oracles ++
      Report.oracles ++
      Dedup.oracles ++
      Similarity.oracles ++
      TextAnalysis.oracles ++
      Sessions.oracles ++
      EventAnalytics.oracles ++
      RangeJoin.oracles ++
      SnapshotDiff.oracles ++
      AsofJoin.oracles ++
      LmScore.oracles ++
      SpanDedup.oracles ++
      DataSplit.oracles ++
      Multimodal.oracles ++
      EmbeddingDrift.oracles ++
      Dsir.oracles ++
      ScaleJoins.oracles ++
      Packing.oracles ++
      Layout.oracles ++
      EntityResolution.oracles ++
      Retrieval.oracles ++
      MarketBasket.oracles ++
      Constraints.oracles ++
      Benford.oracles ++
      CorpusDesign.oracles ++
      Privacy.oracles ++
      EngineProbe.oracles ++
      Orchestrated.oracles ++
      graft.streaming.StreamingReplay.oracles
}
