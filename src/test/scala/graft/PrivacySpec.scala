package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import graft.pipeline.Privacy

/** Semantics of the k-anonymity / l-diversity audits: exact class math on
  * a planted table, dense band spine, and cross-query consistency on the
  * driver fixtures. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Plants all three audited tables; customer carries the interesting
    * classes, orders/events are single-class fillers. */
  private def planted(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-privacy").toString
    // classes on (c_nationkey, FLOOR(c_acctbal/1000)):
    //   A (1, 1): five rows, all AUTO            -> sz 5, l 1
    //   B (1, 2): two rows, AUTO + BUILDING      -> sz 2, l 2
    //   C (2, 1): one row                        -> sz 1, l 1
    Seq(
      (1, 1200.0, "AUTO"), (1, 1300.0, "AUTO"), (1, 1400.0, "AUTO"),
      (1, 1500.0, "AUTO"), (1, 1999.0, "AUTO"),
      (1, 2100.0, "AUTO"), (1, 2900.0, "BUILDING"),
      (2, 1100.0, "AUTO"))
      .toDF("c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(("O", "1-URGENT", Timestamp.valueOf("2024-01-05 00:00:00"), 1000.0))
      .toDF("o_orderstatus", "o_orderpriority", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(("click", Timestamp.valueOf("2024-01-05 10:00:00"), 42.0))
      .toDF("event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("k_anonymity: exact class counts on planted classes") {
    val r = Privacy.kAnonymity(spark, planted()).collect()
      .map(x => x.getString(0) -> x).toMap
    val c = r("customer_profile")
    assert(c.getString(1) == "customer")
    assert(c.getAs[Long]("n_rows") == 8L)
    assert(c.getAs[Long]("n_classes") == 3L)
    assert(c.getAs[Long]("k_anonymity") == 1L)
    assert(c.getAs[Long]("singleton_classes") == 1L)
    // classes B (2 rows) and C (1 row) sit below k=5
    assert(c.getAs[Long]("rows_below_k") == 3L)
    assert(c.getAs[Double]("at_risk_share") == 0.375)
    assert(!c.getAs[Boolean]("k_ok"))
    // single-class fillers: k = class size, nothing below absent thresholds
    assert(r("order_history").getAs[Long]("k_anonymity") == 1L)
    assert(r("event_trace").getAs[Long]("n_classes") == 1L)
  }

  test("l_diversity: homogeneous classes and the at-k diversity floor") {
    val r = Privacy.lDiversity(spark, planted()).collect()
      .map(x => x.getString(0) -> x).toMap
    val c = r("customer_profile")
    assert(c.getString(2) == "c_mktsegment")
    assert(c.getAs[Long]("min_l") == 1L)
    // only class A (sz 5) reaches k=5, and it is homogeneous
    assert(c.getAs[Long]("min_l_at_k") == 1L)
    assert(c.getAs[Long]("homogeneous_classes") == 2L) // A and C
    assert(c.getAs[Long]("homogeneous_rows") == 6L)
    assert(c.getAs[Double]("homogeneous_share") == 0.75)
    assert(!c.getAs[Boolean]("l_ok"))
    // the single-row fillers have no class at k=5: floor reports 0
    assert(r("order_history").getAs[Long]("min_l_at_k") == 0L)
  }

  test("k_anon_bands: dense spine, consistent with the k_anonymity rollup") {
    val bands = Privacy.kAnonBands(spark, sf).collect()
    assert(bands.length == Privacy.QiSets.length * 5)
    val k = Privacy.kAnonymity(spark, sf).collect()
      .map(x => x.getString(0) -> x).toMap
    bands.groupBy(_.getString(0)).foreach { case (qiSet, rs) =>
      assert(rs.map(_.getAs[Long]("n_rows")).sum == k(qiSet).getAs[Long]("n_rows"))
      assert(rs.map(_.getAs[Long]("n_classes")).sum == k(qiSet).getAs[Long]("n_classes"))
      val singles = rs.find(_.getString(1) == "1").get
      assert(singles.getAs[Long]("n_classes") == k(qiSet).getAs[Long]("singleton_classes"))
      assert(singles.getAs[Long]("n_rows") == singles.getAs[Long]("n_classes"))
    }
  }

  test("k_anon_worst: smallest classes surface with their QI values") {
    val worst = Privacy.kAnonWorst(spark, planted()).collect()
      .filter(_.getString(0) == "customer_profile")
    // all three planted classes fit under WorstN, ordered size-ascending
    assert(worst.map(_.getAs[Long]("class_size")).toSeq == Seq(1L, 2L, 5L))
    // the singleton is the (nation 2, kilobucket 1) profile
    assert(worst.head.getAs[String]("qi_key") == "2|1")
    // the drill-down plans as a per-branch top-k, not a global sort
    val plan = Privacy.kAnonWorst(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
    // row budget: at most WorstN per QI set, and sizes agree with the bands
    val full = Privacy.kAnonWorst(spark, sf).collect()
    full.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= Privacy.WorstN)
      assert(rs.map(_.getAs[Long]("class_size")).toSeq.sorted ==
        rs.map(_.getAs[Long]("class_size")).toSeq)
    }
  }

  test("t_closeness: exact per-class TVD vs the global sensitive dist") {
    val r = Privacy.tCloseness(spark, planted()).collect()
      .map(x => x.getString(0) -> x).toMap
    val c = r("customer_profile")
    // global segment dist: AUTO 7/8, BUILDING 1/8.
    //   A (5×AUTO):        TVD = 0.5(|1−7/8| + 1/8)          = 0.125
    //   B (AUTO+BUILDING): TVD = 0.5(|.5−7/8| + |.5−1/8|)    = 0.375
    //   C (1×AUTO):        TVD = 0.125
    assert(c.getAs[Long]("n_classes") == 3L)
    assert(c.getAs[Double]("max_t") == 0.375)
    assert(c.getAs[Long]("classes_above_t") == 1L) // only B over t=0.2
    assert(!c.getAs[Boolean]("t_ok"))
    // a single class IS the global distribution: distance exactly 0
    assert(r("order_history").getAs[Double]("max_t") == 0.0)
    assert(r("order_history").getAs[Boolean]("t_ok"))
  }

  test("k_anon_trend: per-day class math, the streaming monitor's batch twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft-trend").toString
    // 2024-01-01: (click, bucket 4) x3 + (view, bucket 4) x1 -> k=1, all 4
    // rows below the k=5 line; 2024-01-02: (click, bucket 4) x5 -> k=5, ok
    Seq(
      ("click", Timestamp.valueOf("2024-01-01 01:00:00"), 42.0),
      ("click", Timestamp.valueOf("2024-01-01 02:00:00"), 43.0),
      ("click", Timestamp.valueOf("2024-01-01 03:00:00"), 44.0),
      ("view", Timestamp.valueOf("2024-01-01 04:00:00"), 45.0),
      ("click", Timestamp.valueOf("2024-01-02 01:00:00"), 40.0),
      ("click", Timestamp.valueOf("2024-01-02 02:00:00"), 41.0),
      ("click", Timestamp.valueOf("2024-01-02 03:00:00"), 46.0),
      ("click", Timestamp.valueOf("2024-01-02 04:00:00"), 47.0),
      ("click", Timestamp.valueOf("2024-01-02 05:00:00"), 48.0))
      .toDF("event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Privacy.kAnonTrend(spark, dir).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("2024-01-01", "2024-01-02"))
    val d1 = r("2024-01-01")
    assert(d1.getAs[Long]("n_rows") == 4L)
    assert(d1.getAs[Long]("n_classes") == 2L)
    assert(d1.getAs[Long]("k_anonymity") == 1L)
    assert(d1.getAs[Long]("singleton_classes") == 1L)
    assert(d1.getAs[Long]("rows_below_k") == 4L)
    assert(d1.getAs[Double]("at_risk_share") == 1.0)
    assert(!d1.getAs[Boolean]("k_ok"))
    val d2 = r("2024-01-02")
    assert(d2.getAs[Long]("n_rows") == 5L)
    assert(d2.getAs[Long]("n_classes") == 1L)
    assert(d2.getAs[Long]("k_anonymity") == 5L)
    assert(d2.getAs[Long]("singleton_classes") == 0L)
    assert(d2.getAs[Long]("rows_below_k") == 0L)
    assert(d2.getAs[Double]("at_risk_share") == 0.0)
    assert(d2.getAs[Boolean]("k_ok"))
  }

  test("fixture invariants: shares bounded, verdicts match their inputs") {
    Privacy.kAnonymity(spark, sf).collect().foreach { r =>
      val share = r.getAs[Double]("at_risk_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Boolean]("k_ok") == (r.getAs[Long]("k_anonymity") >= Privacy.KThreshold))
      assert(r.getAs[Long]("rows_below_k") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("k_anonymity") >= 1L)
    }
    Privacy.lDiversity(spark, sf).collect().foreach { r =>
      val share = r.getAs[Double]("homogeneous_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Boolean]("l_ok") == (r.getAs[Long]("min_l") >= Privacy.LThreshold))
      assert(r.getAs[Long]("min_l") >= 1L)
      val atK = r.getAs[Long]("min_l_at_k")
      assert(atK == 0L || atK >= r.getAs[Long]("min_l"))
    }
    Privacy.tCloseness(spark, sf).collect().foreach { r =>
      val t = r.getAs[Double]("max_t")
      assert(t >= 0.0 && t <= 1.0)
      assert(r.getAs[Boolean]("t_ok") == (t <= Privacy.TThreshold))
      assert(r.getAs[Long]("classes_above_t") <= r.getAs[Long]("n_classes"))
    }
  }

  test("scale shape: class aggregation partial-aggs before the exchange") {
    val plan = Privacy.kAnonymity(spark, sf).queryExecution.executedPlan.toString
    // partial HashAggregate below the exchange on every QI branch: the
    // corpus-sized input never crosses the shuffle un-aggregated
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"expected map-side partial aggregation in:\n$plan")
    val rows = Privacy.kAnonymity(spark, sf)
    assert(rows.count() == Privacy.QiSets.length)
    // the at-risk share never exceeds what the bands report as small-class mass
    val bands = Privacy.kAnonBands(spark, sf)
      .filter(col("band").isin("1", "2-4"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_rows"))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    Privacy.kAnonymity(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("rows_below_k") == bands(r.getString(0)))
    }
  }

  test("k_anon_trend consistency: per-day rows sum to the corpus, k bounded by the global audit") {
    val trend = Privacy.kAnonTrend(spark, sf).collect()
    // partial agg before the exchange, same discipline as the global audit
    val plan = Privacy.kAnonTrend(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"expected map-side partial aggregation in:\n$plan")
    // per-day row totals reconstruct the events row count exactly
    val total = graft.drift.table(spark, sf, "events").count()
    assert(trend.map(_.getAs[Long]("n_rows")).sum == total)
    // each trend class (day, type, value-bucket) REFINES a global
    // event_trace class (type, day), so the smallest trend class can only
    // be as large as the smallest global class or smaller: the invariant
    // is min(per-day k) <= global k — an inequality, NOT equality (the
    // bucket split can cut the global minimum class further)
    val globalK = Privacy.kAnonymity(spark, sf).collect()
      .find(_.getString(0) == "event_trace").get.getAs[Long]("k_anonymity")
    assert(trend.map(_.getAs[Long]("k_anonymity")).min <= globalK,
      "a per-day k cannot exceed the day-sliced global audit's floor")
    trend.foreach { r =>
      assert(r.getAs[Long]("singleton_classes") <= r.getAs[Long]("n_classes"))
      assert(r.getAs[Long]("rows_below_k") <= r.getAs[Long]("n_rows"))
    }
  }
}
