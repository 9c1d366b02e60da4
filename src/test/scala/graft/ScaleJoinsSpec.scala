package graft

import org.apache.spark.sql.functions._
import graft.pipeline.ScaleJoins

/** Plan-level proof of the two explicit scale levers: salting spreads a
  * hot aggregation key, bucketing removes the join shuffle entirely. */
class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase count equals the plain groupBy count on skewed data") {
    // 90% of rows share one key — the classic straggler shape
    val skewed = Seq.tabulate(10000)(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i)).toDF("k", "v")
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = ScaleJoins.saltedCount(skewed, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // and phase one genuinely spreads the hot key over several partials
    val partials = skewed.withColumn("__salt",
        pmod(hash(col("k"), col("v")), lit(16)))
      .filter(col("k") === "hot").select("__salt").distinct().count()
    assert(partials > 4, s"hot key only spread over $partials salts")
  }

  test("key skew diagnostic: a planted hot key is flagged, uniform keys are not") {
    val hot = (Seq.fill(990)("hot") ++ (0 until 10).map(i => s"k$i")).toDF("k")
    val r = ScaleJoins.keySkewOf(hot, "k", "fixture").collect()(0)
    assert(r.getAs[Long]("n_rows") == 1000L && r.getAs[Long]("n_keys") == 11L)
    assert(r.getAs[String]("top_key") == "hot")
    assert(r.getAs[Long]("max_count") == 990L)
    assert(r.getAs[Long]("hot_keys") == 1L)
    assert(r.getAs[Boolean]("skewed")) // 990·11 > 10·1000, integer-exact
    assert(math.abs(r.getAs[Double]("skew_factor") - 990.0 * 11 / 1000) < 1e-6)

    val uniform = (0 until 10).flatMap(i => Seq.fill(10)(s"k$i")).toDF("k")
    val u = ScaleJoins.keySkewOf(uniform, "k", "fixture").collect()(0)
    assert(u.getAs[Double]("skew_factor") == 1.0)
    assert(u.getAs[Long]("hot_keys") == 0L)
    assert(!u.getAs[Boolean]("skewed"))
  }

  test("key skew top-1 plans TakeOrderedAndProject, not a global sort") {
    val df = Seq.tabulate(100)(i => s"k${i % 5}").toDF("k")
    val plan = ScaleJoins.keySkewOf(df, "k", "fixture")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-key fell back to a global sort:\n${plan.take(2000)}")
  }

  test("bucketed tables join without a shuffle exchange on the bucket key") {
    val a = Seq.tabulate(1000)(i => (i.toLong, s"a$i")).toDF("id", "pa")
    val b = Seq.tabulate(1000)(i => (i.toLong % 500, s"b$i")).toDF("id", "pb")
    val (ta, tb) = ScaleJoins.bucketize(spark, a, "bkt_a", b, "bkt_b", "id")
    try {
      val joined = spark.table(ta).join(spark.table(tb), "id")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located buckets: the join reads both sides directly, no
      // ShuffleExchange on the join key anywhere in the plan
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000L) // 2 matches per id < 500
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ta")
      spark.sql(s"DROP TABLE IF EXISTS $tb")
    }
  }

  test("star_revenue: broadcast-only dim chain, pushed shipdate filter, pruned scan") {
    val sf = "/root/testdata/sf0.001"
    val df = ScaleJoins.starRevenue(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) == 3,
      s"three dims must each broadcast:\n${plan.take(2500)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the fact table must never shuffle for a join:\n${plan.take(2500)}")
    val scanLine = plan.linesIterator.filter(l => l.contains("Scan parquet") || l.contains("PushedFilters"))
      .mkString("\n")
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"shipdate predicate must push to the scan:\n$scanLine")
    val liRead = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!liRead.contains("l_quantity") && !liRead.contains("l_tax"),
      s"fact scan reads unused columns:\n$liRead")
    // values: one nation spot-check against a driver-side recomputation
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("n_lineitems") > 0))
    val wantTotal = graft.drift.table(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit(ScaleJoins.StarCutoff).cast("timestamp")).count()
    assert(rows.map(_.getAs[Long]("n_lineitems")).sum == wantTotal,
      "every surviving lineitem lands in exactly one (region, nation)")
  }
}
