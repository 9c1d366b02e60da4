package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Constraints
import graft.pipeline.Constraints._

/** Semantics of the declarative validation suite: every constraint kind
  * against planted violations with closed-form expected metrics, the
  * shipped suite's behavior on real fixture tables, the approx (sketch)
  * uniqueness path, and the one-aggregation-per-table batching. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** id 2 duplicated; one v out of range and one NULL; one s off-list; one
    * orphan fk and one NULL fk (NULL fk is skipped, SQL FK semantics). */
  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-constraints").toString
    Seq(
      (1L, Some(10.0), "A", Some(1L)),
      (2L, Some(20.0), "B", Some(1L)),
      (2L, Some(-5.0), "C", Some(99L)),
      (3L, None: Option[Double], "A", None: Option[Long]))
      .toDF("id", "v", "s", "fk")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    Seq(1L, 2L, 3L).toDF("pk").write.mode("overwrite").parquet(s"$dir/p.parquet")
    dir
  }

  private val plantedSuite = Seq(
    Complete("k1_complete_v", "t", "v", 1.0),
    Unique("k2_unique_id", "t", Seq("id")),
    InRange("k3_range_v", "t", "v", Some(0.0), Some(100.0), 0.5),
    Accepted("k4_accepted_s", "t", "s", Seq("A", "B"), 0.75),
    ForeignKey("k5_fk", "t", "fk", "p", "pk"),
    // s = 'A' maps to ids {1, 3}: distinct(s) 3 / distinct(s, id) 4
    FunctionalDependency("k6_fd_s_id", "t", Seq("s"), Seq("id")))

  test("every constraint kind computes its planted metric exactly") {
    val rows = Constraints.constraintCheck(spark, plantedDir, plantedSuite)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.size == 6)
    def check(name: String, nOk: Long, nRows: Long, metric: Double, passed: Boolean) = {
      val r = rows(name)
      assert(r.getAs[Long]("n_ok") == nOk, s"$name n_ok")
      assert(r.getAs[Long]("n_rows") == nRows, s"$name n_rows")
      assert(r.getAs[Double]("metric") == metric, s"$name metric ${r.getAs[Double]("metric")}")
      assert(r.getAs[Boolean]("passed") == passed, s"$name passed")
    }
    check("k1_complete_v", 3, 4, 0.75, passed = false)
    check("k2_unique_id", 3, 4, 0.75, passed = false)
    // NULL v counts as out-of-range: only 10.0 and 20.0 qualify
    check("k3_range_v", 2, 4, 0.5, passed = true)
    check("k4_accepted_s", 3, 4, 0.75, passed = true)
    // NULL fk skipped: 3 keyed rows, the 99 is an orphan
    check("k5_fk", 2, 3, graft.drift.pr6Scalar(2.0 / 3.0), passed = false)
    check("k6_fd_s_id", 3, 4, 0.75, passed = false)
  }

  test("the shipped suite on the fixture detects the planted lineitem non-key") {
    val rows = Constraints.constraintCheck(spark, sf).collect()
    assert(rows.length == Constraints.defaultSuite.size)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("passed") ==
        (r.getAs[Double]("metric") >= r.getAs[Double]("threshold")))
    }
    val byName = rows.map(r => r.getString(0) -> r).toMap
    // (l_orderkey, l_linenumber) is deliberately NOT a key in the fixture
    assert(!byName("c03_unique_lineitem_line").getAs[Boolean]("passed"))
    // independent recomputation of its uniqueness ratio
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val d = li.select(countDistinct(col("l_orderkey"), col("l_linenumber"))).first.getLong(0)
    val n = li.count()
    assert(byName("c03_unique_lineitem_line").getAs[Double]("metric") ==
      graft.drift.pr6Scalar(d.toDouble / n))
    // c12 (part -> supplier) fails by design too: a part has many suppliers
    assert(!byName("c12_fd_part_supplier").getAs[Boolean]("passed"))
    assert(byName("c11_fd_nation_region").getAs[Double]("metric") == 1.0)
    assert(rows.count(!_.getAs[Boolean]("passed")) == 2,
      "exactly c03 and c12 fail on clean fixtures")
  }

  test("approx uniqueness tracks exact and leaves other constraints untouched") {
    val exact = Constraints.constraintCheck(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val ap = Constraints.constraintCheck(spark, sf, approx = true).collect()
      .map(r => r.getString(0) -> r).toMap
    exact.foreach { case (name, e) =>
      val a = ap(name)
      if (name.contains("unique") || name.contains("fd"))
        // fd divides two sketches (~5% rsd each): allow their compounding
        assert(math.abs(a.getAs[Double]("metric") - e.getAs[Double]("metric")) <=
          0.15 * math.max(e.getAs[Double]("metric"), 1e-9), s"$name sketch drifted")
      else assert(a.getAs[Double]("metric") == e.getAs[Double]("metric"), name)
    }
  }

  test("constraint_violations surfaces the planted duplicate and orphan keys") {
    val rows = Constraints.constraintViolations(spark, plantedDir, plantedSuite)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // k2: id 2 appears twice; k5: fk 99 has no parent (NULL fk not reported)
    assert(rows.toSet == Set(("k2_unique_id", "2", 2L), ("k5_fk", "99", 1L),
      ("k6_fd_s_id", "A", 2L)))
    // the fixture's non-key: multiplicity-ranked, capped at TopN per check
    val fx = Constraints.constraintViolations(spark, sf).collect()
    val byCheck = fx.groupBy(_.getString(0))
    assert(byCheck("c03_unique_lineitem_line").length == Constraints.ViolationTopN)
    byCheck("c03_unique_lineitem_line").foreach(r => assert(r.getAs[Long]("n") > 1))
    // FK checks are clean on the fixture — no orphan rows reported
    assert(!byCheck.contains("c08_fk_orders_customer"))
    assert(!byCheck.contains("c09_fk_lineitem_orders"))
  }

  test("aggregate constraints batch into one scan per table") {
    val df = Constraints.constraintCheck(spark, sf)
    def scans(t: String): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(l => l.contains("Scan parquet") && l.contains(s"$t.parquet"))
    // documents: c01 + c02 share one aggregation pass
    assert(scans("documents") == 1, "documents constraints did not batch")
    // lineitem: one agg pass (c03-c06) + the c09 FK child side
    assert(scans("lineitem") == 2, "lineitem agg constraints did not batch")
  }
}
