package graft

import org.apache.spark.sql.functions._
import graft.drift.SnapshotDiff
import graft.pipeline.{Dedup, RangeJoin, Sessions}

/** Range join, snapshot reconciliation and canonical-duplicate selection. */
class ReconRangeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ----------------------------------------------------------- range join

  test("rangeJoinBinned equals the naive cross-join filter, boundaries included") {
    import spark.implicits._
    // spans crossing multiple bins, single-point intervals, negative axis
    // values (floor-division semantics), exact boundary hits
    val intervals = Seq((1L, -25L, -5L), (2L, 0L, 0L), (3L, 7L, 33L), (4L, 30L, 31L))
      .toDF("iv_id", "lo", "hi")
    val points = Seq((10L, -25L), (11L, -6L), (12L, 0L), (13L, 7L), (14L, 33L),
      (15L, 34L), (16L, 30L), (17L, -26L)).toDF("pt_id", "v")
    val got = RangeJoin.rangeJoinBinned(points, "v", intervals, "lo", "hi", 10L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val want = points.crossJoin(intervals)
      .where(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.contains((10L, 1L)) && want.contains((12L, 2L)) && want.contains((16L, 3L)))
  }

  test("rangeJoinBinned emits each matching pair exactly once") {
    import spark.implicits._
    // an interval spanning many bins must not duplicate a contained point
    val intervals = Seq((1L, 0L, 95L)).toDF("iv_id", "lo", "hi")
    val points = Seq((10L, 50L)).toDF("pt_id", "v")
    val rows = RangeJoin.rangeJoinBinned(points, "v", intervals, "lo", "hi", 10L).count()
    assert(rows == 1L)
  }

  test("session_concurrency matches the naive interval join on real data") {
    val spans = Sessions.sessionSpans(spark, sf)
    val pts = graft.drift.table(spark, sf, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val naivePairs = pts.crossJoin(spans.select("start_us", "end_us"))
      .where(col("ts_us") >= col("start_us") && col("ts_us") <= col("end_us"))
      .count()
    val got = RangeJoin.sessionConcurrency(spark, sf)
    val totalPairs = got.agg(sum("active_pair_count")).collect()(0).getLong(0)
    assert(totalPairs == naivePairs)
    // every event is inside its own session -> n_events covers the table
    val nEvents = got.agg(sum("n_events")).collect()(0).getLong(0)
    assert(nEvents == pts.count())
  }

  test("range_join never plans a nested-loop or cartesian join") {
    val plan = RangeJoin.sessionConcurrency(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degraded to a non-keyed join:\n${plan.take(2000)}")
  }

  // -------------------------------------------------------- snapshot diff

  test("diff classifies added/removed/changed/unchanged with null-safe flags") {
    import spark.implicits._
    val ref = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Some("d"), 40.0))
      .toDF("k", "s", "x")
    val curr = Seq((1L, Some("a"), 10.0), (2L, Some("B"), 20.0),
      (3L, Some("c"), 30.0), (5L, Some("e"), 50.0))
      .toDF("k", "s", "x")
    val got = SnapshotDiff.diff(ref, curr, Seq("k"), Seq("s", "x"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(1) == "unchanged")
    assert(got(2L).getString(1) == "changed" && got(2L).getBoolean(2) && !got(2L).getBoolean(3))
    assert(got(3L).getString(1) == "changed") // NULL -> value is a change
    assert(got(4L).getString(1) == "removed")
    assert(got(5L).getString(1) == "added")
  }

  test("snapshot_diff accounting is internally consistent on real data") {
    val rows = SnapshotDiff.snapshotDiffQuery(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    // curr is a superset of ref: nothing can be removed
    assert(!rows.contains("removed"))
    // every changed/added customer moved both order count and spend
    rows.get("changed").foreach { r =>
      assert(r.getLong(1) == r.getLong(2) && r.getLong(1) == r.getLong(3))
    }
    // total new orders across statuses = orders after the cutoff
    val newOrders = rows.values.map(_.getLong(5)).sum
    val after = graft.drift.table(spark, sf, "orders")
      .filter(!graft.drift.splits.ordersRef).count()
    assert(newOrders == after)
    // unchanged customers contribute no new orders or spend
    rows.get("unchanged").foreach { r =>
      assert(r.getLong(5) == 0L && math.abs(r.getDouble(6)) < 1e-9)
    }
  }

  test("snapshot_diff plans zero join nodes: one conditional aggregation") {
    val plan = SnapshotDiff.snapshotDiffQuery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"superset-snapshot diff should not join:\n${plan.take(2000)}")
  }

  // --------------------------------------------------- canonical per dup cluster

  test("cluster_canonical keeps the longest member and accounts every cluster") {
    val docs = graft.drift.table(spark, sf, "documents")
    val labels = Dedup.neardupComponents(docs.select("doc_id", "text"))
      .join(docs.select("doc_id", "n_chars"), "doc_id").cache()
    val got = Dedup.clusterCanonical(spark, sf).collect()
    val byCluster = labels.collect()
      .groupBy(_.getLong(1))
      .collect { case (cid, members) if members.length > 1 => cid -> members }
    assert(got.length == byCluster.size)
    got.foreach { r =>
      val members = byCluster(r.getLong(0))
      assert(r.getLong(1) == members.length)
      // canonical = max n_chars, min doc_id tiebreak — and a real member
      val best = members.minBy(m => (-m.getLong(2), m.getLong(0)))
      assert(r.getLong(2) == best.getLong(0), s"cluster ${r.getLong(0)}")
      assert(r.getLong(3) == best.getLong(2))
      assert(r.getLong(4) == members.map(_.getLong(2)).sum)
    }
    labels.unpersist()
  }

  // --------------------------------------------------------- SCD2 history

  test("scd2_history compresses status runs and chains validity per customer") {
    val got = SnapshotDiff.scd2History(spark, sf).collect()
    val byCust = got.groupBy(_.getLong(0))
    byCust.foreach { case (c, rows0) =>
      val rows = rows0.sortBy(_.getLong(4))
      // versions are 1..n
      assert(rows.map(_.getLong(4)).toSeq == (1L to rows.length), s"cust $c versions")
      rows.init.zip(rows.tail).foreach { case (a, b) =>
        assert(a.getString(3) == b.getString(2), s"cust $c: valid_to must chain to next valid_from")
        assert(a.getString(1) != b.getString(1), s"cust $c: consecutive versions must differ")
        assert(!a.getBoolean(5), s"cust $c: closed rows are not current")
      }
      assert(rows.last.getBoolean(5) && rows.last.isNullAt(3), s"cust $c: open last row")
    }
    // the status sequence equals a driver-side run-length compression of the
    // (o_orderdate, o_orderkey)-ordered order stream
    val ord = graft.drift.table(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("us"),
        col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val want = ord.groupBy(_._1).map { case (c, os) =>
      val seq = os.sortBy(o => (o._3, o._4)).map(_._2).toList
      c -> seq.foldLeft(List.empty[String]) {
        (acc, s) => if (acc.headOption.contains(s)) acc else s :: acc
      }.reverse
    }
    assert(byCust.keySet == want.keySet)
    byCust.foreach { case (c, rows0) =>
      assert(rows0.sortBy(_.getLong(4)).map(_.getString(1)).toList == want(c), s"cust $c runs")
    }
  }

  test("scd2_history plans one scan and one key exchange, no joins") {
    val plan = SnapshotDiff.scd2History(spark, sf).queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"scd2 must read orders once:\n${plan.take(2000)}")
    assert(!plan.contains("Join"), s"scd2 is window-only:\n${plan.take(2000)}")
    assert(plan.linesIterator.count(_.contains("hashpartitioning(o_custkey")) <= 1,
      s"lag/lead/row_number share one o_custkey exchange:\n${plan.take(2000)}")
  }
}
